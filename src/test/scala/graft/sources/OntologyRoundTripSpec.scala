package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HtmlOntology.{partition, parseOntology, elementsToOntology, toHtml}

/**
 * Behavior port of `test_unstructured/partition/html/
 * test_html_to_unstructured_and_back_parsing.py` — the v2 end-to-end round
 * trips: annotated HTML → elements (with the reference's expected per-element
 * `text_as_html`) → ontology → HTML fixpoint. The reference asserts the
 * prettified reconstruction equals the prettified input; here the fixpoint is
 * asserted renderer-to-renderer (`toHtml` of the reconstruction equals
 * `toHtml` of the direct parse), which is the same statement without a
 * pretty-printer in the loop.
 */
class OntologyRoundTripSpec extends AnyFunSuite {

  private def wrap(inner: String): String =
    s"""<body class="Document"><div class="Page" data-page-number="1">$inner</div></body>"""

  private def roundTrips(html: String): Unit = {
    val els = partition(html, addImgAltText = false)
    val direct = toHtml(parseOntology(html).get)
    val back = toHtml(elementsToOntology(els))
    assert(back == direct, s"fixpoint diverged for: ${html.take(60)}")
  }

  private def typedHtml(html: String): Seq[(String, String, String)] =
    partition(html, addImgAltText = false)
      .map(e => (e.elementType, e.text, e.textAsHtml))

  private val pageHtml = """<div class="Page" data-page-number="1" />"""

  test("simple narrative text (test_simple_narrative_text_with_id)") {
    val html = wrap("""<p class="NarrativeText"> DEALER ONLY </p>""")
    assert(typedHtml(html) == Seq(
      ("UncategorizedText", "", pageHtml),
      ("NarrativeText", "DEALER ONLY", """<p class="NarrativeText">DEALER ONLY</p>""")))
    roundTrips(html)
  }

  test("radio button input keeps its attributes (test_input_with_radio_button_checked)") {
    val html = wrap(
      """<input class="RadioButton" name="health-comparison" type="radio" checked/>""")
    val out = typedHtml(html)
    assert(out.length == 2)
    assert(out(1)._1 == "UncategorizedText" && out(1)._2 == "")
    assert(out(1)._3 ==
      """<input class="RadioButton" name="health-comparison" type="radio" checked />""")
    roundTrips(html)
  }

  test("multiple elements keep order and types (test_multiple_elements)") {
    val html = wrap(
      """<p class="Paragraph"> About the same </p>
        |<input class="RadioButton" name="health-comparison" type="radio"/>
        |<p class="Paragraph"> Some text </p>""".stripMargin)
    val out = typedHtml(html)
    assert(out.map(e => (e._1, e._2)) == Seq(
      ("UncategorizedText", ""),
      ("NarrativeText", "About the same"),
      ("UncategorizedText", ""),
      ("NarrativeText", "Some text")))
    assert(out(1)._3 == """<p class="Paragraph">About the same</p>""")
    roundTrips(html)
  }

  test("multiple pages each emit their container (test_multiple_pages)") {
    val html =
      """<body class="Document">
        |  <div class="Page" data-page-number="1">
        |    <p class="Paragraph"> Some text </p>
        |  </div>
        |  <div class="Page" data-page-number="2">
        |    <p class="Paragraph"> Another text </p>
        |  </div>
        |</body>""".stripMargin
    val out = typedHtml(html)
    assert(out.map(e => (e._1, e._2)) == Seq(
      ("UncategorizedText", ""), ("NarrativeText", "Some text"),
      ("UncategorizedText", ""), ("NarrativeText", "Another text")))
    assert(out(0)._3 == pageHtml)
    assert(out(2)._3 == """<div class="Page" data-page-number="2" />""")
    roundTrips(html)
  }

  test("table strips inner ids/classes, keeps spans (test_table)") {
    val html = wrap(
      """<table class="Table"><tbody class="TableBody"><tr class="TableRow">
        |<td class="TableCell"> Fair Value1 </td>
        |<th class="TableCellHeader" rowspan="2"> Fair Value2 </th>
        |</tr></tbody></table>""".stripMargin)
    val out = typedHtml(html)
    assert(out(1)._1 == "Table")
    assert(out(1)._2 == "Fair Value1 Fair Value2")
    assert(out(1)._3 == """<table class="Table"><tbody><tr><td>Fair Value1</td>""" +
      """<th rowspan="2">Fair Value2</th></tr></tbody></table>""")
    roundTrips(html)
  }

  test("unordered list merges into one element (test_ordered_list)") {
    val html = wrap(
      """<ul class="UnorderedList">
        |<li class="ListItem"> Item 1 </li>
        |<li class="ListItem"> Item 2 </li>
        |<li class="ListItem"> Item 3 </li>
        |</ul>""".stripMargin)
    val out = typedHtml(html)
    assert(out(1)._1 == "UncategorizedText")
    assert(out(1)._2 == "Item 1 Item 2 Item 3")
    assert(out(1)._3 == """<ul class="UnorderedList"><li class="ListItem">Item 1</li>""" +
      """<li class="ListItem">Item 2</li><li class="ListItem">Item 3</li></ul>""")
    roundTrips(html)
  }

  test("squeezed inline run merges into the leading text element " +
    "(test_squeezed_elements_are_parsed_back)") {
    val html = wrap(
      """<p class="NarrativeText"> Table of Contents </p>
        |<address class="Address"> 68 Prince Street Palmdale, CA 93550 </address>
        |<a class="Hyperlink"> www.google.com </a>""".stripMargin)
    val out = typedHtml(html)
    assert(out.length == 2)
    assert(out(1)._1 == "NarrativeText")
    assert(out(1)._2 == "Table of Contents 68 Prince Street Palmdale, CA 93550 www.google.com")
    assert(out(1)._3 == """<p class="NarrativeText">Table of Contents</p>""" +
      """<address class="Address">68 Prince Street Palmdale, CA 93550</address>""" +
      """<a class="Hyperlink">www.google.com</a>""")
    roundTrips(html)
  }
}
