package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's v2 parser tests
  * (`test_unstructured/partition/html/test_partition_v2.py`,
  * `test_html_to_ontology_parsing.py`) against [[HtmlOntology]]. */
class HtmlOntologySpec extends AnyFunSuite {

  private def body(inner: String) = s"""<body class="Document">$inner</body>"""

  test("category_depth follows heading level on a multi-level page (ML-1328 AC1)") {
    val html = body(
      """<div class="Page" data-page-number="1">
        |<h1 class="Title">Cost Share Summary</h1>
        |<p class="NarrativeText">Intro paragraph.</p>
        |<h2 class="Heading">Accumulation Period</h2>
        |<p class="NarrativeText">Accumulation body.</p>
        |<h2 class="Heading">Cost Share Summary Tables by Benefit</h2>
        |<h3 class="Heading">How to read the Cost Share summary tables</h3>
        |<p class="NarrativeText">How-to body.</p>
        |</div>""".stripMargin)
    val es = HtmlOntology.partition(html)
    val byText = es.map(e => e.text -> e).toMap
    assert(byText("Cost Share Summary").categoryDepth.contains(0))
    assert(byText("Accumulation Period").categoryDepth.contains(1))
    assert(byText("Cost Share Summary Tables by Benefit").categoryDepth.contains(1))
    assert(byText("How to read the Cost Share summary tables").categoryDepth.contains(2))
    assert(es.forall(_.textAsHtml.nonEmpty))
  }

  test("category_depth does not change with multi-column layout (ML-1328 AC2)") {
    val single = body(
      """<div class="Page" data-page-number="1">
        |<h1 class="Title">Introduction</h1><h2 class="Heading">About</h2>
        |</div>""".stripMargin)
    val multi = body(
      """<div class="Page" data-page-number="1">
        |<div class="Column"><h1 class="Title">Introduction</h1>
        |<h2 class="Heading">About</h2></div>
        |<div class="Column"><h2 class="Heading">Contact</h2></div>
        |</div>""".stripMargin)
    val s = HtmlOntology.partition(single).map(e => e.text -> e).toMap
    val m = HtmlOntology.partition(multi).map(e => e.text -> e).toMap
    assert(s("Introduction").categoryDepth.contains(0))
    assert(m("Introduction").categoryDepth.contains(0))
    assert(s("About").categoryDepth.contains(1))
    assert(m("About").categoryDepth.contains(1))
    assert(m("Contact").categoryDepth.contains(1))
  }

  test("image alt text included/excluded via image_alt_mode") {
    val html = """<div class="Page"><img src="my-logo.png" alt="ALT TEXT Logo"/></div>"""
    val withAlt = HtmlOntology.partition(html, addImgAltText = true)
    assert(withAlt.last.text.contains("ALT TEXT Logo"))
    val noAlt = HtmlOntology.partition(html, addImgAltText = false)
    assert(!noAlt.last.text.contains("ALT TEXT Logo"))
  }

  test("image alt text propagates through an enclosing paragraph") {
    val html =
      """<div class="Page"><p class="Paragraph"><img src="l.png" alt="ALT TEXT Logo"/></p></div>"""
    val es = HtmlOntology.partition(html)
    assert(es.last.text.contains("ALT TEXT Logo"))
    assert(es.last.elementType == "NarrativeText") // Paragraph maps to NarrativeText
  }

  test("table keeps non-class attrs and img/input class; sorted attrs, checked=\"\"") {
    val html = body(
      """<div class="Page"><table class="Table"><tbody><tr>
        |<td colspan="2">Some text</td>
        |<td><input checked="" class="Checkbox" type="checkbox"/></td>
        |</tr></tbody></table></div>""".stripMargin)
    val table = HtmlOntology.partition(html).find(_.elementType == "Table").get
    assert(table.textAsHtml.contains(
      """<input checked="" class="Checkbox" type="checkbox"/>"""))
    assert(table.textAsHtml.contains("""colspan="2""""))
    assert(table.textAsHtml.startsWith("""<table class="Table">"""))
    assert(!table.textAsHtml.contains("TableCell")) // inner classes stripped
  }

  test("class inferred from tag when missing; layout aside unwraps text to Paragraph") {
    val ont = HtmlOntology.parseOntology(
      body("""<div class="Page"><aside>Some text</aside></div>""")).get
    val page = ont.children.head
    val aside = page.children.head
    assert(aside.cls.name == "Sidebar" && aside.tag == "aside")
    assert(aside.children.head.cls.name == "Paragraph")
    assert(aside.children.head.text == "Some text")
  }

  test("wrong tag with known class: tag overwritten from allowed_tags") {
    val ont = HtmlOntology.parseOntology(
      body("""<div class="Page"><p class="Sidebar">Some text</p></div>""")).get
    val aside = ont.children.head.children.head
    assert(aside.cls.name == "Sidebar" && aside.tag == "aside")
  }

  test("unknown tag and class fall back to UncategorizedText as span") {
    val es = HtmlOntology.partition(
      body("""<div class="Page"><newtag class="wrongclass">Some text</newtag></div>"""))
    val t = es.last
    assert(t.elementType == "UncategorizedText")
    assert(t.textAsHtml == """<span class="UncategorizedText">Some text</span>""")
  }

  test("attr-less divs are unwrapped; divs with attrs are kept with their id") {
    val ont = HtmlOntology.parseOntology(body(
      """<div class="Page"><div><input class="RadioButton" name="h" type="radio"/></div></div>"""))
      .get
    val page = ont.children.head
    assert(page.children.head.cls.name == "RadioButton") // div spliced out
    val ont2 = HtmlOntology.parseOntology(body(
      """<div class="Page"><div style="color: blue" id="important_div">
        |<input class="RadioButton" name="h" type="radio"/></div></div>""".stripMargin)).get
    val div = ont2.children.head.children.head
    assert(div.id.contains("important_div"))
  }

  test("bare text between tags becomes Paragraph elements") {
    val ont = HtmlOntology.parseOntology(body(
      """<div class="Page">About the same
        |<input class="RadioButton" name="h" type="radio"/>
        |Some text</div>""".stripMargin)).get
    val kinds = ont.children.head.children.map(_.cls.name)
    assert(kinds == Vector("Paragraph", "RadioButton", "Paragraph"))
  }

  test("FormFieldValue keeps keyword-only attrs and appends value to text") {
    val es = HtmlOntology.partition(body(
      """<input class="FormFieldValue" type="radio" name="options" value="2" checked>"""))
    val f = es.last
    assert(f.textAsHtml ==
      """<input class="FormFieldValue" type="radio" name="options" value="2" checked />""")
    assert(f.text == "2") // FormFieldValue.to_text appends the value attr
  }

  test("input without matching class dispatches on type attr") {
    val ont = HtmlOntology.parseOntology(body(
      """<div class="Page"><form class="Form"><label class="FormField" for="o1">
        |<input type="radio" name="o1" value="2" checked>
        |<span class="UncategorizedText">Option 1</span>
        |</label></form></div>""".stripMargin)).get
    val label = ont.children.head.children.head.children.head
    assert(label.cls.name == "FormField")
    assert(label.children.map(_.cls.name) == Vector("RadioButton", "UncategorizedText"))
  }

  test("empty p/span/div/h tags are removed before parsing") {
    val es = HtmlOntology.partition(body(
      """<div class="Page"><p></p><h2></h2><p class="NarrativeText">kept</p></div>"""))
    assert(es.map(_.text) == Vector("", "kept"))
  }

  test("consecutive text and inline elements merge; others break the run") {
    val es = HtmlOntology.partition(body(
      """<div class="Page"><blockquote class="Quote">quoted</blockquote><span class="PhoneNumber">555</span><p>plain</p><foo>stop</foo><pre class="CodeBlock">x</pre></div>"""))
    val types = es.map(_.elementType)
    assert(types == Vector("UncategorizedText", "NarrativeText", "UncategorizedText", "CodeSnippet"))
    val merged = es(1)
    assert(merged.text == "quoted 555 plain")
    assert(merged.textAsHtml ==
      """<blockquote class="Quote">quoted</blockquote><span class="PhoneNumber">555</span><p class="Paragraph">plain</p>""")
  }

  test("layout containers carry parent_id chain and page numbers") {
    val es = HtmlOntology.partition(
      """<body class="Document" id="b1">
        |<div class="Page" data-page-number="1" id="p1"><p class="NarrativeText">a</p></div>
        |<div class="Page" data-page-number="2" id="p2"><hr class="PageBreak" id="br1"/></div>
        |</body>""".stripMargin)
    val page1 = es(0)
    assert(page1.elementType == "UncategorizedText" && page1.text == "")
    assert(page1.textAsHtml == """<div class="Page" data-page-number="1" />""")
    assert(page1.pageNumber.contains(1) && page1.parentId.contains("b1"))
    assert(es(1).pageNumber.contains(1) && es(1).parentId.isEmpty) // content row
    val hr = es(3)
    assert(hr.textAsHtml == """<hr class="PageBreak" />""")
    assert(hr.parentId.contains("p2") && hr.pageNumber.contains(2))
  }

  test("br becomes an empty Paragraph with no css class (double-space quirk)") {
    val es = HtmlOntology.partition(body("""<div class="Page"><br/></div>"""))
    assert(es.last.textAsHtml == "<br  />") // f"<{tag} {''} />" — faithful quirk
  }

  test("malformed input yields zero elements, never throws") {
    assert(HtmlOntology.partition("<p>no document root</p>").isEmpty)
    assert(HtmlOntology.partition("").isEmpty)
    assert(HtmlOntology.partition(null).isEmpty)
  }

  // ------------------------------------- inverse: elements -> ontology tree

  test("round trip: partition -> elements_to_ontology -> to_html is the fixpoint") {
    // the reference's test_simple_narrative_text_with_id shape
    val html = """<body class="Document"><div class="Page" data-page-number="1">""" +
      """<p class="NarrativeText">DEALER ONLY</p></div></body>"""
    val els = HtmlOntology.partition(html)
    val back = HtmlOntology.elementsToOntology(els)
    assert(HtmlOntology.toHtml(back) == html)
  }

  test("round trip preserves multi-page nesting driven by container parent ids") {
    val html = """<body class="Document" id="b1">""" +
      """<div class="Page" data-page-number="1" id="p1"><h1 class="Title">One</h1></div>""" +
      """<div class="Page" data-page-number="2" id="p2"><p class="NarrativeText">Two</p></div>""" +
      """</body>"""
    val back = HtmlOntology.elementsToOntology(HtmlOntology.partition(html))
    // ids live only on the element rows (to_html pops them), so the rebuilt
    // HTML is the id-less normalization of the input
    assert(HtmlOntology.toHtml(back) ==
      """<body class="Document"><div class="Page" data-page-number="1">""" +
        """<h1 class="Title">One</h1></div><div class="Page" data-page-number="2">""" +
        """<p class="NarrativeText">Two</p></div></body>""")
  }

  test("round trip: merged runs re-split into one node per top-level tag") {
    val html = """<body class="Document"><div class="Page">""" +
      """<blockquote class="Quote">q</blockquote><span class="PhoneNumber">5</span>""" +
      """</div></body>"""
    val els = HtmlOntology.partition(html)
    assert(els.size == 2) // container + one merged element
    val back = HtmlOntology.elementsToOntology(els)
    val page = back.children.head
    assert(page.children.map(_.cls.name) == Vector("Quote", "PhoneNumber"))
  }

  test("round trip: table survives through its bs4-normalized HTML") {
    val html = """<body class="Document"><div class="Page">""" +
      """<table class="Table"><tbody class="TableBody"><tr class="TableRow">""" +
      """<td class="TableCell">k</td></tr></tbody></table></div></body>"""
    val back = HtmlOntology.elementsToOntology(HtmlOntology.partition(html))
    val table = back.children.head.children.head
    assert(table.cls.name == "Table")
    assert(HtmlOntology.toHtml(table) ==
      """<table class="Table"><tbody><tr><td>k</td></tr></tbody></table>""")
  }

  test("empty element list yields an empty Document") {
    val doc = HtmlOntology.elementsToOntology(Vector.empty)
    assert(doc.cls.name == "Document" && doc.children.isEmpty)
  }

  private def el(tpe: String, id: String, text: String, html: String,
      parent: Option[String] = None) =
    HtmlOntology.V2Element(tpe, Some(id), text, html, None, None, parent)

  test("reconstruction works when the first element has no parent id") {
    val doc = HtmlOntology.elementsToOntology(Vector(
      el("UncategorizedText", "1", "", """<div class="Page"/>"""),
      el("NarrativeText", "2", "Example text",
        """<p class="Paragraph"> Example text </p>""", parent = Some("1"))))
    assert(doc.children.map(_.cls.name) == Vector("Page"))
    val para = doc.children.head.children.head
    assert(para.cls.name == "Paragraph" && para.text == "Example text")
  }

  test("elements without text_as_html are skipped, not fatal") {
    val doc = HtmlOntology.elementsToOntology(Vector(
      el("UncategorizedText", "1", "", """<div class="Page"/>"""),
      el("NarrativeText", "2", "no html payload", null, parent = Some("1")),
      el("NarrativeText", "3", "Example text",
        """<p class="Paragraph"> Example text </p>""", parent = Some("1"))))
    assert(doc.children.head.children.map(_.text) == Vector("Example text"))
  }

  test("nested layout containers rebuild column nesting (ML-1328)") {
    val doc = HtmlOntology.elementsToOntology(Vector(
      el("UncategorizedText", "page", "", """<div class="Page"/>"""),
      el("UncategorizedText", "col1", "", """<div class="Column"/>""", parent = Some("page")),
      el("NarrativeText", "c1", "Left column text",
        """<p class="Paragraph"> Left column text </p>""", parent = Some("col1")),
      el("UncategorizedText", "col2", "", """<div class="Column"/>""", parent = Some("page")),
      el("NarrativeText", "c2", "Right column text",
        """<p class="Paragraph"> Right column text </p>""", parent = Some("col2"))))
    val page = doc.children.head
    assert(page.children.map(_.cls.name) == Vector("Column", "Column"))
    assert(page.children(0).children.map(_.text) == Vector("Left column text"))
    assert(page.children(1).children.map(_.text) == Vector("Right column text"))
  }

  test("container with unknown parent id nests in place, never pops to root") {
    val doc = HtmlOntology.elementsToOntology(Vector(
      el("UncategorizedText", "page", "", """<div class="Page"/>"""),
      el("UncategorizedText", "col", "", """<div class="Column"/>""",
        parent = Some("DOES_NOT_EXIST")),
      el("NarrativeText", "c1", "Body text",
        """<p class="Paragraph"> Body text </p>""", parent = Some("col"))))
    val page = doc.children.head
    assert(page.children.map(_.cls.name) == Vector("Column"))
    assert(page.children.head.children.map(_.text) == Vector("Body text"))
  }

  // -- test_parsing_header_and_footer_into_correct_ontologyelement (:31) --
  test("header and footer parse into their ontology classes") {
    val page = HtmlOntology.parseOntology(body(
      """<div class="Page"><header class="Header"> this is a header </header>""" +
        """<footer class="Footer"> this is a footer </footer></div>""")).get
      .children.head
    assert(page.children.size == 2)
    val Vector(header, footer) = page.children
    assert(header.cls.name == "Header" && header.tag == "header")
    assert(HtmlOntology.toText(header) == "this is a header")
    assert(footer.cls.name == "Footer" && footer.tag == "footer")
    assert(HtmlOntology.toText(footer) == "this is a footer")
  }

  // -- test_table_and_time (:418): table internals drop classes, keep tags/attrs --
  test("time and span inside a table keep tags and attrs but lose classes") {
    val ont = HtmlOntology.parseOntology(body(
      """<div class="Page"><table class="Table"><thead class="TableHeader">""" +
        """<tr class="TableRow"><th class="TableCellHeader" colspan="6">Carrying Value</th></tr></thead>""" +
        """<tbody class="TableBody"><tr class="TableRow"><td class="TableCell" colspan="5">""" +
        """<time class="CalendarDate">June 30, 2023</time></td>""" +
        """<td class="TableCell"><span class="Currency">$—</span></td></tr></tbody></table></div>""")).get
    val table = ont.children.head.children.head
    assert(table.cls.name == "Table")
    assert(HtmlOntology.toHtml(table) ==
      """<table class="Table"><thead><tr><th colspan="6">Carrying Value</th></tr></thead>""" +
        """<tbody><tr><td colspan="5"><time>June 30, 2023</time></td>""" +
        """<td><span>$—</span></td></tr></tbody></table>""")
  }

  // -- test_input_tag_type_is_mapped_to_correct_ontology_class (:684) --
  test("bare input tags classify from their type attribute") {
    def one(typeAttr: String): HtmlOntology.ONode =
      HtmlOntology.parseOntology(body(
        s"""<div class="Page"><input$typeAttr name="field" /></div>""")).get
        .children.head.children.head
    assert(one(""" type="checkbox"""").cls.name == "Checkbox")
    assert(one(""" type="radio"""").cls.name == "RadioButton")
    assert(one(""" type="text"""").cls.name == "FormFieldValue")
    assert(one("").cls.name == "FormFieldValue") // missing type attribute
    assert(one(""" type="radio"""").tag == "input")
  }

  // -- test_text_in_form_field_value (:577) / _with_null_value (:592) --
  test("FormFieldValue to_text comes from the value attr, empty when blank") {
    def field(value: String): HtmlOntology.ONode =
      HtmlOntology.parseOntology(body(
        s"""<div class="Page"><input class="FormFieldValue" value="$value"/></div>""")).get
        .children.head.children.head
    assert(HtmlOntology.toText(field("Random Input Value")) == "Random Input Value")
    assert(field("Random Input Value").text == "")
    assert(HtmlOntology.toText(field("")) == "")
  }

  // -- test_recursion_limit_is_limiting_parsing (:625) + to_text (:642) --
  test("recursion limit caps parse depth; deeper HTML is kept as raw text") {
    val nested = (1 to 100).foldLeft("some text") {
      (inner, _) => s"""<p class="Paragraph">$inner</p>"""
    }
    val ont = HtmlOntology.parseOntology(body(nested)).get
    var last = ont.children.head
    var depth = 1
    while (last.children.nonEmpty) { last = last.children.head; depth += 1 }
    assert(depth == 50) // RECURSION_LIMIT, transformations.py:21
    assert(last.text.startsWith("""<p class="Paragraph">"""))
    assert(HtmlOntology.toText(last) == "some text")
  }

  // -- test_uncategorizedtest_has_image_and_no_text (:656) --
  test("UncategorizedText div holding only an img classifies as Image") {
    val el = HtmlOntology.parseOntology(body(
      """<div class="Page"><div class="UncategorizedText">""" +
        """<img src="https://www.example.com/image.jpg"/></div></div>""")).get
      .children.head.children.head
    assert(el.cls.name == "Image")
  }
}
