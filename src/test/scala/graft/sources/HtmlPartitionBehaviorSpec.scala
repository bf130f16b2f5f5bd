package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.sources.HtmlPartitioner.RawPara

/**
 * Second behavior tranche ported from the reference HTML partitioner suite
 * (`test_unstructured/partition/html/test_partition.py` — bullets, joins,
 * body text, excluded tags, emphasis/link metadata, table text_as_html
 * shapes, the `_HtmlPartitioner` element-classification cases, empty-content
 * handling, and `data-page-number` assignment) plus the `_normalize_text`
 * vectors from `test_parser.py:76-92`. The reference's `element == Text(...)`
 * assertions pin TEXT only (its `Text.__eq__` is isinstance-based, satisfied
 * by any subclass), so type assertions here follow the classifier cascade
 * where the reference names a meaningful subtype.
 */
class HtmlPartitionBehaviorSpec extends SparkSuiteBase {

  private def typed(ps: Seq[RawPara]): Seq[(String, String)] = {
    val sp = spark
    import sp.implicits._
    val df = ps.zipWithIndex
      .map { case (p, i) => (i, p.elementType.orNull, p.text, p.classifier) }
      .toDF("i", "raw_type", "text", "classifier")
    val derived = HtmlSource.classifierCascade(col("classifier"), col("text"))
    df.select(col("i"), coalesce(col("raw_type"), derived).as("t"), col("text"))
      .orderBy("i").collect().toSeq.map(r => (r.getString(1), r.getString(2)))
  }

  private def parts(html: String): Seq[RawPara] = HtmlPartitioner.partition(html)

  /** The PRODUCTION surface: HtmlSource.partitionHtml on a one-doc frame —
    * derive cascade, bullet strip, stub drop, resequence, all applied. */
  private def pipeline(html: String): Seq[(String, String)] = {
    val sp = spark
    import sp.implicits._
    HtmlSource.partitionHtml(Seq(("d1", html)).toDF("doc_id", "h"), col("h"))
      .orderBy("seq").select("element_type", "text")
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
  }

  // -- test_html_grabs_bulleted_text_in_tags --

  test("ol/li items emit as ListItems") {
    val html = "<html>\n  <body>\n    <ol>\n" +
      "      <li>Happy Groundhog's day!</li>\n" +
      "      <li>Looks like six more weeks of winter ...</li>\n" +
      "    </ol>\n  </body>\n</html>\n"
    assert(typed(parts(html)) == Seq(
      ("ListItem", "Happy Groundhog's day!"),
      ("ListItem", "Looks like six more weeks of winter ...")))
  }

  // -- test_html_grabs_bulleted_text_in_paras --

  test("bullet-led span paragraphs type as ListItem with the bullet removed") {
    val html = "<html>\n  <body>\n" +
      "    <p>\n      <span>&#8226; Happy Groundhog's day!</span>\n    </p>\n" +
      "    <p>\n      <span>&#8226; Looks like six more weeks of winter ...</span>\n    </p>\n" +
      "  </body>\n</html>\n"
    assert(pipeline(html) == Seq(
      ("ListItem", "Happy Groundhog's day!"),
      ("ListItem", "Looks like six more weeks of winter ...")))
  }

  // -- test_joins_tag_text_correctly --

  test("phrasing joins without separators: A mag<i>ic</i>al day") {
    val ps = parts("<p>A mag<i>ic</i>al day</p>")
    assert(ps.map(_.text) == Seq("A magical day"))
  }

  // -- test_sample_doc_with_emoji --

  test("literal emoji text survives") {
    val ps = parts("<html charset=\"unicode\">\n<p>Hello again 😀</p>\n</html>")
    assert(ps.map(_.text) == Seq("Hello again 😀"))
  }

  // -- test_only_text_and_no_elements_in_body / test_text_before_elements_in_body --

  test("bare body text emits; body text before elements emits first") {
    assert(parts("<body>Hello</body>").map(_.text) == Seq("Hello"))
    assert(parts("<body>Hello<p>World</p></body>").map(_.text) ==
      Seq("Hello", "World"))
  }

  // -- test_line_break_in_container --

  test("br inside a container joins with a space, one element") {
    assert(parts("<div>Hello<br/>World</div>").map(_.text) == Seq("Hello World"))
  }

  // -- test_exclude_tag_types --

  test("del, form, and noscript bodies yield zero elements") {
    for (tag <- Seq("del", "form", "noscript")) {
      val html = s"<body>\n  <$tag>\n    There is some text here.\n  </$tag>\n</body>\n"
      assert(parts(html).isEmpty, s"<$tag> leaked content")
    }
  }

  // -- test_partition_html_grabs_emphasized_texts --

  test("emphasis metadata: contents and composite tags per element") {
    val html = "<html>\n" +
      "  <p>Hello there I am a very <strong>important</strong> text!</p>\n" +
      "  <p>Here is a <span>list</span> of <b>my <i>favorite</i> things</b></p>\n" +
      "  <ul>\n    <li><em>Parrots</em></li>\n    <li>Dogs</li>\n  </ul>\n" +
      "  <span>A lone span text!</span>\n</html>\n"
    val ps = parts(html)
    assert(ps.map(_.text) == Seq(
      "Hello there I am a very important text!",
      "Here is a list of my favorite things",
      "Parrots", "Dogs", "A lone span text!"))
    assert(ps(0).emphasizedContents == Seq("important"))
    assert(ps(0).emphasizedTags == Seq("b"))
    assert(ps(1).emphasizedContents == Seq("my", "favorite", "things"))
    assert(ps(1).emphasizedTags == Seq("b", "bi", "b"))
    assert(ps(2).emphasizedContents == Seq("Parrots"))
    assert(ps(2).emphasizedTags == Seq("i"))
    assert(ps(3).emphasizedContents.isEmpty && ps(3).emphasizedTags.isEmpty)
    assert(ps(4).emphasizedContents.isEmpty && ps(4).emphasizedTags.isEmpty)
  }

  // -- test_partition_html_grabs_links --

  test("link metadata: urls and texts per element, none elsewhere") {
    val html = "<html>\n" +
      "  <p>Hello there I am a <a href=\"/link\">very important link!</a></p>\n" +
      "  <p>Here is a list of my favorite things</p>\n" +
      "  <ul>\n" +
      "    <li><a href=\"https://en.wikipedia.org/wiki/Parrot\">Parrots</a></li>\n" +
      "    <li>Dogs</li>\n  </ul>\n" +
      "  <a href=\"/loner\">A lone link!</a>\n</html>\n"
    val ps = parts(html)
    assert(ps.map(_.text) == Seq(
      "Hello there I am a very important link!",
      "Here is a list of my favorite things",
      "Parrots", "Dogs", "A lone link!"))
    assert(ps(0).linkUrls == Seq("/link"))
    assert(ps(0).linkTexts == Seq("very important link!"))
    assert(ps(1).linkUrls.isEmpty && ps(1).linkTexts.isEmpty)
    assert(ps(2).linkUrls == Seq("https://en.wikipedia.org/wiki/Parrot"))
    assert(ps(2).linkTexts == Seq("Parrots"))
    assert(ps(3).linkUrls.isEmpty)
    assert(ps(4).linkUrls == Seq("/loner"))
    assert(ps(4).linkTexts == Seq("A lone link!"))
  }

  // -- test_partition_html_links --

  test("link metadata: leading whitespace and multiple links per paragraph") {
    val html = "<html>\n" +
      "  <a href=\"/loner\">A lone link!</a>\n" +
      "  <p>Hello <a href=\"/link\">link!</a></p>\n" +
      "  <p>\n   Hello <a href=\"/link\">link!</a></p>\n" +
      "  <p><a href=\"/wiki/parrots\">Parrots</a> and <a href=\"/wiki/dogs\">Dogs</a></p>\n" +
      "</html>\n"
    val ps = parts(html)
    assert(ps(0).linkTexts == Seq("A lone link!") && ps(0).linkUrls == Seq("/loner"))
    assert(ps(1).linkTexts == Seq("link!") && ps(1).linkUrls == Seq("/link"))
    assert(ps(2).linkTexts == Seq("link!") && ps(2).linkUrls == Seq("/link"))
    assert(ps(3).linkTexts == Seq("Parrots", "Dogs"))
    assert(ps(3).linkUrls == Seq("/wiki/parrots", "/wiki/dogs"))
  }

  // -- test_it_provides_parseable_HTML_in_text_as_html --

  test("thead/tbody/tfoot th cells all flatten to td rows in text_as_html") {
    val html = "<html>\n<body>\n  <table>\n    <thead>\n" +
      "      <tr><th>Lorem</th><th>Ipsum</th></tr>\n    </thead>\n    <tbody>\n" +
      "      <tr><th>Lorem ipsum</th><td>dolor sit amet nulla</td></tr>\n" +
      "      <tr><th>Ut enim non</th><td>ad minim\nveniam quis</td></tr>\n" +
      "    </tbody>\n    <tfoot>\n" +
      "      <tr><th>Dolor</th><td>Equis</td></tr>\n    </tfoot>\n  </table>\n" +
      "</body>\n</html>"
    val ps = parts(html)
    assert(ps.size == 1)
    assert(ps.head.textAsHtml.contains(
      "<table>" +
        "<tr><td>Lorem</td><td>Ipsum</td></tr>" +
        "<tr><td>Lorem ipsum</td><td>dolor sit amet nulla</td></tr>" +
        "<tr><td>Ut enim non</td><td>ad minim<br/>veniam quis</td></tr>" +
        "<tr><td>Dolor</td><td>Equis</td></tr>" +
        "</table>"))
  }

  // -- test_partition_html_parses_table_without_tbody --

  test("a table with only thead (or tfoot) rows still emits its row") {
    for (tag <- Seq("thead", "tfoot")) {
      val html = s"<table>\n  <$tag>\n" +
        s"    <tr><th>Header 1</th><th>Header 2</th></tr>\n  </$tag>\n</table>"
      val ps = parts(html)
      assert(ps.head.textAsHtml.contains(
        "<table><tr><td>Header 1</td><td>Header 2</td></tr></table>"), s"<$tag>")
    }
  }

  // -- test_partition_html_accommodates_tds_with_child_elements --

  test("tds with nested p/span/custom tags keep cell text (SEC 10-K shape)") {
    val html = "<table>\n <tr>\n  <td></td>\n  <td></td>\n </tr>\n <tr>\n  <td>\n" +
      "   <p>\n    <span>\n     <ix:nonNumeric id=\"F_1\" contextRef=\"C_1\"" +
      " name=\"dei:DocumentAnnualReport\" format=\"ixt-sec:boolballotbox\">\n" +
      "     <span>&#9746;</span>\n     </ix:nonNumeric>\n    </span>\n   </p>\n" +
      "  </td>\n  <td>\n   <p>\n    <span>ANNUAL REPORT PURSUANT TO SECTION 13" +
      " OR 15(d) OF THE SECURITIES EXCHANGE ACT OF 1934</span>\n   </p>\n  </td>\n" +
      " </tr>\n</table>\n"
    val ps = parts(html)
    assert(ps.size == 1)
    assert(ps.head.text ==
      "☒ ANNUAL REPORT PURSUANT TO SECTION 13 OR 15(d) OF THE SECURITIES" +
        " EXCHANGE ACT OF 1934")
    assert(ps.head.textAsHtml.get.contains(
      "<tr><td>☒</td><td>ANNUAL REPORT PURSUANT TO SECTION 13 OR 15(d) OF THE" +
        " SECURITIES EXCHANGE ACT OF 1934</td></tr>"))
  }

  // -- Describe_HtmlPartitioner element-classification cases --

  test("all-caps non-narrative, non-title contents produce UncategorizedText") {
    assert(typed(parts("<p>NO PARTICULAR TYPE.</p>")) ==
      Seq(("UncategorizedText", "NO PARTICULAR TYPE.")))
  }

  test("a bullet character before text produces a ListItem") {
    assert(pipeline("<p>● An excellent point!</p>") ==
      Seq(("ListItem", "An excellent point!")))
  }

  test("bullet-only, empty, and single-char stub paragraphs produce nothing") {
    assert(pipeline("<p>●</p>").isEmpty)
    assert(pipeline("<p></p>").isEmpty)
    assert(pipeline("<p>$</p>").isEmpty) // one non-whitespace char = a stub
  }

  // -- test_partition_html_with_empty_content_raises_error (i.e. must NOT raise) --

  test("empty and whitespace-only documents partition to zero elements") {
    assert(parts("").isEmpty)
    assert(parts("   \n\t  \n  ").isEmpty)
  }

  // -- test_partition_html_assigns_page_number_from_data_page_number_attribute --

  test("data-page-number divs assign page numbers; tables included") {
    val html = "<html><body>" +
      "  <div data-page-number=\"1\">" +
      "    <p>First page content.</p>" +
      "    <table><tr><td>Table on page 1</td></tr></table>" +
      "  </div>" +
      "  <div data-page-number=\"2\">" +
      "    <p>Second page content.</p>" +
      "  </div>" +
      "</body></html>"
    val ps = parts(html)
    val page1 = ps.filter(_.pageNumber.contains(1))
    val page2 = ps.filter(_.pageNumber.contains(2))
    assert(page1.size == 2)
    assert(page1.exists(_.elementType.contains("Table")))
    assert(page2.map(_.text) == Seq("Second page content."))
  }

  // -- test_partition_html_leaves_page_number_None_when_not_present --

  test("no page markup leaves page_number unset") {
    assert(parts("<html><body><p>No page markup.</p></body></html>")
      .forall(_.pageNumber.isEmpty))
  }

  // -- DescribeFlow.it_generates_the_document_elements_from_the_Flow_element --

  test("a div with text, phrasing, blocks, and tails yields five paragraphs") {
    val html = """
      <div>
        Text of div <b>with <i>hierarchical</i>
phrasing</b> content before first block item
        <p>Click <a href="http://blurb.io">here</a> to see the blurb for this block item. </p>
        tail of block item <b>with <i>hierarchical</i> phrasing </b> content
        <p>second block item</p>
        tail of block item <b>with <i>  hierarchical  </i></b> phrasing content
      </div>
    """
    val ps = parts(html)
    assert(ps.map(_.text) == Seq(
      "Text of div with hierarchical phrasing content before first block item",
      "Click here to see the blurb for this block item.",
      "tail of block item with hierarchical phrasing content",
      "second block item",
      "tail of block item with hierarchical phrasing content"))
    assert(ps(0).emphasizedContents == Seq("with", "hierarchical", "phrasing"))
    assert(ps(0).emphasizedTags == Seq("b", "bi", "b"))
    assert(ps(1).linkTexts == Seq("here") && ps(1).linkUrls == Seq("http://blurb.io"))
    assert(ps(2).emphasizedContents == Seq("with", "hierarchical", "phrasing"))
    assert(ps(2).emphasizedTags == Seq("b", "bi", "b"))
    assert(ps(3).emphasizedContents.isEmpty && ps(3).linkUrls.isEmpty)
    // the last tail's <i> content is whitespace-padded: "phrasing" sits
    // OUTSIDE the <b>, so only two emphasis annotations consolidate
    assert(ps(4).emphasizedContents == Seq("with", "hierarchical"))
    assert(ps(4).emphasizedTags == Seq("b", "bi"))
  }

  // -- but_it_does_not_generate_a_document_element_when_only_whitespace_is_contained --

  test("whitespace-only phrasing content yields no element") {
    assert(parts("<div>   <b> \n <i>  \n </i>  </b>   <q> \n </q> \n  </div>").isEmpty)
  }

  // -- but_it_does_not_generate_a_document_element_when_only_a_bullet_character_is_contained --

  test("a div containing only a bullet character yields no element") {
    assert(pipeline("<div> * </div>").isEmpty)
  }

  // -- and_it_selects_the_document_element_class_by_analyzing_the_text_when_not_specified --

  test("flow text without an explicit class derives from the text") {
    assert(pipeline("<div>\n  The line-storm clouds fly tattered and swift,\n</div>") ==
      Seq(("NarrativeText", "The line-storm clouds fly tattered and swift,")))
  }

  // -- DescribeFlow._page_number nesting --

  test("the NEAREST ancestor's data-page-number wins") {
    val ps = parts(
      "<div data-page-number=\"1\"><div data-page-number=\"2\"><p>text</p></div></div>")
    assert(ps.map(_.pageNumber) == Seq(Some(2)))
  }

  // -- DescribeLineBreak.it_adds_a_newline_in_its_place --

  test("br inside phrasing separates butted-up words with whitespace") {
    assert(parts("<div><cite>spaceships of the<br/>Vogon Constructor Fleet</cite></div>")
      .map(_.text) == Seq("spaceships of the Vogon Constructor Fleet"))
  }

  // -- DescribeRemovedPhrasing.it_behaves_like_an_empty_element --

  test("label contents (including nested blocks) drop; its tail survives") {
    val html = "<div>\n" +
      "  <label>Space<p>is big</p>, <b>mind-bogglingly</b> big.</label>\n" +
      "  Like vastly, hugely big.\n" +
      "</div>"
    assert(parts(html).map(_.text) == Seq("Like vastly, hugely big."))
  }

  // -- DescribeDefaultElement: tail-only behavior of unknown elements --

  test("an unknown element drops its inner text but keeps its tail in the flow") {
    val html = "<div>\n" +
      "  O Deep Thought computer, he said,\n" +
      "  <foobar>Vogon Constructor Fleet</foobar>\n" +
      "  The task we have designed you to perform is this.\n" +
      "  <p>We want you to tell us.... he paused,</p>\n" +
      "</div>"
    assert(parts(html).map(_.text) == Seq(
      "O Deep Thought computer, he said, The task we have designed you to" +
        " perform is this.",
      "We want you to tell us.... he paused,"))
  }

  // -- _normalize_text vectors (test_parser.py:76-92) --

  test("normalize_text vectors: runs collapse, edges strip, newlines = spaces") {
    val vectors = Seq(
      "iterators allow" -> "iterators allow",
      "algorithm\nto   be" -> "algorithm to be",
      "  separated\n  from  " -> "separated from",
      "\n container\n details\n " -> "container details",
      ("\n  iterators  allow \n algorithm to be   \nexpressed  without container  \nnoise"
        -> "iterators allow algorithm to be expressed without container noise"))
    vectors.foreach { case (in, out) =>
      assert(parts(s"<p>$in</p>").map(_.text) == Seq(out), s"input: ${in.take(30)}")
    }
  }
}
