package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.sources.HtmlPartitioner.RawPara

/**
 * Behavior suite ported from the reference's HTML partitioner tests
 * (`/root/reference/test_unstructured/partition/html/test_partition.py`) —
 * same inputs, same expected element streams, untyped paragraphs resolved
 * through the production HTML derive cascade.
 */
class HtmlBehaviorSpec extends SparkSuiteBase {

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

  // -- test_partition_html_processes_chinese_chracters ----------------------------

  test("chinese characters pass through") {
    assert(parts("<html><div><p>每日新闻</p></div></html>").head.text == "每日新闻")
  }

  // -- test_emoji_appears_with_emoji_utf8_code ------------------------------------

  test("numeric character references decode to emoji") {
    val ps = typed(parts("<html charset=\"utf-8\"><p>Hello &#128512;</p></html>"))
    assert(ps == Seq(("UncategorizedText", "Hello 😀")))
  }

  // -- test_it_can_parse_a_bare_bones_table_to_a_Table_element --------------------

  test("bare-bones table: joined text and compact html with br for newline") {
    val html =
      "<html>\n<body>\n  <table>\n" +
        "    <tr><td>Lorem</td><td>Ipsum</td></tr>\n" +
        "    <tr><td>Ut enim non</td><td>ad minim\nveniam quis</td></tr>\n" +
        "  </table>\n</body>\n</html>"
    val ps = parts(html)
    assert(ps.size == 1)
    assert(ps.head.elementType.contains("Table"))
    assert(ps.head.textAsHtml.contains(
      "<table>" +
        "<tr><td>Lorem</td><td>Ipsum</td></tr>" +
        "<tr><td>Ut enim non</td><td>ad minim<br/>veniam quis</td></tr>" +
        "</table>"))
  }

  // -- test_it_accommodates_column_heading_cells_enclosed_in_thead_tbody_and_tfoot --

  test("thead/tbody/tfoot rows flatten into plain tr rows") {
    val html =
      "<table>\n" +
        "  <thead>\n    <tr><th>Lorem</th><th>Ipsum</th></tr>\n  </thead>\n" +
        "  <tbody>\n" +
        "    <tr><th>Lorem ipsum</th><td>dolor sit amet nulla</td></tr>\n" +
        "    <tr><th>Ut enim non</th><td>ad minim\nveniam quis</td></tr>\n" +
        "  </tbody>\n" +
        "  <tfoot>\n    <tr><th>Dolor</th><td>Equis</td></tr>\n  </tfoot>\n" +
        "</table>"
    val ps = parts(html)
    assert(ps.head.textAsHtml.contains(
      "<table>" +
        "<tr><td>Lorem</td><td>Ipsum</td></tr>" +
        "<tr><td>Lorem ipsum</td><td>dolor sit amet nulla</td></tr>" +
        "<tr><td>Ut enim non</td><td>ad minim<br/>veniam quis</td></tr>" +
        "<tr><td>Dolor</td><td>Equis</td></tr>" +
        "</table>"))
  }

  // -- test_it_does_not_emit_a_Table_element_for_a_table_with_no_text -------------

  test("whitespace-only table emits nothing") {
    val html = "<table><tr><td> </td><td> </td></tr><tr><td> </td><td> </td></tr></table>"
    assert(parts(html).isEmpty)
  }

  // -- test_partition_html_reduces_a_nested_table_to_its_text ---------------------

  test("nested tables reduce to text inside the containing cell") {
    val html =
      "<table>\n <tr>\n  <td>\n   <table>\n" +
        "     <tr><td>foo</td><td>bar</td></tr>\n" +
        "     <tr><td>baz</td><td>bng</td></tr>\n" +
        "   </table>\n  </td>\n  <td>\n   <table>\n" +
        "     <tr><td>fizz</td><td>bang</td></tr>\n" +
        "   </table>\n  </td>\n </tr>\n</table>"
    val ps = parts(html)
    assert(ps.size == 1)
    assert(HtmlPartitioner.normalizeWs(ps.head.text) == "foo bar baz bng fizz bang")
    assert(ps.head.textAsHtml.contains(
      "<table><tr><td>foo bar baz bng</td><td>fizz bang</td></tr></table>"))
  }

  // -- test_partition_html_recognizes_h1_to_h6_as_Title_with_category_depth -------

  test("h1-h6 headings are Titles with zero-indexed depth; nested li wins") {
    val html =
      "<p>This is narrative text, it's long, flows and has meaning</p>\n" +
        "<h1>This heading is a title, even though it's long, flows and has meaning</h1>\n" +
        "<h2>A heading that is at the second level</h2>\n" +
        "<h3>Finally, the third heading</h3>\n" +
        "<h4>December 1-17, 2017</h4>\n" +
        "<h5>email@example.com</h5>\n" +
        "<h6>* bullet point</h6>\n" +
        "<h3><li>- invalidly nested list item</li></h3>\n"
    val ps = parts(html)
    assert(ps.size == 8)
    val ts = typed(ps)
    assert(ts(0) == (("NarrativeText", "This is narrative text, it's long, flows and has meaning")))
    assert(ps(0).categoryDepth.isEmpty)
    (1 to 6).foreach { i =>
      assert(ps(i).elementType.contains("Title"), s"element $i")
      assert(ps(i).categoryDepth.contains(i - 1), s"element $i depth")
    }
    assert(ps(7).elementType.contains("ListItem"))
    assert(ps(7).categoryDepth.contains(0))
  }

  // -- test_pre_tag_parsing_respects_order ----------------------------------------

  test("pre tags interleave with flow content in document order") {
    val ts = typed(parts(
      "<pre>The Big Brown Bear</pre>\n" +
        "<div>The big brown bear is growling.</div>\n" +
        "<pre>The big brown bear is sleeping.</pre>\n" +
        "<div>The Big Blue Bear</div>\n"))
    assert(ts == Seq(
      ("CodeSnippet", "The Big Brown Bear"),
      ("NarrativeText", "The big brown bear is growling."),
      ("CodeSnippet", "The big brown bear is sleeping."),
      ("UncategorizedText", "The Big Blue Bear")))
  }

  // -- test_partition_html_with_widely_encompassing_pre_tag -----------------------

  test("document wrapped in a pre tag partitions as CodeSnippet") {
    val html = new String(Files.readAllBytes(
      Paths.get("/root/reference/example-docs/fake-html-pre.htm")), "UTF-8")
    val ps = parts(html)
    assert(ps.nonEmpty)
    assert(ps.head.elementType.contains("CodeSnippet"))
    assert(HtmlPartitioner.normalizeWs(ps.head.text)
      .startsWith("[107th Congress Public Law 56]"))
  }

  // -- test_partition_html_tag_tail_parsing ---------------------------------------

  test("tag tails emit in document order around nested blocks") {
    val ps = parts(
      "<html>\n<body>\n<div>\n    Head\n" +
        "    <div><span>Nested</span></div>\n    Tail\n</div>\n</body>\n</html>\n")
    assert(ps.map(_.text) == Seq("Head", "Nested", "Tail"))
  }

  // -- test_partition_html_from_text_works_with_empty_string ----------------------

  test("empty html yields no elements") {
    assert(parts("").isEmpty)
  }

  // -- test_it_does_not_extract_text_in_script_tags / style -----------------------

  test("script and style content never leaks into elements") {
    val html = "<html><body><p>Keep me</p>" +
      "<script>var x = 'drop me';</script><style>p { color: red; }</style></body></html>"
    val ps = parts(html)
    assert(ps.map(_.text) == Seq("Keep me"))
  }

  // -- test_html_grabs_bulleted_text_in_tags / paras ------------------------------

  test("bulleted paragraph text types as ListItem with the bullet stripped") {
    val sp = spark
    import sp.implicits._
    val ps = parts("<html><body><p>• Bullet one</p><p>●Bullet two</p></body></html>")
    val df = ps.map(p => (p.text, p.classifier)).toDF("text", "classifier")
    val derived = HtmlSource.classifierCascade(col("classifier"), col("text"))
    val out = df.select(derived.as("t"),
      graft.functions.Cleaners.cleanBullets(col("text")).as("clean")).collect()
    assert(out.forall(_.getString(0) == "ListItem"))
    assert(out.map(_.getString(1)).toSeq == Seq("Bullet one", "Bullet two"))
  }

  // -- test_auto.py::test_auto_partition_html_pre_from_file (:271-280) --
  test("fake-html-pre.htm leads with a CodeSnippet, no PageBreaks") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/example-docs/fake-html-pre.htm"))
    val ps = parts(Encodings.decodeText(bytes))
    assert(ps.nonEmpty)
    assert(ps.head.elementType.contains("CodeSnippet"))
    assert(graft.operators.Chunker.normalizeWs(ps.head.text)
      .startsWith("[107th Congress Public Law 56]"))
    assert(!ps.exists(_.elementType.contains("PageBreak")))
  }

  // -- parser.py _page_number tests (html/test_parser.py:328-473) --
  test("data-page-number on the nearest flow ancestor sets page_number") {
    val paras = HtmlPartitioner.partition(
      "<div data-page-number=\"2\"><p>on page two</p></div><p>no page</p>")
    assert(paras.map(p => (p.text, p.pageNumber)) ==
      Vector(("on page two", Some(2)), ("no page", None)))
  }

  test("non-numeric data-page-number falls back to the outer ancestor's") {
    val paras = HtmlPartitioner.partition(
      "<div data-page-number=\"3\"><div data-page-number=\"x\">" +
        "<p>inherits three</p></div></div>")
    assert(paras.head.pageNumber == Some(3))
    // nearest wins over outer when both are valid
    val inner = HtmlPartitioner.partition(
      "<div data-page-number=\"3\"><div data-page-number=\"7\">" +
        "<p>seven</p></div></div>")
    assert(inner.head.pageNumber == Some(7))
  }

  // -- test_partition_html_accommodates_block_item_nested_inside_phrasing_element --
  test("a paragraph inside a citation splits the flow into three elements") {
    val html =
      """
      <div>
        We start out normally
        <cite>
          and then add a citation
          <p>But whoa, this is a paragraph inside a phrasing element.</p>
          so we close the first element at the start of the block element and emit it, then we
          <b>emit</b> the block element,
        </cite>
        and then start a new element for the tail and whatever phrasing follows it.
      </div>
      """
    val ps = parts(html)
    assert(ps.map(_.text) == Vector(
      "We start out normally and then add a citation",
      "But whoa, this is a paragraph inside a phrasing element.",
      "so we close the first element at the start of the block element and emit it," +
        " then we emit the block element," +
        " and then start a new element for the tail and whatever phrasing follows it."))
    assert(ps(2).emphasizedContents == Seq("emit"))
    assert(ps(2).emphasizedTags == Seq("b"))
  }

  // -- test_partition_html_handles_anchor_with_nested_block_item --
  test("anchor with nested block: link on the leading phrase only") {
    val html =
      """
      <div>
        O Deep Thought
        <a href="http://eie.io">
          computer, he said,
          <p>The task we have designed you to perform is this.</p>
          We want you to tell us....
        </a>
        he paused,
      </div>
      """
    val ps = parts(html)
    assert(ps.map(_.text) == Vector(
      "O Deep Thought computer, he said,",
      "The task we have designed you to perform is this.",
      "We want you to tell us.... he paused,"))
    assert(ps(0).linkTexts == Seq("computer, he said,"))
    assert(ps(0).linkUrls == Seq("http://eie.io"))
    assert(ps.drop(1).forall(p => p.linkTexts.isEmpty && p.linkUrls.isEmpty))
  }

  // -- test_containers_with_text_are_processed (email-signature div soup) --
  test("nested text-bearing containers each yield their own typed element") {
    val html =
      "<div dir=3D\"ltr\">Hi All,\n" +
        "  <div><br></div>\n" +
        "  <div>Get excited for our first annual family day!</div>\n" +
        "  <div>Best.<br clear=\"all\">\n" +
        "    <div><br></div>\n" +
        "    -- <br>\n" +
        "    <div dir=3D\"ltr\">\n" +
        "      <div dir=3D\"ltr\">Dino the Datasaur<div>\n" +
        "      Unstructured Technologies<br>\n" +
        "      <div>Data Scientist</div>\n" +
        "      <div>Doylestown, PA 18901</div>\n" +
        "      <div><br></div>\n" +
        "    </div>\n" +
        "  </div>\n" +
        "  See you there!\n" +
        "</div>\n"
    assert(typed(parts(html)) == Seq(
      ("UncategorizedText", "Hi All,"),
      ("NarrativeText", "Get excited for our first annual family day!"),
      ("UncategorizedText", "Best."),
      ("UncategorizedText", "--"),
      ("UncategorizedText", "Dino the Datasaur"),
      ("UncategorizedText", "Unstructured Technologies"),
      ("UncategorizedText", "Data Scientist"),
      ("Address", "Doylestown, PA 18901"),
      ("NarrativeText", "See you there!")))
  }

  // Table gets page_number=self._page_number at parse time (parser.py:563);
  // Image likewise (parser.py:523) — both inherit from the paged ancestor.
  test("Table and Image inherit data-page-number from a flow ancestor") {
    val paras = HtmlPartitioner.partition(
      "<div data-page-number=\"4\">" +
        "<p>sibling text</p>" +
        "<table><tr><td>cell one</td><td>cell two</td></tr></table>" +
        "<img src=\"http://example.com/pic.png\" alt=\"a pic\"/>" +
        "</div>")
    val byType = paras.map(p => p.elementType -> p.pageNumber).toMap
    assert(paras.forall(_.pageNumber == Some(4)), paras.toString)
    assert(byType.contains(Some("Table")) && byType.contains(Some("Image")))
    // a data-page-number on the <table> itself wins over the ancestor's
    val own = HtmlPartitioner.partition(
      "<div data-page-number=\"4\">" +
        "<table data-page-number=\"9\"><tr><td>cell</td></tr></table></div>")
    assert(own.head.pageNumber == Some(9))
  }
}
