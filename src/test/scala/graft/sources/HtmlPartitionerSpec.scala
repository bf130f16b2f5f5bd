package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Behavior tests for the HTML flow/phrasing partitioner (reference:
  * `test_unstructured/partition/html/` + parser principles `parser.py:1-77`). */
class HtmlPartitionerSpec extends AnyFunSuite {

  private def types(html: String): Vector[Option[String]] =
    HtmlPartitioner.partition(html).map(_.elementType)
  private def texts(html: String): Vector[String] =
    HtmlPartitioner.partition(html).map(_.text)

  test("headings become Title with zero-indexed depth") {
    val ps = HtmlPartitioner.partition("<h1>Top</h1><h2>Sub</h2><h6>Deep</h6>")
    assert(ps.map(_.text) == Vector("Top", "Sub", "Deep"))
    assert(ps.map(_.elementType) == Vector(Some("Title"), Some("Title"), Some("Title")))
    assert(ps.map(_.categoryDepth) == Vector(Some(0), Some(1), Some(5)))
  }

  test("paragraphs are untyped (derived downstream); whitespace normalized") {
    val ps = HtmlPartitioner.partition("<p>  Hello   <b>bold</b>\n world </p>")
    assert(ps.size == 1)
    assert(ps(0).text == "Hello bold world")
    assert(ps(0).elementType.isEmpty)
    assert(ps(0).emphasizedContents == Seq("bold"))
    assert(ps(0).emphasizedTags == Seq("b"))
  }

  test("list items typed ListItem with nesting depth") {
    val ps = HtmlPartitioner.partition(
      "<ul><li>one</li><li>two<ul><li>nested</li></ul></li></ul>")
    assert(ps.map(_.text) == Vector("one", "two", "nested"))
    assert(ps.forall(_.elementType.contains("ListItem")))
    assert(ps.map(_.categoryDepth) == Vector(Some(1), Some(1), Some(2)))
  }

  test("empty paragraphs are skipped") {
    assert(HtmlPartitioner.partition("<p>  </p><p></p><div>\n\t</div>").isEmpty)
  }

  test("script, style, comments and removed blocks are dropped") {
    val ps = HtmlPartitioner.partition(
      "<div><script>var x = '<p>no</p>';</script><style>p{}</style>" +
        "<!-- comment --><nav>menu</nav><form>f</form>real text here</div>")
    assert(ps.map(_.text) == Vector("real text here"))
  }

  test("pre preserves interior whitespace as CodeSnippet") {
    val ps = HtmlPartitioner.partition("<pre>\ndef f():\n    return 1\n</pre>")
    assert(ps.size == 1)
    assert(ps(0).elementType.contains("CodeSnippet"))
    assert(ps(0).text == "def f():\n    return 1")
  }

  test("table becomes Table with compact text_as_html") {
    val ps = HtmlPartitioner.partition(
      "<table border=\"1\"><thead><tr><th> H1 </th></tr></thead>" +
        "<tbody><tr><td> a  b </td><td/></tr></tbody></table>")
    assert(ps.size == 1)
    assert(ps(0).elementType.contains("Table"))
    // cell text keeps interior whitespace runs (parser.py:543-552 strips text
    // NODES, not words); only the html render normalizes per cell
    assert(ps(0).text == "H1 a  b")
    assert(ps(0).textAsHtml.contains("<table><tr><td>H1</td></tr><tr><td>a b</td><td/></tr></table>"))
  }

  test("emphasis annotates per text leaf with composite tags (DescribeBold)") {
    // parser.py Bold: `<b>rhombus <i>pentagon</i></b>` -> one entry per leaf,
    // nested leaf carries the composite "bi"
    val ps = HtmlPartitioner.partition("<p><b>rhombus <i>pentagon</i></b></p>")
    assert(ps(0).emphasizedContents == Seq("rhombus", "pentagon"))
    assert(ps(0).emphasizedTags == Seq("b", "bi"))
    // tails are NOT emphasized
    val tail = HtmlPartitioner.partition("<p><b>rhombus</b> pentagon</p>")
    assert(tail(0).text == "rhombus pentagon")
    assert(tail(0).emphasizedContents == Seq("rhombus"))
  }

  test("an anchor boundary splits an enclosing emphasis run (DescribeAnchor)") {
    val ps = HtmlPartitioner.partition(
      """<p>I am <strong><a href="http://eie.io">one with</a> the Force.</strong></p>""")
    assert(ps(0).text == "I am one with the Force.")
    assert(ps(0).emphasizedContents == Seq("one with", "the Force."))
    assert(ps(0).emphasizedTags == Seq("b", "b"))
    assert(ps(0).linkTexts == Seq("one with"))
    assert(ps(0).linkUrls == Seq("http://eie.io"))
  }

  test("nested phrasing inside an anchor annotates the full link text (DescribeAnchor)") {
    val ps = HtmlPartitioner.partition(
      """<p>I am <a href="http://eie.io">one <u>with<i> the</i></u> Force</a>.</p>""")
    assert(ps(0).text == "I am one with the Force.")
    assert(ps(0).emphasizedContents == Seq("the"))
    assert(ps(0).emphasizedTags == Seq("i"))
    assert(ps(0).linkTexts == Seq("one with the Force"))
  }

  test("br splits butted-up phrasing without joining words (DescribeLineBreak)") {
    val ps = HtmlPartitioner.partition(
      "<p><cite>spaceships of the<br/>Vogon Constructor Fleet</cite></p>")
    assert(ps(0).text == "spaceships of the Vogon Constructor Fleet")
  }

  test("img with src becomes Image with alt text") {
    val ps = HtmlPartitioner.partition("<img src=\"http://x/y.png\" alt=\"A pic\">")
    assert(ps.size == 1)
    assert(ps(0).elementType.contains("Image"))
    assert(ps(0).text == "A pic")
    assert(ps(0).imageUrl.contains("http://x/y.png"))
    // no src -> no element
    assert(HtmlPartitioner.partition("<img alt=\"x\">").isEmpty)
  }

  test("anchor produces link annotations") {
    val ps = HtmlPartitioner.partition(
      "<p>See <a href=\"https://example.com\">the docs</a> now</p>")
    assert(ps(0).text == "See the docs now")
    assert(ps(0).linkTexts == Seq("the docs"))
    assert(ps(0).linkUrls == Seq("https://example.com"))
  }

  test("main root jump ignores content outside <main>") {
    val ps = HtmlPartitioner.partition(
      "<body><div>outside</div><main><p>inside</p></main></body>")
    assert(ps.map(_.text) == Vector("inside"))
  }

  test("skip_headers_and_footers drops header/footer subtrees") {
    val html = "<body><header>site nav</header><p>content</p><footer>legal</footer></body>"
    assert(texts(html) == Vector("site nav", "content", "legal"))
    assert(HtmlPartitioner.partition(html, skipHeadersAndFooters = true)
      .map(_.text) == Vector("content"))
  }

  test("entities are unescaped") {
    assert(texts("<p>a &amp; b &lt;c&gt; &#65; &#x42;</p>") == Vector("a & b <c> A B"))
  }

  test("implicitly closed <p> tags split paragraphs") {
    assert(texts("<p>first<p>second") == Vector("first", "second"))
  }

  test("br contributes a line break (normalized to space)") {
    assert(texts("<p>one<br>two</p>") == Vector("one two"))
  }

  test("removed phrasing drops contents but keeps the flow") {
    assert(texts("<p>keep <button>click me</button> going</p>") == Vector("keep going"))
  }

  test("nested blocks inside a div flush surrounding text separately") {
    assert(texts("<div>before<p>middle</p>after</div>") ==
      Vector("before", "middle", "after"))
  }
}
