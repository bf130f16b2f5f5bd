package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HtmlPartitioner.RawPara

/**
 * Parser content-model precedence cases ported from the reference's
 * `test_unstructured/partition/html/test_parser.py` (the 1035-LoC
 * `html/parser.py` flow/phrasing model): blocks nested inside phrasing
 * become their own elements, and an anchor's link annotation goes to exactly
 * one item — the first non-whitespace phrase or the first element a nested
 * block emits (`Anchor.iter_text_segments:695-731`).
 */
class HtmlParserPrecedenceSpec extends AnyFunSuite {

  private def parts(html: String): Vector[RawPara] = HtmlPartitioner.partition(html)

  // -- DescribeAnchor.it_generates_enclosed_block_items_as_separate_elements --
  test("a block inside an anchor splits the phrase into separate elements") {
    val ps = parts(
      """<div><a href="http://eie.io">I am <p>one with</p> the Force.</a></div>""")
    assert(ps.map(_.text) == Vector("I am", "one with", "the Force."))
    // link annotation only on the leading phrase
    assert(ps(0).linkTexts == Seq("I am") && ps(0).linkUrls == Seq("http://eie.io"))
    assert(ps(1).linkTexts.isEmpty && ps(2).linkTexts.isEmpty)
  }

  // -- and_it_annotates_first_enclosed_block_Element_when_no_non_whitespace_
  //    phrase_appears_first --
  test("whitespace-leading anchor annotates the first enclosed block element") {
    val ps = parts(
      "<div><a href=\"http://eie.io\"> \n <p>I am one with</p> the Force.</a></div>")
    assert(ps.map(_.text) == Vector("I am one with", "the Force."))
    assert(ps(0).linkTexts == Seq("I am one with"))
    assert(ps(0).linkUrls == Seq("http://eie.io"))
    assert(ps(1).linkTexts.isEmpty)
  }

  // -- _link_annotate_element preserves any existing link metadata --
  test("outer-anchor annotation appends to the block element's existing links") {
    val ps = parts(
      """<div><a href="http://outer"> <p><a href="http://inner">inner text</a></p></a></div>""")
    assert(ps.map(_.text) == Vector("inner text"))
    assert(ps(0).linkTexts == Seq("inner text", "inner text"))
    assert(ps(0).linkUrls == Seq("http://inner", "http://outer"))
  }

  // -- and_not_when_there_is_no_url --
  test("an anchor without href links nothing, blocks still split") {
    val ps = parts("<div><a>I am <p>one with</p> the Force.</a></div>")
    assert(ps.map(_.text) == Vector("I am", "one with", "the Force."))
    assert(ps.forall(_.linkTexts.isEmpty))
  }

  // -- the search continues past a block that emits nothing --
  test("an empty enclosed block leaves the link for the trailing phrase") {
    val ps = parts("""<div><a href="http://eie.io"> <p>  </p> trailing text</a></div>""")
    assert(ps.map(_.text) == Vector("trailing text"))
    assert(ps(0).linkTexts == Seq("trailing text"))
    assert(ps(0).linkUrls == Seq("http://eie.io"))
  }

  // -- but_not_when_the_text_is_empty: an emitted element with empty text
  //    ends the search unannotated --
  test("an empty-text element (image) consumes the link without annotation") {
    val ps = parts(
      """<div><a href="http://eie.io"> <img src="http://pix/x.png"/> after</a></div>""")
    assert(ps.map(p => (p.elementType, p.text)) ==
      Vector((Some("Image"), ""), (None, "after")))
    assert(ps.forall(_.linkTexts.isEmpty))
  }

  // -- DescribePhrasing.it_generates_elements_for_its_block_children --
  test("a block inside bold splits the run; block text is not emphasized") {
    val ps = parts("<p><b>Hulk <div>smash</div> puny</b> god</p>")
    assert(ps.map(_.text) == Vector("Hulk", "smash", "puny god"))
    assert(ps(0).emphasizedContents == Seq("Hulk") &&
      ps(0).emphasizedTags == Seq("b"))
    // the nested div's text carries no emphasis (iter_elements runs plain)
    assert(ps(1).emphasizedContents.isEmpty)
    // post-block bold text re-annotates inside the fresh phrase
    assert(ps(2).emphasizedContents == Seq("puny") &&
      ps(2).emphasizedTags == Seq("b"))
  }

  // -- DescribeBold.but_not_its_tail / DescribeItalic.but_not_its_tail --
  test("emphasis never covers the tag's tail text") {
    val ps = parts("<p><b>bold</b> tail stays plain</p>")
    assert(ps.map(_.text) == Vector("bold tail stays plain"))
    assert(ps(0).emphasizedContents == Seq("bold"))
    val it = parts("<p><i>lean</i> upright</p>")
    assert(it(0).emphasizedContents == Seq("lean") &&
      it(0).emphasizedTags == Seq("i"))
  }

  // -- multiple nested blocks: only the first candidate is ever linked --
  test("link annotation never spans multiple elements") {
    val ps = parts(
      """<div><a href="http://u">first <p>alpha</p> mid <p>beta</p> last</a></div>""")
    assert(ps.map(_.text) == Vector("first", "alpha", "mid", "beta", "last"))
    assert(ps(0).linkTexts == Seq("first"))
    assert(ps.drop(1).forall(_.linkTexts.isEmpty))
  }

  // -- DescribeRemovedBlock.it_is_skipped_during_parsing (inside phrasing) --
  test("a removed block nested in phrasing drops without splitting the phrase") {
    val ps = parts("<p><b>keep <nav>chrome junk</nav> going</b></p>")
    assert(ps.map(_.text) == Vector("keep going"))
  }

  // -- DescribeDefaultElement.and_it_behaves_like_an_empty_phrasing_element_
  //    inside_a_block_element (reference's own input verbatim) --
  test("an unknown element's contents skip and the phrase continues across it") {
    val ps = parts(
      "<div>\n" +
        "  O Deep Thought computer, he said,\n" +
        "  <foobar>Vogon Constructor Fleet</foobar>\n" +
        "  The task we have designed you to perform is this.\n" +
        "  <p>We want you to tell us.... he paused,</p>\n" +
        "</div>")
    assert(ps.map(_.text) == Vector(
      "O Deep Thought computer, he said, The task we have designed you to perform is this.",
      "We want you to tell us.... he paused,"))
  }

  // -- DefaultElement nested inside phrasing behaves the same --
  test("an unknown element inside phrasing skips without splitting the run") {
    val ps = parts("<p><b>before <gadget>hidden</gadget> after</b></p>")
    assert(ps.map(_.text) == Vector("before after"))
    assert(ps(0).emphasizedContents == Seq("before", "after"))
  }

  // -- test_exclude_tag_types: del/form/noscript contents never surface --
  test("del, form, and noscript contents are excluded entirely") {
    Seq("del", "form", "noscript").foreach { tag =>
      val ps = parts(s"<body>\n  <$tag>\n    There is some text here.\n  </$tag>\n</body>\n")
      assert(ps.isEmpty, s"<$tag> leaked content: $ps")
    }
  }

  // -- test_partition_html_base64_for_images (4-way parametrize) --
  test("data-URI image payload surfaces only when requested") {
    val b64 = "iVBORw0KGgoAAAANSUhEUgAAAAUAAAAFCAYAAACNbyblAAAAHElEQVQI12P4" +
      "//8/w38GIAXDIBKE0DHxgljNBAAO9TXL0Y4OHwAAAABJRU5ErkJggg=="
    val html = s"""<div class="Page"><img src="data:image/png;base64,$b64" alt="Base64 Image"></div>"""
    def img(toPayload: Boolean, types: Seq[String]) =
      HtmlPartitioner.partition(html, extractImageBlockToPayload = toPayload,
        extractImageBlockTypes = types).head
    val on = img(toPayload = true, Seq("Image"))
    assert(on.elementType.contains("Image") && on.text == "Base64 Image")
    assert(on.imageBase64.contains(b64) && on.imageMime.contains("image/png"))
    Seq(
      img(toPayload = true, Nil),
      img(toPayload = true, Seq("Table")),
      img(toPayload = false, Seq("Image"))).foreach { p =>
      assert(p.text == "Base64 Image" && p.elementType.contains("Image"))
      assert(p.imageBase64.isEmpty && p.imageMime.isEmpty)
    }
  }

  // -- test_partition_html_includes_url_for_images: url is unconditional --
  test("http image src rides in image_url regardless of payload options") {
    val ps = parts(
      """<div class="Page"><img src="https://example.com/image.png" alt="URL Image"></div>""")
    assert(ps.head.text == "URL Image")
    assert(ps.head.imageUrl.contains("https://example.com/image.png"))
  }

  // -- a list nested inside an anchor: list items emit with depth --
  test("a list nested inside an anchor emits ListItems; first item takes the link") {
    val ps = parts(
      """<div><a href="http://u"><ul><li>one</li><li>two</li></ul></a></div>""")
    assert(ps.map(p => (p.elementType, p.text)) ==
      Vector((Some("ListItem"), "one"), (Some("ListItem"), "two")))
    assert(ps(0).linkTexts == Seq("one") && ps(0).linkUrls == Seq("http://u"))
    assert(ps(1).linkTexts.isEmpty)
  }

  // -- DescribePre (test_parser.py:580-660): a single newline at the absolute
  // edge of <pre> content strips (one per side); interior whitespace survives
  test("pre strips exactly one absolute-edge newline per side") {
    def pre(html: String): String = parts(html).head.text
    assert(pre("<pre>\n  foo  </pre>") == "  foo  ")
    assert(pre("<pre> \n  foo  </pre>") == " \n  foo  ")
    assert(pre("<pre>\n\n  foo  </pre>") == "\n  foo  ")
    assert(pre("<pre>  foo  \n</pre>") == "  foo  ")
    assert(pre("<pre>  foo  \n </pre>") == "  foo  \n ")
    assert(pre("<pre>  foo  \n\n</pre>") == "  foo  \n")
    assert(pre("<pre>\n  foo  \n</pre>") == "  foo  ")
    assert(pre("<pre> \n  foo  \n </pre>") == " \n  foo  \n ")
  }

  // -- DescribePre.it_assigns_emphasis_and_link_metadata_... +
  // it_generates_CodeSnippet_elements_to_preserve_code_formatting
  test("pre yields CodeSnippet with emphasis/link metadata from phrasing") {
    val ps = parts(
      "<pre>You're <b>turning</b> into a <a href=\"http://eie.io\">penguin</a>.</pre>")
    assert(ps.head.elementType.contains("CodeSnippet"))
    assert(ps.head.text == "You're turning into a penguin.")
    assert(ps.head.emphasizedContents == Seq("turning"))
    assert(ps.head.emphasizedTags == Seq("b"))
    assert(ps.head.linkTexts == Seq("penguin") && ps.head.linkUrls == Seq("http://eie.io"))
    val code = parts("<pre>def hello():\n    print('x')\n    return True</pre>")
    assert(code.head.elementType.contains("CodeSnippet"))
    assert(code.head.text == "def hello():\n    print('x')\n    return True")
  }

  // -- DescribeBold/DescribeItalic (test_parser.py:1303-1405): emphasis
  // annotations nest into compound tags ("bi"); an emphasis tag's TAIL text
  // is not annotated
  test("bold/italic emphasis nests to compound tags and skips tails") {
    val nested = parts("<p><b>rhombus <i>pentagon</i></b> tail</p>")
    assert(nested.head.emphasizedContents == Seq("rhombus", "pentagon"))
    assert(nested.head.emphasizedTags == Seq("b", "bi"))
    val tailCase = parts("<p><b>rhombus</b> pentagon</p>")
    assert(tailCase.head.emphasizedContents == Seq("rhombus"))
    assert(tailCase.head.emphasizedTags == Seq("b"))
    // <strong> annotates as "b", <i> as "i"
    val mixed = parts("<p><i>solo</i> and <strong>strong</strong></p>")
    assert(mixed.head.emphasizedContents == Seq("solo", "strong"))
    assert(mixed.head.emphasizedTags == Seq("i", "b"))
  }
}
