package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Element, ElementMetadata, ElementType}

/**
 * 1:1 ports of the reference chunking suite's PARAMETRIZE matrices — one
 * test per parameter row, same inputs, same expected values:
 *
 *  - the four table-behavior option matrices of BOTH entry points
 *    (`test_basic.py:232-301` Describe_chunk_elements,
 *    `test_title.py:557-630` Describe_chunk_by_title): each option resolves
 *    absent/None to its default through `ChunkingOptions.validated`;
 *  - `_ByTitleChunkingOptions` rows (`test_title.py:637-703`);
 *  - `PreChunkBuilder.will_fit` rows (`test_base.py:536-600`);
 *  - `PreChunk` equality / none-text / skip-table / can-combine /
 *    overlap-tail / concatenated-text rows (`test_base.py:679-899`);
 *  - `_TextSplitter` boundary rows (`test_base.py:3072-3111`).
 */
class ChunkerMatrixPortSpec extends AnyFunSuite {

  private var nextSeq = 0L
  private def el(tpe: String, text: String, page: Option[Int] = None): Element = {
    nextSeq += 1
    Element("", tpe, text, "doc1", nextSeq, ElementMetadata(page_number = page))
  }
  private def text(t: String) = el(ElementType.NarrativeText, t)
  private def table(t: String) = el(ElementType.Table, t)
  private def pageBreak() = el(ElementType.PageBreak, "")
  private def image(t: String) = el(ElementType.Image, t)

  private def preChunksOf(els: Seq[Element],
      opts: ChunkingOptions): Vector[Chunker.PreChunk] =
    Chunker.preChunks(els.iterator, opts).toVector

  // ==============================================================================
  // option-resolution matrices — test_basic.py:232-301 and test_title.py:557-630.
  // The reference pins that each entry point RESOLVES the kwarg: explicit
  // True/False pass through, None and absent fall to the default.
  // ==============================================================================

  private val entryPoints = Seq("chunk_elements" -> false, "chunk_by_title" -> true)

  for ((entry, byTitle) <- entryPoints) {
    // -- it_supports_the_include_orig_elements_option (4 rows) --
    for ((kwarg, expected) <- Seq(Some(true) -> true, Some(false) -> false,
        None -> true)) {
      test(s"$entry: include_orig_elements=$kwarg resolves to $expected") {
        assert(ChunkingOptions.validated(byTitle = byTitle,
          includeOrigElements = kwarg).includeOrigElements == expected)
      }
    }
    test(s"$entry: include_orig_elements absent resolves to true") {
      assert(ChunkingOptions.validated(byTitle = byTitle).includeOrigElements)
    }

    // -- it_supports_the_repeat_table_headers_option (4 rows) --
    for ((kwarg, expected) <- Seq(Some(true) -> true, Some(false) -> false,
        None -> true)) {
      test(s"$entry: repeat_table_headers=$kwarg resolves to $expected") {
        assert(ChunkingOptions.validated(byTitle = byTitle,
          repeatTableHeaders = kwarg).repeatTableHeaders == expected)
      }
    }
    test(s"$entry: repeat_table_headers absent resolves to true") {
      assert(ChunkingOptions.validated(byTitle = byTitle).repeatTableHeaders)
    }

    // -- it_supports_the_skip_table_chunking_option (4 rows) --
    for ((kwarg, expected) <- Seq(Some(true) -> true, Some(false) -> false,
        None -> false)) {
      test(s"$entry: skip_table_chunking=$kwarg resolves to $expected") {
        assert(ChunkingOptions.validated(byTitle = byTitle,
          skipTableChunking = kwarg).skipTableChunking == expected)
      }
    }
    test(s"$entry: skip_table_chunking absent resolves to false") {
      assert(!ChunkingOptions.validated(byTitle = byTitle).skipTableChunking)
    }

    // -- it_supports_the_isolate_table_option (4 rows) --
    for ((kwarg, expected) <- Seq(Some(true) -> true, Some(false) -> false,
        None -> true)) {
      test(s"$entry: isolate_table=$kwarg resolves to $expected") {
        assert(ChunkingOptions.validated(byTitle = byTitle,
          isolateTable = kwarg).isolateTable == expected)
      }
    }
    test(s"$entry: isolate_table absent resolves to true") {
      assert(ChunkingOptions.validated(byTitle = byTitle).isolateTable)
    }
  }

  // ==============================================================================
  // _ByTitleChunkingOptions rows — test_title.py:637-703
  // ==============================================================================

  // -- it_rejects_combine_text_under_n_chars_for_n_less_than_zero (2 rows) --
  for (n <- Seq(-1, -42)) {
    test(s"by_title options: combine_text_under_n_chars=$n is rejected") {
      assertThrows[IllegalArgumentException](
        ChunkingOptions.validated(byTitle = true,
          combineTextUnderNChars = Some(n)))
    }
  }

  test("by_title options: combine_text_under_n_chars=0 disables combining") {
    assert(ChunkingOptions.validated(byTitle = true,
      combineTextUnderNChars = Some(0)).combineUnder == 0)
  }

  test("by_title options: combine_text_under_n_chars accepted by itself") {
    assert(ChunkingOptions.validated(byTitle = true,
      combineTextUnderNChars = Some(50)).combineUnder == 50)
  }

  // -- it_rejects_combine_text_under_n_chars_greater_than_maxchars (2 rows) --
  for ((combine, maxChars) <- Seq((600, None), (600, Some(450)))) {
    test(s"by_title options: combine=$combine > max_characters=$maxChars rejected") {
      assertThrows[IllegalArgumentException](
        ChunkingOptions.validated(byTitle = true, maxCharacters = maxChars,
          combineTextUnderNChars = Some(combine)))
    }
  }

  test("by_title options: new_after_n_chars accepted by itself") {
    assert(ChunkingOptions.validated(byTitle = true,
      newAfterNChars = Some(200)).softMax == 200)
  }

  // -- it_knows_whether_to_break_chunks_on_page_boundaries (3 rows) --
  for ((kwarg, expected) <- Seq(Some(true) -> true, Some(false) -> false,
      None -> true)) {
    test(s"by_title options: multipage_sections=$kwarg resolves to $expected") {
      assert(ChunkingOptions.validated(byTitle = true,
        multipageSections = kwarg).multipageSections == expected)
    }
  }

  // ==============================================================================
  // PreChunkBuilder.will_fit rows — test_base.py:536-600, observed through the
  // public pre-chunking fold: an element that does not fit starts a new
  // pre-chunk, so the fitting decision IS the pre-chunk boundary.
  // ==============================================================================

  test("builder fits an oversized element when empty (test_base.py:540)") {
    val pcs = preChunksOf(Seq(text("abcd " * 200)), ChunkingOptions())
    assert(pcs.size == 1 && pcs.head.elements.size == 1)
  }

  // -- but_not_when_it_already_contains_an_element (2 rows, :544-557) --
  test("builder: oversized text does not join an existing text element") {
    val pcs = preChunksOf(Seq(text("abcd"), text("abcd " * 200)), ChunkingOptions())
    assert(pcs.size == 2 && pcs.map(_.elements.size) == Vector(1, 1))
  }
  test("builder: oversized text does not join an existing table element") {
    val pcs = preChunksOf(Seq(table("Heading\nCell text"), text("abcd " * 200)),
      ChunkingOptions())
    assert(pcs.size == 2 && pcs.map(_.elements.size) == Vector(1, 1))
  }

  // -- it_will_not_fit_another_element_when_it_already_contains_a_table
  // -- (2 rows, :559-564) --
  test("builder: text does not join a pre-chunk holding a table") {
    val pcs = preChunksOf(Seq(table("Heading\nCell text"), text("abcd")),
      ChunkingOptions())
    assert(pcs.size == 2)
  }
  test("builder: a second table does not join a pre-chunk holding a table") {
    val pcs = preChunksOf(Seq(table("Heading\nCell text"), table("Fruits\nMango")),
      ChunkingOptions())
    assert(pcs.size == 2)
  }

  test("builder: a table does not join a pre-chunk holding text (:566-570)") {
    val pcs = preChunksOf(Seq(text("Preamble."), table("Heading\nCell text")),
      ChunkingOptions(maxCharacters = 500))
    assert(pcs.size == 2)
  }

  test("builder: nothing fits once text length exceeds the soft max (:572-579)") {
    val pcs = preChunksOf(
      Seq(text("Lorem ipsum dolor sit amet consectetur adipiscing elit."), // 55
        text("In rhoncus ipsum.")),
      ChunkingOptions(maxCharacters = 100, newAfterNChars = Some(50)))
    assert(pcs.size == 2)
  }

  test("builder: an element that would exceed the hard max starts a new " +
      "pre-chunk (:581-592)") {
    // 55 + 2 (separator) + 44 == 101 > 100
    val pcs = preChunksOf(
      Seq(text("Lorem ipsum dolor sit amet consectetur adipiscing elit."),
        text("In rhoncus ipsum sed lectus portos volutpat.")),
      ChunkingOptions(maxCharacters = 100))
    assert(pcs.size == 2)
  }

  test("builder: an element that exactly fits the hard max joins (:594-600)") {
    // 55 + 2 (separator) + 43 == 100
    val pcs = preChunksOf(
      Seq(text("Lorem ipsum dolor sit amet consectetur adipiscing elit."),
        text("In rhoncus ipsum sed lectus porto volutpat.")),
      ChunkingOptions(maxCharacters = 100))
    assert(pcs.size == 1 && pcs.head.elements.size == 2)
  }

  // ==============================================================================
  // PreChunk equality matrix — test_base.py:682-710 (5 rows)
  // ==============================================================================

  private def preChunk(texts: Seq[String], overlapPfx: String,
      opts: ChunkingOptions = ChunkingOptions()): Chunker.PreChunk = {
    // fixed seq per position so equal text lists build equal elements
    val els = texts.zipWithIndex.map { case (t, i) =>
      Element("", ElementType.NarrativeText, t, "doc1", i.toLong,
        ElementMetadata.empty)
    }
    Chunker.PreChunk(els.toVector, overlapPfx, opts)
  }

  private val eqRows = Seq(
    ("foo", Seq("bar", "baz"), "foo", Seq("bar", "baz"), true),
    ("", Seq("bar", "baz"), "", Seq("bar", "baz"), true),
    ("foo", Seq("bar", "baz"), "fob", Seq("bar", "baz"), false),
    ("foo", Seq("bar", "baz"), "foo", Seq("bah", "dah"), false),
    ("", Seq("bar", "baz"), "foo", Seq("bah", "dah"), false))
  for (((pfx, texts, oPfx, oTexts, expected), i) <- eqRows.zipWithIndex) {
    test(s"PreChunk equality row $i: ($pfx, $texts) vs ($oPfx, $oTexts) -> $expected") {
      assert((preChunk(texts, pfx) == preChunk(oTexts, oPfx)) == expected)
    }
  }

  // -- it_can_handle_element_with_none_as_text (:717-721; None renders as
  // -- an empty-text Image here — the element contributes no segment) --
  test("PreChunk text skips a no-text Image element") {
    val pc = Chunker.PreChunk(Vector(image(""), text("hello")), "",
      ChunkingOptions())
    assert(pc.text == "hello")
  }

  test("chunking elements with no-text Images yields one clean chunk (:723-735)") {
    val chunks = Chunker.chunkDoc("doc1",
      Seq(image(""), text("hello world"), image("")).iterator,
      ChunkingOptions()).toVector
    assert(chunks.size == 1 && chunks.head.text == "hello world")
  }

  // -- skip_table_chunking through the PreChunk chunk generator (:737-759) --
  test("PreChunk yields an oversized table unchanged when skip_table_chunking") {
    val t = table(("cell " * 200).trim)
    val chunks = Chunker.chunkDoc("doc1", Seq(t).iterator,
      ChunkingOptions(maxCharacters = 100, skipTableChunking = true)).toVector
    assert(chunks.size == 1 && chunks.head.`type` == ElementType.Table &&
      chunks.head.text == t.text)
  }
  test("PreChunk splits an oversized table when skip_table_chunking=false") {
    val chunks = Chunker.chunkDoc("doc1", Seq(table(("cell " * 200).trim)).iterator,
      ChunkingOptions(maxCharacters = 100, skipTableChunking = false)).toVector
    assert(chunks.size > 1 && chunks.forall(_.`type` == ElementType.TableChunk))
  }

  // ==============================================================================
  // can_combine matrix — test_base.py:760-801 (3 rows + table rule)
  // ==============================================================================

  private val combineRows = Seq((100, 73, true), (100, 72, false), (99, 73, false))
  for ((maxChars, combineUnder, expected) <- combineRows) {
    test(s"can_combine(max=$maxChars, combine_under=$combineUnder) -> $expected") {
      val opts = ChunkingOptions(maxCharacters = maxChars,
        combineTextUnderNChars = Some(combineUnder), overlap = 20,
        overlapAll = true)
      // prefix 20 + sep 2 + text 50 = 72; combined 72 + 2 + 26 = 100
      val pc = preChunk(Seq("Lorem ipsum dolor sit amet consectetur adipiscing."),
        "e feugiat efficitur.", opts)
      val next = preChunk(Seq("In rhoncus sum sed lectus."),
        "sectetur adipiscing.", opts)
      assert(pc.canCombine(next) == expected)
    }
  }

  test("can_combine: a table on either side forbids combining (:801-807)") {
    val opts = ChunkingOptions(maxCharacters = 500,
      combineTextUnderNChars = Some(500))
    val textPc = Chunker.PreChunk(Vector(text("hello")), "", opts)
    val tablePc = Chunker.PreChunk(Vector(table("Heading\nCell text")), "", opts)
    assert(!textPc.canCombine(tablePc) && !tablePc.canCombine(textPc))
  }

  test("combine() appends the other's elements, keeps OUR prefix, mutates " +
      "neither (:809-860)") {
    val opts = ChunkingOptions()
    val a = preChunk(Seq("Lorem ipsum dolor sit amet consectetur adipiscing elit.",
      "In rhoncus ipsum sed lectus porta volutpat."), "feugiat efficitur.", opts)
    val b = preChunk(Seq("Donec semper facilisis metus finibus malesuada.",
      "Vivamus magna nibh, blandit eu dui congue, feugiat efficitur velit."),
      "porta volupat.", opts)
    val combined = a.combine(b)
    assert(combined.elements == a.elements ++ b.elements)
    assert(combined.overlapPrefix == "feugiat efficitur.")
    // case-class immutability: originals unchanged
    assert(a.elements.size == 2 && b.overlapPrefix == "porta volupat.")
  }

  // ==============================================================================
  // overlap-tail matrix — test_base.py:862-877 (2 rows)
  // ==============================================================================

  private val tailRows = Seq(
    ("In rhoncus ipsum sed lectus porta volutpat.", "ctus porta volutpat."),
    ("In rhoncus ipsum sed lect us   portas volutpat.  ", "us portas volutpat."))
  for (((input, expected), i) <- tailRows.zipWithIndex) {
    test(s"overlap tail row $i strips whitespace around the last 20 chars") {
      val pc = Chunker.PreChunk(Vector(text(input)), "",
        ChunkingOptions(overlap = 20, overlapAll = true))
      assert(pc.overlapTail == expected)
    }
  }

  // ==============================================================================
  // concatenated-text matrix — test_base.py:879-897 (4 rows): blank-line join,
  // no separator for elements that contribute no text, prefix first
  // ==============================================================================

  private val textRows: Seq[(Seq[Element], String, String)] = Seq(
    (Seq(text("foo"), text("bar")), "bah da bing.", "bah da bing.\n\nfoo\n\nbar"),
    (Seq(text("foo"), pageBreak(), text("bar")), "da bang.", "da bang.\n\nfoo\n\nbar"),
    (Seq(pageBreak(), text("foo")), "bah da boom.", "bah da boom.\n\nfoo"),
    (Seq(text("foo"), text("bar"), pageBreak()), "", "foo\n\nbar"))
  for (((els, pfx, expected), i) <- textRows.zipWithIndex) {
    test(s"PreChunk text row $i: prefix '$pfx' joins with blank lines") {
      assert(Chunker.PreChunk(els.toVector, pfx, ChunkingOptions()).text == expected)
    }
  }

  // ==============================================================================
  // _TextSplitter boundary rows — test_base.py:3072-3111
  // ==============================================================================

  // -- it_does_not_split_a_string_that_is_not_longer_than_maxlen (2 rows) --
  for (t <- Seq("Lorem ipsum dolor amet consectetur adipiscing.", // 46 chars
      "Lorem ipsum dolor.")) { // 18 chars
    test(s"TextSplitter returns '${t.take(20)}...' (${t.length} <= 46) unchanged") {
      val split = new Chunker.TextSplitter(
        ChunkingOptions(maxCharacters = 46, overlap = 10))
      val (s, remainder) = split(t)
      assert(s == t && remainder == "")
    }
  }

  test("TextSplitter fills the window on the arbitrary-character fallback (:3088)") {
    val split = new Chunker.TextSplitter(
      ChunkingOptions(maxCharacters = 38, overlap = 10))
    val (s, _) = split(
      "Loremipsumdolorametconsecteturadipiscingelit. In rhoncus ipsum sed lectus porta.")
    assert(s == "Loremipsumdolorametconsecteturadipisci" && s.length == 38)
  }

  test("TextSplitter strips whitespace around the split (:3098, newline+space)") {
    val split = new Chunker.TextSplitter(
      ChunkingOptions(maxCharacters = 50, overlap = 10))
    val (s, remainder) = split(
      "Lorem ipsum dolor amet consectetur adipiscing.   \n\n In rhoncus ipsum sed lectus.")
    assert(s == "Lorem ipsum dolor amet consectetur adipiscing.")
    assert(remainder == "ipiscing. In rhoncus ipsum sed lectus.")
  }

  // ==============================================================================
  // _RowAccumulator / _CellAccumulator will-fit boundary rows —
  // test_base.py:3128-3260, observed through the table splitter: a row/cell
  // that fits stays in the current subtable, one that does not starts (or
  // word-splits into) the next.
  // ==============================================================================

  private def splits(html: String, maxChars: Int): Vector[String] =
    Chunker.TableChunker.syncSplits(Chunker.TableChunker.parseRows(html),
      ChunkingOptions(maxCharacters = maxChars))._1.map(_._1)

  // -- it_will_fit_a_row_with_text_shorter_than_maxlen_when_empty (maxlen=21) --
  private val rowEmptyRows = Seq(
    ("<tr><td>Lorem Ipsum.</td></tr>", Vector("Lorem Ipsum.")),          // 12
    ("<tr><td>Lorem Ipsum dolor sit</td></tr>",
      Vector("Lorem Ipsum dolor sit")),                                  // 21
    ("<tr><td>Lorem</td><td>Sit amet</td></tr>", Vector("Lorem Sit amet"))) // 14
  for (((html, expected), i) <- rowEmptyRows.zipWithIndex) {
    test(s"row accumulator (empty, maxlen=21) fits row $i whole") {
      assert(splits(s"<table>$html</table>", 21) == expected)
    }
  }
  test("row accumulator (empty, maxlen=21): a 27-char row word-splits") {
    val got = splits("<table><tr><td>Lorem Ipsum dolor sit amet.</td></tr></table>", 21)
    assert(got.size > 1 && got.head != "Lorem Ipsum dolor sit amet.")
  }
  test("row accumulator (empty, maxlen=21): a 22-char 2-cell row splits on the cell boundary") {
    assert(splits(
      "<table><tr><td>Lorem Ipsum</td><td>Dolor sit.</td></tr></table>", 21) ==
      Vector("Lorem Ipsum", "Dolor sit."))
  }

  // -- and_it_will_fit_a_row_with_text_shorter_than_remaining_space_when_not_
  // -- empty (maxlen=48; 26-char filler row leaves 48-26-1 = 21) --
  private val filler = "<tr><td>abcdefghijklmnopqrstuvwxyz</td></tr>"
  private val rowJoinRows = Seq(
    ("<tr/>", 1),                                               // 0 chars
    ("<tr><td/></tr>", 1),                                      // 0 chars
    ("<tr><td>Lorem Ipsum.</td></tr>", 1),                      // 12
    ("<tr><td>Lorem Ipsum dolor sit</td></tr>", 1),             // 21 == remaining
    ("<tr><td>Lorem</td><td>Sit amet</td></tr>", 1),            // 14
    ("<tr><td>Lorem Ipsum dolor sit amet.</td></tr>", 2),       // 27 > 21
    ("<tr><td>Lorem Ipsum</td><td>Dolor sit.</td></tr>", 2))    // 22 > 21
  for (((rowHtml, expectedChunks), i) <- rowJoinRows.zipWithIndex) {
    test(s"row accumulator (26-char row held, maxlen=48) row $i -> " +
        s"$expectedChunks subtable(s)") {
      val got = splits(s"<table>$filler$rowHtml</table>", 48)
      assert(got.size == expectedChunks, got)
      assert(got.head.startsWith("abcdefghijklmnopqrstuvwxyz"), got)
    }
  }

  // -- _CellAccumulator boundaries: an oversized row falls to per-cell
  // -- accumulation; a cell over the window word-splits (maxlen=25) --
  test("cell accumulator: a 22-char cell fits the 25-char window whole") {
    assert(splits("<table><tr><td>Lorem Ipsum dolor sit.</td></tr></table>", 25) ==
      Vector("Lorem Ipsum dolor sit."))
  }
  // (an oversized cell below a ~33-char window is outside the operator's
  // domain: the reference word-split budget is maxlen minus 33 chars of html
  // scaffolding, base.py:1277 — the even-word-boundary behavior is pinned at
  // maxlen=100 by the reference-vector test in ChunkerSpec)

  // -- and_it_will_fit_a_cell_with_text_shorter_than_remaining_space_when_not_
  // -- empty (maxlen=44; a 26-char cell held leaves 44-26-1 = 17) --
  private val cellJoinRows = Seq(
    ("Lorem Ipsum.", 1),        // 12 <= 17 (whole row fits too: 39 <= 44)
    ("Lorem Ipsum amet.", 1),   // 17 == remaining (row 44 == maxlen)
    ("Lorem Ipsum dolor.", 2),  // 18 > 17 -> flush, second subtable
    ("Lorem Ipsum dolor sit amet.", 2)) // 27 > 17
  for (((cell, expectedChunks), i) <- cellJoinRows.zipWithIndex) {
    test(s"cell accumulator (26-char cell held, maxlen=44) cell $i -> " +
        s"$expectedChunks subtable(s)") {
      val got = splits(
        s"<table><tr><td>abcdefghijklmnopqrstuvwxyz</td><td>$cell</td></tr></table>", 44)
      assert(got.size == expectedChunks, got)
      assert(got.head.startsWith("abcdefghijklmnopqrstuvwxyz"), got)
      assert(got.last.endsWith(cell.split(' ').last), got)
    }
  }
}
