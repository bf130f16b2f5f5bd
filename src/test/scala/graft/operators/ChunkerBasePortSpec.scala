package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Element, ElementMetadata, ElementType}
import graft.sinks.ElementJson

/**
 * Second tranche of behavior tests ported from
 * `/root/reference/test_unstructured/chunking/test_base.py` — the PreChunker /
 * PreChunkBuilder window-fitting rules, the pre-chunk combiner/accumulator, the
 * boundary predicates, and the `_TableChunker` + cell/row accumulator family.
 *
 * The reference tests drive internal builder objects (`builder._text_length`,
 * `accum.will_fit(...)`); here each rule is pinned through its observable
 * outcome — which elements land in the same pre-chunk / sub-table chunk —
 * via the public `preChunks` / `combinePreChunks` / `TableChunker` kernels.
 */
class ChunkerBasePortSpec extends AnyFunSuite {

  private var nextSeq = 0L
  private def el(tpe: String, text: String, page: Option[Int] = None,
      html: Option[String] = None): Element = {
    nextSeq += 1
    Element("", tpe, text, "doc1", nextSeq,
      ElementMetadata(page_number = page, text_as_html = html))
  }
  private def title(t: String) = el(ElementType.Title, t)
  private def text(t: String) = el(ElementType.NarrativeText, t)
  private def table(t: String, html: Option[String] = None) =
    el(ElementType.Table, t, html = html)

  private def pcs(els: Seq[Element], opts: ChunkingOptions): Vector[Chunker.PreChunk] =
    Chunker.preChunks(els.iterator, opts).toVector

  private def groups(els: Seq[Element], opts: ChunkingOptions): Vector[Vector[String]] =
    pcs(els, opts).map(_.elements.map(_.text))

  // ================================================================ PreChunker

  // -- it_gathers_elements_into_pre_chunks_respecting_the_specified_chunk_size
  //    (test_base.py:468) --
  test("gathers elements into pre-chunks respecting the specified chunk size") {
    val els = Seq(
      title("Lorem Ipsum"),
      text("Lorem ipsum dolor sit amet, consectetur adipiscing elit."),
      text("Sed do eiusmod tempor incididunt ut labore et dolore magna aliqua."),
      title("Ut Enim"),
      text("Ut enim ad minim veniam, quis nostrud exercitation ullamco laboris nisi."),
      text("Ut aliquip ex ea commodo consequat."),
      el(ElementType.CheckBox, ""))
    val opts = ChunkingOptions(maxCharacters = 150, newAfterNChars = Some(65))
    assert(groups(els, opts) == Vector(
      Vector("Lorem Ipsum",
        "Lorem ipsum dolor sit amet, consectetur adipiscing elit."),
      Vector("Sed do eiusmod tempor incididunt ut labore et dolore magna aliqua."),
      Vector("Ut Enim",
        "Ut enim ad minim veniam, quis nostrud exercitation ullamco laboris nisi."),
      Vector("Ut aliquip ex ea commodo consequat.", "")))
  }

  // ============================================================ PreChunkBuilder

  // -- it_accumulates_elements_added_to_it (test_base.py:522) --
  test("accumulates elements that together fit the window into one pre-chunk") {
    val els = Seq(
      title("Introduction"),
      text("Lorem ipsum dolor sit amet consectetur adipiscing elit. In rhoncus ipsum sed" +
        "lectus porta volutpat."))
    assert(groups(els, ChunkingOptions(maxCharacters = 150)).size == 1)
  }

  // -- it_will_fit_when_element_has_none_as_text (test_base.py:537) --
  test("an element with null text always fits") {
    val els = Seq(text("abcd"), el(ElementType.Image, null))
    val ps = pcs(els, ChunkingOptions())
    assert(ps.size == 1 && ps.head.elements.size == 2)
    assert(ps.head.text == "abcd") // null text contributes no segment
  }

  // -- it_will_fit_an_oversized_element_when_empty (test_base.py:541) --
  test("an oversized element fits an empty builder, isolated in its own pre-chunk") {
    val oversized = text(("abcd " * 200).trim + " ")
    assert(groups(Seq(oversized), ChunkingOptions()).size == 1)
  }

  // -- but_not_when_it_already_contains_an_element (test_base.py:545) --
  test("an oversized element does not join an existing element") {
    val big = "abcd " * 200
    assert(groups(Seq(text("abcd"), text(big)), ChunkingOptions()).size == 2)
    assert(groups(Seq(table("Heading\nCell text"), text(big)), ChunkingOptions()).size == 2)
  }

  // -- it_will_not_fit_another_element_when_it_already_contains_a_table
  //    (test_base.py:559) --
  test("nothing fits after a table (table isolation)") {
    assert(groups(Seq(table("Heading\nCell text"), text("abcd")), ChunkingOptions()).size == 2)
    assert(groups(Seq(table("Heading\nCell text"), table("Fruits\nMango")),
      ChunkingOptions()).size == 2)
  }

  // -- it_will_not_fit_a_table_when_the_pre_chunk_already_has_other_elements
  //    (test_base.py:566) --
  test("a table does not join existing non-table elements") {
    assert(groups(Seq(text("Preamble."), table("Heading\nCell text")),
      ChunkingOptions(maxCharacters = 500)).size == 2)
  }

  // -- it_will_not_fit_an_element_when_it_already_exceeds_the_soft_maxlen
  //    (test_base.py:572) --
  test("nothing more fits once accumulated text exceeds the soft max") {
    val els = Seq(
      text("Lorem ipsum dolor sit amet consectetur adipiscing elit."), // 55 chars (no comma)
      text("In rhoncus ipsum."))
    assert(groups(els,
      ChunkingOptions(maxCharacters = 100, newAfterNChars = Some(50))).size == 2)
  }

  // -- and_it_will_not_fit_an_element_when_that_would_cause_it_to_exceed_the
  //    _hard_maxlen / but_it_will_fit_an_element_that_fits (test_base.py:579-597) --
  test("hard max is respected to the exact separator-inclusive character") {
    val first = text("Lorem ipsum dolor sit amet consectetur adipiscing elit.") // 55
    // 55 + 2 (separator) + 44 == 101 > 100 -> two pre-chunks
    assert(groups(Seq(first, text("In rhoncus ipsum sed lectus portos volutpat.")),
      ChunkingOptions(maxCharacters = 100)).size == 2)
    // 55 + 2 + 43 == 100 -> one pre-chunk
    assert(groups(Seq(el(ElementType.NarrativeText,
      "Lorem ipsum dolor sit amet consectetur adipiscing elit."),
      text("In rhoncus ipsum sed lectus porto volutpat.")),
      ChunkingOptions(maxCharacters = 100)).size == 1)
  }

  // -- but_it_does_not_generate_a_pre_chunk_on_flush_when_empty (test_base.py:625) --
  test("no elements yield no pre-chunks") {
    assert(pcs(Seq.empty, ChunkingOptions()).isEmpty)
  }

  // -- it_computes_overlap_from_each_pre_chunk_and_applies_it_to_the_next
  //    (test_base.py:634): table pre-chunks neither take nor give overlap --
  test("table pre-chunks neither inherit nor donate the overlap tail") {
    val opts = ChunkingOptions(maxCharacters = 60, overlap = 15, overlapAll = true)
    val ps = pcs(Seq(
      text("Lorem ipsum dolor sit amet consectetur adipiscing elit."),
      table("In rhoncus ipsum sed lectus porta volutpat."),
      text("Donec semper facilisis metus finibus.")), opts)
    assert(ps.map(_.text) == Vector(
      "Lorem ipsum dolor sit amet consectetur adipiscing elit.",
      "In rhoncus ipsum sed lectus porta volutpat.", // no overlap INTO a table
      "Donec semper facilisis metus finibus."))      // none OUT of a table either
    // contrast: text -> text across the same boundary does carry the tail
    val ps2 = pcs(Seq(
      text("Lorem ipsum dolor sit amet consectetur adipiscing elit."),
      text("Donec semper facilisis metus finibus.")), opts)
    assert(ps2.size == 2)
    assert(ps2(1).text == "dipiscing elit.\n\nDonec semper facilisis metus finibus.")
  }

  // -- it_considers_separator_length_when_computing_text_length_and_remaining_space
  //    (test_base.py:663) --
  test("remaining space accounts for one separator per accumulated segment") {
    // 50 - (5 + 2 + 5) - 2 = 36 chars of genuine remaining space
    val fits = Seq(text("abcde"), text("fghij"), text("x" * 36))
    assert(groups(fits, ChunkingOptions(maxCharacters = 50)).size == 1)
    val overflows = Seq(text("abcde"), text("fghij"), text("x" * 37))
    assert(groups(overflows, ChunkingOptions(maxCharacters = 50)).size == 2)
  }

  // ======================================================= _PreChunkAccumulator

  // -- it_generates_a_combined_PreChunk_when_flushed_and_resets_itself_to_empty
  //    (test_base.py:3508) --
  test("combiner merges combinable pre-chunks keeping only the first overlap prefix") {
    val opts = ChunkingOptions(combineTextUnderNChars = Some(500), byTitle = true)
    val pc1 = Chunker.PreChunk(Vector(title("Lorem Ipsum"),
      text("Lorem ipsum dolor sit amet consectetur adipiscing elit.")), "elementum.", opts)
    val pc2 = Chunker.PreChunk(Vector(title("Mauris Nec"),
      text("Mauris nec urna non augue vulputate consequat eget et nisi.")), "sit amet.", opts)
    val pc3 = Chunker.PreChunk(Vector(title("Sed Orci"),
      text("Sed orci quam, eleifend sit amet vehicula, elementum ultricies quam.")),
      "consequat.", opts)
    val out = Chunker.combinePreChunks(Iterator(pc1, pc2, pc3), opts).toVector
    assert(out.size == 1)
    assert(out.head.elements.map(_.text) == (pc1.elements ++ pc2.elements ++ pc3.elements)
      .map(_.text))
    assert(out.head.overlapPrefix == "elementum.")
    assert(out.head.text.startsWith("elementum.\n\nLorem Ipsum"))
  }

  // -- but_it_does_not_generate_a_PreChunk_on_flush_when_empty (test_base.py:3568) --
  test("combiner over no pre-chunks yields none") {
    assert(Chunker.combinePreChunks(Iterator.empty, ChunkingOptions(byTitle = true)).isEmpty)
  }

  // ====================================================== boundary predicates

  // -- Describe_is_title (test_base.py:3626): only Title starts a new section --
  test("only a Title element opens a by-title semantic boundary") {
    val opts = ChunkingOptions(byTitle = true)
    val split = groups(Seq(text("aaa"), title("Heading"), text("bbb")), opts)
    assert(split == Vector(Vector("aaa"), Vector("Heading", "bbb")))
    // PageBreak and plain Text do not
    val noSplit = groups(Seq(text("aaa"), el(ElementType.PageBreak, ""), text("bbb")), opts)
    assert(noSplit.size == 1)
  }

  // ============================================================== _Chunker

  // -- but_it_generates_no_chunks_when_the_pre_chunk_contains_no_text
  //    (test_base.py:1060) --
  test("a pre-chunk with no text generates no chunks") {
    val out = Chunker.chunkDoc("doc1",
      Iterator(el(ElementType.PageBreak, "  ")), ChunkingOptions()).toVector
    assert(out.isEmpty)
  }

  // -- and_it_adds_the_is_continuation_flag_for_second_and_later_split_chunks
  //    (test_base.py:1004) --
  test("is_continuation appears on the second and later split chunks only") {
    val out = Chunker.chunkDoc("doc1",
      Iterator(text("'Lorem ipsum dolor' means 'Thank you very much'.")),
      ChunkingOptions(maxCharacters = 20)).toVector
    assert(out.map(_.metadata.is_continuation) ==
      Vector(None, Some(true), Some(true)))
    // every split repeats the same single original element (test_base.py:970-1001)
    val origs = out.map(_.metadata.orig_elements.get).map(ElementJson.decodeOrigElementsJson)
    assert(origs.distinct.size == 1)
    assert(origs.head.contains("'Lorem ipsum dolor' means 'Thank you very much'."))
  }

  // -- it_computes_the_original_elements_list_to_help (test_base.py:1240):
  //    orig_elements that are chunks are stripped of their own orig_elements --
  test("orig_elements strips nested orig_elements to prevent recursion") {
    val inner = ElementJson.encodeOrigElements(Seq(text("Porta volupat.")))
    val composite = Element("", ElementType.CompositeElement,
      "In rhoncus ipsum sed lectus porta volutpat.", "doc1", 99L,
      ElementMetadata(orig_elements = Some(inner)))
    val els = Seq(
      title("Introduction"),
      text("Lorem ipsum dolor sit amet consectetur adipiscing elit."),
      composite)
    val out = Chunker.chunkDoc("doc1", els.iterator, ChunkingOptions()).toVector
    assert(out.size == 1)
    val orig = ElementJson.decodeOrigElementsJson(out.head.metadata.orig_elements.get)
    assert(orig.contains("Introduction"))
    assert(orig.contains("In rhoncus ipsum sed lectus porta volutpat."))
    assert(!orig.contains("Porta volupat.")) // nested layer removed
  }

  // ========================================================== _TableChunker

  private def tableChunks(t: Element, prefix: String, opts: ChunkingOptions): Vector[Element] =
    Chunker.TableChunker.iterChunks("doc1", t, prefix, opts,
      new Chunker.TextSplitter(opts)).toVector

  // -- it_uses_its_table_as_the_sole_chunk_when_it_fits_in_the_window
  //    (test_base.py:1959) --
  test("table chunker emits a single Table with compactified html when it fits") {
    val html =
      "<table>\n<thead>\n<tr><th>Header Col 1 </th><th>Header Col 2 </th></tr>\n</thead>\n" +
        "<tbody>\n<tr><td>Lorem ipsum  </td><td>adipiscing   </td></tr>\n</tbody>\n</table>"
    val t = table("Header Col 1  Header Col 2\nLorem ipsum   adipiscing", Some(html))
    val out = tableChunks(t, "ctus porta volutpat.", ChunkingOptions(maxCharacters = 175))
    assert(out.size == 1)
    assert(out.head.`type` == ElementType.Table)
    assert(out.head.text ==
      "ctus porta volutpat.\nHeader Col 1  Header Col 2\nLorem ipsum   adipiscing")
    assert(out.head.metadata.text_as_html.contains(
      "<table>" +
        "<tr><td>Header Col 1</td><td>Header Col 2</td></tr>" +
        "<tr><td>Lorem ipsum</td><td>adipiscing</td></tr>" +
        "</table>"))
    // -- it_does_not_set_chunk_sequencing_metadata_on_unsplit_table (test_base.py:2782) --
    assert(out.head.metadata.table_id.isEmpty && out.head.metadata.chunk_index.isEmpty)
  }

  // -- but_not_when_the_table_is_is_empty_or_contains_only_whitespace
  //    (test_base.py:1992) --
  test("a whitespace-only table yields no chunks") {
    val t = table("  \t  \n  ", Some("<table><tr><td/><td>  \t  \n   </td></tr></table>"))
    assert(tableChunks(t, "volutpat.", ChunkingOptions(maxCharacters = 175)).isEmpty)
  }

  // -- and_it_includes_the_original_table_element_in_metadata_when_so_instructed
  //    (test_base.py:2004): also pins the row-less <table> html surviving
  //    compactification with its flattened inner text --
  test("orig table element rides in metadata and row-less table html is preserved") {
    val t = table("foo bar", Some("<table>foo bar</table>"))
    val out = tableChunks(t, "", ChunkingOptions())
    assert(out.size == 1 && out.head.`type` == ElementType.Table)
    assert(out.head.metadata.text_as_html.contains("<table>foo bar</table>"))
    val orig = ElementJson.decodeOrigElementsJson(out.head.metadata.orig_elements.get)
    assert(orig.contains("foo bar"))
  }

  // The reference's lxml parse/serialize round-trip preserves entities in a
  // row-less table's flattened text: `a &amp; b` must NOT double-escape to
  // `a &amp;amp; b` (unescape-then-re-escape, like the cell path).
  test("row-less table html preserves entities without double-escaping") {
    val t = table("a & b", Some("<table>a &amp; b</table>"))
    val out = tableChunks(t, "", ChunkingOptions())
    assert(out.size == 1)
    assert(out.head.metadata.text_as_html.contains("<table>a &amp; b</table>"))
  }

  // An OVERSIZED row-less but genuine <table>: the reference's
  // `if not self._html` check is false (compact html is non-empty), so it
  // enters the html-sync splitter, which iterates zero rows and yields zero
  // chunks (base.py:996-1009) — not text-only chunks.
  test("oversized row-less genuine table yields no chunks (html splitter over zero rows)") {
    val words = (1 to 80).map(i => s"word$i").mkString(" ")
    val t = table(words, Some("<table>" + words + "</table>"))
    assert(tableChunks(t, "", ChunkingOptions(maxCharacters = 100)).isEmpty)
  }

  // -- but_not_when_instructed_not_to (test_base.py:2019) --
  test("orig_elements omitted from table chunk when instructed") {
    val out = tableChunks(table("foobar"), "",
      ChunkingOptions(includeOrigElements = false))
    assert(out.size == 1 && out.head.metadata.orig_elements.isEmpty)
  }

  // -- it_handles_table_with_none_text_without_error (test_base.py:2176) --
  test("a table with null text yields no chunks and no error") {
    assert(tableChunks(table(null), "", ChunkingOptions()).isEmpty)
  }

  // -- it_handles_invalid_html_in_text_as_html_without_error (test_base.py:2185) --
  test("invalid text_as_html falls back to text-only with no html") {
    val t = table("Header Col 1  Header Col 2\nLorem ipsum   dolor sit amet",
      Some("not valid html"))
    val out = tableChunks(t, "", ChunkingOptions())
    assert(out.size == 1)
    assert(out.head.`type` == ElementType.Table)
    assert(out.head.metadata.text_as_html.isEmpty)
  }

  // -- it_handles_html_without_table_element_in_text_as_html_without_error
  //    (test_base.py:2211) --
  test("text_as_html with no table element falls back to text-only with no html") {
    val t = table("Header Col 1  Header Col 2\nLorem ipsum   dolor sit amet",
      Some("<div>no table here</div>"))
    val out = tableChunks(t, "", ChunkingOptions())
    assert(out.size == 1)
    assert(out.head.metadata.text_as_html.isEmpty)
  }

  // -- it_splits_its_table_into_TableChunks_when_the_table_text_exceeds_the_window
  //    (test_base.py:2028) --
  test("oversized table splits into TableChunks following the html rows") {
    val html =
      """<table>
        |<thead>
        |<tr><th>Header Col 1   </th><th>Header Col 2  </th></tr>
        |</thead>
        |<tbody>
        |<tr><td>Lorem ipsum    </td><td>A Link example</td></tr>
        |<tr><td>Consectetur    </td><td>adipiscing elit</td></tr>
        |<tr><td>Nunc aliquam   </td><td>id enim nec molestie</td></tr>
        |</tbody>
        |</table>""".stripMargin
    val t = table(
      "Header Col 1   Header Col 2\nLorem ipsum    dolor sit amet\n" +
        "Consectetur    adipiscing elit\nNunc aliquam   id enim nec molestie\n" +
        "Vivamus quis   nunc ipsum donec ac fermentum", Some(html))
    val out = tableChunks(t, "",
      ChunkingOptions(maxCharacters = 100, repeatTableHeaders = false))
    assert(out.size == 2)
    assert(out.forall(_.`type` == ElementType.TableChunk))
    assert(out(0).text ==
      "Header Col 1 Header Col 2 Lorem ipsum A Link example Consectetur adipiscing elit")
    assert(out(0).metadata.text_as_html.contains(
      "<table>" +
        "<tr><td>Header Col 1</td><td>Header Col 2</td></tr>" +
        "<tr><td>Lorem ipsum</td><td>A Link example</td></tr>" +
        "<tr><td>Consectetur</td><td>adipiscing elit</td></tr>" +
        "</table>"))
    assert(out(1).text == "Nunc aliquam id enim nec molestie")
    // -- it_sets_chunk_sequencing_metadata_on_table_chunks (test_base.py:2758) --
    assert(out(0).metadata.is_continuation.isEmpty &&
      out(1).metadata.is_continuation.contains(true))
    assert(out.map(_.metadata.chunk_index) == Vector(Some(0), Some(1)))
    assert(out(0).metadata.table_id.isDefined &&
      out(0).metadata.table_id == out(1).metadata.table_id)
    assert(out.forall(_.metadata.num_carried_over_header_rows.contains(0)))
  }

  // -- and_it_includes_the_whole_original_Table_in_each_metadata_when_so_instructed
  //    (test_base.py:2084) --
  test("every text-only TableChunk repeats the original table in orig_elements") {
    val t = table("Header Col 1   Header Col 2\nLorem ipsum   dolor sit amet")
    val out = tableChunks(t, "", ChunkingOptions(maxCharacters = 30))
    assert(out.map(_.text) == Vector(
      "Header Col 1   Header Col 2", "Lorem ipsum   dolor sit amet"))
    assert(out.forall(_.`type` == ElementType.TableChunk))
    assert(out(0).metadata.is_continuation.isEmpty &&
      out(1).metadata.is_continuation.contains(true))
    val origs = out.map(c => ElementJson.decodeOrigElementsJson(c.metadata.orig_elements.get))
    assert(origs.forall(_.contains("Header Col 1   Header Col 2")))
  }

  // ================================================= _RowAccumulator semantics

  private def splits(html: String, maxChars: Int): Vector[String] =
    Chunker.TableChunker.syncSplits(Chunker.TableChunker.parseRows(html),
      ChunkingOptions(maxCharacters = maxChars))._1.map(_._1)

  // -- it_will_fit_a_row_with_text_shorter_than_maxlen_when_empty
  //    (test_base.py:3228): a 21-char row fills a 21-char window exactly --
  test("row accumulator fits a row exactly as long as the window") {
    assert(splits("<table><tr><td>Lorem Ipsum dolor sit</td></tr></table>", 21) ==
      Vector("Lorem Ipsum dolor sit"))
    // a 22-char two-cell row does not fit and splits on its cell boundary
    assert(splits("<table><tr><td>Lorem Ipsum</td><td>Dolor sit.</td></tr></table>", 21) ==
      Vector("Lorem Ipsum", "Dolor sit."))
  }

  // -- and_it_will_fit_a_row_with_text_shorter_than_remaining_space_when_not_empty
  //    (test_base.py:3251): remaining space is maxlen - text - one separator/row --
  test("row accumulator remaining space is separator-aware") {
    val first = "<tr><td>abcdefghijklmnopqrstuvwxyz</td></tr>" // 26 chars
    // 48 - 26 - 1 = 21 remaining: a 21-char row packs into the same chunk...
    assert(splits(s"<table>$first<tr><td>Lorem Ipsum dolor sit</td></tr></table>", 48) ==
      Vector("abcdefghijklmnopqrstuvwxyz Lorem Ipsum dolor sit"))
    // ...a 22-char row does not
    assert(splits(
      s"<table>$first<tr><td>Lorem Ipsum</td><td>Dolor sit.</td></tr></table>", 48) ==
      Vector("abcdefghijklmnopqrstuvwxyz", "Lorem Ipsum Dolor sit."))
  }

  // -- and_the_HTML_contains_as_many_rows_as_were_accumulated (test_base.py:3283) --
  test("packed rows serialize as one table with one tr per accumulated row") {
    val htmls = Chunker.TableChunker.syncSplits(
      Chunker.TableChunker.parseRows(
        "<table><tr><td>abcde fghij klmno</td></tr><tr><td>pqrst uvwxy z</td></tr></table>"),
      ChunkingOptions(maxCharacters = 100))._1.map(_._2.getOrElse(""))
    assert(htmls == Vector(
      "<table><tr><td>abcde fghij klmno</td></tr><tr><td>pqrst uvwxy z</td></tr></table>"))
  }

  // ================================================ _CellAccumulator semantics

  // -- and_it_will_fit_a_cell_with_text_shorter_than_remaining_space_when_not_empty
  //    (test_base.py:3148): remaining space is maxlen - text - one separator/cell --
  test("cell accumulator packs to the separator-aware boundary") {
    // cells 26 + 17: 44 - 26 - 1 = 17 remaining, so they pack together
    val fit = splits(
      "<table><tr>" +
        "<td>abcdefghijklmnopqrstuvwxyz</td><td>Lorem Ipsum amet.</td>" +
        "<td>abcdefghijklmnopqrstuvwxyz</td></tr></table>", 44)
    assert(fit == Vector(
      "abcdefghijklmnopqrstuvwxyz Lorem Ipsum amet.", "abcdefghijklmnopqrstuvwxyz"))
    // an 18-char second cell no longer fits beside the 26-char first
    val noFit = splits(
      "<table><tr>" +
        "<td>abcdefghijklmnopqrstuvwxyz</td><td>Lorem Ipsum dolor.</td>" +
        "<td>abcdefghijklmnopqrstuvwxyz</td></tr></table>", 44)
    assert(noFit == Vector(
      "abcdefghijklmnopqrstuvwxyz", "Lorem Ipsum dolor.", "abcdefghijklmnopqrstuvwxyz"))
  }

  // -- and_the_HTML_contains_as_many_cells_as_were_accumulated (test_base.py:3177) --
  test("packed cells serialize as a single-row table with one td per cell") {
    val pairs = Chunker.TableChunker.syncSplits(
      Chunker.TableChunker.parseRows(
        "<table><tr><td>abcde fghij klmno</td><td>pqrst uvwxy z</td>" +
          "<td>abcdefghij abcdefghij</td></tr></table>"),
      ChunkingOptions(maxCharacters = 44))._1
    assert(pairs(0)._1 == "abcde fghij klmno pqrst uvwxy z")
    assert(pairs(0)._2.contains(
      "<table><tr><td>abcde fghij klmno</td><td>pqrst uvwxy z</td></tr></table>"))
    assert(pairs(1)._1 == "abcdefghij abcdefghij")
  }
}
