package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Element, ElementMetadata, ElementType}
import graft.sinks.ElementJson

/**
 * Behavior tests for the chunking kernel, ported from the reference suite
 * (`/root/reference/test_unstructured/chunking/test_title.py`, `test_basic.py`,
 * `test_base.py`) — same inputs, same expected outputs.
 */
class ChunkerSpec extends AnyFunSuite {

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

  private def byTitle(els: Seq[Element], opts: ChunkingOptions = ChunkingOptions()): Vector[Element] =
    Chunker.chunkDoc("doc1", els.iterator, opts.copy(byTitle = true)).toVector

  private def basic(els: Seq[Element], opts: ChunkingOptions = ChunkingOptions()): Vector[Element] =
    Chunker.chunkDoc("doc1", els.iterator, opts.copy(byTitle = false)).toVector

  // -- test_it_splits_a_large_text_element_into_multiple_chunks (test_title.py:163) --
  test("splits a large text element into multiple chunks") {
    val els = Seq(
      title("Introduction"),
      text("Lorem ipsum dolor sit amet consectetur adipiscing elit. In rhoncus ipsum sed lectus" +
        " porta volutpat."))
    val chunks = byTitle(els, ChunkingOptions(maxCharacters = 50))
    assert(chunks.map(_.text) == Vector(
      "Introduction",
      "Lorem ipsum dolor sit amet consectetur adipiscing",
      "elit. In rhoncus ipsum sed lectus porta volutpat."))
    assert(chunks.forall(_.`type` == ElementType.CompositeElement))
    // chunk 1 is the FIRST split of its (oversized) pre-chunk — not a continuation
    assert(chunks(0).metadata.is_continuation.isEmpty)
    assert(chunks(1).metadata.is_continuation.isEmpty)
    assert(chunks(2).metadata.is_continuation.contains(true))
  }

  // -- test_it_considers_separator_length_when_pre_chunking (test_title.py:525) --
  test("considers separator length when pre-chunking") {
    val els = Seq(
      title("Chunking Priorities"), // 19 chars
      el(ElementType.ListItem, "Divide text into manageable chunks"), // 34
      el(ElementType.ListItem, "Preserve semantic boundaries"), // 28
      el(ElementType.ListItem, "Minimize mid-text chunk-splitting")) // 33
    val chunks = byTitle(els, ChunkingOptions(maxCharacters = 115))
    assert(chunks.map(_.text) == Vector(
      "Chunking Priorities" +
        "\n\nDivide text into manageable chunks" +
        "\n\nPreserve semantic boundaries",
      "Minimize mid-text chunk-splitting"))
  }

  // -- test_it_splits_elements_by_title_and_table (test_title.py:181) --
  test("splits elements by title and table") {
    val els = Seq(
      title("A Great Day"),
      text("Today is a great day."),
      text("It is sunny outside."),
      table("Heading\nCell text"),
      title("An Okay Day"),
      text("Today is an okay day."),
      text("It is rainy outside."),
      title("A Bad Day"),
      text("Today is a bad day."),
      text("It is storming outside."),
      el(ElementType.CheckBox, ""))
    val chunks = byTitle(els,
      ChunkingOptions(combineTextUnderNChars = Some(0), includeOrigElements = true))
    assert(chunks.size == 4)
    assert(chunks(0).`type` == ElementType.CompositeElement)
    assert(chunks(0).text == "A Great Day\n\nToday is a great day.\n\nIt is sunny outside.")
    assert(chunks(1).`type` == ElementType.Table)
    assert(chunks(1).text == "Heading\nCell text")
    assert(chunks(2).text == "An Okay Day\n\nToday is an okay day.\n\nIt is rainy outside.")
    assert(chunks(3).text == "A Bad Day\n\nToday is a bad day.\n\nIt is storming outside.")
    // orig_elements round-trips through the base64-gzip codec
    val orig = ElementJson.decodeOrigElementsJson(chunks(0).metadata.orig_elements.get)
    assert(orig.contains("A Great Day") && orig.contains("Today is a great day."))
    val origLast = ElementJson.decodeOrigElementsJson(chunks(3).metadata.orig_elements.get)
    assert(origLast.contains("CheckBox"))
  }

  // -- Describe_chunk_by_title: combining small chunks --
  test("combines adjacent small pre-chunks under combine_text_under_n_chars") {
    val els = Seq(
      title("A Great Day"),
      text("Today is a great day."),
      title("An Okay Day"),
      text("Today is an okay day."))
    val chunks = byTitle(els) // default combine = maxCharacters = 500
    assert(chunks.size == 1)
    assert(chunks(0).text ==
      "A Great Day\n\nToday is a great day.\n\nAn Okay Day\n\nToday is an okay day.")
    // with combining disabled, the Title boundary splits them
    val noCombine = byTitle(els, ChunkingOptions(combineTextUnderNChars = Some(0)))
    assert(noCombine.size == 2)
  }

  // -- page-boundary predicate (multipage_sections=False) --
  test("breaks on page change only when multipageSections is false") {
    val els = Seq(
      text("Page one text."),
      el(ElementType.NarrativeText, "More page one.", page = Some(1)),
      el(ElementType.NarrativeText, "Page two text.", page = Some(2)))
    val multi = byTitle(els, ChunkingOptions(combineTextUnderNChars = Some(0)))
    assert(multi.size == 1)
    val perPage = byTitle(els,
      ChunkingOptions(combineTextUnderNChars = Some(0), multipageSections = false))
    assert(perPage.map(_.text) == Vector(
      "Page one text.\n\nMore page one.", "Page two text."))
  }

  // -- test_skip_table_chunking_does_not_combine_table_with_adjacent_text (test_basic) --
  test("table is isolated from adjacent text even when everything fits") {
    val tableText = ("cell " * 200).trim
    val els = Seq(
      text("Hello world"),
      table(tableText),
      text("Goodbye world"))
    val chunks = byTitle(els, ChunkingOptions(
      maxCharacters = 5000, combineTextUnderNChars = Some(5000), skipTableChunking = true))
    assert(chunks.map(_.`type`) == Vector(
      ElementType.CompositeElement, ElementType.Table, ElementType.CompositeElement))
    assert(chunks(1).text == tableText)
  }

  // -- test_it_repeats_table_headers_by_default_but_can_opt_out (test_title.py:96) --
  private val headerTableHtml =
    "<table>" +
      "<thead>" +
      "<tr><th>Header A</th><th>Header B</th></tr>" +
      "<tr><th>Subhead A</th><th>Subhead B</th></tr>" +
      "</thead>" +
      "<tbody>" +
      "<tr><td>Body 1</td><td>Alpha</td></tr>" +
      "<tr><td>Body 2</td><td>Bravo</td></tr>" +
      "<tr><td>Body 3</td><td>Charlie</td></tr>" +
      "<tr><td>Body 4</td><td>Delta</td></tr>" +
      "</tbody>" +
      "</table>"
  private val headerTableText =
    "Header A Header B\nSubhead A Subhead B\nBody 1 Alpha\nBody 2 Bravo\n" +
      "Body 3 Charlie\nBody 4 Delta"

  test("repeats table headers by default") {
    val chunks = byTitle(
      Seq(table(headerTableText, Some(headerTableHtml))),
      ChunkingOptions(combineTextUnderNChars = Some(0), maxCharacters = 55))
    assert(chunks.size == 4)
    assert(chunks.forall(_.`type` == ElementType.TableChunk))
    assert(chunks.map(_.text) == Vector(
      "Header A Header B Subhead A Subhead B Body 1 Alpha",
      "Header A Header B Subhead A Subhead B Body 2 Bravo",
      "Header A Header B Subhead A Subhead B Body 3 Charlie",
      "Header A Header B Subhead A Subhead B Body 4 Delta"))
    assert(chunks(1).metadata.num_carried_over_header_rows.contains(2))
    assert(chunks(0).metadata.num_carried_over_header_rows.contains(0))
    assert(chunks(1).metadata.text_as_html.get.startsWith(
      "<table><thead><tr><th>Header A</th><th>Header B</th></tr>"))
    assert(chunks.map(_.metadata.chunk_index) == Vector(Some(0), Some(1), Some(2), Some(3)))
    assert(chunks.map(_.metadata.table_id).distinct.size == 1)
  }

  test("header repeat can be opted out") {
    val chunks = byTitle(
      Seq(table(headerTableText, Some(headerTableHtml))),
      ChunkingOptions(combineTextUnderNChars = Some(0), maxCharacters = 55,
        repeatTableHeaders = false))
    assert(chunks.map(_.text) == Vector(
      "Header A Header B Subhead A Subhead B Body 1 Alpha",
      "Body 2 Bravo Body 3 Charlie Body 4 Delta"))
  }

  // -- and_it_preserves_colspan_and_rowspan_in_the_first_chunk_header_rows
  //    (test_base.py:1627) --
  test("colspan/rowspan survive in first-chunk rows and repeated headers") {
    val html = "<table><thead>" +
      "<tr><th rowspan='2'>Region</th><th colspan='2'>Sales</th></tr>" +
      "<tr><th>Q1</th><th>Q2</th></tr>" +
      "</thead><tbody>" +
      "<tr><td>Northwest</td><td>100</td><td>150</td></tr>" +
      "<tr><td>Southwest</td><td>200</td><td>250</td></tr>" +
      "<tr><td>Midwest</td><td>300</td><td>350</td></tr>" +
      "<tr><td>Northeast</td><td>400</td><td>450</td></tr>" +
      "</tbody></table>"
    val text = "Region Sales Q1 Q2\nNorthwest 100 150\nSouthwest 200 250\n" +
      "Midwest 300 350\nNortheast 400 450"
    val chunks = byTitle(Seq(table(text, Some(html))),
      ChunkingOptions(combineTextUnderNChars = Some(0), maxCharacters = 80))
    assert(chunks.size >= 2)
    // first chunk: header rows packed as normal rows, spans kept on the td's
    val first = chunks(0).metadata.text_as_html.get
    assert(first.contains("""<td rowspan="2">Region</td>"""))
    assert(first.contains("""<td colspan="2">Sales</td>"""))
    // continuation: repeated thead keeps the spans on the th's (source markup)
    val cont = chunks(1).metadata.text_as_html.get
    assert(cont.contains("<thead>"))
    assert(cont.contains("<th rowspan='2'>Region</th>"))
    assert(cont.contains("<th colspan='2'>Sales</th>"))
  }

  // -- and_it_keeps_compactified_contracts_for_non_header_body_cells
  //    (test_base.py:1673) --
  test("cosmetic attributes drop from body cells; scope survives on carried headers") {
    val html = "<table>" +
      "<thead><tr><th scope='col'>Region</th><th scope='col'>Sales</th></tr></thead>" +
      "<tbody>" +
      "<tr><td class='region-cell'>Northwest Territory</td><td data-origin='crm'>1200</td></tr>" +
      "<tr><td class='region-cell'>Southwest Territory</td><td data-origin='crm'>1400</td></tr>" +
      "<tr><td class='region-cell'>Midwest Territory</td><td data-origin='crm'>1600</td></tr>" +
      "</tbody></table>"
    val text = "Region Sales\nNorthwest Territory 1200\nSouthwest Territory 1400\n" +
      "Midwest Territory 1600"
    val chunks = byTitle(Seq(table(text, Some(html))),
      ChunkingOptions(combineTextUnderNChars = Some(0), maxCharacters = 55))
    assert(chunks.size >= 2)
    chunks.foreach { c =>
      val h = c.metadata.text_as_html.get
      assert(!h.contains("class="), h)
      assert(!h.contains("data-origin"), h)
    }
    // the repeated thead rides the SOURCE row markup, scope included
    val cont = chunks(1).metadata.text_as_html.get
    assert(cont.contains("<th scope='col'>Region</th>"))
    assert(cont.contains("<th scope='col'>Sales</th>"))
  }

  // -- and_it_cascades_header_carry_forward_across_three_or_more_continuation_chunks
  //    + carried counts (test_base.py:1712-1756) --
  test("header carry cascades across three+ continuations with stable counts") {
    val chunks = byTitle(
      Seq(table(headerTableText, Some(headerTableHtml))),
      ChunkingOptions(combineTextUnderNChars = Some(0), maxCharacters = 55))
    assert(chunks.size == 4)
    assert(chunks.map(_.metadata.num_carried_over_header_rows) ==
      Vector(Some(0), Some(2), Some(2), Some(2)))
    // every continuation repeats the same two header rows
    chunks.tail.foreach { c =>
      val h = c.metadata.text_as_html.get
      assert(h.contains("<thead><tr><th>Header A</th><th>Header B</th></tr>" +
        "<tr><th>Subhead A</th><th>Subhead B</th></tr></thead>"), h)
    }
    val optOut = byTitle(
      Seq(table(headerTableText, Some(headerTableHtml))),
      ChunkingOptions(combineTextUnderNChars = Some(0), maxCharacters = 55,
        repeatTableHeaders = false))
    assert(optOut.map(_.metadata.num_carried_over_header_rows) ==
      Vector(Some(0), Some(0)))
  }

  // -- Describe_chunk_elements option defaults (test_basic.py:232-305): the
  // -- None/omitted cases of the four parametrized option tests — each
  // -- unset option resolves to the reference default
  test("chunk_elements option defaults mirror the reference") {
    val o = ChunkingOptions()
    assert(o.includeOrigElements, "include_orig_elements defaults True")
    assert(o.repeatTableHeaders, "repeat_table_headers defaults True")
    assert(!o.skipTableChunking, "skip_table_chunking defaults False")
    assert(o.isolateTable, "isolate_table defaults True")
    assert(o.maxCharacters == 500 && o.overlap == 0 && !o.overlapAll)
    assert(o.multipageSections, "multipage_sections defaults True")
  }

  // -- it_rejects_skip_table_chunking_when_isolation_is_disabled (test_base.py:151) --
  test("skip_table_chunking=true without isolate_table is rejected") {
    val e = intercept[IllegalArgumentException] {
      ChunkingOptions(skipTableChunking = true, isolateTable = false)
    }
    assert(e.getMessage.contains("requires 'isolate_table=True'"))
  }

  // -- it_accepts_0_for_new_after_n_chars_to_put_each_element_into_its_own_chunk
  //    (test_base.py:183) --
  test("newAfterNChars=0 puts each element in its own chunk; larger values clamp") {
    val els = Seq(text("alpha"), text("bravo"), text("charlie"))
    val perElement = basic(els, ChunkingOptions(newAfterNChars = Some(0)))
    assert(perElement.map(_.text) == Vector("alpha", "bravo", "charlie"))
    // silently accepts new_after_n_chars greater than max_characters (clamps)
    val clamped = ChunkingOptions(maxCharacters = 100, newAfterNChars = Some(500))
    assert(clamped.softMax == 100)
  }

  // -- test_skip_table_chunking_passes_oversized_table_through_unchanged --
  test("skipTableChunking passes oversized table through unchanged") {
    val big = ("cell " * 300).trim
    val chunks = byTitle(Seq(table(big)), ChunkingOptions(skipTableChunking = true))
    assert(chunks.size == 1)
    assert(chunks(0).`type` == ElementType.Table)
    assert(chunks(0).text == big)
  }

  // -- oversized table without html -> text-only TableChunks --
  test("oversized table without html splits into text-only TableChunks") {
    val big = (1 to 300).map(i => s"cell$i").mkString(" ")
    val chunks = byTitle(Seq(table(big)), ChunkingOptions(maxCharacters = 500))
    assert(chunks.size > 1)
    assert(chunks.forall(_.`type` == ElementType.TableChunk))
    assert(chunks.forall(_.text.length <= 500))
    assert(chunks.forall(_.metadata.text_as_html.isEmpty))
    assert(chunks.head.metadata.is_continuation.isEmpty)
    assert(chunks.tail.forall(_.metadata.is_continuation.contains(true)))
    // no text lost at the seams
    assert(chunks.map(_.text).mkString(" ") == big)
  }

  // -- overlap_all carries the tail of the previous chunk --
  test("overlapAll prefixes next chunk with tail of previous") {
    val els = Seq(
      text("a" * 98 + "zz"),
      text("next element text here"))
    val chunks = basic(els, ChunkingOptions(maxCharacters = 100, overlap = 10, overlapAll = true))
    assert(chunks.size == 2)
    assert(chunks(1).text.startsWith(chunks(0).text.takeRight(10).trim))
  }

  // -- PageBreak-only pre-chunk yields no chunk (empty text) --
  test("pre-chunk with no text produces no chunks") {
    val chunks = basic(Seq(el(ElementType.PageBreak, "")))
    assert(chunks.isEmpty)
  }

  // -- metadata consolidation: FIRST + LIST_UNIQUE + STRING_CONCATENATE --
  test("consolidates metadata per strategy table") {
    nextSeq = 0
    val e1 = Element("", ElementType.Title, "T", "doc1", 1,
      ElementMetadata(page_number = Some(1), languages = Some(Seq("eng")),
        filename = Some("a.txt")))
    val e2 = Element("", ElementType.NarrativeText, "Body", "doc1", 2,
      ElementMetadata(page_number = Some(2), languages = Some(Seq("eng", "deu")),
        text_as_html = Some("<p>x</p>")))
    val chunks = basic(Seq(e1, e2))
    assert(chunks.size == 1)
    val m = chunks(0).metadata
    assert(m.page_number.contains(1)) // FIRST
    assert(m.languages.contains(Seq("eng", "deu"))) // LIST_UNIQUE
    assert(m.filename.contains("a.txt")) // FIRST
    assert(m.text_as_html.contains("<p>x</p>")) // STRING_CONCATENATE
  }

  // -- test_chunk_by_title_drops_detection_class_prob (test_title.py:402) --
  test("chunk_by_title drops detection_class_prob from chunk metadata") {
    nextSeq = 0
    def withProb(tpe: String, t: String, p: Double): Element = {
      nextSeq += 1
      Element("", tpe, t, "doc1", nextSeq,
        ElementMetadata(detection_class_prob = Some(p)))
    }
    val els = Seq(
      withProb(ElementType.Title, "A Great Day", 0.5),
      withProb(ElementType.UncategorizedText, "Today is a great day.", 0.62),
      withProb(ElementType.UncategorizedText, "It is sunny outside.", 0.73),
      withProb(ElementType.Title, "An Okay Day", 0.84),
      withProb(ElementType.UncategorizedText, "Today is an okay day.", 0.95))
    val chunks = byTitle(els, ChunkingOptions(combineTextUnderNChars = Some(0)))
    assert(chunks.map(_.text) == Seq(
      "A Great Day\n\nToday is a great day.\n\nIt is sunny outside.",
      "An Okay Day\n\nToday is an okay day."))
    assert(chunks.forall(_.metadata.detection_class_prob.isEmpty))
  }

  // -- test_chunk_by_title_drops_extra_metadata (test_title.py:442) --
  test("chunk_by_title drops non-consolidatable extra metadata") {
    nextSeq = 0
    def withOrigin(tpe: String, t: String): Element = {
      nextSeq += 1
      Element("", tpe, t, "doc1", nextSeq,
        ElementMetadata(detection_origin = Some("yolox"),
          emphasized_text_contents = Some(Seq(t.take(3)))))
    }
    val els = Seq(
      withOrigin(ElementType.Title, "A Great Day"),
      withOrigin(ElementType.UncategorizedText, "Today is a great day."))
    val chunks = byTitle(els, ChunkingOptions(combineTextUnderNChars = Some(0)))
    assert(chunks.size == 1)
    // detection_origin is not in the consolidation table -> dropped;
    // emphasized_text_contents consolidates LIST_CONCATENATE
    assert(chunks.head.metadata.detection_origin.isEmpty)
    assert(chunks.head.metadata.emphasized_text_contents.contains(Seq("A G", "Tod")))
  }

  // -- chunk ids are deterministic (retry/speculation safety) --
  test("chunk ids are deterministic across runs") {
    val els = Seq(title("A"), text("B"), title("C"), text("D"))
    val a = byTitle(els).map(_.element_id)
    val b = byTitle(els).map(_.element_id)
    assert(a == b)
    assert(a.distinct.size == a.size)
  }

  // -- reconstruct_table_from_chunks inverse --
  test("reconstructTable merges TableChunks back into one Table") {
    val chunks = byTitle(
      Seq(table(headerTableText, Some(headerTableHtml))),
      ChunkingOptions(combineTextUnderNChars = Some(0), maxCharacters = 55))
    val t = Chunker.reconstructTable(chunks).get
    assert(t.`type` == ElementType.Table)
    assert(t.text ==
      "Header A Header B Subhead A Subhead B Body 1 Alpha Body 2 Bravo Body 3 Charlie" +
        " Body 4 Delta")
    val html = t.metadata.text_as_html.get
    assert(html.startsWith("<table><thead><tr><th>Header A</th>"))
    assert(html.contains("<tr><td>Body 4</td><td>Delta</td></tr>"))
    assert(t.metadata.table_id.isEmpty && t.metadata.chunk_index.isEmpty)
  }

  // -- TextSplitter unit behavior (base.py:1396-1460) --
  test("TextSplitter returns short string unchanged") {
    val split = new Chunker.TextSplitter(ChunkingOptions(maxCharacters = 100))
    assert(split("short text") == (("short text", "")))
  }

  test("TextSplitter splits on rightmost whitespace within maxlen") {
    val split = new Chunker.TextSplitter(ChunkingOptions(maxCharacters = 20))
    val (frag, rem) = split("alpha bravo charlie delta echo")
    assert(frag == "alpha bravo charlie")
    assert(rem == "delta echo")
  }

  test("TextSplitter prefers newline over space") {
    val split = new Chunker.TextSplitter(ChunkingOptions(maxCharacters = 20))
    val (frag, rem) = split("alpha bravo\ncharlie delta")
    assert(frag == "alpha bravo")
    assert(rem == "charlie delta")
  }

  test("TextSplitter hard-cuts a word longer than maxlen with overlap") {
    val split = new Chunker.TextSplitter(ChunkingOptions(maxCharacters = 10, overlap = 3))
    val (frag, rem) = split("abcdefghijklmnop")
    assert(frag == "abcdefghij")
    assert(rem == "hijklmnop")
  }

  test("TextSplitter carries overlap tail through separator splits") {
    val split = new Chunker.TextSplitter(ChunkingOptions(maxCharacters = 20, overlap = 5))
    val (frag, rem) = split("alpha bravo charlie delta")
    assert(frag == "alpha bravo charlie")
    assert(rem.startsWith("rlie "))
  }

  // -- token mode (max_tokens, chunking/base.py:176-190,1434-1568) --

  test("token mode: short string measured in tokens returns unchanged") {
    // 7 words = 7 tokens but 40+ chars — fits a 10-token window
    val split = new Chunker.TextSplitter(ChunkingOptions(maxTokens = Some(10)))
    val s = "alpha bravo charlie delta echo foxtrot golf"
    assert(split(s) == ((s, "")))
  }

  test("token mode: splits on rightmost space whose fragment fits the token budget") {
    val split = new Chunker.TextSplitter(ChunkingOptions(maxTokens = Some(3)))
    val (frag, rem) = split("alpha bravo charlie delta echo")
    assert(frag == "alpha bravo charlie")
    assert(rem == "delta echo")
  }

  test("token mode: punctuation counts as tokens") {
    // "a-b" is 3 tokens (letter run, symbol, letter run)
    val split = new Chunker.TextSplitter(ChunkingOptions(maxTokens = Some(4)))
    val (frag, rem) = split("a-b cd ef gh")
    assert(frag == "a-b cd")
    assert(rem == "ef gh")
  }

  test("token mode: binary-search fallback splits an unbroken token run") {
    // no whitespace at all: falls back to the char-position binary search
    val split = new Chunker.TextSplitter(ChunkingOptions(maxTokens = Some(3)))
    val (frag, rem) = split("a.b.c.d.e")
    assert(Chunker.tokenCount(frag) <= 3 && frag.nonEmpty)
    assert(frag + rem == "a.b.c.d.e")
  }

  test("token mode: overlap tail carries ~overlap tokens into the remainder") {
    val split = new Chunker.TextSplitter(ChunkingOptions(maxTokens = Some(4), overlap = 2))
    val (frag, rem) = split("alpha bravo charlie delta echo foxtrot")
    assert(frag == "alpha bravo charlie delta")
    assert(rem == "charlie delta echo foxtrot")
  }

  test("token mode: pre-chunk packing folds on token sums, not characters") {
    // each element is 2 tokens but 13 chars; a 6-token window packs three of them
    val els = Seq(text("aaaaaa bbbbbb"), text("cccccc dddddd"),
      text("eeeeee ffffff"), text("gggggg hhhhhh"))
    val chunks = basic(els, ChunkingOptions(maxTokens = Some(6)))
    assert(chunks.map(_.text) == Vector(
      "aaaaaa bbbbbb\n\ncccccc dddddd\n\neeeeee ffffff", "gggggg hhhhhh"))
  }

  test("token mode: oversized element is token-split into fitting fragments") {
    val els = Seq(text("one two three four five six seven eight nine ten"))
    val chunks = basic(els, ChunkingOptions(maxTokens = Some(4)))
    assert(chunks.map(_.text) == Vector(
      "one two three four", "five six seven eight", "nine ten"))
    assert(chunks.forall(c => Chunker.tokenCount(c.text) <= 4))
  }

  test("token mode: newAfterNTokens soft max closes a pre-chunk early") {
    val els = Seq(text("aa bb"), text("cc dd"), text("ee ff"))
    val chunks = basic(els, ChunkingOptions(maxTokens = Some(10), newAfterNTokens = Some(3)))
    // first element (2 tokens) fits; adding the second makes 4 > soft-max 3, so the
    // THIRD element opens a new pre-chunk (soft max is checked before appending)
    assert(chunks.map(_.text) == Vector("aa bb\n\ncc dd", "ee ff"))
  }

  test("token mode: table fitting is judged in tokens") {
    val html = "<table><tr><td>aaaaaaaa bbbbbbbb cccccccc</td></tr></table>"
    // 3 text tokens and 24 html tokens fit a 30-token window even though the
    // html is 60 chars; char mode at the same numeric window would split
    val chunks = basic(Seq(table("aaaaaaaa bbbbbbbb cccccccc", html = Some(html))),
      ChunkingOptions(maxTokens = Some(30)))
    assert(chunks.size == 1 && chunks.head.`type` == ElementType.Table)
    assert(chunks.head.metadata.text_as_html.contains(html))
  }

  test("consolidates enrichment_origins with DICT_LIST_UNIQUE") {
    // entries are flat record dicts (elements.py:175); dedupe is by record
    // equality (test_elements.py it_merges_and_dedupes_enrichment_origins)
    def rec(t: String) = Map("type" -> t, "provider" -> "p", "model" -> "m")
    val e1 = el(ElementType.NarrativeText, "one").copy(metadata = ElementMetadata(
      enrichment_origins = Some(Map("text" -> Seq(rec("a"), rec("b"))))))
    val e2 = el(ElementType.NarrativeText, "two").copy(metadata = ElementMetadata(
      enrichment_origins = Some(Map("text" -> Seq(rec("b"), rec("c")),
        "embeddings" -> Seq(rec("d"))))))
    val chunks = basic(Seq(e1, e2), ChunkingOptions(includeOrigElements = false))
    assert(chunks.size == 1)
    // union keys; per key concatenate then dedupe, preserving first-seen order
    assert(chunks.head.metadata.enrichment_origins.contains(Map(
      "text" -> Seq(rec("a"), rec("b"), rec("c")),
      "embeddings" -> Seq(rec("d")))))
  }

  // -- incremental (streaming) fold --

  private def runIncremental(els: Seq[Element], opts: ChunkingOptions,
      batchSize: Int): (Vector[Element], Int) = {
    var carry = Vector.empty[Element]
    var seqN = 0L
    var prefix = ""
    var out = Vector.empty[Element]
    var maxCarry = 0
    els.grouped(batchSize).foreach { batchEls =>
      val (chunks, c, s2, p) = Chunker.chunkDocIncremental(
        "docB", carry ++ batchEls, opts, seqN, prefix, finalFlush = false)
      out ++= chunks; carry = c; seqN = s2; prefix = p
      maxCarry = math.max(maxCarry, carry.size)
    }
    val (last, rest, _, _) =
      Chunker.chunkDocIncremental("docB", carry, opts, seqN, prefix, finalFlush = true)
    assert(rest.isEmpty)
    (out ++ last, maxCarry)
  }

  test("incremental fold: carry is bounded by the window and output equals the batch fold") {
    val els = (1 to 500).map(i => Element("", ElementType.NarrativeText,
      s"Sentence number $i of the endless document.", "docB", i.toLong))
    val opts = ChunkingOptions(maxCharacters = 80, includeOrigElements = false)
    val batch = Chunker.chunkDoc("docB", els.iterator, opts).toVector
    val (streamed, maxCarry) = runIncremental(els, opts, batchSize = 7)
    assert(streamed == batch)
    // open pre-chunk holds at most two ~43-char elements in an 80-char window —
    // the carry never scales with the 500-element document
    assert(maxCarry <= 3)
  }

  test("incremental fold matches batch with overlap and by-title combining") {
    val els = (1 to 300).flatMap { i =>
      val t = Element("", ElementType.Title, s"Part $i", "docB", i * 10L)
      val b = Element("", ElementType.NarrativeText,
        s"Body text for section $i with some padding words.", "docB", i * 10L + 1)
      Seq(t, b)
    }
    val opts = ChunkingOptions(maxCharacters = 150, includeOrigElements = false,
      overlap = 20, overlapAll = true, byTitle = true)
    val batch = Chunker.chunkDoc("docB", els.iterator, opts.copy(byTitle = true)).toVector
    val (streamed, maxCarry) = runIncremental(els, opts.copy(byTitle = true), batchSize = 5)
    assert(streamed == batch)
    assert(maxCarry <= 8) // combinable run is capped at hardMax, not doc length
  }

  // -- normalizeWs --
  // -- test_chunk_by_title (test_title.py:232) --
  test("chunk_by_title: the reference's canonical 11-element case") {
    def emph(tpe: String, t: String, contents: Seq[String]): Element = {
      nextSeq += 1
      Element("", tpe, t, "doc1", nextSeq,
        ElementMetadata(emphasized_text_contents = Some(contents)))
    }
    val els = Seq(
      emph(ElementType.Title, "A Great Day", Seq("Day")),
      emph(ElementType.NarrativeText, "Today is a great day.", Seq("day")),
      text("It is sunny outside."),
      table("Heading\nCell text"),
      title("An Okay Day"),
      text("Today is an okay day."),
      text("It is rainy outside."),
      title("A Bad Day"),
      text("Today is a bad day."),
      text("It is storming outside."),
      el(ElementType.CheckBox, "")) // no text -> contributes no chunk
    val chunks = byTitle(els, ChunkingOptions(combineTextUnderNChars = Some(0),
      includeOrigElements = false))
    assert(chunks.map(_.text) == Vector(
      "A Great Day\n\nToday is a great day.\n\nIt is sunny outside.",
      "Heading\nCell text",
      "An Okay Day\n\nToday is an okay day.\n\nIt is rainy outside.",
      "A Bad Day\n\nToday is a bad day.\n\nIt is storming outside."))
    assert(chunks.map(_.`type`) == Vector(ElementType.CompositeElement,
      ElementType.Table, ElementType.CompositeElement, ElementType.CompositeElement))
    // emphasized_text_contents consolidate in document order
    assert(chunks(0).metadata.emphasized_text_contents.contains(Seq("Day", "day")))
  }

  // -- test_chunk_by_title_separates_by_page_number (:264) + respects_multipage
  // -- (:293) + groups_across_pages (:322): same elements, both option values --
  test("chunk_by_title: page boundaries split only with multipageSections=false") {
    def make(): Seq[Element] = Seq(
      el(ElementType.Title, "A Great Day", page = Some(1)),
      el(ElementType.NarrativeText, "Today is a great day.", page = Some(2)),
      el(ElementType.NarrativeText, "It is sunny outside.", page = Some(2)),
      table("Heading\nCell text"),
      title("An Okay Day"),
      text("Today is an okay day."),
      text("It is rainy outside."),
      title("A Bad Day"),
      text("Today is a bad day."),
      text("It is storming outside."),
      el(ElementType.CheckBox, ""))
    val perPage = byTitle(make(), ChunkingOptions(multipageSections = false,
      combineTextUnderNChars = Some(0)))
    assert(perPage.map(_.text) == Vector(
      "A Great Day",
      "Today is a great day.\n\nIt is sunny outside.",
      "Heading\nCell text",
      "An Okay Day\n\nToday is an okay day.\n\nIt is rainy outside.",
      "A Bad Day\n\nToday is a bad day.\n\nIt is storming outside."))
    val multi = byTitle(make(), ChunkingOptions(multipageSections = true,
      combineTextUnderNChars = Some(0)))
    assert(multi.size == 4)
    assert(multi(0).text ==
      "A Great Day\n\nToday is a great day.\n\nIt is sunny outside.")
  }

  // fixture texts from testfiles/chunking/*.json (title_table_200 et al.)
  private val RfpTableText = "RFP Number: 2024-PMO-01 RFP Title: PMO Services RFP " +
    "RFP Due Date and Time: Number of Pages: #189 05/30/2024 by 5:00pm Central Time"
  private val CsvNoteText = "Format: CSV file for Export and Download Contact: " +
    "Charles Stringham cstringham@alsde.edu to arrange secure data transfer OR " +
    "with technical questions nickey.johnson@alsde.edu for other questions"

  // -- test_it_chunks_text_followed_by_table_together_when_both_fit (:38) and
  // -- table_followed_by_text (:48), fixtures title_table_200 / table_text_200 --
  test("text and table that both fit still emit separate Composite/Table chunks") {
    val opts = ChunkingOptions(combineTextUnderNChars = Some(0))
    val a = byTitle(Seq(title("REQUEST FOR PROPOSALS"), table(RfpTableText)), opts)
    assert(a.map(_.`type`) ==
      Vector(ElementType.CompositeElement, ElementType.Table))
    val b = byTitle(Seq(table(RfpTableText), text("REQUEST FOR PROPOSALS")), opts)
    assert(b.map(_.`type`) ==
      Vector(ElementType.Table, ElementType.CompositeElement))
  }

  // -- test_it_splits_oversized_table (:55) and
  // -- test_skip_table_chunking_passes_oversized_table_through_unchanged (:63),
  // -- on the reference's OWN table_2000.json fixture (one 1887-char Table) --
  test("the reference's 2000-char table fixture splits to 5 TableChunks; " +
      "skip_table_chunking passes it through whole") {
    val raw = new String(java.nio.file.Files.readAllBytes(java.nio.file.Path.of(
      "/root/reference/test_unstructured/testfiles/chunking/table_2000.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    val els = graft.sinks.ElementSink.partitionJson(
      graft.SparkSuiteBase.session, raw).collect().toSeq
    assert(els.size == 1 && els.head.`type` == ElementType.Table)
    val split = byTitle(els, ChunkingOptions())
    assert(split.size == 5, s"expected 5 TableChunks, got ${split.size}")
    assert(split.forall(_.`type` == ElementType.TableChunk),
      split.map(_.`type`).mkString(","))
    val whole = byTitle(els, ChunkingOptions(skipTableChunking = true))
    assert(whole.size == 1 && whole.head.`type` == ElementType.Table)
    assert(whole.head.text == els.head.text)
  }

  // -- the four text/table boundary cases (:38-58, :145-160) re-pinned on the
  // -- reference's OWN fixture files instead of reconstructed texts --
  test("the four text/table boundary fixtures chunk to the reference's shapes") {
    def fixture(name: String): Seq[Element] = {
      val raw = new String(java.nio.file.Files.readAllBytes(java.nio.file.Path.of(
        s"/root/reference/test_unstructured/testfiles/chunking/$name")),
        java.nio.charset.StandardCharsets.UTF_8)
      graft.sinks.ElementSink.partitionJson(graft.SparkSuiteBase.session, raw)
        .collect().toSeq
    }
    val noCombine = ChunkingOptions(combineTextUnderNChars = Some(0))
    val a = byTitle(fixture("title_table_200.json"), noCombine)
    assert(a.map(_.`type`) ==
      Vector(ElementType.CompositeElement, ElementType.Table), "title_table_200")
    val b = byTitle(fixture("table_text_200.json"), noCombine)
    assert(b.map(_.`type`) ==
      Vector(ElementType.Table, ElementType.CompositeElement), "table_text_200")
    val at250 = ChunkingOptions(maxCharacters = 250)
    val c = byTitle(fixture("long_text_table_200.json"), at250)
    assert(c.map(_.`type`) ==
      Vector(ElementType.CompositeElement, ElementType.Table), "long_text_table_200")
    val d = byTitle(fixture("full_table_long_text_250.json"), at250)
    assert(d.map(_.`type`) ==
      Vector(ElementType.Table, ElementType.CompositeElement), "full_table_long_text_250")
  }

  // -- test_it_starts_new_chunk_for_table_after_full_text_chunk (:145) and
  // -- text_after_full_table_chunk (:154), fixtures long_text_table_200 /
  // -- full_table_long_text_250 at max_characters=250 --
  test("a full chunk on either side of a text/table boundary starts a new chunk") {
    val opts = ChunkingOptions(maxCharacters = 250)
    val a = byTitle(Seq(text(CsvNoteText), table(RfpTableText)), opts)
    assert(a.map(_.`type`) ==
      Vector(ElementType.CompositeElement, ElementType.Table))
    assert(a(0).text == CsvNoteText && a(1).text == RfpTableText)
    val b = byTitle(Seq(table(RfpTableText), text(CsvNoteText)), opts)
    assert(b.map(_.`type`) ==
      Vector(ElementType.Table, ElementType.CompositeElement))
  }

  // -- Describe_ByTitleChunkingOptions (:636-709): option validation edges --
  test("option validation matches the reference's ValueError edges") {
    // combine_text_under_n_chars < 0 rejected (-1, -42)
    for (n <- Seq(-1, -42))
      assertThrows[IllegalArgumentException](
        byTitle(Seq(text("x")), ChunkingOptions(combineTextUnderNChars = Some(n))))
    // 0 disables combining without error
    assert(byTitle(Seq(text("x")),
      ChunkingOptions(combineTextUnderNChars = Some(0))).nonEmpty)
    // combine > max_characters rejected, against default (500) and explicit max
    assertThrows[IllegalArgumentException](
      byTitle(Seq(text("x")), ChunkingOptions(combineTextUnderNChars = Some(600))))
    assertThrows[IllegalArgumentException](
      byTitle(Seq(text("x")), ChunkingOptions(maxCharacters = 450,
        combineTextUnderNChars = Some(600))))
    // new_after_n_chars accepted alone; multipage default is true
    assert(ChunkingOptions(newAfterNChars = Some(200)).softMax == 200)
    assert(ChunkingOptions().multipageSections)
  }

  // -- test_html_output.py:15/38/78 — text_as_html consolidation, both strategies --
  private def withHtml(tpe: String, t: String, html: String,
      parent: Option[String] = None): Element = {
    nextSeq += 1
    Element("", tpe, t, "doc1", nextSeq,
      ElementMetadata(text_as_html = Some(html), parent_id = parent))
  }

  test("text_as_html space-joins across combined elements in both strategies") {
    val m1 = """<h1 class="Title" id="1">Header </h1>"""
    val m2 = """<time class="CalendarDate" id="2">Date: October 30, 2023 </time>"""
    val m3 = """<form class="Form" id="3"> """ +
      """<label class="FormField" for="company-name" id="4">Form field name </label>""" +
      """<input class="FormFieldValue" id="5" value="Example value" /></form>"""
    def els() = Seq(
      withHtml(ElementType.Title, "Header", m1),
      withHtml(ElementType.NarrativeText, "Date: October 30, 2023", m2),
      withHtml(ElementType.NarrativeText, "Form field name Example value", m3))
    for (chunks <- Seq(basic(els()),
        byTitle(els(), ChunkingOptions(combineTextUnderNChars = Some(0))))) {
      assert(chunks.size == 1)
      assert(chunks(0).metadata.text_as_html.contains(s"$m1 $m2 $m3"))
    }
  }

  test("text_as_html from a parent container lands on the first chunk only") {
    val m1 = """<div class="Section" id="1" />"""
    val m2 = """<p class="Paragraph" id="2">First </p>"""
    val m3 = """<p class="Paragraph" id="3">Second </p>"""
    def els() = Seq(
      withHtml(ElementType.NarrativeText, "", m1),
      withHtml(ElementType.NarrativeText, "First", m2, parent = Some("1")),
      withHtml(ElementType.NarrativeText, "Second", m3, parent = Some("1")))
    for (chunks <- Seq(basic(els(), ChunkingOptions(maxCharacters = 6)),
        byTitle(els(), ChunkingOptions(maxCharacters = 6,
          combineTextUnderNChars = Some(0))))) {
      assert(chunks.map(_.text) == Vector("First", "Second"))
      assert(chunks(0).metadata.text_as_html.contains(s"$m1 $m2"))
      assert(chunks(1).metadata.text_as_html.contains(m3))
    }
  }

  test("text_as_html repeats on every split of an oversized element") {
    val m1 = """<h1 class="Title" id="1">Header </h1>"""
    def els() = Seq(withHtml(ElementType.Title, "Header", m1))
    for (chunks <- Seq(basic(els(), ChunkingOptions(maxCharacters = 3)),
        byTitle(els(), ChunkingOptions(maxCharacters = 3,
          combineTextUnderNChars = Some(0))))) {
      assert(chunks.map(_.text) == Vector("Hea", "der"))
      assert(chunks(0).metadata.text_as_html.contains(m1))
      assert(chunks(1).metadata.text_as_html.contains(m1))
    }
  }

  // -- test_table_isolation.py DescribeTableIsolationDisabled (:241-295) --
  test("isolateTable=false restores table/text sharing and combining") {
    val els = Seq(text("preamble"), table("H\nC"), text("post"))
    val chunks = basic(els, ChunkingOptions(isolateTable = false))
    assert(chunks.size == 1)
    assert(chunks(0).`type` == ElementType.CompositeElement)
    assert(chunks(0).text.contains("preamble") && chunks(0).text.contains("post"))
    // ...while the default still isolates the same inputs into three chunks
    assert(basic(els.map(e => e.copy()), ChunkingOptions()).size == 3)
  }

  // -- DescribeTableIsolationOverlapAll (:297-345) --
  test("overlap never crosses a table boundary in either direction") {
    val o = ChunkingOptions(newAfterNChars = Some(0), overlap = 5, overlapAll = true)
    val a = basic(Seq(text("Alpha beta gamma delta."), table("H\nC")), o)
    val t = a.filter(_.`type` == ElementType.Table)
    assert(t.size == 1)
    assert(!t(0).text.contains("Alpha") && !t(0).text.contains("elta"))
    val b = basic(Seq(table("H\nC"), text("Omega sigma tau upsilon.")), o)
    val comp = b.filter(_.`type` == ElementType.CompositeElement)
    assert(comp.size == 1)
    assert(comp(0).text.startsWith("Omega"))
  }

  // -- DescribeTableIsolationChunkElements (:193-217) --
  test("two adjacent tables yield two distinct Table chunks even in a huge window") {
    val els = Seq(table("A\n1"), table("B\n2"))
    val chunks = basic(els, ChunkingOptions(maxCharacters = 10000))
    assert(chunks.map(_.`type`) == Vector(ElementType.Table, ElementType.Table))
    assert(chunks.map(_.text) == Vector("A\n1", "B\n2"))
  }

  // -- test_base.py Describe_HtmlTableSplitter ------------------------------------
  // The reference vectors pin row/cell/word split boundaries AND the bs4 text
  // normalization of messy source whitespace. Exercised through the public chunk
  // path: one Table element whose html carries the reference's exact markup.

  private def subtables(tableText: String, html: String, maxChars: Int): Vector[(String, String)] =
    if (maxChars >= 50)
      // public path (threshold allows html below a 50-char window only in the
      // direct-splitter tests; iter_chunks falls back to text-only there)
      byTitle(Seq(table(tableText, Some(html))), ChunkingOptions(maxCharacters = maxChars))
        .map(c => (c.text, c.metadata.text_as_html.getOrElse("")))
    else
      Chunker.TableChunker.syncSplits(Chunker.TableChunker.parseRows(html),
        ChunkingOptions(maxCharacters = maxChars))._1
        .map { case (t, h) => (t, h.getOrElse("")) }

  test("html table splits on whole-row boundaries when possible (test_base.py:2828)") {
    val html =
      """<table border="1" class="dataframe"><tbody>
        |<tr><td>Stanley
        |    Cups</td><td></td><td></td></tr>
        |<tr><td>Team</td><td>Location</td><td>Stanley Cups</td></tr>
        |<tr><td>Blues</td><td>STL</td><td>1</td></tr>
        |<tr><td>Flyers</td><td>PHI</td><td>2</td></tr>
        |<tr><td>Maple Leafs</td><td>TOR</td><td>13</td></tr>
        |</tbody></table>""".stripMargin
    val text = "Stanley Cups Team Location Stanley Cups Blues STL 1 Flyers PHI 2 " +
      "Maple Leafs TOR 13"
    assert(subtables(text, html, 40) == Vector(
      ("Stanley Cups Team Location Stanley Cups",
        "<table>" +
          "<tr><td>Stanley Cups</td><td/><td/></tr>" +
          "<tr><td>Team</td><td>Location</td><td>Stanley Cups</td></tr>" +
          "</table>"),
      ("Blues STL 1 Flyers PHI 2",
        "<table>" +
          "<tr><td>Blues</td><td>STL</td><td>1</td></tr>" +
          "<tr><td>Flyers</td><td>PHI</td><td>2</td></tr>" +
          "</table>"),
      ("Maple Leafs TOR 13",
        "<table><tr><td>Maple Leafs</td><td>TOR</td><td>13</td></tr></table>")))
  }

  test("oversized row splits on an even cell boundary (test_base.py:2886)") {
    val html =
      """<table>
        |<tr><td>Lorem ipsum dolor sit amet.</td>
        |<td>   Consectetur    adipiscing     elit.   </td>
        |<td>
        |  Laboris nisi ut
        |  aliquip ex ea commodo.
        |</td></tr>
        |<tr><td>Duis</td><td>Dolor</td></tr>
        |<tr><td>Duis</td><td>Cillum</td></tr>
        |</table>""".stripMargin
    val text = "Lorem ipsum dolor sit amet. Consectetur adipiscing elit. " +
      "Laboris nisi ut aliquip ex ea commodo. Duis Dolor Duis Cillum"
    assert(subtables(text, html, 93) == Vector(
      ("Lorem ipsum dolor sit amet. Consectetur adipiscing elit.",
        "<table><tr>" +
          "<td>Lorem ipsum dolor sit amet.</td>" +
          "<td>Consectetur adipiscing elit.</td>" +
          "</tr></table>"),
      ("Laboris nisi ut aliquip ex ea commodo.",
        "<table><tr><td>Laboris nisi ut aliquip ex ea commodo.</td></tr></table>"),
      ("Duis Dolor Duis Cillum",
        "<table>" +
          "<tr><td>Duis</td><td>Dolor</td></tr>" +
          "<tr><td>Duis</td><td>Cillum</td></tr>" +
          "</table>")))
  }

  test("oversized cell splits on an even word boundary (test_base.py:2932)") {
    // thead row exceeds half the window, so the header-repeat guard disables
    // carrying it and the rows split as plain content
    val html =
      """<table><thead><tr>
        |<td>
        |  Lorem ipsum dolor sit amet,
        |  consectetur adipiscing elit.
        |  Sed do eiusmod tempor
        |  incididunt ut labore et dolore magna aliqua.
        |</td>
        |<td> Ut enim ad minim veniam.           </td>
        |<td> Quis nostrud exercitation ullamco. </td>
        |</tr></thead><tbody>
        |<tr><td>Duis aute irure dolor</td></tr>
        |<tr><td>In reprehenderit voluptate.</td></tr>
        |</tbody></table>""".stripMargin
    val text = "Lorem ipsum dolor sit amet, consectetur adipiscing elit. " +
      "Sed do eiusmod tempor incididunt ut labore et dolore magna aliqua. " +
      "Ut enim ad minim veniam. Quis nostrud exercitation ullamco. " +
      "Duis aute irure dolor In reprehenderit voluptate."
    assert(subtables(text, html, 100) == Vector(
      ("Lorem ipsum dolor sit amet, consectetur adipiscing elit. Sed do",
        "<table>" +
          "<tr><td>Lorem ipsum dolor sit amet, consectetur adipiscing elit. Sed do</td></tr>" +
          "</table>"),
      ("eiusmod tempor incididunt ut labore et dolore magna aliqua.",
        "<table>" +
          "<tr><td>eiusmod tempor incididunt ut labore et dolore magna aliqua.</td></tr>" +
          "</table>"),
      ("Ut enim ad minim veniam. Quis nostrud exercitation ullamco.",
        "<table><tr>" +
          "<td>Ut enim ad minim veniam.</td>" +
          "<td>Quis nostrud exercitation ullamco.</td>" +
          "</tr></table>"),
      ("Duis aute irure dolor In reprehenderit voluptate.",
        "<table>" +
          "<tr><td>Duis aute irure dolor</td></tr>" +
          "<tr><td>In reprehenderit voluptate.</td></tr>" +
          "</table>")))
  }

  // -- PreChunk._text join vectors (test_base.py:879-910) -------------------------

  test("pre-chunk text joins non-empty segments with blank lines, prefix first") {
    def pcText(els: Seq[Element], prefix: String): String =
      Chunker.PreChunk(els.toVector, prefix, ChunkingOptions()).text
    val pb = el(ElementType.PageBreak, "")
    assert(pcText(Seq(text("foo"), text("bar")), "bah da bing.") == "bah da bing.\n\nfoo\n\nbar")
    assert(pcText(Seq(text("foo"), pb, text("bar")), "da bang.") == "da bang.\n\nfoo\n\nbar")
    assert(pcText(Seq(pb, text("foo")), "bah da boom.") == "bah da boom.\n\nfoo")
    assert(pcText(Seq(text("foo"), text("bar"), pb), "") == "foo\n\nbar")
  }

  test("overlap tail takes the last overlap chars, stripped (test_base.py:862-877)") {
    def tail(t: String): String =
      Chunker.PreChunk(Vector(text(t)), "",
        ChunkingOptions(overlap = 20, overlapAll = true)).overlapTail
    assert(tail("In rhoncus ipsum sed lectus porta volutpat.") == "ctus porta volutpat.")
    assert(tail("In rhoncus ipsum sed lect us   portas volutpat.  ") == "us portas volutpat.")
  }

  // -- CodeSnippet whitespace preservation (test_base.py:899-930) -----------------

  test("CodeSnippet elements keep internal whitespace in pre-chunk text") {
    val code = "def hello():\n    print('Hello')\n    return True"
    val pc = Chunker.PreChunk(Vector(el(ElementType.CodeSnippet, code)), "", ChunkingOptions())
    assert(pc.text == code)
  }

  test("CodeSnippet whitespace survives mixing with normalized text elements") {
    val code = "for i in range(10):\n    print(i)"
    val pc = Chunker.PreChunk(
      Vector(el(ElementType.UncategorizedText, "Here is some code:"),
        el(ElementType.CodeSnippet, code),
        el(ElementType.UncategorizedText, "That was the code.")),
      "", ChunkingOptions())
    assert(pc.text.contains(code))
    assert(pc.text.startsWith("Here is some code:\n\n"))
  }

  test("normalizeWs collapses all whitespace runs") {
    assert(Chunker.normalizeWs("  a \t b\n\nc  ") == "a b c")
    assert(Chunker.normalizeWs("") == "")
    assert(Chunker.normalizeWs(" \n ") == "")
  }

  // -- _as_header_row_html (base.py:1366-1379): only DIRECT <td> children of
  // the header <tr> become <th>; a nested table inside a header cell keeps
  // its own <td> cells untouched.
  test("headerHtml converts only top-level cells, not a nested table's") {
    val src = "<tr><td>Outer A</td>" +
      "<td><table><tr><td>inner 1</td><td>inner 2</td></tr></table></td>" +
      "<td colspan=\"2\">Outer B</td></tr>"
    val row = Chunker.TableChunker.Row(Vector.empty, isHeader = false, sourceHtml = src)
    assert(row.headerHtml ==
      "<tr><th>Outer A</th>" +
        "<th><table><tr><td>inner 1</td><td>inner 2</td></tr></table></th>" +
        "<th colspan=\"2\">Outer B</th></tr>")
  }

  // -- DescribePreChunkCombiner (test_base.py:3304-3504) ---------------------

  // it_does_not_combine_when_either_pre_chunk_contains_a_table: table
  // isolation holds through combination — small neighbors never absorb a table
  test("combiner never merges a table pre-chunk with its neighbors") {
    val els = Seq(
      title("Section A"), text("Small body."),
      table("Cell1 Cell2"),
      title("Section B"), text("Another small body."))
    val chunks = byTitle(els, ChunkingOptions(maxCharacters = 500,
      combineTextUnderNChars = Some(500), includeOrigElements = false))
    assert(chunks.map(_.`type`) == Vector(
      ElementType.CompositeElement, ElementType.Table, ElementType.CompositeElement))
    assert(chunks(1).text == "Cell1 Cell2")
  }

  // it_accommodates_and_isolates_an_oversized_pre_chunk: an oversized single
  // element neither combines forward nor backward; its neighbors stay intact
  test("combiner isolates an oversized pre-chunk between small ones") {
    val big = "Lorem ipsum dolor sit amet consectetur adipiscing elit." +
      " Mauris nec urna non augue vulputate consequat eget et nisi." +
      " Sed orci quam, eleifend sit amet vehicula, elementum ultricies."
    val els = Seq(title("Lorem Ipsum"), text(big), title("Vulputate Consequat"))
    val chunks = byTitle(els, ChunkingOptions(maxCharacters = 150,
      combineTextUnderNChars = Some(150), includeOrigElements = false))
    // oversized middle splits into window-sized pieces; titles stay their own
    // chunks on either side, exactly as the reference's three pre-chunks
    assert(chunks.head.text == "Lorem Ipsum")
    assert(chunks.last.text == "Vulputate Consequat")
    assert(chunks.drop(1).dropRight(1).forall(_.text.length <= 150))
    // space-boundary splits: the middle pieces reassemble the original text
    assert(chunks.drop(1).dropRight(1).map(_.text).mkString(" ") == big)
  }

  // -- reconstruct_table_from_chunks edges (test_base.py:2313-2817) --

  private def tchunk(text: String, idx: Option[Int], carried: Option[Int],
      html: String): Element =
    Element("", ElementType.TableChunk, text, "d", 1, ElementMetadata(
      table_id = Some("tid"), chunk_index = idx,
      num_carried_over_header_rows = carried, text_as_html = Some(html)))

  // -- it_reconstructs_repeated_header_tables_without_duplication_using_chunk_
  // metadata + and_it_reconstructs_a_single_canonical_thead_for_carried_headers
  test("reconstruction builds one canonical thead from carried headers") {
    val html = "<table><thead>" +
      "<tr><th>Header A</th><th>Header B</th></tr>" +
      "<tr><th>Subhead A</th><th>Subhead B</th></tr>" +
      "</thead><tbody>" +
      "<tr><td>Body 1</td><td>Alpha</td></tr>" +
      "<tr><td>Body 2</td><td>Bravo</td></tr>" +
      "<tr><td>Body 3</td><td>Charlie</td></tr>" +
      "<tr><td>Body 4</td><td>Delta</td></tr>" +
      "</tbody></table>"
    val text = "Header A Header B\nSubhead A Subhead B\nBody 1 Alpha\nBody 2 Bravo\n" +
      "Body 3 Charlie\nBody 4 Delta"
    val chunks = basic(
      Seq(el(ElementType.Table, text, html = Some(html))),
      ChunkingOptions(maxCharacters = 55, includeOrigElements = false))
    assert(chunks.map(_.metadata.num_carried_over_header_rows) ==
      Vector(Some(0), Some(2), Some(2), Some(2)))
    val table = Chunker.reconstructTable(chunks).get
    assert(table.text.split("\\s+").toSeq == text.split("\\s+").toSeq)
    assert(table.metadata.text_as_html.contains(
      "<table><thead><tr><th>Header A</th><th>Header B</th></tr>" +
        "<tr><th>Subhead A</th><th>Subhead B</th></tr></thead>" +
        "<tr><td>Body 1</td><td>Alpha</td></tr>" +
        "<tr><td>Body 2</td><td>Bravo</td></tr>" +
        "<tr><td>Body 3</td><td>Charlie</td></tr>" +
        "<tr><td>Body 4</td><td>Delta</td></tr></table>"))
  }

  // -- it_treats_missing_carried_header_row_counts_as_zero_during_reconstruction
  test("reconstruction treats a missing carried-header count as zero") {
    val table = Chunker.reconstructTable(Seq(
      tchunk("Header Body 1", Some(0), Some(0),
        "<table><tr><td>Header</td></tr><tr><td>Body 1</td></tr></table>"),
      tchunk("Header Body 2", Some(1), None,
        "<table><tr><td>Header</td></tr><tr><td>Body 2</td></tr></table>"))).get
    assert(table.text == "Header Body 1 Header Body 2")
    assert(table.metadata.text_as_html.contains(
      "<table><tr><td>Header</td></tr><tr><td>Body 1</td></tr>" +
        "<tr><td>Header</td></tr><tr><td>Body 2</td></tr></table>"))
  }

  // -- it_orders_chunks_with_missing_chunk_index_after_numbered_chunks
  test("reconstruction orders index-less chunks after numbered ones") {
    val table = Chunker.reconstructTable(Seq(
      tchunk("third", None, None, "<table><tr><td>third</td></tr></table>"),
      tchunk("second", Some(1), None, "<table><tr><td>second</td></tr></table>"),
      tchunk("first", Some(0), None, "<table><tr><td>first</td></tr></table>"))).get
    assert(table.text == "first second third")
    assert(table.metadata.text_as_html.contains(
      "<table><tr><td>first</td></tr><tr><td>second</td></tr>" +
        "<tr><td>third</td></tr></table>"))
  }

  // -- it_preserves_nested_table_structure_when_reconstructing_html
  test("reconstruction keeps nested tables nested") {
    val nested =
      "<table><tr><td><table><tr><td>Nested</td></tr></table></td></tr></table>"
    val table = Chunker.reconstructTable(Seq(tchunk("Nested", Some(0), Some(0), nested))).get
    assert(table.metadata.text_as_html.contains(nested))
  }

  // -- DescribeHtmlCell and_it_preserves_nested_markup_when_serializing_
  // nonempty_cells: compactification keeps a nested table inside a cell while
  // dropping the outer cell's cosmetic attributes; the nested text still
  // contributes to the cell's text
  test("compactification preserves nested markup inside a cell") {
    val rows = Chunker.TableChunker.parseRows(
      "<table><tr><td class=\"x\"><table><tr><td>Inner</td></tr></table></td>" +
        "<td>B</td></tr></table>")
    assert(rows.size == 1)
    assert(rows.head.cells.map(_.text) == Vector("Inner", "B"))
    assert(rows.head.html ==
      "<tr><td><table><tr><td>Inner</td></tr></table></td><td>B</td></tr>")
  }

  // -- DescribeChunkingOptions (test_base.py:51-250): the validation and
  // derived-value table.
  test("ChunkingOptions validation and derived values match the reference") {
    import graft.operators.{ChunkingOptions => CO}
    // it_rejects_max_characters_not_greater_than_zero
    Seq(0, -1, -42).foreach(n =>
      assertThrows[IllegalArgumentException](CO(maxCharacters = n)))
    // it_rejects_new_after_n_chars_for_n_less_than_zero (validated entry)
    val neg = intercept[IllegalArgumentException](
      CO.validated(newAfterNChars = Some(-1)))
    assert(neg.getMessage.contains("'new_after_n_chars' argument must be >= 0, got -1"))
    // it_rejects_overlap_not_less_than_max_characters
    assertThrows[IllegalArgumentException](CO(maxCharacters = 200, overlap = 300))
    // it_does_not_complain_when_specifying_new_after_n_chars_by_itself
    assert(CO.validated(newAfterNChars = Some(200)).softMax == 200)
    // it_accepts_0_for_new_after_n_chars (each element its own pre-chunk)
    assert(CO.validated(newAfterNChars = Some(0)).softMax == 0)
    // it_silently_accepts_new_after_n_chars_greater_than_maxchars -> capped
    assert(CO.validated(maxCharacters = Some(444), newAfterNChars = Some(555)).softMax == 444)
    // overlap / inter_chunk_overlap / text_separator
    assert(CO(overlap = 10).overlap == 10)
    assert(CO(overlap = 10, overlapAll = true).interChunkOverlap == 10)
    assert(CO(overlap = 10).interChunkOverlap == 0)
    assert(CO().separator == "\n\n")
    // token-mode validation (validated entry points)
    assert(intercept[IllegalArgumentException](
      CO.validated(maxTokens = Some(100), maxCharacters = Some(500)))
      .getMessage.contains("mutually exclusive"))
    assert(intercept[IllegalArgumentException](CO.validated(maxTokens = Some(100)))
      .getMessage.contains("'tokenizer' is required"))
    assertThrows[IllegalArgumentException](
      CO.validated(maxTokens = Some(0), tokenizer = Some("cl100k_base")))
    assert(intercept[IllegalArgumentException](
      CO.validated(newAfterNTokens = Some(50)))
      .getMessage.contains("requires 'max_tokens'"))
    // it_knows_when_token_counting_is_enabled + hard/soft max in tokens
    val tok = CO.validated(maxTokens = Some(100), newAfterNTokens = Some(80),
      tokenizer = Some("cl100k_base"))
    assert(tok.useTokenCounting && tok.hardMax == 100 && tok.softMax == 80)
    // it_defaults_soft_max_to_hard_max_for_token_counting
    assert(CO.validated(maxTokens = Some(100), tokenizer = Some("cl100k_base"))
      .softMax == 100)
    // it_measures_text_in_characters_by_default
    assert(CO().measure("hello world") == 11)
  }

  // -- Describe_is_on_next_page (test_base.py:3577-3624): page boundaries
  // fire on any page-number CHANGE (even to a lower number); None continues
  // the current page; the first element never breaks and defaults to page 1.
  test("page-boundary predicate: change detection, None continuation, lower pages") {
    def pages(ps: Seq[Option[Int]]): Vector[Vector[String]] = {
      val els = ps.zipWithIndex.map { case (p, i) =>
        el(ElementType.NarrativeText, s"t$i", page = p)
      }
      byTitle(els, ChunkingOptions(multipageSections = false,
        combineTextUnderNChars = Some(0), includeOrigElements = false))
        .map(_.text.split("\n\n").toVector)
    }
    // 4, 2, 2, None, 3 -> breaks entering 2 and entering 3; None continues
    assert(pages(Seq(Some(4), Some(2), Some(2), None, Some(3))) ==
      Vector(Vector("t0"), Vector("t1", "t2", "t3"), Vector("t4")))
    // first element with no page number assumes page 1
    assert(pages(Seq(None, Some(1), Some(1))) == Vector(Vector("t0", "t1", "t2")))
    // no page numbers at all -> no breaks
    assert(pages(Seq(None, None, None)) == Vector(Vector("t0", "t1", "t2")))
  }

  // -- Describe_HtmlTableSplitter (test_base.py:2825-2985): the three
  // reference subtable vectors — whole-row splits, oversized-row cell
  // splits, oversized-cell word splits — with whitespace normalization,
  // thead/tbody flattening, and `<td/>` void empties, exactly as upstream.
  test("HtmlTableSplitter matches the reference subtable vectors") {
    def subtables(max: Int, html: String): Vector[(String, String)] = {
      val rows = Chunker.TableChunker.parseRows(html)
      Chunker.TableChunker.syncSplits(rows, ChunkingOptions(maxCharacters = max))
        ._1.map { case (t, h) => (t, h.getOrElse("")) }
    }
    assert(subtables(40,
      """<table border="1" class="dataframe"><tbody>
        |<tr><td>Stanley
        |Cups</td><td></td><td></td></tr>
        |<tr><td>Team</td><td>Location</td><td>Stanley Cups</td></tr>
        |<tr><td>Blues</td><td>STL</td><td>1</td></tr>
        |<tr><td>Flyers</td><td>PHI</td><td>2</td></tr>
        |<tr><td>Maple Leafs</td><td>TOR</td><td>13</td></tr>
        |</tbody></table>""".stripMargin) == Vector(
      ("Stanley Cups Team Location Stanley Cups",
        "<table><tr><td>Stanley Cups</td><td/><td/></tr>" +
          "<tr><td>Team</td><td>Location</td><td>Stanley Cups</td></tr></table>"),
      ("Blues STL 1 Flyers PHI 2",
        "<table><tr><td>Blues</td><td>STL</td><td>1</td></tr>" +
          "<tr><td>Flyers</td><td>PHI</td><td>2</td></tr></table>"),
      ("Maple Leafs TOR 13",
        "<table><tr><td>Maple Leafs</td><td>TOR</td><td>13</td></tr></table>")))
    assert(subtables(93,
      """<html><body><table>
        |<tr><td>Lorem ipsum dolor sit amet.</td>
        |<td>   Consectetur    adipiscing     elit.   </td>
        |<td>
        |Laboris nisi ut
        |aliquip ex ea commodo.
        |</td></tr>
        |<tr><td>Duis</td><td>Dolor</td></tr>
        |<tr><td>Duis</td><td>Cillum</td></tr>
        |</table></body></html>""".stripMargin) == Vector(
      ("Lorem ipsum dolor sit amet. Consectetur adipiscing elit.",
        "<table><tr><td>Lorem ipsum dolor sit amet.</td>" +
          "<td>Consectetur adipiscing elit.</td></tr></table>"),
      ("Laboris nisi ut aliquip ex ea commodo.",
        "<table><tr><td>Laboris nisi ut aliquip ex ea commodo.</td></tr></table>"),
      ("Duis Dolor Duis Cillum",
        "<table><tr><td>Duis</td><td>Dolor</td></tr>" +
          "<tr><td>Duis</td><td>Cillum</td></tr></table>")))
    assert(subtables(100,
      """<table><thead>
        |<tr><td>
        |Lorem ipsum dolor sit amet,
        |consectetur adipiscing elit.
        |Sed do eiusmod tempor
        |incididunt ut labore et dolore magna aliqua.
        |</td>
        |<td> Ut enim ad minim veniam.           </td>
        |<td> Quis nostrud exercitation ullamco. </td></tr>
        |</thead><tbody>
        |<tr><td>Duis aute irure dolor</td></tr>
        |<tr><td>In reprehenderit voluptate.</td></tr>
        |</tbody></table>""".stripMargin) == Vector(
      ("Lorem ipsum dolor sit amet, consectetur adipiscing elit. Sed do",
        "<table><tr><td>Lorem ipsum dolor sit amet, consectetur adipiscing elit." +
          " Sed do</td></tr></table>"),
      ("eiusmod tempor incididunt ut labore et dolore magna aliqua.",
        "<table><tr><td>eiusmod tempor incididunt ut labore et dolore magna" +
          " aliqua.</td></tr></table>"),
      ("Ut enim ad minim veniam. Quis nostrud exercitation ullamco.",
        "<table><tr><td>Ut enim ad minim veniam.</td>" +
          "<td>Quis nostrud exercitation ullamco.</td></tr></table>"),
      ("Duis aute irure dolor In reprehenderit voluptate.",
        "<table><tr><td>Duis aute irure dolor</td></tr>" +
          "<tr><td>In reprehenderit voluptate.</td></tr></table>")))
  }

  // -- _TableChunker._iter_chunks fit/fallback gates (base.py:976-1006):
  // below the 50-char html threshold an oversized table text-splits with NO
  // text_as_html — the 33-char-per-chunk html overhead is impractical there.
  test("table chunking falls back to text-only splits below the html threshold") {
    val html = "<table><tr><td>alpha beta gamma delta epsilon zeta</td><td></td></tr>" +
      "<tr><td>Team</td><td>Loc</td></tr></table>"
    val t = el(ElementType.Table, "alpha beta gamma delta epsilon zeta Team Loc",
      html = Some(html))
    val chunks = basic(Seq(t), ChunkingOptions(maxCharacters = 40,
      includeOrigElements = false))
    assert(chunks.size > 1)
    assert(chunks.forall(_.metadata.text_as_html.isEmpty))
    assert(chunks.forall(_.`type` == ElementType.TableChunk))
  }

  // -- Describe_TextSplitter (test_base.py:3011-3110): the full reference
  // split-vector table — preferred separator, next-separator fallback,
  // arbitrary-character last resort, no-split short strings, window fill,
  // whitespace stripping around the split, and the 10-char overlap prefix
  // (9 chars + the joining space) carried into each remainder.
  test("TextSplitter matches the reference split vectors") {
    def walk(max: Int, text: String): Vector[(String, String)] = {
      val split = new Chunker.TextSplitter(ChunkingOptions(maxCharacters = max, overlap = 10))
      val out = Vector.newBuilder[(String, String)]
      var t = text
      while (t.nonEmpty) {
        val (s, r) = split(t)
        out += ((s, r))
        t = if (r == t) "" else r
      }
      out.result()
    }
    // it_splits_on_a_preferred_separator_when_it_can
    assert(walk(50,
      "Lorem ipsum dolor amet consectetur adipiscing.  \n  In rhoncus ipsum sed lectus porta.") ==
      Vector(
        ("Lorem ipsum dolor amet consectetur adipiscing.",
          "ipiscing. In rhoncus ipsum sed lectus porta."),
        ("ipiscing. In rhoncus ipsum sed lectus porta.", "")))
    // and_it_splits_on_the_next_available_separator_when_the_first_is_not_available
    assert(walk(40,
      "Lorem ipsum dolor amet consectetur adipiscing. In rhoncus ipsum sed lectus porta" +
        " volutpat.") ==
      Vector(
        ("Lorem ipsum dolor amet consectetur",
          "nsectetur adipiscing. In rhoncus ipsum sed lectus porta volutpat."),
        ("nsectetur adipiscing. In rhoncus ipsum", "cus ipsum sed lectus porta volutpat."),
        ("cus ipsum sed lectus porta volutpat.", "")))
    // and_it_splits_on_an_arbitrary_character_as_a_last_resort
    assert(walk(30,
      "Loremipsumdolorametconsecteturadipiscingelit. In rhoncus ipsum sed lectus porta.")
      .take(3) ==
      Vector(
        ("Loremipsumdolorametconsectetur",
          "onsecteturadipiscingelit. In rhoncus ipsum sed lectus porta."),
        ("onsecteturadipiscingelit. In", "gelit. In rhoncus ipsum sed lectus porta."),
        ("gelit. In rhoncus ipsum sed", "ipsum sed lectus porta.")))
    // it_does_not_split_a_string_that_is_not_longer_than_maxlen
    Seq("Lorem ipsum dolor amet consectetur adipiscing.", "Lorem ipsum dolor.").foreach { t =>
      assert(walk(46, t) == Vector((t, "")))
    }
    // it_fills_the_window_when_falling_back_to_an_arbitrary_character_split
    val fill = walk(38,
      "Loremipsumdolorametconsecteturadipiscingelit. In rhoncus ipsum sed lectus porta.")
    assert(fill.head._1 == "Loremipsumdolorametconsecteturadipisci" && fill.head._1.length == 38)
    // it_strips_whitespace_around_the_split
    assert(walk(50,
      "Lorem ipsum dolor amet consectetur adipiscing.   \n\n In rhoncus ipsum sed lectus.").head ==
      (("Lorem ipsum dolor amet consectetur adipiscing.",
        "ipiscing. In rhoncus ipsum sed lectus.")))
  }
}
