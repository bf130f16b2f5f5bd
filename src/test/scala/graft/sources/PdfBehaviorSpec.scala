package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/**
 * Behavior suite ported from the reference's fast-strategy PDF tests
 * (`/root/reference/test_unstructured/partition/pdf_image/test_pdf.py`) over the
 * same example documents, driving the native object-model reader end-to-end:
 * page tree, filters, fonts/ToUnicode, encryption, and form XObjects.
 */
class PdfBehaviorSpec extends AnyFunSuite {

  private val docs = "/root/reference/example-docs/pdf/"

  private def paras(name: String) =
    PdfPartitioner.partitionPdf(Files.readAllBytes(Paths.get(docs + name)))

  // -- test_partition_pdf_with_fast_strategy --------------------------------------

  test("layout-parser-paper-fast: many elements across exactly two pages") {
    val ps = paras("layout-parser-paper-fast.pdf")
    assert(ps.size > 10)
    assert(ps.flatMap(_.pageNumber).toSet == Set(1, 2))
  }

  // -- test_partition_pdf_with_fast_groups_text -----------------------------------

  test("fast strategy extracts the abstract's flowing text") {
    // the reference's pdfminer groups the whole abstract into one >1000-char
    // element via y-gap textbox clustering; the native reader keeps line
    // elements, so assert the text content rather than the grouping
    val ps = paras("layout-parser-paper-fast.pdf")
    val all = ps.map(_.text).mkString(" ")
    assert(all.contains("Abstract."))
    assert(all.contains("Recent advances in document image analysis"))
    assert(all.contains("layout-parser.github.io"))
  }

  // -- test_partition_pdf_with_fast_neg_coordinates -------------------------------

  test("negative-coords: form XObject text splices into the page stream") {
    val ps = paras("negative-coords.pdf")
    assert(ps.nonEmpty)
    assert(ps.exists(_.text.contains("Comprehensive Carbon Footprint")))
  }

  // -- test_partition_pdf_with_fast_strategy_extracts_embedded_cmap_text ----------

  test("embedded CMap CIDFont text extracts alongside simple-font text") {
    val ps = paras("embedded-cmap-cidfont.pdf")
    val all = ps.map(_.text).mkString(" ")
    assert(all.contains("Heading in Helvetica"))
    assert(all.contains("This text uses an embedded CMap"))
    assert(all.contains("and should be extractable"))
    assert(ps.size == 3)
  }

  // -- test_partition_pdf_with_copy_protection ------------------------------------

  test("copy-protected (AES-128, empty user password) decrypts and extracts") {
    val ps = paras("copy-protected.pdf")
    assert(ps.size > 10)
    assert(ps.exists(_.text.contains("LayoutParser")))
  }

  test("MacRomanEncoding fonts decode fi/fl ligatures, not Latin-1 Þ/ß") {
    // layout-parser-paper-with-empty-pages.pdf ships 14 /MacRomanEncoding
    // fonts with no ToUnicode for the ligature codes: 0xDE must decode via
    // the Mac OS Roman table (ﬁ), not the Latin-1/cp1252 fallback (Þ)
    val ps = paras("layout-parser-paper-with-empty-pages.pdf")
    val title = ps.map(_.text).find(_.contains("LayoutParser")).get
    assert(title.contains("Uniﬁed"), s"ligature not decoded: $title")
    assert(!ps.exists(_.text.contains("UniÞed")))
  }

  // -- test_partition_pdf_with_password -------------------------------------------

  test("password.pdf opens with its user password; wrong/absent stays opaque") {
    val bytes = Files.readAllBytes(Paths.get(docs + "password.pdf"))
    // the reference's exact expectation: ONE element, this text
    val opened = PdfPartitioner.partitionPdf(bytes, password = "password")
    assert(opened.size === 1)
    assert(opened.head.text === "File with password")
    // no password / a wrong password: the /U check fails, no decryptor is
    // built, and extraction is EMPTY — opaque, never mojibake
    assert(PdfPartitioner.partitionPdf(bytes).isEmpty)
    assert(PdfPartitioner.partitionPdf(bytes, password = "wrong").isEmpty)
  }

  // -- AES-256 (V5: R5/R6) — fixtures from dev/gen_aes256_pdf.py, an
  // -- independent Python rendering of ISO 32000-2 Algorithms 2.B/8/9 ------------

  private def aesFixture(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get("src/test/resources/graft/pdf/" + name))

  test("AES-256 R6 opens with its user password; wrong/absent stays opaque") {
    val bytes = aesFixture("aes256-r6-password.pdf")
    val opened = PdfPartitioner.partitionPdf(bytes, password = "graft")
    assert(opened.size === 1)
    assert(opened.head.text === "AES-256 R6 secured text")
    // same contract as R2-R4: wrong password -> no decryptor -> empty, never
    // mojibake (the hardened 2.B hash rejects it, it does not garble)
    assert(PdfPartitioner.partitionPdf(bytes).isEmpty)
    assert(PdfPartitioner.partitionPdf(bytes, password = "wrong").isEmpty)
  }

  test("AES-256 R6 opens with the OWNER password (Algorithm 2.A owner path)") {
    // the owner hash mixes the 48-byte /U string into Algorithm 2.B and the
    // file key unwraps from /OE — a distinct code path from the user check
    val opened = PdfPartitioner.partitionPdf(
      aesFixture("aes256-r6-password.pdf"), password = "owner-secret")
    assert(opened.size === 1)
    assert(opened.head.text === "AES-256 R6 secured text")
  }

  test("AES-256 R6 with an empty user password opens unprompted") {
    val ps = PdfPartitioner.partitionPdf(aesFixture("aes256-r6-empty.pdf"))
    assert(ps.size === 1)
    assert(ps.head.text === "AES-256 R6 copy-protected text")
  }

  test("AES-256 R5 (deprecated single-round SHA-256) opens") {
    val ps = PdfPartitioner.partitionPdf(aesFixture("aes256-r5-empty.pdf"))
    assert(ps.size === 1)
    assert(ps.head.text === "AES-256 R5 legacy text")
  }

  // -- image-only pages -----------------------------------------------------------

  test("an image-only page yields no text elements (no compressed-byte leakage)") {
    assert(paras("loremipsum-flat.pdf").isEmpty)
  }

  // -- fake-bold (ASCII85 + Flate filter chain) -----------------------------------

  test("ASCII85+Flate filter chain decodes; fake-bold doubles dedup away") {
    val ps = paras("fake-bold-sample.pdf")
    assert(ps.nonEmpty)
    assert(ps.head.text.contains("Fake Bold PDF Test Document"))
    // each fake-bold char is drawn twice at a 0.3 pt offset; the positional
    // dedup (pdfminer_utils.py:370-458 semantics: origin deltas < 2 pt AND
    // >50% horizontal overlap) keeps one instance —
    // test_fake_bold_pdf_with_deduplication_shows_clean_text
    val all = ps.map(_.text).mkString(" ")
    assert(all.contains("BOLD TEXT SAMPLE"), s"doubled glyphs survived: $all")
    assert(all.contains("Testing Deduplication"))
    // the doc's trailing NOTE legitimately quotes the literal 'BBOOLLDD' —
    // it must survive verbatim (it is real text, not doubling)
    assert(all.contains("doubled characters like 'BBOOLLDD'"))
    // legitimate doubles are NOT collapsed: normal text keeps its "ll"
    assert(all.contains("Hello World"))
  }

  // -- multi-page text PDFs -------------------------------------------------------

  test("fake-memo: date, salutation, and body lines split into elements") {
    val ps = paras("fake-memo.pdf")
    assert(ps.head.text == "May 5, 2023")
    assert(ps.exists(_.text.contains("To Whom it May Concern")))
  }

  test("multi-column paper extracts every page in order") {
    val ps = paras("multi-column.pdf")
    assert(ps.head.text.startsWith("Dense Passage Retrieval"))
    val pages = ps.flatMap(_.pageNumber)
    assert(pages == pages.sorted)
    assert(pages.distinct.size >= 10)
  }

  // -- ToUnicode subset-font decoding ---------------------------------------------

  test("chevron-page: 1-byte subset codes decode through ToUnicode bfchar maps") {
    val ps = paras("chevron-page.pdf")
    assert(ps.exists(_.text.toLowerCase.contains("eastern mediterranean")))
  }

  // -- adversarial fixtures (r12 tranche) -------------------------------------------

  // -- test_partition_pdf_with_fast_finds_headers_footers (test_pdf.py:1419) --
  test("header-test-doc: per-glyph text objects reassemble into the four lines") {
    // one BT..ET per GLYPH (Skia/Chromium print output): words come from
    // CID /W advances and effective-y tracking, exactly the reference texts
    assert(paras("header-test-doc.pdf").map(_.text) == Seq(
      "I Am A Header", "Title", "Here is a lovely sentences.", "I Am A Footer"))
  }

  // -- test_partition_pdf_requiring_recursive_text_grab (test_pdf.py:866) --
  test("reliance: recursive text grab yields many elements over three pages") {
    val ps = paras("reliance.pdf")
    assert(ps.size > 50)
    assert(ps.head.pageNumber.contains(1))
    assert(ps.last.pageNumber.contains(3))
  }

  // -- test_partition_pdf_text_not_extractable (test_pdf.py:873) --
  test("loremipsum-flat: rasterized text extracts zero elements, no crash") {
    assert(paras("loremipsum-flat.pdf").isEmpty)
  }

  // -- test_partition_pdf_with_bad_color_profile (test_pdf.py:1413) --
  test("pdf-bad-color-space partitions despite the broken color profile") {
    val ps = paras("pdf-bad-color-space.pdf")
    assert(ps.nonEmpty)
    assert(ps.exists(_.text.contains("2023 Environmental Report")))
  }

  // -- test_properly_patch_pdfminer (test_pdf.py:1444) --
  test("invalid-pdf-structure-one-page extracts both pages without repair") {
    val ps = paras("invalid-pdf-structure-pdfminer-one-page.pdf")
    assert(ps.nonEmpty)
    assert(ps.flatMap(_.pageNumber).distinct.sorted == Seq(1, 2))
    assert(ps.exists(_.text.contains("Cybersecurity")))
  }

  // -- test_partition_pdf_with_all_number_table_and_ocr_only_strategy (:1404) --
  test("all-number-table partitions numeric-only content without error") {
    val ps = paras("all-number-table.pdf")
    assert(ps.nonEmpty)
    assert(ps.exists(_.text.contains("200.01")))
  }

  // -- test_unique_and_deterministic_element_ids fixture (test_pdf.py:1585) --
  test("duplicate-page memo: ObjStm page tree yields two identical pages") {
    // the page tree, catalog, and fonts live in a PDF 1.5 compressed object
    // stream (/ObjStm); both pages must surface with identical text streams
    val ps = paras("fake-memo-with-duplicate-page.pdf")
    val byPage = ps.groupBy(_.pageNumber)
    assert(byPage.keySet == Set(Some(1), Some(2)))
    assert(byPage(Some(1)).map(_.text) == byPage(Some(2)).map(_.text))
    assert(ps.exists(_.text.startsWith("May 5, 2023")))
    // wrapped body lines joined by width-aware assembly, not split per line
    assert(ps.exists(_.text.contains("delivered on January 23, 2023. A total")))
  }

  // -- within-line x-sorted assembly (pdfminer's line ordering) --
  test("embedded-images-tables: sub/superscript runs interleave at their x position") {
    // the H2SO4 subscripts are emitted LATER in the content stream at a lower
    // baseline; x-sorted segment assembly splices them back into reading
    // order instead of appending them at the end of the line
    val all = paras("embedded-images-tables.pdf").map(_.text).mkString(" ")
    assert(all.contains("0.5 M H2SO4 solution"))
    assert(all.contains("Corrosion rate (mm/year)"))
  }

  // -- xref-ordered ObjStm collision resolution --------------------------------
  // An incremental save can move an object INTO an object stream while the
  // stale top-level copy remains in the file; only the newest xref's type-2
  // entry says which definition is current (pdfminer resolves through its
  // xref walk in pdfdocument.py). The builder writes: rev 1 = page 3 with
  // /Contents 4 ("OLD stale content") + classic xref; rev 2 appends content 7
  // ("NEW updated content"), an ObjStm carrying the REPLACEMENT page 3, and
  // an xref stream (type-2 entry for 3, /Prev -> the classic table).

  private def buildIncrementalObjStmPdf(flatePredictor: Boolean): Array[Byte] = {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val out = new java.io.ByteArrayOutputStream()
    def off = out.size()
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    w("%PDF-1.5\n")
    val o1 = off; w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    val o2 = off; w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    val o3 = off
    w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n")
    val oldContent = "BT /F1 12 Tf 72 700 Td (OLD stale content) Tj ET"
    val o4 = off
    w(s"4 0 obj << /Length ${oldContent.length} >> stream\n" +
      oldContent + "\nendstream endobj\n")
    val o5 = off
    w("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    val x1 = off
    w("xref\n0 6\n0000000000 65535 f \n")
    Seq(o1, o2, o3, o4, o5).foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer << /Size 6 /Root 1 0 R >>\nstartxref\n$x1\n%%%%EOF\n")
    // ---- revision 2: the incremental update
    val newContent = "BT /F1 12 Tf 72 700 Td (NEW updated content) Tj ET"
    val o7 = off
    w(s"7 0 obj << /Length ${newContent.length} >> stream\n" +
      newContent + "\nendstream endobj\n")
    val member = "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 7 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
    val pairTable = "3 0 "
    val stmBody = pairTable + member
    val o6 = off
    w(s"6 0 obj << /Type /ObjStm /N 1 /First ${pairTable.length} " +
      s"/Length ${stmBody.length} >> stream\n" + stmBody +
      "\nendstream endobj\n")
    val o8 = off
    // rows (W = [1 2 1]), Index = [3 1 6 3]: obj 3 -> type 2 in stm 6;
    // objs 6,7,8 -> type 1 at their offsets
    def row(t: Int, mid: Int, last: Int): Array[Byte] =
      Array(t.toByte, ((mid >> 8) & 0xFF).toByte, (mid & 0xFF).toByte, last.toByte)
    val rawRows = Array(row(2, 6, 0), row(1, o6, 0), row(1, o7, 0), row(1, o8, 0))
    val (rowBytes, filterClause) =
      if (!flatePredictor) (rawRows.flatten, "")
      else {
        // forward-apply PNG Up (type-2) predictor, then deflate
        val encoded = new java.io.ByteArrayOutputStream()
        var prev = new Array[Byte](4)
        rawRows.foreach { r =>
          encoded.write(2)
          (0 until 4).foreach(i => encoded.write((r(i) - prev(i)) & 0xFF))
          prev = r
        }
        val d = new java.util.zip.Deflater()
        d.setInput(encoded.toByteArray); d.finish()
        val buf = new Array[Byte](256)
        val comp = new java.io.ByteArrayOutputStream()
        while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
        (comp.toByteArray,
          " /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >>")
      }
    w(s"8 0 obj << /Type /XRef /Size 9 /W [1 2 1] /Index [3 1 6 3] " +
      s"/Root 1 0 R /Prev $x1$filterClause /Length ${rowBytes.length} " +
      ">> stream\n")
    out.write(rowBytes)
    w(s"\nendstream endobj\nstartxref\n$o8\n%%%%EOF\n")
    out.toByteArray
  }

  test("incremental update moving a page into an ObjStm extracts the NEW content") {
    val ps = PdfPartitioner.partitionPdf(buildIncrementalObjStmPdf(false))
    assert(ps.map(_.text) === Seq("NEW updated content"),
      s"stale top-level definition won: ${ps.map(_.text)}")
  }

  test("xref streams decode through FlateDecode + PNG Up predictor") {
    val ps = PdfPartitioner.partitionPdf(buildIncrementalObjStmPdf(true))
    assert(ps.map(_.text) === Seq("NEW updated content"))
  }

  test("hybrid-reference files consult /XRefStm before /Prev") {
    // Acrobat-style hybrid: revision 2's AUTHORITATIVE table is classic and
    // lists only the new top-level objects; the type-2 entry that moves page
    // 3 into the ObjStm lives in the /XRefStm stream the trailer points at.
    // The walk must consult that stream BEFORE following /Prev to revision
    // 1's table (whose stale type-1 entry for 3 would otherwise win).
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val base = new String(buildIncrementalObjStmPdf(false), latin1)
    // locate revision 2's xref STREAM object and the first classic table
    val xrefStmAt = base.lastIndexOf("8 0 obj")
    val x1 = base.indexOf("xref\n")
    // rebuild the tail: keep everything through the xref stream's endobj,
    // then append a classic rev-2 table with /XRefStm instead of pointing
    // startxref at the stream directly
    val streamEndObj = base.indexOf("endobj", xrefStmAt) + "endobj".length
    val head = base.substring(0, streamEndObj) + "\n"
    val o6 = base.lastIndexOf("6 0 obj")
    val o7 = base.lastIndexOf("7 0 obj")
    val x2 = head.length
    val table2 = "xref\n6 3\n" +
      f"$o6%010d 00000 n \n$o7%010d 00000 n \n$xrefStmAt%010d 00000 n \n" +
      s"trailer << /Size 9 /Root 1 0 R /XRefStm $xrefStmAt /Prev $x1 >>\n" +
      s"startxref\n$x2\n%%EOF\n"
    // the embedded xref stream must not re-point at rev 1 via its own /Prev
    // AND the hybrid table — drop the stream's startxref trailer from `head`
    val hybrid = (head + table2).getBytes(latin1)
    val ps = PdfPartitioner.partitionPdf(hybrid)
    assert(ps.map(_.text) === Seq("NEW updated content"),
      s"/XRefStm was not consulted: ${ps.map(_.text)}")
  }

  test("without a type-2 xref entry the top-level definition still wins") {
    // strip revision 2's xref stream: the walk finds only the classic table,
    // whose type-1 entry keeps the top-level page 3 authoritative — the
    // pre-existing incremental-update-top-level-wards behavior is unchanged
    val full = new String(buildIncrementalObjStmPdf(false),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val cut = full.lastIndexOf("8 0 obj")
    val sx1 = full.indexOf("startxref")
    val firstStart = full.substring(sx1, full.indexOf("%%EOF", sx1))
    val truncated = (full.substring(0, cut) + firstStart + "\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val ps = PdfPartitioner.partitionPdf(truncated)
    assert(ps.map(_.text) === Seq("OLD stale content"))
  }

  // -- CID /W width-array parsing vectors (PDF 32000-1 §9.7.4.3) --
  test("parseCidWidths handles both list and range entry forms") {
    val w = "[0 [750] 17 [277.83203] 41 [610.83984 0 722.16797] 71 72 556.15234 76 79 222.16797]"
    val m = PdfPartitioner.parseCidWidths(w)
    assert(m(0) == 750.0 && m(17) == 277.83203)
    assert(m(41) == 610.83984 && m(42) == 0.0 && m(43) == 722.16797)
    assert(m(71) == 556.15234 && m(72) == 556.15234)
    assert((76 to 79).forall(m(_) == 222.16797))
    assert(!m.contains(80))
  }
}
