package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{functions => F}

import graft.SparkSuiteBase
import graft.sinks.ElementSink

/**
 * End-to-end partition parity against the reference's own published outputs:
 * for every ingest golden (`expected-structured-output/`) whose SOURCE document
 * ships in `example-docs/`, partition the source through the auto router and
 * require the `(type, text)` stream to equal the golden element array. This is
 * the strongest per-format statement available offline — the reference's own
 * documents produce the reference's own output. Provenance metadata
 * (connector record locators, ids, dates) is ingest-side and excluded.
 */
class GoldenPartitionParitySpec extends SparkSuiteBase {

  private val ref = "/root/reference/"
  private val out = ref + "test_unstructured_ingest/expected-structured-output/"

  /** (example-docs source, golden json) pairs for natively-parsed formats. */
  private val pairs = Seq(
    "fake-text.txt" -> "Sharepoint/fake-text.txt.json",
    "language-docs/UDHR_first_article_all.txt" ->
      "local-single-file/UDHR_first_article_all.txt.json",
    "book-war-and-peace-1p.txt" -> "embed/book-war-and-peace-1p.txt.json",
    "ideas-page.html" -> "Sharepoint/ideas-page.html.json",
    "fake.docx" -> "google-drive/fake.docx.json",
    "handbook-1p.docx" -> "box/handbook-1p.docx.json",
    "science-exploration-1p.pptx" -> "box/science-exploration-1p.pptx.json",
    "stanley-cups.xlsx" -> "Sharepoint/stanley-cups.xlsx.json",
    "tests-example.xls" ->
      "onedrive/utic-test-ingest-fixtures/tests-example.xls.json")

  /** Whitespace-normalized compare: some goldens predate the reference's
    * HtmlTable.text refactor and carry newline-joined table text where current
    * reference code (and this engine) emit the space-joined normalized form. */
  private def norm(t: String): String = graft.operators.Chunker.normalizeWs(t)

  private def goldenStream(rel: String): Seq[(String, String)] = {
    val df = ElementSink.readWireJson(spark, out + rel, multiLine = true)
      .coalesce(1)
      .withColumn("seq", F.monotonically_increasing_id())
    df.orderBy("seq").select("type", "text").collect().toSeq
      .map(r => (r.getString(0), norm(Option(r.getString(1)).getOrElse(""))))
  }

  private def ourStream(src: String): Seq[(String, String)] = {
    val dir = Files.createTempDirectory("golden-parity").toString
    val name = Paths.get(src).getFileName.toString
    Files.write(Paths.get(dir, name),
      Files.readAllBytes(Paths.get(ref + "example-docs/" + src)))
    AutoSource.partitionFiles(spark, dir)
      // the ingest harness that produced the goldens runs with
      // include_page_breaks=False (partition_docx's own default is True)
      .filter(F.col("element_type") =!= "PageBreak")
      .orderBy("seq").select("element_type", "text").collect().toSeq
      .map(r => (r.getString(0), norm(Option(r.getString(1)).getOrElse(""))))
  }

  /** Deliberate divergence, pinned: the reference's golden for
    * `fake-html-cp1252.html` was produced by a charset_normalizer
    * MISDETECTION — the cp1252 source decoded as cp1250, so the golden reads
    * "trčs"/"nińo"/"ˇQué" where the document says "très"/"niño"/"¡Qué" (the
    * Euro signs survive because 0x80 maps identically). The engine's C1-gated
    * cp1252 fallback decodes the intended text; asserting the mojibake would
    * pin a bug, so this fixture asserts the CORRECT decode instead. */
  test("fake-html-cp1252.html decodes as cp1252, not the golden's cp1250 mojibake") {
    val ours = ourStream("fake-html-cp1252.html")
    val joined = ours.map(_._2).mkString(" ")
    assert(joined.contains("15,50 €"), "Euro sign lost")
    assert(joined.contains("très chaud"), "French e-grave lost")
    assert(joined.contains("niño"), "Spanish n-tilde lost")
    assert(joined.contains("¡Qué rico!"), "inverted exclamation lost")
  }

  /** The POS-model seam: the reference's narrative/title gates consult a
    * downloaded spacy model (verb presence, sentence segmentation) which is
    * unavailable offline; on non-English text its answers are effectively
    * arbitrary (the same UDHR fixture classifies 24 non-Latin paragraphs Title,
    * 1 NarrativeText, 2 UncategorizedText). The engine's deterministic
    * substitute may disagree WITHIN this triangle only; every other type and
    * every text byte must match. */
  private val PosSeamTriangle = Set("NarrativeText", "UncategorizedText", "Title")

  pairs.foreach { case (src, golden) =>
    test(s"$src partitions to the reference's own golden stream") {
      val ours = ourStream(src)
      val theirs = goldenStream(golden)
      assert(ours.length == theirs.length,
        s"element count ${ours.length} != ${theirs.length}")
      val hard = ours.zip(theirs).zipWithIndex.filter { case (((at, atx), (bt, btx)), _) =>
        atx != btx ||
          (at != bt && !(PosSeamTriangle(at) && PosSeamTriangle(bt)))
      }
      assert(hard.isEmpty, s"diverged beyond the POS seam, first: ${hard.take(3)}")
      // measured: 73/526 (14%) on the 526-language UDHR fixture — the en-model
      // verb tagger is a coin-flip on foreign tokens; cap guards regression
      val seamDisagreements =
        ours.zip(theirs).count { case ((at, _), (bt, _)) => at != bt }
      assert(seamDisagreements <= math.max(1, ours.length * 15 / 100),
        s"$seamDisagreements/${ours.length} POS-seam type disagreements exceeds 15%")
    }
  }

  /** The one remaining source-shipped golden beyond the partition pairs: the
    * reference's CHUNKED output of a real 2-page arXiv pdf
    * (`local-single-file-chunk-no-orig-elements/`) — fast-strategy pdf text
    * extraction composed with by-title chunking at the producing script's
    * exact options (src/local-single-file-chunk-no-orig-elements.sh:
    * max_characters=2000, multipage_sections off, orig elements off). Pins
    * the partition AND chunk layers against a published end-to-end artifact
    * in one breath. */
  test("multi-column-2p.pdf chunks to the reference's own chunked golden") {
    import graft.operators.{Chunker, ChunkingOptions}
    val dir = Files.createTempDirectory("golden-chunk-parity").toString
    Files.write(Paths.get(dir, "multi-column-2p.pdf"),
      Files.readAllBytes(Paths.get(ref + "example-docs/pdf/multi-column-2p.pdf")))
    val sp = spark
    import sp.implicits._
    val els = AutoSource.partitionFiles(spark, dir)
      .filter(F.col("element_type") =!= "PageBreak")
      .orderBy("seq")
      .select("element_type", "text", "seq", "page_number").collect().toSeq
      .map(r => graft.model.Element("", r.getString(0),
        Option(r.getString(1)).getOrElse(""), "doc", r.getLong(2),
        graft.model.ElementMetadata.empty.copy(
          page_number = if (r.isNullAt(3)) None else Some(r.getInt(3)))))
    val chunks = Chunker.chunkDoc("doc", els.iterator,
      ChunkingOptions(byTitle = true, includeOrigElements = false,
        maxCharacters = 2000, multipageSections = false)).toVector
    val theirs = goldenStream(
      "local-single-file-chunk-no-orig-elements/multi-column-2p.pdf.json")
    assert(chunks.length == theirs.length,
      s"chunk count ${chunks.length} != ${theirs.length}")
    // Chunk COUNT parity is exact (7 chunks at max_characters=2000 requires
    // a box-level element stream from the two-column layout — the line-level
    // stream chunked to 22). Text parity is held at the document level (the
    // cct-accuracy discipline): >= 0.95 edit-distance accuracy over the
    // concatenated chunk text. The known residuals are (a) the rotated arXiv
    // margin stamp: this reader extracts it READABLY in stream order
    // ("arXiv:2004.04906v3 …", last on the page) where pdfminer explodes it
    // into per-glyph vertical fragments placed first ("0 2 0 2 p e S…") —
    // a deliberate divergence, (b) TeX-font glyph slots without
    // ToUnicode (∗ † ‡ { } decode as their raw codes), and (c) pdfminer's
    // finer box splits inside a column (author/footnote boxes merge here),
    // which also shift a few chunk boundaries — hence document-level, not
    // per-chunk, text compare.
    assert(chunks.forall(_.`type` == "CompositeElement"))
    assert(theirs.forall(_._1 == "CompositeElement"))
    val acc = graft.operators.TextExtractionMetrics.calculateAccuracy(
      chunks.map(c => norm(c.text)).mkString(" "),
      theirs.map(_._2).mkString(" "))
    assert(acc >= 0.95, s"document-level cct accuracy $acc below 0.95")
  }
}
