package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, Dataset}

import graft.model.Element

/**
 * Extension-surface registries (SURVEY §2.13) — the reference's pluggable points
 * re-expressed for Spark:
 *
 *  - custom cleaners (`Text.apply`, `documents/elements.py:903-916`) → named
 *    `Column => Column` functions composable over the `text` column;
 *  - custom chunkers (`register_chunking_strategy`, `chunking/dispatch.py:118-143`)
 *    → named strategies over the flatMapGroups kernel;
 *  - custom partitioners (FileType → parser, `auto.py:340-390`) → per-type parser
 *    functions consulted by the auto router.
 *
 * Registries are process-wide (executor-side registration happens in the same JVM
 * classloader on local mode; on a cluster, register from a library initializer).
 */
object Registries {

  // ------------------------------------------------------------------- cleaners

  private val cleaners = TrieMap[String, Column => Column](
    "clean_extra_whitespace" -> (c => graft.functions.Cleaners.cleanExtraWhitespace(c)),
    "clean_bullets" -> (c => graft.functions.Cleaners.cleanBullets(c)),
    "clean_dashes" -> (c => graft.functions.Cleaners.cleanDashes(c)),
    "clean_trailing_punctuation" -> (c => graft.functions.Cleaners.cleanTrailingPunctuation(c)),
    "clean_non_ascii_chars" -> (c => graft.functions.Cleaners.cleanNonAsciiChars(c)),
    "replace_unicode_quotes" -> (c => graft.functions.Cleaners.replaceUnicodeQuotes(c)),
    "remove_punctuation" -> (c => graft.functions.Cleaners.removePunctuation(c)))

  def registerCleaner(name: String, fn: Column => Column): Unit = cleaners(name) = fn
  def cleaner(name: String): Option[Column => Column] = cleaners.get(name)

  // ------------------------------------------------- picture partitioner (DOCX)

  /** `register_picture_partitioner` — `partition/docx.py:97-99`: module-lifetime
    * pluggable sub-partitioner for DOCX pictures; default extracts nothing. */
  @volatile private var picturePartitioner: graft.sources.OoxmlPartitioner.DocxPicturePartitioner =
    graft.sources.OoxmlPartitioner.NullPicturePartitioner

  def registerPicturePartitioner(
      p: graft.sources.OoxmlPartitioner.DocxPicturePartitioner): Unit =
    picturePartitioner = p

  def docxPicturePartitioner: graft.sources.OoxmlPartitioner.DocxPicturePartitioner =
    picturePartitioner

  /** `Text.apply(*cleaners)` — fold named cleaners over the text column. */
  def applyCleaners(ds: Dataset[Element], names: Seq[String]): Dataset[Element] = {
    val sp = ds.sparkSession
    import sp.implicits._
    val fns = names.map(n => cleaners.getOrElse(n,
      throw new IllegalArgumentException(s"unknown cleaner: $n")))
    val cleaned = fns.foldLeft(org.apache.spark.sql.functions.col("text"))((c, f) => f(c))
    ds.withColumn("text", cleaned).as[Element]
  }

  // ------------------------------------------------------------------- chunkers

  private val chunkers = TrieMap[String, (Dataset[Element], ChunkingOptions) => Dataset[Element]](
    "basic" -> ((ds, o) => Chunker.chunkElements(ds, o)),
    "by_title" -> ((ds, o) => Chunker.chunkByTitle(ds, o)))

  def registerChunkingStrategy(name: String,
      fn: (Dataset[Element], ChunkingOptions) => Dataset[Element]): Unit =
    chunkers(name) = fn

  /** `chunk(elements, strategy, opts)` dispatch — `chunking/dispatch.py:84-115`. */
  def chunk(ds: Dataset[Element], strategy: String,
      opts: ChunkingOptions = ChunkingOptions()): Dataset[Element] =
    chunkers.getOrElse(strategy,
      throw new IllegalArgumentException(
        s"unrecognized chunking strategy '$strategy'"))(ds, opts) // dispatch.py:108-111

  // -------------------------------------------------------------- layout detector

  /** The hi_res OD-model seam (`process_file_with_model`,
    * `unstructured_inference.inference.layout`): when a detector is
    * registered, [[graft.sources.PdfHiRes.partitionHiRes]] callers can resolve
    * it here; None = the model-bound default (hi_res unavailable, strategy
    * router falls back — `strategies.py:75-86`). */
  @volatile private var detector: Option[graft.sources.PdfHiRes.Detector] = None

  def registerLayoutDetector(d: graft.sources.PdfHiRes.Detector): Unit =
    detector = Some(d)

  def clearLayoutDetector(): Unit = detector = None

  def layoutDetector: Option[graft.sources.PdfHiRes.Detector] = detector

  /** The OCR-engine seam (`OCRAgent.get_agent`, `utils/ocr_models`): page
    * in, line-level OCR regions out. None = no OCR engine installed (the
    * strategy router falls back, `strategies.py:75-86`). */
  @volatile private var ocr: Option[graft.sources.PdfHiRes.OcrSource] = None

  def registerOcrAgent(a: graft.sources.PdfHiRes.OcrSource): Unit = ocr = Some(a)

  def clearOcrAgent(): Unit = ocr = None

  def ocrAgent: Option[graft.sources.PdfHiRes.OcrSource] = ocr

  // ------------------------------------------------------------------- partitioners

  import graft.sources.{FileType, HtmlPartitioner}

  private val partitioners =
    TrieMap[FileType, Array[Byte] => Seq[HtmlPartitioner.RawPara]]()

  def registerPartitioner(ft: FileType,
      fn: Array[Byte] => Seq[HtmlPartitioner.RawPara]): Unit = partitioners(ft) = fn

  /** Custom partitioner for `ft`, if one was registered (consulted before the
    * built-in router dispatch). */
  def partitioner(ft: FileType): Option[Array[Byte] => Seq[HtmlPartitioner.RawPara]] =
    partitioners.get(ft)
}
