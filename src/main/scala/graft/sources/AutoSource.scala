package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Cleaners

/**
 * The `partition()` auto-router as a Spark source
 * (`/root/reference/unstructured/partition/auto.py:30-300`): `binaryFile` scan →
 * per-file type detection → per-format parser → element rows.
 *
 * Scale shape: detection + parsing run inside one `flatMap` over the file scan
 * (embarrassingly parallel per file, no shuffle); the elements then flow into the
 * shared classifier column and, downstream, the `apply_metadata` chain and chunker
 * (one shuffle on doc_id). For a 100 TB lake the output is written partitioned by
 * `filetype` so later scans prune by format.
 */
object AutoSource {

  /** One raw parse row, pre-classifier-cascade — the output contract of the
    * per-file parse and of the plan-visible `GraftPartitionDocs` node. */
  final case class RawPartitionRow(
      doc_id: String, filetype: String, seq: Long, raw_type: Option[String],
      category_depth: Option[Int], raw_text: String, text_as_html: Option[String],
      page_number: Option[Int], page_name: Option[String],
      attached_to_filename: Option[String], classifier: String)

  /** Detect + route one document's bytes; optionally recurse into email
    * attachments (bounded depth 1, `partition/email.py:372-441`). */
  def parseDoc(path: String, content: Array[Byte],
      processAttachments: Boolean): Seq[RawPartitionRow] = {
    val (ft, paras) = Partitioners.partitionAuto(path, content)
    val main = paras.zipWithIndex.map { case (p, i) =>
      RawPartitionRow(path, ft.mimeType, i + 1L, p.elementType, p.categoryDepth,
        p.text, p.textAsHtml, p.pageNumber, p.pageName, None, p.classifier)
    }
    val attached =
      if (processAttachments && (ft == FileType.Eml || ft == FileType.Msg)) {
        val items: Seq[(String, Array[Byte])] =
          if (ft == FileType.Msg) MsgPartitioner.msgAttachments(content)
          else {
            val text = new String(content, java.nio.charset.StandardCharsets.UTF_8)
            Partitioners.emailAttachments(text).map { case (fn, body) =>
              (fn, body.getBytes("UTF-8"))
            }
          }
        items.flatMap { case (fn, body) =>
          // an attachment that cannot be partitioned (unsupported format, a
          // parser crash on corrupt bytes) is SILENTLY skipped — the host
          // message's own elements must never be lost to a poisoned
          // attachment (`test_msg.py:163-181`, `email.py:418-427`)
          scala.util.Try(Partitioners.partitionAuto(fn, body)).toOption.toSeq
            .flatMap { case (aft, aps) =>
              aps.zipWithIndex.map { case (p, i) =>
                RawPartitionRow(path + "!" + fn, aft.mimeType, i + 1L, p.elementType,
                  p.categoryDepth, p.text, p.textAsHtml, p.pageNumber, p.pageName,
                  Some(path), p.classifier)
              }
            }
        }
      } else Nil
    main ++ attached
  }

  /**
   * Partition a directory of files of any supported type. Returns element rows:
   * `doc_id` (file path), `filetype` (MIME), `seq`, `element_type`,
   * `category_depth`, `text`, `text_as_html`, `page_number`, `page_name`,
   * `attached_to_filename`.
   *
   * With `processAttachments=true`, email attachments are recursively partitioned
   * (bounded depth 1, like the reference) and unioned into the stream with the
   * `attached_to_filename` marker (`partition/email.py:372-441`).
   */
  /**
   * Fan a binary file scan out to the cluster when Spark's byte-based split
   * packing would under-parallelize the PARSE. `binaryFile` rows are not
   * splittable, and split planning packs files by size + open-cost — 32
   * multi-MB books fit one 128 MB split, serializing a parse that is pure
   * CPU per file. When the packed-split estimate is below the core count,
   * redistribute round-robin (shuffle cost = the file bytes themselves,
   * negligible against parse cost at that corpus size); a real lake with
   * >= parallelism splits passes through untouched.
   */
  def fanoutFiles(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.isEmpty) df
    else {
      val hconf = spark.sparkContext.hadoopConfiguration
      val totalBytes = files.map { f =>
        val path = new org.apache.hadoop.fs.Path(f)
        try path.getFileSystem(hconf).getFileStatus(path).getLen
        catch { case _: java.io.IOException => 0L }
      }.sum
      val conf = org.apache.spark.sql.internal.SQLConf.get
      val maxSplit = math.max(1L, conf.filesMaxPartitionBytes)
      val packed = (totalBytes + conf.filesOpenCostInBytes * files.length +
        maxSplit - 1) / maxSplit
      if (packed < p) df.repartition(math.min(p.toLong, files.length.toLong).toInt)
      else df
    }
  }

  def partitionFiles(spark: SparkSession, pathGlob: String,
      processAttachments: Boolean = false): DataFrame = {
    import spark.implicits._
    val files = fanoutFiles(
      spark.read.format("binaryFile").load(pathGlob)
        .select(col("path"), col("content")))
      .as[(String, Array[Byte])]
    val raw = files.flatMap { case (path, content) =>
      parseDoc(path, content, processAttachments)
    }.toDF()
    typedFromRaw(raw)
  }

  /** The declarative half of the auto-router: classifier cascade + empty-drop +
    * resequence over the raw parse rows. Shared by the typed `flatMap` above and
    * the plan-visible `GraftPartitionDocs` node
    * (`org.apache.spark.sql.graft.PartitionPlan`). */
  def typedFromRaw(raw: DataFrame): DataFrame = {
    // untyped paragraphs derive per their source's cascade: the text partitioner's
    // first-match classifier (has Title), the DOCX/PPTX variants, or the HTML
    // parser's derive rules
    val derived = HtmlSource.classifierCascade(col("classifier"), col("raw_text"))
    val typed = raw.select(
      col("doc_id"), col("filetype"), col("seq"),
      coalesce(col("raw_type"), derived).as("element_type"),
      HtmlSource.adjustedDepth(col("classifier"), col("raw_type"), derived,
        col("category_depth")).as("category_depth"),
      when(col("raw_type").isNull && derived === "ListItem",
        Cleaners.cleanBullets(col("raw_text")))
        .otherwise(col("raw_text")).as("text"),
      col("text_as_html"), col("page_number"), col("page_name"),
      col("attached_to_filename"))
      // untyped empties drop; explicitly-typed empty elements (PageBreak, Image)
      // survive like the reference stream
      .filter(col("element_type").isNotNull &&
        (col("raw_type").isNotNull || col("text") =!= ""))
    TextSource.resequence(typed, "filetype")
  }
}
