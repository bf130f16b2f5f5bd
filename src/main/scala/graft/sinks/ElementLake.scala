package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Element

/**
 * The element-lake layout (SURVEY §4.2 "partition pruning" row): persisted
 * element streams are written hive-partitioned by detected filetype so that
 * downstream scans over a 100 TB lake prune whole directories before reading
 * a byte — `partition by filetype` is the reference pipeline's most common
 * WHERE clause (every per-format metric/eval pass starts there).
 *
 * Layout choices, and why:
 *  - partition column `p_filetype` is a COPY of `metadata.filetype` (null →
 *    "unknown"): the sparse metadata struct stays intact in the data files,
 *    so reads need no reconstruction and the schema equals the wire schema;
 *  - file-level distribution is `repartition(p_filetype, doc_id)` — one
 *    filetype maps to MANY tasks (no single-writer bottleneck per format,
 *    no small-file explosion from per-doc writers);
 *  - rows sort by `(p_filetype, doc_id, seq)` within each task — leading
 *    with the partition column satisfies FileFormatWriter's required
 *    ordering EXPLICITLY (it would otherwise insert its own sort by
 *    p_filetype alone, and the per-file (doc_id, seq) order would rest on
 *    that sort's stability, which is not a contract), so a per-doc reader
 *    streams elements in reading order without a shuffle.
 */
object ElementLake {

  val PartitionCol = "p_filetype"
  val UnknownFiletype = "unknown"

  def write(ds: Dataset[Element], path: String): Unit =
    writeMode(ds, path, "overwrite")

  /** Append a new slice (a micro-batch, an incremental ingest) into the same
    * layout — the partition directories accumulate files. */
  def append(ds: Dataset[Element], path: String): Unit =
    writeMode(ds, path, "append")

  private def writeMode(ds: Dataset[Element], path: String, mode: String): Unit =
    ds.toDF()
      .withColumn(PartitionCol,
        coalesce(col("metadata.filetype"), lit(UnknownFiletype)))
      .repartition(col(PartitionCol), col("doc_id"))
      .sortWithinPartitions(PartitionCol, "doc_id", "seq")
      .write.mode(mode).partitionBy(PartitionCol).parquet(path)

  /** Full-lake read; `p_filetype` is dropped (the data files carry the real
    * `metadata.filetype`, nulls included). */
  def read(spark: SparkSession, path: String): Dataset[Element] =
    scanDf(spark, path, Nil).drop(PartitionCol).as(Encoders.product[Element])

  /** Pruned read: only the named filetypes' directories are listed and
    * scanned — the filter lands in `PartitionFilters`, not post-scan. */
  def scan(spark: SparkSession, path: String, filetypes: Seq[String]): Dataset[Element] =
    scanDf(spark, path, filetypes).drop(PartitionCol).as(Encoders.product[Element])

  private def scanDf(spark: SparkSession, path: String,
      filetypes: Seq[String]): DataFrame = {
    val df = spark.read.parquet(path)
    if (filetypes.isEmpty) df
    else df.filter(col(PartitionCol).isin(filetypes: _*))
  }
}
