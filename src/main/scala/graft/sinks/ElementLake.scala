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

  /**
   * Small-file compaction: every [[append]] (one per micro-batch of a
   * long-lived [[graft.streaming.StreamingOps.ingestToLake]] stream) lands a
   * new file set in each touched partition directory, so file counts grow
   * unbounded with stream lifetime — the classic lake small-file problem
   * (NameNode/listing pressure, per-file open cost dominating scans).
   *
   * Any `p_filetype=…` directory holding more than `maxFilesPerPartition`
   * parquet files is rewritten to `ceil(bytes / targetFileBytes)` files
   * (128 MB default — a healthy scan-task size), range-distributed AND
   * sorted by `(doc_id, seq)`, so the per-doc reading-order contract the
   * writer establishes survives compaction and doc ranges never straddle
   * more files than they must. The rewrite is per-partition read → temp dir
   * → two renames (old aside, new in place) → delete old; readers racing the
   * swap window see the old or the new file set, both complete (run it
   * between drains, as the capstone does — this is a parquet lake, not a
   * transaction log). A crash between the two renames leaves the live data
   * stranded as `.compact_old_<name>`; the next compact() call RESTORES it
   * before doing anything else, so no window loses a partition permanently.
   * Returns the rewritten partition directory names.
   */
  def compact(spark: SparkSession, path: String,
      maxFilesPerPartition: Int = 8,
      targetFileBytes: Long = 128L << 20): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Nil
    // crash recovery BEFORE anything else: a previous compact that died
    // between its two renames leaves the live partition stranded as
    // `.compact_old_<name>` (dotted — invisible to Spark reads). If the
    // partition dir is missing, the old file set is still the authoritative
    // one: restore it. If the partition exists, the old copy is a completed
    // swap's leftover: drop it. Incomplete `.compact_tmp_*` rewrites are
    // always garbage.
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".compact_old_"))
      .foreach { old =>
        val live = new org.apache.hadoop.fs.Path(root,
          old.getPath.getName.stripPrefix(".compact_old_"))
        if (!fs.exists(live)) require(fs.rename(old.getPath, live),
          s"compact: cannot restore stranded partition ${old.getPath}")
        else fs.delete(old.getPath, true)
      }
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".compact_tmp_"))
      .foreach(t => fs.delete(t.getPath, true))
    val partDirs = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$PartitionCol="))
    partDirs.flatMap { d =>
      val parts = fs.listStatus(d.getPath).toSeq
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      if (parts.size <= maxFilesPerPartition) None
      else {
        val bytes = parts.map(_.getLen).sum
        val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
        val name = d.getPath.getName
        val tmp = new org.apache.hadoop.fs.Path(root, s".compact_tmp_$name")
        val old = new org.apache.hadoop.fs.Path(root, s".compact_old_$name")
        spark.read.parquet(d.getPath.toString)
          .repartitionByRange(nFiles, col("doc_id"), col("seq"))
          .sortWithinPartitions("doc_id", "seq")
          .write.mode("overwrite").parquet(tmp.toString)
        require(fs.rename(d.getPath, old), s"compact: cannot move $name aside")
        require(fs.rename(tmp, d.getPath), s"compact: cannot land $name")
        fs.delete(old, true)
        Some(name)
      }
    }
  }
}
