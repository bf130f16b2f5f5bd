package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Test-table reader. The driver's `events.ts` column has shipped in two physical
 * shapes across rounds: parquet TIMESTAMP(NANOS) — which Spark does not decode
 * natively ([PARQUET_TYPE_ILLEGAL]), so it's read as a raw nanosecond long
 * (`spark.sql.legacy.parquet.nanosAsLong`) and truncated to microseconds with
 * integer arithmetic — and plain TIMESTAMP(MICROS) without UTC adjustment, which
 * Spark reads as TIMESTAMP_NTZ. [[read]] normalizes both to a session-TZ
 * TIMESTAMP (sessions run UTC), so downstream queries and the DuckDB oracle see
 * identical wall-clock values either way.
 */
object Tables {

  /**
   * Idempotent, once-per-session conf setup (sessions are keyed by identity so
   * concurrent queries never race a mid-session conf flip — cf. round-1 advice).
   * Entry-point mains ([[Verify]], [[Bench]]) also set this at session build.
   */
  private val configured =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  def configure(spark: SparkSession): Unit =
    if (configured.add(spark)) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }

  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize `ts` to TIMESTAMP regardless of the parquet physical type. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(org.apache.spark.sql.types.TimestampType) => df
      case Some(_) => df.withColumn("ts", col("ts").cast("timestamp"))
      case None => df
    }

  /**
   * Opt-in small-scan fan-out for CPU-heavy consumers: a parquet scan yields at
   * most one task per split, so a small table (one file, one row group) funnels
   * every downstream per-row-expensive operator — document parsers, edit-distance
   * DP, hash folds — through a single core. Callers whose per-row work dwarfs the
   * shuffle cost read through this; plain columnar scans use [[read]] and keep the
   * shuffle-free plan (round 6 measured the unconditional variant costing +6-17 s
   * on scan-bound queries while saving 5-10 s on parse-bound ones — hence opt-in).
   *
   * The split estimate uses the file listing plus byte sizes (no `df.rdd`, which
   * would force full physical planning eagerly): Spark slices each file at
   * `spark.sql.files.maxPartitionBytes`, so estimated splits =
   * max(file count, ceil(total bytes / maxPartitionBytes)) — a few large files
   * on a real cluster already yield >= parallelism splits and the fan-out is a
   * no-op (a file-count-only estimate would wrongly shuffle the whole table
   * there). `repartition(n)` with an explicit count is not coalesced by AQE, so
   * the fan-out survives to execution.
   */
  def readFanout(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = read(spark, dir, name)
    val p = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.length >= p) df
    else {
      val hconf = spark.sparkContext.hadoopConfiguration
      val totalBytes = files.map { f =>
        val path = new org.apache.hadoop.fs.Path(f)
        try path.getFileSystem(hconf).getFileStatus(path).getLen
        catch { case _: java.io.IOException => 0L }
      }.sum
      val maxSplit = math.max(1L,
        org.apache.spark.sql.internal.SQLConf.get.filesMaxPartitionBytes)
      val estSplits = math.max(files.length.toLong,
        (totalBytes + maxSplit - 1) / maxSplit)
      if (estSplits < p) df.repartition(p) else df
    }
  }
}
