package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column operators for a training-data pipeline (builder's brief):
 * image/audio/video payloads ride as opaque `binary` columns with typed metadata;
 * decode / feature-extract / resize / frame-sample run per-batch over partitions.
 *
 * The Spark-side plumbing is real — schemas, partition-preserving `mapPartitions`
 * batch shape, deterministic outputs; the codec kernels are STUBBED with
 * deterministic byte-level fakes (`???`-equivalents documented per function)
 * because no image/audio libraries ship in this container. Swapping in a real
 * decoder changes only the marked kernel, not the dataflow.
 *
 * Scale shape: all per-row/partition-local, no shuffle; payload columns should be
 * stored as separate parquet column chunks so metadata-only scans never read them.
 */
object MultimodalOps {

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("n_channels", IntegerType), StructField("format", StringType)))

  /**
   * Decode image metadata from payload bytes. KERNEL STUB: real impl parses the
   * codec headers (PNG IHDR / JPEG SOF); the fake derives deterministic pseudo
   * dimensions from the payload hash so downstream logic is exercisable.
   */
  def decodeImageMeta(df: DataFrame, payload: String = "payload"): DataFrame =
    df.withColumn("image_meta", struct(
      (pmod(xxhash64(col(payload)), lit(1920)) + 1).cast("int").as("width"),
      (pmod(xxhash64(col(payload), lit(1)), lit(1080)) + 1).cast("int").as("height"),
      lit(3).as("n_channels"),
      when(substring(col(payload), 1, 4) === lit(Array[Byte](0x89.toByte, 'P', 'N', 'G')), "png")
        .otherwise("unknown").as("format")))

  /**
   * Feature-extract: fixed-size float vector per payload. KERNEL STUB: real impl
   * runs a vision encoder batched per partition (`mapPartitions` so model init is
   * amortized per task, exactly where a real model call would sit).
   */
  def extractFeatures(df: DataFrame, payload: String = "payload", dim: Int = 8): DataFrame = {
    val sp = df.sparkSession
    val schema = df.schema.add("features", ArrayType(FloatType, containsNull = false))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition "model" init happens here in a real provider
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payload)
        val h = if (bytes == null) 0L else bytes.foldLeft(1469598103934665603L)(
          (acc, b) => (acc ^ b) * 1099511628211L)
        val v = Array.tabulate(dim)(i =>
          (((h * (2 * i + 1) + 7919L * i) % 1000003L).toFloat / 1000003f) * 2f - 1f)
        Row.fromSeq(r.toSeq :+ v.toSeq)
      }
    }(enc)
  }

  /** Resize marker: records target dims + recomputed meta (KERNEL STUB: real impl
    * transcodes pixels; the payload passes through unchanged here). */
  def resizeImages(df: DataFrame, width: Int, height: Int,
      payload: String = "payload"): DataFrame =
    df.withColumn("resized_to", struct(lit(width).as("width"), lit(height).as("height")))

  /**
   * Frame-sample a video payload: one row per sampled frame offset — the explode
   * shape a real decoder feeds. KERNEL STUB: frame payloads are deterministic
   * slices of the source bytes.
   */
  def sampleFrames(df: DataFrame, everyNSeconds: Int, durationCol: String,
      payload: String = "payload"): DataFrame =
    df.withColumn("frame_ts",
        explode(sequence(lit(0), greatest(col(durationCol).cast("int") - 1, lit(0)),
          lit(everyNSeconds))))
      .withColumn("frame_payload",
        col(payload).substr(col("frame_ts") * 16 + 1, lit(16)))

  /**
   * `partition_audio` — `/root/reference/unstructured/partition/audio.py:26`:
   * speech-to-text segments become elements carrying `segment_start_seconds` /
   * `segment_end_seconds`. KERNEL STUB: no STT model ships here, so segments are
   * deterministic functions of the payload hash (count 1-3, 5 s apiece, text
   * tagged with the segment ordinal); the element/explode shape, timing columns,
   * and per-partition batching slot are the real plumbing a provider drops into.
   */
  def transcribeAudio(df: DataFrame, payload: String = "payload"): DataFrame = {
    val nSegs = (pmod(xxhash64(col(payload)), lit(3)) + 1).cast("int")
    df.withColumn("segment_idx", explode(sequence(lit(0), nSegs - 1)))
      .withColumn("segment_start_seconds", (col("segment_idx") * 5).cast("double"))
      .withColumn("segment_end_seconds", (col("segment_idx") * 5 + 5).cast("double"))
      .withColumn("element_type", lit("NarrativeText"))
      .withColumn("text",
        concat(lit("[stt-stub segment "), col("segment_idx").cast("string"),
          lit(" of "), abs(xxhash64(col(payload))).cast("string"), lit("]")))
  }
}
