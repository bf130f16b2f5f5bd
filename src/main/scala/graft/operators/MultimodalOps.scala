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
   * Decode image metadata from payload bytes. PNG (IHDR) and GIF (logical screen
   * descriptor) headers are parsed FOR REAL — pure byte decoding through
   * codegen'd built-ins (`substring` on binary + `hex`/`conv`), no image library
   * and no UDF, so the scan stays in whole-stage codegen. Formats without a
   * fixed-offset header (JPEG needs a marker walk) fall back to the documented
   * deterministic pseudo-dims stub.
   *
   * PNG layout (public spec): 8-byte signature, 4-byte IHDR length, "IHDR",
   * width/height as 4-byte big-endian at offsets 16/20 (0-based), bit depth at
   * 24, color type at 25 (0 grey=1ch, 2 rgb=3, 3 palette=1, 4 grey+a=2, 6
   * rgba=4). GIF: "GIF87a"/"GIF89a", then width/height as 2-byte little-endian.
   */
  def decodeImageMeta(df: DataFrame, payload: String = "payload"): DataFrame = {
    val p = col(payload)
    // 1-based substring offsets; conv(hex(bytes)) decodes big-endian
    def be32(off: Int) = conv(hex(substring(p, off, 4)), 16, 10).cast("int")
    def u8(off: Int) = conv(hex(substring(p, off, 1)), 16, 10).cast("int")
    def le16(off: Int) = (u8(off) + u8(off + 1) * 256).cast("int")
    val pngSig = lit(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    val isPng = substring(p, 1, 8) === pngSig
    val isGif = substring(p, 1, 6).cast("string").isin("GIF87a", "GIF89a")
    val pngChannels = when(u8(26) === 2, 3).when(u8(26) === 4, 2)
      .when(u8(26) === 6, 4).otherwise(1)
    df.withColumn("image_meta", struct(
      when(isPng, be32(17)).when(isGif, le16(7))
        .otherwise((pmod(xxhash64(p), lit(1920)) + 1).cast("int")).as("width"),
      when(isPng, be32(21)).when(isGif, le16(9))
        .otherwise((pmod(xxhash64(p, lit(1)), lit(1080)) + 1).cast("int")).as("height"),
      when(isPng, pngChannels).when(isGif, lit(3)).otherwise(lit(3)).as("n_channels"),
      when(isPng, lit("png")).when(isGif, lit("gif"))
        .otherwise(lit("unknown")).as("format")))
  }

  /**
   * JPEG dimensions via the real marker walk (public JFIF/EXIF structure): skip
   * 0xFF-prefixed segments by their big-endian lengths until a start-of-frame
   * marker (SOF0-SOF15 except DHT/JPG/DAC), whose payload holds height then
   * width as big-endian u16 at offsets 3/5. Pure bytes, no library — a loop, so
   * it lives JVM-side for `mapPartitions` image pipelines rather than in the
   * column path (which handles the fixed-offset PNG/GIF headers).
   */
  def jpegDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null || bytes.length < 4 ||
      (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    def u8(i: Int) = bytes(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    var i = 2
    while (i + 3 < bytes.length) {
      if (u8(i) != 0xff) return None
      // B.1.1.2: any number of 0xFF fill bytes may precede a marker
      while (i + 3 < bytes.length && u8(i + 1) == 0xff) i += 1
      // the fill-byte skip can stop at the buffer edge (e.g. FF D8 FF FF FF FF):
      // every branch below reads at least bytes(i+3), so a truncated payload must
      // return None here rather than over-read
      if (i + 3 >= bytes.length) return None
      val marker = u8(i + 1)
      if (marker == 0xd8 || marker == 0x01 ||
        (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone: SOI, TEM, RSTn
      else if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS: no SOF seen
      else if (marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        // SOFn: len(2) precision(1) height(2) width(2)
        if (i + 8 >= bytes.length) return None
        return Some((u16(i + 7), u16(i + 5))) // (width, height)
      } else {
        val len = u16(i + 2)
        if (len < 2) return None
        i += 2 + len
      }
    }
    None
  }

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
   * `segment_end_seconds`. Segmentation is REAL: one 5 s window per slice of the
   * clip's duration (the shape a streaming STT provider emits), with the last
   * window clamped to the clip end. Only the transcript text is a KERNEL STUB
   * (no STT model ships here) — a provider replaces the `text` expression with a
   * batched model call in `mapPartitions`; the explode shape, timing columns and
   * element typing are the production plumbing.
   */
  /** RIFF/WAVE header walk → clip duration in seconds (data-chunk bytes /
    * fmt byte-rate). Model-free: gives [[transcribeAudio]] a REAL duration
    * for `.wav` payloads instead of a metadata-supplied one. Returns None
    * for non-WAV bytes or a malformed chunk list. */
  def wavDuration(bytes: Array[Byte]): Option[Double] = {
    if (bytes.length < 44 ||
      new String(bytes, 0, 4, "US-ASCII") != "RIFF" ||
      new String(bytes, 8, 4, "US-ASCII") != "WAVE") return None
    def u32(p: Int): Long =
      (bytes(p) & 0xFFL) | ((bytes(p + 1) & 0xFFL) << 8) |
        ((bytes(p + 2) & 0xFFL) << 16) | ((bytes(p + 3) & 0xFFL) << 24)
    var i = 12
    var byteRate = 0L
    var dataLen = -1L
    while (i + 8 <= bytes.length && (byteRate == 0 || dataLen < 0)) {
      val cid = new String(bytes, i, 4, "US-ASCII")
      val sz = u32(i + 4)
      if (cid == "fmt " && i + 16 + 4 <= bytes.length) byteRate = u32(i + 16)
      else if (cid == "data") dataLen = math.min(sz, (bytes.length - i - 8).toLong)
      i += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (byteRate > 0 && dataLen >= 0) Some(dataLen.toDouble / byteRate) else None
  }

  def transcribeAudio(df: DataFrame, durationCol: String,
      payload: String = "payload"): DataFrame = {
    // NULL duration (missing metadata) must not silently drop the clip: a NULL
    // would make sequence() NULL and explode() eliminate the row. Coalesce to 0
    // so the clip still yields one clamped [0, 0] segment.
    val dur = coalesce(col(durationCol).cast("double"), lit(0.0))
    val nSegs = greatest(ceil(dur / 5.0).cast("int"), lit(1))
    df.withColumn("segment_idx", explode(sequence(lit(0), nSegs - 1)))
      .withColumn("segment_start_seconds", (col("segment_idx") * 5).cast("double"))
      .withColumn("segment_end_seconds",
        least((col("segment_idx") * 5 + 5).cast("double"), greatest(dur, lit(0.0))))
      .withColumn("element_type", lit("NarrativeText"))
      .withColumn("text",
        concat(lit("[stt-stub segment "), col("segment_idx").cast("string"),
          lit(" @"), (col("segment_idx") * 5).cast("string"), lit("s]")))
  }
}
