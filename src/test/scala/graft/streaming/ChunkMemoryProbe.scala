package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.Element
import graft.operators.ChunkingOptions

/**
 * Memory proof for the streaming chunk fold (SURVEY §4.2: state is
 * O(window), never O(document)). Run in a SEPARATE JVM with a heap several
 * times SMALLER than the document: one ~200M-char single document arrives
 * as `Slices` micro-batches (file source, `maxFilesPerTrigger=1`), folds
 * through [[StreamingOps.chunkStream]], and chunk counts accumulate via
 * `foreachBatch` — nothing retains the text (a memory sink would, and a
 * MemoryStream retains every added batch on the driver, which is why the
 * probe stages parquet slices on disk instead). If the fold carried the
 * whole open document in its state, the heap could not hold it and the
 * probe would die with OOM; completion under the small heap IS the proof.
 * Driven by `ChunkMemoryProofSpec`; prints `CHUNKS=<n>` on success.
 */
object ChunkMemoryProbe {

  val Slices = 25
  val ElementsPerSlice = 40000L
  val CharsPerElement = 200
  // total text: 25 * 40k * 200 = 200M chars (~400 MB as JVM strings)

  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Path.of(args(0))
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("chunk-memory-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val streamDir = dir.resolve("slices")
    java.nio.file.Files.createDirectories(streamDir)
    val filler = "x" * (CharsPerElement - 20)
    val base = System.currentTimeMillis() - (Slices + 2) * 60000L
    (0 until Slices).foreach { s =>
      val from = s * ElementsPerSlice
      val rows = spark.range(from, from + ElementsPerSlice)
        .select(lit("doc-1").as("doc_id"), col("id").as("seq"),
          lit("NarrativeText").as("element_type"),
          concat(lit(filler), lpad(col("id").cast("string"), 20, "0")).as("text"))
      val slice =
        if (s == Slices - 1)
          rows.unionByName(Seq(("doc-1", Long.MaxValue,
            StreamingOps.EndOfDocument, ""))
            .toDF("doc_id", "seq", "element_type", "text"))
        else rows
      val tmp = dir.resolve(s"gen$s")
      slice.coalesce(1).write.parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).filter(p =>
        p.getFileName.toString.startsWith("part-") &&
          p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      val target = streamDir.resolve(f"slice$s%03d.parquet")
      java.nio.file.Files.move(part, target)
      target.toFile.setLastModified(base + s * 60000L)
      graft.FsUtil.deleteRecursively(tmp)
    }

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("seq",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("element_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val els = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
      .as[(String, Long, String, String)]
      .map { case (d, q, tpe, t) => Element("", tpe, t, d, q) }
    val chunks = new java.util.concurrent.atomic.AtomicLong(0)
    val q = StreamingOps.chunkStream(els,
      ChunkingOptions(maxCharacters = 500, includeOrigElements = false),
      useTimeout = false)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[Element], _: Long) =>
          chunks.addAndGet(batch.count()); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    if (!q.awaitTermination(300000L)) { q.stop(); sys.exit(3) }
    println(s"CHUNKS=${chunks.get()}")
    spark.stop()
  }
}
