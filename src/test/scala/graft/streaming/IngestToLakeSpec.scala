package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import graft.SparkSuiteBase
import graft.sinks.ElementLake

/** Streaming file-arrival ingestion into the filetype-partitioned element
  * lake: micro-batches run the SAME plan-visible batch pipeline, appends
  * accumulate, and a restart resumes from the checkpoint without re-reading
  * processed files. */
class IngestToLakeSpec extends SparkSuiteBase {

  private def tmp(prefix: String): Path = Files.createTempDirectory(prefix)

  private def rmTree(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  test("arriving files land in the lake as the batch pipeline would emit them") {
    val watch = tmp("ingest-watch"); val lake = tmp("ingest-lake")
    val ckpt = tmp("ingest-ckpt")
    try {
      Files.write(watch.resolve("a.txt"),
        "first paragraph here.\n\nsecond paragraph here.".getBytes(UTF_8))
      Files.write(watch.resolve("b.html"),
        "<html><body><h1>Title B</h1><p>body b</p></body></html>".getBytes(UTF_8))
      val q = StreamingOps.ingestToLake(spark, watch.toString, lake.toString,
        ckpt.toString)
      q.awaitTermination(60000)

      val got = ElementLake.read(spark, lake.toString).collect()
        .sortBy(e => (e.doc_id, e.seq)).toSeq
      val expected = org.apache.spark.sql.graft.PartitionPlan.toElements(
        org.apache.spark.sql.graft.PartitionPlan.partitionFiles(
          spark, watch.toString)).collect().sortBy(e => (e.doc_id, e.seq)).toSeq
      assert(got == expected)
      assert(got.nonEmpty)
      // the lake keeps its filetype layout
      assert(ElementLake.scan(spark, lake.toString, Seq("text/html"))
        .collect().forall(_.metadata.filetype.contains("text/html")))
    } finally { rmTree(watch); rmTree(lake); rmTree(ckpt) }
  }

  test("a second run ingests only newly-arrived files and appends") {
    val watch = tmp("ingest2-watch"); val lake = tmp("ingest2-lake")
    val ckpt = tmp("ingest2-ckpt")
    try {
      Files.write(watch.resolve("one.txt"), "only paragraph one.".getBytes(UTF_8))
      StreamingOps.ingestToLake(spark, watch.toString, lake.toString,
        ckpt.toString).awaitTermination(60000)
      val afterFirst = ElementLake.read(spark, lake.toString).count()
      assert(afterFirst > 0)

      Files.write(watch.resolve("two.txt"), "only paragraph two.".getBytes(UTF_8))
      StreamingOps.ingestToLake(spark, watch.toString, lake.toString,
        ckpt.toString).awaitTermination(60000)
      val rows = ElementLake.read(spark, lake.toString).collect()
      // doc one was NOT re-ingested (checkpointed file log), doc two arrived
      assert(rows.count(_.doc_id.endsWith("one.txt")) == afterFirst)
      assert(rows.exists(_.doc_id.endsWith("two.txt")))
    } finally { rmTree(watch); rmTree(lake); rmTree(ckpt) }
  }
}
