package graft.plans

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import org.apache.spark.sql.graft.{PartitionDocsNode, PartitionPlan}

import graft.SparkSuiteBase
import graft.sources.AutoSource

/** The plan-visible auto-router (SURVEY §4.2): same results as the typed
  * `flatMap` source, a named node in explain output, no introduced shuffle,
  * and the doc-level filename/filetype pushdown rule that skips parsing
  * filtered-out documents. */
class PartitionPlanSpec extends SparkSuiteBase {

  private def writeCorpus(dir: Path): Unit = {
    Files.write(dir.resolve("a.txt"),
      "alpha paragraph one.\n\nalpha paragraph two.".getBytes(UTF_8))
    Files.write(dir.resolve("b.html"),
      "<html><body><h1>Beta</h1><p>body text</p></body></html>".getBytes(UTF_8))
    Files.write(dir.resolve("c.csv"), "x,y\n1,2\n3,4".getBytes(UTF_8))
    Files.write(dir.resolve("d.eml"),
      ("From: a@b.c\nTo: d@e.f\nSubject: greetings\n" +
        "Content-Type: multipart/mixed; boundary=\"XX\"\n\n" +
        "--XX\nContent-Type: text/plain\n\nhello body\n" +
        "--XX\nContent-Type: text/plain; name=\"note.txt\"\n" +
        "Content-Disposition: attachment; filename=\"note.txt\"\n\n" +
        "attached note text\n--XX--\n").getBytes(UTF_8))
  }

  private def withCorpus[A](f: String => A): A = {
    val dir = Files.createTempDirectory("partplan")
    try { writeCorpus(dir); f(dir.toString) }
    finally {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }

  test("plan-node partition matches the typed flatMap source exactly") {
    withCorpus { dir =>
      val key = Seq("doc_id", "seq")
      val viaPlan = PartitionPlan.partitionFiles(spark, dir)
        .orderBy(key.head, key.tail: _*).collect().toSeq
      val viaFlatMap = AutoSource.partitionFiles(spark, dir)
        .orderBy(key.head, key.tail: _*).collect().toSeq
      assert(viaPlan == viaFlatMap)
      assert(viaPlan.nonEmpty)
      // all four docs made it through the router
      assert(viaPlan.map(_.getString(0)).distinct.size == 4)
    }
  }

  test("attachments mode matches too, and fans out attachment doc_ids") {
    withCorpus { dir =>
      val key = Seq("doc_id", "seq")
      val viaPlan = PartitionPlan.partitionFiles(spark, dir, processAttachments = true)
        .orderBy(key.head, key.tail: _*).collect().toSeq
      val viaFlatMap = AutoSource.partitionFiles(spark, dir, processAttachments = true)
        .orderBy(key.head, key.tail: _*).collect().toSeq
      assert(viaPlan == viaFlatMap)
      assert(viaPlan.exists(_.getString(0).contains("!note.txt")))
    }
  }

  test("the parse appears as a named node; resequence + small-corpus fanout shuffle") {
    withCorpus { dir =>
      val plan = PartitionPlan.partitionFiles(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("GraftPartitionDocs"), plan)
      // the parse itself is shuffle-free: one Exchange is the shared per-doc
      // resequence window; the other is the deliberate fanoutFiles round-robin
      // (this 4-file corpus packs into one split, which would serialize the
      // parse) — a corpus with >= parallelism splits skips it
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges == 2, s"expected fanout + resequence exchanges:\n$plan")
      assert(plan.contains("RoundRobinPartitioning") ||
        plan.contains("Repartition"), plan)
    }
  }

  test("filetype and doc_id filters push below the parse; text filters stay above") {
    withCorpus { dir =>
      val sp = spark
      import sp.implicits._
      val parsed = PartitionPlan.partitionFiles(spark, dir)
      val filtered = parsed.filter(
        $"filetype" === "text/html" && $"doc_id".endsWith(".html") &&
          $"text".contains("body"))
      val optimized = filtered.queryExecution.optimizedPlan
      val nodes = optimized.collect { case n: PartitionDocsNode => n }
      assert(nodes.length == 1, optimized.toString)
      val below = nodes.head.child.toString
      // the filetype predicate is rewritten onto a detect_mime head sniff
      assert(below.contains("detect_mime"), s"filetype not pushed:\n$optimized")
      // the doc_id predicate lands on the scan's path column
      assert(below.toLowerCase.contains("path"), s"doc_id not pushed:\n$optimized")
      // the content predicate must NOT move below the parse
      assert(!below.contains("body"), s"text filter wrongly pushed:\n$optimized")
      val rows = filtered.collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.getAs[String]("filetype") == "text/html"))
    }
  }

  test("pushdown is exact: filtered results equal filter-above results") {
    withCorpus { dir =>
      val sp = spark
      import sp.implicits._
      val key = Seq("doc_id", "seq")
      // plan side: rule pushes the predicate below the parse
      val pushed = PartitionPlan.partitionFiles(spark, dir)
        .filter($"filetype" === "text/plain")
        .orderBy(key.head, key.tail: _*).collect().toSeq
      // oracle side: parse everything, then filter
      val above = AutoSource.partitionFiles(spark, dir)
        .filter($"filetype" === "text/plain")
        .orderBy(key.head, key.tail: _*).collect().toSeq
      assert(pushed == above)
      assert(pushed.nonEmpty)
    }
  }

  test("partitionAndChunk composes both named nodes in one plan") {
    withCorpus { dir =>
      val sp = spark
      import sp.implicits._
      val docs = sp.read.format("binaryFile").load(dir).selectExpr("path", "content")
      val chunked = PartitionPlan.partitionAndChunk(docs,
        chunkingStrategy = "by_title",
        chunkOpts = graft.operators.ChunkingOptions(maxCharacters = 120,
          includeOrigElements = false))
      val plan = chunked.queryExecution.executedPlan.toString
      assert(plan.contains("GraftChunkElements"), plan)
      assert(plan.contains("GraftPartitionDocs"), plan)
      // equivalent to the separately-composed typed pipeline
      val els = PartitionPlan.toElements(AutoSource.partitionFiles(sp, dir))
      val expected = graft.operators.Chunker.chunkByTitle(els,
        graft.operators.ChunkingOptions(maxCharacters = 120,
          includeOrigElements = false, byTitle = true))
        .collect().sortBy(e => (e.doc_id, e.seq)).toSeq
      val got = chunked.collect().sortBy(e => (e.doc_id, e.seq)).toSeq
      assert(got == expected)
      assert(got.nonEmpty)
    }
  }

  test("a doc_id filter above the composed pipeline reaches the file scan") {
    withCorpus { dir =>
      val sp = spark
      import sp.implicits._
      val docs = sp.read.format("binaryFile").load(dir).selectExpr("path", "content")
      val chunked = PartitionPlan.partitionAndChunk(docs,
        chunkOpts = graft.operators.ChunkingOptions(maxCharacters = 120,
          includeOrigElements = false))
        .toDF()
        .filter($"doc_id".endsWith("a.txt"))
      val optimized = chunked.queryExecution.optimizedPlan
      // the predicate must sit below BOTH custom nodes, on the scan side
      val partNodes = optimized.collect { case n: PartitionDocsNode => n }
      assert(partNodes.length == 1, optimized.toString)
      val belowParse = partNodes.head.child.toString
      assert(belowParse.contains("a.txt"),
        s"doc_id filter did not reach below the parse:\n$optimized")
      val rows = chunked.collect()
      assert(rows.nonEmpty && rows.forall(_.getAs[String]("doc_id").endsWith("a.txt")))
    }
  }

  test("a registered custom chunking strategy dispatches through the registry") {
    withCorpus { dir =>
      graft.operators.Registries.registerChunkingStrategy("take_first",
        (ds, _) => {
          val sp2 = ds.sparkSession
          import sp2.implicits._
          ds.filter(_.seq == 1L)
        })
      val docs = spark.read.format("binaryFile").load(dir).selectExpr("path", "content")
      val out = PartitionPlan.partitionAndChunk(docs, chunkingStrategy = "take_first")
        .collect()
      assert(out.nonEmpty && out.forall(_.seq == 1L))
    }
  }

  test("no pushdown under processAttachments (doc fan-out breaks the equality)") {
    withCorpus { dir =>
      val sp = spark
      import sp.implicits._
      val filtered = PartitionPlan.partitionFiles(spark, dir, processAttachments = true)
        .filter($"filetype" === "text/plain")
      val optimized = filtered.queryExecution.optimizedPlan
      val nodes = optimized.collect { case n: PartitionDocsNode => n }
      assert(nodes.length == 1)
      assert(!nodes.head.child.toString.contains("detect_mime"),
        s"pushdown must be disabled with attachments:\n$optimized")
      // attachment elements with text/plain filetype survive (d.eml's note.txt)
      val rows = filtered.collect()
      assert(rows.exists(_.getAs[String]("doc_id").contains("!note.txt")))
    }
  }
}
