package graft.sinks

import java.nio.file.Files

import graft.SparkSuiteBase
import graft.model.{Element, ElementMetadata, ElementType}

/** The filetype-partitioned element lake: round trip, partition pruning at
  * the scan, in-file reading order, and null-filetype handling. */
class ElementLakeSpec extends SparkSuiteBase {

  private def corpus: Seq[Element] = (1 to 4).flatMap { d =>
    val ft = if (d % 2 == 0) "text/html" else "application/pdf"
    (1 to 3).map { i =>
      Element("", ElementType.NarrativeText, s"doc $d element $i", s"doc$d", i.toLong,
        ElementMetadata.empty.copy(filetype = Some(ft)))
    }
  } :+ Element("", ElementType.Title, "no filetype", "doc9", 1L)

  private def withLake[A](f: String => A): A = {
    val dir = Files.createTempDirectory("ellake").toString
    try {
      val sp = spark
      import sp.implicits._
      ElementLake.write(corpus.toDS(), dir)
      f(dir)
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }

  test("write/read round-trips every element including null filetype") {
    withLake { dir =>
      val back = ElementLake.read(spark, dir).collect()
        .sortBy(e => (e.doc_id, e.seq)).toSeq
      assert(back == corpus.sortBy(e => (e.doc_id, e.seq)))
      assert(back.exists(_.metadata.filetype.isEmpty))
    }
  }

  test("the lake lays out one directory per filetype") {
    withLake { dir =>
      val parts = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith(ElementLake.PartitionCol + "="))
        .map(_.getName).sorted
      assert(parts.length == 3, parts.mkString(", "))
      assert(parts.exists(_.contains("unknown")))
    }
  }

  test("a filetype scan prunes partitions — the filter never reaches the data") {
    withLake { dir =>
      val scan = ElementLake.scan(spark, dir, Seq("text/html"))
      val plan = scan.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: ["), plan)
      assert(plan.contains(ElementLake.PartitionCol), plan)
      val rows = scan.collect()
      assert(rows.nonEmpty && rows.forall(_.metadata.filetype.contains("text/html")))
      // only the html directory's files are actually read at execution
      val readFiles = spark.read.parquet(dir)
        .filter(org.apache.spark.sql.functions.col(ElementLake.PartitionCol) === "text/html")
        .select(org.apache.spark.sql.functions.input_file_name()).distinct()
        .collect().map(_.getString(0))
      assert(readFiles.nonEmpty &&
        readFiles.forall(f => java.net.URLDecoder.decode(
          java.net.URLDecoder.decode(f, "UTF-8"), "UTF-8")
          .contains("p_filetype=text/html")))
    }
  }

  test("crash recovery runs from the read path, not only the next compact()") {
    withLake { dir =>
      import scala.jdk.CollectionConverters._
      val before = ElementLake.read(spark, dir).collect()
        .sortBy(e => (e.doc_id, e.seq)).toSeq
      val root = java.nio.file.Paths.get(dir)
      val partDir = Files.list(root).iterator().asScala
        .find(_.getFileName.toString.startsWith("p_filetype=")).get
      val stranded = root.resolve(s".compact_old_${partDir.getFileName}")
      Files.move(partDir, stranded) // = died between the two swap renames
      val recovered = ElementLake.read(spark, dir).collect()
        .sortBy(e => (e.doc_id, e.seq)).toSeq
      assert(recovered == before, "read did not restore the stranded partition")
      assert(!Files.exists(stranded) && Files.exists(partDir))
    }
  }

  test("recovery merges a failed-land partition: old's files join the fresh appends") {
    withLake { dir =>
      import scala.jdk.CollectionConverters._
      val before = ElementLake.read(spark, dir).count()
      val root = java.nio.file.Paths.get(dir)
      val partDir = Files.list(root).iterator().asScala
        .find(_.getFileName.toString.startsWith("p_filetype=")).get
      // construct the failed-land crash state: a concurrent append recreated
      // the live dir mid-swap (holds only its fresh file), the complete old
      // set sits aside, NO manifest (the rewrite never landed)
      val old = root.resolve(s".compact_old_${partDir.getFileName}")
      Files.createDirectory(old)
      val parts = Files.list(partDir).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq
      assert(parts.nonEmpty)
      parts.tail.foreach(p => Files.move(p, old.resolve(p.getFileName)))
      ElementLake.recoverIfCrashed(spark, dir)
      assert(!Files.exists(old))
      assert(ElementLake.read(spark, dir).count() == before,
        "failed-land merge lost rows")
    }
  }

  test("recovery with a snapshot manifest carries ONLY the late appends over") {
    withLake { dir =>
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(dir)
      val partDir = Files.list(root).iterator().asScala
        .find(_.getFileName.toString.startsWith("p_filetype=")).get
      val parts = Files.list(partDir).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq
      // construct the landed-but-uncleaned crash state: old holds the
      // snapshot files PLUS one late append; live is the compacted rewrite
      // with the manifest naming exactly the snapshot
      val old = root.resolve(s".compact_old_${partDir.getFileName}")
      Files.createDirectory(old)
      val snapshotName = "part-00000-snapshotted.parquet"
      Files.write(old.resolve(snapshotName), Array[Byte](1, 2, 3))
      val lateName = "part-00099-late-append.parquet"
      val lateBytes = Files.readAllBytes(parts.head) // a real parquet file
      Files.write(old.resolve(lateName), lateBytes)
      Files.write(partDir.resolve("_compact_snapshot"),
        snapshotName.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ElementLake.recoverIfCrashed(spark, dir)
      assert(!Files.exists(old))
      assert(Files.exists(partDir.resolve(lateName)),
        "late append was not carried into the live partition")
      assert(!Files.exists(partDir.resolve(snapshotName)),
        "snapshot file leaked back in — it is already covered by the rewrite")
      assert(!Files.exists(partDir.resolve("_compact_snapshot")))
    }
  }

  test("rows inside each file are sorted by (doc_id, seq)") {
    withLake { dir =>
      import scala.jdk.CollectionConverters._
      val files = Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).map(_.toString).toSeq
      assert(files.nonEmpty)
      files.foreach { f =>
        val rows = spark.read.parquet(f)
          .select("doc_id", "seq").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(rows == rows.sorted, s"unsorted rows in $f")
      }
    }
  }
}
