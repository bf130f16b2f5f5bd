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

  test("compaction bounds per-partition file counts and preserves the lake") {
    val watch = tmp("compact-watch"); val lake = tmp("compact-lake")
    val ckpt = tmp("compact-ckpt")
    def partFiles(): Seq[Path] = {
      import scala.jdk.CollectionConverters._
      Files.walk(lake).iterator().asScala.toSeq
        .filter(p => p.getFileName.toString.startsWith("part-") &&
          p.getFileName.toString.endsWith(".parquet"))
    }
    try {
      // N appends = N micro-batches of a long-lived stream: per-partition
      // file count grows with stream lifetime
      (1 to 6).foreach { i =>
        Files.write(watch.resolve(s"doc$i.txt"),
          s"paragraph $i alpha.\n\nparagraph $i beta.".getBytes(UTF_8))
        StreamingOps.ingestToLake(spark, watch.toString, lake.toString,
          ckpt.toString).awaitTermination(60000)
      }
      val before = ElementLake.read(spark, lake.toString).collect()
        .sortBy(e => (e.doc_id, e.seq)).toSeq
      val filesBefore = partFiles().size
      assert(filesBefore > 4, s"expected >4 small files, got $filesBefore")

      val rewritten = ElementLake.compact(spark, lake.toString,
        maxFilesPerPartition = 4)
      assert(rewritten.nonEmpty)
      // bounded: each partition dir is now at/under the 128 MB-sizing result
      // (one file at this scale), and nothing was lost or reordered
      assert(partFiles().size < filesBefore)
      assert(partFiles().groupBy(_.getParent).values.forall(_.size == 1))
      val after = ElementLake.read(spark, lake.toString).collect()
        .sortBy(e => (e.doc_id, e.seq)).toSeq
      assert(after == before)
      // the (doc_id, seq) reading-order contract holds WITHIN each file
      partFiles().foreach { f =>
        val keys = spark.read.parquet(f.toString)
          .select("doc_id", "seq").collect().map(r => (r.getString(0), r.getLong(1)))
        assert(keys.sameElements(keys.sortBy(identity)), s"unsorted $f")
      }
      // pruned scan still routes through the partition layout
      assert(ElementLake.scan(spark, lake.toString, Seq("text/plain"))
        .collect().forall(_.metadata.filetype.contains("text/plain")))
      // a second pass is a no-op (already under the bound)
      assert(ElementLake.compact(spark, lake.toString,
        maxFilesPerPartition = 4).isEmpty)

      // crash-window recovery: simulate a compact that died between its two
      // renames (live partition moved aside, rewrite never landed) — the
      // next compact() restores the stranded partition before anything else
      import scala.jdk.CollectionConverters._
      val partDir = Files.list(lake).iterator().asScala
        .find(_.getFileName.toString.startsWith("p_filetype=")).get
      val stranded = lake.resolve(s".compact_old_${partDir.getFileName}")
      Files.move(partDir, stranded)
      assert(!Files.exists(partDir))
      ElementLake.compact(spark, lake.toString, maxFilesPerPartition = 4)
      assert(Files.exists(partDir), "stranded partition was not restored")
      assert(!Files.exists(stranded))
      val recovered = ElementLake.read(spark, lake.toString).collect()
        .sortBy(e => (e.doc_id, e.seq)).toSeq
      assert(recovered == before)
    } finally { rmTree(watch); rmTree(lake); rmTree(ckpt) }
  }

  test("an append racing the rewrite window survives compaction") {
    import graft.model.{Element, ElementMetadata, ElementType}
    val lake = tmp("race-lake")
    val sp = spark
    import sp.implicits._
    def slice(tag: String, n: Int): Seq[Element] = (1 to n).map { i =>
      Element("", ElementType.NarrativeText, s"$tag row $i", s"doc-$tag", i.toLong,
        ElementMetadata.empty.copy(filetype = Some("text/plain")))
    }
    try {
      // 6 appends = 6 micro-batches: one partition, many small files
      (1 to 6).foreach(i => ElementLake.append(slice(s"b$i", 2).toDS(), lake.toString))
      val before = ElementLake.read(spark, lake.toString).collect().toSet
      // the seam fires between the partition's rewrite and its swap — the
      // exact window where a concurrent ingestToLake micro-batch would land
      var fired = 0
      val rewritten = ElementLake.compactImpl(spark, lake.toString,
        maxFilesPerPartition = 4, targetFileBytes = 128L << 20,
        beforeSwap = { _ =>
          fired += 1
          ElementLake.append(slice("late", 3).toDS(), lake.toString)
        })
      assert(fired == 1 && rewritten.nonEmpty)
      val after = ElementLake.read(spark, lake.toString).collect().toSet
      assert(after == before ++ slice("late", 3).toSet,
        "the racing append's rows were lost by the swap")
      // and the lake is clean: no stranded compact dirs, no manifest, no lock
      import scala.jdk.CollectionConverters._
      val leftovers = Files.walk(lake).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith(".compact_") || n == "_compact_snapshot" ||
          n == ElementLake.LockName).toSeq
      assert(leftovers.isEmpty, s"leftovers: $leftovers")
    } finally rmTree(lake)
  }

  test("a second concurrent compaction fails fast on the advisory lock") {
    import graft.model.{Element, ElementMetadata, ElementType}
    val lake = tmp("lock-lake")
    val sp = spark
    import sp.implicits._
    val rows = (1 to 10).map { i =>
      Element("", ElementType.NarrativeText, s"row $i", s"doc$i", 1L,
        ElementMetadata.empty.copy(filetype = Some("text/plain")))
    }
    try {
      (1 to 6).foreach(_ => ElementLake.append(rows.toDS(), lake.toString))
      Files.write(lake.resolve(ElementLake.LockName), Array.empty[Byte])
      val e = intercept[IllegalStateException] {
        ElementLake.compact(spark, lake.toString, maxFilesPerPartition = 4)
      }
      assert(e.getMessage.contains("live compaction"))
      Files.delete(lake.resolve(ElementLake.LockName))
      // lock released: compaction proceeds and cleans up after itself
      assert(ElementLake.compact(spark, lake.toString,
        maxFilesPerPartition = 4).nonEmpty)
      assert(!Files.exists(lake.resolve(ElementLake.LockName)))
    } finally rmTree(lake)
  }

  test("a stale lock from a crashed compactor is taken over, no manual step") {
    import graft.model.{Element, ElementMetadata, ElementType}
    import scala.jdk.CollectionConverters._
    val lake = tmp("stale-lock-lake")
    val sp = spark
    import sp.implicits._
    val rows = (1 to 10).map { i =>
      Element("", ElementType.NarrativeText, s"row $i", s"doc$i", 1L,
        ElementMetadata.empty.copy(filetype = Some("text/plain")))
    }
    try {
      (1 to 6).foreach(_ => ElementLake.append(rows.toDS(), lake.toString))
      val before = ElementLake.read(spark, lake.toString).collect().toSet
      // simulate the full crash footprint: the dead compactor's lock PLUS a
      // partition stranded between the two swap renames
      val lock = lake.resolve(ElementLake.LockName)
      Files.write(lock, "pid=99999 token=dead created_ms=0\n".getBytes)
      val partDir = Files.list(lake).iterator().asScala
        .find(_.getFileName.toString.startsWith("p_filetype=")).get
      val stranded = lake.resolve(s".compact_old_${partDir.getFileName}")
      Files.move(partDir, stranded)
      // age the lock past the lease (mtime is the lease clock)
      Files.setLastModifiedTime(lock,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - ElementLake.DefaultLockLeaseMs - 60000))
      // within the lease a read-path recovery must stand down...
      // (the stranded dir is older than any live-lock scenario here, so we
      // only assert the takeover path end-to-end below)
      assert(ElementLake.compact(spark, lake.toString,
        maxFilesPerPartition = 4).nonEmpty)
      assert(Files.exists(partDir) && !Files.exists(stranded),
        "takeover did not run recovery under the new lock")
      assert(!Files.exists(lock), "taken-over lock not released")
      assert(ElementLake.read(spark, lake.toString).collect().toSet == before)
    } finally rmTree(lake)
  }

  test("a stale lock no longer blocks read/append-path recovery; a live one does") {
    import graft.model.{Element, ElementMetadata, ElementType}
    import scala.jdk.CollectionConverters._
    val lake = tmp("stale-lock-recovery")
    val sp = spark
    import sp.implicits._
    val rows = (1 to 6).map { i =>
      Element("", ElementType.NarrativeText, s"row $i", s"doc$i", 1L,
        ElementMetadata.empty.copy(filetype = Some("text/plain")))
    }
    try {
      ElementLake.append(rows.toDS(), lake.toString)
      val before = ElementLake.read(spark, lake.toString).collect().toSet
      val lock = lake.resolve(ElementLake.LockName)
      val partDir = Files.list(lake).iterator().asScala
        .find(_.getFileName.toString.startsWith("p_filetype=")).get
      val stranded = lake.resolve(s".compact_old_${partDir.getFileName}")
      // live lock: recovery stands down, the stranded dir stays
      Files.move(partDir, stranded)
      Files.write(lock, "pid=1 token=x created_ms=0\n".getBytes)
      ElementLake.recoverIfCrashed(spark, lake.toString)
      assert(Files.exists(stranded), "recovery ran under a live lock")
      // stale lock: recovery proceeds (lock left for compact()'s takeover)
      Files.setLastModifiedTime(lock,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - ElementLake.DefaultLockLeaseMs - 60000))
      ElementLake.recoverIfCrashed(spark, lake.toString)
      assert(Files.exists(partDir) && !Files.exists(stranded))
      assert(Files.exists(lock), "read-path recovery must not consume the lock")
      Files.delete(lock)
      assert(ElementLake.read(spark, lake.toString).collect().toSet == before)
    } finally rmTree(lake)
  }

  test("epoch fence: a compactor displaced before the swap ABORTS — no rename " +
      "lands, and the successor's lock survives the old holder's finally") {
    import graft.model.{Element, ElementMetadata, ElementType}
    val lake = tmp("token-lock-lake")
    val sp = spark
    import sp.implicits._
    val rows = (1 to 10).map { i =>
      Element("", ElementType.NarrativeText, s"row $i", s"doc$i", 1L,
        ElementMetadata.empty.copy(filetype = Some("text/plain")))
    }
    try {
      (1 to 6).foreach(_ => ElementLake.append(rows.toDS(), lake.toString))
      val before = ElementLake.read(spark, lake.toString).collect().toSet
      val lock = lake.resolve(ElementLake.LockName)
      val partDir = { import scala.jdk.CollectionConverters._
        Files.list(lake).iterator().asScala
          .find(_.getFileName.toString.startsWith("p_filetype=")).get }
      def partFiles(): Int = { import scala.jdk.CollectionConverters._
        Files.list(partDir).iterator().asScala
          .count(_.getFileName.toString.startsWith("part-")) }
      val filesBefore = partFiles()
      // mid-compact, a (simulated) lease takeover replaces the lock with a
      // NEW holder's: the displaced compactor must refuse to swap at all
      val ex = intercept[IllegalStateException] {
        ElementLake.compactImpl(spark, lake.toString,
          maxFilesPerPartition = 4, targetFileBytes = 128L << 20,
          beforeSwap = { _ =>
            Files.delete(lock)
            Files.write(lock, "pid=777 token=new-holder created_ms=1\n".getBytes)
          })
      }
      assert(ex.getMessage.contains("lease lost"), ex.getMessage)
      // the swap was rejected: live partition untouched, rewrite discarded
      assert(partFiles() == filesBefore, "displaced compactor landed its swap")
      locally { import scala.jdk.CollectionConverters._
        val leftovers = Files.list(lake).iterator().asScala
          .map(_.getFileName.toString)
          .filter(n => n.startsWith(".compact_tmp_") || n.startsWith(".compact_old_"))
          .toSeq
        assert(leftovers.isEmpty, s"abort left debris: $leftovers") }
      assert(ElementLake.read(spark, lake.toString).collect().toSet == before)
      // and the old holder's finally left the successor's lock alone
      assert(Files.exists(lock), "old holder deleted the new holder's lock")
      assert(new String(Files.readAllBytes(lock)).contains("token=new-holder"))
      Files.delete(lock)
    } finally rmTree(lake)
  }

  test("epoch fence: displacement INSIDE the swap window restores the " +
      "partition it had moved aside, then aborts") {
    import graft.model.{Element, ElementMetadata, ElementType}
    val lake = tmp("fence2-lake")
    val sp = spark
    import sp.implicits._
    val rows = (1 to 10).map { i =>
      Element("", ElementType.NarrativeText, s"row $i", s"doc$i", 1L,
        ElementMetadata.empty.copy(filetype = Some("text/plain")))
    }
    try {
      (1 to 6).foreach(_ => ElementLake.append(rows.toDS(), lake.toString))
      val before = ElementLake.read(spark, lake.toString).collect().toSet
      val lock = lake.resolve(ElementLake.LockName)
      // takeover lands between the aside rename and the land rename — the
      // narrowest window; the displaced compactor must roll its aside back
      val ex = intercept[IllegalStateException] {
        ElementLake.compactImpl(spark, lake.toString,
          maxFilesPerPartition = 4, targetFileBytes = 128L << 20,
          beforeSwap = _ => (),
          betweenRenames = { _ =>
            Files.delete(lock)
            Files.write(lock, "pid=888 token=other created_ms=1\n".getBytes)
          })
      }
      assert(ex.getMessage.contains("lease lost"), ex.getMessage)
      locally { import scala.jdk.CollectionConverters._
        val leftovers = Files.list(lake).iterator().asScala
          .map(_.getFileName.toString)
          .filter(n => n.startsWith(".compact_tmp_") || n.startsWith(".compact_old_"))
          .toSeq
        assert(leftovers.isEmpty, s"mid-swap abort left debris: $leftovers") }
      assert(ElementLake.read(spark, lake.toString).collect().toSet == before,
        "mid-swap abort lost data")
      Files.delete(lock)
    } finally rmTree(lake)
  }

  test("two compactors racing a stale lease: the taker wins atomically and " +
      "the overtaken holder's release cannot delete the winner's lock") {
    import graft.model.{Element, ElementMetadata, ElementType}
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val lake = tmp("race-takeover-lake")
    val sp = spark
    import sp.implicits._
    val rows = (1 to 10).map { i =>
      Element("", ElementType.NarrativeText, s"row $i", s"doc$i", 1L,
        ElementMetadata.empty.copy(filetype = Some("text/plain")))
    }
    try {
      (1 to 6).foreach(_ => ElementLake.append(rows.toDS(), lake.toString))
      val before = ElementLake.read(spark, lake.toString).collect().toSet
      val lock = lake.resolve(ElementLake.LockName)
      // zombie Z: acquires the lock, then hangs between rewrite and swap —
      // the real thread, not a simulated footprint
      val zInSwap = new CountDownLatch(1); val zGo = new CountDownLatch(1)
      val z = new Thread(() =>
        try ElementLake.compactImpl(spark, lake.toString, 4, 128L << 20,
          beforeSwap = { _ => zInSwap.countDown(); zGo.await() })
        catch { case _: Throwable => () }) // Z may legitimately self-heal
      z.start()
      assert(zInSwap.await(120, TimeUnit.SECONDS), "zombie never reached swap")
      val zContent = new String(Files.readAllBytes(lock))
      // Z hangs past its lease (mtime is the lease clock)
      Files.setLastModifiedTime(lock,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - ElementLake.DefaultLockLeaseMs - 60000))
      // taker T: consumes the stale lease by atomic rename while Z is still
      // ALIVE, then hangs in ITS swap window holding the fresh lock
      val tInSwap = new CountDownLatch(1); val tGo = new CountDownLatch(1)
      @volatile var tErr: Option[Throwable] = None
      val t = new Thread(() =>
        try ElementLake.compactImpl(spark, lake.toString, 4, 128L << 20,
          beforeSwap = { _ => tInSwap.countDown(); tGo.await() })
        catch { case e: Throwable => tErr = Some(e) })
      t.start()
      assert(tInSwap.await(120, TimeUnit.SECONDS), s"taker never took over: $tErr")
      val tContent = new String(Files.readAllBytes(lock))
      assert(tContent != zContent, "takeover did not replace the lock")
      // Z finishes while T still holds: Z's finally must NOT delete T's lock
      zGo.countDown(); z.join(120000)
      assert(Files.exists(lock), "overtaken holder deleted the winner's lock")
      assert(new String(Files.readAllBytes(lock)) == tContent,
        "winner's lock was replaced by the overtaken holder")
      // T finishes normally: self-heals its (Z-disturbed) swap if needed,
      // releases its own lock, and the data survives both compactors
      tGo.countDown(); t.join(120000)
      assert(tErr.isEmpty, s"winner failed: $tErr")
      assert(!Files.exists(lock), "winner's release did not remove its lock")
      assert(ElementLake.read(spark, lake.toString).collect().toSet == before)
    } finally rmTree(lake)
  }

  test("expired takeover/release tombstones are swept on the next compact; " +
      "fresh ones survive") {
    import graft.model.{Element, ElementMetadata, ElementType}
    val lake = tmp("tombstone-lake")
    val sp = spark
    import sp.implicits._
    val rows = (1 to 10).map { i =>
      Element("", ElementType.NarrativeText, s"row $i", s"doc$i", 1L,
        ElementMetadata.empty.copy(filetype = Some("text/plain")))
    }
    try {
      (1 to 2).foreach(_ => ElementLake.append(rows.toDS(), lake.toString))
      // a failed restoreLock strands the displaced peer's lock content as a
      // tombstone; nothing but the sweep ever deletes it
      val expired1 = lake.resolve(s"${ElementLake.LockName}.takeover.dead-a")
      val expired2 = lake.resolve(s"${ElementLake.LockName}.release.dead-b")
      val fresh = lake.resolve(s"${ElementLake.LockName}.takeover.live-c")
      Seq(expired1, expired2, fresh).foreach(p =>
        Files.write(p, "pid=1 token=x created_ms=0\n".getBytes))
      val past = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - ElementLake.DefaultLockLeaseMs - 60000)
      Files.setLastModifiedTime(expired1, past)
      Files.setLastModifiedTime(expired2, past)
      ElementLake.compact(spark, lake.toString, maxFilesPerPartition = 64)
      assert(!Files.exists(expired1) && !Files.exists(expired2),
        "expired tombstones were not swept")
      assert(Files.exists(fresh),
        "a fresh tombstone (owner may be mid-restore) must survive the sweep")
      assert(!Files.exists(lake.resolve(ElementLake.LockName)),
        "compact did not release its own lock")
    } finally rmTree(lake)
  }
}
