package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuiteBase
import graft.model.{Element, ElementType}
import graft.operators.ChunkingOptions

class StreamingOpsSpec extends SparkSuiteBase {

  test("streaming chunker buffers a doc and emits chunks after timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Element]
    val chunks = StreamingOps.chunkStream(input.toDS(),
      ChunkingOptions(maxCharacters = 120, includeOrigElements = false,
        combineTextUnderNChars = Some(0), byTitle = true),
      docTimeoutMs = 300L)
    val query = chunks.writeStream
      .format("memory").queryName("chunks_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      input.addData(
        Element("", ElementType.Title, "Section One", "docS", 1),
        Element("", ElementType.NarrativeText, "First body sentence.", "docS", 2),
        Element("", ElementType.Title, "Section Two", "docS", 3),
        Element("", ElementType.NarrativeText, "Second body sentence.", "docS", 4))
      // NOTE: a ProcessingTimeTimeout query never reports idle (the engine always
      // schedules another batch to check wall-clock timeouts), so
      // processAllAvailable() would block forever — poll the sink instead.
      // the incremental fold emits the first chunk as soon as its pre-chunk closes
      // (Title boundary) and the last at the timeout flush — wait for both
      // 180 s: under a full parallel-suite run the executor pool is contended and
      // the wall-clock timeout batch can lag far behind the 300 ms nominal
      var rows = Array.empty[Element]
      val deadline = System.currentTimeMillis() + 180000
      while (rows.length < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        rows = spark.table("chunks_out").as[Element].collect()
      }
      assert(rows.length >= 2, s"sink rows after deadline: ${rows.mkString("; ")}")
      val docS = rows.filter(_.doc_id == "docS").sortBy(_.seq)
      assert(docS.map(_.text).toSeq == Seq(
        "Section One\n\nFirst body sentence.",
        "Section Two\n\nSecond body sentence."))
      assert(docS.forall(_.`type` == ElementType.CompositeElement))
    } finally query.stop()
  }

  test("EndOfDocument marker flushes the open tail in-batch, no timeout needed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Element]
    val chunks = StreamingOps.chunkStream(input.toDS(),
      ChunkingOptions(maxCharacters = 120, includeOrigElements = false))
    val query = chunks.writeStream
      .format("memory").queryName("chunks_marker_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      input.addData(
        Element("", ElementType.NarrativeText, "Open tail sentence.", "docM", 1),
        Element("", StreamingOps.EndOfDocument, "", "docM", Long.MaxValue))
      var rows = Array.empty[Element]
      val deadline = System.currentTimeMillis() + 180000
      while (rows.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        rows = spark.table("chunks_marker_out").as[Element].collect()
      }
      // the tail flushed from the marker alone (well before any 10 s timeout)
      assert(rows.map(_.text).toSeq == Seq("Open tail sentence."))
      assert(!rows.exists(_.`type` == StreamingOps.EndOfDocument))
    } finally query.stop()
  }

  test("elements arriving AFTER the marker continue chunk seq, never restart at 0") {
    // multi-part files under maxFilesPerTrigger can land a doc's tail in a
    // micro-batch after its EndOfDocument marker; the closed-tombstone state
    // keeps the next chunk seq so late chunks don't collide with emitted ones
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Element]
    val chunks = StreamingOps.chunkStream(input.toDS(),
      ChunkingOptions(maxCharacters = 120, includeOrigElements = false),
      useTimeout = false)
    val query = chunks.writeStream
      .format("memory").queryName("chunks_late_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      input.addData(
        Element("", ElementType.NarrativeText, "First part sentence.", "docL", 1),
        Element("", StreamingOps.EndOfDocument, "", "docL", Long.MaxValue))
      query.processAllAvailable()
      // a later micro-batch delivers elements for the already-closed doc
      input.addData(
        Element("", ElementType.NarrativeText, "Late straggler sentence.", "docL", 2))
      query.processAllAvailable()
      val rows = spark.table("chunks_late_out").as[Element].collect().sortBy(_.seq)
      assert(rows.map(_.text).toSeq ==
        Seq("First part sentence.", "Late straggler sentence."))
      assert(rows.map(_.seq).toSeq == Seq(0L, 1L), "duplicate or restarted chunk_seq")
      assert(rows.map(_.element_id).distinct.length == 2)
    } finally query.stop()
  }

  test("closed-form staging slice is byte-identical to ntile over every (n, k)") {
    // the staging split replaced `ntile(k) over (partition by doc order by
    // seq)` with pure arithmetic over (seq, n) — sweep group sizes around
    // and below k to pin the exact tile boundaries (larger tiles first,
    // n < k giving one row per tile)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    for (k <- Seq(2, 3, 4, 7)) {
      val rows = for (n <- 1 to 23; s <- 1 to n) yield (n.toLong, s.toLong)
      val df = rows.toDF("n", "seq")
      val got = df.select(col("n"), col("seq"),
          StreamingOps.sliceOfSeq(col("seq"), col("n"), k).as("closed"),
          ntile(k).over(org.apache.spark.sql.expressions.Window
            .partitionBy("n").orderBy("seq")).as("window"))
        .collect()
      got.foreach { r =>
        assert(r.getInt(2) == r.getInt(3),
          s"k=$k n=${r.getLong(0)} seq=${r.getLong(1)}: " +
            s"closed=${r.getInt(2)} ntile=${r.getInt(3)}")
      }
    }
  }

  test("a doc split across 3+ micro-batches chunks byte-identically to the batch fold") {
    // the depth proof for the closed-tombstone/carry path: every document's
    // elements are staged as per-doc contiguous seq slices in SEPARATE files,
    // drained with maxFilesPerTrigger = 1 (one real micro-batch per slice,
    // markers in the last), and the streamed chunk set must equal the batch
    // fold EXACTLY — same chunk_seq sequence, same text bytes — across
    // several option shapes (plain window, small window, overlap carrying a
    // tail across a batch boundary).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mb-docs")
    val docsPath = dir.resolve("documents.parquet").toString
    // 3 docs x 9 paragraphs of varied lengths: slices land 3 elements per
    // micro-batch and several pre-chunks straddle slice boundaries
    val paras = (d: Long) => (1 to 9).map(i =>
      s"Doc $d paragraph $i " + ("sentence word " * (i % 4 + 1)).trim + ".")
    val docs = Seq(1L, 2L, 3L)
      .map(d => (d, paras(d).mkString(" merge ")))
      .toDF("doc_id", "text")
    docs.write.parquet(docsPath)
    try {
      for (opts <- Seq(
          ChunkingOptions(maxCharacters = 120, includeOrigElements = false),
          ChunkingOptions(maxCharacters = 60, includeOrigElements = false),
          ChunkingOptions(maxCharacters = 120, overlap = 15, overlapAll = true,
            includeOrigElements = false))) {
        val streamed = StreamingOps.chunkBasicAvailableNow(spark, docsPath,
          opts, splitBatches = 4)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
        // the batch twin: identical derivation, batch Chunker fold
        val els = graft.sources.TextSource.partitionText(
            spark.read.parquet(docsPath).select(col("doc_id"),
              replace(col("text"), lit(" merge "), lit("\n\n")).as("text")),
            col("text"))
          .select(col("doc_id").cast("string").as("doc_id"), col("seq"),
            col("element_type"), substring(col("text"), 1, 100).as("text"))
          .as[(String, Long, String, String)]
          .map { case (d, q, tpe, t) => graft.model.Element("", tpe, t, d, q) }
        val batch = graft.operators.Chunker.chunkElements(els, opts)
          .select(col("doc_id").cast("long"), col("seq"), col("text"))
          .orderBy("doc_id", "seq")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
        assert(streamed === batch,
          s"multi-batch stream diverged from the batch fold for $opts")
        assert(streamed.map(x => (x._1, x._2)).distinct.size == streamed.size,
          "duplicate (doc_id, chunk_seq)")
      }
    } finally {
      StreamingOps.deleteRecursivelyForTest(dir)
    }
  }

  test("file-arrival stream partitions new files into elements") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream").toString
    Files.write(java.nio.file.Paths.get(dir, "a.html"),
      "<html><body><h1>Stream Title</h1><p>stream body text</p></body></html>".getBytes)
    val els = StreamingOps.partitionFileStream(spark, dir)
    val query = els.writeStream.format("memory").queryName("els_out")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val rows = spark.table("els_out")
        .select("element_type", "text").as[(String, String)].collect().toSeq
      assert(rows.contains(("Title", "Stream Title")))
      assert(rows.exists(_._2 == "stream body text"))
    } finally query.stop()
  }

  test("AvailableNow windowed aggregation matches the batch plan") {
    import org.apache.spark.sql.functions._
    val path = "/root/testdata/sf0.001/events.parquet"
    assume(new java.io.File(path).exists())
    val streamed = StreamingOps.hourlyWindowAvailableNow(spark, path)
      .orderBy("hour", "event_type").collect().toSeq
    val batch = graft.Tables.read(spark, "/root/testdata/sf0.001", "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .orderBy("hour", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("hourly-window staging dirs are cleaned up after each invocation") {
    // the round-7 bench leaked one graft-stream-events temp dir + symlink per
    // call; the bounded-wait fix also deletes them on completion
    val path = "/root/testdata/sf0.001/events.parquet"
    assume(new java.io.File(path).exists())
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    def stagingDirs: Seq[String] = {
      val s = Files.list(tmp)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("graft-stream-events")).toVector
      } finally s.close()
    }
    val before = stagingDirs
    StreamingOps.hourlyWindowAvailableNow(spark, path).collect()
    assert(stagingDirs == before, "staging dir leaked")
  }

  test("streaming exact-dedup groups duplicates with an order-independent winner") {
    import org.apache.spark.sql.functions._
    val path = "/root/testdata/sf0.001/documents.parquet"
    assume(new java.io.File(path).exists())
    val out = StreamingOps.exactDedupAvailableNow(spark, path)
    val dups = out.filter(col("n_docs") > 1).collect()
    assert(dups.nonEmpty) // every doc_id % 3 == 0 is re-emitted shifted
    // the kept winner is always the ORIGINAL (unshifted) id
    assert(dups.forall(r => r.getLong(2) < 1000000L))
    // and a batch groupBy over the same synthesized union agrees exactly
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val union = docs.unionByName(
      docs.filter(col("doc_id") % 3 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
    val batch = union
      .select(col("doc_id"),
        graft.functions.TextAnalysis.docFingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
      .orderBy("fp").collect().toSeq
    assert(out.orderBy("fp").collect().toSeq == batch)
  }

  test("streaming exact-dedup never re-emits fingerprints a batch didn't touch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // rows are (doc_id, fp)
    val input = MemoryStream[(Long, Long)]
    val out = StreamingOps.exactDedupStream(input.toDS().toDF("doc_id", "fp"))
    val query = out.writeStream.format("memory").queryName("dedup_upd_out")
      .outputMode("update").trigger(Trigger.ProcessingTime(50)).start()
    def rows(): Seq[(Long, Long, Long)] =
      spark.table("dedup_upd_out").as[(Long, Long, Long)].collect().toSeq
    try {
      // batch 1: fp 10 is a duplicate pair, fp 20 a singleton
      input.addData((5L, 10L), (7L, 10L), (9L, 20L))
      query.processAllAvailable()
      assert(rows().sorted == Seq((10L, 2L, 5L), (20L, 1L, 9L)))
      // batch 2 touches ONLY fp 20: fp 10 must not be re-emitted — the
      // update-mode contract that keeps per-batch output O(batch keys),
      // never O(all uniques) the way the old complete-mode groupBy was.
      input.addData((3L, 20L))
      query.processAllAvailable()
      val after = rows()
      assert(after.count(_._1 == 10L) == 1, "untouched fingerprint re-emitted")
      // fp 20's state carried: count grew and the winner re-minimized
      assert(after.filter(_._1 == 20L).sorted == Seq((20L, 1L, 9L), (20L, 2L, 3L)))
      // last-write-wins compaction (what exactDedupAvailableNow applies to
      // the drained sink) yields exactly the batch-groupBy answer
      val compacted = after.groupBy(_._1).map { case (fp, rs) =>
        val latest = rs.maxBy(_._2); (fp, latest._2, latest._3)
      }.toSeq.sorted
      assert(compacted == Seq((10L, 2L, 5L), (20L, 2L, 3L)))
    } finally query.stop()
  }

  test("stream-static decontamination agrees with the batch operator exactly") {
    import org.apache.spark.sql.functions._
    val path = "/root/testdata/sf0.001/documents.parquet"
    assume(new java.io.File(path).exists())
    val streamed = StreamingOps.decontaminateAvailableNow(spark, path, n = 5)
      .collect().toSeq
    val docs = spark.read.parquet(path)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val bench = docs.filter(col("doc_id") % 11 === 3)
      .select(array_join(slice(
        graft.functions.TextAnalysis.words(col("text")), 3, 8), " ").as("text"))
    val batch = graft.functions.CorpusOps
      .decontaminate(docs, bench, col("text"), n = 5)
      .orderBy("doc_id").collect().toSeq
    assert(streamed == batch)
    // the synthetic corpus rule guarantees contaminated docs exist
    assert(streamed.exists(_.getBoolean(2)))
    assert(streamed.exists(!_.getBoolean(2)))
  }

  test("streaming decontamination finalizes per doc and never re-emits") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // rows are (doc_id, Some(gram) | None = end-of-document marker)
    val input = MemoryStream[(Long, Option[String])]
    val benchGrams = Seq("g1", "g3").toDF("g").withColumn("hit", lit(1))
    val out = StreamingOps.decontaminateStream(
      input.toDS().toDF("doc_id", "g"), benchGrams)
    val query = out.writeStream.format("memory").queryName("decon_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    def rows(): Seq[(Long, Int, Boolean)] =
      spark.table("decon_out").as[(Long, Int, Boolean)].collect().toSeq
    try {
      // batch 1: doc 1 completes (2 grams, 1 contaminated) and finalizes;
      // doc 2 has a gram in flight but no marker yet -> stays in state
      input.addData((1L, Some("g1")), (1L, Some("g2")), (1L, None),
        (2L, Some("g3")))
      query.processAllAvailable()
      assert(rows().sorted == Seq((1L, 1, true)))
      // batch 2: doc 2's remaining gram + marker finalize it with the count
      // carried across the batch boundary; doc 3 is a zero-gram doc (marker
      // only). Doc 1 must NOT be re-emitted — the append-mode contract that
      // keeps per-batch output O(docs finalized this batch).
      input.addData((2L, Some("g1")), (2L, None), (3L, None))
      query.processAllAvailable()
      assert(rows().sorted == Seq((1L, 1, true), (2L, 2, true), (3L, 0, false)))
      assert(rows().count(_._1 == 1L) == 1, "first-batch doc re-emitted")
    } finally query.stop()
  }

  test("streaming LSH pairs across batches and poisons hot buckets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // rows are (doc_id, band_idx, band_key)
    val input = MemoryStream[(Long, Int, Long)]
    val pairs = StreamingOps.lshCandidateStream(input.toDS(), maxBandSize = 3)
    val query = pairs.writeStream.format("memory").queryName("lsh_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    def rows(): Set[(Int, Long, Long)] =
      spark.table("lsh_out").as[(Int, Long, Long)].collect().toSet
    def awaitCount(n: Int): Set[(Int, Long, Long)] = {
      val deadline = System.currentTimeMillis() + 120000
      var r = rows()
      while (r.size < n && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); r = rows()
      }
      r
    }
    try {
      // batch 1: bucket (0, 7) holds docs 2 and 5 (emitted sorted), bucket
      // (1, 9) holds doc 2 alone (no pair yet)
      input.addData((5L, 0, 7L), (2L, 0, 7L), (2L, 1, 9L))
      query.processAllAvailable()
      assert(awaitCount(1) === Set((0, 2L, 5L)))
      // batch 2: doc 9 joins both buckets — pairs with the PRIOR state docs
      input.addData((9L, 0, 7L), (9L, 1, 9L))
      query.processAllAvailable()
      assert(awaitCount(3) === Set((0, 2L, 5L), (0, 2L, 9L), (0, 5L, 9L), (1, 2L, 9L)))
      // batch 3: bucket (0, 7) would exceed maxBandSize=3 -> poisoned, no new
      // pairs from it, ever; the other bucket still pairs
      input.addData((11L, 0, 7L), (11L, 1, 9L))
      query.processAllAvailable()
      val after = awaitCount(5)
      assert(after.contains((1, 9L, 11L)) && after.contains((1, 2L, 11L)))
      assert(!after.exists(p => p._1 == 0 && p._3 == 11L), "poisoned bucket emitted")
      // batch 4: even a single doc into the poisoned bucket stays silent
      input.addData((12L, 0, 7L))
      query.processAllAvailable()
      assert(!rows().exists(p => p._1 == 0 && (p._2 == 12L || p._3 == 12L)))
    } finally query.stop()
  }

  test("LSH bucket TTL drops buckets silent past the watermark; state plateaus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1600000000000L
    def ts(h: Double) = new java.sql.Timestamp(t0 + (h * 3600000L).toLong)
    // rows are (doc_id, band_idx, band_key, event time); TTL = 10 min
    val input = MemoryStream[(Long, Int, Long, java.sql.Timestamp)]
    val pairs = StreamingOps.lshCandidateStreamTtl(
      input.toDS().toDF("doc_id", "band_idx", "band_key", "ts"),
      maxBandSize = 100, delayThreshold = "10 minutes")
    val query = pairs.writeStream.format("memory").queryName("lsh_ttl_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    def rows(): Set[(Int, Long, Long)] =
      spark.table("lsh_ttl_out").as[(Int, Long, Long)].collect().toSet
    def stateRows(): Long =
      Option(query.lastProgress).map(_.stateOperators.head.numRowsTotal).getOrElse(-1L)
    try {
      // hour 0: bucket 100 pairs docs 1,2
      input.addData((1L, 0, 100L, ts(0)), (2L, 0, 100L, ts(0)))
      query.processAllAvailable()
      assert(rows() == Set((0, 1L, 2L)))
      // hour 1: bucket 200 pairs docs 3,4; watermark advances to 0:50
      input.addData((3L, 0, 200L, ts(1)), (4L, 0, 200L, ts(1)))
      query.processAllAvailable()
      assert(rows() == Set((0, 1L, 2L), (0, 3L, 4L)))
      // hours 2-3: fresh buckets keep the watermark moving; buckets 100 then
      // 200 fall silent past it and their state is dropped
      input.addData((6L, 0, 300L, ts(2)))
      query.processAllAvailable()
      input.addData((7L, 0, 400L, ts(3)))
      query.processAllAvailable()
      // hour 4: doc 8 lands in bucket 100 — the bucket was dropped, so it
      // pairs with NOTHING (the documented bounded-recall trade; without the
      // TTL this would emit (1,8) and (2,8))
      input.addData((8L, 0, 100L, ts(4)))
      query.processAllAvailable()
      assert(rows() == Set((0, 1L, 2L), (0, 3L, 4L)))
      // state has plateaued at the in-window buckets, NOT the 4 distinct
      // buckets ever seen — the no-TTL fold would hold all of them forever
      val st = stateRows()
      assert(st >= 0 && st <= 3, s"state rows = $st")
    } finally query.stop()
  }

  test("simhash bands run through the shared TTL fold: pairs in-window, expiry after") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1600000000000L
    def ts(h: Double) = new java.sql.Timestamp(t0 + (h * 3600000L).toLong)
    // REAL simhash band keys, with the near-dup GUARANTEED by construction:
    // the base text repeats 20×, so every word's bit vote is ±20 and the
    // single appended token (±1) cannot flip any vote's sign — the near-copy
    // hashes identically and must share every band with the original
    val textA = Seq.fill(20)(
      "the quick brown fox jumps over the lazy dog in the morning sun")
      .mkString(" ")
    val bandsOf: Map[Long, Seq[(Int, Long)]] = Seq(
      1L -> textA, 2L -> textA, 3L -> (textA + " xtra"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.TextAnalysis.simHash64(col("text")).as("h"))
      .select(col("doc_id"),
        posexplode(array(
          col("h").bitwiseAND(lit(65535L)),
          shiftrightunsigned(col("h"), 16).bitwiseAND(lit(65535L)),
          shiftrightunsigned(col("h"), 32).bitwiseAND(lit(65535L)),
          shiftrightunsigned(col("h"), 48).bitwiseAND(lit(65535L))))
          .as(Seq("band_idx", "band_key")))
      .as[(Long, Int, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap
    val input = MemoryStream[(Long, Int, Long, java.sql.Timestamp)]
    val pairs = StreamingOps.lshCandidateStreamTtl(
      input.toDS().toDF("doc_id", "band_idx", "band_key", "ts"),
      maxBandSize = 100, delayThreshold = "1 hour")
    val query = pairs.writeStream.format("memory").queryName("simhash_ttl_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    def rows(): Set[(Int, Long, Long)] =
      spark.table("simhash_ttl_out").as[(Int, Long, Long)].collect().toSet
    try {
      // batch 1: doc 1's four bands arrive
      input.addData(bandsOf(1L).map { case (bi, bk) => (1L, bi, bk, ts(0)) }: _*)
      query.processAllAvailable()
      assert(rows().isEmpty)
      // batch 2 (in window): the exact copy pairs on all four bands, the
      // near-copy on at least one
      input.addData((bandsOf(2L).map { case (bi, bk) => (2L, bi, bk, ts(0.5)) } ++
        bandsOf(3L).map { case (bi, bk) => (3L, bi, bk, ts(0.5)) }): _*)
      query.processAllAvailable()
      val got = rows()
      assert(got.count { case (_, a, b) => a == 1L && b == 2L } == 4,
        s"exact copy must pair on all 4 bands: $got")
      assert(got.exists { case (_, a, b) => b == 3L },
        s"near-copy shares no band: $got")
      // advance the watermark far past the window; a re-arrival of doc 1's
      // bands pairs with NOTHING — the buckets were dropped
      input.addData((9L, 99, 999999L, ts(5.0)))
      query.processAllAvailable()
      input.addData((9L, 99, 999998L, ts(5.0)))
      query.processAllAvailable()
      val before = rows()
      input.addData(bandsOf(1L).map { case (bi, bk) => (7L, bi, bk, ts(4.5)) }: _*)
      query.processAllAvailable()
      assert(rows() == before, "expired simhash buckets still paired")
    } finally query.stop()
  }

  test("winnow fingerprints run through the TTL fold: in-window recall, expiry after") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1600000000000L
    def ts(h: Double) = new java.sql.Timestamp(t0 + (h * 3600000L).toLong)
    // REAL winnow fingerprints as band keys (the fold's third client): docs
    // 1 and 2 are exact copies (every fingerprint shared), doc 3 appends one
    // token (all but the tail-window fingerprints shared)
    val textA = "the quick brown fox jumps over the lazy dog in the morning " +
      "sun while the river runs quietly past the old stone mill"
    val fpOf: Map[Long, Seq[Long]] = Seq(1L -> textA, 2L -> textA,
        3L -> (textA + " xtra"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(graft.functions.TextAnalysis.winnowFingerprints(col("text")))
          .as("fp"))
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val nShared = fpOf(1L).toSet.intersect(fpOf(3L).toSet).size
    assert(fpOf(1L) == fpOf(2L) && nShared > 0, "fixture lost its planted overlap")
    val input = MemoryStream[(Long, Int, Long, java.sql.Timestamp)]
    val pairs = StreamingOps.lshCandidateStreamTtl(
      input.toDS().toDF("doc_id", "band_idx", "band_key", "ts"),
      maxBandSize = 100, delayThreshold = "1 hour")
    val query = pairs.writeStream.format("memory").queryName("winnow_ttl_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    // all winnow buckets share band_idx 0, so per-fingerprint pairs are
    // duplicate ROWS — the downstream shared-count aggregation depends on
    // their multiplicity, so count rows, never a Set
    def rows(): Seq[(Int, Long, Long)] =
      spark.table("winnow_ttl_out").as[(Int, Long, Long)].collect().toSeq
    def stateRows(): Long =
      Option(query.lastProgress).map(_.stateOperators.head.numRowsTotal).getOrElse(-1L)
    try {
      // batch 1: doc 1's fingerprints arrive alone — nothing to pair with
      input.addData(fpOf(1L).map(fp => (1L, 0, fp, ts(0))): _*)
      query.processAllAvailable()
      assert(rows().isEmpty)
      // batch 2 (in window): the exact copy pairs on EVERY fingerprint, the
      // near-copy on exactly the shared prefix fingerprints — in-window
      // recall is the batch fold's, undiminished by the TTL
      input.addData((fpOf(2L).map(fp => (2L, 0, fp, ts(0.5))) ++
        fpOf(3L).map(fp => (3L, 0, fp, ts(0.5)))): _*)
      query.processAllAvailable()
      val got = rows()
      assert(got.count { case (_, a, b) => a == 1L && b == 2L } == fpOf(1L).size,
        s"exact copy must pair on all ${fpOf(1L).size} fingerprints: $got")
      assert(got.count { case (_, a, b) => a < 3L && b == 3L } == 2 * nShared,
        s"near-copy must pair on the $nShared shared fingerprints with each twin")
      // unrelated traffic advances the watermark far past the window; the
      // fingerprint buckets fall silent and are DROPPED — state plateaus at
      // the in-window buckets instead of growing with corpus characters
      input.addData((9L, 99, 999999L, ts(5.0)))
      query.processAllAvailable()
      input.addData((9L, 99, 999998L, ts(5.0)))
      query.processAllAvailable()
      val before = rows()
      val st = stateRows()
      assert(st >= 0 && st <= 2, s"expired winnow buckets still held: $st rows")
      // a re-arrival of doc 1's full fingerprint set pairs with NOTHING —
      // the buckets were expired (the documented bounded-recall trade)
      input.addData(fpOf(1L).map(fp => (7L, 0, fp, ts(4.5))): _*)
      query.processAllAvailable()
      assert(rows().size == before.size, "expired winnow buckets still paired")
    } finally query.stop()
  }

  test("a late in-watermark row does not rewind a bucket's TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1600000000000L
    def ts(h: Double) = new java.sql.Timestamp(t0 + (h * 3600000L).toLong)
    val input = MemoryStream[(Long, Int, Long, java.sql.Timestamp)]
    val pairs = StreamingOps.lshCandidateStreamTtl(
      input.toDS().toDF("doc_id", "band_idx", "band_key", "ts"),
      maxBandSize = 100, delayThreshold = "1 hour")
    val query = pairs.writeStream.format("memory").queryName("lsh_ttl_rewind")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    def rows(): Set[(Int, Long, Long)] =
      spark.table("lsh_ttl_rewind").as[(Int, Long, Long)].collect().toSet
    try {
      // bucket 100's newest event is hour 2.0; watermark -> 1.0
      input.addData((1L, 0, 100L, ts(2.0)))
      query.processAllAvailable()
      // a LATE but in-watermark row (hour 1.5 > wm 1.0) joins the bucket.
      // The regression: setting the timeout from only THIS batch's max
      // (1.5) rewinds it below the bucket's true newest event (2.0)
      input.addData((2L, 0, 100L, ts(1.5)))
      query.processAllAvailable()
      assert(rows() == Set((0, 1L, 2L)))
      // unrelated traffic advances the watermark to 1.6 — past the rewound
      // 1.5 timeout but NOT past the bucket's true newest event 2.0; the
      // second empty-for-this-bucket batch is where a wrong timeout fires
      input.addData((6L, 1, 900L, ts(2.6)))
      query.processAllAvailable()
      input.addData((7L, 1, 901L, ts(2.6)))
      query.processAllAvailable()
      // hour 1.9 (> wm 1.6) arrives in bucket 100: the bucket must still
      // hold docs 1 and 2 — 'watermark passes the bucket's newest event'
      // has not happened yet
      input.addData((3L, 0, 100L, ts(1.9)))
      query.processAllAvailable()
      assert(rows() == Set((0, 1L, 2L), (0, 1L, 3L), (0, 2L, 3L)),
        "bucket state expired early — TTL was rewound by the late row")
    } finally query.stop()
  }

  test("winnowCandidateStream with REAL event time: in-window recall intact, " +
      "late out-of-watermark copies drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1600000000000L
    def ts(h: Double) = new java.sql.Timestamp(t0 + (h * 3600000L).toLong)
    val textA = "the quick brown fox jumps over the lazy dog in the morning " +
      "sun while the river runs quietly past the old stone mill"
    val textB = "completely different content about catalyst optimizer rules " +
      "and the tungsten execution engine powering whole stage codegen"
    val textC = "a third unrelated passage describing parquet column pruning " +
      "predicate pushdown and adaptive query execution at scale"
    // the production entry itself: (doc_id, text, ts) rows, fingerprints
    // computed in-stream, counts riding the fold payload
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val cands = StreamingOps.winnowCandidateStream(
      input.toDS().toDF("doc_id", "text", "ts"),
      maxBucket = 100, delayThreshold = "1 hour")
    val query = cands.writeStream.format("memory").queryName("winnow_evt_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    def verified(): Seq[(Long, Long)] =
      StreamingOps.winnowVerify(spark.table("winnow_evt_out"))
        .as[(Long, Long, Int)].collect().toSeq.map(r => (r._1, r._2)).sorted
    try {
      // hour 0: doc 1 arrives alone — nothing to pair with
      input.addData((1L, textA, ts(0)))
      query.processAllAvailable()
      assert(verified().isEmpty)
      // hour 0.5 (in window): an exact copy — the verified near-dup pair
      // comes out of the drained candidates alone (sizes off the payloads)
      input.addData((2L, textA, ts(0.5)))
      query.processAllAvailable()
      assert(verified() == Seq((1L, 2L)))
      // unrelated traffic advances the watermark far past hour 0; doc 1/2's
      // fingerprint buckets fall silent and expire
      input.addData((50L, textB, ts(5.0)))
      query.processAllAvailable()
      input.addData((51L, textC, ts(5.0)))
      query.processAllAvailable()
      // hour 4.2 — admitted (> watermark 4.0) but the textA buckets are
      // gone: a third exact copy pairs with NOTHING, the documented
      // bounded-recall trade that keeps state O(fingerprints in window)
      input.addData((3L, textA, ts(4.2)))
      query.processAllAvailable()
      assert(verified() == Seq((1L, 2L)),
        "expired buckets paired with a late out-of-watermark copy")
    } finally query.stop()
  }

  test("minhashCandidateStream with REAL event time: in-window recall intact, " +
      "late out-of-watermark copies drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1600000000000L
    def ts(h: Double) = new java.sql.Timestamp(t0 + (h * 3600000L).toLong)
    val textA = "the quick brown fox jumps over the lazy dog in the morning " +
      "sun while the river runs quietly past the old stone mill"
    val textB = "completely different content about catalyst optimizer rules " +
      "and the tungsten execution engine powering whole stage codegen"
    val textC = "a third unrelated passage describing parquet column pruning " +
      "predicate pushdown and adaptive query execution at scale"
    // the production entry itself: (doc_id, text, ts) rows, signature and
    // bands computed in-stream, ts riding to the shared TTL fold
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val cands = StreamingOps.minhashCandidateStream(
      input.toDS().toDF("doc_id", "text", "ts"),
      maxBandSize = 100, delayThreshold = "1 hour")
    val query = cands.writeStream.format("memory").queryName("minhash_evt_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    def pairs(): Set[(Long, Long)] =
      spark.table("minhash_evt_out").as[(Int, Long, Long)].collect()
        .map(r => (r._2, r._3)).toSet
    try {
      // hour 0: doc 1 arrives alone — nothing to pair with
      input.addData((1L, textA, ts(0)))
      query.processAllAvailable()
      assert(pairs().isEmpty)
      // hour 0.5 (in window): an exact copy shares the whole signature, so
      // it pairs in every band — the batch recall, undiminished by the TTL
      input.addData((2L, textA, ts(0.5)))
      query.processAllAvailable()
      assert(pairs() == Set((1L, 2L)))
      // unrelated traffic advances the watermark far past hour 0
      input.addData((50L, textB, ts(5.0)))
      query.processAllAvailable()
      input.addData((51L, textC, ts(5.0)))
      query.processAllAvailable()
      // hour 4.2 — admitted (> watermark 4.0) but textA's band buckets have
      // expired: a third exact copy pairs with NOTHING, the bounded-recall
      // trade that keeps state O(docs in window × bands)
      input.addData((3L, textA, ts(4.2)))
      query.processAllAvailable()
      assert(pairs() == Set((1L, 2L)),
        "expired minhash buckets paired with a late out-of-watermark copy")
    } finally query.stop()
  }

  test("simhashCandidateStream with REAL event time: in-window recall intact, " +
      "late out-of-watermark copies drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1600000000000L
    def ts(h: Double) = new java.sql.Timestamp(t0 + (h * 3600000L).toLong)
    val textA = "the quick brown fox jumps over the lazy dog in the morning " +
      "sun while the river runs quietly past the old stone mill"
    val textB = "completely different content about catalyst optimizer rules " +
      "and the tungsten execution engine powering whole stage codegen"
    val textC = "a third unrelated passage describing parquet column pruning " +
      "predicate pushdown and adaptive query execution at scale"
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val cands = StreamingOps.simhashCandidateStream(
      input.toDS().toDF("doc_id", "text", "ts"),
      maxBandSize = 100, delayThreshold = "1 hour")
    val query = cands.writeStream.format("memory").queryName("simhash_evt_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    def rows(): Seq[(Int, Long, Long)] =
      spark.table("simhash_evt_out").as[(Int, Long, Long)].collect().toSeq
    try {
      input.addData((1L, textA, ts(0)))
      query.processAllAvailable()
      assert(rows().isEmpty)
      // an identical text has the identical 64-bit SimHash: the in-window
      // copy pairs in all FOUR 16-bit bands
      input.addData((2L, textA, ts(0.5)))
      query.processAllAvailable()
      assert(rows().count { case (_, a, b) => a == 1L && b == 2L } == 4,
        s"exact copy must pair in all 4 simhash bands: ${rows()}")
      // watermark moves far past hour 0; the four band buckets expire
      input.addData((50L, textB, ts(5.0)))
      query.processAllAvailable()
      input.addData((51L, textC, ts(5.0)))
      query.processAllAvailable()
      val before = rows().size
      input.addData((3L, textA, ts(4.2)))
      query.processAllAvailable()
      assert(rows().size == before,
        "expired simhash buckets paired with a late out-of-watermark copy")
    } finally query.stop()
  }

  test("the NoTimeout sized fold equals the TTL sized fold under a constant " +
      "timestamp — the equivalence the bounded drain rides on") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ts = new java.sql.Timestamp(1600000000000L)
    // two batches of banded events, duplicate doc deliveries included
    val batch1 = Seq((1L, 10L, 0, 100L), (2L, 20L, 0, 100L), (3L, 30L, 1, 200L))
    val batch2 = Seq((3L, 30L, 0, 100L), (2L, 20L, 0, 100L), (4L, 40L, 1, 200L))
    def drain(ttl: Boolean): Seq[(Int, Long, Long, Long, Long)] = {
      val input = MemoryStream[(Long, Long, Int, Long, java.sql.Timestamp)]
      val bands = input.toDS()
        .toDF("doc_id", "payload", "band_idx", "band_key", "ts")
      val cands =
        if (ttl) StreamingOps.lshCandidateStreamTtlSized(bands, maxBandSize = 100)
        else StreamingOps.lshCandidateStreamSized(bands, maxBandSize = 100)
      val name = s"fold_equiv_${if (ttl) "ttl" else "plain"}"
      val q = cands.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
      try {
        input.addData(batch1.map { case (d, p, bi, bk) => (d, p, bi, bk, ts) }: _*)
        q.processAllAvailable()
        input.addData(batch2.map { case (d, p, bi, bk) => (d, p, bi, bk, ts) }: _*)
        q.processAllAvailable()
        spark.table(name).as[(Int, Long, Long, Long, Long)].collect().toSeq.sorted
      } finally q.stop()
    }
    val plain = drain(ttl = false)
    val withTtl = drain(ttl = true)
    assert(plain.nonEmpty && plain == withTtl,
      s"folds diverged:\nplain=$plain\nttl  =$withTtl")
  }

  test("an empty corpus drains to an EMPTY typed frame, not a crash " +
      "(zero-batch foreachBatch aggregation)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winnow-empty")
    try {
      val empty = dir.resolve("documents.parquet")
      Seq.empty[(Long, String)].toDF("doc_id", "text")
        .write.parquet(empty.toString)
      val out = StreamingOps.winnowNearDupAvailableNow(spark, empty.toString)
      assert(out.columns.toSeq == Seq("doc_a", "doc_b", "n_shared"))
      assert(out.count() == 0)
    } finally graft.FsUtil.deleteRecursively(dir)
  }

  test("a drain-local statePartitions override never leaks into the session") {
    import spark.implicits._
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val dir = java.nio.file.Files.createTempDirectory("chunk-conf")
    try {
      val docs = dir.resolve("documents.parquet")
      Seq((1L, "alpha beta. merge gamma delta.")).toDF("doc_id", "text")
        .write.parquet(docs.toString)
      StreamingOps.chunkBasicAvailableNow(spark, docs.toString,
        graft.operators.ChunkingOptions(maxCharacters = 120,
          includeOrigElements = false), splitBatches = 3).collect()
      assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
        "drain-scoped shuffle-partition override leaked")
    } finally graft.FsUtil.deleteRecursively(dir)
  }

  test("streaming pack carries the bucket offset across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // rows are (doc_id, n_tokens); bucket = doc_id % 4, ctx = 100
    val input = MemoryStream[(Long, Long)]
    val packed = StreamingOps.packSequencesStream(input.toDS(), buckets = 4,
      ctxLen = 100)
    val query = packed.writeStream.format("memory").queryName("pack_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    def rows(): Map[Long, (Long, Long, Long, Long, Boolean)] =
      spark.table("pack_out").as[(Long, Long, Long, Long, Long, Boolean)]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    try {
      // batch 1, bucket 0: docs 8 and 4 arrive out of order — folded sorted,
      // so 4 starts at 0 (60 tokens) and 8 at 60 (30 tokens)
      input.addData((8L, 30L), (4L, 60L))
      query.processAllAvailable()
      assert(rows()(4L) == ((0L, 60L, 0L, 0L, false)))
      assert(rows()(8L) == ((0L, 30L, 0L, 60L, false)))
      // batch 2: doc 12 continues the carried offset 90 and crosses into
      // example 1; doc 5 opens bucket 1 at offset 0
      input.addData((12L, 20L), (5L, 10L))
      query.processAllAvailable()
      assert(rows()(12L) == ((0L, 20L, 0L, 90L, true)))
      assert(rows()(5L) == ((1L, 10L, 0L, 0L, false)))
      // batch 3: the offset keeps running — doc 16 starts at 110 = example 1
      input.addData((16L, 5L))
      query.processAllAvailable()
      assert(rows()(16L) == ((0L, 5L, 1L, 10L, false)))
      // zero-token doc sitting exactly on a boundary never crosses
      input.addData((20L, 0L))
      query.processAllAvailable()
      assert(rows()(20L) == ((0L, 0L, 1L, 15L, false)))
    } finally query.stop()
  }

  test("streaming NB quality scoring equals the batch classifier exactly") {
    import org.apache.spark.sql.functions._
    val sfDocs = "/root/testdata/sf0.001/documents.parquet"
    val d = spark.read.parquet(sfDocs)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val batch = graft.functions.CorpusOps.nbQualityClassifier(d,
        d.filter(col("doc_id") % 11 === 5), d.filter(col("doc_id") % 11 === 7),
        col("text"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val streamed = StreamingOps.nbQualityAvailableNow(spark, sfDocs)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }
}
