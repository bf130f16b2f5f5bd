package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.model.Element
import graft.operators.{Chunker, ChunkingOptions}

/**
 * Structured-Streaming surface (SURVEY §2.12): the reference is batch-only but
 * stream-shaped (partitioners yield iterators, chunkers consume lazily,
 * `apply_lang_metadata` documents a "stream interface", `lang.py:518-519`). Here:
 *
 *  - file-arrival stream: `readStream.format("binaryFile")` → the same auto-router
 *    parse used in batch (stateless per file, embarrassingly parallel);
 *  - streaming chunking: `groupByKey(doc_id).flatMapGroupsWithState` buffering a
 *    document's elements until a processing-time timeout marks end-of-document,
 *    then running the identical per-doc fold (`Chunker.chunkDoc`) — batch and
 *    streaming share one kernel.
 *
 * State is bounded per in-flight document; completed docs are removed from the
 * store. At scale the timeout is the de-facto watermark for late element arrival.
 */
object StreamingOps {

  /** Streaming twin of `AutoSource.partitionFiles`: each new file under `path`
    * becomes element rows. `maxFilesPerTrigger` bounds per-batch work. */
  def partitionFileStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 100): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val binarySchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val files = spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    files.flatMap { case (p, content) =>
      val (ft, paras) = graft.sources.Partitioners.partitionAuto(p, content)
      paras.zipWithIndex.map { case (para, i) =>
        (p, ft.mimeType, i + 1L, para.elementType.getOrElse("UncategorizedText"),
          para.text, para.pageNumber)
      }
    }.toDF("doc_id", "filetype", "seq", "element_type", "text", "page_number")
  }

  /**
   * File-arrival ingestion into the filetype-partitioned element lake: each
   * micro-batch of new files under `watchPath` runs the SAME plan-visible
   * batch pipeline (`GraftPartitionDocs` + the declarative lift) inside
   * `foreachBatch`, then appends to [[graft.sinks.ElementLake]]. The batch
   * path is the single source of truth — streaming adds only arrival
   * tracking (checkpointed file log) and append semantics.
   *
   * Exactly-once note: the file-source checkpoint makes each file processed
   * once per committed batch; a crash between the lake append and the commit
   * can replay one batch (at-least-once into the lake). Dedup downstream by
   * `doc_id` (the path) is the standard corrective at scale.
   */
  def ingestToLake(spark: SparkSession, watchPath: String, lakePath: String,
      checkpoint: String, maxFilesPerTrigger: Int = 100,
      trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.types._
    val binarySchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val files = spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(watchPath)
      .select(col("path"), col("content"))
    files.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val parsed = org.apache.spark.sql.graft.PartitionPlan.partitionDocs(batch.toDF())
        graft.sinks.ElementLake.append(
          org.apache.spark.sql.graft.PartitionPlan.toElements(parsed), lakePath)
      }
      .start()
  }

  private val sinkSeq = new AtomicInteger(0)

  /**
   * The one AvailableNow drain harness every `*AvailableNow` entry shares:
   * expose the single source file through a staging directory
   * (FileStreamSource wants a directory; a real deployment streams an
   * arrival directory anyway), run `build(streamDir)` into a memory sink,
   * and wait BOUNDED — an unbounded `awaitTermination` turned a contended
   * environment into a hang (r7 bench rc=124). On expiry the query stops
   * and the sink keeps whatever committed: the caller gets a table instead
   * of a dead JVM (a partial drain is detectable as a row-count mismatch by
   * the oracle compare, which is exactly where these surfaces are consumed).
   * The staging dir is an input artifact only and is always cleaned up.
   */
  private def drainAvailableNow(spark: SparkSession, srcPath: String,
      prefix: String, outputMode: String,
      statePartitions: Option[Int] = None)(
      build: String => DataFrame): DataFrame = {
    val fileName = java.nio.file.Path.of(srcPath).getFileName.toString
    val streamDir = java.nio.file.Files.createTempDirectory(s"graft-stream-$prefix")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve(fileName), java.nio.file.Path.of(srcPath))
    try drainDir(spark, prefix, outputMode, statePartitions)(build(streamDir.toString))
    finally {
      try {
        java.nio.file.Files.deleteIfExists(streamDir.resolve(fileName))
        java.nio.file.Files.deleteIfExists(streamDir)
      } catch { case _: Throwable => () }
    }
  }

  /**
   * [[drainAvailableNow]] for HIGH-VOLUME intermediate streams: instead of a
   * memory sink materializing every event on the driver (the winnow drain
   * emits ~3.7M candidate events at sf0.1 — collecting them single-threaded
   * was the query's wall-clock, measured via SPARK_GRAFT_STREAM_DEBUG), each
   * micro-batch is REDUCED distributed by `agg` inside `foreachBatch` and
   * only the aggregated partial (shared counts per pair here — a few
   * thousand rows) is collected. The caller re-combines partials, so the
   * result is batch-count independent. At 100 TB this is the only shape
   * that works at all: the full candidate event set never exists in one
   * place.
   */
  private def drainAvailableNowAgg(spark: SparkSession, srcPath: String,
      prefix: String, statePartitions: Option[Int] = None)(
      build: String => DataFrame)(
      agg: DataFrame => DataFrame): DataFrame = {
    val fileName = java.nio.file.Path.of(srcPath).getFileName.toString
    val streamDir = java.nio.file.Files.createTempDirectory(s"graft-stream-$prefix")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve(fileName), java.nio.file.Path.of(srcPath))
    // same caller-sized state-store count as [[drainDir]]: a bounded drain's
    // fixed per-store load/commit cost dominates megabyte-scale state, a
    // 100 TB deployment wants many stores — restore only after the drain
    // (the conf is captured into the stream's OffsetSeqMetadata at batch 0)
    val prev = statePartitions.map { n =>
      val p = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      p
    }
    try {
      val t0 = System.nanoTime()
      def mark(what: String): Unit =
        if (sys.env.contains("SPARK_GRAFT_STREAM_DEBUG"))
          System.err.println(f"[stream-debug] $what at ${(System.nanoTime() - t0) / 1e9}%.2fs")
      val stream = build(streamDir.toString)
      mark("built")
      // the partial schema, computed eagerly on an empty frame of the
      // stream's shape so a zero-batch drain still returns a typed frame
      val schema = agg(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), stream.schema)).schema
      mark("schema")
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
      val q = stream.writeStream
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
          agg(batch).collect().foreach(buf.add)
        }
        .trigger(Trigger.AvailableNow()).start()
      mark("started")
      val timeoutMs = sys.env.get("SPARK_GRAFT_STREAM_TIMEOUT_MS")
        .flatMap(s => scala.util.Try(s.trim.toLong).toOption).getOrElse(120000L)
      if (!q.awaitTermination(timeoutMs)) q.stop()
      mark(s"drained (${buf.size} partial rows)")
      if (sys.env.contains("SPARK_GRAFT_STREAM_DEBUG"))
        q.recentProgress.foreach(p => System.err.println(s"[stream-debug] ${p.json}"))
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          java.util.List.copyOf(buf)), schema)
    } finally {
      prev.foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
      try {
        java.nio.file.Files.deleteIfExists(streamDir.resolve(fileName))
        java.nio.file.Files.deleteIfExists(streamDir)
      } catch { case _: Throwable => () }
    }
  }

  /** Start-drain-and-collect for an already-built streaming DataFrame: memory
    * sink, AvailableNow, bounded wait (see [[drainAvailableNow]]'s rationale). */
  private def drainDir(spark: SparkSession, prefix: String, outputMode: String,
      statePartitions: Option[Int] = None)(
      df: DataFrame): DataFrame = {
    val name = s"graft_stream_${prefix}_${sinkSeq.incrementAndGet()}"
    // a stateful operator's partition count is fixed at stream start from
    // spark.sql.shuffle.partitions, and EVERY micro-batch pays a fixed
    // per-partition state-store load/commit cost (measured ~0.4 s each on
    // HDFS-backed stores) — a small bounded drain with kilobytes of state
    // wants FEW stores, a 100 TB deployment many; let the caller size it
    val prev = statePartitions.map { n =>
      val p = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      p
    }
    // the conf is captured into the stream's OffsetSeqMetadata at its FIRST
    // batch, which runs async after start() — restore only after the drain
    try {
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(outputMode).trigger(Trigger.AvailableNow()).start()
      val timeoutMs = sys.env.get("SPARK_GRAFT_STREAM_TIMEOUT_MS")
        .flatMap(s => scala.util.Try(s.trim.toLong).toOption).getOrElse(120000L)
      if (!q.awaitTermination(timeoutMs)) q.stop()
      // SPARK_GRAFT_STREAM_DEBUG=1 dumps per-micro-batch progress (durationMs
      // split, state rows) — how drain costs get attributed when iterating
      if (sys.env.contains("SPARK_GRAFT_STREAM_DEBUG"))
        q.recentProgress.foreach(p => System.err.println(s"[stream-debug] ${p.json}"))
      spark.table(name)
    } finally prev.foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
  }

  /**
   * Tumbling event-time window aggregation run THROUGH the streaming engine:
   * `readStream` over the parquet → `window(ts, 1 hour)` groupBy → memory sink,
   * `Trigger.AvailableNow` draining the backlog to completion so the result is
   * deterministic and comparable to the batch oracle. Complete output mode keeps
   * one state row per (window, event_type) — O(distinct windows), not O(events),
   * so the state store stays small at any data scale; a production job would
   * swap the memory sink (driver-sized result, verification-only) for a real
   * sink and optionally Append+watermark for eviction.
   */
  def hourlyWindowAvailableNow(spark: SparkSession, eventsPath: String): DataFrame = {
    graft.Tables.configure(spark) // legacy events.parquet carries TIMESTAMP(NANOS) — read as long
    val schema = spark.read.parquet(eventsPath).schema
    drainAvailableNow(spark, eventsPath, "hourly", "complete",
        statePartitions = Some(8)) { streamDir =>
      graft.Tables.normalizeTs(
        spark.readStream.schema(schema).parquet(streamDir))
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
        .select(col("window.start").as("hour"), col("event_type"),
          col("n_events"), col("sum_value"))
    }
  }

  /**
   * The update-mode streaming exact-dedup fold over (doc_id long, fp long)
   * rows — exposed separately so any fingerprint stream (MemoryStream in
   * specs, Kafka in a real ingest) composes with it. Keyed by fingerprint;
   * state is one (count, min doc_id) pair per DISTINCT fingerprint — the
   * same O(uniques) bound a production `dropDuplicates`-with-watermark
   * pipeline carries, and irreducible for exact dedup. Each micro-batch
   * emits a row ONLY for the fingerprints that batch actually touched
   * (flatMapGroupsWithState invokes untouched groups never, absent a
   * timeout), so per-batch emission is O(batch keys) — a long-lived stream
   * never re-emits its whole unique set the way the previous complete-mode
   * `groupBy(fp)` did every micro-batch. min(doc_id) keeps the winner
   * order-independent, so the result is identical however file splits race.
   */
  def exactDedupStream(rows: DataFrame): DataFrame = {
    val sp = rows.sparkSession
    import sp.implicits._
    rows.select(col("fp").cast("long").as("fp"),
        col("doc_id").cast("long").as("doc_id"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (fp: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
          var (n, first) = state.getOption.getOrElse((0L, Long.MaxValue))
          rows.foreach { case (_, id) =>
            n += 1
            if (id < first) first = id
          }
          state.update((n, first))
          Iterator.single((fp, n, first))
      }
      .toDF("fp", "n_docs", "first_doc")
  }

  /**
   * Streaming exact deduplication: `readStream` over the corpus → content
   * fingerprint → the update-mode [[exactDedupStream]] fold, drained with
   * `Trigger.AvailableNow` into a memory sink. Every third document is
   * re-emitted under a shifted id so duplicate groups exist deterministically
   * (mirrored in the batch oracle). The memory sink APPENDS update-mode rows
   * rather than upserting, so the drain result is compacted to the newest
   * emission per fingerprint (strictly-growing n_docs orders emissions) —
   * exactly the last-write-wins merge a real update-mode sink (key-value
   * store, Delta MERGE) performs on write.
   */
  def exactDedupAvailableNow(spark: SparkSession, documentsPath: String): DataFrame = {
    import spark.implicits._
    graft.Tables.configure(spark)
    val schema = spark.read.parquet(documentsPath).schema
    val drained = drainAvailableNow(spark, documentsPath, "dedup", "update",
      statePartitions = Some(8)) { streamDir =>
      val fps = spark.readStream.schema(schema).parquet(streamDir)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          if (id % 3 == 0) Seq((id, text), (id + 1000000L, text))
          else Seq((id, text))
        }.toDF("doc_id", "text")
        .select(col("doc_id"),
          graft.functions.TextAnalysis.docFingerprint(col("text")).as("fp"))
      exactDedupStream(fps)
    }
    drained.groupBy("fp")
      .agg(max(struct(col("n_docs"), col("first_doc"))).as("latest"))
      .select(col("fp"), col("latest.n_docs").as("n_docs"),
        col("latest.first_doc").as("first_doc"))
  }

  /**
   * The per-doc decontamination fold over a (doc_id, gram) stream — the
   * append-mode core of [[decontaminateAvailableNow]], exposed separately so
   * any gram stream (MemoryStream in specs, Kafka in a real ingest) composes
   * with it. `grams` has columns (doc_id long, g string); a NULL `g` is the
   * end-of-document marker (the same control-row idea as [[EndOfDocument]] in
   * the chunk fold — a doc's gram set is final once its source row is fully
   * exploded, and the explode emits the marker alongside the grams).
   *
   * Gram rows left-join the broadcast static `benchGrams` (cols g, hit) —
   * map-side, no shuffle for the join — then a keyed fold accumulates each
   * doc's hit count and emits its single output row ONLY when the marker
   * arrives, removing the state. Per-batch emission is O(docs finalized this
   * batch) and state is O(open docs) — never O(all docs ever), unlike a
   * complete-mode groupBy, which re-emits the whole accumulated result every
   * micro-batch and holds one state row per doc for the stream's life.
   */
  def decontaminateStream(grams: DataFrame, benchGrams: DataFrame): DataFrame = {
    val sp = grams.sparkSession
    import sp.implicits._
    grams.join(broadcast(benchGrams), Seq("g"), "left")
      .select(col("doc_id").cast("long").as("doc_id"),
        col("g").isNull.as("marker"),
        coalesce(col("hit"), lit(0)).cast("long").as("hit"))
      .as[(Long, Boolean, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Int, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (doc: Long, rows: Iterator[(Long, Boolean, Long)], state: GroupState[Long]) =>
          var hits = state.getOption.getOrElse(0L)
          var finalized = false
          rows.foreach { case (_, marker, h) =>
            hits += h // marker rows join nothing, so their hit is always 0
            if (marker) finalized = true
          }
          if (finalized) {
            state.remove()
            Iterator.single((doc, hits.toInt, hits > 0))
          } else {
            state.update(hits)
            Iterator.empty
          }
      }
      .toDF("doc_id", "n_contaminated_grams", "contaminated")
  }

  /**
   * Streaming benchmark decontamination — the stream-STATIC join rendering of
   * `CorpusOps.decontaminate`: the benchmark gram set is a STATIC frame (eval
   * sets are small and fixed while the corpus streams past), broadcast into
   * every micro-batch; arriving docs explode their distinct n-grams plus one
   * NULL end-of-document marker (a doc's grams are atomic with its source
   * row, so the marker legitimately rides the same explode), and the
   * append-mode [[decontaminateStream]] fold finalizes each doc exactly once.
   * At 100 TB both axes are bounded: the join side stays broadcast, state is
   * O(in-flight docs), and a long-lived stream never re-emits or re-holds the
   * corpus. Verified by the BATCH decontamination oracle.
   */
  def decontaminateAvailableNow(spark: SparkSession, documentsPath: String,
      n: Int = 5): DataFrame = {
    import graft.functions.TextAnalysis
    graft.Tables.configure(spark)
    val schema = spark.read.parquet(documentsPath).schema
    val docsStatic = spark.read.parquet(documentsPath)
    val bench = docsStatic.filter(col("doc_id") % 11 === 3)
      .select(array_join(
        slice(TextAnalysis.words(col("text")), 3, 8), " ").as("text"))
    val benchGrams = bench.select(explode(array_distinct(
        TextAnalysis.wordShingles(lower(col("text")), n))).as("g"))
      .distinct().withColumn("hit", lit(1))
    drainAvailableNow(spark, documentsPath, "decon", "append") { streamDir =>
      val stream = spark.readStream.schema(schema).parquet(streamDir)
      val grams = stream.select(col("doc_id").cast("long").as("doc_id"),
        explode(concat(array(lit(null).cast("string")),
          array_distinct(TextAnalysis.wordShingles(lower(col("text")), n))))
          .as("g"))
      decontaminateStream(grams, benchGrams)
    }.orderBy("doc_id")
  }

  /**
   * Streaming twin of [[graft.functions.CorpusOps.incrementalDedup]] — the
   * live-ingest rendering of crawl-over-crawl dedup: the PRIOR snapshot is
   * static, the delta streams past. The broadcast Bloom bitset probes every
   * arriving row map-side; bloom-cleared rows (definitely new — no false
   * negatives) pass with NO join, and bloom hits confirm against the static
   * fingerprint frame via a stream-static left join + null filter (the
   * anti-join rendering streaming supports). Per-batch work is O(batch) and
   * state is ZERO — the op needs no store at all, so it runs forever at any
   * scale. Same corpus derivation as the batch `q_incremental_dedup`, so the
   * SAME oracle verifies both.
   */
  def incrementalDedupAvailableNow(spark: SparkSession,
      documentsPath: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TextAnalysis
    graft.Tables.configure(spark)
    val schema = spark.read.parquet(documentsPath).schema
    val history = spark.read.parquet(documentsPath)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .filter(col("doc_id") % 2 === 0)
    // persist the static side: the stream-static join re-evaluates it every
    // micro-batch, and re-scanning + re-distincting the history each batch
    // would make per-batch work O(history), not O(batch)
    val histFps = history
      .select(TextAnalysis.docFingerprint(col("text")).as("fp")).distinct()
      .withColumn("hit", lit(1))
      .persist()
    val bloom = histFps.stat.bloomFilter("fp", 1L << 20, 0.01)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((fp: Long) => bloomBc.value.mightContainLong(fp))
    try drainAvailableNow(spark, documentsPath, "incdedup", "append") { streamDir =>
      val delta = spark.readStream.schema(schema).parquet(streamDir)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          // the batch query's delta: odd docs + re-crawled copies of every
          // 6th (even) doc under shifted ids
          val odd = if (id % 2 == 1) Seq((id, text)) else Nil
          val recrawl = if (id % 2 == 0 && id % 6 == 0)
            Seq((id + 500000L, text)) else Nil
          odd ++ recrawl
        }.toDF("doc_id", "text")
      val tagged = delta
        .withColumn("fp", TextAnalysis.docFingerprint(col("text")))
        // NULL text → NULL fp → new (see CorpusOps.incrementalDedup)
        .withColumn("maybe_dup", coalesce(mightContain(col("fp")), lit(false)))
      val cleared = tagged.filter(!col("maybe_dup"))
        .select(col("doc_id"), col("fp"))
      val confirmed = tagged.filter(col("maybe_dup"))
        .join(broadcast(histFps), Seq("fp"), "left")
        .filter(col("hit").isNull)
        .select(col("doc_id"), col("fp"))
      cleared.unionByName(confirmed)
    }.orderBy("doc_id")
    finally histFps.unpersist()
  }

  /**
   * Streaming twin of [[graft.functions.CorpusOps.nbQualityClassifier]] —
   * live quality scoring of an arriving corpus. The classifier trains
   * BATCH-side (the model is a snapshot artifact), then collapses to a
   * `buckets`-wide llr ARRAY LITERAL baked into the scoring expression:
   * each micro-batch scores every doc as one pure codegen'd per-row column —
   * zero keyed state, zero stream-side join, append mode, so the op runs
   * forever at any scale and per-batch work is O(batch). Collecting the
   * model is O(buckets) by the hashing-trick bound — the same artifact
   * discipline as [[incrementalDedupAvailableNow]]'s Bloom bitset.
   * Constant-folding turns the array literal into one shared ArrayData, not
   * a per-row allocation. The batch oracle verifies the streamed result.
   */
  def nbQualityAvailableNow(spark: SparkSession, documentsPath: String,
      buckets: Int = 1024): DataFrame = {
    import graft.functions.{CorpusOps, TextAnalysis}
    graft.Tables.configure(spark)
    val schema = spark.read.parquet(documentsPath).schema
    val d = spark.read.parquet(documentsPath)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val (modelDf, llr0) = CorpusOps.nbModel(
      d.filter(col("doc_id") % 11 === 5), d.filter(col("doc_id") % 11 === 7),
      col("text"), buckets)
    val llrByBucket = Array.fill(buckets)(llr0)
    modelDf.collect().foreach(r => llrByBucket(r.getLong(0).toInt) = r.getLong(1))
    val llrArr = array(llrByBucket.toSeq.map(lit(_)): _*)
    drainAvailableNow(spark, documentsPath, "nbquality", "append") { dir =>
      val ws = TextAnalysis.words(lower(col("text")))
      val perTok = transform(ws, w =>
        element_at(llrArr, (TextAnalysis.polyHash(w) % buckets).cast("int") + 1))
      spark.readStream.schema(schema).parquet(dir)
        .select(col("doc_id").cast("long").as("doc_id"),
          coalesce(size(ws), lit(0)).cast("long").as("n_tokens"),
          coalesce(aggregate(perTok, lit(0L), (a, v) => a + v), lit(0L))
            .as("llr_micro_sum"))
        .withColumn("quality",
          when(col("n_tokens") === 0L, lit("unscored"))
            .when(col("llr_micro_sum") >= 0L, lit("hi"))
            .otherwise(lit("lo")))
    }.orderBy("doc_id")
  }

  /**
   * Streaming twin of [[graft.functions.CorpusOps.incrementalNearDup]] — the
   * live-crawl rendering: the PRIOR snapshot's hot-band-capped MinHash band
   * index and shingle sets are STATIC frames (computed once per snapshot,
   * persisted so per-batch work is O(batch), not O(history)); arriving delta
   * docs band their signatures and equi-join the index on
   * `(band_idx, band_key)` — never delta×history — carrying their own
   * shingle set through the join so the exact Jaccard verify needs no second
   * stream pass. State is ZERO: both joins are stream-static, so the op runs
   * forever at any scale. Per-pair candidates may emit once per shared band;
   * the drain-side distinct + best-match window (batch ops over the small
   * verified set) reduce them, so the SAME oracle verifies batch and stream.
   */
  def incrementalNearDupAvailableNow(spark: SparkSession,
      documentsPath: String, maxBandSize: Int = 1000,
      threshold: Double = 0.8): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextAnalysis
    graft.Tables.configure(spark)
    val schema = spark.read.parquet(documentsPath).schema
    val history = spark.read.parquet(documentsPath)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .filter(col("doc_id") % 2 === 0)
    // ONE history pass: the shingle sets are the persisted base and the band
    // index derives from them (the signature over the deduplicated set is
    // bit-identical — per-hash MIN is duplicate-invariant), so history text
    // is scanned and shingled once, not once per static frame
    val histSh = history.select(col("doc_id").as("hist_doc"),
        array_distinct(TextAnalysis.wordShingles(col("text"), 3)).as("hsh"))
      .persist()
    val histBands = histSh.select(col("hist_doc"),
        posexplode(TextAnalysis.lshBands(
          TextAnalysis.minHashOfShingles(col("hsh"), k = 8),
          rows = 2)).as(Seq("band_idx", "band_key")))
      .withColumn("bc", count(lit(1)).over(
        Window.partitionBy("band_idx", "band_key")))
      .filter(col("bc") <= maxBandSize).drop("bc")
      .persist()
    try {
      val drained = drainAvailableNow(spark, documentsPath, "incneardup",
        "append") { streamDir =>
        val delta = spark.readStream.schema(schema).parquet(streamDir)
          .select(col("doc_id").cast("long").as("doc_id"), col("text"))
          .as[(Long, String)]
          .flatMap { case (id, text) =>
            // the batch query's delta: odd docs + drifted re-crawls of every
            // 10th (even) doc under shifted ids
            val odd = if (id % 2 == 1) Seq((id, text)) else Nil
            val drift = if (id % 2 == 0 && id % 10 == 0)
              Seq((id + 700000L, text + " xtra")) else Nil
            odd ++ drift
          }.toDF("doc_id", "text")
        // one shingling per delta row: the shingle set and the band keys both
        // derive from a single letCol-bound wordShingles (the former separate
        // dsh + signature columns shingled every row twice); (band_key, dsh)
        // pairs are packed per element and posexploded DIRECTLY — position =
        // band_idx — so no projected alias invites the inferred-filter
        // duplication documented in the verify notes
        val banded = delta.select(col("doc_id"),
          posexplode(TextAnalysis.letCol(
              array_distinct(TextAnalysis.wordShingles(col("text"), 3))) {
            dsh =>
              transform(
                TextAnalysis.lshBands(
                  TextAnalysis.minHashOfShingles(dsh, k = 8), rows = 2),
                bk => struct(bk.as("band_key"), dsh.as("dsh")))
          }).as(Seq("band_idx", "e")))
          .select(col("doc_id"), col("e.dsh").as("dsh"),
            col("band_idx"), col("e.band_key").as("band_key"))
        banded.join(histBands, Seq("band_idx", "band_key"))
          .join(histSh, Seq("hist_doc"))
          .select(col("doc_id"), col("hist_doc"),
            round(size(array_intersect(col("dsh"), col("hsh"))).cast("double") /
              size(array_union(col("dsh"), col("hsh"))).cast("double"), 4)
              .as("jaccard"))
          .filter(col("jaccard") >= threshold)
      }
      drained.distinct()
        .withColumn("rk", row_number().over(Window.partitionBy("doc_id")
          .orderBy(col("jaccard").desc, col("hist_doc"))))
        .filter(col("rk") === 1).drop("rk")
        .orderBy("doc_id", "hist_doc")
    } finally { histBands.unpersist(); histSh.unpersist() }
  }

  /** Control-marker element type: a row of this type signals end-of-document
    * to the streaming chunk fold, flushing the group's open tail in-batch —
    * the deterministic alternative to wall-clock timeouts when the source can
    * mark document completion (e.g. a connector that knows file boundaries). */
  val EndOfDocument = "__end_of_document__"

  /**
   * Streaming chunk_elements over the corpus, drained with AvailableNow: the
   * same element derivation as the batch q_chunk_basic pipeline (paragraph
   * split → classifier cascade → 100-char truncation), folded per doc through
   * [[Chunker.chunkDocIncremental]] with O(window) state, flushed by
   * [[EndOfDocument]] markers derived from the same source. Because the fold
   * is exactly the batch fold (ChunkerSpec pins the equivalence), the batch
   * chunk oracle verifies the streaming result.
   *
   * `splitBatches > 1` exercises the fold AT DEPTH: the derived element
   * stream is staged as that many parquet slices — per-doc CONTIGUOUS seq
   * ranges (ntile over seq), so reading order is preserved across batches —
   * with strictly increasing modification times, and the drain runs with
   * `maxFilesPerTrigger = 1`. Every document's elements then span
   * `splitBatches` micro-batches, driving the carry/nextSeq/overlap state
   * across real batch boundaries (markers ride in the last slice). The
   * result is byte-identical to the batch fold, so the SAME oracle applies.
   */
  def chunkBasicAvailableNow(spark: SparkSession, documentsPath: String,
      opts: ChunkingOptions, splitBatches: Int = 1): DataFrame = {
    import spark.implicits._
    graft.Tables.configure(spark)
    val schema = spark.read.parquet(documentsPath).schema
    def derive(docs: DataFrame): DataFrame = {
      val paras = docs.select(col("doc_id"),
        org.apache.spark.sql.functions.replace(
          col("text"), lit(" merge "), lit("\n\n")).as("text"))
      graft.sources.TextSource.partitionText(paras, col("text"))
        .select(col("doc_id").cast("string").as("doc_id"), col("seq"),
          col("element_type"),
          org.apache.spark.sql.functions.substring(col("text"), 1, 100).as("text"))
    }
    // the staging derive: same element rows as `derive` plus the per-doc
    // element count the parser emits for free — which turns the slice
    // assignment below into a pure projection
    def deriveCounted(docs: DataFrame): DataFrame = {
      val paras = docs.select(col("doc_id"),
        org.apache.spark.sql.functions.replace(
          col("text"), lit(" merge "), lit("\n\n")).as("text"))
      graft.sources.TextSource.partitionTextCounted(paras, col("text"))
        .select(col("doc_id").cast("string").as("doc_id"), col("seq"),
          col("element_type"),
          org.apache.spark.sql.functions.substring(col("text"), 1, 100).as("text"),
          col("n_elements"))
    }
    def toElements(df: DataFrame): Dataset[Element] =
      df.as[(String, Long, String, String)]
        .map { case (d, q, tpe, t) => Element("", tpe, t, d, q) }
    val result =
      if (splitBatches <= 1)
        drainAvailableNow(spark, documentsPath, "chunk", "append",
          statePartitions = Some(8)) { streamDir =>
          val docsStream = spark.readStream.schema(schema).parquet(streamDir)
          val markers = docsStream
            .select(col("doc_id").cast("string")).as[String]
            .map(d => Element("", EndOfDocument, "", d, Long.MaxValue))
          chunkStream(toElements(derive(docsStream)).union(markers), opts,
            useTimeout = false)
            .select(col("doc_id").cast("long").as("doc_id"),
              col("seq").as("chunk_seq"), col("text"))
        }
      else {
        val docs = spark.read.parquet(documentsPath)
        // closed-form ntile: `seq` is dense 1..n per doc and n rides every
        // row, so the tile is pure arithmetic — the former
        // `ntile(k) over (partition by doc_id order by seq)` paid a full
        // exchange + sort of the element stream for the same assignment
        val sliced = deriveCounted(docs)
          .withColumn("slice",
            sliceOfSeq(col("seq"), col("n_elements"), splitBatches))
          .drop("n_elements")
        val markers = docs.select(col("doc_id").cast("string").as("doc_id"),
          lit(Long.MaxValue).as("seq"), lit(EndOfDocument).as("element_type"),
          lit("").as("text"), lit(splitBatches).as("slice"))
        val streamDir =
          java.nio.file.Files.createTempDirectory("graft-stream-chunkmb")
        try {
          stageSlices(sliced.unionByName(markers), splitBatches, streamDir)
          val elSchema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("seq",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("element_type",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType)))
          val els = toElements(spark.readStream.schema(elSchema)
            .option("maxFilesPerTrigger", 1).parquet(streamDir.toString))
          // kilobytes of chunk-fold state over 3 micro-batches: few stores
          // amortize the fixed per-store commit far better than 32 — the
          // r17 curve (same-methodology quiet minima) is 8→6.23 s,
          // 4→5.32 s, 2→5.74 s: 4 balances commit count against fold
          // parallelism
          drainDir(spark, "chunkmb", "append", statePartitions = Some(4))(
            chunkStream(els, opts, useTimeout = false)
              .select(col("doc_id").cast("long").as("doc_id"),
                col("seq").as("chunk_seq"), col("text")))
        } finally deleteRecursively(streamDir)
      }
    result.orderBy("doc_id", "chunk_seq")
  }

  /**
   * SQL `NTILE(k) OVER (PARTITION BY doc ORDER BY seq)` as a closed form
   * over a dense 1-based `seq` and the group's row count `n`: k buckets,
   * sizes differing by at most one, larger buckets first — bucket sizes are
   * `q+1` for the first `r = n mod k` tiles and `q = n div k` after. Byte-
   * identical to the window function it replaces, at zero shuffles.
   */
  private[graft] def sliceOfSeq(seq: Column, n: Column, k: Int): Column = {
    val kL = lit(k.toLong)
    val j = seq - 1 // 0-based row index within the doc
    val r = pmod(n, kL)
    val q = ((n - r) / kL).cast("long") // exact: k divides (n - n mod k)
    val cut = r * (q + 1)
    // j < cut covers ALL rows whenever q == 0 (n < k), so the `otherwise`
    // divisor is guarded only to keep ANSI-mode codegen total
    (when(j < cut, floor(j / (q + 1)))
      .otherwise(r + floor((j - cut) / greatest(q, lit(1L)))) + 1).cast("int")
  }

  /** Write each `slice` value of `df` (cols doc_id, seq, element_type, text,
    * slice) as ONE parquet file `sliceNNN.parquet` in `dir`, modification
    * times strictly increasing in slice order — FileStreamSource processes
    * pending files oldest-first, so `maxFilesPerTrigger = 1` yields one
    * micro-batch per slice, in slice order. One job: `partitionBy(slice)`
    * over a slice-repartitioned frame derives the elements once and writes
    * one part file per slice directory, then the files are lifted out. */
  private def stageSlices(df: DataFrame, splitBatches: Int,
      dir: java.nio.file.Path): Unit = {
    val base = System.currentTimeMillis() - (splitBatches + 2) * 60000L
    val tmp = dir.resolve("_tmp")
    df.repartition(col("slice"))
      .write.partitionBy("slice").parquet(tmp.toString)
    (1 to splitBatches).foreach { s =>
      val sliceDir = tmp.resolve(s"slice=$s")
      val target = dir.resolve(f"slice$s%03d.parquet")
      if (java.nio.file.Files.isDirectory(sliceDir)) {
        val parts = java.nio.file.Files.list(sliceDir)
        try {
          val it = parts.iterator()
          var merged: Option[java.nio.file.Path] = None
          while (it.hasNext) {
            val p = it.next()
            val n = p.getFileName.toString
            if (n.startsWith("part-") && n.endsWith(".parquet")) {
              // repartition(col("slice")) hashes each slice to one partition,
              // so exactly one part file lands per directory
              require(merged.isEmpty, s"multiple part files in $sliceDir")
              java.nio.file.Files.move(p, target)
              merged = Some(target)
            }
          }
          require(merged.isDefined, s"no part file for slice $s")
        } finally parts.close()
        target.toFile.setLastModified(base + s * 60000L)
      }
    }
    deleteRecursively(tmp)
  }

  private[streaming] def deleteRecursivelyForTest(p: java.nio.file.Path): Unit =
    deleteRecursively(p)

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    graft.FsUtil.deleteRecursively(p)

  /** Resume state for the incremental streaming chunk fold: the still-open trailing
    * pre-chunk's elements (O(window), never the whole document), the next chunk seq,
    * and the inter-chunk overlap prefix. `closed` marks a document whose
    * EndOfDocument marker already arrived — a tombstone kept so elements that
    * land in a LATER micro-batch (multi-part files under maxFilesPerTrigger)
    * continue at `nextSeq` instead of re-opening the doc at chunk seq 0. */
  final case class ChunkStreamState(
      carry: Vector[Element], nextSeq: Long, overlapPrefix: String,
      closed: Boolean = false)

  /**
   * Streaming `chunk_elements`/`chunk_by_title`: each micro-batch folds the carried
   * open pre-chunk plus the newly-arrived elements through
   * [[Chunker.chunkDocIncremental]], emitting every closed pre-chunk's chunks
   * immediately and keeping only the open tail in group state — state is bounded by
   * the chunking window, independent of document length. A processing-time timeout
   * of `docTimeoutMs` without new elements marks end-of-document and flushes the
   * tail. Elements are folded in (arrival-batch, seq) order: each batch is sorted
   * by seq, matching a source that emits documents in reading order.
   */
  def chunkStream(els: Dataset[Element], opts: ChunkingOptions,
      docTimeoutMs: Long = 10000L,
      useTimeout: Boolean = true): Dataset[Element] = {
    val sp = els.sparkSession
    import sp.implicits._
    // ProcessingTimeTimeout keeps the engine scheduling wall-clock check
    // batches forever — a drain that relies on EndOfDocument markers runs
    // with NoTimeout so AvailableNow can actually terminate
    val timeoutConf =
      if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    els.groupByKey(_.doc_id)
      .flatMapGroupsWithState[ChunkStreamState, Element](
        OutputMode.Append, timeoutConf) {
        (doc: String, it: Iterator[Element], state: GroupState[ChunkStreamState]) =>
          if (state.hasTimedOut) {
            val st = state.getOption.getOrElse(ChunkStreamState(Vector.empty, 0L, ""))
            state.remove()
            val (chunks, _, _, _) = Chunker.chunkDocIncremental(
              doc, st.carry, opts, st.nextSeq, st.overlapPrefix, finalFlush = true)
            chunks.iterator
          } else {
            val st = state.getOption.getOrElse(ChunkStreamState(Vector.empty, 0L, ""))
            val (markers, arrived) = it.toVector.sortBy(_.seq)
              .partition(_.`type` == EndOfDocument)
            if (markers.nonEmpty || st.closed) {
              // An EndOfDocument control row closes the document in-batch.
              // Instead of state.remove(), keep a `closed` tombstone with the
              // final seq: if part of the doc only arrives in a later
              // micro-batch, those elements flush immediately, continuing at
              // nextSeq — no duplicate chunk_seq values. The tombstone ages
              // out via the processing-time timeout when one is configured;
              // under the marker-driven AvailableNow drain the query
              // terminates anyway.
              val (chunks, _, finalSeq, _) = Chunker.chunkDocIncremental(
                doc, st.carry ++ arrived, opts, st.nextSeq, st.overlapPrefix,
                finalFlush = true)
              state.update(ChunkStreamState(Vector.empty, finalSeq, "", closed = true))
              if (useTimeout) state.setTimeoutDuration(docTimeoutMs)
              chunks.iterator
            } else {
              val (chunks, carry, nextSeq, prefix) = Chunker.chunkDocIncremental(
                doc, st.carry ++ arrived, opts, st.nextSeq, st.overlapPrefix,
                finalFlush = false)
              state.update(ChunkStreamState(carry, nextSeq, prefix))
              if (useTimeout) state.setTimeoutDuration(docTimeoutMs)
              chunks.iterator
            }
          }
      }
  }

  /** In-memory kernel state of one LSH band-bucket: the doc ids seen so far
    * (sorted within each batch for determinism) with a PARALLEL per-doc
    * payload vector, or a poisoned tombstone once the bucket exceeds the
    * skew cap. The payload is an opaque per-doc long (0 for the plain
    * candidate folds; the winnow pipeline rides its per-doc fingerprint
    * count here so the verify stage needs no second corpus pass) — it MUST
    * be deterministic per doc id, since dedup and ordering are by doc id
    * alone. Two parallel primitive vectors, NOT a Vector[(Long, Long)]: the
    * state encoders write Vector[Long] as an UnsafeArrayData of primitives,
    * while an array of tuples is an array of structs — one InternalRow
    * allocation per element per (de)serialization, across EVERY touched
    * bucket EVERY micro-batch; the tuple shape measured ~1.4x the whole
    * winnow query's cost. Never persisted itself: each fold stores the
    * smallest schema it needs (see the three state classes below). */
  private final case class BucketKernel(docs: Vector[Long],
    payloads: Vector[Long], poisoned: Boolean)

  /** Persisted state of the PLAIN candidate folds — docs only, the exact
    * pre-payload schema (array<long>, boolean), so an existing deployment's
    * checkpoint restarts cleanly across this upgrade and a stream that never
    * reads payloads never stores them. */
  final case class LshBucketState(docs: Vector[Long], poisoned: Boolean)

  /** [[LshBucketState]] plus the bucket's running-max event time, so the TTL
    * variant's timeout never rewinds when a late (in-watermark) row arrives
    * after a newer batch already advanced the bucket's newest event. */
  final case class LshBucketTtlState(docs: Vector[Long], poisoned: Boolean,
    maxEventMs: Long)

  /** [[LshBucketState]] plus the parallel per-doc payload vector — the
    * persisted state of the NoTimeout sized fold (constant-ts drains). */
  final case class LshBucketSizedState(docs: Vector[Long],
    payloads: Vector[Long], poisoned: Boolean)

  /** [[LshBucketTtlState]] plus the parallel per-doc payload vector — the
    * persisted state of the SIZED fold only (one extra long per doc). */
  final case class LshBucketSizedTtlState(docs: Vector[Long],
    payloads: Vector[Long], poisoned: Boolean, maxEventMs: Long)

  /** One micro-batch step of the banded candidate fold — the ONE body both
    * [[lshCandidateStream]] and [[lshCandidateStreamTtl]] run, so the subtle
    * semantics (poisoning, in-batch ordering, pair emission) cannot diverge.
    * A doc id re-delivered across batches (at-least-once sources) neither
    * self-pairs nor re-counts toward the cap. */
  private def lshBucketStep(bandIdx: Int, batch: Vector[(Long, Long)],
      st: BucketKernel, maxBandSize: Int)
      : (BucketKernel, Iterator[(Int, (Long, Long), (Long, Long))]) = {
    val seen = st.docs.toSet
    val arrived = batch.distinctBy(_._1).sortBy(_._1)
      .filterNot(d => seen(d._1))
    if (st.poisoned || st.docs.size + arrived.size > maxBandSize)
      (BucketKernel(Vector.empty, Vector.empty, poisoned = true),
        Iterator.empty)
    else {
      val withinBatch = for {
        i <- arrived.indices.iterator
        j <- (i + 1) until arrived.size
      } yield (bandIdx, arrived(i), arrived(j))
      val prior = st.docs.lazyZip(st.payloads)
      val withPrior = for {
        e <- prior.iterator
        a <- arrived
      } yield if (e._1 < a._1) (bandIdx, e, a) else (bandIdx, a, e)
      (BucketKernel(st.docs ++ arrived.map(_._1),
        st.payloads ++ arrived.map(_._2), poisoned = false),
        withinBatch ++ withPrior)
    }
  }

  /**
   * Streaming MinHash-LSH near-duplicate candidates — the streaming twin of
   * the batch `q_lsh_near_dup` pipeline (signature → banded keys →
   * within-bucket pairs). Keyed `flatMapGroupsWithState` per (band_idx,
   * band_key): each arriving doc pairs with the bucket's previously-seen docs
   * and with its batch-mates; state is the bucket's doc list, NOT pairs — at
   * 100 TB state stays O(docs × bands), the quadratic pair set is only ever
   * emitted, never stored. Hot buckets above `maxBandSize` poison the bucket
   * and emit nothing (the streaming rendering of the batch hot-band drop —
   * identical in the single-batch AvailableNow drain, conservatively
   * under-emitting across later batches). Within a batch, docs are processed
   * in doc_id order, so the emitted pair set is independent of file-split
   * races. Output: one (band_idx, doc_a, doc_b) candidate event per shared
   * band, doc_a < doc_b; exact Jaccard verification stays a batch join over
   * candidates, as in `q_jaccard_near_dup`.
   */
  /** The per-bucket candidate fold over a (doc_id, band_idx, band_key)
    * stream — see [[lshNearDupAvailableNow]] for the semantics. Exposed
    * separately so any banded stream (MemoryStream in specs, Kafka in a real
    * ingest) composes with it. */
  def lshCandidateStream(bands: Dataset[(Long, Int, Long)],
      maxBandSize: Int = 1000): DataFrame = {
    val sp = bands.sparkSession
    import sp.implicits._
    bands
      .groupByKey { case (_, bandIdx, bandKey) => (bandIdx, bandKey) }
      .flatMapGroupsWithState[LshBucketState, (Int, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((bandIdx, _), rows, state) =>
          val prior = state.getOption.getOrElse(
            LshBucketState(Vector.empty, poisoned = false))
          val (next, out) = lshBucketStep(bandIdx,
            rows.map(r => (r._1, 0L)).toVector,
            BucketKernel(prior.docs,
              Vector.fill(prior.docs.size)(0L), prior.poisoned),
            maxBandSize)
          state.update(LshBucketState(next.docs, next.poisoned))
          out.map { case (bi, a, b) => (bi, a._1, b._1) }
      }
      .toDF("band_idx", "doc_a", "doc_b")
  }

  /**
   * [[lshCandidateStream]] with an event-time TTL on the bucket state — the
   * long-lived-deployment variant. Input rows carry an event timestamp
   * (cols: doc_id, band_idx, band_key, ts); a watermark of `delayThreshold`
   * is applied, and a bucket whose last event is older than the watermark is
   * DROPPED (its docs can no longer pair). In a real ingest near-duplicates
   * cluster in arrival time, so candidates are only expected within the
   * watermark window anyway — the TTL trades unbounded O(all docs × bands)
   * state for bounded O(docs in window × bands) with in-window recall
   * intact, the same bounded-recall trade the hot-bucket cap makes.
   * ([[packSequencesStream]] needs no TTL: its state is ONE long per bucket,
   * O(buckets) constant for the stream's life.)
   */
  def lshCandidateStreamTtl(bands: DataFrame, maxBandSize: Int = 1000,
      delayThreshold: String = "10 minutes"): DataFrame = {
    val sp = bands.sparkSession
    import sp.implicits._
    bands.select(col("doc_id"), col("band_idx"), col("band_key"), col("ts"))
      .withWatermark("ts", delayThreshold)
      .as[(Long, Int, Long, java.sql.Timestamp)]
      .groupByKey { case (_, bandIdx, bandKey, _) => (bandIdx, bandKey) }
      .flatMapGroupsWithState[LshBucketTtlState, (Int, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((bandIdx, _), rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = rows.toVector
            val prior = state.getOption
            val maxTs = ttlAdvance(state, batch.map(_._4.getTime).max,
              prior.map(_.maxEventMs))
            val st = prior
              .map(p => BucketKernel(p.docs,
                Vector.fill(p.docs.size)(0L), p.poisoned))
              .getOrElse(BucketKernel(Vector.empty, Vector.empty,
                poisoned = false))
            val (next, out) = lshBucketStep(bandIdx,
              batch.map(t => (t._1, 0L)), st, maxBandSize)
            state.update(LshBucketTtlState(next.docs, next.poisoned, maxTs))
            out.map { case (bi, a, b) => (bi, a._1, b._1) }
          }
      }
      .toDF("band_idx", "doc_a", "doc_b")
  }

  /**
   * [[lshCandidateStream]] threading the per-doc long payload (cols: doc_id,
   * payload, band_idx, band_key) — the NoTimeout twin of
   * [[lshCandidateStreamTtlSized]]. This is the fold for a BOUNDED drain
   * whose event time is constant (the AvailableNow oracle surfaces): with
   * one timestamp the watermark can never pass it, so the TTL fold's result
   * is identical — but the TTL machinery is not free even when it cannot
   * fire: `setTimeoutTimestamp` writes per GROUP per batch, and the
   * watermark advance after the data batch schedules one more micro-batch
   * whose only work is scanning every state entry for timed-out groups —
   * O(distinct fingerprints) state touched twice. Winnow buckets are ~one
   * per corpus fingerprint (millions at scale), so the constant-ts drain
   * skips the registration entirely. Long-lived deployments with real event
   * time use the TTL fold.
   */
  def lshCandidateStreamSized(bands: DataFrame,
      maxBandSize: Int = 1000): DataFrame = {
    val sp = bands.sparkSession
    import sp.implicits._
    bands.select(col("doc_id"), col("payload"), col("band_idx"), col("band_key"))
      .as[(Long, Long, Int, Long)]
      .groupByKey { case (_, _, bandIdx, bandKey) => (bandIdx, bandKey) }
      .flatMapGroupsWithState[LshBucketSizedState,
        (Int, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((bandIdx, _), rows, state) =>
          val prior = state.getOption
          val st = prior
            .map(p => BucketKernel(p.docs, p.payloads, p.poisoned))
            .getOrElse(BucketKernel(Vector.empty, Vector.empty,
              poisoned = false))
          val (next, out) = lshBucketStep(bandIdx,
            rows.map(t => (t._1, t._2)).toVector, st, maxBandSize)
          state.update(LshBucketSizedState(next.docs, next.payloads,
            next.poisoned))
          out.map { case (bi, a, b) => (bi, a._1, a._2, b._1, b._2) }
      }
      .toDF("band_idx", "doc_a", "payload_a", "doc_b", "payload_b")
  }

  /**
   * [[lshCandidateStreamTtl]] that threads an opaque per-doc long payload
   * (cols: doc_id, payload, band_idx, band_key, ts) through the bucket state
   * and out on BOTH sides of every candidate pair. The winnow near-dup rides
   * its per-doc fingerprint count here, so the batch verify stage reads the
   * sizes off the drained candidates instead of re-running the whole
   * fingerprint pass over the corpus a second time (plus two corpus-sized
   * joins) — the payload must be deterministic per doc id (dedup and
   * ordering are by doc id alone; a re-delivered doc keeps its first-seen
   * payload). State cost: one extra long per doc per bucket.
   */
  def lshCandidateStreamTtlSized(bands: DataFrame, maxBandSize: Int = 1000,
      delayThreshold: String = "10 minutes"): DataFrame = {
    val sp = bands.sparkSession
    import sp.implicits._
    bands.select(col("doc_id"), col("payload"), col("band_idx"),
        col("band_key"), col("ts"))
      .withWatermark("ts", delayThreshold)
      .as[(Long, Long, Int, Long, java.sql.Timestamp)]
      .groupByKey { case (_, _, bandIdx, bandKey, _) => (bandIdx, bandKey) }
      .flatMapGroupsWithState[LshBucketSizedTtlState,
        (Int, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((bandIdx, _), rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = rows.toVector
            val prior = state.getOption
            val maxTs = ttlAdvance(state, batch.map(_._5.getTime).max,
              prior.map(_.maxEventMs))
            val st = prior
              .map(p => BucketKernel(p.docs, p.payloads, p.poisoned))
              .getOrElse(BucketKernel(Vector.empty, Vector.empty,
                poisoned = false))
            val (next, out) =
              lshBucketStep(bandIdx, batch.map(t => (t._1, t._2)), st,
                maxBandSize)
            state.update(LshBucketSizedTtlState(next.docs, next.payloads,
              next.poisoned, maxTs))
            out.map { case (bi, a, b) => (bi, a._1, a._2, b._1, b._2) }
          }
      }
      .toDF("band_idx", "doc_a", "payload_a", "doc_b", "payload_b")
  }

  /** Shared event-time timeout bookkeeping of the two TTL folds: the
    * bucket's TRUE newest event rides in the state — a late-but-within-
    * watermark row arriving after a newer batch must not rewind the timeout
    * below events already seen — and the timeout is never set at/behind the
    * current watermark (the engine rejects it; +1ms keeps a late-data
    * bucket droppable at the very next watermark advance). Returns the new
    * running-max event time to persist. The bucket SEMANTICS stay in the
    * one [[lshBucketStep]] body. */
  private def ttlAdvance(state: GroupState[_], batchMaxTs: Long,
      priorMaxTs: Option[Long]): Long = {
    val maxTs = math.max(batchMaxTs, priorMaxTs.getOrElse(Long.MinValue))
    state.setTimeoutTimestamp(
      math.max(maxTs, state.getCurrentWatermarkMs() + 1))
    maxTs
  }

  /**
   * Production MinHash-LSH candidate stream with REAL event time — the
   * long-lived-ingest twin of [[lshNearDupAvailableNow]]'s recall stage,
   * the same contract [[winnowCandidateStream]] gives winnowing: `docs`
   * carries (doc_id, text, ts), the k-hash signature and banded keys are
   * computed in-stream, and `ts` rides to the shared TTL fold so buckets
   * silent past `delayThreshold` drop — state O(docs in window × bands),
   * in-window recall exactly the batch fold's.
   */
  def minhashCandidateStream(docs: DataFrame, k: Int = 8, shingleN: Int = 3,
      bandRows: Int = 2, maxBandSize: Int = 1000,
      delayThreshold: String = "10 minutes"): DataFrame = {
    import graft.functions.TextAnalysis
    val bands = docs.select(col("doc_id"),
        posexplode(TextAnalysis.lshBands(
          TextAnalysis.minHashSignature(col("text"), k, shingleN), bandRows))
          .as(Seq("band_idx", "band_key")),
        col("ts"))
    lshCandidateStreamTtl(bands, maxBandSize, delayThreshold)
  }

  /**
   * Production SimHash candidate stream with REAL event time — the third
   * client of the shared TTL fold (SimHash's four 16-bit bands are just
   * another banded key space): `docs` carries (doc_id, text, ts). Exact
   * hamming verification stays a batch join over the drained candidates,
   * as in the batch pipeline.
   */
  def simhashCandidateStream(docs: DataFrame, maxBandSize: Int = 1000,
      delayThreshold: String = "10 minutes"): DataFrame = {
    val bands = simhashBands(
        simhashSigs(docs, col("text"), extra = Seq(col("ts"))),
        extra = Seq(col("ts")))
      .filter(col("band_key").isNotNull)
      .select(col("doc_id"), col("band_idx"), col("band_key"), col("ts"))
    lshCandidateStreamTtl(bands, maxBandSize, delayThreshold)
  }

  def lshNearDupAvailableNow(spark: SparkSession, documentsPath: String,
      maxBandSize: Int = 1000): DataFrame = {
    import spark.implicits._
    graft.Tables.configure(spark)
    val schema = spark.read.parquet(documentsPath).schema
    drainAvailableNow(spark, documentsPath, "lsh", "append",
      statePartitions = Some(8)) { streamDir =>
      // the same near-dup derivation the batch queries use: every doc_id % 7
      // re-emitted under id+10000 with an appended token
      val docs = spark.readStream.schema(schema).parquet(streamDir)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          if (id % 7 == 0) Seq((id, text), (id + 10000L, text + " xtra"))
          else Seq((id, text))
        }.toDF("doc_id", "text")
      val bands = docs
        .select(col("doc_id"),
          graft.functions.TextAnalysis
            .minHashSignature(col("text"), k = 8, shingleN = 3).as("sig"))
        .select(col("doc_id"),
          posexplode(graft.functions.TextAnalysis.lshBands(col("sig"), rows = 2))
            .as(Seq("band_idx", "band_key")))
        .as[(Long, Int, Long)]
      lshCandidateStream(bands, maxBandSize)
    }
  }

  /** (doc_id, h32, h0) SimHash signatures of a (doc_id, text) frame — one row
    * per doc, 32-bit halves end-to-end (no sign games). Shared by the
    * streaming candidate path and its batch verify join so the signature
    * space cannot drift between them. */
  private def simhashSigs(docs: DataFrame, textCol: org.apache.spark.sql.Column,
      extra: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val h = graft.functions.TextAnalysis.simHash64(textCol)
    docs.select(Seq(col("doc_id"),
      shiftrightunsigned(h, 32).as("h32"),
      h.bitwiseAND(lit(0xFFFFFFFFL)).as("h0")) ++ extra: _*)
  }

  /** The four 16-bit SimHash bands of a [[simhashSigs]] frame. */
  private def simhashBands(sigs: DataFrame,
      extra: Seq[org.apache.spark.sql.Column] = Nil): DataFrame =
    sigs.select(Seq(col("doc_id"), col("h32"), col("h0"),
      posexplode(array(
        col("h0").bitwiseAND(lit(65535L)),
        shiftrightunsigned(col("h0"), 16).bitwiseAND(lit(65535L)),
        col("h32").bitwiseAND(lit(65535L)),
        shiftrightunsigned(col("h32"), 16).bitwiseAND(lit(65535L))))
        .as(Seq("band_idx", "band_key"))) ++ extra: _*)

  /**
   * Streaming SimHash hamming near-dup — the streaming twin of the batch
   * `q_simhash_near_dup` pipeline. SimHash's four 16-bit bands are just
   * another banded key space, so the candidate stage IS
   * [[lshCandidateStream]] — the one `lshBucketStep` fold serves MinHash-LSH
   * and SimHash alike (and [[lshCandidateStreamTtl]] is the shared TTL
   * variant for long-lived deployments of either). The exact
   * `bit_count(xor)` hamming verification stays a BATCH join over the
   * drained candidates only, as in the batch pipeline: cheap recall stage
   * streams, exact precision stage joins — never all pairs. Corpus
   * derivation mirrors the batch query (every 9th doc re-emitted with an
   * appended token, every 15th as an exact copy), so the batch oracle
   * verifies the streaming result.
   */
  /**
   * Streaming twin of the winnowing near-dup: per-doc winnowed fingerprint
   * sets stream through the SAME bucket fold as the MinHash and SimHash
   * bands (a fingerprint IS a band key — the fold's third client), with the
   * batch query's hot-posting cap; the drained per-fingerprint candidate
   * events reduce batch-side to shared counts and the 80%-of-smaller-side
   * floor, so the batch oracle verifies the streamed result exactly.
   *
   * The candidate stage runs through [[lshCandidateStreamTtlSized]], NOT the
   * no-TTL fold: winnowing emits ~one fingerprint per `w` characters, so
   * distinct band keys grow with corpus CHARACTERS (orders of magnitude past
   * MinHash's k/2 keys per doc) — without expiry a long-lived stream's
   * bucket state is O(corpus size). The documents table carries no event
   * time, so the bounded drain rides one constant in-window timestamp: the
   * watermark can never pass it, no bucket expires mid-drain, and the result
   * is exactly the no-TTL fold's (which the batch oracle checks). A real
   * ingest supplies its own event time through [[winnowCandidateStream]]
   * and `delayThreshold` bounds state at O(fingerprints in window); the
   * expiry/recall semantics are pinned by the winnow TTL + event-time specs
   * in StreamingOpsSpec.
   */
  def winnowNearDupAvailableNow(spark: SparkSession, documentsPath: String,
      maxBucket: Int = 100): DataFrame = {
    import spark.implicits._
    graft.Tables.configure(spark)
    val schema = spark.read.parquet(documentsPath).schema
    // the batch query's near-dup corpus: every 7th doc re-emitted (+10000)
    // with one appended token
    def derive(ds: Dataset[(Long, String)]): DataFrame = ds.flatMap {
      case (id, t) =>
        val near = if (id % 7 == 0) Seq((id + 10000L, t + " xtra")) else Nil
        (id, t) +: near
    }.toDF("doc_id", "text")
    // the candidate events are reduced to the VERIFIED near-dup pairs INSIDE
    // each micro-batch (distributed) and only survivors cross to the driver
    // (~10² rows, vs 3.7M candidate events / 2.7M distinct pairs at sf0.1 —
    // the memory-sink collect of those was the query's wall-clock). Running
    // the whole verify per batch is exact, not approximate: a doc's
    // fingerprints all derive from ONE input row (never split across
    // batches), a pair's events therefore all emit in the later doc's batch,
    // and the fold never re-pairs a re-delivered doc — so per-pair shared
    // counts are complete within the emitting batch and the 80%-of-smaller-
    // side floor filters correctly before anything is collected.
    // megabytes of bucket state over one bounded drain: few stores amortize
    // the fixed per-store commit far better than 32 (measured 6.1 → 5.3 s
    // at 8; the r17 curve puts 4 another ~5% lower and 2 clearly worse —
    // fold parallelism starts to bite below 4)
    val verified = drainAvailableNowAgg(spark, documentsPath, "winnow",
        statePartitions = Some(4)) {
      dir =>
        val docs = derive(spark.readStream.schema(schema).parquet(dir)
          .select(col("doc_id").cast("long").as("doc_id"), col("text"))
          .as[(Long, String)])
        // bounded drain, constant event time: the TTL fold's result would be
        // identical (the watermark can never pass the one timestamp), so run
        // the NoTimeout sized fold and skip the per-group timeout writes AND
        // the post-watermark timeout-scan micro-batch over O(fingerprints)
        // state — see [[lshCandidateStreamSized]]. Real ingests take the TTL
        // path through [[winnowCandidateStream]].
        lshCandidateStreamSized(winnowBands(docs), maxBucket)
    }(winnowVerify)
    verified.orderBy("doc_a", "doc_b")
  }

  /**
   * The streaming side of the winnow near-dup, with a REAL event-time
   * column: `docs` needs (doc_id, text, ts). Each doc's winnowed fingerprint
   * set is computed ONCE — the fingerprint count rides the fold's per-doc
   * payload, so the verify stage ([[winnowVerify]]) reads both sides' sizes
   * off the drained candidates instead of re-running the fingerprint pass
   * over the whole corpus a second time and joining it back twice (the r15
   * shape; the re-pass plus two corpus-sized shuffles were ~40% of the
   * query's cost). Buckets silent past the `delayThreshold` watermark are
   * dropped — late out-of-watermark fingerprints pair with nothing, state
   * stays O(fingerprints in window).
   */
  def winnowCandidateStream(docs: DataFrame, maxBucket: Int = 100,
      delayThreshold: String = "10 minutes"): DataFrame =
    lshCandidateStreamTtlSized(winnowBands(docs, withTs = true), maxBucket,
      delayThreshold)

  /** The (doc_id, payload=n_fp, band_idx, band_key[, ts]) band frame of a
    * (doc_id, text[, ts]) doc frame — one row per winnowed fingerprint.
    * (band_key, payload) packed in ONE letCol-bound expression and
    * exploded directly. NOT `explode(col("fps"))` over a projected alias:
    * InferFiltersFromGenerate infers `size(fps) > 0 AND isnotnull(fps)`
    * below a Generate over an ATTRIBUTE, and predicate pushdown then
    * substitutes the alias — duplicating the whole winnow HOF into the
    * filter, a measured 3x evaluation (the rule skips non-attribute
    * generator input, which this shape is). */
  private def winnowBands(docs: DataFrame, withTs: Boolean = false): DataFrame = {
    import graft.functions.TextAnalysis
    val ts = if (withTs) Seq(col("ts")) else Nil
    docs.select(Seq(col("doc_id"), lit(0).as("band_idx"),
        explode(TextAnalysis.letCol(
          TextAnalysis.winnowFingerprints(col("text"))) { fps =>
          transform(fps, f =>
            struct(f.as("band_key"), size(fps).cast("long").as("payload")))
        }).as("bk")) ++ ts: _*)
      .select(Seq(col("doc_id"), col("bk.payload").as("payload"),
        col("band_idx"), col("bk.band_key").as("band_key")) ++ ts: _*)
  }

  /** Batch verify over drained [[winnowCandidateStream]] candidates:
    * shared-fingerprint counts against the batch query's 80%-of-smaller-side
    * floor, both docs' fingerprint-set sizes read off the candidate payloads
    * (no second corpus pass, no joins). */
  def winnowVerify(candidates: DataFrame): DataFrame =
    candidates
      .groupBy("doc_a", "doc_b", "payload_a", "payload_b")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") * 5 >= least(col("payload_a"), col("payload_b")) * 4)
      .select(col("doc_a"), col("doc_b"), col("shared").cast("int").as("n_shared"))

  def simhashNearDupAvailableNow(spark: SparkSession, documentsPath: String,
      maxBandSize: Int = 1000, nonBmpSuffix: String = ""): DataFrame = {
    import spark.implicits._
    graft.Tables.configure(spark)
    val schema = spark.read.parquet(documentsPath).schema
    def derive(ds: Dataset[(Long, String)]): DataFrame = ds
      .flatMap { case (id, text) =>
        val xtra = if (id % 9 == 0) Seq((id + 30000L, text + " xtra")) else Nil
        val copy = if (id % 15 == 0) Seq((id + 60000L, text)) else Nil
        (id, text) +: (xtra ++ copy)
      }.toDF("doc_id", "text")
    def salted = when(col("doc_id") % 9 === 0,
      concat(col("text"), lit(nonBmpSuffix))).otherwise(col("text"))
    // one row per doc by construction — no distinct (and no shuffle) needed
    val sigs = simhashSigs(
      derive(spark.read.parquet(documentsPath)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .as[(Long, String)]), salted)
    // the hamming verify runs distributed INSIDE each micro-batch (both
    // joins broadcast the one-row-per-doc signature frame) and only the
    // verified pairs cross to the driver — the memory sink was collecting
    // ~1.1M candidate events at sf0.1 and re-shuffling them for the joins.
    // Per-batch is exact: all four bands of a doc arrive in its batch, so a
    // pair's candidate events complete in the later doc's batch, and the
    // hamming verdict is per-event (no cross-batch counting at all).
    val verified = drainAvailableNowAgg(spark, documentsPath, "simhash",
        statePartitions = Some(4)) {
      streamDir =>
        val docs = derive(spark.readStream.schema(schema).parquet(streamDir)
          .select(col("doc_id").cast("long").as("doc_id"), col("text"))
          .as[(Long, String)])
        val bands = simhashBands(simhashSigs(docs, salted))
          .filter(col("band_key").isNotNull)
          .select(col("doc_id"), col("band_idx"), col("band_key"))
          .as[(Long, Int, Long)]
        lshCandidateStream(bands, maxBandSize)
    } { batch =>
      batch
        .join(broadcast(sigs.withColumnRenamed("doc_id", "doc_a")
          .withColumnsRenamed(Map("h32" -> "a32", "h0" -> "a0"))), Seq("doc_a"))
        .join(broadcast(sigs.withColumnRenamed("doc_id", "doc_b")
          .withColumnsRenamed(Map("h32" -> "b32", "h0" -> "b0"))), Seq("doc_b"))
        .select(col("band_idx"), col("doc_a"), col("doc_b"),
          (bit_count(col("a32").bitwiseXOR(col("b32"))) +
            bit_count(col("a0").bitwiseXOR(col("b0")))).cast("int").as("hamming"))
        .filter(col("hamming") <= 3)
    }
    verified.orderBy("band_idx", "doc_a", "doc_b")
  }

  /**
   * Streaming GPT-style sequence packing — the streaming twin of
   * [[graft.functions.CorpusOps.packSequences]]: documents shard into
   * `buckets` by `doc_id mod buckets`, and each bucket's group state carries
   * ONE long — the cumulative token count, i.e. the running concatenation
   * offset. Each arriving doc is assigned its training-example id, offset,
   * and boundary flag immediately and never stored; state is O(buckets)
   * total regardless of corpus size, so an ingest job packs 100 TB with a
   * state store of a few kilobytes. Within a micro-batch docs fold in
   * `doc_id` order (the batch definition's order); across batches the carried
   * offset continues the concatenation, so arrival batching never changes
   * example widths — only which docs land in them, exactly as a resumed
   * batch pack would. Exposed on a (doc_id, n_tokens) stream so any source
   * (MemoryStream in specs, Kafka in a real ingest) composes with it.
   */
  def packSequencesStream(docs: Dataset[(Long, Long)], buckets: Int,
      ctxLen: Int): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs
      .groupByKey { case (id, _) => java.lang.Math.floorMod(id, buckets.toLong) }
      .flatMapGroupsWithState[Long, (Long, Long, Long, Long, Long, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (bucket, rows, state) =>
          var cum = state.getOption.getOrElse(0L)
          val out = rows.toVector.sortBy(_._1).map { case (id, n) =>
            val start = cum
            cum += n
            (id, bucket, n, start / ctxLen, start % ctxLen,
              n > 0 && (cum - 1) / ctxLen > start / ctxLen)
          }
          state.update(cum)
          out.iterator
      }
      .toDF("doc_id", "bucket", "n_tokens", "example_id", "offset_in_example",
        "crosses_boundary")
  }

  /** [[packSequencesStream]] drained over the corpus with AvailableNow; the
    * batch `q_pack_sequences` oracle verifies the result row-for-row. */
  def packSequencesAvailableNow(spark: SparkSession, documentsPath: String,
      buckets: Int, ctxLen: Int): DataFrame = {
    import spark.implicits._
    graft.Tables.configure(spark)
    val schema = spark.read.parquet(documentsPath).schema
    drainAvailableNow(spark, documentsPath, "pack", "append",
      statePartitions = Some(8)) { streamDir =>
      packSequencesStream(
        spark.readStream.schema(schema).parquet(streamDir)
          .select(col("doc_id").cast("long").as("doc_id"),
            graft.functions.TextAnalysis.tokenCountWhitespace(col("text"))
              .cast("long").as("n_tokens"))
          .as[(Long, Long)],
        buckets, ctxLen)
    }
  }
}
