package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{CorpusOps, TextAnalysis}
import graft.queries.{OracleSql => O}

/**
 * Declared queries for the corpus-construction operators in
 * [[graft.functions.CorpusOps]]: benchmark decontamination (doc-flag and
 * span-removal), SemDeDup-style embedding dedup, CCNet paragraph dedup,
 * duplicate-cluster connected components, deterministic stratified sampling,
 * GPT-style sequence packing (batch and streaming twin), int8 embedding
 * quantization with a recall gate, PII scrubbing, and the composed
 * q_curate_training_set pipeline. Corpus constructions (benchmark slices,
 * verbatim vector copies, appended PII) are mirrored verbatim in the oracle
 * SQL; the components oracle is a recursive CTE.
 */
object CorpusQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.readFanout(s, dir, "documents")

  private def embs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.readFanout(s, dir, "embeddings")

  private val PiiTail =
    " Contact jane.doe@corp.example or 10.0.0.7 or 555-123-4567."

  /** The planted-domain corpus for the selection-QUALITY gates
    * (q_nb_select_precision / q_dsir_select_precision): every 13th doc
    * carries a distinctive 40-token block no real doc contains, so
    * target-domain membership is known ground truth and "did the classifier
    * select well" is a measurable fraction, the same discipline as
    * q_embed_quant_recall / q_mrl_recall. */
  /** The crawl-refresh capstone's synthetic inputs, shared by the
    * localCheckpoint and persisted renderings (and mirrored in their one
    * oracle): history = even docs; the crawl = odd docs + exact re-crawls
    * (+500000) + drifted re-crawls (+700000, one appended token); every 9th
    * ≡ 1 crawled page shares the URL of the odd doc two below it (so the
    * collision partner IS in the crawl), host case and tracking params vary
    * on top. */
  /** A self-cleaning scratch root for q_crawl_refresh_persisted's stage
    * store. The query is LAZY — stages materialize at execution, after this
    * builder returns — so a try/finally cannot bracket the writes; instead
    * the dir is removed by a JVM shutdown hook (normal harness exits), and
    * leftovers from CRASHED runs are swept here on the next invocation, so
    * repeated verify/bench passes never accumulate stage output in /tmp.
    * Each run dir records its owner's pid; the sweep only removes dirs whose
    * owning process is DEAD (plus an hour's grace) — age alone must never
    * delete the stage store of a live long-running session that still holds
    * the lazy DataFrame. */
  /** Run dirs awaiting exit-time cleanup — ONE static shutdown hook drains
    * the queue, instead of registering (and retaining) a new hook thread per
    * query build: a long session rebuilding the query N times would
    * otherwise hold N hook threads and N undeleted dirs until exit. */
  private val scratchDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val scratchHook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => {
      var d = scratchDirs.poll()
      while (d != null) { graft.FsUtil.deleteRecursively(d); d = scratchDirs.poll() }
    }, "graft-refresh-scratch-cleanup"))

  private def refreshScratchDir(): String = {
    import java.nio.file.{Files, Path, Paths}
    val parent = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft-refresh-stages")
    Files.createDirectories(parent)
    def ownerDead(d: Path): Boolean =
      try {
        val pid = new String(Files.readAllBytes(d.resolve("owner.pid")),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong
        val h = ProcessHandle.of(pid)
        !h.isPresent || !h.get.isAlive
      } catch { case _: Exception => true } // unreadable pid = crashed mid-create
    val staleMs = 60L * 60 * 1000
    try {
      import scala.jdk.CollectionConverters._
      val list = Files.list(parent)
      val dirs = try list.iterator().asScala.toSeq finally list.close()
      dirs.filter(d => Files.isDirectory(d) &&
          System.currentTimeMillis() -
            Files.getLastModifiedTime(d).toMillis > staleMs &&
          ownerDead(d))
        .foreach(graft.FsUtil.deleteRecursively)
    } catch { case _: Exception => () }
    val dir = Files.createTempDirectory(parent, "run-")
    Files.write(dir.resolve("owner.pid"),
      ProcessHandle.current().pid().toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    scratchHook
    scratchDirs.add(dir)
    dir.toString
  }

  private def crawlRefreshInputs(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, org.apache.spark.sql.Column) = {
    val d = docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
      col("text"), col("source"), col("n_chars"))
    val history = d.filter(col("doc_id") % 2 === 0)
    val delta0 = d.filter(col("doc_id") % 2 === 1)
      .unionByName(history.filter(col("doc_id") % 6 === 0)
        .select((col("doc_id") + 500000).as("doc_id"), col("text"),
          col("source"), col("n_chars")))
      .unionByName(history.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 700000).as("doc_id"),
          concat(col("text"), lit(" xtra")).as("text"),
          col("source"), col("n_chars")))
    val raw = concat(
      when(col("doc_id") % 2 === 0, lit("https://CRAWL.example.com/p/"))
        .otherwise(lit("https://crawl.example.com/p/")),
      (col("doc_id") - when(col("doc_id") % 9 === 1, 2L).otherwise(0L))
        .cast("string"),
      when(col("doc_id") % 3 === 0, lit("?utm_source=x&a=1"))
        .otherwise(lit("?a=1")))
    (history, delta0, raw)
  }

  private val PlantTokens = "zyqvor flembra quindax drazzet vorplim"
  private val PlantSuffix = (" " + PlantTokens) * 8
  private def plantedCorpus(d: DataFrame): DataFrame =
    d.select(col("doc_id").cast("long").as("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 13 === 3, lit(PlantSuffix)).otherwise(lit("")))
        .as("text"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // GPT-3 appendix-C decontamination: the "benchmark" is a middle 8-word
    // slice of every 11th doc, so those docs (and any true collision) flag.
    // Scale shape: bench grams broadcast, one groupBy(doc_id) shuffle.
    "q_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(col("doc_id") % 11 === 3)
        .select(array_join(
          slice(TextAnalysis.words(col("text")), 3, 8), " ").as("text"))
      CorpusOps.decontaminate(d, bench, col("text"), n = 5).orderBy("doc_id")
    }),

    // SemDeDup over the embeddings ∪ verbatim copies of every 6th vector
    // (ids +100000): copies land in their original's cluster with cosine
    // exactly 1.0 and are dropped as the larger id of each pair. The cap is
    // set LOW (40 « the ~73-vector clusters) so the hash re-split path — the
    // 100 TB skew guard — is itself oracle-verified, not just spec'd.
    "q_semantic_dedup" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding"))
      val inp = e.unionByName(
        e.filter(col("vec_id") % 6 === 0)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      CorpusOps.semanticDedup(inp, k = 8, threshold = 0.99,
        maxClusterSize = 40).orderBy("vec_id")
    }),

    // Crawl-over-crawl incremental dedup: history = the even docs, the
    // incoming delta = the odd docs plus re-crawled copies of every 6th doc
    // (shifted ids, identical text) — exactly the copies must drop. Scale
    // shape: history rides as a broadcast Bloom bitset; only bloom hits
    // (true dups + fpp) reach the exact anti-join.
    "q_incremental_dedup" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
        col("text"))
      val history = d.filter(col("doc_id") % 2 === 0)
      val incoming = d.filter(col("doc_id") % 2 === 1).unionByName(
        history.filter(col("doc_id") % 6 === 0)
          .select((col("doc_id") + 500000).as("doc_id"), col("text")))
      CorpusOps.incrementalDedup(history, incoming, col("text"))
        .select(col("doc_id"), col("fp"))
        .orderBy("doc_id")
    }),

    // crawl-over-crawl NEAR-dup: re-crawled pages drift (here: one appended
    // token on every 10th history doc), so exact fingerprints miss them; the
    // delta's MinHash bands probe the history band index, candidates verify
    // with exact Jaccard, best history match kept per delta doc
    "q_incremental_near_dup" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
        col("text"))
      val history = d.filter(col("doc_id") % 2 === 0)
      val delta = d.filter(col("doc_id") % 2 === 1).unionByName(
        history.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 700000).as("doc_id"),
            concat(col("text"), lit(" xtra")).as("text")))
      CorpusOps.incrementalNearDup(history, delta)
        .orderBy("doc_id", "hist_doc")
    }),

    // zero-state streaming rendering: the history band index and shingle
    // sets are static (persisted once per snapshot), arriving docs carry
    // their own shingles through the stream-static band join — verified by
    // the SAME oracle as the batch twin
    "q_stream_incremental_near_dup" -> ((s, dir) =>
      graft.streaming.StreamingOps
        .incrementalNearDupAvailableNow(s, s"$dir/documents.parquet")),

    // URL canonicalization + canonical-URL dedup (C4/RefinedWeb stage 1):
    // synthetic raw URLs vary scheme case, host case, default port, tracking
    // params, param order, and fragments — canonicalization collapses each
    // (source, page) group and the keeper is the min doc_id, one window
    // shuffle on the canonical string
    "q_url_canonical_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
        col("source"))
      val raw = concat(
        when(col("doc_id") % 3 === 0, lit("HTTPS://")).otherwise(lit("https://")),
        when(col("doc_id") % 2 === 0, upper(col("source"))).otherwise(col("source")),
        lit(".example.com"),
        when(col("doc_id") % 5 === 0, lit(":443")).otherwise(lit("")),
        lit("/page/"), (col("doc_id") % 7).cast("string"),
        when(col("doc_id") % 2 === 0, lit("?utm_source=feed&b=2&a=1"))
          .otherwise(lit("?a=1&b=2")),
        when(col("doc_id") % 4 === 0, lit("#sec")).otherwise(lit("")))
      d.select(col("doc_id"), raw.as("raw_url"),
          CorpusOps.canonicalizeUrl(raw).as("canonical_url"))
        .withColumn("keep", col("doc_id") === min("doc_id").over(
          Window.partitionBy("canonical_url")))
        .orderBy("doc_id")
    }),

    // CCNet-style LM quality bucketing with the bigram LM trained in-plane on
    // the reference-domain slice (every 11th doc ≡ 5); integer micro-nat
    // log-prob sums keep the per-doc aggregation exact across engines
    "q_lm_quality" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
        col("text"))
      val ref = d.filter(col("doc_id") % 11 === 5)
      // thresholds sit inside the corpus's observed mean-log-prob range
      // (≈ -3.74..-3.10 nats at sf0.01) so all three buckets exercise
      CorpusOps.lmQualityScore(d, ref, col("text"),
        headMinAvgLp = -3.47e6, midMinAvgLp = -3.54e6)
        .orderBy("doc_id")
    }),

    // fastText-style quality filter (the GPT-3/LLaMA curation classifier)
    // rendered as hashed-feature Naive Bayes trained in-plane: positive =
    // the reference-domain slice (doc_id % 11 = 5, same as the CCNet LM),
    // negative = a disjoint random slice (doc_id % 11 = 7)
    "q_nb_quality" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
        col("text"))
      CorpusOps.nbQualityClassifier(d,
        d.filter(col("doc_id") % 11 === 5),
        d.filter(col("doc_id") % 11 === 7),
        col("text")).orderBy("doc_id")
    }),

    // streaming twin: the SAME classifier trains batch-side, bakes into a
    // per-row array-literal column, and scores the arriving corpus with zero
    // keyed state; verified by the batch oracle
    "q_stream_nb_quality" -> ((s, dir) =>
      graft.streaming.StreamingOps
        .nbQualityAvailableNow(s, s"$dir/documents.parquet")),

    // DSIR importance resampling (Xie et al. 2023): hashed uni+bigram llr
    // vs the target slice, deterministic Gumbel top-k (k = 50)
    "q_dsir_select" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
        col("text"))
      CorpusOps.dsirSelect(d, d.filter(col("doc_id") % 11 === 5),
        col("text"), k = 50)
    }),

    // Selection-quality gate for the NB classifier: train on HALF the
    // planted target docs (odd ids) vs a disjoint negative slice, score the
    // held-out corpus, and count how many of the held-out planted docs the
    // top-k (k = their true count) recovers. Arithmetic is the oracle's;
    // the ≥-floor assertion lives in SelectionPrecisionSpec.
    "q_nb_select_precision" -> ((s, dir) => {
      val d = plantedCorpus(docs(s, dir))
      val isPlanted = col("doc_id") % 13 === 3
      val isPosSeed = isPlanted && col("doc_id") % 2 === 1
      val isNegSeed = !isPlanted && col("doc_id") % 11 === 7
      val held = d.filter(!isPosSeed && !isNegSeed)
      val k = held.filter(isPlanted).count().toInt
      CorpusOps.nbQualityClassifier(held,
          d.filter(isPosSeed), d.filter(isNegSeed), col("text"))
        .orderBy(col("llr_micro_sum").desc, col("doc_id"))
        .limit(k)
        .agg(count(lit(1)).cast("int").as("n_selected"),
          sum(when(isPlanted, 1).otherwise(0)).cast("int").as("n_hits"))
        .select(lit(k).cast("int").as("n_planted"),
          col("n_selected"), col("n_hits"))
    }),

    // Selection-quality gate for DSIR: target = half the planted docs,
    // raw = the whole corpus, k = the full planted count; count planted
    // docs among the Gumbel top-k (signal ≈ 200 micro-nats·10⁶ vs ≈ 1
    // Gumbel noise, so a working sampler recovers nearly all of them)
    "q_dsir_select_precision" -> ((s, dir) => {
      val d = plantedCorpus(docs(s, dir))
      val isPlanted = col("doc_id") % 13 === 3
      val k = d.filter(isPlanted).count().toInt
      CorpusOps.dsirSelect(d,
          d.filter(isPlanted && col("doc_id") % 2 === 1), col("text"), k = k)
        .agg(count(lit(1)).cast("int").as("n_selected"),
          sum(when(isPlanted, 1).otherwise(0)).cast("int").as("n_hits"))
        .select(lit(k).cast("int").as("n_planted"),
          col("n_selected"), col("n_hits"))
    }),

    "q_stratified_sample" -> ((s, dir) =>
      CorpusOps.stratifiedSample(docs(s, dir), col("lang"),
        Seq("en" -> 0.3, "zh" -> 0.7), defaultRate = 1.0, salt = "mix1")
        .orderBy("doc_id")),

    // XLM/mT5 temperature mixing: α = 0.5 up-samples low-resource languages;
    // stratum rates derive from the k-row count aggregate (scaled-integer
    // normalization for cross-engine determinism) and broadcast back
    "q_temperature_sample" -> ((s, dir) =>
      CorpusOps.temperatureSample(docs(s, dir), col("lang"),
        alpha = 0.5, targetFrac = 0.5, salt = "temp1")
        .orderBy("doc_id")),

    // BM25 lexical retrieval: Okapi scoring for a 3-term query, per-term
    // partials rounded to micro-units before the exact per-doc long sum
    "q_bm25_search" -> ((s, dir) =>
      CorpusOps.bm25TopK(docs(s, dir), col("text"),
        Seq("spark", "table", "scan"), k = 10)),

    // TF-IDF top-3 terms per doc: integer micro-nat idf, exact long scores,
    // deterministic (score desc, term asc) ranking
    "q_tfidf_top_terms" -> ((s, dir) =>
      CorpusOps.tfIdfTopTerms(docs(s, dir), col("text"), k = 3)
        .orderBy("doc_id", "rank")),

    // exact-token-budget corpus head: seeded-hash order, two-stage global
    // prefix sum (per-bucket sums + a k-row offset window) — no global sort
    "q_token_budget_head" -> ((s, dir) =>
      CorpusOps.tokenBudgetHead(docs(s, dir),
        graft.functions.TextAnalysis.tokenCountWhitespace(col("text")),
        budget = 10000L, salt = "tb1")
        .orderBy("doc_id")),

    "q_pack_sequences" -> ((s, dir) =>
      CorpusOps.packSequences(docs(s, dir),
        TextAnalysis.tokenCountWhitespace(col("text")),
        buckets = 8, ctxLen = 256).orderBy("doc_id")),

    // PaLM-style span-level decontamination: the matched 5-gram windows are
    // REMOVED (positions dropped, doc reassembled), not the whole doc
    "q_decontaminate_spans" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(col("doc_id") % 11 === 3)
        .select(array_join(
          slice(TextAnalysis.words(col("text")), 3, 8), " ").as("text"))
      CorpusOps.decontaminateSpans(d, bench, col("text"), n = 5)
        .orderBy("doc_id")
    }),

    // CCNet-style cross-doc paragraph dedup over the corpus's natural
    // " merge " separator (308 of 1362 sf0.01 paragraphs sit in duplicate
    // groups, so the keep-first fires without augmentation)
    "q_paragraph_dedup" -> ((s, dir) =>
      CorpusOps.paragraphDedup(docs(s, dir), col("text"), " merge ")
        .orderBy("doc_id")),

    // Lee et al. 2022 EXACTSUBSTR self-dedup: 6-word windows repeated anywhere
    // in the corpus keep only the smallest-(doc_id, start) occurrence; the
    // other occurrences' spans are spliced out of their documents
    "q_self_substring_dedup" -> ((s, dir) =>
      CorpusOps.selfSubstringDedup(docs(s, dir), col("text"), n = 6)
        .orderBy("doc_id")),

    // int8 scalar quantization of the embedding corpus (4x storage) — the
    // per-vector scale and quantized codes, serialized for the compare
    "q_embed_quantize" -> ((s, dir) =>
      embs(s, dir)
        .select(col("vec_id"), CorpusOps.quantizeInt8(col("embedding")).as("qt"))
        .select(col("vec_id"), round(col("qt.scale"), 6).as("scale"),
          array_join(col("qt.q"), ",").as("q_str"))
        .orderBy("vec_id")),

    // recall check: brute-force cosine top-10 on the DEQUANTIZED corpus vs
    // the full-precision top-10 for the same query vector — one summary row
    "q_embed_quant_recall" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding"))
      // materialize the quantized struct before dequantizing — composing the
      // two expressions inline re-runs the quantization per element
      val deq = e
        .select(col("vec_id"), CorpusOps.quantizeInt8(col("embedding")).as("qt"))
        .select(col("vec_id"), CorpusOps.dequantizeInt8(col("qt")).as("embedding"))
      def top10(d: DataFrame): DataFrame = {
        val qv = d.filter(col("vec_id") === 1)
          .select(col("embedding").as("qv"))
        CorpusOps.attachBroadcast(d.filter(col("vec_id") =!= 1), qv)
          .select(col("vec_id"),
            round(CorpusOps.cosineCol(col("embedding"), col("qv")), 6).as("sim"))
          .orderBy(desc("sim"), asc("vec_id")).limit(10)
      }
      val full = top10(e).select(col("vec_id").as("fid"))
      val quant = top10(deq).agg(
        sort_array(collect_list(col("vec_id"))).as("qids"))
      CorpusOps.attachBroadcast(
          full.agg(sort_array(collect_list(col("fid"))).as("fids")), quant)
        .select(
          size(array_intersect(col("fids"), col("qids"))).as("overlap_at_10"),
          array_join(col("qids"), ",").as("quant_top_ids"))
    }),

    // Matryoshka (MRL, Kusupati et al. 2022) truncation recall: keep the
    // embedding's FIRST 16 of 64 dims (MRL checkpoints order information
    // into prefixes), brute-force cosine top-10 vs the full-precision
    // top-10 for the same probe — the storage/recall knob dense retrieval
    // ships; cosine over the truncated prefix re-normalizes implicitly
    "q_mrl_recall" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding"))
      val trunc = e.select(col("vec_id"),
        slice(col("embedding"), 1, 16).as("embedding"))
      def top10(d: DataFrame): DataFrame = {
        val qv = d.filter(col("vec_id") === 1).select(col("embedding").as("qv"))
        CorpusOps.attachBroadcast(d.filter(col("vec_id") =!= 1), qv)
          .select(col("vec_id"),
            round(CorpusOps.cosineCol(col("embedding"), col("qv")), 6).as("sim"))
          .orderBy(desc("sim"), asc("vec_id")).limit(10)
      }
      val full = top10(e).agg(sort_array(collect_list(col("vec_id"))).as("fids"))
      val tr = top10(trunc).agg(sort_array(collect_list(col("vec_id"))).as("tids"))
      CorpusOps.attachBroadcast(full, tr).select(
        size(array_intersect(col("fids"), col("tids"))).as("overlap_at_10"),
        array_join(col("tids"), ",").as("trunc_top_ids"))
    }),

    // duplicate-cluster resolution: shared-paragraph star edges (linear,
    // never within-group pairwise) -> min-label-propagation connected
    // components, the canonical-representative step a dedup pipeline runs
    // after pair generation
    "q_dedup_components" -> ((s, dir) =>
      CorpusOps.connectedComponents(
        CorpusOps.sharedParagraphEdges(docs(s, dir), col("text"), " merge "))
        .orderBy("doc_id")),

    // The recurring-crawl REFRESH capstone — today's crawl against the prior
    // snapshot, five proven-shape stages in ONE declared DAG:
    //   1. canonical-URL dedup inside the crawl (pure columns + one window);
    //   2. exact incremental dedup vs history (broadcast Bloom + anti-join);
    //   3. near-dup vs history (banded probe + exact Jaccard, anti-join out);
    //   4. LM quality floor (in-plane bigram LM from a history slice, tail
    //      bucket drops);
    //   5. per-source quota (skew-safe grouped top-N).
    // Every stage is the operator verified standalone above; the oracle
    // re-derives the whole pipeline (URL stage construction-predicting, the
    // rest mirrored), so the COMPOSITION is gate-checked, not just the parts.
    "q_crawl_refresh" -> ((s, dir) => {
      val (history, delta0, raw) = crawlRefreshInputs(s, dir)
      // single-job rendering: stage survivor sets pinned by
      // lineage-truncating localCheckpoint (see CorpusOps.crawlRefresh for
      // why materialization matters and the persisted twin for durability)
      CorpusOps.crawlRefresh(history, delta0, raw,
          history.filter(col("doc_id") % 11 === 5),
          headMinAvgLp = -3.47e6, midMinAvgLp = -3.54e6, quota = 12,
          materialize = (_, df) => df.localCheckpoint(true))
        .select(col("doc_id"), col("source"), col("bucket"), col("rk"))
        .orderBy("doc_id")
    }),

    // the SAME refresh through durable parquet stage outputs (StageStore):
    // each survivor set lands behind a done-marker, so a refresh killed
    // between stages resumes instead of recomputing — the production
    // durability story the localCheckpoint rendering can't give (executor
    // memory dies with the driver). Identical oracle as q_crawl_refresh:
    // the persisted path must change WHERE stage outputs live, never WHAT
    // they contain.
    "q_crawl_refresh_persisted" -> ((s, dir) => {
      val (history, delta0, raw) = crawlRefreshInputs(s, dir)
      val store = new graft.sinks.StageStore(s, refreshScratchDir())
      val out = CorpusOps.crawlRefresh(history, delta0, raw,
          history.filter(col("doc_id") % 11 === 5),
          headMinAvgLp = -3.47e6, midMinAvgLp = -3.54e6, quota = 12,
          materialize = store.apply)
        .select(col("doc_id"), col("source"), col("bucket"), col("rk"))
        .orderBy("doc_id")
      out
    }),

    // the one-pass per-source corpus profile (volumes, exact-dup mass, mean
    // length) — every 10th doc re-emitted as an exact copy so the duplicate
    // counters fire; mirrored verbatim in the oracle
    "q_corpus_profile" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
        col("source"), col("text"))
      val aug = base.unionByName(base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 90000L).as("doc_id"), col("source"), col("text")))
      CorpusOps.corpusProfile(aug, col("text"), col("source"))
        .orderBy("source")
    }),

    // RefinedWeb-style per-source cap: keep each source's 15 longest docs;
    // the two-stage grouped top-N bounds any single task's sort even when
    // one source dominates the corpus
    "q_source_quota" -> ((s, dir) =>
      CorpusOps.sourceQuota(
        docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
          col("source"), col("n_chars")),
        col("source"), col("n_chars"), quota = 15)
        .select(col("doc_id"), col("source"), col("rk"))
        .orderBy("doc_id")),

    // leakage-safe splitting: docs sharing any paragraph collapse into one
    // component and the whole component lands in one split — hashing doc ids
    // directly would put near-identical docs in train AND test
    "q_leakage_safe_split" -> ((s, dir) => {
      val d = docs(s, dir)
      CorpusOps.leakageSafeSplit(d,
        CorpusOps.sharedParagraphEdges(d, col("text"), " merge "))
        .orderBy("doc_id")
    }),

    // the streaming twin of q_pack_sequences: per-bucket running offset in
    // group state (one long per bucket), verified by the BATCH oracle
    "q_stream_pack_sequences" -> ((s, dir) =>
      graft.streaming.StreamingOps
        .packSequencesAvailableNow(s, s"$dir/documents.parquet",
          buckets = 8, ctxLen = 256)
        .orderBy("doc_id")),

    // the streaming twin of q_decontaminate: a stream-STATIC broadcast join
    // (bench grams static, corpus streaming) + per-doc aggregation — the
    // canonical Structured-Streaming enrichment shape, batch-oracle-verified
    "q_stream_decontaminate" -> ((s, dir) =>
      graft.streaming.StreamingOps
        .decontaminateAvailableNow(s, s"$dir/documents.parquet", n = 5)),

    // the streaming twin of q_incremental_dedup: Bloom map-side prefilter +
    // stream-static anti-join confirm, zero state — batch-oracle-verified
    "q_stream_incremental_dedup" -> ((s, dir) =>
      graft.streaming.StreamingOps
        .incrementalDedupAvailableNow(s, s"$dir/documents.parquet")),

    // The COMPLETE training-set construction in one declared DAG — every
    // stage the proven 100 TB shape: exact dedup (one fingerprint window,
    // keep-min), benchmark decontamination (bench grams broadcast), quality
    // floor (pure column), stratified sampling (pure column), and sequence
    // packing (per-bucket window cumsum). Output = the training-example
    // manifest for the surviving corpus.
    "q_curate_training_set" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = docs(s, dir).select(col("doc_id"), col("text"), col("lang"))
      val inp = base.unionByName(
        base.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 10000).as("doc_id"), col("text"), col("lang")))
      val deduped = inp
        .withColumn("fp", TextAnalysis.docFingerprint(col("text")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("fp").orderBy("doc_id")))
        .filter(col("rn") === 1).drop("rn", "fp")
      val bench = base.filter(col("doc_id") % 11 === 3)
        .select(array_join(
          slice(TextAnalysis.words(col("text")), 3, 8), " ").as("text"))
      val clean = deduped.join(
        CorpusOps.decontaminate(deduped, bench, col("text"), n = 5)
          .filter(!col("contaminated")).select("doc_id"),
        Seq("doc_id"))
      val qual = clean.filter(TextAnalysis.qualityScore(col("text")) >= 0.65)
      val kept = qual.join(
        CorpusOps.stratifiedSample(qual, col("lang"),
          Seq("en" -> 0.5), defaultRate = 1.0, salt = "curate")
          .filter(col("keep")).select("doc_id"),
        Seq("doc_id"))
      CorpusOps.packSequences(kept,
        TextAnalysis.tokenCountWhitespace(col("text")),
        buckets = 8, ctxLen = 256).orderBy("doc_id")
    }),

    "q_pii_scrub" -> ((s, dir) => {
      val withPii = when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(PiiTail))).otherwise(col("text"))
      docs(s, dir)
        .select(col("doc_id"), CorpusOps.piiScrub(withPii).as("p"))
        .select(col("doc_id"), col("p.scrubbed").as("scrubbed"),
          col("p.n_emails").as("n_emails"), col("p.n_ips").as("n_ips"),
          col("p.n_phones").as("n_phones"))
        .orderBy("doc_id")
    }))

  /** The packing oracle — shared by the batch query and its streaming twin
    * (the streaming fold carries the same running offset per bucket). */
  private val PackOracleSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, doc_id % 8 AS bucket,
       |    CAST(len(${O.words("text")}) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, bucket, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id) AS BIGINT)
       |      AS cum_end
       |  FROM t)
       |SELECT doc_id, bucket, n_tokens,
       |  (cum_end - n_tokens) // 256 AS example_id,
       |  (cum_end - n_tokens) % 256 AS offset_in_example,
       |  (n_tokens > 0 AND (cum_end - 1) // 256 > (cum_end - n_tokens) // 256)
       |    AS crosses_boundary
       |FROM c ORDER BY doc_id""".stripMargin

  /** Mirrors `CorpusOps.cosineCol` incl. BOTH edge semantics: zero-norm →
    * 0.0, NULL input → NULL (a bare `coalesce(…, 0.0)` would diverge from
    * Spark on NULL embeddings); `dot / nullif(norms, 0)` keeps each O(dim)
    * norm fold to one appearance in the generated SQL (CASE on the norms
    * would inline them twice), and the fallback's IS NULL checks are cheap. */
  private def cosSql(a: String, b: String): String = {
    def norm(x: String) =
      s"sqrt(list_sum(list_transform($x, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    s"coalesce(list_sum(list_transform(range(1, len($a) + 1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))) / " +
      s"nullif(${norm(a)} * ${norm(b)}, 0), " +
      s"CASE WHEN $a IS NULL OR $b IS NULL THEN NULL ELSE 0.0 END)"
  }

  /** Shared by the batch q_incremental_dedup and its streaming twin: the
    * Bloom prefilter is exact-by-construction, so both reduce to this plain
    * anti-join over identical (doc_id, text) relations. */
  private val IncrementalDedupOracleSql: String = {
    val fp = AnalysisQueries.fingerprint("text")
    s"""WITH hist AS (
       |  SELECT $fp AS fp FROM documents WHERE doc_id % 2 = 0),
       |inc AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, $fp AS fp
       |  FROM documents WHERE doc_id % 2 = 1
       |  UNION ALL
       |  SELECT CAST(doc_id AS BIGINT) + 500000, $fp
       |  FROM documents WHERE doc_id % 2 = 0 AND doc_id % 6 = 0)
       |SELECT doc_id, fp FROM inc
       |WHERE NOT EXISTS (SELECT 1 FROM hist WHERE hist.fp = inc.fp)
       |ORDER BY doc_id""".stripMargin
  }

  /** Shared by the batch q_incremental_near_dup and its zero-state streaming
    * twin: delta bands probe the hot-band-capped history band index, exact
    * Jaccard verifies candidates, best history match kept per delta doc. */
  private lazy val IncrementalNearDupOracleSql: String =
    s"""WITH hist AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
         |  WHERE doc_id % 2 = 0),
         |delta AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
         |  WHERE doc_id % 2 = 1
         |  UNION ALL
         |  SELECT CAST(doc_id AS BIGINT) + 700000, text || ' xtra'
         |  FROM documents WHERE doc_id % 10 = 0),
         |hsig AS (SELECT doc_id, ${AnalysisQueries.minhashSigSql("text")} AS sig FROM hist),
         |dsig AS (SELECT doc_id, ${AnalysisQueries.minhashSigSql("text")} AS sig FROM delta),
         |hbands AS (
         |  SELECT doc_id, unnest(list_transform(range(0, len(sig) // 2), b ->
         |    {'band_idx': b,
         |     'band_key': (sig[2*b+1] * 31 + sig[2*b+2]) % 1000000007}),
         |    recursive := true)
         |  FROM hsig),
         |dbands AS (
         |  SELECT doc_id, unnest(list_transform(range(0, len(sig) // 2), b ->
         |    {'band_idx': b,
         |     'band_key': (sig[2*b+1] * 31 + sig[2*b+2]) % 1000000007}),
         |    recursive := true)
         |  FROM dsig),
         |safe AS (
         |  SELECT band_idx, band_key FROM hbands
         |  GROUP BY band_idx, band_key HAVING count(*) <= 1000),
         |hb AS (
         |  SELECT h.* FROM hbands h JOIN safe s
         |    ON h.band_idx = s.band_idx AND h.band_key = s.band_key),
         |cand AS (
         |  SELECT DISTINCT d.doc_id, h.doc_id AS hist_doc
         |  FROM dbands d JOIN hb h
         |    ON d.band_idx = h.band_idx AND d.band_key = h.band_key),
         |dsh AS (
         |  SELECT doc_id, list_distinct(${O.shingles3(O.words("text"))}) AS sh
         |  FROM delta),
         |hsh AS (
         |  SELECT doc_id, list_distinct(${O.shingles3(O.words("text"))}) AS sh
         |  FROM hist)
         |SELECT doc_id, hist_doc, jaccard FROM (
         |  SELECT doc_id, hist_doc, jaccard,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY jaccard DESC, hist_doc) AS rk
         |  FROM (
         |    SELECT cand.doc_id, cand.hist_doc,
         |      round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |        len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
         |    FROM cand
         |    JOIN dsh a ON cand.doc_id = a.doc_id
         |    JOIN hsh b ON cand.hist_doc = b.doc_id)
         |  WHERE jaccard >= 0.8)
         |WHERE rk = 1
         |ORDER BY doc_id, hist_doc""".stripMargin


  /** The doc-flag decontamination oracle — shared by the batch query and its
    * stream-static-join twin (identical gram rule, identical output shape). */
  private val DecontaminateOracleSql: String = {
    val benchText = s"array_to_string(list_slice(${O.words("text")}, 3, 10), ' ')"
    s"""WITH bench AS (
       |  SELECT DISTINCT unnest(${O.shinglesN(O.words(s"lower($benchText)"), 5)}) AS g
       |  FROM documents WHERE doc_id % 11 = 3),
       |tg AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(${O.shinglesN(O.words("lower(text)"), 5)}) AS g
       |  FROM documents),
       |hits AS (
       |  SELECT doc_id, CAST(count(*) AS INT) AS n FROM tg JOIN bench USING (g)
       |  GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(n, 0) AS n_contaminated_grams,
       |  coalesce(n, 0) > 0 AS contaminated
       |FROM documents d LEFT JOIN hits USING (doc_id) ORDER BY d.doc_id""".stripMargin
  }

  /** hashed-feature NB re-derived: per-slice bucket counts, add-one-smoothed
    * llr in integer micro-nats, per-doc exact long sums — shared by the
    * batch and streaming renderings. */
  private lazy val NbQualityOracleSql: String = {
    val bh = s"${O.polyHash("w")} % 1024"
    s"""WITH corpus AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents),
       |tok AS (
       |  SELECT doc_id, unnest(ws) AS w
       |  FROM (SELECT doc_id, ${O.words("lower(text)")} AS ws FROM corpus)),
       |posb AS (
       |  SELECT $bh AS b, CAST(count(*) AS BIGINT) AS cp FROM tok
       |  WHERE doc_id % 11 = 5 GROUP BY 1),
       |negb AS (
       |  SELECT $bh AS b, CAST(count(*) AS BIGINT) AS cn FROM tok
       |  WHERE doc_id % 11 = 7 GROUP BY 1),
       |tots AS (
       |  SELECT (SELECT CAST(coalesce(sum(cp), 0) AS BIGINT) FROM posb) AS tp,
       |         (SELECT CAST(coalesce(sum(cn), 0) AS BIGINT) FROM negb) AS tn),
       |model AS (
       |  SELECT coalesce(p.b, n.b) AS b,
       |    CAST(round((ln(CAST(coalesce(cp, 0) + 1 AS DOUBLE) /
       |        ((SELECT tp FROM tots) + 1024)) -
       |      ln(CAST(coalesce(cn, 0) + 1 AS DOUBLE) /
       |        ((SELECT tn FROM tots) + 1024))) * 1e6) AS BIGINT) AS llr
       |  FROM posb p FULL OUTER JOIN negb n ON p.b = n.b),
       |dflt AS (
       |  SELECT CAST(round((ln(1.0 / (tp + 1024)) -
       |    ln(1.0 / (tn + 1024))) * 1e6) AS BIGINT) AS llr0 FROM tots),
       |scored AS (
       |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(coalesce(m.llr, (SELECT llr0 FROM dflt))) AS BIGINT)
       |      AS llr_micro_sum
       |  FROM (SELECT doc_id, $bh AS b FROM tok) t
       |  LEFT JOIN model m ON t.b = m.b GROUP BY t.doc_id)
       |SELECT c.doc_id, coalesce(n_tokens, 0) AS n_tokens,
       |  coalesce(llr_micro_sum, 0) AS llr_micro_sum,
       |  CASE WHEN coalesce(n_tokens, 0) = 0 THEN 'unscored'
       |       WHEN coalesce(llr_micro_sum, 0) >= 0 THEN 'hi'
       |       ELSE 'lo' END AS quality
       |FROM corpus c LEFT JOIN scored USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** the five-stage refresh re-derived end-to-end (see map comment). */
  private lazy val CrawlRefreshOracleSql: String = {
      val fp = AnalysisQueries.fingerprint("text")
      def bigramsOf(src: String) =
        s"""SELECT doc_id, unnest(list_transform(
           |    range(1, greatest(len(ws), 1)),
           |    i -> {'w1': ws[i], 'w2': ws[i + 1]}), recursive := true)
           |  FROM (SELECT doc_id, ${O.words("lower(text)")} AS ws FROM $src)""".stripMargin
      def bandsOf(src: String) =
        s"""SELECT doc_id, unnest(list_transform(range(0, len(sig) // 2), b ->
           |    {'band_idx': b,
           |     'band_key': (sig[2*b+1] * 31 + sig[2*b+2]) % 1000000007}),
           |    recursive := true)
           |  FROM (SELECT doc_id, ${AnalysisQueries.minhashSigSql("text")} AS sig
           |        FROM $src)""".stripMargin
      s"""WITH d AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text, source, n_chars
         |  FROM documents),
         |hist AS (SELECT * FROM d WHERE doc_id % 2 = 0),
         |delta0 AS (
         |  SELECT * FROM d WHERE doc_id % 2 = 1
         |  UNION ALL
         |  SELECT doc_id + 500000, text, source, n_chars FROM hist
         |  WHERE doc_id % 6 = 0
         |  UNION ALL
         |  SELECT doc_id + 700000, text || ' xtra', source, n_chars FROM hist
         |  WHERE doc_id % 10 = 0),
         |urlkept AS (
         |  SELECT doc_id, text, source, n_chars FROM (
         |    SELECT *, min(doc_id) OVER (PARTITION BY canon) AS u_min FROM (
         |      SELECT *, 'https://crawl.example.com/p/' ||
         |        CAST(doc_id - CASE WHEN doc_id % 9 = 1 THEN 2 ELSE 0 END
         |          AS VARCHAR) || '?a=1' AS canon
         |      FROM delta0))
         |  WHERE doc_id = u_min),
         |histfp AS (SELECT DISTINCT $fp AS fp FROM hist),
         |exactnew AS (
         |  SELECT u.doc_id, u.text, u.source, u.n_chars FROM
         |    (SELECT *, $fp AS fp FROM urlkept) u
         |  LEFT JOIN histfp h USING (fp) WHERE h.fp IS NULL),
         |hbands AS (${bandsOf("hist")}),
         |dbands AS (${bandsOf("exactnew")}),
         |safe AS (
         |  SELECT band_idx, band_key FROM hbands
         |  GROUP BY band_idx, band_key HAVING count(*) <= 1000),
         |hb AS (
         |  SELECT h.* FROM hbands h JOIN safe s
         |    ON h.band_idx = s.band_idx AND h.band_key = s.band_key),
         |cand AS (
         |  SELECT DISTINCT db.doc_id, hb.doc_id AS hist_doc
         |  FROM dbands db JOIN hb
         |    ON db.band_idx = hb.band_idx AND db.band_key = hb.band_key),
         |dsh AS (
         |  SELECT doc_id, list_distinct(${O.shingles3(O.words("text"))}) AS sh
         |  FROM exactnew),
         |hsh AS (
         |  SELECT doc_id, list_distinct(${O.shingles3(O.words("text"))}) AS sh
         |  FROM hist),
         |flagged AS (
         |  SELECT DISTINCT cand.doc_id FROM cand
         |  JOIN dsh a ON cand.doc_id = a.doc_id
         |  JOIN hsh b ON cand.hist_doc = b.doc_id
         |  WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |    len(list_distinct(list_concat(a.sh, b.sh))), 4) >= 0.8),
         |nearnew AS (
         |  SELECT e.* FROM exactnew e LEFT JOIN flagged f USING (doc_id)
         |  WHERE f.doc_id IS NULL),
         |lmref AS (SELECT doc_id, text FROM hist WHERE doc_id % 11 = 5),
         |refbg AS (
         |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
         |  FROM (${bigramsOf("lmref")}) GROUP BY w1, w2),
         |refc1 AS (
         |  SELECT w1, CAST(sum(c) AS BIGINT) AS c1 FROM refbg GROUP BY w1),
         |vocab AS (
         |  SELECT count(DISTINCT w) AS v FROM (
         |    SELECT unnest(ws) AS w
         |    FROM (SELECT ${O.words("lower(text)")} AS ws FROM lmref))),
         |docbg AS (${bigramsOf("nearnew")}),
         |probes AS (
         |  SELECT dg.doc_id,
         |    CAST(round(ln(CAST(coalesce(b.c, 0) + 1 AS DOUBLE) /
         |      (coalesce(u.c1, 0) + (SELECT v FROM vocab))) * 1e6) AS BIGINT)
         |      AS lp
         |  FROM docbg dg
         |  LEFT JOIN refbg b ON dg.w1 = b.w1 AND dg.w2 = b.w2
         |  LEFT JOIN refc1 u ON dg.w1 = u.w1),
         |lmscored AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum(lp) AS BIGINT) AS lp_micro_sum
         |  FROM probes GROUP BY doc_id),
         |bucketed AS (
         |  SELECT n.doc_id, n.source, n.n_chars,
         |    CASE WHEN coalesce(s.n_bigrams, 0) = 0 THEN 'unscored'
         |         WHEN s.lp_micro_sum / CAST(s.n_bigrams AS DOUBLE)
         |           >= -3470000.0 THEN 'head'
         |         WHEN s.lp_micro_sum / CAST(s.n_bigrams AS DOUBLE)
         |           >= -3540000.0 THEN 'middle'
         |         ELSE 'tail' END AS bucket
         |  FROM nearnew n LEFT JOIN lmscored s USING (doc_id))
         |SELECT doc_id, source, bucket, rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY n_chars DESC, doc_id) AS rk
         |  FROM bucketed WHERE bucket <> 'tail')
         |WHERE rk <= 12 ORDER BY doc_id""".stripMargin
  }

  def oracles: Map[String, String] = Map(

    "q_decontaminate" -> DecontaminateOracleSql,

    // identical decontamination semantics through the stream-static join
    "q_stream_decontaminate" -> DecontaminateOracleSql,

    // the Bloom prefilter is exact-by-construction (no false negatives; hits
    // are confirmed by the anti-join), so the oracle is the plain anti-join
    "q_incremental_dedup" -> IncrementalDedupOracleSql,

    // identical semantics through the stream-static rendering
    "q_stream_incremental_dedup" -> IncrementalDedupOracleSql,

    // the canonicalization mirrored step-by-step (fragment strip, authority
    // lowercase + default-port drop, tracking-param filter, param sort)
    "q_url_canonical_dedup" ->
      s"""WITH d AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |    (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://' ELSE 'https://' END ||
         |     CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END ||
         |     '.example.com' ||
         |     CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END ||
         |     '/page/' || CAST(doc_id % 7 AS VARCHAR) ||
         |     CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&b=2&a=1'
         |          ELSE '?a=1&b=2' END ||
         |     CASE WHEN doc_id % 4 = 0 THEN '#sec' ELSE '' END) AS raw_url
         |  FROM documents),
         |canon AS (
         |  SELECT doc_id, raw_url, hostnorm ||
         |    (CASE WHEN path0 = '' THEN '/' ELSE path0 END) ||
         |    (CASE WHEN len(params) > 0
         |          THEN '?' || array_to_string(params, '&') ELSE '' END)
         |    AS canonical_url
         |  FROM (
         |    SELECT doc_id, raw_url,
         |      regexp_replace(regexp_replace(lower(schemehost),
         |        '^(https://[^/?]*):443$$', '\\1'),
         |        '^(http://[^/?]*):80$$', '\\1') AS hostnorm,
         |      CASE WHEN strpos(rest, '?') > 0
         |           THEN substr(rest, 1, strpos(rest, '?') - 1) ELSE rest END
         |        AS path0,
         |      list_sort(list_filter(string_split(
         |        CASE WHEN strpos(rest, '?') > 0
         |             THEN substr(rest, strpos(rest, '?') + 1) ELSE '' END, '&'),
         |        p -> p <> '' AND NOT starts_with(p, 'utm_')
         |          AND NOT starts_with(p, 'fbclid=')
         |          AND NOT starts_with(p, 'gclid=')
         |          AND NOT starts_with(p, 'ref='))) AS params
         |    FROM (
         |      SELECT doc_id, raw_url,
         |        regexp_extract(nofrag, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)', 1)
         |          AS schemehost,
         |        substr(nofrag, len(regexp_extract(nofrag,
         |          '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)', 1)) + 1) AS rest
         |      FROM (SELECT doc_id, raw_url,
         |              regexp_replace(raw_url, '#.*$$', '') AS nofrag
         |            FROM d))))
         |SELECT doc_id, raw_url, canonical_url,
         |  doc_id = min(doc_id) OVER (PARTITION BY canonical_url) AS keep
         |FROM canon ORDER BY doc_id""".stripMargin,

    // the in-plane bigram LM mirrored end-to-end: add-one-smoothed
    // probabilities from the ref slice, integer micro-nat log-probs (exact
    // long sums — no float aggregation), threshold bucketing on sum/count
    "q_lm_quality" -> {
      def bigramsOf(src: String) =
        s"""SELECT doc_id, unnest(list_transform(
           |    range(1, greatest(len(ws), 1)),
           |    i -> {'w1': ws[i], 'w2': ws[i + 1]}), recursive := true)
           |  FROM (SELECT doc_id, ${O.words("lower(text)")} AS ws FROM $src)""".stripMargin
      s"""WITH corpus AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents),
         |ref AS (SELECT doc_id, text FROM corpus WHERE doc_id % 11 = 5),
         |refbg0 AS (${bigramsOf("ref")}),
         |refbg AS (
         |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM refbg0
         |  GROUP BY w1, w2),
         |refc1 AS (
         |  SELECT w1, CAST(sum(c) AS BIGINT) AS c1 FROM refbg GROUP BY w1),
         |vocab AS (
         |  SELECT count(DISTINCT w) AS v FROM (
         |    SELECT unnest(ws) AS w
         |    FROM (SELECT ${O.words("lower(text)")} AS ws FROM ref))),
         |docbg AS (${bigramsOf("corpus")}),
         |probes AS (
         |  SELECT d.doc_id,
         |    CAST(round(ln(CAST(coalesce(b.c, 0) + 1 AS DOUBLE) /
         |      (coalesce(u.c1, 0) + (SELECT v FROM vocab))) * 1e6) AS BIGINT)
         |      AS lp
         |  FROM docbg d
         |  LEFT JOIN refbg b ON d.w1 = b.w1 AND d.w2 = b.w2
         |  LEFT JOIN refc1 u ON d.w1 = u.w1),
         |scored AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum(lp) AS BIGINT) AS lp_micro_sum
         |  FROM probes GROUP BY doc_id)
         |SELECT c.doc_id,
         |  coalesce(n_bigrams, 0) AS n_bigrams,
         |  coalesce(lp_micro_sum, 0) AS lp_micro_sum,
         |  CASE WHEN coalesce(n_bigrams, 0) = 0 THEN 'unscored'
         |       WHEN lp_micro_sum / CAST(n_bigrams AS DOUBLE) >= -3470000.0 THEN 'head'
         |       WHEN lp_micro_sum / CAST(n_bigrams AS DOUBLE) >= -3540000.0 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM corpus c LEFT JOIN scored USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    // hashed-feature NB re-derived: per-slice bucket counts, add-one-smoothed
    // llr in integer micro-nats, per-doc exact long sums
    "q_nb_quality" -> NbQualityOracleSql,

    // the streaming twin scores the same corpus through the same model —
    // one oracle pins both renderings
    "q_stream_nb_quality" -> NbQualityOracleSql,

    // DSIR re-derived: hashed uni+bigram llr vs the target slice, integer
    // micro-nat Gumbel keys from the cascaded doc_id hash, top-50
    "q_dsir_select" -> {
      val bh = s"${O.polyHash("f")} % 1024"
      val gh = O.polyHash(
        s"CAST(${O.polyHash("(CAST(doc_id AS VARCHAR) || ':dsir')")} AS VARCHAR)")
      s"""WITH corpus AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents),
         |fx AS (
         |  SELECT doc_id, list_concat(ws, ${O.shingles2("ws")}) AS fs
         |  FROM (SELECT doc_id, ${O.words("lower(text)")} AS ws FROM corpus)),
         |feat AS (SELECT doc_id, unnest(fs) AS f FROM fx),
         |tgtb AS (
         |  SELECT $bh AS b, CAST(count(*) AS BIGINT) AS ct FROM feat
         |  WHERE doc_id % 11 = 5 GROUP BY 1),
         |rawb AS (
         |  SELECT $bh AS b, CAST(count(*) AS BIGINT) AS cr FROM feat GROUP BY 1),
         |tots AS (
         |  SELECT (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) FROM tgtb) AS tt,
         |         (SELECT CAST(coalesce(sum(cr), 0) AS BIGINT) FROM rawb) AS tr),
         |model AS (
         |  SELECT coalesce(t.b, r.b) AS b,
         |    CAST(round((ln(CAST(coalesce(ct, 0) + 1 AS DOUBLE) /
         |        ((SELECT tt FROM tots) + 1024)) -
         |      ln(CAST(coalesce(cr, 0) + 1 AS DOUBLE) /
         |        ((SELECT tr FROM tots) + 1024))) * 1e6) AS BIGINT) AS llr
         |  FROM tgtb t FULL OUTER JOIN rawb r ON t.b = r.b),
         |dflt AS (
         |  SELECT CAST(round((ln(1.0 / (tt + 1024)) -
         |    ln(1.0 / (tr + 1024))) * 1e6) AS BIGINT) AS llr0 FROM tots),
         |scored AS (
         |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         |    CAST(sum(coalesce(m.llr, (SELECT llr0 FROM dflt))) AS BIGINT)
         |      AS llr_micro_sum
         |  FROM (SELECT doc_id, $bh AS b FROM feat) t
         |  LEFT JOIN model m ON t.b = m.b GROUP BY t.doc_id)
         |SELECT doc_id, n_feats, llr_micro_sum,
         |  llr_micro_sum + CAST(round(-ln(-ln(
         |    (CAST($gh % 1048576 AS DOUBLE) + 0.5) / 1048576.0)) * 1e6)
         |    AS BIGINT) AS key_micro
         |FROM scored
         |ORDER BY key_micro DESC, doc_id LIMIT 50""".stripMargin
    },

    // NB selection precision re-derived end-to-end: planted corpus, seed
    // slices, hashed-NB scoring of the held-out docs, top-k by (llr, id),
    // hit count against the planted ground truth
    "q_nb_select_precision" -> {
      val bh = s"${O.polyHash("w")} % 1024"
      s"""WITH corpus AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |    text || CASE WHEN doc_id % 13 = 3
         |      THEN repeat(' $PlantTokens', 8) ELSE '' END AS text
         |  FROM documents),
         |held AS (
         |  SELECT doc_id FROM corpus
         |  WHERE NOT (doc_id % 13 = 3 AND doc_id % 2 = 1)
         |    AND NOT (doc_id % 13 <> 3 AND doc_id % 11 = 7)),
         |tok AS (
         |  SELECT doc_id, unnest(ws) AS w
         |  FROM (SELECT doc_id, ${O.words("lower(text)")} AS ws FROM corpus)),
         |posb AS (
         |  SELECT $bh AS b, CAST(count(*) AS BIGINT) AS cp FROM tok
         |  WHERE doc_id % 13 = 3 AND doc_id % 2 = 1 GROUP BY 1),
         |negb AS (
         |  SELECT $bh AS b, CAST(count(*) AS BIGINT) AS cn FROM tok
         |  WHERE doc_id % 13 <> 3 AND doc_id % 11 = 7 GROUP BY 1),
         |tots AS (
         |  SELECT (SELECT CAST(coalesce(sum(cp), 0) AS BIGINT) FROM posb) AS tp,
         |         (SELECT CAST(coalesce(sum(cn), 0) AS BIGINT) FROM negb) AS tn),
         |model AS (
         |  SELECT coalesce(p.b, n.b) AS b,
         |    CAST(round((ln(CAST(coalesce(cp, 0) + 1 AS DOUBLE) /
         |        ((SELECT tp FROM tots) + 1024)) -
         |      ln(CAST(coalesce(cn, 0) + 1 AS DOUBLE) /
         |        ((SELECT tn FROM tots) + 1024))) * 1e6) AS BIGINT) AS llr
         |  FROM posb p FULL OUTER JOIN negb n ON p.b = n.b),
         |dflt AS (
         |  SELECT CAST(round((ln(1.0 / (tp + 1024)) -
         |    ln(1.0 / (tn + 1024))) * 1e6) AS BIGINT) AS llr0 FROM tots),
         |scored AS (
         |  SELECT t.doc_id,
         |    CAST(sum(coalesce(m.llr, (SELECT llr0 FROM dflt))) AS BIGINT)
         |      AS llr_micro_sum
         |  FROM (SELECT doc_id, $bh AS b FROM tok
         |        WHERE doc_id IN (SELECT doc_id FROM held)) t
         |  LEFT JOIN model m ON t.b = m.b GROUP BY t.doc_id),
         |kk AS (
         |  SELECT CAST(count(*) AS BIGINT) AS k FROM held WHERE doc_id % 13 = 3),
         |topk AS (
         |  SELECT doc_id FROM scored
         |  QUALIFY row_number() OVER (ORDER BY llr_micro_sum DESC, doc_id)
         |    <= (SELECT k FROM kk))
         |SELECT CAST((SELECT k FROM kk) AS INT) AS n_planted,
         |  CAST(count(*) AS INT) AS n_selected,
         |  CAST(coalesce(sum(CASE WHEN doc_id % 13 = 3 THEN 1 ELSE 0 END), 0)
         |    AS INT) AS n_hits
         |FROM topk""".stripMargin
    },

    // DSIR selection precision re-derived: planted corpus, target = planted
    // odd half, hashed uni+bigram llr, Gumbel top-k, planted hit count
    "q_dsir_select_precision" -> {
      val bh = s"${O.polyHash("f")} % 1024"
      val gh = O.polyHash(
        s"CAST(${O.polyHash("(CAST(doc_id AS VARCHAR) || ':dsir')")} AS VARCHAR)")
      s"""WITH corpus AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |    text || CASE WHEN doc_id % 13 = 3
         |      THEN repeat(' $PlantTokens', 8) ELSE '' END AS text
         |  FROM documents),
         |fx AS (
         |  SELECT doc_id, list_concat(ws, ${O.shingles2("ws")}) AS fs
         |  FROM (SELECT doc_id, ${O.words("lower(text)")} AS ws FROM corpus)),
         |feat AS (SELECT doc_id, unnest(fs) AS f FROM fx),
         |tgtb AS (
         |  SELECT $bh AS b, CAST(count(*) AS BIGINT) AS ct FROM feat
         |  WHERE doc_id % 13 = 3 AND doc_id % 2 = 1 GROUP BY 1),
         |rawb AS (
         |  SELECT $bh AS b, CAST(count(*) AS BIGINT) AS cr FROM feat GROUP BY 1),
         |tots AS (
         |  SELECT (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) FROM tgtb) AS tt,
         |         (SELECT CAST(coalesce(sum(cr), 0) AS BIGINT) FROM rawb) AS tr),
         |model AS (
         |  SELECT coalesce(t.b, r.b) AS b,
         |    CAST(round((ln(CAST(coalesce(ct, 0) + 1 AS DOUBLE) /
         |        ((SELECT tt FROM tots) + 1024)) -
         |      ln(CAST(coalesce(cr, 0) + 1 AS DOUBLE) /
         |        ((SELECT tr FROM tots) + 1024))) * 1e6) AS BIGINT) AS llr
         |  FROM tgtb t FULL OUTER JOIN rawb r ON t.b = r.b),
         |dflt AS (
         |  SELECT CAST(round((ln(1.0 / (tt + 1024)) -
         |    ln(1.0 / (tr + 1024))) * 1e6) AS BIGINT) AS llr0 FROM tots),
         |scored AS (
         |  SELECT t.doc_id,
         |    CAST(sum(coalesce(m.llr, (SELECT llr0 FROM dflt))) AS BIGINT)
         |      AS llr_micro_sum
         |  FROM (SELECT doc_id, $bh AS b FROM feat) t
         |  LEFT JOIN model m ON t.b = m.b GROUP BY t.doc_id),
         |kk AS (
         |  SELECT CAST(count(*) AS BIGINT) AS k FROM corpus WHERE doc_id % 13 = 3),
         |topk AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, llr_micro_sum + CAST(round(-ln(-ln(
         |      (CAST($gh % 1048576 AS DOUBLE) + 0.5) / 1048576.0)) * 1e6)
         |      AS BIGINT) AS key_micro
         |    FROM scored)
         |  QUALIFY row_number() OVER (ORDER BY key_micro DESC, doc_id)
         |    <= (SELECT k FROM kk))
         |SELECT CAST((SELECT k FROM kk) AS INT) AS n_planted,
         |  CAST(count(*) AS INT) AS n_selected,
         |  CAST(coalesce(sum(CASE WHEN doc_id % 13 = 3 THEN 1 ELSE 0 END), 0)
         |    AS INT) AS n_hits
         |FROM topk""".stripMargin
    },

    // delta bands × history bands equi-join (history hot-band cap), exact
    // Jaccard on candidates, best match per delta doc
    "q_incremental_near_dup" -> IncrementalNearDupOracleSql,

    // identical semantics through the zero-state stream-static rendering
    "q_stream_incremental_near_dup" -> IncrementalNearDupOracleSql,


    "q_semantic_dedup" -> {
      val subHash = O.polyHash("CAST(vec_id AS VARCHAR)")
      s"""WITH base AS (SELECT vec_id, embedding FROM embeddings),
         |inp AS (
         |  SELECT vec_id, embedding FROM base
         |  UNION ALL
         |  SELECT vec_id + 100000, embedding FROM base WHERE vec_id % 6 = 0),
         |cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
         |sims AS (
         |  SELECT i.vec_id, i.embedding, c.cid, ${cosSql("i.embedding", "c.cv")} AS sim
         |  FROM inp i, cents c),
         |asg AS (
         |  SELECT vec_id, embedding, cid AS cluster FROM (
         |    SELECT vec_id, embedding, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
         |    FROM sims) WHERE rn = 1),
         |split AS (
         |  SELECT vec_id, embedding, cluster,
         |    $subHash % CAST(ceil(
         |      CAST(count(*) OVER (PARTITION BY cluster) AS DOUBLE) / 40.0)
         |      AS BIGINT) AS sub
         |  FROM asg),
         |dups AS (
         |  SELECT DISTINCT b.vec_id FROM split a JOIN split b
         |  ON a.cluster = b.cluster AND a.sub = b.sub AND a.vec_id < b.vec_id
         |  WHERE round(${cosSql("a.embedding", "b.embedding")}, 6) >= 0.99)
         |SELECT vec_id, cluster,
         |  vec_id NOT IN (SELECT vec_id FROM dups) AS keep
         |FROM asg ORDER BY vec_id""".stripMargin
    },

    "q_stratified_sample" -> {
      val h = O.polyHash(
        s"CAST(${O.polyHash("(CAST(doc_id AS VARCHAR) || ':mix1')")} AS VARCHAR)")
      s"""SELECT doc_id, lang AS stratum,
         |  $h % 10000 AS sample_bucket,
         |  CAST($h % 10000 AS DOUBLE) <
         |    (CASE WHEN lang = 'zh' THEN 0.7 WHEN lang = 'en' THEN 0.3
         |          ELSE 1.0 END) * 10000.0 AS keep
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q_temperature_sample" -> {
      val h = O.polyHash(
        s"CAST(${O.polyHash("(CAST(doc_id AS VARCHAR) || ':temp1')")} AS VARCHAR)")
      s"""WITH sized AS (
         |  SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n_s
         |  FROM documents GROUP BY lang),
         |agg AS (
         |  SELECT stratum, n_s, CAST(sum(n_s) OVER () AS BIGINT) AS n_total
         |  FROM sized),
         |wgt AS (
         |  SELECT stratum, n_s, n_total,
         |    CAST(round(sqrt(CAST(n_s AS DOUBLE) / CAST(n_total AS DOUBLE))
         |      * 1e9) AS BIGINT) AS w_int
         |  FROM agg),
         |rates AS (
         |  SELECT stratum,
         |    least(1.0, (CAST(w_int AS DOUBLE) /
         |      CAST(CAST(sum(w_int) OVER () AS BIGINT) AS DOUBLE))
         |      * 0.5 * CAST(n_total AS DOUBLE) / CAST(n_s AS DOUBLE)) AS rate
         |  FROM wgt)
         |SELECT d.doc_id, d.lang AS stratum, round(r.rate, 6) AS rate,
         |  CAST($h % 10000 AS DOUBLE) < r.rate * 10000.0 AS keep
         |FROM documents d JOIN rates r ON r.stratum = d.lang
         |ORDER BY d.doc_id""".stripMargin
    },

    "q_decontaminate_spans" -> {
      val benchText = s"array_to_string(list_slice(${O.words("text")}, 3, 10), ' ')"
      s"""WITH bench AS (
         |  SELECT DISTINCT unnest(${O.shinglesN(O.words(s"lower($benchText)"), 5)}) AS g
         |  FROM documents WHERE doc_id % 11 = 3),
         |w AS (SELECT doc_id, ${O.words("text")} AS ws FROM documents),
         |grams AS (
         |  SELECT doc_id, i - 1 AS start,
         |    lower(array_to_string(list_slice(ws, i, i + 4), ' ')) AS g
         |  FROM w, unnest(range(1, greatest(len(ws) - 4, 0) + 1)) AS u(i)),
         |cov AS (
         |  SELECT DISTINCT doc_id, start + o AS idx
         |  FROM grams JOIN bench USING (g), unnest(range(0, 5)) AS v(o)),
         |pos AS (
         |  SELECT doc_id, i - 1 AS idx, ws[i] AS word
         |  FROM w, unnest(range(1, len(ws) + 1)) AS u(i)),
         |kept AS (
         |  SELECT p.doc_id, CAST(count(*) AS INT) AS n_kept,
         |    string_agg(word, ' ' ORDER BY p.idx) AS text_clean
         |  FROM pos p LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.idx = c.idx
         |  WHERE c.idx IS NULL GROUP BY p.doc_id)
         |SELECT w.doc_id, CAST(len(ws) AS INT) AS n_words,
         |  CAST(len(ws) - coalesce(n_kept, 0) AS INT) AS n_dropped,
         |  coalesce(text_clean, '') AS text_clean
         |FROM w LEFT JOIN kept USING (doc_id) ORDER BY w.doc_id""".stripMargin
    },

    "q_paragraph_dedup" ->
      s"""WITH p AS (
         |  SELECT doc_id, i - 1 AS seq, trim(l[i]) AS para
         |  FROM (SELECT doc_id, string_split(text, ' merge ') AS l FROM documents),
         |    unnest(range(1, len(l) + 1)) AS u(i)
         |  WHERE trim(l[i]) <> ''),
         |k AS (
         |  SELECT doc_id, seq, para,
         |    row_number() OVER (
         |      PARTITION BY ${AnalysisQueries.fingerprint("para")}
         |      ORDER BY doc_id, seq) = 1 AS kept
         |  FROM p),
         |perdoc AS (
         |  SELECT doc_id, CAST(count(*) AS INT) AS n_paras,
         |    CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS INT) AS n_kept,
         |    coalesce(array_to_string(
         |      list(CASE WHEN kept THEN para END ORDER BY seq)
         |        .list_filter(x -> x IS NOT NULL), chr(10)), '') AS text_kept
         |  FROM k GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(n_paras, 0) AS n_paras,
         |  coalesce(n_kept, 0) AS n_kept, coalesce(text_kept, '') AS text_kept
         |FROM (SELECT DISTINCT doc_id FROM documents) d
         |LEFT JOIN perdoc USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    "q_self_substring_dedup" ->
      s"""WITH w AS (SELECT doc_id, ${O.words("text")} AS ws FROM documents),
         |occ AS (
         |  SELECT doc_id, i - 1 AS start,
         |    lower(array_to_string(list_slice(ws, i, i + 5), ' ')) AS g
         |  FROM w, unnest(range(1, greatest(len(ws) - 5, 0) + 1)) AS u(i)),
         |dup AS (
         |  SELECT g, min(doc_id) AS kdoc FROM occ GROUP BY g HAVING count(*) >= 2),
         |ks AS (
         |  SELECT o.g, d.kdoc, min(o.start) AS kstart
         |  FROM occ o JOIN dup d ON o.g = d.g AND o.doc_id = d.kdoc
         |  GROUP BY o.g, d.kdoc),
         |rem AS (
         |  SELECT o.doc_id, o.start FROM occ o JOIN ks ON o.g = ks.g
         |  WHERE NOT (o.doc_id = ks.kdoc AND o.start = ks.kstart)),
         |cov AS (
         |  SELECT DISTINCT doc_id, start + o AS idx
         |  FROM rem, unnest(range(0, 6)) AS v(o)),
         |pos AS (
         |  SELECT doc_id, i - 1 AS idx, ws[i] AS word
         |  FROM w, unnest(range(1, len(ws) + 1)) AS u(i)),
         |kept AS (
         |  SELECT p.doc_id, CAST(count(*) AS INT) AS n_kept,
         |    string_agg(word, ' ' ORDER BY p.idx) AS text_clean
         |  FROM pos p LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.idx = c.idx
         |  WHERE c.idx IS NULL GROUP BY p.doc_id)
         |SELECT w.doc_id, CAST(len(ws) AS INT) AS n_words,
         |  CAST(len(ws) - coalesce(n_kept, 0) AS INT) AS n_dropped,
         |  coalesce(text_clean, '') AS text_clean
         |FROM w LEFT JOIN kept USING (doc_id) ORDER BY w.doc_id""".stripMargin,

    "q_embed_quantize" ->
      s"""WITH q AS (
         |  SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
         |      AS scale
         |  FROM embeddings)
         |SELECT vec_id, round(scale, 6) AS scale,
         |  array_to_string(list_transform(embedding, x ->
         |    CAST(CASE WHEN scale = 0 THEN 0
         |              ELSE round(CAST(x AS DOUBLE) / scale) END AS INT)), ',')
         |    AS q_str
         |FROM q ORDER BY vec_id""".stripMargin,

    "q_embed_quant_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |dq AS (
         |  SELECT vec_id, list_transform(embedding, x ->
         |    CASE WHEN scale = 0 THEN 0.0
         |         ELSE round(CAST(x AS DOUBLE) / scale) * scale END) AS embedding
         |  FROM (SELECT vec_id, embedding,
         |          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
         |            / 127.0 AS scale
         |        FROM e)),
         |qf AS (SELECT embedding AS qv FROM e WHERE vec_id = 1),
         |qd AS (SELECT embedding AS qv FROM dq WHERE vec_id = 1),
         |topf AS (
         |  SELECT vec_id FROM (
         |    SELECT e.vec_id, round(${cosSql("e.embedding", "qf.qv")}, 6) AS sim
         |    FROM e, qf WHERE e.vec_id <> 1)
         |  ORDER BY sim DESC, vec_id LIMIT 10),
         |topq AS (
         |  SELECT vec_id FROM (
         |    SELECT dq.vec_id, round(${cosSql("dq.embedding", "qd.qv")}, 6) AS sim
         |    FROM dq, qd WHERE dq.vec_id <> 1)
         |  ORDER BY sim DESC, vec_id LIMIT 10)
         |SELECT CAST(len(list_intersect(f.l, t.l)) AS INT) AS overlap_at_10,
         |  array_to_string(t.l, ',') AS quant_top_ids
         |FROM (SELECT list_sort(list(vec_id)) AS l FROM topf) f,
         |     (SELECT list_sort(list(vec_id)) AS l FROM topq) t""".stripMargin,

    // MRL recall re-derived with 1-based inclusive list slicing for the
    // 16-dim prefix
    "q_mrl_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |tr AS (SELECT vec_id, embedding[1:16] AS embedding FROM e),
         |qf AS (SELECT embedding AS qv FROM e WHERE vec_id = 1),
         |qt AS (SELECT embedding AS qv FROM tr WHERE vec_id = 1),
         |topf AS (
         |  SELECT vec_id FROM (
         |    SELECT e.vec_id, round(${cosSql("e.embedding", "qf.qv")}, 6) AS sim
         |    FROM e, qf WHERE e.vec_id <> 1)
         |  ORDER BY sim DESC, vec_id LIMIT 10),
         |topt AS (
         |  SELECT vec_id FROM (
         |    SELECT tr.vec_id, round(${cosSql("tr.embedding", "qt.qv")}, 6) AS sim
         |    FROM tr, qt WHERE tr.vec_id <> 1)
         |  ORDER BY sim DESC, vec_id LIMIT 10)
         |SELECT CAST(len(list_intersect(f.l, t.l)) AS INT) AS overlap_at_10,
         |  array_to_string(t.l, ',') AS trunc_top_ids
         |FROM (SELECT list_sort(list(vec_id)) AS l FROM topf) f,
         |     (SELECT list_sort(list(vec_id)) AS l FROM topt) t""".stripMargin,

    "q_dedup_components" ->
      s"""WITH RECURSIVE
         |p AS (
         |  SELECT DISTINCT doc_id,
         |    ${AnalysisQueries.fingerprint("trim(x)")} AS fp
         |  FROM (SELECT doc_id, unnest(string_split(text, ' merge ')) AS x
         |        FROM documents)
         |  WHERE trim(x) <> ''),
         |m AS (SELECT fp, min(doc_id) AS root FROM p GROUP BY fp),
         |e0 AS (
         |  SELECT DISTINCT m.root AS src, p.doc_id AS dst
         |  FROM p JOIN m USING (fp) WHERE p.doc_id <> m.root),
         |es AS (SELECT src AS a, dst AS b FROM e0
         |       UNION SELECT dst AS a, src AS b FROM e0),
         |r AS (
         |  SELECT DISTINCT a AS v, a AS c FROM es
         |  UNION
         |  SELECT es.b AS v, r.c AS c FROM r JOIN es ON es.a = r.v)
         |SELECT v AS doc_id, min(c) AS component
         |FROM r GROUP BY v ORDER BY v""".stripMargin,

    // the five-stage refresh re-derived end-to-end: the URL stage is
    // construction-predicting (canonicalizing THESE urls provably reduces to
    // lowercase host + utm drop), the dedup/near-dup/LM stages mirror their
    // standalone oracles over the composed intermediate sets
    "q_crawl_refresh" -> CrawlRefreshOracleSql,

    // the persisted rendering changes WHERE stage outputs live (parquet
    // behind done-markers), never WHAT they contain — one oracle pins both
    "q_crawl_refresh_persisted" -> CrawlRefreshOracleSql,

    // the per-(source, text) grouping is the fingerprint aggregation made
    // naive: grouping by the text itself gives identical counts to the
    // engine's xxhash64 fingerprints (which exist so text never shuffles)
    "q_corpus_profile" ->
      s"""WITH aug AS (
         |  SELECT source, text FROM documents
         |  UNION ALL
         |  SELECT source, text FROM documents WHERE doc_id % 10 = 0),
         |pertext AS (
         |  SELECT source, text, count(*) AS n FROM aug GROUP BY source, text)
         |SELECT source,
         |  CAST(sum(n) AS BIGINT) AS n_docs,
         |  count(*) AS n_distinct_docs,
         |  CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_docs,
         |  CAST(sum(length(text) * n) AS BIGINT) AS n_chars,
         |  CAST(sum(len(${O.words("text")}) * n) AS BIGINT) AS n_tokens,
         |  round(sum(length(text) * n)::DOUBLE / sum(n), 2) AS avg_chars
         |FROM pertext GROUP BY source ORDER BY source""".stripMargin,

    // the two-stage grouped top-N reduces to the naive per-source window
    // top-N (stage 1 never drops a global top-quota member)
    "q_source_quota" ->
      s"""SELECT doc_id, source, rk FROM (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY n_chars DESC, doc_id) AS rk
         |  FROM documents)
         |WHERE rk <= 15 ORDER BY doc_id""".stripMargin,

    // the recursive-CTE component labeling + the stratifiedSample hash
    // cascade over the COMPONENT id
    "q_leakage_safe_split" -> {
      val h = O.polyHash(
        s"CAST(${O.polyHash("(CAST(component AS VARCHAR) || ':split')")} AS VARCHAR)")
      s"""WITH RECURSIVE
         |p AS (
         |  SELECT DISTINCT doc_id,
         |    ${AnalysisQueries.fingerprint("trim(x)")} AS fp
         |  FROM (SELECT doc_id, unnest(string_split(text, ' merge ')) AS x
         |        FROM documents)
         |  WHERE trim(x) <> ''),
         |m AS (SELECT fp, min(doc_id) AS root FROM p GROUP BY fp),
         |e0 AS (
         |  SELECT DISTINCT m.root AS src, p.doc_id AS dst
         |  FROM p JOIN m USING (fp) WHERE p.doc_id <> m.root),
         |es AS (SELECT src AS a, dst AS b FROM e0
         |       UNION SELECT dst AS a, src AS b FROM e0),
         |r AS (
         |  SELECT DISTINCT a AS v, a AS c FROM es
         |  UNION
         |  SELECT es.b AS v, r.c AS c FROM r JOIN es ON es.a = r.v),
         |comp AS (SELECT v AS doc_id, min(c) AS component FROM r GROUP BY v),
         |assigned AS (
         |  SELECT d.doc_id, coalesce(comp.component, d.doc_id) AS component
         |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.doc_id)
         |SELECT doc_id, component,
         |  CASE WHEN $h % 10000 < 8000 THEN 'train'
         |       WHEN $h % 10000 < 9000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM assigned ORDER BY doc_id""".stripMargin
    },

    // Okapi BM25 re-derived; constants written as the same UNFOLDED float
    // ops the engine computes ((1.2 + 1.0), (1.0 - 0.75)) so both engines
    // fold to bit-identical doubles
    "q_bm25_search" ->
      s"""WITH base AS (
         |  SELECT doc_id, ${O.words("lower(text)")} AS ws FROM documents),
         |stats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(len(ws)) AS DOUBLE) / count(*) AS avgdl FROM base),
         |tf AS (
         |  SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, w AS term,
         |    CAST(count(*) AS DOUBLE) AS tf
         |  FROM (SELECT doc_id, ws, unnest(ws) AS w FROM base)
         |  WHERE w IN ('spark', 'table', 'scan')
         |  GROUP BY 1, 2, 3),
         |idf AS (
         |  SELECT term,
         |    ln((CAST((SELECT n FROM stats) AS DOUBLE) -
         |        CAST(count(*) AS DOUBLE) + 0.5) /
         |      (CAST(count(*) AS DOUBLE) + 0.5) + 1.0) AS idf
         |  FROM tf GROUP BY term),
         |p AS (
         |  SELECT doc_id,
         |    CAST(round(idf * (tf * (1.2 + 1.0)) /
         |      (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl /
         |        (SELECT avgdl FROM stats))) * 1e6) AS BIGINT) AS s
         |  FROM tf JOIN idf USING (term))
         |SELECT doc_id, CAST(count(*) AS INT) AS n_terms_hit,
         |  CAST(sum(s) AS BIGINT) AS score_micro
         |FROM p GROUP BY doc_id
         |ORDER BY score_micro DESC, doc_id LIMIT 10""".stripMargin,

    // tf from unnested lowercase tokens, df from tf, smooth idf in integer
    // micro-nats, rank by (score desc, term asc)
    "q_tfidf_top_terms" ->
      s"""WITH tf AS (
         |  SELECT doc_id, w AS term, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(${O.words("lower(text)")}) AS w
         |        FROM documents)
         |  GROUP BY 1, 2),
         |idf AS (
         |  SELECT term,
         |    CAST(round(ln(((SELECT count(*) FROM documents) + 1.0) /
         |      (count(*) + 1.0)) * 1e6) AS BIGINT) + 1000000 AS idf_micro
         |  FROM tf GROUP BY term),
         |s AS (
         |  SELECT doc_id, term, tf * idf_micro AS score_micro,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY tf * idf_micro DESC, term) AS rnk
         |  FROM tf JOIN idf USING (term))
         |SELECT doc_id, CAST(rnk AS INT) AS rank, term, score_micro
         |FROM s WHERE rnk <= 3 ORDER BY doc_id, rank""".stripMargin,

    // the two-stage bucket prefix sum re-derived as ONE global window cumsum
    // (the oracle may afford a global sort; the engine must not)
    "q_token_budget_head" -> {
      val h = O.polyHash(
        s"CAST(${O.polyHash("(CAST(doc_id AS VARCHAR) || ':tb1')")} AS VARCHAR)")
      s"""WITH keyed AS (
         |  SELECT doc_id,
         |    CAST(coalesce(len(${O.words("text")}), 0) AS BIGINT) AS n_tokens,
         |    $h AS sort_key
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_tokens, sort_key,
         |    CAST(sum(n_tokens) OVER (ORDER BY sort_key, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_end
         |  FROM keyed)
         |SELECT doc_id, n_tokens, sort_key, cum_end - n_tokens AS cum_start,
         |  (cum_end - n_tokens) < 10000 AS keep
         |FROM c ORDER BY doc_id""".stripMargin
    },

    "q_pack_sequences" -> PackOracleSql,

    // identical packing semantics through the streaming fold
    "q_stream_pack_sequences" -> PackOracleSql,

    "q_curate_training_set" -> {
      val benchText = s"array_to_string(list_slice(${O.words("text")}, 3, 10), ' ')"
      val sampleHash = O.polyHash(
        s"CAST(${O.polyHash("(CAST(doc_id AS VARCHAR) || ':curate')")} AS VARCHAR)")
      s"""WITH inp AS (
         |  SELECT doc_id, text, lang FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text, lang FROM documents WHERE doc_id % 5 = 0),
         |dd AS (
         |  SELECT doc_id, text, lang FROM (
         |    SELECT doc_id, text, lang, row_number() OVER (
         |      PARTITION BY ${AnalysisQueries.fingerprint("text")}
         |      ORDER BY doc_id) AS rn
         |    FROM inp) WHERE rn = 1),
         |bench AS (
         |  SELECT DISTINCT unnest(${O.shinglesN(O.words(s"lower($benchText)"), 5)}) AS g
         |  FROM documents WHERE doc_id % 11 = 3),
         |tg AS (
         |  SELECT DISTINCT doc_id, unnest(${O.shinglesN(O.words("lower(text)"), 5)}) AS g
         |  FROM dd),
         |cont AS (SELECT DISTINCT doc_id FROM tg JOIN bench USING (g)),
         |kept AS (
         |  SELECT doc_id, text FROM dd
         |  WHERE doc_id NOT IN (SELECT doc_id FROM cont)
         |    AND ${AnalysisQueries.qualitySql("text")} >= 0.65
         |    AND CAST($sampleHash % 10000 AS DOUBLE) <
         |      (CASE WHEN lang = 'en' THEN 0.5 ELSE 1.0 END) * 10000.0),
         |t AS (
         |  SELECT doc_id, doc_id % 8 AS bucket,
         |    CAST(len(${O.words("text")}) AS BIGINT) AS n_tokens
         |  FROM kept),
         |c AS (
         |  SELECT doc_id, bucket, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id) AS BIGINT)
         |      AS cum_end
         |  FROM t)
         |SELECT doc_id, bucket, n_tokens,
         |  (cum_end - n_tokens) // 256 AS example_id,
         |  (cum_end - n_tokens) % 256 AS offset_in_example,
         |  (n_tokens > 0 AND (cum_end - 1) // 256 > (cum_end - n_tokens) // 256)
         |    AS crosses_boundary
         |FROM c ORDER BY doc_id""".stripMargin
    },

    "q_pii_scrub" -> {
      val withPii = s"(CASE WHEN doc_id % 3 = 0 THEN text || '$PiiTail' ELSE text END)"
      val emailRe = graft.functions.Predicates.EmailAddressPattern
      val ipRe = CorpusOps.ScrubIpv4Pattern
      val phoneRe = CorpusOps.ScrubPhonePattern
      s"""WITH t AS (SELECT doc_id, $withPii AS txt FROM documents),
         |e AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(txt, '$emailRe')) AS INT) AS n_emails,
         |    regexp_replace(txt, '$emailRe', '[EMAIL]', 'g') AS txt
         |  FROM t),
         |i AS (
         |  SELECT doc_id, n_emails,
         |    CAST(len(regexp_extract_all(txt, '$ipRe')) AS INT) AS n_ips,
         |    regexp_replace(txt, '$ipRe', '[IP]', 'g') AS txt
         |  FROM e)
         |SELECT doc_id,
         |  regexp_replace(txt, '$phoneRe', '[PHONE]', 'g') AS scrubbed,
         |  n_emails, n_ips,
         |  CAST(len(regexp_extract_all(txt, '$phoneRe')) AS INT) AS n_phones
         |FROM i ORDER BY doc_id""".stripMargin
    })
}
