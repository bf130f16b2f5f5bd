package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-construction operators a large-scale LLM training-data pipeline needs
 * beyond the reference's document-prep surface (beyond-reference; builder's
 * brief "operations a large-scale training-data pipeline would need"):
 *
 *  - [[decontaminate]] — GPT-3-style benchmark decontamination (Brown et al.
 *    2020, appendix C): flag training documents sharing any word n-gram with
 *    an evaluation set. Scale shape: the benchmark gram set is small (eval
 *    sets are MBs against a 100 TB corpus), so it is broadcast and the whole
 *    pass is one map-side hash join + one `groupBy(doc_id)` shuffle.
 *  - [[semanticDedup]] — SemDeDup-style embedding dedup (Abbas et al. 2023):
 *    assign each vector to its nearest centroid, then drop near-exact cosine
 *    duplicates *within* a cluster. Scale shape: the centroid probe is a
 *    broadcast of k rows; the pairwise stage is an equi-join on
 *    (cluster, sub-bucket), where clusters over `maxClusterSize` are hash
 *    re-split — per-task work is capped at maxClusterSize² and total work at
 *    n·maxClusterSize even on a degenerate (all-identical) corpus, never an
 *    unbounded Σ cluster².
 *  - [[stratifiedSample]] — deterministic per-stratum sampling by hash
 *    threshold (the standard reproducible corpus-mixing primitive): pure
 *    codegen'd columns, zero shuffles, identical decisions on re-runs and
 *    across engines.
 *  - [[packSequences]] — GPT-style sequence packing: concatenate documents in
 *    a deterministic per-bucket order and split every `ctxLen` tokens into
 *    training examples. Scale shape: one window cumsum per bucket; buckets
 *    are the parallel unit, so 100 TB packs with shard-level parallelism and
 *    no global sequential dependency.
 *  - [[piiScrub]] — redact emails / IPv4s / phone numbers with typed tags and
 *    per-kind counts, composed from the reference's extraction patterns
 *    (`nlp/patterns.py`); a pure per-row column expression.
 *  - [[incrementalDedup]] — crawl-over-crawl exact dedup: drop incoming docs
 *    whose fingerprint already exists in a prior corpus snapshot, with a
 *    broadcast Bloom prefilter so "definitely new" rows never reach a join.
 */
object CorpusOps {

  /**
   * Attach a tiny (1..k-row) frame to EVERY row of `big` — the broadcast
   * probe shape of the ANN/centroid queries — as a BroadcastHashJoin on a
   * constant key instead of a `crossJoin`. A `crossJoin(broadcast(tiny))`
   * plans as BroadcastNestedLoopJoin: identical work for a 1-row build side,
   * but an operator whose cost degrades quadratically if the build side ever
   * grows, and one the repo-wide zero-BNL plan invariant would have to
   * whitelist per query — a flat zero is a far stronger tripwire against a
   * genuinely accidental cross join (the 100 TB catastrophe class).
   *
   * The key must be runtime-constant yet OPAQUE to the optimizer: a plain
   * `lit` alias is folded by FoldablePropagation into `1 = 1` → `true` and
   * the join degenerates back to BNL. `pmod(xxhash64(firstCol), 1)` is 0 for
   * every row but non-foldable (depends on a column), so ExtractEquiJoinKeys
   * keeps it and the broadcast hint yields a codegen'd BHJ whose per-row
   * cost over BNL is one hash of one column — noise next to the O(dim)
   * vector folds these probes feed.
   */
  def attachBroadcast(big: DataFrame, tiny: DataFrame): DataFrame = {
    val key = "__attach_key"
    def keyed(d: DataFrame): DataFrame = {
      require(!d.columns.contains(key),
        s"attachBroadcast: input already has a '$key' column")
      // xxhash64 cannot hash MapType, including one nested inside an array
      // or struct — anchor the non-foldable key to the first column whose
      // ENTIRE type tree is map-free instead of blind columns.head
      import org.apache.spark.sql.types._
      def hashable(t: DataType): Boolean = t match {
        case _: MapType         => false
        case ArrayType(e, _)    => hashable(e)
        case StructType(fields) => fields.forall(f => hashable(f.dataType))
        case _                  => true
      }
      val anchor = d.schema.fields
        .find(f => hashable(f.dataType))
        .getOrElse(throw new IllegalArgumentException(
          "attachBroadcast: no hashable (map-free) column to anchor the join key"))
        .name
      d.withColumn(key, pmod(xxhash64(col(anchor)), lit(1L)))
    }
    keyed(big).join(broadcast(keyed(tiny)), Seq(key)).drop(key)
  }

  /**
   * One-pass per-source corpus profile — the first report a large-scale
   * training pipeline runs over a new crawl: document / char / token
   * volumes, exact-duplicate mass, and mean document length per source.
   * Shape: a per-doc projection into ONE (source, fingerprint) aggregation
   * and a per-source rollup — two map-side-combinable shuffles, no joins,
   * no windows. At 100 TB the first aggregation's key space is O(distinct
   * documents) with partial aggregation doing the heavy lifting scan-side,
   * and duplicate detection fingerprints with xxhash64 so document TEXT
   * never shuffles — only 8-byte fingerprints and pre-summed counters do.
   */
  def corpusProfile(d: DataFrame, text: Column, source: Column): DataFrame = {
    // null text: chars is NULL (length(null)), tokens must match — the raw
    // size(split(null)) is -1 under Spark's legacy sizeOfNull, which would
    // DEFLATE the sum; the oracle's NULL-skipping sum is the contract. The
    // doc still counts toward n_docs (and nulls fingerprint together, the
    // same grouping the oracle's GROUP BY text gives them).
    val perDoc = d.select(source.as("source"), xxhash64(text).as("fp"),
      length(text).cast("long").as("chars"),
      when(text.isNull, lit(null))
        .otherwise(TextAnalysis.tokenCountWhitespace(text))
        .cast("long").as("tokens"))
    val perFp = perDoc.groupBy("source", "fp").agg(
      count(lit(1)).as("n"), sum("chars").as("chars"), sum("tokens").as("tokens"))
    perFp.groupBy("source").agg(
      sum("n").as("n_docs"),
      count(lit(1)).as("n_distinct_docs"),
      sum(when(col("n") > 1, col("n")).otherwise(0L)).as("n_dup_docs"),
      sum("chars").as("n_chars"),
      sum("tokens").as("n_tokens"),
      round(sum("chars") / sum("n"), 2).as("avg_chars"))
  }

  /**
   * Incremental exact dedup of a delta against a PRIOR corpus snapshot — the
   * recurring-crawl shape: `history` is the already-curated corpus (100 TB),
   * `incoming` today's delta. The naive plan anti-joins the full history
   * against every delta; instead a Bloom filter over history fingerprints
   * (built once per snapshot — at scale a persisted artifact reused across
   * runs) is broadcast and probes each incoming row:
   *
   *  - Bloom MISS → definitely new (a Bloom filter has NO false negatives):
   *    the row is kept without touching any join or shuffle;
   *  - Bloom HIT → maybe duplicate (false-positive rate `fpp`): confirmed by
   *    an exact anti-join whose left side is only the hit fraction.
   *
   * The result is EXACT — the filter errs only toward the confirm join. At
   * fpp = 1% the shuffled delta fraction is ~(true-dup rate + 1%) instead of
   * 100%, and the history ships to executors as a compact bitset (~1.2 MB
   * per million docs at 1%) instead of a shuffle side.
   *
   * Returns `incoming`'s rows that are new vs `history`, plus their `fp`.
   */
  def incrementalDedup(history: DataFrame, incoming: DataFrame, text: Column,
      expectedHistoryDocs: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    val histFps = history.select(TextAnalysis.docFingerprint(text).as("fp"))
    val bloom = histFps.stat.bloomFilter("fp", expectedHistoryDocs, fpp)
    val bloomBc = incoming.sparkSession.sparkContext.broadcast(bloom)
    // membership probe: a justified UDF — spark.util.sketch.BloomFilter is
    // public API with no Catalyst expression surface, the probe is a bitset
    // lookup, and every row it clears skips the join entirely
    val mightContain = udf((fp: Long) => bloomBc.value.mightContainLong(fp))
    // a NULL text (hence NULL fp) matches nothing in history — it is NEW.
    // Without the coalesce the primitive-Long UDF returns null and the row
    // would fall out of BOTH filter branches (silent loss).
    val tagged = incoming.withColumn("fp", TextAnalysis.docFingerprint(text))
      .withColumn("maybe_dup", coalesce(mightContain(col("fp")), lit(false)))
    val definitelyNew = tagged.filter(!col("maybe_dup"))
    val confirmed = tagged.filter(col("maybe_dup"))
      .join(histFps.distinct(), Seq("fp"), "left_anti")
    definitelyNew.unionByName(confirmed).drop("maybe_dup")
  }

  /**
   * URL canonicalization — the first dedup stage of a web-crawl pipeline
   * (C4/RefinedWeb dedup by normalized URL before any content pass): strip
   * the fragment, lowercase scheme+authority, drop default ports (443/80),
   * root an empty path at `/`, remove tracking parameters
   * (`utm_*`/`fbclid`/`gclid`/`ref`), and sort the survivors so parameter
   * order cannot split a page's identity. A pure column expression — at
   * 100 TB this is free inside the scan projection, and the follow-on dedup
   * is one hash shuffle on the canonical string.
   */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val schemeHost = regexp_extract(noFrag,
      "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1)
    val hostNorm = regexp_replace(
      regexp_replace(lower(schemeHost), "^(https://[^/?]*):443$", "$1"),
      "^(http://[^/?]*):80$", "$1")
    val rest = noFrag.substr(length(schemeHost) + 1, length(noFrag))
    val parts = split(rest, "\\?", 2)
    val path0 = element_at(parts, 1)
    val query = when(size(parts) > 1, element_at(parts, 2)).otherwise(lit(""))
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val params = array_sort(filter(split(query, "&"), p =>
      p =!= "" && !p.startsWith("utm_") && !p.startsWith("fbclid=") &&
        !p.startsWith("gclid=") && !p.startsWith("ref=")))
    concat(hostNorm, path,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

  /**
   * CCNet-style language-model quality scoring (Wenzek et al. 2020 §3.3)
   * with the model TRAINED IN-PLANE: `ref` (a reference-domain slice — CCNet
   * uses Wikipedia) supplies add-one-smoothed bigram statistics, every doc
   * scores by its mean bigram log-probability, and fixed thresholds bucket
   * the corpus head/middle/tail. CCNet ships a pretrained KenLM (a model
   * artifact); the bigram LM here is the same decision procedure with the
   * training step expressed as two aggregations, so the pipeline stays
   * engine-native and oracle-checkable end-to-end.
   *
   * Cross-engine determinism: each bigram's log-prob is scaled to an integer
   * (micro-nats) BEFORE the per-doc sum, so aggregation is exact long
   * addition (order-free), never float summation; the only float ops are the
   * per-value `ln` and the final `sum/count` threshold compare, identical
   * given identical integers. Buckets order by mean log-prob DESCENDING
   * (head = least perplex, as in CCNet).
   *
   * Scale shape: the LM is ref-sized (domain slices are tiny vs a 100 TB
   * corpus) and BROADCASTS to both probe joins; scoring is one explode + two
   * broadcast joins + one `groupBy(doc_id)`; bucketing is a pure column — no
   * global sort or window anywhere. Returns
   * `doc_id, n_bigrams, lp_micro_sum, bucket`.
   */
  def lmQualityScore(docs: DataFrame, ref: DataFrame, text: Column,
      headMinAvgLp: Double, midMinAvgLp: Double): DataFrame = {
    val ws = TextAnalysis.words(lower(text))
    // word bigrams: zip the word list with its own tail (zip_with pads the
    // shorter side with null — the padded final pair filters out)
    val bg = filter(
      zip_with(ws, slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2"))),
      p => p.getField("w2").isNotNull)
    // the LM model artifact: bounded by the ref slice's bigram vocabulary
    // and referenced twice (probe join + predecessor rollup) — materialized
    // once like the `vocab` scalar below, so the ref slice is scanned once
    // for bigrams instead of twice
    val refBi = ref.select(explode(bg).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // predecessor counts derive from the bigram table (not raw unigrams), so
    // numerators and denominators stay consistent by construction
    val refC1 = refBi.groupBy("w1").agg(sum("c").as("c1"))
    // smoothing vocabulary: distinct ref words — a one-off scalar of the
    // LM-build step (like sizing a Bloom filter), not per-row driver work
    val vocab = ref.select(explode(ws).as("w"))
      .agg(countDistinct(col("w"))).head.getLong(0)
    // one NULL-marker bigram rides ahead of each doc's real bigrams, so the
    // per-doc groupBy covers bigram-less docs too — the former
    // docs-side re-join to re-attach them cost a second corpus scan plus a
    // corpus-sized join (and with refBi materialized, the join's size
    // estimate degraded it to a sort-merge join)
    val bgType = "array<struct<w1:string,w2:string>>"
    val marked = concat(
      array(struct(lit(null).cast("string").as("w1"),
        lit(null).cast("string").as("w2"))),
      coalesce(bg, array().cast(bgType)))
    val probes = docs.select(col("doc_id"), explode(marked).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .join(broadcast(refBi), Seq("w1", "w2"), "left")
      .join(broadcast(refC1), Seq("w1"), "left")
      .select(col("doc_id"), col("w1"),
        round(log((coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c1"), lit(0L)) + lit(vocab)).cast("double")) * 1e6)
          .cast("long").as("lp_micro"))
    probes.groupBy("doc_id")
      .agg(count(col("w1")).as("n_bigrams"),
        sum(when(col("w1").isNull, lit(0L)).otherwise(col("lp_micro")))
          .as("lp_micro_sum"))
      .withColumn("bucket", {
        val avg = col("lp_micro_sum").cast("double") / col("n_bigrams")
        when(col("n_bigrams") === 0, lit("unscored"))
          .when(avg >= headMinAvgLp, lit("head"))
          .when(avg >= midMinAvgLp, lit("middle"))
          .otherwise(lit("tail"))
      })
  }

  /**
   * Trains the [[nbQualityClassifier]] model: the `(b, llr_micro)` bucket
   * table plus the default llr for buckets unseen in both slices.
   * `private[graft]` so the streaming twin can bake the SAME model into a
   * per-row scoring column (the <= `buckets`-row bound makes collecting it a
   * model-artifact step, like sizing a Bloom filter).
   */
  private[graft] def nbModel(pos: DataFrame, neg: DataFrame, text: Column,
      buckets: Int): (DataFrame, Long) = {
    val ws = TextAnalysis.words(lower(text))
    // both classes' bucket counts through ONE tagged union + groupBy — a
    // full-outer join of the two count frames would be an SMJ (full outer
    // cannot broadcast), pure waste on <= `buckets`-row frames
    def tagged(d: DataFrame, isPos: Boolean) =
      d.select(explode(ws).as("w"))
        .select((TextAnalysis.polyHash(col("w")) % buckets).as("b"),
          lit(if (isPos) 1L else 0L).as("pc"), lit(if (isPos) 0L else 1L).as("nc"))
    val counts = tagged(pos, isPos = true).unionByName(tagged(neg, isPos = false))
      .groupBy("b").agg(sum("pc").as("cp"), sum("nc").as("cn"))
    val totRow = counts.agg(sum("cp"), sum("cn")).head
    def tot(i: Int): Long =
      Option(totRow.get(i)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val (totP, totN) = (tot(0), tot(1))
    val llrMicro = round((
      log((coalesce(col("cp"), lit(0L)) + 1L).cast("double") /
        lit((totP + buckets).toDouble)) -
      log((coalesce(col("cn"), lit(0L)) + 1L).cast("double") /
        lit((totN + buckets).toDouble))) * 1e6).cast("long")
    val model = counts.select(col("b"), llrMicro.as("llr_micro"))
    // buckets unseen in BOTH slices: cP = cN = 0 -> a constant llr
    val llr0 = math.round((math.log(1.0 / (totP + buckets)) -
      math.log(1.0 / (totN + buckets))) * 1e6)
    (model, llr0)
  }

  /**
   * In-plane-trained quality classifier — the engine-native twin of the
   * linear/fastText quality filters used for GPT-3/LLaMA-style corpus
   * curation (positive = a reference-domain slice, negative = a random
   * corpus slice), rendered as multinomial Naive Bayes over HASHED word
   * features. The fastText hashing trick bounds the model at `buckets`
   * rows BY CONSTRUCTION, so the trained model always broadcasts no matter
   * how large the training slices are.
   *
   * Per-bucket log-likelihood ratio (add-one smoothing over the bucket
   * space): `llr(b) = ln((cPos+1)/(totPos+B)) - ln((cNeg+1)/(totNeg+B))`;
   * a doc's score is the sum of its tokens' llr, `quality = hi` iff the
   * sum is >= 0 (balanced class prior — the slices are sampled, not
   * population-weighted, so a prior term would be noise).
   *
   * Cross-engine determinism: each bucket's llr is scaled to integer
   * micro-nats BEFORE the per-doc sum (exact long addition, order-free),
   * the same discipline as [[lmQualityScore]]. The two slice totals are
   * one-off scalars of the model-build step, like the LM's vocab size.
   *
   * Scale shape: training = one explode + groupBy per slice (slices are
   * tiny vs the corpus); the <= `buckets`-row model broadcasts; scoring =
   * one explode + ONE broadcast join + `groupBy(doc_id)` — no window, no
   * self-join. Returns `doc_id, n_tokens, llr_micro_sum, quality`.
   */
  def nbQualityClassifier(docs: DataFrame, pos: DataFrame, neg: DataFrame,
      text: Column, buckets: Int = 1024): DataFrame = {
    val ws = TextAnalysis.words(lower(text))
    val (model, llr0) = nbModel(pos, neg, text, buckets)
    val scored = docs.select(col("doc_id"), explode(ws).as("w"))
      .select(col("doc_id"), (TextAnalysis.polyHash(col("w")) % buckets).as("b"))
      .join(broadcast(model), Seq("b"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("llr_micro"), lit(llr0))).as("llr_micro_sum"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("llr_micro_sum"), lit(0L)).as("llr_micro_sum"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0L, lit("unscored"))
          .when(coalesce(col("llr_micro_sum"), lit(0L)) >= 0L, lit("hi"))
          .otherwise(lit("lo")).as("quality"))
  }

  /**
   * DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
   * arXiv:2302.03169): score every raw doc by the log importance weight
   * `log w(x) = Σ_f log(p_target(f)/p_raw(f))` under hashed n-gram bag
   * models (the paper uses unigrams+bigrams hashed to 10k buckets; here
   * both orders hash into `buckets`), then resample WITHOUT replacement by
   * Gumbel top-k: `key = log w + g`, `g = -ln(-ln(u))`. The paper draws
   * `u ~ Uniform(0,1)`; here `u` derives from the salted cascaded hash of
   * `doc_id` (the [[stratifiedSample]] draw — the polynomial hash is affine
   * in its final chars, so the cascade, not the raw hash, feeds the draw),
   * making the selection deterministic across engines and retries — a
   * speculative-execution requirement a seeded RNG cannot meet.
   *
   * The feature llr table reuses the [[nbQualityClassifier]] construction
   * (add-one smoothing, integer micro-nats, broadcast <= `buckets` rows);
   * `log w` in nats recovers as `llr_micro_sum / 1e6` only in the final
   * key, after the exact long sum.
   *
   * Scale shape: scoring = explode + broadcast join + groupBy(doc_id);
   * selection = global top-k with k << n, which Spark executes as
   * TakeOrdered (per-partition heap + driver merge), never a full sort
   * shuffle. Returns the k selected docs:
   * `doc_id, n_feats, llr_micro_sum, key_micro`.
   */
  def dsirSelect(raw: DataFrame, target: DataFrame, text: Column, k: Int,
      buckets: Int = 1024, salt: String = "dsir"): DataFrame = {
    val feats = {
      val lw = lower(text)
      concat(TextAnalysis.words(lw), TextAnalysis.wordShingles(lw, 2))
    }
    // both distributions' bucket counts via ONE tagged union + groupBy (a
    // full-outer count join would be an un-broadcastable SMJ — see
    // [[nbQualityClassifier]])
    def tagged(d: DataFrame, isTgt: Boolean) =
      d.select(explode(feats).as("f"))
        .select((TextAnalysis.polyHash(col("f")) % buckets).as("b"),
          lit(if (isTgt) 1L else 0L).as("tc"), lit(if (isTgt) 0L else 1L).as("rc"))
    val counts = tagged(target, isTgt = true).unionByName(tagged(raw, isTgt = false))
      .groupBy("b").agg(sum("tc").as("ct"), sum("rc").as("cr"))
    val totRow = counts.agg(sum("ct"), sum("cr")).head
    def tot(i: Int): Long =
      Option(totRow.get(i)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val (totT, totR) = (tot(0), tot(1))
    val llrMicro = round((
      log((coalesce(col("ct"), lit(0L)) + 1L).cast("double") /
        lit((totT + buckets).toDouble)) -
      log((coalesce(col("cr"), lit(0L)) + 1L).cast("double") /
        lit((totR + buckets).toDouble))) * 1e6).cast("long")
    val model = counts.select(col("b"), llrMicro.as("llr_micro"))
    val llr0 = math.round((math.log(1.0 / (totT + buckets)) -
      math.log(1.0 / (totR + buckets))) * 1e6)
    val scored = raw.select(col("doc_id"), explode(feats).as("f"))
      .select(col("doc_id"), (TextAnalysis.polyHash(col("f")) % buckets).as("b"))
      .join(broadcast(model), Seq("b"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("llr_micro"), lit(llr0))).as("llr_micro_sum"))
    // deterministic Gumbel: u = (cascadedHash % 2^20 + 0.5) / 2^20 — never 0
    // or 1, so both ln() calls are finite. The Gumbel term is rounded to
    // integer micro-nats per doc and added to the (already integer) llr sum
    // with exact long arithmetic — the selection key is engine-exact, never
    // a chained-libm double
    val inner = TextAnalysis.polyHash(
      concat(col("doc_id").cast("string"), lit(":" + salt)))
    val u = (pmod(TextAnalysis.polyHash(inner.cast("string")), lit(1048576L))
      .cast("double") + 0.5) / 1048576.0
    val keyMicro = col("llr_micro_sum") + round(-log(-log(u)) * 1e6).cast("long")
    scored.select(col("doc_id"), col("n_feats"), col("llr_micro_sum"),
        keyMicro.as("key_micro"))
      .orderBy(col("key_micro").desc, col("doc_id"))
      .limit(k)
  }

  /**
   * Incremental NEAR-dup of a delta against a PRIOR corpus snapshot — the
   * MinHash twin of [[incrementalDedup]] for the recurring-crawl case where
   * re-crawled pages drift (boilerplate churn, timestamps) and exact
   * fingerprints no longer match. `history` and `delta` need (`doc_id`,
   * `text`). Returns one row per delta doc that near-duplicates some history
   * doc: `doc_id, hist_doc, jaccard` with the best match kept (highest
   * Jaccard, ties → lowest history id — deterministic).
   *
   * Scale shape: both sides band their MinHash signatures; the candidate
   * stage is ONE equi-join on `(band_idx, band_key)` — never delta×history.
   * Hot bands (boilerplate keys) are capped on the history side before the
   * join, the same skew guard as the intra-corpus LSH path. Exact 3-shingle
   * Jaccard verifies only the joined candidates. At 100 TB the history band
   * index is computed once per snapshot and persisted (bucketed by band key),
   * so each new crawl pays only the delta's signature pass plus one shuffle
   * sized by the candidate fraction.
   */
  def incrementalNearDup(history: DataFrame, delta: DataFrame, k: Int = 8,
      shingleN: Int = 3, maxBandSize: Int = 1000,
      threshold: Double = 0.8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def bandsOf(d: DataFrame, out: String) = d.select(
      col("doc_id").as(out),
      posexplode(TextAnalysis.lshBands(
        TextAnalysis.minHashSignature(col("text"), k, shingleN), rows = 2))
        .as(Seq("band_idx", "band_key")))
    val histBands = bandsOf(history, "hist_doc")
      .withColumn("bc", count(lit(1)).over(
        Window.partitionBy("band_idx", "band_key")))
      .filter(col("bc") <= maxBandSize).drop("bc")
    val cand = bandsOf(delta, "doc_id")
      .join(histBands, Seq("band_idx", "band_key"))
      .select(col("doc_id"), col("hist_doc")).distinct()
    def shinglesOf(d: DataFrame, out: String, sh: String) = d.select(
      col("doc_id").as(out),
      array_distinct(TextAnalysis.wordShingles(col("text"), shingleN)).as(sh))
    cand
      .join(shinglesOf(delta, "doc_id", "dsh"), Seq("doc_id"))
      .join(shinglesOf(history, "hist_doc", "hsh"), Seq("hist_doc"))
      .select(col("doc_id"), col("hist_doc"),
        round(size(array_intersect(col("dsh"), col("hsh"))).cast("double") /
          size(array_union(col("dsh"), col("hsh"))).cast("double"), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .withColumn("rk", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("jaccard").desc, col("hist_doc"))))
      .filter(col("rk") === 1).drop("rk")
  }

  /**
   * Flag training docs sharing any `n`-word shingle (lowercased, whitespace
   * words) with the benchmark corpus. `train` needs (`doc_id`, text); `bench`
   * needs a text column of the same name. Returns
   * `doc_id, n_contaminated_grams, contaminated` for every training doc.
   */
  def decontaminate(train: DataFrame, bench: DataFrame, text: Column,
      n: Int = 13): DataFrame = {
    def grams(d: DataFrame, cols: Column*) = d.select(
      (cols :+ explode(array_distinct(
        TextAnalysis.wordShingles(lower(text), n))).as("g")): _*)
    val benchGrams = grams(bench).distinct()
    val hits = grams(train, col("doc_id"))
      .join(broadcast(benchGrams), Seq("g"))
      .groupBy("doc_id").agg(count(lit(1)).cast("int").as("n_contaminated_grams"))
    train.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_contaminated_grams"), lit(0)).as("n_contaminated_grams"),
        (coalesce(col("n_contaminated_grams"), lit(0)) > 0).as("contaminated"))
  }

  /**
   * Span-level decontamination (the PaLM treatment: remove the contaminated
   * WINDOW, keep the document): every `n`-word window whose lowercased join
   * appears in the benchmark gram set has its word positions dropped, and the
   * doc is reassembled from the surviving words. Docs with fewer than `n`
   * words carry no full window and pass through untouched (unlike
   * [[decontaminate]]'s flag semantics, a partial window cannot match).
   * Returns `doc_id, n_words, n_dropped, text_clean`. Single-pass, like the
   * published treatment: removal splices the surviving words together, and a
   * splice can in principle form a NEW matching window — rerun on the output
   * when that matters.
   *
   * Scale shape: grams and word positions are plain exploded relations —
   * bench grams broadcast into the match join, covered positions anti-join
   * the word positions, one `groupBy(doc_id)` reassembles. Linear in corpus
   * size, no array recursion, no pairwise work.
   */
  def decontaminateSpans(train: DataFrame, bench: DataFrame, text: Column,
      n: Int = 13): DataFrame = {
    val benchGrams = bench.select(explode(array_distinct(
      TextAnalysis.wordShingles(lower(text), n))).as("g")).distinct()
    val words = train.select(col("doc_id"),
      TextAnalysis.words(text).as("ws"))
    val grams = words
      .select(col("doc_id"), col("ws"),
        explode(when(size(col("ws")) >= n,
          sequence(lit(0), size(col("ws")) - n)).otherwise(array()))
          .as("start"))
      .select(col("doc_id"), col("start"),
        lower(array_join(slice(col("ws"), col("start") + 1, lit(n)), " ")).as("g"))
    val covered = grams.join(broadcast(benchGrams), Seq("g"))
      .select(col("doc_id"),
        explode(sequence(col("start"), col("start") + (n - 1))).as("idx"))
      .distinct()
    spliceCovered(words, covered)
  }

  /** Shared tail of [[decontaminateSpans]] / [[selfSubstringDedup]]: drop the
    * `covered` `(doc_id, idx)` word positions from `words` `(doc_id, ws)` and
    * reassemble, returning `doc_id, n_words, n_dropped, text_clean`.
    *
    * ONE pass over the word positions: n_words rides the posexplode_outer
    * rows (ws is a projected attribute, so the split itself is not re-run)
    * and the splice aggregation counts and rebuilds from the same rows — the
    * former pos/n_words split re-derived `words` (scan → word split) twice
    * and paid a corpus-wide re-join of the two halves. The outer explode
    * keeps word-less docs as a single null-idx row, so their
    * `n_words = size(ws)` (0-word and null-text semantics included) and
    * empty text_clean come out of the same aggregation the former
    * words-side left join produced. */
  private def spliceCovered(words: DataFrame, covered: DataFrame): DataFrame =
    words
      .select(col("doc_id"), size(col("ws")).as("nw"),
        posexplode_outer(col("ws")).as(Seq("idx", "w")))
      .join(covered.withColumn("cov", lit(true)), Seq("doc_id", "idx"), "left")
      .groupBy("doc_id")
      .agg(max(col("nw")).as("n_words"),
        count(when(col("cov").isNull, col("idx"))).cast("int").as("n_kept"),
        array_join(transform(sort_array(collect_list(
            when(col("cov").isNull, struct(col("idx"), col("w"))))),
          _.getField("w")), " ").as("text_clean"))
      .select(col("doc_id"), col("n_words"),
        (col("n_words") - col("n_kept")).as("n_dropped"), col("text_clean"))

  /**
   * Exact-substring self-deduplication — the EXACTSUBSTR treatment of Lee et
   * al. 2022 ("Deduplicating Training Data Makes Language Models Better"):
   * every `n`-word window whose lowercased join occurs MORE THAN ONCE across
   * the corpus (across documents or repeated inside one) keeps only its
   * canonical occurrence — smallest doc_id, then earliest start — and every
   * other occurrence's word positions are dropped, the document reassembled
   * from the survivors. Overlapping duplicated windows coalesce through the
   * covered-position distinct, so a long shared passage is cut once, not once
   * per gram. Returns `doc_id, n_words, n_dropped, text_clean` for every
   * input document (untouched docs pass through with n_dropped = 0).
   *
   * Beyond-reference corpus operator (the reference dedups whole elements via
   * hash ids); span semantics mirror [[decontaminateSpans]], with the corpus
   * itself as the benchmark side.
   *
   * Scale shape: occurrences are one exploded relation. Pass 1 groups the
   * 8-byte `xxhash64` of each gram alone, so singleton grams — the
   * overwhelming majority of a real corpus — are eliminated in a narrow
   * fixed-width shuffle and never ship their text. Only hash-duplicated
   * candidates enter pass 2's exact string inventory, so the wide shuffle is
   * proportional to the DUPLICATED token mass, not the corpus. Keeper
   * selection is two equi-keyed aggregations (min doc, then min start within
   * it) — no corpus-wide window, no pairwise work, no driver collect.
   */
  def selfSubstringDedup(d: DataFrame, text: Column, n: Int = 50,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true)): DataFrame = {
    val words = d.select(col("doc_id"), TextAnalysis.words(text).as("ws"))
    val occ = words
      .select(col("doc_id"), col("ws"),
        explode(when(size(col("ws")) >= n,
          sequence(lit(0), size(col("ws")) - n)).otherwise(array())).as("start"))
      .select(col("doc_id"), col("start"),
        lower(array_join(slice(col("ws"), col("start") + 1, lit(n)), " ")).as("g"))
      .withColumn("h", xxhash64(col("g")))
    // pass 1: fingerprint-duplicated grams only (superset of string-duplicated)
    val dupHash = occ.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("h")
    // `cand` is referenced by BOTH pass-2 sides (keeper inventory + removal
    // scan): materialized once, sized by the DUPLICATED gram mass only. The
    // unmaterialized DAG re-derived occ (scan → word split → gram build) per
    // reference — 16 parquet scans in the r17 before-plan.
    val cand = materialize(
      occ.join(dupHash, Seq("h")).select("doc_id", "start", "g"))
    // pass 2: exact inventory — ONE aggregation: min(struct(doc_id, start))
    // IS "smallest holder doc, then earliest start within it" (the former
    // dup→keeper join pair re-derived cand twice to compute the same thing)
    val keeper = cand.groupBy("g")
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("start"))).as("k"))
      .filter(col("cnt") >= 2)
      .select(col("g"), col("k.doc_id").as("kdoc"), col("k.start").as("kstart"))
    val removals = cand.join(keeper, Seq("g"))
      .filter(!(col("doc_id") === col("kdoc") && col("start") === col("kstart")))
    val covered = removals.select(col("doc_id"),
      explode(sequence(col("start"), col("start") + (n - 1))).as("idx")).distinct()
    spliceCovered(words, covered)
  }

  /**
   * Winnowing (MOSS) near-duplicate pairs: documents sharing >= 80% of the
   * smaller side's selected fingerprints (the plagiarism-detection join),
   * over [[TextAnalysis.winnowFingerprints]] with window `w` and gram `k`.
   * Returns `doc_a, doc_b, n_shared` with `doc_a < doc_b`.
   *
   * `maxPosting` is the hot-key guard and the operator's one recall trade:
   * winnowing postings are heavy-tailed (boilerplate runs — headers, license
   * blocks — fingerprint identically in thousands of docs), so fingerprints
   * shared by more than `maxPosting` documents are dropped BEFORE the
   * equi-join. At sf0.1 a 1000 cap admits 37M pair events where 100 admits
   * 3.7M; a TRUE near-dup pair is unaffected because its shared fingerprints
   * sit in 2-doc postings — what the cap removes is precisely the
   * boilerplate-only evidence, which is the evidence that would otherwise
   * pair every doc carrying the same header (the property spec pins this:
   * planted-copy recall is cap-invariant while boilerplate-swamped corpora
   * drop from O(n²) pairs to the planted ones). The 80% floor is integer
   * arithmetic (5·shared >= 4·min) so engines decide identically.
   *
   * Scale shape: explode per-doc sets, one windowed posting-count filter,
   * one fingerprint equi-join, pair groupBy — never an all-pairs comparison.
   */
  def winnowNearDup(d: DataFrame, text: Column, maxPosting: Int = 100,
      k: Int = 8, w: Int = 4): DataFrame = {
    // ONE fingerprint pass: (fp, n_fp) packed per event inside a single
    // letCol-bound expression and exploded DIRECTLY. Exploding a projected
    // alias instead lets InferFiltersFromGenerate put `size(fps) > 0` below
    // the Generate and predicate pushdown substitute the alias — duplicating
    // the whole winnow HOF into the filter (2 evaluations per scan branch in
    // the r17 before-plan), and the former self-join doubled THAT (4 full
    // fingerprint passes + a corpus-half broadcast).
    val events = d.select(col("doc_id"),
      explode(TextAnalysis.letCol(
          TextAnalysis.winnowFingerprints(text, k, w)) { fps =>
        transform(fps, fp => struct(fp.as("fp"), size(fps).as("n_fp")))
      }).as("e"))
      .select(col("doc_id"), col("e.fp").as("fp"), col("e.n_fp").as("n_fp"))
    // hot-posting cap as a window count: hot events are DROPPED before any
    // list materializes (a groupBy-then-filter would collect the unbounded
    // hot posting first), and the posting-list groupBy below shuffles on the
    // same key so the exchange is reused.
    val hot = Window.partitionBy("fp")
    val bounded = events.withColumn("fp_n", count(lit(1)).over(hot))
      .filter(col("fp_n") <= maxPosting).drop("fp_n")
    val postings = bounded.groupBy("fp")
      .agg(collect_list(struct(col("doc_id"), col("n_fp"))).as("ds"))
      .filter(size(col("ds")) >= 2)
    // pair events generated map-side within each ≤ maxPosting posting list
    // (every i < j element pair, ordered doc_a < doc_b) — replaces the
    // fp-equi self-join, whose build side was the entire event relation.
    val pairs = postings.select(explode(flatten(
      transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + lit(2), size(col("ds"))), y =>
          struct(
            least(x.getField("doc_id"), y.getField("doc_id")).as("doc_a"),
            greatest(x.getField("doc_id"), y.getField("doc_id")).as("doc_b"),
            when(x.getField("doc_id") < y.getField("doc_id"),
              x.getField("n_fp")).otherwise(y.getField("n_fp")).as("n_fp_a"),
            when(x.getField("doc_id") < y.getField("doc_id"),
              y.getField("n_fp")).otherwise(x.getField("n_fp")).as("n_fp_b")))))
    ).as("p"))
      // the self-join's strict `a.doc_id < b.doc_id` never paired an id with
      // itself — drop the degenerate pair a duplicated doc_id would form
      .filter(col("p.doc_a") =!= col("p.doc_b"))
    pairs.groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.n_fp_a").as("n_fp_a"), col("p.n_fp_b").as("n_fp_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") * 5 >= least(col("n_fp_a"), col("n_fp_b")) * 4)
      .select(col("doc_a"), col("doc_b"), col("shared").cast("int").as("n_shared"))
  }

  /** Σ aᵢ·bᵢ accumulated as DOUBLE — the one cosine definition (identical to
    * the ANN queries' fold so oracle arithmetic matches bit-for-bit); native
    * [[graft.functions.expr.DotProduct]], one compiled loop per pair. */
  private def dotCol(a: Column, b: Column): Column =
    graft.functions.expr.DotProduct.dotProduct(a, b)

  private def normCol(c: Column): Column = sqrt(dotCol(c, c))

  /** Zero-norm vectors (all-zero embeddings) define cosine as 0.0 instead of
    * NaN, so they cluster by centroid id and never silently escape dedup.
    * The norm product is let-bound (guard + divisor) so the two O(dim) norm
    * folds run once per pair, not twice (interpreted HOFs re-evaluate every
    * reference — see [[TextAnalysis.letCol]]). */
  private[graft] def cosineCol(a: Column, b: Column): Column =
    TextAnalysis.letCol(normCol(a) * normCol(b)) { nn =>
      when(nn === 0.0, lit(0.0)).otherwise(dotCol(a, b) / nn)
    }

  /**
   * One-pass SemDeDup: centroids = the embeddings with `vec_id < k`
   * (deterministic seed, no iteration — the published algorithm's cluster
   * step is pluggable), nearest-centroid assignment by cosine (ties → lowest
   * centroid id), then within each cluster every pair with
   * `round(cos, 6) >= threshold` marks the *larger* `vec_id` as a duplicate.
   * Input needs (`vec_id`, `embedding`); returns `vec_id, cluster, keep`.
   *
   * Skew cap: the intra-cluster pair join's work is Σ cluster², which is
   * unbounded when one cluster runs hot (near-dup-heavy corpus, degenerate
   * embeddings, fixed k on a growing corpus). A cluster exceeding
   * `maxClusterSize` is re-split into ⌈size / maxClusterSize⌉ deterministic
   * hash sub-buckets before the pair join — pairs straddling sub-buckets are
   * not compared (bounded-recall trade, mirroring the LSH hot-band cap in
   * `AnalysisQueries` and `StreamingOps.lshCandidateStream`'s bucket poison),
   * so per-task work is ≤ maxClusterSize² and total work ≤ n·maxClusterSize.
   */
  def semanticDedup(e: DataFrame, k: Int, threshold: Double,
      maxClusterSize: Int = 10000): DataFrame = {
    require(maxClusterSize >= 2, s"maxClusterSize must be >= 2: $maxClusterSize")
    // centroid norms ride in the broadcast struct and the row norm is a
    // projected column, so the assignment fold does ONE O(dim) dot per
    // centroid instead of three O(dim) folds (same arithmetic as cosineCol,
    // including the zero-norm guard)
    val cents = e.filter(col("vec_id") < k)
      .agg(sort_array(collect_list(struct(col("vec_id").as("cid"),
        col("embedding").as("cv"),
        normCol(col("embedding")).as("cnrm")))).as("cents"))
    val best = aggregate(
      col("cents"),
      struct(lit(-1L).as("cid"), lit(-2.0).as("sim")),
      (acc, c) => {
        val denom = col("nrm") * c.getField("cnrm")
        val sim = when(denom === 0.0, lit(0.0))
          .otherwise(dotCol(col("embedding"), c.getField("cv")) / denom)
        when(sim > acc.getField("sim"),
          struct(c.getField("cid").as("cid"), sim.as("sim"))).otherwise(acc)
      })
    val assigned = attachBroadcast(
        e.withColumn("nrm", normCol(col("embedding"))), cents)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        best.getField("cid").as("cluster"))
    // the count window shuffles on the same key as the pair join, so the
    // exchange is reused; sub = polyHash(vec_id) mod ⌈size/max⌉ (cascade-free:
    // ids are distinct so the affine tail can't collapse the split). The
    // per-row norm is projected ONCE here — recomputing it inside the pair
    // predicate would cost O(dim) per PAIR instead of per row (CaseWhen
    // branches are excluded from subexpression elimination).
    val withSub = assigned
      .withColumn("n_in_cluster",
        count(lit(1)).over(Window.partitionBy("cluster")))
      .withColumn("sub", pmod(
        TextAnalysis.polyHash(col("vec_id").cast("string")),
        ceil(col("n_in_cluster").cast("double") / maxClusterSize).cast("long")))
      .drop("n_in_cluster")
    val a = withSub.select(col("cluster"), col("sub"),
      col("vec_id").as("id_a"), col("embedding").as("emb_a"),
      col("nrm").as("nrm_a"))
    val b = withSub.select(col("cluster"), col("sub"),
      col("vec_id").as("id_b"), col("embedding").as("emb_b"),
      col("nrm").as("nrm_b"))
    val pairCos = when(col("nrm_a") * col("nrm_b") === 0.0, lit(0.0))
      .otherwise(dotCol(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
    val dups = a.join(b, Seq("cluster", "sub"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(pairCos, 6) >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
      .withColumn("is_dup", lit(true))
    assigned.join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        (!coalesce(col("is_dup"), lit(false))).as("keep"))
  }

  /**
   * Deterministic stratified sampling: a doc is kept iff
   * `h(doc_id, salt) mod 10000 < rate(stratum) * 10000`. The rate comes from
   * `rates` with `defaultRate` as fallback. Returns
   * `doc_id, stratum, sample_bucket, keep`. Pure columns — no shuffle, no
   * RNG state, bit-identical on re-runs and engine changes.
   *
   * The draw is a CASCADED polynomial hash: `polyHash` alone is affine in its
   * last characters (salts "s1" vs "s2" shift every bucket by exactly 1, so
   * nearly the same sample survives a salt change); re-hashing the decimal
   * rendering of the first hash gives the avalanche a sampling hash needs
   * while staying engine-mirrorable.
   */
  def stratifiedSample(d: DataFrame, stratum: Column,
      rates: Seq[(String, Double)], defaultRate: Double,
      salt: String): DataFrame = {
    val inner =
      TextAnalysis.polyHash(concat(col("doc_id").cast("string"), lit(":" + salt)))
    val bucket = pmod(TextAnalysis.polyHash(inner.cast("string")), lit(10000L))
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(stratum === s, lit(r)).otherwise(acc)
    }
    d.select(col("doc_id"), stratum.as("stratum"),
      bucket.as("sample_bucket"),
      (bucket.cast("double") < rate * 10000.0).as("keep"))
  }

  /**
   * Temperature-based corpus mixing (Conneau & Lample 2019 §3.1; mT5's
   * α-sampling): a stratum with natural share p_s = n_s/N is drawn with
   * probability q_s ∝ p_s^α — α < 1 up-samples low-resource strata. To
   * target `targetFrac`·N kept docs, stratum s keeps
   * `min(1, q_s·targetFrac·N / n_s)` of its docs, decided by the same
   * deterministic cascaded-hash draw as [[stratifiedSample]].
   *
   * Engine-determinism: stratum weights are computed on the k-row aggregate
   * and normalized through a SCALED-INTEGER sum (round(w·1e9) as a long) —
   * a floating sum over strata would depend on summation order and could
   * diverge between engines at the last ulp; integer sums cannot. α = 0.5
   * (the common published setting) uses `sqrt`, which IEEE 754 rounds
   * correctly everywhere, keeping the whole rate bit-identical on any
   * engine. Scale shape: one `groupBy(stratum)` to k rows + a broadcast
   * join back — never a full-frame window.
   *
   * Returns `doc_id, stratum, rate (6 dp), keep`.
   */
  def temperatureSample(d: DataFrame, stratum: Column, alpha: Double,
      targetFrac: Double, salt: String): DataFrame = {
    val sized = d.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_s"))
    val p = col("n_s").cast("double") / col("n_total").cast("double")
    val w = if (alpha == 0.5) sqrt(p) else pow(p, alpha)
    val rates = sized
      .withColumn("n_total", sum("n_s").over(Window.partitionBy(lit(1))))
      .withColumn("w_int", round(w * 1e9).cast("long"))
      .withColumn("w_sum", sum("w_int").over(Window.partitionBy(lit(1))))
      .withColumn("rate", least(lit(1.0),
        (col("w_int").cast("double") / col("w_sum").cast("double")) *
          lit(targetFrac) * col("n_total").cast("double") /
          col("n_s").cast("double")))
      .select(col("stratum"), col("rate"))
    val inner =
      TextAnalysis.polyHash(concat(col("doc_id").cast("string"), lit(":" + salt)))
    val bucket = pmod(TextAnalysis.polyHash(inner.cast("string")), lit(10000L))
    d.select(col("doc_id"), stratum.as("stratum"))
      .join(broadcast(rates), Seq("stratum"))
      .select(col("doc_id"), col("stratum"), round(col("rate"), 6).as("rate"),
        (bucket.cast("double") < col("rate") * 10000.0).as("keep"))
  }

  /**
   * GPT-style sequence packing: documents are sharded into `buckets` by
   * `doc_id mod buckets`, concatenated within a bucket in `doc_id` order, and
   * split every `ctxLen` tokens. Each doc learns which training example its
   * first token lands in (`example_id`), at which offset, and whether it
   * spans an example boundary. Returns
   * `doc_id, bucket, n_tokens, example_id, offset_in_example,
   * crosses_boundary`.
   */
  /**
   * BM25 top-`k` document search (Robertson/Sparck-Jones Okapi BM25 with the
   * Lucene-style non-negative idf `ln(1 + (N - df + 0.5)/(df + 0.5))`) for a
   * fixed bag of query terms — the classic lexical retrieval primitive next
   * to the ANN queries' dense retrieval.
   *
   * Engine-exact scoring: each (doc, term) partial
   * `idf_t · tf(k1+1) / (tf + k1(1 - b + b·dl/avgdl))` is computed in one
   * fixed float-op order and rounded to integer micro-units BEFORE the
   * per-doc sum (exact long addition — a float sum over terms would depend
   * on aggregation order). Ranking ties: doc_id asc.
   *
   * Scale shape: the explode filters to the query's terms IMMEDIATELY (the
   * tf frame is O(matching postings), not O(corpus tokens)); df derives
   * from tf; idf is a |query|-row broadcast; N and avgdl are one-off
   * scalars; top-k is TakeOrdered, never a full sort. Returns
   * `doc_id, n_terms_hit, score_micro`.
   */
  def bm25TopK(d: DataFrame, text: Column, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val ws = TextAnalysis.words(lower(text))
    val stats = d.agg(count(lit(1)), sum(size(ws).cast("long"))).head
    val n = stats.getLong(0)
    val avgdl = Option(stats.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
      .toDouble / math.max(n, 1L)
    val tf = d.select(col("doc_id"), size(ws).cast("double").as("dl"),
        explode(ws).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).cast("double").as("tf"))
    val idf = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      .select(col("term"),
        log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
          .as("idf"))
    val partial = tf.join(broadcast(idf), Seq("term"))
      .select(col("doc_id"),
        round(col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl)) *
          1e6).cast("long").as("score_micro_t"))
    partial.groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_terms_hit"),
        sum("score_micro_t").as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }

  /**
   * TF-IDF top-`k` terms per document (the smooth sklearn-style idf:
   * `ln((N+1)/(df+1)) + 1`), the classic corpus-analytics primitive for
   * keyword extraction / doc profiling. Scores are exact longs: idf scales
   * to integer micro-nats once per TERM (round(ln·1e6) + 1e6), then
   * `score = tf · idf_micro` is integer multiplication — no float ever
   * aggregates, so top-k ties resolve identically on any engine (rank by
   * score desc, term asc).
   *
   * Scale shape: tf = one explode + groupBy(doc_id, term) with map-side
   * combine; df derives from tf by a groupBy(term) (never a second corpus
   * pass); the idf join back is equi on term (vocabulary-sized — SMJ is the
   * scale-correct strategy, a broadcast would assume a bounded vocabulary);
   * top-k is a window partitioned by doc_id. N (corpus size) is a one-off
   * scalar of the model-build step. Returns `doc_id, rank, term,
   * score_micro`.
   */
  def tfIdfTopTerms(d: DataFrame, text: Column, k: Int): DataFrame = {
    val n = d.count()
    val tf = d.select(col("doc_id"), explode(TextAnalysis.words(lower(text))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"),
        (round(log((lit(n) + 1.0) / (col("df") + lit(1.0))) * 1e6).cast("long") +
          1000000L).as("idf_micro"))
    val ranked = tf.join(idf, Seq("term"))
      .select(col("doc_id"), col("term"),
        (col("tf") * col("idf_micro")).as("score_micro"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score_micro").desc, col("term"))))
    ranked.filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("score_micro"))
  }

  /**
   * Deterministic token-budget head selection — "take the first `budget`
   * tokens worth of documents" in a seeded shuffle order, the standard way a
   * training run pins its corpus slice to a token count. The order is the
   * salted CASCADED doc hash (uniform, identical across engines and retries;
   * the raw polynomial hash is affine in its last chars — see
   * [[stratifiedSample]]). A doc is kept iff the running token total BEFORE
   * it is < `budget`: the boundary doc that crosses the budget is kept
   * ("fill then close on overflow"); callers wanting a hard cap filter
   * `cum_start + n_tokens <= budget`.
   *
   * Scale shape — an exact GLOBAL prefix sum with NO global sort: the sort
   * key's high bits split the corpus into `buckets` ranges, stage 1
   * aggregates per-bucket token sums (one groupBy to a k-row frame) and
   * computes cross-bucket running offsets with a window over those k rows
   * only, stage 2 computes within-bucket prefixes with a window PARTITIONED
   * by bucket (parallel, each task sees corpus/k rows) and adds the
   * broadcast bucket offset. No task ever materializes a global order.
   * Returns `doc_id, n_tokens, sort_key, cum_start, keep`.
   */
  def tokenBudgetHead(d: DataFrame, tokens: Column, budget: Long,
      salt: String = "budget", buckets: Int = 256): DataFrame = {
    val inner = TextAnalysis.polyHash(
      concat(col("doc_id").cast("string"), lit(":" + salt)))
    val key = TextAnalysis.polyHash(inner.cast("string"))
    // bucket = the key's range index — a MONOTONE function of the key, so
    // bucket boundaries respect the global (key, doc_id) order
    val span = (TextAnalysis.HashMod + buckets - 1) / buckets
    val keyed = d.select(col("doc_id"),
      coalesce(tokens.cast("long"), lit(0L)).as("n_tokens"),
      key.as("sort_key"), (key / span).cast("long").as("bucket"))
    val offsets = keyed.groupBy("bucket").agg(sum("n_tokens").as("bucket_sum"))
      .withColumn("bucket_start",
        coalesce(sum("bucket_sum").over(
          Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "bucket_start")
    val local = Window.partitionBy("bucket").orderBy("sort_key", "doc_id")
    keyed
      .withColumn("local_end", sum("n_tokens").over(local))
      .join(broadcast(offsets), Seq("bucket"))
      .select(col("doc_id"), col("n_tokens"), col("sort_key"),
        (col("bucket_start") + col("local_end") - col("n_tokens")).as("cum_start"))
      .withColumn("keep", col("cum_start") < budget)
  }

  def packSequences(d: DataFrame, tokens: Column, buckets: Int,
      ctxLen: Int): DataFrame = {
    val w = Window.partitionBy("bucket").orderBy("doc_id")
    d.select(col("doc_id"), pmod(col("doc_id"), lit(buckets.toLong)).as("bucket"),
        tokens.cast("long").as("n_tokens"))
      .withColumn("cum_end", sum(col("n_tokens")).over(w))
      .withColumn("start", col("cum_end") - col("n_tokens"))
      .select(col("doc_id"), col("bucket"), col("n_tokens"),
        expr(s"start DIV $ctxLen").as("example_id"),
        pmod(col("start"), lit(ctxLen.toLong)).as("offset_in_example"),
        (col("n_tokens") > 0 &&
          expr(s"(cum_end - 1) DIV $ctxLen") > expr(s"start DIV $ctxLen"))
          .as("crosses_boundary"))
  }

  /**
   * CCNet-style cross-document paragraph deduplication (Wenzek et al. 2020
   * §3.1): split each doc on `sep`, fingerprint each trimmed non-empty
   * paragraph (lowercase + whitespace-normalized polyHash — the same key as
   * exact doc dedup), keep only the FIRST occurrence corpus-wide (by doc_id,
   * then position), and reassemble each doc from its surviving paragraphs.
   * Returns `doc_id, n_paras, n_kept, text_kept`. Scale shape: one explode,
   * one window shuffle on the paragraph hash, one `groupBy(doc_id)` — linear,
   * never pairwise.
   */
  /** The one paragraph derivation [[paragraphDedup]] and
    * [[sharedParagraphEdges]] share (the two must agree on what a paragraph
    * is): split on `sep`, trim, drop empties, keep the position. */
  private def paragraphsOf(d: DataFrame, text: Column, sep: String): DataFrame =
    d.select(col("doc_id"),
        posexplode(split(text, java.util.regex.Pattern.quote(sep)))
          .as(Seq("seq", "raw")))
      .select(col("doc_id"), col("seq"), trim(col("raw")).as("para"))
      .filter(col("para") =!= "")

  def paragraphDedup(d: DataFrame, text: Column, sep: String): DataFrame = {
    val paras = paragraphsOf(d, text, sep)
    val w = Window
      .partitionBy(TextAnalysis.docFingerprint(col("para")))
      .orderBy("doc_id", "seq")
    val perDoc = paras
      .withColumn("kept", row_number().over(w) === 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_paras"),
        sum(when(col("kept"), 1).otherwise(0)).cast("int").as("n_kept"),
        array_join(transform(
          sort_array(collect_list(when(col("kept"),
            struct(col("seq"), col("para"))))),
          _.getField("para")), "\n").as("text_kept"))
    // docs whose text has NO non-empty paragraph still appear (zeros/empty),
    // like every sibling operator — a curation pipeline must never lose docs
    d.select(col("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_paras"), lit(0)).as("n_paras"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }

  /**
   * Star edges of the shared-paragraph graph: one edge from every doc to the
   * MINIMUM doc_id sharing each paragraph fingerprint. Linear in paragraph
   * count (one groupBy per fingerprint), never the quadratic within-group
   * pair set — and yields the same connected components, since a star
   * connects exactly what pairwise edges would.
   */
  def sharedParagraphEdges(d: DataFrame, text: Column, sep: String): DataFrame = {
    // no pre-distinct: the window min is duplicate-insensitive and the edge
    // set is distinct'd below — the old (doc_id, fp) distinct was a third
    // full exchange buying nothing
    val paras = paragraphsOf(d, text, sep)
      .select(col("doc_id"), TextAnalysis.docFingerprint(col("para")).as("fp"))
    // star root as a window MIN over the fp partitioning: one paragraph
    // pass and one exchange — the former distinct+groupBy+self-join
    // re-derived the whole paragraph explode for each side and paid two
    // more exchanges (same skew bound either way: a hot paragraph's rows
    // land in one task)
    paras
      .withColumn("root", min("doc_id").over(Window.partitionBy("fp")))
      .filter(col("doc_id") =!= col("root"))
      .select(col("root").as("src"), col("doc_id").as("dst"))
      .distinct()
  }

  /**
   * Connected components by iterative min-label propagation (hash-to-min,
   * Rastogi et al. 2013 / the MapReduce CC family): every vertex starts as
   * its own component and repeatedly adopts the minimum component id among
   * itself and its neighbors, until a fixpoint — the unique labeling where
   * each vertex carries its component's minimum id. Rounds are bounded by
   * the graph diameter (O(log n) for the star-heavy dedup graphs this is
   * built for); each round is one equi-join + one `groupBy` — no driver-side
   * graph state, so components over billions of vertices run as a handful of
   * shuffles. Input needs (`src`, `dst`); returns `doc_id, component`.
   */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // materialize the symmetrized edge relation ONCE — it is joined every
    // round, and leaving it lazy would re-run the upstream edge derivation
    // (explode + shuffles) per iteration
    val sym = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
      .distinct()
      .localCheckpoint(true)
    val vertices = sym.select(col("a").as("doc_id")).distinct()
    var comp = vertices.select(col("doc_id"), col("doc_id").as("component"))
    // convergence probe: labels are per-vertex NON-INCREASING (min-adoption
    // and pointer jumping only ever lower them, and labels are vertex ids),
    // so "any vertex changed" ⟺ "Σ component strictly decreased". The sum is
    // exact decimal(38) arithmetic (63 + log2(n) bits fits for any real n),
    // one 1-row aggregation over the just-checkpointed labeling — the former
    // probe re-joined next against comp and counted, a full extra join
    // per round
    // decimal(28,0) inputs sum as decimal(38,0): overflow (→ null under
    // non-ANSI sum) would need ~10^19 max-long labels, not the ~10^11 the
    // former decimal(20,0)→decimal(30,0) sum allowed — exactly the 100 TB
    // regime. A null sum over a NON-EMPTY labeling (overflow, or component
    // ids that cast to decimal as null) must fail loudly: None == None
    // would otherwise read as converged after round 1 and return an
    // unconverged labeling, bypassing the fail-loud guard below.
    def labelSum(d: DataFrame): Option[java.math.BigDecimal] = {
      val row = d.agg(
        sum(col("component").cast("decimal(28,0)")).as("s"),
        count(lit(1)).as("n")).head
      val s = Option(row.getDecimal(0))
      if (s.isEmpty && row.getLong(1) > 0L)
        throw new IllegalStateException(
          "connectedComponents convergence sum is null over a non-empty " +
            "labeling (non-numeric component ids, or decimal overflow) — " +
            "cannot probe convergence")
      s
    }
    var prevSum = labelSum(comp)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // round 1's labeling is the identity map, so the neighbor's label IS
      // the neighbor — the join would only look ids up in themselves
      val viaNeighbor =
        if (i == 0) sym.select(col("a").as("doc_id"), col("b").as("component"))
        else sym
          .join(comp.withColumnRenamed("doc_id", "b"), Seq("b"))
          .select(col("a").as("doc_id"), col("component"))
      val viaMin = comp.unionByName(viaNeighbor)
        .groupBy("doc_id").agg(min("component").as("component"))
      // pointer jumping: also adopt the label OF the label (labels are
      // always vertex ids, so the self-join always finds its row) — rounds
      // drop from O(diameter) to O(log diameter), the difference between a
      // dozen shuffles and a few on chain-shaped duplicate clusters.
      // localCheckpoint truncates lineage each round — without it the plan
      // telescopes (every iteration embeds the previous one) and a long run
      // would overwhelm the optimizer; a production job on unreliable
      // executors would use a reliable checkpoint dir instead
      val labels = viaMin.select(col("doc_id").as("ld"), col("component").as("lc"))
      val next = viaMin.join(labels, col("component") === col("ld"), "left")
        .select(col("doc_id"), coalesce(col("lc"), col("component")).as("component"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      comp = next
      converged = nextSum == prevSum
      prevSum = nextSum
      i += 1
    }
    // a non-converged labeling is WRONG (labels neither minimal nor roots)
    // and indistinguishable from a converged one — fail loudly, never cap
    // silently. Superseded rounds' localCheckpoint blocks are released by the
    // ContextCleaner once unreferenced (comp is reassigned each round), so at
    // most ~2 labelings are live at a time in steady state.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(pointer jumping needs ~log2(diameter); raise maxIter)")
    comp
  }

  /**
   * Per-source quota (RefinedWeb/C4-style per-domain caps): spam and SEO
   * farms concentrate in single domains, so curation caps each source at
   * `quota` docs, keeping the best by `preference` (descending; doc_id
   * breaks ties so the cut is deterministic). Returns the kept docs with
   * their per-source rank.
   *
   * Scale shape — grouped top-N without a monster-source sort: a naive
   * `row_number() over (partition by source)` sorts EVERY doc of the
   * largest domain in one task (a 100M-doc SEO farm = one straggler).
   * Instead stage 1 ranks within (source, hash sub-bucket) and keeps each
   * sub-bucket's top `quota` — any global top-quota doc is necessarily in
   * its sub-bucket's top quota, so no survivor is lost and per-task sort
   * size divides by `subBuckets`; stage 2 ranks the ≤ subBuckets·quota
   * survivors per source exactly.
   */
  /**
   * The recurring-crawl REFRESH pipeline (the q_crawl_refresh capstone) as a
   * reusable composition — five proven-shape stages in one DAG:
   * canonical-URL dedup inside the crawl → exact incremental dedup vs
   * history (broadcast Bloom + anti-join) → near-dup vs history (banded
   * probe + exact Jaccard) → LM quality floor → per-source quota.
   *
   * `materialize(name, df)` pins a stage's survivor set before downstream
   * stages reference it repeatedly (bands, shingles, LM probes, quota) —
   * without it every reference re-runs the whole upstream pipeline
   * (measured 20.5 s → ~8 s at sf0.1). Two callers, two durability
   * stories:
   *  - `(_, df) => df.localCheckpoint(true)` — executor-memory lineage
   *    truncation, right for a single job that owns its driver;
   *  - [[graft.sinks.StageStore]] — each stage lands in parquet behind a
   *    done-marker, so a refresh killed between stages RESUMES from the
   *    last completed stage instead of recomputing (the 100 TB durability
   *    story: stage outputs are restart currency, not scratch).
   * Stage names are stable: "url_kept", "exact_new", "near_new".
   */
  def crawlRefresh(history: DataFrame, delta: DataFrame, rawUrl: Column,
      lmRef: DataFrame, headMinAvgLp: Double, midMinAvgLp: Double,
      quota: Int,
      materialize: (String, DataFrame) => DataFrame): DataFrame = {
    // materialized: [[incrementalDedup]]'s Bloom split references its
    // incoming frame TWICE (definitely-new filter + confirm anti-join), and
    // an unmaterialized urlKept re-ran the canonical-URL window + delta
    // union for each reference
    val urlKept = materialize("url_kept", delta
      .withColumn("canonical_url", canonicalizeUrl(rawUrl))
      .withColumn("u_min",
        min("doc_id").over(Window.partitionBy("canonical_url")))
      .filter(col("doc_id") === col("u_min"))
      .drop("u_min", "canonical_url"))
    val exactNew = materialize("exact_new",
      incrementalDedup(history, urlKept, col("text")).drop("fp"))
    val nearFlagged = incrementalNearDup(history,
      exactNew.select(col("doc_id"), col("text"))).select(col("doc_id"))
    val nearNew = materialize("near_new",
      exactNew.join(nearFlagged, Seq("doc_id"), "left_anti"))
    val scored = lmQualityScore(nearNew, lmRef, col("text"),
      headMinAvgLp, midMinAvgLp)
    val kept = nearNew.join(
      scored.filter(col("bucket") =!= "tail").select("doc_id", "bucket"),
      Seq("doc_id"))
    sourceQuota(kept, col("source"), col("n_chars"), quota)
  }

  def sourceQuota(docs: DataFrame, source: Column, preference: Column,
      quota: Int, subBuckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sub = pmod(TextAnalysis.polyHash(
      concat(col("doc_id").cast("string"), lit(":quota"))), lit(subBuckets.toLong))
    val partial = docs
      .withColumn("quota_sub", sub)
      .withColumn("prk", row_number().over(
        Window.partitionBy(source, col("quota_sub"))
          .orderBy(preference.desc, col("doc_id"))))
      .filter(col("prk") <= quota)
      .drop("quota_sub", "prk")
    partial.withColumn("rk", row_number().over(
        Window.partitionBy(source).orderBy(preference.desc, col("doc_id"))))
      .filter(col("rk") <= quota)
  }

  /**
   * Leakage-safe train/val/test split: assignment is by DUPLICATE CLUSTER,
   * never by individual doc — hashing doc ids puts near-identical docs on
   * both sides of the split and leaks training data into evaluation. Docs
   * sharing content (the `edges` relation — [[sharedParagraphEdges]], or
   * verified near-dup pairs from the LSH path) collapse into connected
   * components; every member inherits its component's split, drawn from the
   * cascaded hash of the COMPONENT id (the affine polyHash is cascaded
   * exactly as in [[stratifiedSample]] — see the pitfalls note there).
   * Edge-free docs are their own singleton component. `trainFrac`/`valFrac`
   * are fractions of the 10k-bucket space; the remainder is test.
   *
   * Scale shape: [[connectedComponents]]' O(log diameter) rounds over the
   * edge relation (dedup graphs are star-heavy and shallow), one left join
   * to spread labels, then pure hash columns — the split decision itself
   * costs no shuffle. Returns `doc_id, component, split`.
   */
  def leakageSafeSplit(docs: DataFrame, edges: DataFrame,
      trainFrac: Double = 0.8, valFrac: Double = 0.1,
      salt: String = "split"): DataFrame = {
    val comps = connectedComponents(edges)
    val assigned = docs.select(col("doc_id"))
      .join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
    val inner = TextAnalysis.polyHash(
      concat(col("component").cast("string"), lit(":" + salt)))
    val bucket = pmod(TextAnalysis.polyHash(inner.cast("string")), lit(10000L))
    assigned.withColumn("split",
      when(bucket < math.round(trainFrac * 10000), lit("train"))
        .when(bucket < math.round((trainFrac + valFrac) * 10000), lit("val"))
        .otherwise(lit("test")))
  }

  /**
   * Symmetric int8 scalar quantization of an embedding column — the standard
   * 4× storage/bandwidth reduction for a vector corpus (per-vector scale =
   * max |x| / 127, q = round(x / scale)). Pure codegen'd columns, no shuffle.
   * Returns `(scale, q)` as a struct; `scale = 0` (the all-zero vector)
   * quantizes to zeros.
   */
  def quantizeInt8(embedding: Column): Column = aggregate(
    embedding,
    lit(0.0), (m, x) => greatest(m, abs(x.cast("double"))),
    // build the struct in the FINISH lambda so `m` (the max-abs fold result)
    // binds once per row: referencing the aggregate as a sibling expression
    // would re-evaluate the whole O(d) fold inside every per-element lambda
    // step (higher-order functions cache nothing), turning quantization
    // O(d^2) per row
    m => {
      val scale = m / 127.0
      struct(scale.as("scale"),
        transform(embedding, x =>
          when(m === 0.0, lit(0L))
            .otherwise(round(x.cast("double") / scale)).cast("int")).as("q"))
    })

  /** Dequantized vector from [[quantizeInt8]] output: `q * scale`.
    * Materialize the struct in its own projection before calling this —
    * passing the [[quantizeInt8]] expression directly would re-run the
    * whole quantization per element (see the note there). */
  def dequantizeInt8(quant: Column): Column =
    transform(quant.getField("q"),
      v => v.cast("double") * quant.getField("scale"))

  /** Scrub-oriented US phone shape (the reference's `US_PHONE_NUMBERS_PATTERN`
    * is anchored to end-of-text for containment tests, so redaction uses the
    * common dotted/dashed 3-3-4 form). */
  val ScrubPhonePattern = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** IPv4-only redaction shape (the loose IPv6 alternation in
    * `IP_ADDRESS_PATTERN` matches ordinary hex-like words, so scrubbing
    * keeps to the unambiguous dotted quad). */
  val ScrubIpv4Pattern: String =
    "(?:25[0-5]|2[0-4]\\d|1\\d{2}|[1-9]?\\d)(?:\\.(?:25[0-5]|2[0-4]\\d|1\\d{2}|[1-9]?\\d)){3}"

  /**
   * Redact PII with typed tags, counting as it goes: emails → `[EMAIL]`,
   * then IPv4s → `[IP]` (counted on the email-scrubbed text so an address
   * inside an email never double-counts), then phones → `[PHONE]`. Returns a
   * struct `(scrubbed, n_emails, n_ips, n_phones)`.
   */
  def piiScrub(text: Column): Column = {
    val emailRe = Predicates.EmailAddressPattern
    val nEmails = size(regexp_extract_all(text, lit(emailRe), lit(0)))
    val noEmail = regexp_replace(text, emailRe, "[EMAIL]")
    val nIps = size(regexp_extract_all(noEmail, lit(ScrubIpv4Pattern), lit(0)))
    val noIp = regexp_replace(noEmail, ScrubIpv4Pattern, "[IP]")
    val nPhones = size(regexp_extract_all(noIp, lit(ScrubPhonePattern), lit(0)))
    val scrubbed = regexp_replace(noIp, ScrubPhonePattern, "[PHONE]")
    struct(scrubbed.as("scrubbed"), nEmails.as("n_emails"),
      nIps.as("n_ips"), nPhones.as("n_phones"))
  }
}
