package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan-regression guard: builds the physical plan of every declared query at
 * sf0.001 and pins the scale-critical facts so a future edit that de-optimizes
 * a plan fails CI instead of shipping:
 *
 *  - no `CartesianProduct` anywhere;
 *  - no `BroadcastNestedLoopJoin` anywhere: broadcast tiny-probe attaches go
 *    through `CorpusOps.attachBroadcast` (constant-key BroadcastHashJoin);
 *  - `SortMergeJoin` only where both sides are genuinely large
 *    (q_element_type_accuracy's gold×pred join);
 *  - parquet filter pushdown (`PushedFilters`) present on the queries that
 *    filter base tables;
 *  - per-query Exchange (shuffle) counts never exceed today's plan — a raised
 *    count means a new shuffle crept in; if intentional, raise the cap here
 *    in the same commit.
 *
 * Plans are built with AQE off (same as `PlanAudit`) so counts are static.
 * The streaming query is excluded: building its "plan" executes the stream.
 */
class PlanGuardSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private val smjAllowed = Map("q_element_type_accuracy" -> 1,
    // intra-cluster pair join: both sides are the full centroid assignment —
    // SMJ on (cluster, sub) IS the scale-correct strategy. Clusters over
    // maxClusterSize are hash re-split into sub-buckets first (r12), so a
    // task's pair work is ≤ maxClusterSize² even on a degenerate corpus —
    // no unbounded Σ cluster² remains. The second SMJ is the duplicate-ids
    // left join back onto the assignment: on a near-dup-heavy corpus dups is
    // O(n), so an equi-SMJ on vec_id — not a broadcast — is the right call
    // at scale (pre-r12 it was a BHJ only via small-corpus size estimates).
    "q_semantic_dedup" -> 2,
    // the sampled-ids join back onto the quality-filtered corpus: both sides
    // are corpus-sized, so SMJ on doc_id is the correct strategy
    "q_curate_training_set" -> 1,
    // the component-label spread onto the corpus: on a dup-heavy corpus the
    // labeled side is O(n) docs, so an equi-SMJ on doc_id — not a broadcast
    // — is the scale-correct strategy
    "q_leakage_safe_split" -> 1,
    // the A-side×B-side cell equi-join (both sides corpus-sized, hot-cell
    // capped) and the margin join back onto the pair frame: equi-SMJ is the
    // scale-correct strategy for both
    "q_margin_align" -> 2,
    // the covered-position anti-join back onto the exploded word positions:
    // both sides are corpus-sized (every word position vs every removed
    // window position), so an equi-SMJ on (doc_id, idx) is the right call
    "q_self_substring_dedup" -> 1,
    // five composed crawl-refresh stages joining corpus-sized survivor sets
    // on doc_id (near-dup anti, LM-bucket join, and their re-listed
    // references): equi-SMJ is the scale-correct strategy for each
    "q_crawl_refresh" -> 6)

  /** Queries whose scan must show non-empty PushedFilters. */
  private val mustPushFilters = Seq("q1_pricing_summary", "q3_top_revenue_orders",
    "q5_region_nation_revenue", "q_bbox_overlap_pairs", "q_classify_positional",
    "q_convert_to_coco", "q_merge_layout", "q_sort_basic")

  /** Shuffle-count caps above the default; everything else gets [[DefaultExchCap]]. */
  private val exchCapOverrides = Map(
    "q_embed_near_dup" -> 13, "q_jaccard_near_dup" -> 13, "q_lsh_near_dup" -> 8,
    // the union of BOTH eval pipelines' per-doc frames (text: stem join +
    // distributed Levenshtein map; element-type: tag-union three-level agg),
    // each folded to the 1-row aggregate-scores shape and re-listed once per
    // AGG_HEADERS metric row in the AQE-off textual plan — runtime exchange
    // reuse collapses the duplicates
    "q_eval_capstone" -> 19,
    // base scan re-listed under the union's dup-augmentation side, then the
    // (source, fp) agg, the per-source rollup, and the output sort
    "q_corpus_profile" -> 5,
    // LM train + score in one DAG: the ref slice's bigram/predecessor
    // aggregations (the refBi subtree is re-listed feeding refC1 AND the
    // probe join in the AQE-off textual plan), two broadcast probe
    // exchanges, the per-doc groupBy, the corpus left join, and the output
    // sort — all equi-keyed or broadcast, no global window
    "q_lm_quality" -> 13,
    // two-sided (history + delta) rendering of the jaccard shape: each side's
    // band subtree (explode + hot-band window) and shingle subtree appear
    // separately in the AQE-off textual plan, plus the candidate distinct,
    // the best-match row_number window, and the output sort; runtime
    // exchange reuse collapses the repeated delta-union upstream
    "q_incremental_near_dup" -> 15,
    // the banded (window-capped) subtree is re-listed on BOTH sides of the
    // self-join in the AQE-off textual plan, plus candidate distinct and the
    // output sort; runtime exchange reuse collapses the duplicated side
    "q_simhash_near_dup" -> 9,
    // the k-row stratum aggregate (groupBy + two 1-partition windows over k
    // rows) feeds the broadcast rate join; plus the output sort
    "q_temperature_sample" -> 6,
    // the full curation pipeline: window dedup + banded self-join with the
    // shingle payload carried + skew-cap window + broadcast anti + sort; the
    // referenced-twice band subtree duplicates its upstream in the AQE-off
    // textual plan (exchange reuse collapses them at runtime)
    "q_curate_corpus" -> 16,
    "q_ann_ivf" -> 8,
    // q_ann_ivf's exchange shape (assignment + probe broadcasts re-listed in
    // the AQE-off textual plan) — identical cells, nprobe=2 probe frame
    "q_ann_ivf_multiprobe" -> 8,
    "q_ngram_overlap" -> 7, "q_percent_missing_text" -> 7,
    // NB train (tagged-union bucket groupBy) + held-out scoring groupBy +
    // the top-k sort + the final global agg, with the broadcast model
    // exchange re-listed in the AQE-off textual plan
    "q_nb_select_precision" -> 8,
    // DSIR scoring (tagged-union bucket groupBy + per-doc groupBy) +
    // Gumbel top-k + final agg; broadcast model exchange re-listed
    "q_dsir_select_precision" -> 7,
    // one tagged union then FOUR grouped aggregation levels (r17: the
    // element-grain level split into count-by-(k,t,d,path,is_o) then a
    // merge-to-(k,t,d) — one exchange more, but the element-level pass and
    // its map-side partial hash-aggregate instead of sorting; the former
    // single-level min(path) string aggregate forced SortAggregate) + the
    // per-(doc,t) and per-doc levels + the output sort; each level is a
    // map-side-combinable equi-key — the per-doc python loop rendered
    // relationally
    "q_element_type_eval" -> 8,
    // the tail of the five-stage refresh below the PERSISTED near_new scan
    // (LM train/score + bucket join + quota windows + sort): upstream
    // stages' exchanges are gone — they ran once into parquet — but the LM
    // ref-slice subtrees are re-listed in the AQE-off textual plan
    "q_crawl_refresh_persisted" -> 14,
    // one tagged explode -> 3 aggregation levels + id join + output sort (the
    // AQE-off textual plan re-lists the reused doc_id exchanges)
    "q_repetition_signals" -> 7,
    // the repetition subtree above + the C4-flag doc_id join + output sort
    // (both doc_id exchanges re-listed in the AQE-off textual plan)
    "q_quality_prune" -> 10,
    // per-doc gram distinct + bench-gram distinct feeding the broadcast +
    // hit groupBy + left join back + output sort (broadcast exchanges count)
    "q_decontaminate" -> 8,
    // the tagged (fingerprint + bloom-probe) incoming subtree is re-listed
    // in BOTH union branches of the AQE-off textual plan, and the confirm
    // anti-join's history distinct adds its own exchange; at runtime the
    // bloom-cleared branch has NO join — that's the operator's point
    "q_incremental_dedup" -> 10,
    // pruned lake scan -> doc reassembly groupBy -> fingerprint dedup window
    // -> per-bucket packing window -> output sort, each its own key (r12: the
    // parse moved into the one-time ingestToLake materialization)
    "q_ingest_curate" -> 6,
    // fingerprint window + reassembly groupBy + the all-docs left join that
    // keeps paragraph-less docs + output sort (doc_id exchanges re-listed)
    "q_paragraph_dedup" -> 7,
    // the flag pipeline above plus covered-position distinct, the word
    // anti-join, reassembly groupBy and the totals left join (the words
    // subtree re-listed per reference in the AQE-off textual plan)
    "q_decontaminate_spans" -> 11,
    // two single-partition top-10 sorts + their 1-row collect_list aggs and
    // the broadcast summary join
    "q_embed_quant_recall" -> 8,
    // identical exchange shape over the truncated corpus
    "q_mrl_recall" -> 8,
    // the assignment subtree (scan + broadcast centroid probe) is re-listed
    // 3x (pair-a, pair-b, output) in the AQE-off textual plan; runtime
    // exchange reuse collapses them — same accounting as q_curate_corpus
    "q_semantic_dedup" -> 20,
    // five composed stages over one corpus: the deduped subtree (union +
    // fingerprint window) is re-listed per downstream reference in the
    // AQE-off textual plan — runtime exchange reuse collapses them
    "q_curate_training_set" -> 28,
    // the crawl-refresh capstone: survivor sets materialize between stages
    // (lineage-truncating checkpoints — 2.9x runtime, see the query), so the
    // visible plan is the post-materialization tail (LM probes + bucket join
    // + quota windows + sort); the per-stage plans are individually pinned
    // by their standalone queries
    "q_crawl_refresh" -> 18,
    "q5_region_nation_revenue" -> 6, "q_element_type_accuracy" -> 6,
    // two partition_text passes + (type,depth)/type/global aggregation levels
    "q_element_type_percent_match" -> 7,
    // metadata chain + forward-fill window + parent groupBy + output sort
    "q_group_by_parent_orphans" -> 5,
    "q_bbox_overlap_pairs" -> 5,
    // the assigned/capped subtree (broadcast centroid probe + hot-cell
    // window) is re-listed under BOTH join sides, and the pair subtree under
    // the two neighborhood aggregates AND the margin join, in the AQE-off
    // textual plan — runtime exchange reuse collapses the duplicates; the
    // live chain is assign → cap window → cell join → 2 rank windows → 2
    // groupBys → margin join → best window → sort
    "q_margin_align" -> 23,
    // the query-term tf subtree is re-listed under the df/idf aggregate and
    // the tf side of the broadcast idf join in the AQE-off textual plan;
    // plus the per-doc groupBy and the TakeOrdered tail
    "q_bm25_search" -> 8,
    // the tf subtree (explode + groupBy) is re-listed under the df aggregate
    // AND the tf side of the idf join in the AQE-off textual plan (runtime
    // exchange reuse collapses them); plus the doc_id top-k window and sort
    "q_tfidf_top_terms" -> 9,
    // the keyed subtree re-listed under the bucket-offset aggregate (k-row
    // single-partition window) and the bucket-local window; broadcast join
    // back + output sort
    "q_token_budget_head" -> 7,
    // tagged-union model groupBy (its two explode branches re-listed in the
    // AQE-off textual plan) + the broadcast model probe + groupBy(doc_id) +
    // the corpus left join + output sort; the model is <= 1024 rows by the
    // hashing-trick bound, so the probe join is always broadcast
    "q_nb_quality" -> 9,
    // same model shape over uni+bigram features; no corpus join back — the
    // tail is the TakeOrdered top-k, which adds no exchange
    "q_dsir_select" -> 6,
    // EXACTSUBSTR two-pass inventory: the occurrence subtree (scan + window
    // explode + xxhash) is re-listed under dupHash/cand, and cand under
    // dup/keeper/removals, in the AQE-off textual plan — runtime exchange
    // reuse collapses the duplicates; the live chain is hash groupBy →
    // exact groupBy → keeper min-agg → anti-join → reassembly groupBy
    "q_self_substring_dedup" -> 23,
    // the whole verify now runs distributed INSIDE the drain's foreachBatch;
    // the batch tail is only the output sort over the collected survivors
    "q_stream_winnow_near_dup" -> 1,
    // fingerprint explode + hot-fp window + self equi-join + pair groupBy +
    // output sort; the bounded subtree is re-listed on BOTH sides of the
    // self-join in the AQE-off textual plan (exchange reuse collapses it)
    "q_winnow_near_dup" -> 8,
    "q_overlap_cases" -> 5) // pair self-join on the exploded case corpus
  private val DefaultExchCap = 4

  private lazy val plans: Map[String, String] = {
    val spark = SparkSuiteBase.session
    Tables.configure(spark)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      SparkEntry.queries.keys.toSeq.sorted
        .filterNot(_ == "q_stream_hourly_window")
        .map { n =>
          n -> SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString
        }.toMap
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  private def count(plan: String, re: String): Int = re.r.findAllIn(plan).size

  test("no CartesianProduct in any query plan") {
    val offenders = plans.filter { case (_, p) => p.contains("CartesianProduct") }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.keys.toSeq.sorted}")
  }

  test("no BroadcastNestedLoopJoin anywhere (repo-wide bnl=0 invariant)") {
    // Every broadcast tiny-probe attach goes through
    // CorpusOps.attachBroadcast (a constant-key BroadcastHashJoin), so a BNL
    // appearing in ANY plan means a crossJoin / non-equi join crept back in.
    val offenders = plans.flatMap { case (n, p) =>
      val c = count(p, "BroadcastNestedLoopJoin")
      if (c > 0) Some(s"$n=$c") else None
    }
    assert(offenders.isEmpty, s"unexpected BNL joins: ${offenders.toSeq.sorted}")
  }

  test("SortMergeJoin only where both sides are large") {
    val offenders = plans.flatMap { case (n, p) =>
      val c = count(p, "SortMergeJoin")
      if (c > smjAllowed.getOrElse(n, 0)) Some(s"$n=$c") else None
    }
    assert(offenders.isEmpty,
      s"new sort-merge joins (broadcast the small side?): ${offenders.toSeq.sorted}")
  }

  test("parquet filter pushdown present on filtering queries") {
    val missing = mustPushFilters.filter { n =>
      !"PushedFilters: \\[[^\\]]".r.findFirstIn(plans(n)).isDefined
    }
    assert(missing.isEmpty, s"filters not pushed to scan in: $missing")
  }

  test("the ingest capstone reads the lake through a PRUNED partition scan") {
    // q_ingest_curate pivots through the filetype-partitioned element lake:
    // the text/plain filter must land in PartitionFilters (directory pruning
    // before a byte is read), never as a post-scan Filter on p_filetype
    val p = plans("q_ingest_curate")
    assert("PartitionFilters: \\[[^\\]]*p_filetype".r.findFirstIn(p).isDefined,
      "lake scan lost its partition-pruning filter")
    assert(!"Filter [^\\n]*p_filetype".r.findFirstIn(p).isDefined,
      "p_filetype filtered post-scan instead of pruning directories")
  }

  test("shuffle counts do not exceed the pinned caps") {
    val offenders = plans.flatMap { case (n, p) =>
      val c = count(p, "Exchange")
      val cap = exchCapOverrides.getOrElse(n, DefaultExchCap)
      if (c > cap) Some(s"$n=$c(cap $cap)") else None
    }
    assert(offenders.isEmpty, s"shuffle regressions: ${offenders.toSeq.sorted}")
  }
}
