package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** Corpus-construction operators: decontamination, SemDeDup, stratified
  * sampling, sequence packing, PII scrub — hand-computed vectors. */
class CorpusOpsSpec extends SparkSuiteBase {

  test("attachBroadcast anchors its join key past map-typed columns, nested included") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // first columns are unhashable by xxhash64: a top-level map AND an
    // array<map> — the anchor must recurse into the type tree and land on
    // the plain long column
    val big = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "tag")
      .select(
        map(col("tag"), col("id")).as("m"),
        array(map(col("tag"), col("id"))).as("am"),
        struct(map(col("tag"), col("id")).as("inner")).as("sm"),
        col("id"), col("tag"))
    val tiny = Seq(42L).toDF("probe")
    val out = graft.functions.CorpusOps.attachBroadcast(big, tiny)
    assert(out.count() == 3)
    assert(out.select("probe").distinct().as[Long].collect().toSeq == Seq(42L))
    // and the plan is the zero-BNL constant-key BroadcastHashJoin
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // an all-unhashable frame fails loudly, not at analysis time downstream
    val allMaps = Seq((1L, "a")).toDF("id", "tag")
      .select(map(col("tag"), col("id")).as("m"),
        array(map(col("tag"), col("id"))).as("am"))
    val e = intercept[IllegalArgumentException](
      graft.functions.CorpusOps.attachBroadcast(allMaps, tiny))
    assert(e.getMessage.contains("map-free"), e.getMessage)
  }

  test("decontaminate flags docs sharing an n-gram with the benchmark") {
    val sp = spark
    import sp.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally unrelated words in this document"),
      (3L, "prefix then alpha beta gamma delta tail")
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1("ALPHA beta GAMMA delta")).toDF("text")
    val r = CorpusOps.decontaminate(train, bench, col("text"), n = 4)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Boolean]("contaminated"))
    assert(r(1L).getAs[Int]("n_contaminated_grams") == 1)
    assert(!r(2L).getAs[Boolean]("contaminated"))
    assert(r(3L).getAs[Boolean]("contaminated"))
  }

  test("decontaminate counts distinct shared grams once per doc") {
    val sp = spark
    import sp.implicits._
    // the shared bigram occurs twice in the training doc -> counted once
    val train = Seq((1L, "hot word hot word")).toDF("doc_id", "text")
    val bench = Seq(Tuple1("hot word")).toDF("text")
    val r = CorpusOps.decontaminate(train, bench, col("text"), n = 2).collect()(0)
    assert(r.getAs[Int]("n_contaminated_grams") == 1)
  }

  test("decontaminateSpans removes the matched windows, keeps the doc") {
    val sp = spark
    import sp.implicits._
    val train = Seq(
      (1L, "keep this ALPHA beta gamma keep that too"),
      (2L, "nothing matches in here at all")
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1("alpha BETA gamma")).toDF("text")
    val r = CorpusOps.decontaminateSpans(train, bench, col("text"), n = 3)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Int]("n_dropped") == 3)
    assert(r(1L).getAs[String]("text_clean") == "keep this keep that too")
    assert(r(2L).getAs[Int]("n_dropped") == 0)
    assert(r(2L).getAs[String]("text_clean") == "nothing matches in here at all")
  }

  test("decontaminateSpans merges overlapping matched windows") {
    val sp = spark
    import sp.implicits._
    // both "a b c" and "b c d" match: covered positions 0..3, not 6 drops
    val train = Seq((1L, "a b c d tail")).toDF("doc_id", "text")
    val bench = Seq(Tuple1("a b c"), Tuple1("b c d")).toDF("text")
    val r = CorpusOps.decontaminateSpans(train, bench, col("text"), n = 3)
      .collect()(0)
    assert(r.getAs[Int]("n_dropped") == 4)
    assert(r.getAs[String]("text_clean") == "tail")
  }

  test("decontaminateSpans: a doc shorter than n has no window and passes") {
    val sp = spark
    import sp.implicits._
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    val bench = Seq(Tuple1("a b")).toDF("text")
    val r = CorpusOps.decontaminateSpans(train, bench, col("text"), n = 3)
      .collect()(0)
    assert(r.getAs[Int]("n_dropped") == 0 && r.getAs[String]("text_clean") == "a b")
  }

  test("semanticDedup drops the larger id of an exact-duplicate pair") {
    val sp = spark
    import sp.implicits._
    val v = Array(1.0f, 0.0f, 0.0f)
    val w = Array(0.0f, 1.0f, 0.0f)
    val e = Seq(
      (0L, v), (1L, w),                    // the two centroids (k = 2)
      (5L, v.map(_ * 2.0f)),               // cosine 1.0 with vec 0's cluster
      (9L, Array(0.1f, 0.9f, 0.0f))        // near w but below threshold vs 1
    ).toDF("vec_id", "embedding")
    val r = CorpusOps.semanticDedup(e, k = 2, threshold = 0.999)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getAs[Boolean]("keep") && r(5L).getAs[Long]("cluster") == 0L)
    assert(!r(5L).getAs[Boolean]("keep")) // dup of 0, larger id dropped
    assert(r(9L).getAs[Boolean]("keep") && r(9L).getAs[Long]("cluster") == 1L)
  }

  test("semanticDedup bounds work on a degenerate all-identical corpus") {
    val sp = spark
    import sp.implicits._
    // 2,000 identical vectors, one cluster: uncapped this is a C(2000,2) ≈ 2M
    // pair join. With maxClusterSize = 50 the cluster re-splits into
    // ceil(2000/50) = 40 hash sub-buckets, so pairs are only compared within
    // a sub-bucket (~C(50,2) each) and exactly one survivor remains per
    // nonempty sub-bucket (the min id — all pairwise cosines are 1.0).
    val n = 2000L
    val e = sp.range(n).select(col("id").as("vec_id"),
      array(lit(1.0f), lit(0.0f), lit(0.0f)).as("embedding"))
    val r = CorpusOps.semanticDedup(e, k = 1, threshold = 0.99,
      maxClusterSize = 50).cache()
    try {
      assert(r.count() == n)
      assert(r.filter(col("cluster") =!= 0L).count() == 0)
      val kept = r.filter(col("keep")).count()
      val expectedBuckets = e.select(pmod(
        TextAnalysis.polyHash(col("vec_id").cast("string")), lit(40L)).as("s"))
        .distinct().count()
      assert(kept == expectedBuckets,
        s"one survivor per hash sub-bucket expected: kept=$kept buckets=$expectedBuckets")
      assert(kept <= 40, "re-split must cap survivors at ceil(n/maxClusterSize)")
      assert(kept > 1, "re-split did not trigger: whole cluster deduped to one")
    } finally r.unpersist()
  }

  test("semanticDedup: a zero vector gets cosine 0.0, not NaN, and is kept") {
    val sp = spark
    import sp.implicits._
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)), // centroids (k = 2)
      (7L, Array(0.0f, 0.0f))                           // zero-norm vector
    ).toDF("vec_id", "embedding")
    val r = CorpusOps.semanticDedup(e, k = 2, threshold = 0.9)
      .collect().map(x => x.getLong(0) -> x).toMap
    // all-zero cosine is defined 0.0 everywhere: beats the -2.0 seed, so the
    // vector lands in the FIRST centroid's cluster (not the -1 sentinel) and
    // survives (0.0 < threshold against every neighbour)
    assert(r(7L).getAs[Long]("cluster") == 0L)
    assert(r(7L).getAs[Boolean]("keep"))
    assert(r.values.forall(_.getAs[Long]("cluster") >= 0L))
  }

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    val sp = spark
    import sp.implicits._
    val d = (0L until 200L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "lang")
    val once = CorpusOps.stratifiedSample(d, col("lang"),
      Seq("a" -> 0.0, "b" -> 1.0), 0.5, "s").collect()
    val twice = CorpusOps.stratifiedSample(d, col("lang"),
      Seq("a" -> 0.0, "b" -> 1.0), 0.5, "s").collect()
    assert(once.map(_.toString).sorted.sameElements(twice.map(_.toString).sorted))
    val byLang = once.groupBy(_.getAs[String]("stratum"))
    assert(byLang("a").forall(!_.getAs[Boolean]("keep"))) // rate 0 drops all
    assert(byLang("b").forall(_.getAs[Boolean]("keep")))  // rate 1 keeps all
  }

  test("stratifiedSample decisions change with the salt, not the run") {
    val sp = spark
    import sp.implicits._
    val d = (0L until 500L).map(i => (i, "x")).toDF("doc_id", "lang")
    def kept(salt: String) = CorpusOps.stratifiedSample(
      d, col("lang"), Nil, 0.5, salt)
      .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    val k1 = kept("s1")
    // a 0.5 rate keeps roughly half (hash-uniformity sanity, wide band)
    assert(k1.size > 150 && k1.size < 350, s"kept ${k1.size} of 500 at rate 0.5")
    assert(kept("s1") == k1)
    assert(kept("s2") != k1) // overwhelmingly likely; salt changes the draw
  }

  test("packSequences splits the concatenated stream every ctxLen tokens") {
    val sp = spark
    import sp.implicits._
    // one bucket: docs of 100, 100, 100 tokens with ctx 256:
    // starts 0, 100, 200 -> examples 0, 0, 0; the third crosses into ex 1
    val d = Seq((0L, 100L), (8L, 100L), (16L, 100L)).toDF("doc_id", "n")
    val r = CorpusOps.packSequences(d, col("n"), buckets = 8, ctxLen = 256)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getAs[Long]("example_id") == 0 &&
      r(0L).getAs[Long]("offset_in_example") == 0)
    assert(r(8L).getAs[Long]("offset_in_example") == 100)
    assert(r(16L).getAs[Long]("example_id") == 0 &&
      r(16L).getAs[Long]("offset_in_example") == 200 &&
      r(16L).getAs[Boolean]("crosses_boundary"))
    assert(!r(8L).getAs[Boolean]("crosses_boundary"))
  }

  test("packSequences: zero-token docs never cross a boundary") {
    val sp = spark
    import sp.implicits._
    val d = Seq((0L, 256L), (8L, 0L), (16L, 1L)).toDF("doc_id", "n")
    val r = CorpusOps.packSequences(d, col("n"), buckets = 8, ctxLen = 256)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(!r(8L).getAs[Boolean]("crosses_boundary"))
    assert(r(8L).getAs[Long]("example_id") == 1) // starts exactly at the seam
    assert(r(16L).getAs[Long]("example_id") == 1 &&
      r(16L).getAs[Long]("offset_in_example") == 0)
  }

  test("paragraphDedup keeps first occurrences corpus-wide and reassembles") {
    val sp = spark
    import sp.implicits._
    val d = Seq(
      (1L, "Shared boilerplate here.|Unique to one.|Shared boilerplate here."),
      (2L, "Shared boilerplate here.|Unique to two.")
    ).toDF("doc_id", "text")
    val r = CorpusOps.paragraphDedup(d, col("text"), "|")
      .collect().map(x => x.getLong(0) -> x).toMap
    // doc 1 keeps its first copy of the boilerplate, drops its own repeat
    assert(r(1L).getAs[Int]("n_paras") == 3 && r(1L).getAs[Int]("n_kept") == 2)
    assert(r(1L).getAs[String]("text_kept") ==
      "Shared boilerplate here.\nUnique to one.")
    // doc 2's boilerplate was already seen in doc 1 -> dropped
    assert(r(2L).getAs[Int]("n_kept") == 1)
    assert(r(2L).getAs[String]("text_kept") == "Unique to two.")
  }

  test("paragraphDedup keeps docs with no non-empty paragraph (zeros, not dropped)") {
    val sp = spark
    import sp.implicits._
    val d = Seq((1L, "Real paragraph."), (2L, ""), (3L, " | | "))
      .toDF("doc_id", "text")
    val r = CorpusOps.paragraphDedup(d, col("text"), "|")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(1L, 2L, 3L)) // a curation pipeline never loses docs
    assert(r(2L).getAs[Int]("n_paras") == 0 && r(2L).getAs[String]("text_kept") == "")
    assert(r(3L).getAs[Int]("n_kept") == 0)
  }

  test("selfSubstringDedup keeps the smallest (doc_id, start) occurrence only") {
    val sp = spark
    import sp.implicits._
    val d = Seq(
      (1L, "unique head alpha beta gamma unique tail"),
      (2L, "other intro ALPHA beta GAMMA other outro"),
      (3L, "no shared windows live in this document")
    ).toDF("doc_id", "text")
    val r = CorpusOps.selfSubstringDedup(d, col("text"), n = 3)
      .collect().map(x => x.getLong(0) -> x).toMap
    // doc 1 holds the canonical copy — untouched
    assert(r(1L).getAs[Int]("n_dropped") == 0)
    assert(r(1L).getAs[String]("text_clean") == "unique head alpha beta gamma unique tail")
    // doc 2's (case-insensitively) identical window is spliced out
    assert(r(2L).getAs[Int]("n_dropped") == 3)
    assert(r(2L).getAs[String]("text_clean") == "other intro other outro")
    assert(r(3L).getAs[Int]("n_dropped") == 0)
  }

  test("selfSubstringDedup coalesces overlapping duplicated windows into one span") {
    val sp = spark
    import sp.implicits._
    // a 4-word shared passage under n=3 duplicates two overlapping 3-grams;
    // the covered-position distinct removes 4 words, not 6
    val d = Seq(
      (1L, "a b c d first"),
      (2L, "x a b c d y")
    ).toDF("doc_id", "text")
    val r = CorpusOps.selfSubstringDedup(d, col("text"), n = 3)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Int]("n_dropped") == 0)
    assert(r(2L).getAs[Int]("n_dropped") == 4)
    assert(r(2L).getAs[String]("text_clean") == "x y")
  }

  test("selfSubstringDedup removes in-document repetition too") {
    val sp = spark
    import sp.implicits._
    // the same 3-gram twice within one doc: the earlier start is canonical
    val d = Seq((1L, "p q r mid p q r")).toDF("doc_id", "text")
    val r = CorpusOps.selfSubstringDedup(d, col("text"), n = 3).collect()(0)
    assert(r.getAs[Int]("n_dropped") == 3)
    assert(r.getAs[String]("text_clean") == "p q r mid")
  }

  test("selfSubstringDedup passes short docs through and never loses a doc") {
    val sp = spark
    import sp.implicits._
    val d = Seq((1L, "too short"), (2L, ""), (3L, "also just short"))
      .toDF("doc_id", "text")
    val r = CorpusOps.selfSubstringDedup(d, col("text"), n = 5)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(1L, 2L, 3L))
    assert(r.values.forall(_.getAs[Int]("n_dropped") == 0))
    assert(r(1L).getAs[String]("text_clean") == "too short")
  }

  test("paragraphDedup fingerprints case- and whitespace-insensitively") {
    val sp = spark
    import sp.implicits._
    val d = Seq(
      (1L, "The  Same   Para"),
      (2L, "the same para")
    ).toDF("doc_id", "text")
    val r = CorpusOps.paragraphDedup(d, col("text"), "|")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Int]("n_kept") == 1)
    assert(r(2L).getAs[Int]("n_kept") == 0)
    assert(r(2L).getAs[String]("text_kept") == "")
  }

  test("quantizeInt8 round-trips within one scale step; zero vector is safe") {
    val sp = spark
    import sp.implicits._
    val d = Seq(
      (1L, Array(1.27f, -0.635f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r = d.select(col("vec_id"),
        CorpusOps.quantizeInt8(col("embedding")).as("qt"))
      .select(col("vec_id"), col("qt.scale"), col("qt.q"),
        CorpusOps.dequantizeInt8(col("qt")).as("deq"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Double]("scale") == 1.27f.toDouble / 127.0)
    assert(r(1L).getSeq[Int](r(1L).fieldIndex("q")) == Seq(127, -64, 0)) // -63.5 rounds away
    val deq = r(1L).getSeq[Double](r(1L).fieldIndex("deq"))
    assert(math.abs(deq.head - 1.27f.toDouble) < 1e-12) // exact: 127 * scale
    assert(r(2L).getSeq[Int](r(2L).fieldIndex("q")) == Seq(0, 0, 0)) // scale 0, no NaN
    assert(r(2L).getSeq[Double](r(2L).fieldIndex("deq")).forall(_ == 0.0))
  }

  test("connectedComponents resolves a chain needing multiple rounds") {
    val sp = spark
    import sp.implicits._
    // 1-2-3-4-5 chain plus a separate 10-11 pair: min labels 1 and 10
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (10L, 11L))
      .toDF("src", "dst")
    val r = CorpusOps.connectedComponents(edges)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert((1L to 5L).forall(r(_) == 1L))
    assert(r(10L) == 10L && r(11L) == 10L)
  }

  test("connectedComponents converges with ids near Long.MaxValue") {
    val sp = spark
    import sp.implicits._
    // labels near 2^63: the old decimal(20,0)→decimal(30,0) convergence sum
    // overflowed to null past ~10^11 vertices; decimal(28,0)→decimal(38,0)
    // keeps the probe exact, and max-long ids must work at any count
    val m = Long.MaxValue
    val edges = Seq((m - 1, m - 3), (m - 3, m - 5), (m, m - 2))
      .toDF("src", "dst")
    val r = CorpusOps.connectedComponents(edges)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(Seq(m - 1, m - 3, m - 5).forall(r(_) == m - 5))
    assert(r(m) == m - 2 && r(m - 2) == m - 2)
  }

  test("connectedComponents fails loudly when the convergence sum is null") {
    val sp = spark
    import sp.implicits._
    // component ids that cast to decimal as null (non-numeric strings) must
    // throw, never silently read None == None as converged-after-round-1.
    // Under ANSI (the session default) the cast itself throws; the silent
    // null-sum hazard is the NON-ANSI mode production clusters commonly run
    // with — pin that config for the probe's own guard to fire.
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val edges = Seq(("docA", "docB"), ("docB", "docC")).toDF("src", "dst")
      val e = intercept[IllegalStateException] {
        CorpusOps.connectedComponents(edges).collect()
      }
      assert(e.getMessage.contains("convergence sum is null"))
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("sharedParagraphEdges emits a star to the minimum sharer, never pairs") {
    val sp = spark
    import sp.implicits._
    val d = Seq(
      (3L, "common footer|unique a"),
      (7L, "common footer|unique b"),
      (9L, "common footer|unique c"),
      (12L, "loner paragraph")
    ).toDF("doc_id", "text")
    val edges = CorpusOps.sharedParagraphEdges(d, col("text"), "|")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(edges == Set((3L, 7L), (3L, 9L))) // star on doc 3; 12 isolated
    val comps = CorpusOps.connectedComponents(
      CorpusOps.sharedParagraphEdges(d, col("text"), "|"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(comps == Map(3L -> 3L, 7L -> 3L, 9L -> 3L))
  }

  test("piiScrub redacts emails, IPv4s, and phones with counts") {
    val sp = spark
    import sp.implicits._
    val d = Seq(Tuple1(
      "mail bob@x.org and jane.doe@corp.example, ip 10.0.0.7, tel 555-123-4567 end"
    )).toDF("text")
    val r = d.select(CorpusOps.piiScrub(col("text")).as("p"))
      .select("p.scrubbed", "p.n_emails", "p.n_ips", "p.n_phones").collect()(0)
    assert(r.getAs[String]("scrubbed") ==
      "mail [EMAIL] and [EMAIL], ip [IP], tel [PHONE] end")
    assert(r.getAs[Int]("n_emails") == 2)
    assert(r.getAs[Int]("n_ips") == 1)
    assert(r.getAs[Int]("n_phones") == 1)
  }

  test("incrementalDedup equals a plain anti-join and has no false negatives") {
    val sp = spark
    import sp.implicits._
    val history = (0 until 200)
      .map(i => (i.toLong, s"history document number $i body"))
      .toDF("doc_id", "text")
    // delta: 100 new docs + 50 re-crawled copies of history texts
    val incoming = (0 until 100)
      .map(i => (1000L + i, s"fresh delta document $i payload"))
      .toDF("doc_id", "text")
      .unionByName((0 until 50)
        .map(i => (2000L + i, s"history document number ${i * 2} body"))
        .toDF("doc_id", "text"))
    // a deliberately tiny/over-saturated bloom (high fpp) must still be
    // EXACT: false positives only route more rows through the confirm join
    for (expected <- Seq(8L, 1L << 20)) {
      val got = CorpusOps.incrementalDedup(history, incoming, col("text"),
          expectedHistoryDocs = expected, fpp = 0.2)
        .select("doc_id").as[Long].collect().sorted
      assert(got.toSeq == (0 until 100).map(1000L + _),
        s"expectedHistoryDocs=$expected")
    }
    // a NULL text (NULL fingerprint) matches nothing in history: the row is
    // NEW and must be kept, not silently dropped by the null-propagating
    // bloom probe
    val withNull = incoming.unionByName(
      Seq((3000L, Option.empty[String])).toDF("doc_id", "text"))
    val keptIds = CorpusOps.incrementalDedup(history, withNull, col("text"))
      .select("doc_id").as[Long].collect().sorted
    assert(keptIds.contains(3000L), "null-text row was dropped")
  }

  test("incrementalNearDup flags drifted re-crawls, not genuinely new docs") {
    val sp = spark
    import sp.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val history = Seq(
      (10L, base),
      (20L, "completely different content about mineral extraction and " +
        "geological survey methods across twenty distinct field sites"))
      .toDF("doc_id", "text")
    val delta = Seq(
      // drifted re-crawl of 10: one appended token — high Jaccard
      (100L, base + " zulu"),
      // short overlap with 10 only: shares a few shingles, below 0.8
      (200L, "alpha bravo charlie delta but then an entirely new tail " +
        "with unrelated vocabulary covering botanical taxonomy topics"),
      // genuinely new
      (300L, "fresh document with no relation to anything in the prior " +
        "snapshot at all, discussing maritime navigation techniques"))
      .toDF("doc_id", "text")
    val got = CorpusOps.incrementalNearDup(history, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(t => (t._1, t._2)) == Seq((100L, 10L)),
      s"expected only the drifted re-crawl to flag: $got")
    assert(got.head._3 >= 0.8 && got.head._3 < 1.0)
    // exactness of the verify stage: an EXACT re-crawl scores 1.0
    val exact = Seq((400L, base)).toDF("doc_id", "text")
    val g2 = CorpusOps.incrementalNearDup(history, exact).collect()
    assert(g2.length == 1 && g2.head.getDouble(2) == 1.0)
    // best-match rule: a delta doc near-dupping TWO history docs keeps the
    // highest-Jaccard (here the identical one), not both
    val twin = history.unionByName(Seq((30L, base + " zulu")).toDF("doc_id", "text"))
    val g3 = CorpusOps.incrementalNearDup(twin, Seq((500L, base + " zulu"))
      .toDF("doc_id", "text")).collect()
    assert(g3.length == 1 && g3.head.getLong(1) == 30L && g3.head.getDouble(2) == 1.0)
  }

  test("sourceQuota: two-stage grouped top-N equals the naive window top-N") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    // one monster source (200 docs) + two small ones; preferences collide so
    // the doc_id tiebreak is exercised
    val docs = ((1 to 200).map(i => (i.toLong, "big", (i % 7).toLong)) ++
      (301 to 305).map(i => (i.toLong, "s1", 5L)) ++
      (401 to 402).map(i => (i.toLong, "s2", 1L)))
      .toDF("doc_id", "source", "pref")
    for (buckets <- Seq(1, 4, 32)) {
      val got = CorpusOps.sourceQuota(docs, col("source"), col("pref"),
          quota = 10, subBuckets = buckets)
        .select("doc_id", "source", "rk")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      val naive = docs.withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy(col("pref").desc, col("doc_id"))))
        .filter(col("rk") <= 10)
        .select("doc_id", "source", "rk")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(got == naive, s"subBuckets=$buckets")
    }
    // under-quota sources keep everything
    val kept = CorpusOps.sourceQuota(docs, col("source"), col("pref"), quota = 10)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("big" -> 10L, "s1" -> 5L, "s2" -> 2L))
  }

  test("leakageSafeSplit: a duplicate CHAIN lands whole in one split") {
    val sp = spark
    import sp.implicits._
    // 1-2-3 chain via shared paragraphs (1 never shares with 3 directly —
    // only transitive closure keeps the chain together); 10/11 singletons
    val docs = Seq(
      (1L, "alpha paragraph one merge bridge one"),
      (2L, "bridge one merge bridge two"),
      (3L, "bridge two merge omega paragraph"),
      (10L, "standalone content ten"),
      (11L, "standalone content eleven"))
      .toDF("doc_id", "text")
    val got = CorpusOps.leakageSafeSplit(docs,
        CorpusOps.sharedParagraphEdges(docs, col("text"), " merge "))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // the whole chain shares component 1 and therefore ONE split — a
    // doc-id-hash split would scatter it across train/val/test
    assert(Seq(1L, 2L, 3L).map(got(_)._1).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(got(_)._2).distinct.size == 1,
      s"chain split apart: $got")
    // singletons are their own components
    assert(got(10L)._1 == 10L && got(11L)._1 == 11L)
    // deterministic: the same salt reproduces the same assignment
    val again = CorpusOps.leakageSafeSplit(docs,
        CorpusOps.sharedParagraphEdges(docs, col("text"), " merge "))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got.view.mapValues(_._2).toMap == again)
  }

  test("canonicalizeUrl: fragment, case, ports, tracking params, param order") {
    val sp = spark
    import sp.implicits._
    val cases = Seq(
      // scheme+host lowercase; path case preserved
      ("HTTPS://WWW.Example.COM/Path/To", "https://www.example.com/Path/To"),
      // default ports drop; non-default ports stay
      ("https://a.com:443/x", "https://a.com/x"),
      ("http://a.com:80/x", "http://a.com/x"),
      ("https://a.com:8443/x", "https://a.com:8443/x"),
      // fragment strips; empty path roots at /
      ("https://a.com#top", "https://a.com/"),
      ("https://a.com/p#sec?notaquery=1", "https://a.com/p"),
      // tracking params drop, survivors sort; all-tracking query vanishes
      ("https://a.com/p?z=9&utm_source=x&a=1&fbclid=F&gclid=G&ref=r",
        "https://a.com/p?a=1&z=9"),
      ("https://a.com/p?utm_campaign=c", "https://a.com/p"),
      // a second '?' is part of the query, not a re-split point
      ("https://a.com/p?b=2?c=3&a=1", "https://a.com/p?a=1&b=2?c=3"))
    val got = cases.map(_._1).toDF("u")
      .select(CorpusOps.canonicalizeUrl(col("u"))).as[String].collect().toSeq
    assert(got == cases.map(_._2), got.zip(cases).filter {
      case (g, (_, e)) => g != e
    }.toString)
  }

  test("lmQualityScore: add-one bigram math, exact micro-nat sums, bucketing") {
    val sp = spark
    import sp.implicits._
    // ref: "a b a b c" -> bigrams (a,b)x2 (b,a)x1 (b,c)x1; c1: a=2 b=2; V=3
    val ref = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val docs = Seq(
      (10L, "a b c"), // (a,b): ln(3/5); (b,c): ln(2/5)
      (20L, "z z"),   // unseen everything: ln(1/3)
      (30L, "q"))     // no bigrams -> unscored
      .toDF("doc_id", "text")
    val got = CorpusOps.lmQualityScore(docs, ref, col("text"),
        headMinAvgLp = -6.0e5, midMinAvgLp = -8.0e5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // hand-computed micro-nats: ln(0.6)=-0.5108256 -> -510826;
    // ln(0.4)=-0.9162907 -> -916291; ln(1/3)=-1.0986123 -> -1098612
    assert(got(0) == ((10L, 2L, -510826L - 916291L, "middle")),
      s"got ${got(0)}") // avg -713558.5: below head(-6e5), above mid(-8e5)
    assert(got(1) == ((20L, 1L, -1098612L, "tail")))
    assert(got(2) == ((30L, 0L, 0L, "unscored")))
  }

  test("temperatureSample up-samples low-resource strata at alpha = 0.5") {
    val sp = spark
    import sp.implicits._
    // 900 'en' docs vs 100 'xh': p = (0.9, 0.1), q ∝ sqrt(p) = (0.75, 0.25),
    // so at targetFrac 0.5 the rates are (0.75*500/900, min(1, 0.25*500/100))
    // = (~0.4167, 1.0) — the low-resource stratum is kept WHOLE
    val d = ((0 until 900).map(i => (i.toLong, "en")) ++
      (1000 until 1100).map(i => (i.toLong, "xh"))).toDF("doc_id", "lang")
    val r = CorpusOps.temperatureSample(d, col("lang"), alpha = 0.5,
      targetFrac = 0.5, salt = "t")
    val rates = r.select("stratum", "rate").distinct().collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(rates("en") - 0.416667) < 1e-5, rates.toString)
    assert(rates("xh") == 1.0)
    // every low-resource doc kept; the big stratum lands near its rate
    val kept = r.filter(col("keep")).groupBy("stratum").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(kept("xh") == 100L)
    assert(math.abs(kept("en") - 900 * 0.416667) < 60, kept.toString)
    // deterministic: a second invocation decides identically
    assert(r.collect().sortBy(_.getLong(0)).toSeq ==
      CorpusOps.temperatureSample(d, col("lang"), 0.5, 0.5, "t")
        .collect().sortBy(_.getLong(0)).toSeq)
  }

  test("nbQualityClassifier separates pos-like from neg-like docs") {
    val sp = spark
    import sp.implicits._
    val pos = Seq(Tuple1("curated encyclopedia prose with citations and structure"),
      Tuple1("curated reference prose citations structure encyclopedia")).toDF("text")
    val neg = Seq(Tuple1("click here buy now spam casino jackpot winner"),
      Tuple1("spam casino click jackpot buy winner now here")).toDF("text")
    val d = Seq(
      (1L, "encyclopedia prose with citations"),
      (2L, "buy now casino jackpot spam"),
      (3L, "")).toDF("doc_id", "text")
    val r = CorpusOps.nbQualityClassifier(d, pos, neg, col("text"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[String]("quality") == "hi")
    assert(r(1L).getAs[Long]("llr_micro_sum") > 0)
    assert(r(2L).getAs[String]("quality") == "lo")
    assert(r(2L).getAs[Long]("llr_micro_sum") < 0)
    assert(r(3L).getAs[String]("quality") == "unscored")
    assert(r(3L).getAs[Long]("n_tokens") == 0L)
  }

  test("nbQualityClassifier words unseen in either slice score the constant llr") {
    val sp = spark
    import sp.implicits._
    val pos = Seq(Tuple1("alpha")).toDF("text")
    val neg = Seq(Tuple1("beta")).toDF("text")
    // totP = totN = 1 -> llr0 = ln(1/1025) - ln(1/1025) = 0 for unseen buckets
    val d = Seq((1L, "zeta theta kappa")).toDF("doc_id", "text")
    val r = CorpusOps.nbQualityClassifier(d, pos, neg, col("text")).collect()(0)
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Long]("llr_micro_sum") == 0L)
    assert(r.getAs[String]("quality") == "hi") // >= 0 ties to hi
  }

  test("dsirSelect prefers target-like docs and is deterministic") {
    val sp = spark
    import sp.implicits._
    val target = Seq(Tuple1("solar physics magnetic reconnection plasma dynamics"),
      Tuple1("plasma dynamics solar magnetic physics reconnection")).toDF("text")
    val raw = (1L to 20L).map { i =>
      if (i <= 5) (i, "solar plasma physics magnetic dynamics notes")
      else (i, s"misc chatter number $i about shopping lists and errands")
    }.toDF("doc_id", "text")
    val sel = CorpusOps.dsirSelect(raw, target, col("text"), k = 5)
    val rows = sel.collect()
    assert(rows.length == 5)
    // the Gumbel noise can let one off-target doc in, but the target-like
    // docs dominate a k=5 draw from 5 on-target / 15 off-target
    val onTarget = rows.map(_.getLong(0)).count(_ <= 5L)
    assert(onTarget >= 4, rows.map(_.getLong(0)).mkString(","))
    assert(sel.collect().map(_.getLong(0)).toSeq ==
      rows.map(_.getLong(0)).toSeq) // deterministic re-run
  }

  test("dsirSelect caps the selection at k even when all docs qualify") {
    val sp = spark
    import sp.implicits._
    val t = Seq(Tuple1("same words everywhere")).toDF("text")
    val raw = (1L to 8L).map(i => (i, "same words everywhere")).toDF("doc_id", "text")
    assert(CorpusOps.dsirSelect(raw, t, col("text"), k = 3).count() == 3L)
  }

  test("tokenBudgetHead's bucketed prefix sum equals a global window cumsum") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = (1L to 200L).map(i => (i, ("w " * (i % 13 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val r = CorpusOps.tokenBudgetHead(d,
      TextAnalysis.tokenCountWhitespace(col("text")), budget = 300L, salt = "s1")
    val viaGlobal = r.select(col("doc_id"), col("n_tokens"), col("sort_key"))
      .withColumn("cum_start",
        coalesce(sum("n_tokens").over(Window.orderBy("sort_key", "doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("keep", col("cum_start") < 300L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(r.orderBy("doc_id").collect().map(_.toSeq).toSeq == viaGlobal)
    // the kept set fills the budget: max kept cum_start < budget <= kept sum
    val kept = r.filter(col("keep"))
      .agg(sum("n_tokens"), max("cum_start")).collect()(0)
    assert(kept.getLong(1) < 300L && kept.getLong(0) >= 300L)
  }

  test("tokenBudgetHead is salt-deterministic and budget-monotone") {
    val sp = spark
    import sp.implicits._
    val d = (1L to 50L).map(i => (i, "a b c")).toDF("doc_id", "text")
    def keepSet(budget: Long) = CorpusOps.tokenBudgetHead(d,
        TextAnalysis.tokenCountWhitespace(col("text")), budget, salt = "s2")
      .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    val k60 = keepSet(60L)
    val k90 = keepSet(90L)
    assert(k60.size == 20 && k90.size == 30) // 3 tokens/doc; boundary doc kept
    assert(k60.subsetOf(k90)) // growing the budget only adds docs
    assert(keepSet(60L) == k60) // deterministic re-run
  }

  test("bm25TopK ranks full matches over partial, skips non-matching docs") {
    val sp = spark
    import sp.implicits._
    val d = Seq(
      (1L, "spark table scan"), // all three terms, shortest doc
      (2L, "spark spark spark filler filler filler filler filler"),
      (3L, "one mention of table buried in a much longer document body here"),
      (4L, "nothing relevant at all in this one")).toDF("doc_id", "text")
    val r = CorpusOps.bm25TopK(d, col("text"), Seq("spark", "table", "scan"),
      k = 10).collect().map(x => (x.getLong(0), x.getInt(1))).toSeq
    assert(r.map(_._1).head == 1L) // 3 distinct terms, minimal length
    assert(r.map(_._1).toSet == Set(1L, 2L, 3L)) // doc 4 never scores
    assert(r.toMap == Map(1L -> 3, 2L -> 1, 3L -> 1))
    // tf saturation: three repeats of one term can't outrank three distinct terms
    assert(r.map(_._1).indexOf(2L) > r.map(_._1).indexOf(1L))
  }

  test("bm25TopK caps at k by score with doc_id tie-break") {
    val sp = spark
    import sp.implicits._
    val d = (1L to 9L).map(i => (i, "common term doc")).toDF("doc_id", "text")
    val r = CorpusOps.bm25TopK(d, col("text"), Seq("common"), k = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(r == Seq(1L, 2L, 3L, 4L)) // identical scores -> doc_id order
  }

  test("tfIdfTopTerms ranks by exact integer score with term tie-break") {
    val sp = spark
    import sp.implicits._
    val d = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "apple cherry cherry")).toDF("doc_id", "text")
    val r = CorpusOps.tfIdfTopTerms(d, col("text"), k = 3)
      .orderBy("doc_id", "rank").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getString(2), x.getLong(3)))
    // N=3, every term df=2 -> idf_micro = round(ln(4/3)*1e6) + 1e6 = 1287682
    val idf = math.round(math.log(4.0 / 3.0) * 1e6) + 1000000L
    assert(r.toSeq == Seq(
      (1L, 1, "apple", 2 * idf), (1L, 2, "banana", idf),
      (2L, 1, "banana", idf), (2L, 2, "cherry", idf), // tie -> term asc
      (3L, 1, "cherry", 2 * idf), (3L, 2, "apple", idf)))
  }

  test("piiScrub does not count the IPv4 inside an email host") {
    val sp = spark
    import sp.implicits._
    val r = Seq(Tuple1("user@10.0.0.7.example stays one email"))
      .toDF("text")
      .select(CorpusOps.piiScrub(col("text")).as("p"))
      .select("p.n_emails", "p.n_ips").collect()(0)
    assert(r.getAs[Int]("n_emails") == 1)
    assert(r.getAs[Int]("n_ips") == 0) // scrubbed with the email, not re-counted
  }

  test("corpusProfile: one-pass per-source volumes and exact-dup mass") {
    val sp = spark
    import sp.implicits._
    val d = Seq(
      // source a: 3 docs, one exact-dup pair -> 2 dup docs, 2 distinct
      (1L, "a", "hello world"),        // 11 chars, 2 tokens
      (2L, "a", "hello world"),        // exact copy
      (3L, "a", "three ws tokens x"),  // 17 chars, 4 tokens
      // source b: 1 doc, no dups
      (4L, "b", "solo")                // 4 chars, 1 token
    ).toDF("doc_id", "source", "text")
    val rows = CorpusOps.corpusProfile(d, col("text"), col("source"))
      .orderBy("source").collect()
    assert(rows.length == 2)
    val a = rows(0)
    assert(a.getString(0) == "a" && a.getLong(1) == 3 && a.getLong(2) == 2 &&
      a.getLong(3) == 2 && a.getLong(4) == 11 + 11 + 17 &&
      a.getLong(5) == 2 + 2 + 4 && a.getDouble(6) == 13.0)
    val b = rows(1)
    assert(b.getString(0) == "b" && b.getLong(1) == 1 && b.getLong(2) == 1 &&
      b.getLong(3) == 0 && b.getLong(4) == 4 && b.getLong(5) == 1 &&
      b.getDouble(6) == 4.0)
  }

  test("corpusProfile: null-text docs count toward volume but add no chars/tokens") {
    val sp = spark
    import sp.implicits._
    val d = Seq[(Long, String, String)](
      (1L, "a", null), (2L, "a", null), (3L, "a", "x y"))
      .toDF("doc_id", "source", "text")
    val r = CorpusOps.corpusProfile(d, col("text"), col("source")).collect()(0)
    // 3 docs; the two nulls fingerprint together (the oracle's GROUP BY text
    // groups NULLs too) -> 2 distinct, 2 dup docs; sums skip NULLs exactly
    // like the oracle's SQL aggregates
    assert(r.getLong(1) == 3 && r.getLong(2) == 2 && r.getLong(3) == 2)
    assert(r.getLong(4) == 3 && r.getLong(5) == 2)
  }
}
