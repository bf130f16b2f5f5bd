package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/**
 * Property fuzz for the corpus-construction operators: every invariant is
 * recomputed independently in plain Scala over seeded random corpora and
 * compared against the distributed result — shape bugs (a wrong window
 * frame, a dropped tie-break, a non-root component label) surface here
 * before any oracle run.
 */
class CorpusOpsPropertySpec extends SparkSuiteBase {

  private val rng = new Random(20260815L)

  private val Words =
    Vector("alpha", "beta", "gamma", "delta", "omega", "lorem", "amet",
      "table", "river", "stone", "cloud", "ember")

  private def randDoc(maxWords: Int = 40): String =
    Seq.fill(rng.nextInt(maxWords + 1))(Words(rng.nextInt(Words.size)))
      .mkString(" ")

  test("packSequences: every row recomputes from the per-bucket prefix sums") {
    val sp = spark
    import sp.implicits._
    val ctx = 64
    val buckets = 5
    val corpus = Vector.tabulate(120)(i => (i.toLong, rng.nextInt(100).toLong))
    val rows = CorpusOps.packSequences(
      corpus.toDF("doc_id", "n"), col("n"), buckets, ctx)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    corpus.groupBy(_._1 % buckets).foreach { case (bucket, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (id, n) =>
        val (b, nt, ex, off, crosses) = rows(id)
        assert(b == bucket && nt == n)
        assert(ex == cum / ctx, s"doc $id example")
        assert(off == cum % ctx, s"doc $id offset")
        assert(crosses == (n > 0 && (cum + n - 1) / ctx > cum / ctx), s"doc $id crosses")
        cum += n
      }
    }
  }

  test("paragraphDedup: kept total equals distinct fingerprints; kept text is a subsequence") {
    val sp = spark
    import sp.implicits._
    // small paragraph alphabet so cross-doc duplicates are common
    val paras = Vector("Alpha beta.", "Gamma delta.", "OMEGA zeta.", "Ember stone.")
    val corpus = Vector.tabulate(60) { i =>
      (i.toLong, Seq.fill(1 + rng.nextInt(5))(paras(rng.nextInt(paras.size)))
        .mkString("|"))
    }
    val out = CorpusOps.paragraphDedup(corpus.toDF("doc_id", "text"), col("text"), "|")
      .collect().map(r => r.getLong(0) -> r).toMap
    val distinctFps = corpus.flatMap(_._2.split('|')).map(_.trim.toLowerCase)
      .filter(_.nonEmpty).distinct.size
    assert(out.values.map(_.getAs[Int]("n_kept")).sum == distinctFps)
    corpus.foreach { case (id, text) =>
      val original = text.split('|').map(_.trim).filter(_.nonEmpty).toVector
      val kept = out(id).getAs[String]("text_kept") match {
        case "" => Vector.empty
        case t => t.split('\n').toVector
      }
      assert(out(id).getAs[Int]("n_paras") == original.size)
      // kept is an in-order subsequence of the original paragraph list
      var j = 0
      kept.foreach { k =>
        val at = original.indexOf(k, j)
        assert(at >= j, s"doc $id: '$k' out of order")
        j = at + 1
      }
    }
  }

  test("connectedComponents: labels are roots, minimal, and edge-consistent") {
    val sp = spark
    import sp.implicits._
    val n = 80
    val edges = Vector.fill(60)(
      (rng.nextInt(n).toLong, rng.nextInt(n).toLong)).filter(e => e._1 != e._2)
    val comp = CorpusOps.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    comp.foreach { case (v, c) =>
      assert(c <= v, s"label above id for $v")
      assert(comp(c) == c, s"label $c of $v is not a root")
    }
    edges.foreach { case (a, b) =>
      assert(comp(a) == comp(b), s"edge ($a,$b) crosses components")
    }
  }

  test("decontaminateSpans: counts are coherent and clean text is the kept words") {
    val sp = spark
    import sp.implicits._
    val corpus = Vector.tabulate(80)(i => (i.toLong, randDoc()))
    val bench = Vector.fill(6)(Seq.fill(3)(Words(rng.nextInt(Words.size)))
      .mkString(" "))
    val out = CorpusOps.decontaminateSpans(
      corpus.toDF("doc_id", "text"),
      bench.map(Tuple1(_)).toDF("text"), col("text"), n = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    corpus.foreach { case (id, text) =>
      val words = text.split("\\s+").filter(_.nonEmpty)
      val r = out(id)
      assert(r.getAs[Int]("n_words") == words.length)
      val cleanWords = r.getAs[String]("text_clean") match {
        case "" => Array.empty[String]
        case t => t.split(' ')
      }
      assert(cleanWords.length == words.length - r.getAs[Int]("n_dropped"))
      // independently recompute the covered set
      val benchSet = bench.map(_.toLowerCase).toSet
      val covered = words.indices.filter { i =>
        i + 3 <= words.length &&
          benchSet.contains(words.slice(i, i + 3).mkString(" ").toLowerCase)
      }.flatMap(i => i until i + 3).toSet
      val expected = words.indices.filterNot(covered).map(words)
      assert(cleanWords.toSeq == expected, s"doc $id")
    }
  }

  test("stratifiedSample: keep recomputes from the bucket, buckets in range") {
    val sp = spark
    import sp.implicits._
    val corpus = Vector.tabulate(200)(i =>
      (i.toLong, Seq("a", "b", "c")(rng.nextInt(3))))
    val rates = Seq("a" -> 0.25, "b" -> 0.75)
    val out = CorpusOps.stratifiedSample(
      corpus.toDF("doc_id", "lang"), col("lang"), rates, 0.5, "prop")
      .collect()
    out.foreach { r =>
      val bucket = r.getAs[Long]("sample_bucket")
      assert(bucket >= 0 && bucket < 10000)
      val rate = rates.toMap.getOrElse(r.getAs[String]("stratum"), 0.5)
      assert(r.getAs[Boolean]("keep") == (bucket.toDouble < rate * 10000.0))
    }
  }

  test("winnowing guarantee: shared runs >= w+k-1 always share a fingerprint") {
    val sp = spark
    import sp.implicits._
    // 60 random doc pairs, each sharing a random >= 11-char alnum run planted
    // at random positions inside otherwise independent random text
    val abc = "abcdefghijklmnopqrstuvwxyz0123456789"
    def randStr(n: Int) = Seq.fill(n)(abc(rng.nextInt(abc.size))).mkString
    val pairs = Vector.tabulate(60) { i =>
      val common = randStr(11 + rng.nextInt(20))
      val a = randStr(rng.nextInt(80)) + common + randStr(rng.nextInt(80))
      val b = randStr(rng.nextInt(80)) + common + randStr(rng.nextInt(80))
      (i.toLong, a, b)
    }
    val fps = pairs.flatMap { case (i, a, b) => Seq((i * 2, a), (i * 2 + 1, b)) }
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.winnowFingerprints(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    pairs.foreach { case (i, _, _) =>
      assert(fps(i * 2).intersect(fps(i * 2 + 1)).nonEmpty, s"pair $i")
    }
  }

  test("winnowNearDup hot-posting cap: planted-copy recall is cap-invariant, " +
      "boilerplate-only pairs are what the cap removes") {
    val sp = spark
    import sp.implicits._
    val abc = "abcdefghijklmnopqrstuvwxyz0123456789"
    def randStr(n: Int) = Seq.fill(n)(abc(rng.nextInt(abc.size))).mkString
    // 30 docs dominated by one shared boilerplate block (short unique tails,
    // so each pair shares > 80% of fingerprints THROUGH the boilerplate), plus
    // a planted near-identical pair of fully unique text
    val boiler = randStr(400)
    val herd = Vector.tabulate(30)(i => (i.toLong, boiler + randStr(8)))
    val unique = randStr(300)
    val planted = Vector((100L, unique), (101L, unique + randStr(8)))
    val corpus = (herd ++ planted).toDF("doc_id", "text")
    def pairs(cap: Int): Set[(Long, Long)] =
      CorpusOps.winnowNearDup(corpus, col("text"), maxPosting = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // capped: the 30-doc boilerplate postings are dropped (30 > 5), so the
    // herd yields NO pairs; the planted pair's fingerprints sit in 2-doc
    // postings and survive untouched
    val capped = pairs(5)
    assert(capped.contains((100L, 101L)), s"planted pair lost under the cap: $capped")
    assert(!capped.exists { case (a, b) => a < 100L && b < 100L },
      s"boilerplate-only pair survived the cap: $capped")
    // uncapped: the same corpus explodes into the full boilerplate clique —
    // the O(n^2) evidence the cap exists to remove — while the planted pair
    // is present either way (recall on true near-dups is cap-invariant)
    val uncapped = pairs(1000)
    assert(uncapped.contains((100L, 101L)))
    assert(uncapped.count { case (a, b) => a < 100L && b < 100L } == 30 * 29 / 2,
      s"expected the full herd clique without the cap, got ${uncapped.size} pairs")
  }

  test("winnowing never fingerprints below k: sub-k overlap shares nothing forced") {
    val sp = spark
    import sp.implicits._
    // two docs over DISJOINT alphabets share zero grams, hence zero fingerprints
    val a = Seq.fill(150)("abcdabcdabcd"(rng.nextInt(12))).mkString
    val b = Seq.fill(150)("wxyzwxyzwxyz"(rng.nextInt(12))).mkString
    val r = Seq((0L, a), (1L, b)).toDF("id", "text")
      .select(col("id"), TextAnalysis.winnowFingerprints(col("text")).as("f"))
      .collect().map(x => x.getLong(0) -> x.getSeq[Long](1).toSet).toMap
    assert(r(0L).nonEmpty && r(1L).nonEmpty)
    assert(r(0L).intersect(r(1L)).isEmpty)
  }
}
