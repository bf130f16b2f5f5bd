package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/**
 * Selection-QUALITY floors for the two in-plane data-selection classifiers:
 * the oracle rows (q_nb_select_precision / q_dsir_select_precision) pin the
 * arithmetic cross-engine; these specs pin that the classifiers actually
 * SELECT WELL — a planted target domain must be recovered from held-out data
 * — so a regression that keeps the math consistent but destroys selection
 * power (e.g. a feature-hash collapse) fails the build.
 */
class SelectionPrecisionSpec extends SparkSuiteBase {

  private val rng = new scala.util.Random(20260816L)
  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
    "november", "oscar", "papa", "quebec", "romeo", "sierra", "tango",
    "uniform", "victor", "whiskey", "xray", "yankee", "zulu", "river",
    "stone", "cloud", "meadow", "harbor", "lantern", "orchard", "timber")
  private val plant = " zyqvor flembra quindax drazzet vorplim" * 8

  private def corpus(n: Int) = {
    val sp = spark
    import sp.implicits._
    Vector.tabulate(n) { i =>
      val body = Seq.fill(40 + rng.nextInt(40))(vocab(rng.nextInt(vocab.size)))
        .mkString(" ")
      (i.toLong, if (i % 13 == 3) body + plant else body)
    }.toDF("doc_id", "text")
  }

  test("NB classifier recovers >= 90% of held-out planted docs in its top-k") {
    val d = corpus(260)
    val isPlanted = col("doc_id") % 13 === 3
    val isPosSeed = isPlanted && col("doc_id") % 2 === 1
    val isNegSeed = !isPlanted && col("doc_id") % 11 === 7
    val held = d.filter(!isPosSeed && !isNegSeed)
    val k = held.filter(isPlanted).count().toInt
    assert(k >= 8, s"fixture too small: $k held-out planted docs")
    val hits = CorpusOps.nbQualityClassifier(held,
        d.filter(isPosSeed), d.filter(isNegSeed), col("text"))
      .orderBy(col("llr_micro_sum").desc, col("doc_id"))
      .limit(k)
      .filter(isPlanted).count()
    assert(hits * 10 >= k * 9, s"NB selection precision $hits/$k below 90%")
  }

  test("DSIR recovers >= 90% of planted docs in its Gumbel top-k") {
    val d = corpus(260)
    val isPlanted = col("doc_id") % 13 === 3
    val k = d.filter(isPlanted).count().toInt
    assert(k >= 16)
    val hits = CorpusOps.dsirSelect(d,
        d.filter(isPlanted && col("doc_id") % 2 === 1), col("text"), k = k)
      .filter(isPlanted).count()
    assert(hits * 10 >= k * 9, s"DSIR selection precision $hits/$k below 90%")
  }
}
