package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.functions.TextAnalysis

class DedupSpec extends SparkSuiteBase {

  private def bandsOf(texts: Seq[(Long, String)]) = {
    import spark.implicits._
    texts.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.minHashSignature(col("text"), k = 8, shingleN = 3).as("sig"))
      .select(col("doc_id"),
        posexplode(TextAnalysis.lshBands(col("sig"), rows = 2))
          .as(Seq("band_idx", "band_key")))
  }

  test("hot-band guard bounds candidate pairs on a degenerate all-identical corpus") {
    val bands = bandsOf((1L to 50L).map(i => (i, "the same boilerplate text every time")))
    // unguarded: every bucket holds all 50 docs -> full quadratic pair set
    val unguarded = Dedup.lshCandidatePairs(bands, maxBandSize = Int.MaxValue).count()
    assert(unguarded == 50L * 49 / 2)
    // guarded: every bucket exceeds the cap and is dropped before the join
    val guarded = Dedup.lshCandidatePairs(bands, maxBandSize = 10).count()
    assert(guarded == 0L)
  }

  test("guard is inert for buckets under the threshold") {
    val texts = (1L to 20L).map(i =>
      (i, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i")) ++
      Seq((100L, "a shared near duplicate sentence body"),
        (101L, "a shared near duplicate sentence body"))
    val bands = bandsOf(texts)
    val guarded = Dedup.lshCandidatePairs(bands, maxBandSize = 10)
    val unguarded = Dedup.lshCandidatePairs(bands, maxBandSize = Int.MaxValue)
    assert(guarded.collect().toSet == unguarded.collect().toSet)
    assert(guarded.collect().map(r => (r.getLong(0), r.getLong(1))).contains((100L, 101L)))
  }
}
