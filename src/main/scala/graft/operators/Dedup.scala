package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Scale-safe LSH near-duplicate candidate generation.
 *
 * A banded-MinHash self-join explodes quadratically inside any single band
 * bucket: a degenerate band key shared by m documents (empty docs, boilerplate,
 * templated pages) contributes m·(m-1)/2 candidate pairs in one task. At 100 TB
 * a single hot key is a job-killer, so candidate generation drops buckets whose
 * cardinality exceeds `maxBandSize` before the join. Members of a dropped
 * bucket are near-identical boilerplate by construction — they are the exact-
 * duplicate family the fingerprint `groupBy` path already catches — and any
 * genuine near-dup pair inside one still has `bands - 1` other chances to
 * collide in a non-degenerate bucket.
 *
 * The guard costs one extra partial-aggregated count over the bands relation,
 * shuffled on the same (band_idx, band_key) the join uses.
 */
object Dedup {

  /**
   * Distinct candidate pairs (doc_a < doc_b) from an exploded bands relation
   * with columns (doc_id, band_idx, band_key), skipping buckets larger than
   * `maxBandSize`.
   */
  def lshCandidatePairs(bands: DataFrame, maxBandSize: Int = 1000): DataFrame = {
    // unordered window count: one hash exchange on the join key (reused by the
    // self-join below), no sort, no separate aggregate + semi-join
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band_idx", "band_key")
    val bounded = bands.withColumn("band_n", count(lit(1)).over(w))
      .filter(col("band_n") <= maxBandSize)
      .drop("band_n")
    val a = bounded.alias("a")
    val b = bounded.alias("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }
}
