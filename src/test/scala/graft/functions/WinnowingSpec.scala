package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/**
 * Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD 2003) against an
 * independent in-test re-derivation, plus the paper's two guarantees: any
 * shared substring of length >= w + k - 1 shares a fingerprint, and
 * formatting/case/punctuation changes never alter the set.
 */
class WinnowingSpec extends SparkSuiteBase {

  private val K = 8
  private val W = 4

  /** Independent reference: plain Scala loops, no Spark expressions. */
  private def refWinnow(text: String, k: Int = K, w: Int = W): Seq[Long] = {
    val s = text.toLowerCase.filter(c => (c >= 'a' && c <= 'z') || c.isDigit)
    val hashes = (0 to s.length - k).map { i =>
      s.substring(i, i + k).foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    }
    val mins =
      if (hashes.isEmpty) Seq.empty[Long]
      else if (hashes.length < w) Seq(hashes.min)
      else (0 to hashes.length - w).map(p => (p until p + w).map(hashes).min)
    mins.distinct.sorted
  }

  private def engineWinnow(texts: String*): Seq[Seq[Long]] = {
    val sp = spark
    import sp.implicits._
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      .select(col("id"), TextAnalysis.winnowFingerprints(col("text")).as("fps"))
      .orderBy("id").collect()
      .map(_.getSeq[Long](1).toSeq).toSeq
  }

  test("matches the independent re-derivation, incl. normalization") {
    val texts = Seq(
      "The quick brown fox jumps over the lazy dog",
      "THE QUICK-BROWN fox... jumps, over (the) lazy DOG!",
      "select key from table where value > 41 order by key",
      "aaaaaaaaaaaaaaaaaaaa", // degenerate: every gram identical -> one fingerprint
      "short")
    val got = engineWinnow(texts: _*)
    texts.zip(got).foreach { case (t, fps) =>
      assert(fps == refWinnow(t), s"mismatch on: $t")
    }
  }

  test("formatting, case and punctuation changes preserve the set exactly") {
    val Seq(a, b) = engineWinnow(
      "data deduplication at scale needs sketches",
      "Data, De-Duplication AT scale\n\tneeds   SKETCHES!!!")
    assert(a.nonEmpty && a == b)
  }

  test("a shared substring of length >= w + k - 1 shares a fingerprint") {
    // 11+ shared normalized chars guarantee one shared selected hash (Thm 1)
    val common = "zqxjvkwpbfy" // 11 chars, unlikely elsewhere
    val Seq(a, b) = engineWinnow(
      s"left context then $common and more text after it here",
      s"completely different opening $common different ending too")
    assert(a.intersect(b).nonEmpty)
  }

  test("fewer than k alnum chars -> empty; fewer than w grams -> one window") {
    val Seq(empty, ws, tiny, oneWin) = engineWinnow("", "  \t ... !!", "abc1234", "abcde12345")
    assert(empty.isEmpty && ws.isEmpty && tiny.isEmpty)
    // 10 chars -> 3 grams < w=4 -> single window over all grams -> one min
    assert(oneWin == refWinnow("abcde12345") && oneWin.size == 1)
  }

  test("near-duplicate docs share most fingerprints, disjoint docs do not") {
    val base = "streaming aggregation with watermark semantics handles late data " +
      "by bounding state and emitting finalized windows downstream"
    val near = base + " appended"
    val other = "orthogonal vocabulary entirely unrelated content zone quite " +
      "separate phrasing nothing matches previous sentences whatsoever"
    val Seq(a, b, c) = engineWinnow(base, near, other)
    val shared = a.intersect(b).size
    assert(shared * 5 >= a.size.min(b.size) * 4, s"near-dup shared only $shared")
    assert(a.intersect(c).isEmpty)
  }
}
