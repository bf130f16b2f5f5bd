package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** `identify_overlapping_case` + `calculate_largest_ngram_percentage`
  * (`utils.py:213-448`). */
class OverlapCasesSpec extends SparkSuiteBase {

  private def ngram(a: String, b: String): (Double, Option[Int]) = {
    import spark.implicits._
    val (pct, n) = LayoutOps.largestNgramPct(lit(a), lit(b))
    val row = Seq(1).toDF("i").select(pct.as("p"), n.as("n")).collect().head
    (row.getDouble(0), if (row.isNullAt(1)) None else Some(row.getInt(1)))
  }

  test("largest ngram walks down from shorter-length minus one") {
    // shared 2-gram "two three"; 3-grams don't intersect
    assert(ngram("one two three four", "two three five six seven") == ((33.33, Some(2))))
  }

  test("denominator counts the shorter text's ngram list with duplicates") {
    // "a b a" occurs in both → n=3 wins before any 2-gram is considered
    assert(ngram("a b a b", "x a b a y z") == ((50.0, Some(3))))
    // shorter "a b a b": 2-grams [ab, ba, ab] — 3 with dupes; shared = {ba}
    assert(ngram("a b a b", "z b a z2") == ((33.33, Some(2))))
  }

  test("no shared vocabulary yields zero and no n") {
    assert(ngram("q1 q2 q3", "r1 r2 r3") == ((0.0, None)))
    // single-word texts can never share an ngram (n would be 0)
    assert(ngram("hello", "hello") == ((0.0, None)))
  }

  test("classification covers all five partial-overlap cases") {
    import spark.implicits._
    def row(seq: Long, page: Int, tpe: String, x1: Double, text: String) =
      (1L, seq, page, tpe, x1, 0.0, x1 + 100.0, 100.0, text)
    val boxes = Seq(
      row(1, 1, "Title", 0, ""), row(2, 1, "NarrativeText", 50, "some text"),
      row(3, 2, "A", 0, "alpha beta"), row(4, 2, "B", 50, "x alpha beta y"),
      row(5, 3, "C", 0, "aa"), row(6, 3, "D", 95, "bb"),
      row(7, 4, "E", 0, "q1 q2"), row(8, 4, "F", 50, "r1 r2"),
      row(9, 5, "G", 0, "one two three four"),
      row(10, 5, "H", 50, "two three five six seven"),
      // nested pair keeps its geometric label
      row(11, 6, "I", 0, "abc"), (1L, 12L, 6, "J", 10.0, 10.0, 90.0, 90.0, "xyz"))
      .toDF("doc_id", "seq", "page_number", "element_type", "x1", "y1", "x2",
        "y2", "text")
    val cases = LayoutOps.overlappingPairsWithText(boxes)
      .orderBy("page_number").select("overlap_case").as[String].collect().toSeq
    assert(cases == Seq(
      "partial overlap with empty content in Title",
      "partial overlap with duplicate text",
      "Small partial overlap",
      "partial overlap without sharing text",
      "partial overlap sharing 33.33% of the text fromG(2-gram)",
      "nested Bb_in_Aa"))
  }
}
