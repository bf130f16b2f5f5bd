package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSuiteBase

/**
 * Differential harness for bbox overlap/nesting diagnostics:
 * `dev/gen_overlap_diff_vectors.py` ran the reference
 * `identify_overlapping_or_nesting_case` (`utils.py:461-644`) over 300 seeded
 * (box pair, types, texts) cases — nested within/over the 5px tolerance,
 * shifted copies straddling the 10% small-overlap threshold, empty/duplicate/
 * n-gram-sharing texts — and pinned case strings and percentages. This spec
 * replays all pairs through ONE [[LayoutOps.overlappingPairsWithText]] call
 * (each pair under its own doc_id) and compares.
 *
 * String normalization: the reference formats nested cases with types sliced
 * from the `"{ix}. {category}"` label but the partial cases with the RAW label
 * (`identify_overlapping_case` receives the unsliced pair) — the expected
 * strings substitute the label prefixes away; our engine-side strings carry
 * plain types and direction tags which map 1:1 onto the reference's.
 */
class OverlapDifferentialSpec extends SparkSuiteBase {

  private val schema = StructType(Seq(
    StructField("case", LongType),
    StructField("box1", ArrayType(IntegerType)),
    StructField("box2", ArrayType(IntegerType)),
    StructField("nested_2_in_1", BooleanType),
    StructField("nested_1_in_2", BooleanType),
    StructField("type1", StringType),
    StructField("type2", StringType),
    StructField("text1", StringType),
    StructField("text2", StringType),
    StructField("overlap_case", StringType),
    StructField("pct", DoubleType),
    StructField("pct_total", DoubleType),
    StructField("ngram_pct", DoubleType)))

  test("all reference overlap-case differential vectors replay identically") {
    val rows = spark.read.schema(schema)
      .json("src/test/resources/graft/refvec/overlap_diff.ndjson")
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 300)

    import spark.implicits._
    val input = rows.flatMap { r =>
      val id = r.getLong(0).toString
      val b1 = r.getSeq[Int](1)
      val b2 = r.getSeq[Int](2)
      Seq(
        (id, 1, 1L, r.getString(5), b1(0).toDouble, b1(1).toDouble,
          b1(2).toDouble, b1(3).toDouble, r.getString(7)),
        (id, 1, 2L, r.getString(6), b2(0).toDouble, b2(1).toDouble,
          b2(2).toDouble, b2(3).toDouble, r.getString(8)))
    }.toSeq.toDF("doc_id", "page_number", "seq", "element_type",
      "x1", "y1", "x2", "y2", "text")

    val got: Map[String, Row] =
      LayoutOps.overlappingPairsWithText(input).collect()
        .map(r => r.getAs[String]("doc_id") -> r).toMap

    val failures = mutable.ArrayBuffer[String]()
    rows.foreach { r =>
      val id = r.getLong(0).toString
      val t1 = r.getString(5)
      val t2 = r.getString(6)
      val refCase = if (r.isNullAt(9)) null else r.getString(9)
      got.get(id) match {
        case None =>
          if (refCase != null)
            failures += s"case $id: reference found <$refCase>, we emitted no pair"
        case Some(ours) =>
          if (refCase == null)
            failures += s"case $id: we emitted ${ours.getAs[String]("overlap_case")}, reference none"
          else {
            val expected = refCase
              .replace(s"0. $t1", t1).replace(s"1. $t2", t2)
            val oursNorm = ours.getAs[String]("overlap_case") match {
              case "identical" => s"nested $t2 in $t1"
              case "nested Aa_in_Bb" => s"nested $t1 in $t2"
              case "nested Bb_in_Aa" => s"nested $t2 in $t1"
              case other => other
            }
            if (oursNorm != expected)
              failures += s"case $id: ours <$oursNorm> theirs <$expected>"
            if (!expected.startsWith("nested")) {
              val refPct = r.getDouble(10)
              val ourPct = ours.getAs[Double]("overlap_pct")
              if (math.abs(ourPct - refPct) > 0.015)
                failures += s"case $id: overlap_pct $ourPct != $refPct"
            }
            // the reference returns `largest_ngram_percentage or 0` — None and
            // 0 are indistinguishable on its wire, so our null maps to 0
            val refNg = if (r.isNullAt(12)) 0.0 else r.getDouble(12)
            val ourNg = Option(ours.getAs[java.lang.Double]("largest_ngram_pct"))
              .map(_.doubleValue).getOrElse(0.0)
            if (math.abs(refNg - ourNg) > 0.015)
              failures += s"case $id: ngram_pct $ourNg != $refNg (case <$expected>)"
          }
      }
    }
    if (failures.nonEmpty)
      fail(s"${failures.length}/300 divergences from reference overlap cases:\n" +
        failures.take(10).mkString("\n"))
  }
}
