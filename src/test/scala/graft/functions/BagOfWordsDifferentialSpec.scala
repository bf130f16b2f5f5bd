package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuiteBase

/**
 * Differential fuzz against the reference `bag_of_words`
 * (`metrics/text_extraction.py:123`): `dev/gen_bow_diff_vectors.py` ran the
 * reference over 650 seeded adversarial inputs (bullets, spaced-out
 * single-char runs, in-word apostrophes/hyphens, unicode words, sentence
 * punctuation; plus an astral / wide-whitespace / isalnum-edge phase — the
 * code-point traps a UTF-16 port can miss: surrogate-pair words flip the
 * single-char-run logic, Python str.split() whitespace is wider than Java
 * regex \s, and Nl/No chars are isalnum) and pinned (input, bag) pairs to
 * `refvec/bow_diff.ndjson`.
 * This spec replays every case through the native
 * [[graft.functions.expr.BagOfWordsTokens]] expression (one job for all 650)
 * and asserts identical bags.
 */
class BagOfWordsDifferentialSpec extends SparkSuiteBase {

  private val vecPath = "src/test/resources/graft/refvec/bow_diff.ndjson"

  test("650 reference bag_of_words vectors reproduce exactly") {
    val sp = spark
    val schema = StructType(Seq(
      StructField("input", StringType),
      StructField("bow", MapType(StringType, IntegerType))))
    val expected = sp.read.schema(schema).json(vecPath)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) Map.empty[String, Int]
         else r.getMap[String, Int](1).toMap))
    assert(expected.length == 650)
    val inputs = expected.map(_._1)
    val got = sp.createDataFrame(
        sp.sparkContext.parallelize(
          inputs.zipWithIndex.map { case (t, i) =>
            org.apache.spark.sql.Row(i.toLong, t)
          }.toSeq, 4),
        StructType(Seq(StructField("id", LongType), StructField("input", StringType))))
      .select(col("id"),
        graft.functions.expr.BagOfWordsTokens.column(col("input")).as("t"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[String](1).groupBy(identity).map { case (w, g) => w -> g.size })
      .toMap
    expected.zipWithIndex.foreach { case ((input, bag), i) =>
      assert(got(i.toLong) == bag, s"case $i: <$input>")
    }
  }
}
