package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.types._

import graft.SparkSuiteBase

/**
 * Differential harness for the element-type histogram match score:
 * `dev/gen_element_type_diff_vectors.py` ran the reference
 * `calculate_element_type_percent_match` (`metrics/element_type.py:43-94`) over
 * 200 seeded (output, source) frequency tables — overlap-heavy, disjoint, and
 * empty histograms at depth weights 0.25/0.5/1.0 — and pinned the scores. This
 * spec replays each through [[MetricsOps.elementTypePercentMatch]].
 */
class ElementTypeDifferentialSpec extends SparkSuiteBase {

  private val freqSchema = ArrayType(StructType(Seq(
    StructField("t", StringType),
    StructField("d", IntegerType),
    StructField("n", LongType))))

  private val schema = StructType(Seq(
    StructField("case", LongType),
    StructField("output", freqSchema),
    StructField("source", freqSchema),
    StructField("weight", DoubleType),
    StructField("pct", DoubleType)))

  test("all reference element-type percent-match vectors replay identically") {
    val rows = spark.read.schema(schema)
      .json("src/test/resources/graft/refvec/element_type_diff.ndjson")
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 200)
    import spark.implicits._
    val failures = mutable.ArrayBuffer[String]()
    rows.foreach { r =>
      def freqDf(i: Int) = {
        val entries = r.getSeq[org.apache.spark.sql.Row](i).map { e =>
          (e.getString(0), if (e.isNullAt(1)) None else Some(e.getInt(1)), e.getLong(2))
        }
        entries.toDF("element_type", "category_depth", "n")
      }
      val got = MetricsOps.elementTypePercentMatch(freqDf(1), freqDf(2), r.getDouble(3))
        .collect().head.getDouble(0)
      val expected = r.getDouble(4)
      if (math.abs(got - expected) > 1e-9)
        failures += s"case ${r.getLong(0)}: ours $got theirs $expected (w=${r.getDouble(3)})"
    }
    if (failures.nonEmpty)
      fail(s"${failures.length}/200 divergences:\n" + failures.take(8).mkString("\n"))
  }
}
