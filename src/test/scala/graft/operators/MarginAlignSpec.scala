package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** Structural invariants of the margin-based bitext mining query (the value
  * itself is hash-verified by the `q_margin_align` DuckDB oracle). */
class MarginAlignSpec extends SparkSuiteBase {

  private lazy val rows = {
    graft.Tables.configure(spark)
    graft.SparkEntry.queries("q_margin_align")(spark, "/root/testdata/sf0.001")
      .collect()
  }

  test("emits at most one best match per A-side vector, all above the floor") {
    assert(rows.nonEmpty)
    val as = rows.map(_.getLong(0))
    assert(as.distinct.length == as.length)
    assert(rows.forall(_.getLong(3) >= 1000000L))
  }

  test("sides never mix: matches pair an even-label with an odd-label vector") {
    val sp = spark
    val labels = graft.Tables
      .readFanout(sp, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), pmod(col("label"), lit(2)).as("par"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.forall(r => labels(r.getLong(0)) == 0 && labels(r.getLong(1)) == 1))
  }
}
