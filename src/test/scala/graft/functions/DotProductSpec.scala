package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.functions.expr.DotProduct.dotProduct

/**
 * Native [[graft.functions.expr.DotProduct]] vs the interpreted
 * `aggregate(zip_with(a, b, x·y), 0.0, +)` fold it replaced under every
 * cosine/norm: bit-identical doubles (same cast-to-double widening, same
 * left-to-right accumulation) and identical NULL semantics (null array,
 * null element, mismatched lengths — the fold's zip_with null-padding).
 */
class DotProductSpec extends SparkSuiteBase {

  private def foldDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the interpreted fold on float vectors") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(200) { i =>
      (Array.fill(16)(rnd.nextFloat() * (if (i % 3 == 0) -1 else 1)),
        Array.fill(16)(rnd.nextFloat()))
    }
    val d = rows.toDF("a", "b")
    val got = d.select(dotProduct(col("a"), col("b")).as("d"),
      foldDot(col("a"), col("b")).as("f")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native ${r.getDouble(0)} != fold ${r.getDouble(1)}")
    }
  }

  test("null semantics match the fold: null array, null element, length skew") {
    val sp = spark
    import sp.implicits._
    val d = Seq(
      (Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(3.0f), Some(4.0f)))),
      (None, Some(Seq(Some(1.0f)))),
      (Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(1.0f)))),
      (Some(Seq(Some(1.0f))), Some(Seq(Some(1.0f), Some(2.0f)))),
      (Some(Seq.empty[Option[Float]]), Some(Seq.empty[Option[Float]]))
    ).toDF("a", "b")
    val got = d.select(dotProduct(col("a"), col("b")).as("d"),
      foldDot(col("a"), col("b")).as("f")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null mismatch: native=${r.get(0)} fold=${r.get(1)}")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    // the fixture exercises each leg: value, null-array, null-element,
    // padded (length-skew) and empty — empty dots to 0.0 like the fold
    assert(got.count(_.isNullAt(0)) == 3)
    assert(got.last.getDouble(0) == 0.0)
  }

  test("unsupported element types fail at analysis time, not eval time") {
    val sp = spark
    import sp.implicits._
    // array<smallint> is not one of the four accessors — the error must be
    // an AnalysisException naming the type, not an IllegalStateException
    // thrown from codegen mid-query
    val d = Seq((Seq(1.toShort, 2.toShort), Seq(3.toShort, 4.toShort)))
      .toDF("a", "b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      d.select(dotProduct(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("dot_product requires"))
  }

  test("double and int arrays dot exactly like the fold") {
    val sp = spark
    import sp.implicits._
    val d = Seq((Seq(1.5, -2.25, 3.0), Seq(2, 3, 4))).toDF("a", "b")
    val got = d.select(dotProduct(col("a"), col("b")).as("d"),
      foldDot(col("a"), col("b")).as("f")).head
    assert(got.getDouble(0) == got.getDouble(1))
    assert(got.getDouble(0) == 1.5 * 2 + -2.25 * 3 + 3.0 * 4)
  }
}
