package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/**
 * `TextAnalysis.letCol` semantics: the bound expression is evaluated exactly
 * once per row no matter how many times the body references it. Proven with
 * a non-deterministic binding — if each reference re-evaluated, `r - r`
 * would be a difference of two independent draws.
 */
class LetColSpec extends SparkSuiteBase {

  test("letCol evaluates its binding once: r - r is identically zero") {
    val sp = spark
    import sp.implicits._
    val d = (1 to 100).toDF("i")
    val viaLet = d.select(
      TextAnalysis.letCol(rand(42) + col("i")) { r => r - r }.as("z"))
      .collect().map(_.getDouble(0))
    assert(viaLet.forall(_ == 0.0))
  }

  test("letCol is the identity on the bound value") {
    val sp = spark
    import sp.implicits._
    val d = Seq("alpha beta", "", "x").toDF("t")
    val direct = d.select(TextAnalysis.words(col("t")).as("w"))
      .collect().map(_.getSeq[String](0))
    val let = d.select(
      TextAnalysis.letCol(TextAnalysis.words(col("t")))(identity).as("w"))
      .collect().map(_.getSeq[String](0))
    assert(direct.toSeq == let.toSeq)
  }

  test("letCol nests: inner bodies may reference outer bindings") {
    val sp = spark
    import sp.implicits._
    val d = Seq(3).toDF("i")
    val r = d.select(
      TextAnalysis.letCol(col("i") * 2) { a =>
        TextAnalysis.letCol(a + 1) { b => a * b }
      }.as("v")).collect()(0).getInt(0)
    assert(r == 42) // (3*2) * (3*2+1)
  }
}
