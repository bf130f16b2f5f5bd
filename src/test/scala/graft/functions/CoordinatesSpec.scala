package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** `documents/coordinates.py` conversions as Column expressions. */
class CoordinatesSpec extends SparkSuiteBase {

  import graft.functions.{Coordinates => C}

  private def one(cols: org.apache.spark.sql.Column*): Seq[Double] = {
    import spark.implicits._
    Seq(1).toDF("i").select(cols: _*).collect().head.toSeq.map {
      case d: Double => d
    }
  }

  test("pixel (screen) to point (cartesian) flips the y axis") {
    // top of a 100-tall image (y=0) is the top of a 200-tall pdf page (y=200)
    val Seq(x, y) = one(
      C.convertX(lit(50.0), C.pixelSpace(100, 100), C.pointSpace(300, 200)),
      C.convertY(lit(0.0), C.pixelSpace(100, 100), C.pointSpace(300, 200)))
    assert(x == 150.0 && y == 200.0)
  }

  test("same-orientation conversion is a plain rescale") {
    val Seq(y) = one(C.convertY(lit(25.0),
      C.pixelSpace(100, 100), C.pixelSpace(1000, 1000)))
    assert(y == 250.0)
  }

  test("relative round-trip returns the original point") {
    val px = C.pixelSpace(640, 480)
    val Seq(x, y) = one(
      C.convertX(C.convertX(lit(320.0), px, C.relative), C.relative, px),
      C.convertY(C.convertY(lit(120.0), px, C.relative), C.relative, px))
    assert(math.abs(x - 320.0) < 1e-9 && math.abs(y - 120.0) < 1e-9)
  }

  test("convertPoints maps every [x, y] pair") {
    import spark.implicits._
    val df = Seq(1).toDF("i").select(
      C.convertPoints(
        array(array(lit(0.0), lit(0.0)), array(lit(100.0), lit(100.0))),
        C.pixelSpace(100, 100), C.pointSpace(100, 100)).as("pts"))
    val pts = df.collect().head.getSeq[Seq[Double]](0)
    assert(pts == Seq(Seq(0.0, 100.0), Seq(100.0, 0.0)))
  }
}
