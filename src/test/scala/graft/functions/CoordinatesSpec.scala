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

  // --- ported vectors from test_unstructured/documents/test_coordinates.py ---

  test("convert_coordinate vectors: orientation flip on one axis") {
    // (old_t, old_max, new_max, orientation, expected): the y-axis kernel
    val vectors = Seq(
      (0.0, 7.0, 5.0, true, 0.0), (7.0, 7.0, 5.0, true, 5.0),
      (0.0, 7.0, 5.0, false, 5.0), (7.0, 7.0, 5.0, false, 0.0))
    vectors.foreach { case (t, oldMax, newMax, sameOrientation, expected) =>
      // same orientation = cartesian->cartesian; flip = screen->cartesian
      val from = if (sameOrientation) C.pointSpace(1, oldMax) else C.pixelSpace(1, oldMax)
      val Seq(got) = one(C.convertY(lit(t), from, C.pointSpace(1, newMax)))
      assert(got == expected, s"($t, $oldMax, $newMax, $sameOrientation)")
    }
  }

  test("convert_from_relative vectors") {
    // (width, height, orientation, relX, relY, expX, expY)
    val cart = C.pointSpace(100, 300)
    val Seq(x1, y1) = one(C.convertX(lit(0.8), C.relative, cart),
      C.convertY(lit(0.4), C.relative, cart))
    assert((x1, y1) == ((80.0, 120.0)))
    val screen = C.pixelSpace(100, 300)
    val Seq(x2, y2) = one(C.convertX(lit(0.8), C.relative, screen),
      C.convertY(lit(0.6), C.relative, screen))
    assert((x2, y2) == ((80.0, 120.0)))
  }

  test("convert_to_relative vectors") {
    val cart = C.pointSpace(100, 300)
    val Seq(x1, y1) = one(C.convertX(lit(80.0), cart, C.relative),
      C.convertY(lit(120.0), cart, C.relative))
    assert((x1, y1) == ((0.8, 0.4)))
    val screen = C.pixelSpace(100, 300)
    val Seq(x2, y2) = one(C.convertX(lit(80.0), screen, C.relative),
      C.convertY(lit(120.0), screen, C.relative))
    assert((x2, y2) == ((0.8, 0.6)))
  }

  test("convert_to_new_system vectors: all four orientation pairings") {
    // systems: (100x200) -> (1000x2000), point (80, 120)
    val vectors = Seq(
      (C.pointSpace(100, 200), C.pointSpace(1000, 2000), 800.0, 1200.0),
      (C.pointSpace(100, 200), C.pixelSpace(1000, 2000), 800.0, 800.0),
      (C.pixelSpace(100, 200), C.pointSpace(1000, 2000), 800.0, 800.0),
      (C.pixelSpace(100, 200), C.pixelSpace(1000, 2000), 800.0, 1200.0))
    vectors.foreach { case (from, to, expX, expY) =>
      val Seq(x, y) = one(C.convertX(lit(80.0), from, to), C.convertY(lit(120.0), from, to))
      assert((x, y) == ((expX, expY)), s"$from -> $to")
    }
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
