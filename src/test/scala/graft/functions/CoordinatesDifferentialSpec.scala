package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

import graft.SparkSuiteBase

/**
 * Differential harness for coordinate-plane conversion:
 * `dev/gen_coordinates_diff_vectors.py` ran the reference
 * `convert_coordinates_to_new_system` (`documents/coordinates.py`) over 200
 * seeded points across PixelSpace (screen orientation), PointSpace
 * (cartesian), and the relative 1x1 system — including out-of-bounds points —
 * and pinned the converted values. Replayed through
 * [[Coordinates.convertX]]/[[Coordinates.convertY]].
 */
class CoordinatesDifferentialSpec extends SparkSuiteBase {

  private val schema = StructType(Seq(
    StructField("case", LongType),
    StructField("from_kind", StringType),
    StructField("from_w", DoubleType), StructField("from_h", DoubleType),
    StructField("to_kind", StringType),
    StructField("to_w", DoubleType), StructField("to_h", DoubleType),
    StructField("x", DoubleType), StructField("y", DoubleType),
    StructField("nx", DoubleType), StructField("ny", DoubleType)))

  private def sys(kind: String, w: Double, h: Double): Coordinates.System = kind match {
    case "pixel" => Coordinates.pixelSpace(w, h)
    case "point" => Coordinates.pointSpace(w, h)
    case _ => Coordinates.relative
  }

  test("all reference coordinate-conversion vectors replay identically") {
    val rows = spark.read.schema(schema)
      .json("src/test/resources/graft/refvec/coordinates_diff.ndjson")
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 200)
    import spark.implicits._
    val failures = mutable.ArrayBuffer[String]()
    rows.foreach { r =>
      val from = sys(r.getString(1), if (r.isNullAt(2)) 1.0 else r.getDouble(2),
        if (r.isNullAt(3)) 1.0 else r.getDouble(3))
      val to = sys(r.getString(4), if (r.isNullAt(5)) 1.0 else r.getDouble(5),
        if (r.isNullAt(6)) 1.0 else r.getDouble(6))
      val df = Seq((r.getDouble(7), r.getDouble(8))).toDF("x", "y")
      val out = df.select(
        Coordinates.convertX(col("x"), from, to).as("nx"),
        Coordinates.convertY(col("y"), from, to).as("ny")).collect().head
      val (nx, ny) = (out.getDouble(0), out.getDouble(1))
      if (math.abs(nx - r.getDouble(9)) > 1e-9 * math.max(1, math.abs(r.getDouble(9))) ||
        math.abs(ny - r.getDouble(10)) > 1e-9 * math.max(1, math.abs(r.getDouble(10))))
        failures += s"case ${r.getLong(0)}: ours ($nx,$ny) theirs " +
          s"(${r.getDouble(9)},${r.getDouble(10)}) ${r.getString(1)}->${r.getString(4)}"
    }
    if (failures.nonEmpty)
      fail(s"${failures.length}/200 divergences:\n" + failures.take(8).mkString("\n"))
  }
}
