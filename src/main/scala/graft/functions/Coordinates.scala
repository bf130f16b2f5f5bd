package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Coordinate-system conversion — `documents/coordinates.py:7-113`: a finite
 * plane with width/height and an orientation (SCREEN: origin top-left, y grows
 * down; CARTESIAN: origin bottom-left, y grows up). Conversion goes through
 * the relative 0..1 CARTESIAN system (`convert_coordinates_to_new_system`),
 * i.e. per axis: to-relative then from-relative, where a SCREEN-oriented axis
 * flips (`convert_coordinate:12-18` — the linear-transform selector reduces to
 * `t/max*newMax` for matching orientation and `(1 - t/max)*newMax` for a
 * flip).
 *
 * Everything is a codegen'd Column expression — converting a billion bbox
 * corners is a projection, no UDF, no shuffle. The same simplified closed
 * form is used by the DuckDB oracle, so float results agree bit-for-bit.
 */
object Coordinates {

  sealed abstract class Orientation(val yUp: Boolean)
  /** Origin top-left, y increases downward (images). */
  case object Screen extends Orientation(false)
  /** Origin bottom-left, y increases upward (PDF points). */
  case object Cartesian extends Orientation(true)

  /** A finite coordinate plane (`CoordinateSystem`). */
  final case class System(width: Double, height: Double, orientation: Orientation)

  def pixelSpace(width: Double, height: Double): System =
    System(width, height, Screen)
  def pointSpace(width: Double, height: Double): System =
    System(width, height, Cartesian)
  /** `RelativeCoordinateSystem`: 1x1 CARTESIAN. */
  val relative: System = System(1.0, 1.0, Cartesian)

  /** x axes always share orientation: plain rescale. */
  def convertX(x: Column, from: System, to: System): Column =
    x / lit(from.width) * lit(to.width)

  /** y axis: through relative CARTESIAN, flipping once per SCREEN system. */
  def convertY(y: Column, from: System, to: System): Column = {
    val rel = if (from.orientation.yUp) y / lit(from.height)
    else lit(1.0) - y / lit(from.height)
    if (to.orientation.yUp) rel * lit(to.height)
    else (lit(1.0) - rel) * lit(to.height)
  }

  /** `convert_multiple_coordinates_to_new_system` over an
    * `array<array<double>>` points column ([[x, y], ...]). */
  def convertPoints(points: Column, from: System, to: System): Column =
    transform(points, p => array(
      convertX(element_at(p, 1), from, to),
      convertY(element_at(p, 2), from, to)))
}
