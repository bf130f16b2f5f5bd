package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expr.WeightedLevenshtein
import graft.model.{Coordinates, Element, ElementMetadata, Point}

class SortingSpec extends AnyFunSuite {

  private def el(id: String, x1: Double, y1: Double, x2: Double, y2: Double): Element =
    Element(id, "NarrativeText", id, "d", 0,
      ElementMetadata(coordinates = Some(Coordinates(
        points = Seq(Point(x1, y1), Point(x1, y2), Point(x2, y2), Point(x2, y1)),
        system = Some("PixelSpace")))))

  // two-column newspaper layout
  private val twoCol = Seq(
    el("L1", 0, 0, 100, 20), el("L2", 0, 30, 100, 50),
    el("R1", 200, 0, 300, 20), el("R2", 200, 30, 300, 50))

  test("xy-cut with primary x reads column-major (newspaper order)") {
    val sorted = Sorting.sortPageElements(twoCol.reverse, Sorting.SortModeXyCut,
      shrinkFactor = 1.0, primaryDirection = "x")
    assert(sorted.map(_.element_id) == Seq("L1", "L2", "R1", "R2"))
  }

  test("xy-cut with primary y reads row-major") {
    // rows separated by a clear y-gap; within each row boxes split on x
    val sorted = Sorting.sortPageElements(twoCol, Sorting.SortModeXyCut,
      shrinkFactor = 1.0, primaryDirection = "y")
    assert(sorted.map(_.element_id) == Seq("L1", "R1", "L2", "R2"))
  }

  test("basic sort orders by top-left (y, x)") {
    val sorted = Sorting.sortPageElements(
      Seq(el("B", 0, 30, 10, 40), el("A", 5, 0, 15, 10)),
      Sorting.SortModeBasic)
    assert(sorted.map(_.element_id) == Seq("A", "B"))
  }

  test("basic sort skips when any element lacks coordinates (_coords_ok)") {
    // sorting.py:138-153 — a missing coord aborts the sort in BOTH modes
    val noCoords = Element("N", "NarrativeText", "N", "d", 0, ElementMetadata())
    val input = Seq(noCoords, el("B", 0, 30, 10, 40), el("A", 5, 0, 15, 10))
    assert(Sorting.sortPageElements(input, Sorting.SortModeBasic)
      .map(_.element_id) == Seq("N", "B", "A"))
  }

  test("xy-cut falls back to input order when coordinates are missing") {
    val mixed = twoCol :+ Element("X", "NarrativeText", "X", "d", 0, ElementMetadata())
    assert(Sorting.sortPageElements(mixed, Sorting.SortModeXyCut) == mixed)
  }

  test("projection profile splits on gaps") {
    val boxes = IndexedSeq((0, 0, 10, 10), (20, 0, 30, 10))
    val prof = Sorting.projection(boxes, 0)
    assert(Sorting.splitProfile(prof, 0, 1) == Seq((0, 10), (20, 30)))
  }

  test("weighted levenshtein: ins=2 del=1 sub=1") {
    assert(WeightedLevenshtein.distance("abc", "abc", 2, 1, 1) == 0)
    assert(WeightedLevenshtein.distance("ac", "abc", 2, 1, 1) == 2) // one insert
    assert(WeightedLevenshtein.distance("abcd", "abc", 2, 1, 1) == 1) // one delete
    assert(WeightedLevenshtein.distance("axc", "abc", 2, 1, 1) == 1) // one substitution
    assert(WeightedLevenshtein.distance("", "abc", 2, 1, 1) == 6)
    assert(WeightedLevenshtein.distance("abc", "", 2, 1, 1) == 3)
    // substitution (1) beats delete+insert (3)
    assert(WeightedLevenshtein.distance("kitten", "sitten", 2, 1, 1) == 1)
  }
}
