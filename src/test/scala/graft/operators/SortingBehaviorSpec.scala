package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

import graft.model.{Coordinates, Element, ElementMetadata, Point}

/**
 * Behavior port of `test_unstructured/partition/utils/test_sorting.py` and
 * `test_xycut.py` — the reading-order machinery over the reference's own
 * vectors. The cv2 visualization helpers (`vis_*`) are rendering-only and out
 * of scope.
 */
class SortingBehaviorSpec extends AnyFunSuite {

  private def coords(pts: (Double, Double)*): Coordinates =
    Coordinates(points = pts.map(p => Point(p._1, p._2)), system = Some("PixelSpace"))

  private def textEl(text: String, c: Option[Coordinates]): Element =
    Element(text, "Text", text, "d", 0, ElementMetadata(coordinates = c))

  test("coord_has_valid_points: four non-negative points pass") {
    assert(Sorting.coordHasValidPoints(coords((1, 2), (3, 4), (5, 6), (7, 8))))
  }

  test("coord_has_valid_points: incomplete point list fails") {
    assert(!Sorting.coordHasValidPoints(coords((1, 2), (3, 4), (5, 6))))
  }

  test("coord_has_valid_points: negative values fail") {
    assert(!Sorting.coordHasValidPoints(coords((1, 2), (3, 4), (5, -6), (7, 8))))
  }

  test("sort_page_elements without coordinates returns input order (both modes)") {
    val els = (0 until 5).map(i => textEl(i.toString, None))
    assert(Sorting.sortPageElements(els, Sorting.SortModeXyCut) == els)
    assert(Sorting.sortPageElements(els, Sorting.SortModeBasic) == els)
  }

  test("xy-cut with a negative coordinate is not attempted") {
    // test_sort_xycut_neg_coordinates: point (0, -1) fails coord_has_valid_points
    val els = (0 until 2).map(i =>
      textEl(i.toString, Some(coords((0, -i), (3, 4), (6, 7), (8, 9)))))
    assert(Sorting.sortPageElements(els, Sorting.SortModeXyCut)
      .map(_.text) == Seq("0", "1"))
  }

  test("xy-cut with positive coordinates runs") {
    val els = (0 until 2).map(i =>
      textEl(i.toString, Some(coords((1, 2), (3, 4), (6, 7), (8, 9)))))
    val sorted = Sorting.sortPageElements(els, Sorting.SortModeXyCut)
    assert(sorted.map(_.text).sorted == Seq("0", "1"))
  }

  test("basic sort with negative coordinates orders by first-point y") {
    // test_sort_basic_neg_coordinates: ys 0, -1, -2 -> "2 1 0"
    val els = (0 until 3).map(i =>
      textEl(i.toString, Some(coords((1, -i), (3, 4), (6, 7), (8, 9)))))
    assert(Sorting.sortPageElements(els, Sorting.SortModeBasic)
      .map(_.text).mkString(" ") == "2 1 0")
  }

  test("basic sort with positive coordinates") {
    // test_sort_basic_pos_coordinates: texts 9,8,7 at ys 9,8,7 -> "7 8 9"
    val els = (0 until 3).map { i =>
      textEl((9 - i).toString, Some(coords((1, 9 - i), (3, 4), (6, 7), (8, 9))))
    }
    assert(Sorting.sortPageElements(els, Sorting.SortModeBasic)
      .map(_.text).mkString(" ") == "7 8 9")
  }

  test("basic sort over bboxes matches sort_text_regions vector") {
    // test_sort_text_regions: [[1,2,2,2],[1,1,2,2],[3,1,4,4]] -> "2","3","1"
    val els = Seq(
      textEl("1", Some(coords((1, 2), (1, 2), (2, 2), (2, 2)))),
      textEl("2", Some(coords((1, 1), (1, 2), (2, 2), (2, 1)))),
      textEl("3", Some(coords((3, 1), (3, 4), (4, 4), (4, 1)))))
    assert(Sorting.sortPageElements(els, Sorting.SortModeBasic)
      .map(_.text) == Seq("2", "3", "1"))
  }

  test("coordinates_to_bbox reads points[0] and points[2]") {
    val c = coords((10, 20), (10, 200), (100, 200), (100, 20))
    assert(Sorting.coordinatesToBbox(c) == ((10, 20, 100, 200)))
  }

  test("shrink_bbox keeps top-left and scales width/height") {
    assert(Sorting.shrinkBbox((0, 0, 200, 100), 0.9) == ((0, 0, 180, 90)))
    assert(Sorting.shrinkBbox((20, 20, 320, 120), 0.9) == ((20, 20, 290, 110)))
  }

  // --- test_xycut.py ---

  test("projection_by_bboxes: horizontal and vertical histograms") {
    val boxes = IndexedSeq((10, 20, 50, 60), (30, 40, 70, 80))
    val horizontal = Sorting.projection(boxes, 0)
    assert(horizontal.slice(0, 10).forall(_ == 0))
    assert(horizontal.slice(10, 30).forall(_ == 1))
    val vertical = Sorting.projection(boxes, 1)
    assert(vertical.slice(0, 20).forall(_ == 0))
    assert(vertical.slice(20, 30).forall(_ == 1))
  }

  test("split_projection_profile vectors") {
    val arr1 = Array(0, 0, 3, 4, 0, 0, 2, 0, 0, 0, 5, 6, 7, 0, 0, 0)
    assert(Sorting.splitProfile(arr1, 0, 1) == Seq((2, 4), (6, 7), (10, 13)))
    val arr2 = Array(0, 2, 0, 0, 0, 3, 0, 0, 4, 5, 6, 0, 0, 0)
    assert(Sorting.splitProfile(arr2, 1, 2) == Seq((1, 2), (5, 6), (8, 11)))
  }

  test("recursive_xy_cut and swapped variant on the reference boxes") {
    val boxes = IndexedSeq((0, 0, 20, 20), (200, 0, 230, 30), (0, 40, 50, 50))
    val res1 = mutable.ArrayBuffer.empty[Int]
    Sorting.recursiveXyCut(boxes, boxes.indices, res1)
    assert(res1.toSeq == Seq(0, 1, 2))
    val res2 = mutable.ArrayBuffer.empty[Int]
    Sorting.recursiveXyCutSwapped(boxes, boxes.indices, res2)
    assert(res2.toSeq == Seq(0, 2, 1))
  }

  test("points_to_bbox vectors") {
    assert(Sorting.pointsToBbox(Seq(10, 20, 30, 40, 50, 60, 70, 80)) == ((10, 20, 70, 80)))
    // unordered points still produce the envelope
    assert(Sorting.pointsToBbox(Seq(30, 40, 10, 20, 70, 80, 50, 60)) == ((10, 20, 70, 80)))
    // all-negative points clamp to zero
    assert(Sorting.pointsToBbox(Seq(-10, -20, -30, -40, -50, -60, -70, -80)) == ((0, 0, 0, 0)))
    intercept[IllegalArgumentException] {
      Sorting.pointsToBbox(Seq(10, 20, 30, 40, 50, 60))
    }
  }

  test("bbox2points vectors") {
    assert(Sorting.bboxToPoints((10, 20, 70, 80)) == Seq(10, 20, 70, 20, 70, 80, 10, 80))
    assert(Sorting.bboxToPoints((10, 20, 70, 20)) == Seq(10, 20, 70, 20, 70, 20, 10, 20))
    assert(Sorting.bboxToPoints((10, 20, 10, 80)) == Seq(10, 20, 10, 20, 10, 80, 10, 80))
    assert(Sorting.bboxToPoints((10, 20, 10, 20)) == Seq(10, 20, 10, 20, 10, 20, 10, 20))
  }
}
