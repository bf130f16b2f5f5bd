package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Point
import graft.operators.LayoutNormalize.{bboxPoints, normalizeLayoutElement, LayoutRegion}

/**
 * Behavior port of the `normalize_layout_element` cases in
 * `test_unstructured/partition/common/test_common.py:71-340`. The reference's
 * dict-vs-LayoutElement input split collapses into one region type here;
 * checkable labels keep their checked state in the type string (the sparse
 * wire has no `checked` attribute).
 */
class LayoutNormalizeSpec extends AnyFunSuite {

  private val pts = bboxPoints(1, 2, 3, 4)
  private val system = Some("PixelSpace")

  test("from_coords corner order matches LayoutElement.from_coords") {
    assert(pts == Seq(Point(1, 2), Point(1, 4), Point(3, 4), Point(3, 2)))
  }

  test("a Title region normalizes to a Title with coordinates") {
    val Seq(e) = normalizeLayoutElement(
      LayoutRegion(Some("Title"), "Some lovely text", pts), system)
    assert(e.`type` == "Title" && e.text == "Some lovely text")
    assert(e.metadata.coordinates.exists(_.points == pts))
  }

  test("coordinates attach only when a coordinate system is present") {
    val Seq(e) = normalizeLayoutElement(
      LayoutRegion(Some("Title"), "t", pts), system = None)
    assert(e.metadata.coordinates.isEmpty)
  }

  test("Figure normalizes to Image; Caption to FigureCaption (label table)") {
    assert(normalizeLayoutElement(LayoutRegion(Some("Figure"), "t", pts), system)
      .head.`type` == "Image")
    assert(normalizeLayoutElement(LayoutRegion(Some("Caption"), "t", pts), system)
      .head.`type` == "FigureCaption")
  }

  test("Headline/Subheadline become Titles with category depth 1/2") {
    val vectors = Seq(("Title", "Title", None), ("Headline", "Title", Some(1)),
      ("Subheadline", "Title", Some(2)), ("Header", "Header", None))
    vectors.foreach { case (in, expType, expDepth) =>
      val Seq(e) = normalizeLayoutElement(LayoutRegion(Some(in), "t", pts), system)
      assert(e.`type` == expType && e.metadata.category_depth == expDepth, in)
    }
  }

  test("NarrativeText and misc labels map per the type table") {
    assert(normalizeLayoutElement(LayoutRegion(Some("NarrativeText"), "t", pts), system)
      .head.`type` == "NarrativeText")
    assert(normalizeLayoutElement(LayoutRegion(Some("Text"), "t", pts), system)
      .head.`type` == "NarrativeText")
    // unknown labels fall back to UncategorizedText
    assert(normalizeLayoutElement(LayoutRegion(Some("Aliens"), "t", pts), system)
      .head.`type` == "UncategorizedText")
  }

  test("checkable labels keep checked state (CheckBox normalization)") {
    val vectors = Seq(
      ("CheckBoxUnchecked", false), ("CheckBoxChecked", true),
      ("RadioButtonUnchecked", false), ("RadioButtonChecked", true),
      ("Checked", true), ("Unchecked", false))
    vectors.foreach { case (in, checked) =>
      val Seq(e) = normalizeLayoutElement(LayoutRegion(Some(in), "", pts), system)
      assert(e.`type` == (if (checked) "CheckBoxChecked" else "CheckBoxUnchecked"), in)
    }
  }

  test("an enumerated List region splits into per-item ListItems") {
    val els = normalizeLayoutElement(LayoutRegion(Some("List"),
      "1. I'm so cool! 2. You're cool too. 3. We're all cool!", pts), system)
    assert(els.map(_.text) == Seq("I'm so cool!", "You're cool too.", "We're all cool!"))
    assert(els.forall(_.`type` == "ListItem"))
    assert(els.forall(_.metadata.coordinates.exists(_.points == pts)))
  }

  test("a bulleted List region splits on unicode bullets") {
    val els = normalizeLayoutElement(LayoutRegion(Some("List"),
      "* I'm so cool! * You're cool too. * We're all cool!", pts), system)
    assert(els.map(_.text) == Seq("I'm so cool!", "You're cool too.", "We're all cool!"))
  }

  test("infer_list_items=false keeps the List as one ListItem") {
    val els = normalizeLayoutElement(LayoutRegion(Some("List"),
      "1. a 2. b", pts), system, inferListItems = false)
    assert(els.map(_.text) == Seq("1. a 2. b") && els.head.`type` == "ListItem")
  }

  test("contains_emoji vectors") {
    assert(LayoutNormalize.containsEmoji(
      "<table><tbody><tr><td>👨\\U+1F3FB🔧</td></tr></tbody></table>"))
    assert(!LayoutNormalize.containsEmoji(
      "<table><tbody><tr><td>Hello!</td></tr></tbody></table>"))
  }

  test("ocr_data_to_elements: one element per region, PixelSpace coords with dims") {
    val regions = Seq(
      LayoutRegion(Some("UncategorizedText"),
        "LayoutParser: A Unified Toolkit for Deep",
        bboxPoints(163, 115, 452, 129)),
      LayoutRegion(Some("UncategorizedText"),
        "Learning Based Document Image Analysis",
        bboxPoints(156, 132, 457, 147)))
    val els = LayoutNormalize.ocrDataToElements(regions, 612, 792)
    assert(els.length == regions.length)
    assert(els.forall(_.`type` == "UncategorizedText"))
    els.zip(regions).foreach { case (e, r) =>
      val c = e.metadata.coordinates.get
      assert(c.points == r.coordinates)
      assert(c.system.contains("PixelSpace"))
      assert(c.layout_width.contains(612.0) && c.layout_height.contains(792.0))
    }
  }

  test("detection class prob and origin ride into metadata") {
    val Seq(e) = normalizeLayoutElement(
      LayoutRegion(Some("Title"), "t", pts, prob = Some(0.87), source = Some("yolox")),
      system)
    assert(e.metadata.detection_class_prob.contains(0.87))
    assert(e.metadata.detection_origin.contains("yolox"))
  }
}
