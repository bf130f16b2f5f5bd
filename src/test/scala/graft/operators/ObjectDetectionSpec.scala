package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ObjectDetection.{evaluateDoc, BoxRow}

/** Hand-computed cases for the OD metric pipeline
  * (`metrics/object_detection.py`). */
class ObjectDetectionSpec extends AnyFunSuite {

  private def box(kind: String, cls: Int, x1: Double, y1: Double, w: Double,
      h: Double, score: Double = 0.0, page: Int = 1) =
    BoxRow(1L, kind, page, cls, x1, y1, x1 + w, y1 + h, score)

  test("perfect single match at half recall: AP = 51/101, P = R = 0.5") {
    // 2 targets, one exact-overlap pred (conf .9) + one no-overlap FP (conf .3)
    val rows = Seq(
      box("gt", 0, 0, 0, 100, 100), box("gt", 0, 300, 0, 100, 100),
      box("pred", 0, 0, 0, 100, 100, score = 0.9),
      box("pred", 0, 700, 0, 100, 100, score = 0.3))
    val m = evaluateDoc(1L, rows.iterator, 1000, 1000)
    // every IoU threshold: rolling prec envelope [1, .5], recall max .5 →
    // AP = 51 sampled points of 1.0 out of 101; P/R at cut = last row
    assert(math.abs(m.m_ap - 51.0 / 101) < 1e-9)
    assert(math.abs(m.precision - 0.5) < 1e-9)
    assert(math.abs(m.recall - 0.5) < 1e-9)
    assert(math.abs(m.f1_score - 0.5) < 1e-9)
  }

  test("IoU 2/3 pred matches thresholds 0.50-0.65 only") {
    // shift 20 on a 100-wide box → IoU 80/120; single target, single pred
    val rows = Seq(
      box("gt", 0, 0, 0, 100, 100),
      box("pred", 0, 20, 0, 100, 100, score = 0.9))
    val m = evaluateDoc(1L, rows.iterator, 1000, 1000)
    // matched for 4 of 10 thresholds: per-thr AP/P/R = 1 there, 0 elsewhere
    assert(math.abs(m.recall - 0.4) < 1e-9)
    assert(math.abs(m.m_ap - 0.4) < 1e-6) // 4×(101/101)/10
  }

  test("class mismatch zeroes IoU; absent-class preds don't pollute metrics") {
    val rows = Seq(
      box("gt", 0, 0, 0, 100, 100),
      box("pred", 1, 0, 0, 100, 100, score = 0.9), // overlaps but wrong class
      box("pred", 0, 0, 0, 100, 100, score = 0.8))
    val m = evaluateDoc(1L, rows.iterator, 1000, 1000)
    // only class 0 (present in GT) counts; its single pred matches everywhere
    assert(math.abs(m.recall - 1.0) < 1e-9)
    assert(m.m_ap > 0.99)
  }

  test("higher-confidence pred takes the target; duplicate becomes FP") {
    val rows = Seq(
      box("gt", 0, 0, 0, 100, 100),
      box("pred", 0, 0, 0, 100, 100, score = 0.9),
      box("pred", 0, 0, 0, 100, 100, score = 0.8)) // same box, lower conf
    val m = evaluateDoc(1L, rows.iterator, 1000, 1000)
    // rolling: [tp, fp] → envelope [1, .5]; P at cut = .5, R = 1; AP = 1
    assert(math.abs(m.recall - 1.0) < 1e-9)
    assert(math.abs(m.precision - 0.5) < 1e-9)
    assert(math.abs(m.m_ap - 1.0) < 1e-6)
  }

  test("per-class rows split the aggregate by ground-truth class") {
    val rows = Seq(
      box("gt", 0, 0, 0, 100, 100), // class 0: perfect pred
      box("pred", 0, 0, 0, 100, 100, score = 0.9),
      box("gt", 1, 300, 0, 100, 100)) // class 1: missed entirely
    val per = ObjectDetection.evaluateDocPerClass(1L, rows.iterator, 1000, 1000)
    assert(per.map(_.cls) == Seq(0, 1))
    assert(math.abs(per(0).recall - 1.0) < 1e-9 && per(0).ap > 0.99)
    assert(per(1).recall == 0.0 && per(1).ap == 0.0)
    // aggregate = mean of the per-class rows (equal threshold counts)
    val agg = evaluateDoc(1L, rows.iterator, 1000, 1000)
    assert(math.abs(agg.recall - 0.5) < 1e-9)
  }

  test("no targets yields the reference's -1 sentinel row") {
    val m = evaluateDoc(1L,
      Seq(box("pred", 0, 0, 0, 100, 100, score = 0.9)).iterator, 1000, 1000)
    assert(m.m_ap == -1.0 && m.f1_score == -1.0)
  }

  test("preds are clipped to the page box before IoU") {
    // pred extends past the page edge; clipped back to exact overlap
    val rows = Seq(
      box("gt", 0, 900, 0, 100, 100),
      BoxRow(1L, "pred", 1, 0, 900, 0, 1100, 100, 0.9))
    val m = evaluateDoc(1L, rows.iterator, 1000, 1000)
    assert(math.abs(m.recall - 1.0) < 1e-9)
  }

  test("pages match independently") {
    val rows = Seq(
      box("gt", 0, 0, 0, 100, 100, page = 1),
      box("gt", 0, 0, 0, 100, 100, page = 2),
      box("pred", 0, 0, 0, 100, 100, score = 0.9, page = 1),
      // page-2 pred overlaps page-2 target only
      box("pred", 0, 0, 0, 100, 100, score = 0.8, page = 2))
    val m = evaluateDoc(1L, rows.iterator, 1000, 1000)
    assert(math.abs(m.recall - 1.0) < 1e-9)
    assert(math.abs(m.m_ap - 1.0) < 1e-6)
  }
}
