package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TableExtraction.Cell
import graft.operators.TableEval._

/**
 * Behavior port of `test_unstructured/metrics/test_table_structure.py` —
 * the TableEvalProcessor metric suite over the reference's own vectors.
 * (The image/pdf-to-dataframe and table-transformer cases are model-bound.)
 */
class TableEvalSpec extends AnyFunSuite {

  private def predFromHtml(html: String): Seq[Cell] =
    TableExtraction.extractCellsFromTextAsHtml(Some(html)).getOrElse(Nil)

  private val simpleGt: Seq[Cell] = Seq(
    Cell(0, 0, "r1c1"), Cell(1, 0, "r2c1"), Cell(0, 1, "r1c2"), Cell(1, 1, "r2c2"))

  test("simple html prediction scores perfect across all metrics") {
    val pred = predFromHtml(
      """<table><thead><tr><th>r1c1</th><th>r1c2</th></tr></thead>
        |<tbody><tr><td>r2c1</td><td>r2c2</td></tr></tbody></table>""".stripMargin)
    val r = processFile(Seq(pred), Seq(simpleGt))
    assert(r.totalTables == 1)
    assert(r.tableLevelAcc == 1.0)
    assert(r.elementRowLevelIndexAcc == 1.0)
    assert(r.elementColLevelIndexAcc == 1.0)
    assert(r.elementRowLevelContentAcc == 1.0)
    assert(r.elementColLevelContentAcc == 1.0)
    assert(r.compositeStructureAcc == 1.0)
  }

  test("cells-input prediction scores the same as html input") {
    val predCells = Seq(Cell(0, 0, "r1c1"), Cell(0, 1, "r1c2"),
      Cell(1, 0, "r2c1"), Cell(1, 1, "r2c2"))
    val r = processFile(Seq(predCells), Seq(simpleGt))
    assert(r.tableLevelAcc == 1.0 && r.elementRowLevelIndexAcc == 1.0)
  }

  test("various html table structures all score perfect") {
    val variants = Seq(
      // thead-less leading tr
      """<table><tr><th>r1c1</th><th>r1c2</th></tr><tbody>
        |<tr><td>r2c1</td><td>r2c2</td></tr>
        |<tr><td>r3c1</td><td>r3c2</td></tr></tbody></table>""".stripMargin,
      // stray close tag before rows
      """<table></tbody><tr><td>r1c1</td><td>r1c2</td></tr>
        |<tr><td>r2c1</td><td>r2c2</td></tr>
        |<tr><td>r3c1</td><td>r3c2</td></tr></tbody></table>""".stripMargin)
    val gt = Seq(
      Cell(0, 0, "r1c1"), Cell(0, 1, "r1c2"), Cell(1, 0, "r2c1"),
      Cell(1, 1, "r2c2"), Cell(2, 0, "r3c1"), Cell(2, 1, "r3c2"))
    variants.foreach { html =>
      val r = processFile(Seq(predFromHtml(html)), Seq(gt))
      assert(r.tableLevelAcc == 1.0 && r.elementRowLevelIndexAcc == 1.0 &&
        r.elementColLevelIndexAcc == 1.0, html.take(30))
    }
  }

  test("merged cells (rowspan/colspan) still align perfectly") {
    val pred = predFromHtml(
      """<table>
        |  <thead>
        |    <tr><th rowspan="2">r1c1</th><th>r1c2</th><th colspan="2">r1c3</th></tr>
        |    <tr><th>r2c2</th><th>r2c3</th><th>r2c4</th></tr>
        |  </thead>
        |  <tbody>
        |    <tr><td>r3c1</td><td>r3c2</td><td colspan="2" rowspan="2">r3c3</td></tr>
        |    <tr><td>r4c1</td><td>r4c2</td></tr>
        |  </tbody>
        |</table>""".stripMargin)
    val gt = Seq(
      Cell(0, 0, "r1c1"), Cell(2, 0, "r3c1"), Cell(3, 0, "r4c1"),
      Cell(0, 1, "r1c2"), Cell(1, 1, "r2c2"), Cell(2, 1, "r3c2"),
      Cell(3, 1, "r4c2"), Cell(0, 2, "r1c3"), Cell(1, 2, "r2c3"),
      Cell(2, 2, "r3c3"), Cell(1, 3, "r2c4"))
    val r = processFile(Seq(pred), Seq(gt))
    assert(r.totalTables == 1)
    assert(r.tableLevelAcc == 1.0)
    assert(r.elementRowLevelIndexAcc == 1.0)
    assert(r.elementColLevelIndexAcc == 1.0)
    assert(r.elementRowLevelContentAcc == 1.0)
    assert(r.elementColLevelContentAcc == 1.0)
  }

  test("a forced non-match zeroes every element metric") {
    val pred = predFromHtml("<table><tr><td>Some cell</td></tr></table>")
    val r = processWithAlignment(Seq(pred), Seq(simpleGt), matched = Seq(-1))
    assert(r.totalTables == 1)
    assert(r.tableLevelAcc == 0)
    assert(r.elementRowLevelIndexAcc == 0 && r.elementColLevelIndexAcc == 0)
    assert(r.elementRowLevelContentAcc == 0 && r.elementColLevelContentAcc == 0)
  }

  test("no tables on either side: acc 1, element metrics NaN") {
    val r = processFile(Nil, Nil)
    assert(r.totalTables == 0 && r.tableLevelAcc == 1.0)
    assert(r.elementRowLevelIndexAcc.isNaN && r.elementColLevelContentAcc.isNaN)
  }

  test("only ground truth: everything zero") {
    val r = processFile(Nil, Seq(simpleGt))
    assert(r.totalTables == 1 && r.tableLevelAcc == 0)
    assert(r.elementRowLevelIndexAcc == 0 && r.elementColLevelContentAcc == 0)
  }

  test("only prediction: zero scores, table acc 0") {
    val pred = predFromHtml("<table><tr><td>Some cell</td></tr></table>")
    val r = processFile(Seq(pred), Nil)
    assert(r.totalTables == 0 && r.totalPredictedTables == 1)
    assert(r.tableLevelAcc == 0)
    assert(r.elementRowLevelIndexAcc == 0)
  }

  test("detection metrics: recall/precision/f1 over matched indices") {
    assert(detectionMetrics(Seq(0), 1) == ((1.0, 1.0, 1.0)))
    assert(detectionMetrics(Seq(-1), 1) == ((0.0, 0.0, 0.0)))
    val (r2, p2, f2) = detectionMetrics(Seq(0, -1), 2)
    assert(r2 == 0.5 && p2 == 0.5 && f2 == 0.5)
  }

  // -- test_calculate_table_metrics (metrics/test_table_detection_metrics.py:25),
  // -- the full reference parameter matrix incl. duplicate matches (only ONE
  // -- prediction matched to the same gt index can be correct) and empties --
  test("detection metrics match the reference's full parameter matrix") {
    val cases = Seq(
      (Seq(0, 1, 2), 3, (1.0, 1.0, 1.0)),
      (Seq(2, 1, 0), 3, (1.0, 1.0, 1.0)),
      (Seq(-1, 2, -1, 1, 0, -1), 3, (1.0, 0.5, 0.66)),
      (Seq(2, 2, 1, 1), 8, (0.25, 0.5, 0.33)),
      (Seq(1, -1), 2, (0.5, 0.5, 0.5)),
      (Seq(-1, -1, -1), 2, (0.0, 0.0, 0.0)),
      (Seq(-1, -1, -1), 0, (0.0, 0.0, 0.0)),
      (Seq.empty[Int], 0, (0.0, 0.0, 0.0)))
    cases.foreach { case (matched, gtN, (er, ep, ef)) =>
      val (r, p, f) = detectionMetrics(matched, gtN)
      assert(r == er && p == ep, s"($matched, $gtN): got ($r, $p, $f)")
      assert(math.abs(f - ef) <= 0.01, s"($matched, $gtN): f1 $f != $ef")
    }
  }

  // -- test_get_element_level_alignment_when_no_match (test_table_alignment.py:4) --
  test("element-level alignment with no matched index scores zero on all four") {
    val t = Seq(graft.operators.TableExtraction.Cell(0, 0, "a"))
    val m = elementLevelAlignment(Seq(t), Seq(t), matched = Seq(-1))
    assert(m("col_index_acc") == 0.0 && m("row_index_acc") == 0.0)
    assert(m("row_content_acc") == 0.0 && m("col_content_acc") == 0.0)
  }

  test("difflib ratio kernel matches known vectors") {
    // values from Python difflib.SequenceMatcher(None, a, b).ratio()
    assert(sequenceRatio("abcd", "bcde") == 0.75)
    assert(sequenceRatio("abc", "abc") == 1.0)
    assert(sequenceRatio("", "") == 1.0)
    assert(sequenceRatio("abc", "xyz") == 0.0)
    assert(math.abs(sequenceRatio("r1c1 r1c2 r2c1 r2c2", "r1c1 r2c1 r1c2 r2c2")
      - 0.7368421052631579) < 1e-12)
  }
}
