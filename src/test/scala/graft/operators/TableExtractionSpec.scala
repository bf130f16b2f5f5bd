package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import TableExtraction.{Cell, DCell}

/** Table cell-extraction ports
  * (`test_unstructured/metrics/test_text_extraction.py:645-900`). */
class TableExtractionSpec extends AnyFunSuite {

  test("cells extraction from table_as_cells (:645)") {
    val cells = Seq(
      DCell(0, 0, 1, 1, "Month A."),
      DCell(0, 1, 1, 1, "22"))
    assert(TableExtraction.extractCellsFromTableAsCells(Some(cells)) ==
      Some(Seq(Cell(0, 0, "Month A."), Cell(1, 0, "22"))))
  }

  test("cells extraction from text_as_html (:800)") {
    val html = "<table><thead><tr><th>Month A.</th></tr></thead>" +
      "<tbody><tr><td>22</td></tr></tbody></table>"
    assert(TableExtraction.extractCellsFromTextAsHtml(Some(html)) ==
      Some(Seq(Cell(0, 0, "Month A."), Cell(1, 0, "22"))))
  }

  // the reference's "various spans, with 2 row header" param (:528-641):
  // rowspan/colspan cells keep their ANCHOR (row, col); covered positions
  // yield no extra cells
  private val SpanCells = Seq(
    DCell(0, 0, 2, 1, "h12col1"), DCell(1, 0, 1, 2, "h1col23"),
    DCell(3, 0, 1, 1, "h1col4"), DCell(1, 1, 1, 1, "h2col2"),
    DCell(2, 1, 1, 2, "h2col34"), DCell(0, 2, 1, 1, "r3col1"),
    DCell(1, 2, 1, 1, "r3col2"), DCell(2, 2, 2, 2, "r34col34"),
    DCell(0, 3, 1, 2, "r4col12"))
  private val SpanExpected = Seq(
    Cell(0, 0, "h12col1"), Cell(0, 1, "h1col23"), Cell(0, 3, "h1col4"),
    Cell(1, 1, "h2col2"), Cell(1, 2, "h2col34"), Cell(2, 0, "r3col1"),
    Cell(2, 1, "r3col2"), Cell(2, 2, "r34col34"), Cell(3, 0, "r4col12"))

  test("cells extraction: the spans-with-2-row-header matrix row (:528)") {
    assert(TableExtraction.extractCellsFromTableAsCells(Some(SpanCells)) ==
      Some(SpanExpected))
  }

  test("html extraction: rowspan/colspan table anchors match the cells twin (:722)") {
    val html = """<table><thead><tr><th rowspan="2">h12col1</th>
      |<th colspan="2">h1col23</th><th>h1col4</th></tr>
      |<tr><th>h2col2</th><th colspan="2">h2col34</th></tr></thead>
      |<tbody><tr><td>r3col1</td><td>r3col2</td>
      |<td colspan="2" rowspan="2">r34col34</td></tr>
      |<tr><td colspan="2">r4col12</td></tr></tbody></table>"""
      .stripMargin.replace("\n", "")
    assert(TableExtraction.extractCellsFromTextAsHtml(Some(html))
      .map(_.sortBy(c => (c.rowIndex, c.colIndex))) == Some(SpanExpected))
  }

  test("html extraction: the 3-head/6-body no-span matrix row (:678)") {
    val html = "<table><thead><tr><th>Month A.</th><th>Month B.</th>" +
      "<th>Month C.</th></tr></thead><tbody><tr><td>11</td><td>12</td>" +
      "<td>13</td></tr><tr><td>21</td><td>22</td><td>23</td></tr></tbody></table>"
    assert(TableExtraction.extractCellsFromTextAsHtml(Some(html)) == Some(Seq(
      Cell(0, 0, "Month A."), Cell(0, 1, "Month B."), Cell(0, 2, "Month C."),
      Cell(1, 0, "11"), Cell(1, 1, "12"), Cell(1, 2, "13"),
      Cell(2, 0, "21"), Cell(2, 1, "22"), Cell(2, 2, "23"))))
  }

  test("cells extraction: the 3-head/6-body no-span matrix row (:495)") {
    val cells = for {
      (rowVals, y) <- Seq(
        Seq("Month A.", "Month B.", "Month C."),
        Seq("11", "12", "13"), Seq("21", "22", "23")).zipWithIndex
      (v, x) <- rowVals.zipWithIndex
    } yield DCell(x, y, 1, 1, v)
    val got = TableExtraction.extractCellsFromTableAsCells(Some(cells))
    // identical to the html twin's extraction of the same logical table
    val htmlTwin = TableExtraction.extractCellsFromTextAsHtml(Some(
      "<table><thead><tr><th>Month A.</th><th>Month B.</th><th>Month C.</th>" +
        "</tr></thead><tbody><tr><td>11</td><td>12</td><td>13</td></tr>" +
        "<tr><td>21</td><td>22</td><td>23</td></tr></tbody></table>"))
    assert(got == htmlTwin && got.exists(_.size == 9))
  }

  test("missing prediction yields None for both sources (:810)") {
    assert(TableExtraction.extractCellsFromTextAsHtml(Some("")) == None)
    assert(TableExtraction.extractCellsFromTableAsCells(Some(Seq.empty)) == None)
    assert(TableExtraction.extractCellsFromTextAsHtml(None) == None)
  }

  test("prediction extraction falls back to the other source when empty") {
    val cells = Seq(DCell(0, 0, 1, 1, "x"))
    // html requested but absent -> falls back to cells
    assert(TableExtraction.extractFromPrediction(None, Some(cells)) ==
      Seq(Cell(0, 0, "x")))
    assertThrows[IllegalArgumentException](
      TableExtraction.extractFromPrediction(None, None, sourceType = "nope"))
  }

  // -- test_deckerd_html_converter (:821-900): html -> deckerd -> html fixpoint --
  private def trimHtml(html: String): String =
    html.split("\n").map(_.trim).filter(_.nonEmpty).mkString

  private val roundTrips = Seq(
    """<table>
      |    <thead>
      |        <tr>
      |            <th>Month A.</th>
      |        </tr>
      |    </thead>
      |    <tbody>
      |        <tr>
      |            <td>22</td>
      |        </tr>
      |    </tbody>
      |</table>""".stripMargin,
    """<table>
      |    <thead>
      |        <tr>
      |            <th>Month A.</th>
      |            <th>Month B.</th>
      |            <th>Month C.</th>
      |        </tr>
      |    </thead>
      |    <tbody>
      |        <tr>
      |            <td>11</td>
      |            <td>12</td>
      |            <td>13</td>
      |        </tr>
      |        <tr>
      |            <td>21</td>
      |            <td>22</td>
      |            <td>23</td>
      |        </tr>
      |    </tbody>
      |</table>""".stripMargin,
    """<table>
      |    <thead>
      |        <tr>
      |            <th rowspan="2">h12col1</th>
      |            <th colspan="2">h1col23</th>
      |            <th>h1col4</th>
      |        </tr>
      |        <tr>
      |            <th>h2col2</th>
      |            <th colspan="2">h2col34</th>
      |        </tr>
      |    </thead>
      |    <tbody>
      |        <tr>
      |            <td>r3col1</td>
      |            <td>r3col2</td>
      |            <td colspan="2" rowspan="2">r34col34</td>
      |        </tr>
      |        <tr>
      |            <td colspan="2">r4col12</td>
      |        </tr>
      |    </tbody>
      |</table>""".stripMargin)

  test("deckerd html round-trip fixpoint, spans included") {
    roundTrips.foreach { html =>
      val deckerd = TableExtraction.htmlTableToDeckerd(html)
      assert(TableExtraction.deckerdTableToHtml(deckerd) == trimHtml(html),
        "round trip diverged")
    }
  }

  test("spanned-cell right-shift produces the rendered grid positions") {
    val cells = TableExtraction.htmlTableToDeckerd(roundTrips(2))
    val pos = cells.map(c => (c.y, c.x) -> c.content).toMap
    // second header row starts at x=1 (pushed right by the rowspan above)
    assert(pos((1, 1)) == "h2col2" && pos((1, 2)) == "h2col34")
    // fourth row keeps x=0 (the 2x2 span occupies columns 2-3 only)
    assert(pos((3, 0)) == "r4col12")
  }

  // -- metrics/test_table_formats.py --
  test("from_table_transformer_cell vectors and empty-list errors") {
    import TableExtraction.{fromTableTransformerCell, DCell}
    assert(fromTableTransformerCell(Seq(3, 2, 1), Seq(6, 7), "text")
      == DCell(6, 1, 2, 3, "text"))
    assert(fromTableTransformerCell(Seq(2), Seq(6, 7), "text")
      == DCell(6, 2, 2, 1, "text"))
    assert(fromTableTransformerCell(Seq(1, 2, 3), Seq(20), "text")
      == DCell(20, 1, 1, 3, "text"))
    assert(fromTableTransformerCell(Seq(5), Seq(5), "text")
      == DCell(5, 5, 1, 1, "text"))
    intercept[IllegalArgumentException] {
      fromTableTransformerCell(Seq.empty, Seq(1), "text")
    }
    intercept[IllegalArgumentException] {
      fromTableTransformerCell(Seq(1), Seq.empty, "text")
    }
  }
}
