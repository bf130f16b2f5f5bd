package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.model.ElementType
import graft.operators.{PdfminerGeometry, TableExtraction}
import graft.operators.TableExtraction.TatrCell
import graft.queries.CorpusBytes

/** hi_res table-structure supplement: `cells_to_html` (published
  * unstructured-inference models/tables.py), the SimpleTableCell rows, and
  * `supplement_element_with_table_extraction` (`ocr.py:292-341`) composed
  * inside `partitionHiRes` behind the TableAgent seam. */
class TableStructureSpec extends AnyFunSuite {

  // ------------------------------------------------------------ cellsToHtml

  test("cellsToHtml renders thead for header rows, tr for body rows") {
    val cells = Seq(
      TatrCell(Seq(0), Seq(0), "H1", columnHeader = true),
      TatrCell(Seq(0), Seq(1), "H2", columnHeader = true),
      TatrCell(Seq(1), Seq(0), "a"),
      TatrCell(Seq(1), Seq(1), "b"))
    assert(TableExtraction.cellsToHtml(cells) ==
      "<table><thead><th>H1</th><th>H2</th></thead>" +
        "<tr><td>a</td><td>b</td></tr></table>")
  }

  test("cellsToHtml emits colspan/rowspan only when spans exceed 1, escapes text") {
    val cells = Seq(
      TatrCell(Seq(0, 1), Seq(0), "tall"),
      TatrCell(Seq(0), Seq(1, 2), "wide & <odd>"),
      TatrCell(Seq(1), Seq(1), ""))
    assert(TableExtraction.cellsToHtml(cells) ==
      """<table><tr><td rowspan="2">tall</td>""" +
        """<td colspan="2">wide &amp; &lt;odd&gt;</td></tr>""" +
        "<tr><td></td></tr></table>")
  }

  test("cellsToHtml sorts by (min row, min col) and handles empty input") {
    val cells = Seq(
      TatrCell(Seq(1), Seq(0), "second"),
      TatrCell(Seq(0), Seq(0), "first"))
    assert(TableExtraction.cellsToHtml(cells) ==
      "<table><tr><td>first</td></tr><tr><td>second</td></tr></table>")
    assert(TableExtraction.cellsToHtml(Nil) == "<table></table>")
  }

  test("toSimpleCells maps span lists to x/y/w/h Deckerd coordinates") {
    assert(TableExtraction.toSimpleCells(
      Seq(TatrCell(Seq(1, 2, 3), Seq(2), "spanner"))) ==
      Seq(graft.model.TableCellMeta(x = 2, y = 1, w = 1, h = 3, "spanner")))
  }

  test("cellsToHtml body rows roundtrip through the Deckerd cell extractor") {
    // reference quirk pinned: cells_to_html puts header <th> cells DIRECTLY
    // under <thead> (no <tr>), and html_table_to_deckerd iterates only <tr>
    // rows — so the header row drops in the roundtrip, body rows survive
    // with reindexed rows (the reference pair behaves identically)
    val html = TableExtraction.cellsToHtml(Seq(
      TatrCell(Seq(0), Seq(0), "H", columnHeader = true),
      TatrCell(Seq(1), Seq(0), "v")))
    assert(html ==
      "<table><thead><th>H</th></thead><tr><td>v</td></tr></table>")
    assert(TableExtraction.extractCellsFromTextAsHtml(Some(html)) ==
      Some(Seq(TableExtraction.Cell(0, 0, "v"))))
  }

  // ----------------------------------------------------------- wire format

  test("table_as_cells serializes as the SimpleTableCell dict list") {
    val e = graft.model.Element("id1", ElementType.Table, "t", "d", 1,
      graft.model.ElementMetadata(table_as_cells = Some(Seq(
        graft.model.TableCellMeta(0, 0, 2, 1, "hdr")))))
    val json = graft.sinks.ElementJson.elementJson(e)
    assert(json.contains(
      """"table_as_cells":[{"x":0,"y":0,"w":2,"h":1,"content":"hdr"}]"""))
  }

  // ------------------------------------------------------------ end-to-end

  private val doc = CorpusBytes.Doc(3L, "alpha beta gamma",
    Seq("alpha beta gamma delta"), "alpha", "srcA", 100L)

  private val tableDetector: PdfHiRes.Detector = pages => pages.map { p =>
    if (p.pageNumber == 1)
      Seq(PdfminerGeometry.LayoutRegion((60, 40, 600, 150), None,
        elementType = "Table", prob = Some(0.85)))
    else Nil
  }

  // each crop-local token becomes a single-cell row; row 0 is a header
  private val fakeAgent: PdfHiRes.TableAgent = (_, tokens) =>
    tokens.sortBy(t => (t.bbox._2, t.bbox._1)).zipWithIndex.map { case (t, i) =>
      TatrCell(Seq(i), Seq(0), t.text, columnHeader = i == 0)
    }

  test("partitionHiRes stamps text_as_html and table_as_cells on Table elements") {
    val els = PdfHiRes.partitionHiRes(CorpusBytes.pdfWithImage(doc), tableDetector,
      inferTableStructure = true, tableAgent = Some(fakeAgent),
      extractTableAsCells = true)
    val table = els.find(_.`type` == ElementType.Table).get
    assert(table.metadata.text_as_html.contains(
      "<table><thead><th>alpha beta gamma</th></thead>" +
        "<tr><td>figure caption line</td></tr></table>"))
    assert(table.metadata.table_as_cells.contains(Seq(
      graft.model.TableCellMeta(0, 0, 1, 1, "alpha beta gamma"),
      graft.model.TableCellMeta(0, 1, 1, 1, "figure caption line"))))
    // non-table elements untouched
    assert(els.filter(_.`type` != ElementType.Table)
      .forall(_.metadata.text_as_html.isEmpty))
  }

  test("tokens reach the agent in crop-local coordinates with the crop raster") {
    var seen: Seq[PdfHiRes.TableToken] = Nil
    var cropDims = (0, 0)
    val spy: PdfHiRes.TableAgent = (img, tokens) => {
      seen = tokens; cropDims = (img.getWidth, img.getHeight); Nil
    }
    PdfHiRes.partitionHiRes(CorpusBytes.pdfWithImage(doc), tableDetector,
      inferTableStructure = true, tableAgent = Some(spy))
    // crop of the (60,40,600,150) box
    assert(cropDims == ((540, 110)))
    assert(seen.length == 2)
    // first line starts at page x=72, y=60 -> crop-local (12, 20)
    assert(seen.head.bbox._1 == 12.0 && seen.head.bbox._2 == 20.0)
    assert(seen.head.text == "alpha beta gamma")
    assert(seen.map(_.spanNum) == Seq(0, 1))
  }

  test("an empty agent result yields text_as_html of empty string (unrecognized)") {
    val els = PdfHiRes.partitionHiRes(CorpusBytes.pdfWithImage(doc), tableDetector,
      inferTableStructure = true, tableAgent = Some((_, _) => Nil))
    val table = els.find(_.`type` == ElementType.Table).get
    assert(table.metadata.text_as_html.contains(""))
    // EXTRACT_TABLE_AS_CELLS off by default -> no table_as_cells
    assert(table.metadata.table_as_cells.isEmpty)
  }

  test("infer_table_structure without an agent raises like the reference") {
    val ex = intercept[IllegalStateException] {
      PdfHiRes.partitionHiRes(CorpusBytes.pdfWithImage(doc), tableDetector,
        inferTableStructure = true)
    }
    assert(ex.getMessage == "Unable to load table extraction agent.")
  }

  test("infer_table_structure off leaves Table metadata clean") {
    val els = PdfHiRes.partitionHiRes(CorpusBytes.pdfWithImage(doc), tableDetector)
    assert(els.find(_.`type` == ElementType.Table).get.metadata.text_as_html.isEmpty)
  }
}
