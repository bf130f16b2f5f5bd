package graft.operators

import scala.collection.mutable

import graft.sources.HtmlOntology

/**
 * Table cell extraction for evaluation
 * (`/root/reference/unstructured/metrics/table/table_extraction.py:1-288`):
 * the "Deckerd" cell format `(x, y, w, h, content)` and its conversions —
 * HTML → Deckerd (with the spanned-cell right-shift fix), Deckerd → HTML
 * (thead/tbody regrouping with the max-colspan header-row quirk), and the
 * `(row_index, col_index, content)` extraction rows the table metrics consume.
 * Pure per-table functions: at corpus scale each runs inside a `flatMap` over
 * the Table elements of one document — no shuffle beyond the caller's.
 */
object TableExtraction {

  /** One cell in Deckerd format. */
  final case class DCell(x: Int, y: Int, w: Int, h: Int, content: String)

  /** One extracted evaluation cell. */
  final case class Cell(rowIndex: Int, colIndex: Int, content: String)

  private final class MCell(var x: Int, var y: Int, var w: Int, var h: Int,
      val content: String)

  /** `_move_cells_for_spanned_cells` (`:15-38`): walking cells in (y, x) order,
    * a cell landing on a grid position already covered by an earlier span
    * pushes itself and everything to its right one column over. */
  private def moveCellsForSpannedCells(cells: Seq[MCell]): Seq[MCell] = {
    val sorted = cells.sortBy(c => (c.y, c.x))
    val occupied = mutable.Set.empty[(Int, Int)]
    sorted.foreach { cell =>
      if (cell.w > 1 || cell.h > 1) {
        for (i <- cell.y until cell.y + cell.h; j <- cell.x until cell.x + cell.w)
          if ((i, j) != (cell.y, cell.x)) occupied += ((i, j))
      }
      while (occupied.contains((cell.y, cell.x))) {
        val (cy, cx) = (cell.y, cell.x)
        sorted.filter(c => c.y == cy && c.x >= cx).foreach(_.x += 1)
        occupied -= ((cy, cx))
      }
    }
    sorted
  }

  /** `html_table_to_deckerd` (`:41-68`): rows are `<tr>` in document order,
    * cells `<th>`/`<td>`, spans from colspan/rowspan attrs. */
  def htmlTableToDeckerd(content: String): Seq[DCell] = {
    val dom = HtmlOntology.parseDom(content)
    def findAll(e: HtmlOntology.Elem, tags: Set[String]): Vector[HtmlOntology.Elem] = {
      val self = if (tags.contains(e.tag)) Vector(e) else Vector.empty
      self ++ e.children.collect { case c: HtmlOntology.Elem => findAll(c, tags) }.flatten
    }
    def textOf(e: HtmlOntology.Elem): String = e.children.map {
      case HtmlOntology.TextNode(s) => s
      case c: HtmlOntology.Elem => textOf(c)
    }.mkString
    val table = findAll(dom, Set("table")).headOption
      .getOrElse(return Seq.empty)
    val cells = for {
      (row, i) <- findAll(table, Set("tr")).zipWithIndex
      (cell, j) <- findAll(row, Set("th", "td")).zipWithIndex
    } yield new MCell(j, i,
      cell.attrs.collectFirst { case ("colspan", v) => v.trim.toInt }.getOrElse(1),
      cell.attrs.collectFirst { case ("rowspan", v) => v.trim.toInt }.getOrElse(1),
      textOf(cell))
    moveCellsForSpannedCells(cells).map(c => DCell(c.x, c.y, c.w, c.h, c.content))
  }

  /** `deckerd_table_to_html` (`:70-98`): header rows are `range(max colspan of
    * the first row)` — the reference's quirk, reproduced —, rendered as
    * `<thead>`/`<tbody>` sections with span attrs only when > 1. */
  def deckerdTableToHtml(cells: Seq[DCell]): String = {
    if (cells.isEmpty) return "<table></table>"
    val headerLength = cells.filter(_.y == 0).map(_.w).max
    val headerRows = (0 until headerLength).toSet
    val byRow = cells.groupBy(_.y).toSeq.sortBy(_._1)
    def render(c: DCell, header: Boolean): String = {
      val tag = if (header) "th" else "td"
      val attrs = (if (c.w > 1) s""" colspan="${c.w}"""" else "") +
        (if (c.h > 1) s""" rowspan="${c.h}"""" else "")
      s"<$tag$attrs>${c.content}</$tag>"
    }
    val (head, body) = byRow.partition { case (y, _) => headerRows.contains(y) }
    def rows(rs: Seq[(Int, Seq[DCell])], header: Boolean): String =
      rs.map { case (_, cs) =>
        "<tr>" + cs.sortBy(_.x).map(render(_, header)).mkString + "</tr>"
      }.mkString
    val headHtml = if (head.isEmpty) "" else s"<thead>${rows(head, header = true)}</thead>"
    val bodyHtml = if (body.isEmpty) "" else s"<tbody>${rows(body, header = false)}</tbody>"
    s"<table>$headHtml$bodyHtml</table>"
  }

  /** One table-transformer span cell — the `tables_agent.predict(...,
    * result_format="cells")` row shape: `row_nums` / `column_nums` index
    * lists, `cell text`, and the `column header` flag. */
  final case class TatrCell(rowNums: Seq[Int], columnNums: Seq[Int],
      text: String, columnHeader: Boolean = false)

  private def escapeXml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /**
   * `cells_to_html` (published unstructured-inference
   * `models/tables.py` — not vendored in this checkout; behavior re-derived
   * from its public source): cells sorted by (min row, min col); each new row
   * index opens a fresh row container — `<thead>` when the row's FIRST cell
   * is a column header, `<tr>` otherwise — with the row's cell tag (`th` /
   * `td`) fixed by that same first cell; `colspan`/`rowspan` attrs only when
   * the span exceeds 1; ElementTree-style text escaping and explicit
   * close tags for empty cells.
   */
  def cellsToHtml(cells: Seq[TatrCell]): String = {
    val sorted = cells.sortBy(c => (c.rowNums.min, c.columnNums.min))
    val sb = new StringBuilder("<table>")
    var currentRow = Int.MinValue
    var rowTag = "tr"
    var cellTag = "td"
    var open = false
    sorted.foreach { cell =>
      val thisRow = cell.rowNums.min
      if (thisRow != currentRow) {
        currentRow = thisRow
        if (open) sb.append(s"</$rowTag>")
        if (cell.columnHeader) { rowTag = "thead"; cellTag = "th" }
        else { rowTag = "tr"; cellTag = "td" }
        sb.append(s"<$rowTag>")
        open = true
      }
      val attrs =
        (if (cell.columnNums.length > 1) s""" colspan="${cell.columnNums.length}""""
         else "") +
          (if (cell.rowNums.length > 1) s""" rowspan="${cell.rowNums.length}""""
          else "")
      sb.append(s"<$cellTag$attrs>${escapeXml(cell.text)}</$cellTag>")
    }
    if (open) sb.append(s"</$rowTag>")
    sb.append("</table>")
    sb.toString
  }

  /** `SimpleTableCell.from_table_transformer_cell(...).to_dict()` over a
    * predict result — the `table_as_cells` metadata rows
    * (`ocr.py:336-339`). */
  def toSimpleCells(cells: Seq[TatrCell]): Seq[graft.model.TableCellMeta] =
    cells.map { c =>
      val d = fromTableTransformerCell(c.rowNums, c.columnNums, c.text)
      graft.model.TableCellMeta(d.x, d.y, d.w, d.h, d.content)
    }

  private def sortCells(cells: Seq[Cell]): Seq[Cell] =
    cells.sortBy(c => (c.rowIndex, c.colIndex))

  /** `SimpleTableCell.from_table_transformer_cell`
    * (`metrics/table/table_formats.py`): a table-transformer span cell —
    * `row_nums`/`column_nums` index lists — to the (x, y, w, h) Deckerd
    * shape; empty index lists are an error. */
  def fromTableTransformerCell(rowNums: Seq[Int], columnNums: Seq[Int],
      text: String): DCell = {
    require(rowNums.nonEmpty, "Cell has missing values under \"row_nums\" key")
    require(columnNums.nonEmpty, "Cell has missing values under \"column_nums\" key")
    DCell(x = columnNums.min, y = rowNums.min,
      w = columnNums.length, h = rowNums.length, content = text)
  }

  /** `extract_cells_from_text_as_html` (`:213-237`): None when the html is
    * absent or carries no `<table>`. */
  def extractCellsFromTextAsHtml(textAsHtml: Option[String]): Option[Seq[Cell]] =
    textAsHtml.filter(_.contains("<table>")).map { html =>
      htmlTableToDeckerd(html).map(d => Cell(d.y, d.x, d.content))
    }

  /** `extract_cells_from_table_as_cells` (`:260-288`). */
  def extractCellsFromTableAsCells(tableAsCells: Option[Seq[DCell]]): Option[Seq[Cell]] =
    tableAsCells.filter(_.nonEmpty)
      .map(_.map(d => Cell(d.y, d.x, d.content)))

  /** `extract_and_convert_tables_from_prediction` (`:170-211`) for one element:
    * the requested source, falling back to the other when it yields nothing. */
  def extractFromPrediction(textAsHtml: Option[String],
      tableAsCells: Option[Seq[DCell]], sourceType: String = "html"): Seq[Cell] = {
    require(sourceType == "html" || sourceType == "cells",
      s"""source_type $sourceType is not valid. Allowed source_types are "html" and "cells"""")
    val primary =
      if (sourceType == "html") extractCellsFromTextAsHtml(textAsHtml)
      else extractCellsFromTableAsCells(tableAsCells)
    val chosen = primary.filter(_.nonEmpty).orElse {
      if (sourceType == "html") extractCellsFromTableAsCells(tableAsCells)
      else extractCellsFromTextAsHtml(textAsHtml)
    }
    chosen.map(sortCells).getOrElse(Seq.empty)
  }
}
