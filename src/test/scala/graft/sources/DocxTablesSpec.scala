package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/**
 * DOCX table conversion vectors against the reference's `docx-tables.docx`
 * fixture (`test_docx.py:987-1075` — `_convert_table_to_html` /
 * `_iter_table_texts`): simple tables, nested tables flattened into the host
 * cell, and vertically-merged cells whose text appears exactly once.
 */
class DocxTablesSpec extends AnyFunSuite {

  private lazy val paras = OoxmlPartitioner.partitionDocx(
    Files.readAllBytes(Paths.get("/root/reference/example-docs/docx-tables.docx")))

  private lazy val tables = paras.filter(_.elementType.contains("Table"))

  test("simple table converts to compact html and plain text") {
    assert(tables.nonEmpty)
    assert(tables(0).textAsHtml.contains(
      "<table>" +
        "<tr><td>Header Col 1</td><td>Header Col 2</td></tr>" +
        "<tr><td>Lorem ipsum</td><td>A link example</td></tr>" +
        "</table>"))
    assert(tables(0).text == "Header Col 1 Header Col 2 Lorem ipsum A link example")
  }

  test("nested table flattens into the host cell in both html and text") {
    assert(tables.size >= 2)
    assert(tables(1).textAsHtml.contains(
      "<table>" +
        "<tr><td>a</td><td>&gt;b&lt;</td><td>c</td></tr>" +
        "<tr><td>d</td><td>e f g&amp;t h</td><td>i</td></tr>" +
        "<tr><td>j</td><td>k</td><td>l</td></tr>" +
        "</table>"))
    assert(tables(1).text == "a >b< c d e f g&t h i j k l")
  }

  test("merged-cell text appears only once") {
    assert(tables.size >= 3)
    assert(tables(2).text == "a b c d e")
  }
}
