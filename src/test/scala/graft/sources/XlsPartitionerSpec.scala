package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** `partition_xls` over the reference's legacy BIFF8 workbook
  * (`test_unstructured/partition/test_auto.py:842` —
  * `example-docs/tests-example.xls`, EXPECTED_XLS_TABLE in
  * `test_constants.py:69`). */
class XlsPartitionerSpec extends AnyFunSuite {

  private lazy val bytes: Array[Byte] =
    Files.readAllBytes(Paths.get("/root/reference/example-docs/tests-example.xls"))

  private lazy val elements = XlsPartitioner.partitionXls(bytes)

  test("tests-example.xls partitions to 14 elements with 2 tables") {
    assert(elements.size == 14, elements.map(e => (e.elementType, e.text.take(30))))
    assert(elements.count(_.elementType.contains("Table")) == 2)
  }

  test("the first table matches EXPECTED_XLS_TABLE html and its 507-char text") {
    val first = elements.head
    assert(first.elementType.contains("Table"))
    assert(first.text.length == 507, first.text)
    val expected =
      "<table><tr>" +
        "<td>MC</td><td>What is 2+2?</td><td>4</td><td>correct</td><td>3</td>" +
        "<td>incorrect</td><td/><td/><td/>" +
        "</tr><tr>" +
        "<td>MA</td><td>What C datatypes are 8 bits? (assume i386)</td><td>int</td>" +
        "<td/><td>float</td><td/><td>double</td><td/><td>char</td>" +
        "</tr><tr>" +
        "<td>TF</td><td>Bagpipes are awesome.</td><td>true</td>" +
        "<td/><td/><td/><td/><td/><td/>" +
        "</tr><tr>" +
        "<td>ESS</td><td>How have the original Henry Hornbostel buildings " +
        "influenced campus architecture and design in the last 30 years?</td>" +
        "<td/><td/><td/><td/><td/><td/><td/>" +
        "</tr><tr>" +
        "<td>ORD</td><td>Rank the following in their order of operation.</td>" +
        "<td>Parentheses</td><td>Exponents</td><td>Division</td>" +
        "<td>Addition</td><td/><td/><td/>" +
        "</tr><tr>" +
        "<td>FIB</td><td>The student activities fee is</td><td>95</td>" +
        "<td>dollars for students enrolled in</td><td>19</td>" +
        "<td>units or more,</td><td/><td/><td/>" +
        "</tr><tr>" +
        "<td>MAT</td><td>Match the lower-case greek letter with its capital form.</td>" +
        "<td>λ</td><td>Λ</td><td>α</td><td>γ</td><td>Γ</td><td>φ</td><td>Φ</td>" +
        "</tr></table>"
    assert(first.textAsHtml.contains(expected))
  }

  test("sheet names land in page_name with 1-based page numbers") {
    assert(elements.head.pageName.isDefined)
    assert(elements.head.pageNumber.contains(1))
    assert(elements.map(_.pageNumber.getOrElse(0)).max >= 2)
  }

  test("RK decoding covers the four encodings") {
    assert(XlsPartitioner.decodeRk(0x2L) == 0.0) // int 0
    assert(XlsPartitioner.decodeRk((4L << 2) | 0x2L) == 4.0)
    assert(XlsPartitioner.decodeRk(((-3L & 0x3FFFFFFFL) << 2 | 0x2L) & 0xFFFFFFFFL) == -3.0)
    // float 1.5 = 0x3FF8000000000000 -> top 30 bits, no flags
    assert(XlsPartitioner.decodeRk(0x3FF80000L & 0xFFFFFFFCL) == 1.5)
    // div-100 int: 12345 -> 123.45
    assert(XlsPartitioner.decodeRk((12345L << 2) | 0x3L) == 123.45)
  }

  test("infer_table_structure=false drops html; find_subtable=false merges the sheet") {
    val noHtml = XlsPartitioner.partitionXls(bytes, inferTableStructure = false)
    assert(noHtml.size == elements.size)
    assert(noHtml.forall(_.textAsHtml.isEmpty))
    val whole = XlsPartitioner.partitionXls(bytes, findSubtable = false)
    assert(whole.forall(_.elementType.contains("Table")))
  }

  test("auto router detects and partitions .xls") {
    val (ft, paras) = Partitioners.partitionAuto("tests-example.xls", bytes)
    assert(ft == FileType.Xls)
    assert(paras.size == 14)
  }
}
