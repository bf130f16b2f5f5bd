package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Fast-strategy PDF extraction, exercised against real reference example docs. */
class PdfPartitionerSpec extends AnyFunSuite {

  private def refPdf(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(s"/root/reference/example-docs/pdf/$name"))

  test("decodes paren strings with escapes and octal") {
    assert(PdfPartitioner.decodePdfString("""a\(b\)c""") == "a(b)c")
    assert(PdfPartitioner.decodePdfString("""uni\\014ed""".replace("\\\\", "\\")) ==
      "unied")
    assert(PdfPartitioner.decodePdfString("""tab\there""") == "tab\there")
  }

  test("extracts real text from a FlateDecode reference PDF") {
    val paras = PdfPartitioner.partitionPdf(refPdf("layout-parser-paper-fast.pdf"))
    assert(paras.nonEmpty)
    val all = paras.map(_.text).mkString(" ")
    assert(all.contains("LayoutParser"))
    assert(all.contains("Deep Learning"))
    assert(paras.forall(_.pageNumber.isDefined))
    assert(paras.map(_.pageNumber.get).distinct.size > 1) // multi-page
  }

  test("extracts from a single-page reference PDF") {
    val paras = PdfPartitioner.partitionPdf(refPdf("DA-1p.pdf"))
    assert(paras.nonEmpty)
    assert(paras.exists(_.text.length > 20))
  }

  test("non-PDF bytes produce no elements") {
    assert(PdfPartitioner.partitionPdf("not a pdf".getBytes).isEmpty)
  }

  test("auto router dispatches PDFs to the fast path") {
    val (ft, paras) = Partitioners.partitionAuto("paper.pdf",
      refPdf("layout-parser-paper-fast.pdf"))
    assert(ft == FileType.Pdf)
    assert(paras.nonEmpty)
  }
}
