package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuiteBase

/**
 * Precise page-break placement (`test_docx.py:1191-1255`) over the
 * reference's `page-breaks.docx`: hard breaks don't double-count, rendered
 * breaks split paragraphs mid-flow, a break inside a hyperlink does not split
 * the link text, and odd-page section starts can emit two consecutive
 * PageBreaks. Plus header/footer table-cell text (`:1258-1280`).
 */
class DocxPageBreaksSpec extends SparkSuiteBase {

  /** Resolve untyped paragraphs through the production text cascade. */
  private def typed(p: HtmlPartitioner.RawPara): (String, String) = {
    import org.apache.spark.sql.functions.{col, lit}
    val tpe = p.elementType.getOrElse {
      import spark.implicits._
      Seq(p.text).toDF("text")
        .select(HtmlSource.classifierCascade(lit(p.classifier), col("text")))
        .collect().head.getString(0)
    }
    (tpe, p.text)
  }

  private def doc(name: String) = DocxPartitioner.partition(
    Files.readAllBytes(Paths.get(s"/root/reference/example-docs/$name")))

  test("page-breaks.docx: the reference's 13-element break placement vector") {
    val paras = doc("page-breaks.docx")
    val got = paras.map(typed)
    val PB = "PageBreak" -> ""
    assert(got == Seq(
      "NarrativeText" -> ("First page, tab here:\t" +
        "followed by line-break here:\nhere:\nand here:\n" +
        "no-break hyphen here:-and hard page-break here>>"),
      PB,
      "NarrativeText" -> ("<<Text on second page. The font is big so it breaks " +
        "onto third page--------------------here-->> <<but break falls inside " +
        "link so text stays together."),
      PB,
      "UncategorizedText" -> "Continuous section break here>>",
      "NarrativeText" -> "<<followed by text on same page",
      "UncategorizedText" -> "Odd-page section break here>>",
      PB,
      PB,
      "NarrativeText" -> "<<producing two page-breaks to get from page-3 to page-5.",
      "NarrativeText" -> ("Then text gets big again so a \"natural\" rendered " +
        "page break happens again here>> "),
      PB,
      "UncategorizedText" -> "<<and then more text proceeds."))
  }

  test("page numbers advance across the breaks") {
    val paras = doc("page-breaks.docx").filterNot(_.elementType.contains("PageBreak"))
    assert(paras.map(_.pageNumber.getOrElse(-1)) == Seq(1, 2, 3, 3, 3, 5, 5, 6))
  }

  test("docx-hdrftr: header and footer include table cell text") {
    val paras = doc("docx-hdrftr.docx")
    val header = paras.find(_.elementType.contains("Header")).get
    assert(header.text == "First header para\nTable cell1 Table cell2\nLast header para")
    val footer = paras.find(_.elementType.contains("Footer")).get
    assert(footer.text == "para1\ncell1 a b c d e f\npara2")
  }
}
