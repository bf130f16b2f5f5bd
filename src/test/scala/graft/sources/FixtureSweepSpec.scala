package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/**
 * Sweep of the reference example-docs fixtures no dedicated suite covered,
 * with the reference's own expectations pinned per file:
 * encoding-variant parity (`test_text.py`/`test_partition.py` UTF-16/32 and
 * UTF-16 HTML cases), script-tag suppression and duplicate-element retention
 * (`html/test_partition.py:284,933`), delimiter sniffing on long-line CSVs
 * (`test_csv.py:252`, issue #2643), emoji TSV flattening
 * (`test_constants.py:58`), DOCX style-derived category depths
 * (`test_docx.py:350-380`), and real-workbook XLSX parses.
 */
class FixtureSweepSpec extends AnyFunSuite {

  private val docs = "/root/reference/example-docs/"

  private def auto(name: String): Seq[HtmlPartitioner.RawPara] =
    Partitioners.partitionAuto(name,
      Files.readAllBytes(Paths.get(docs + name)))._2

  test("UTF-16/LE/BE/32 text fixtures decode identically to the UTF-8 one") {
    val expected = auto("fake-text.txt").map(_.text)
    assert(expected.nonEmpty)
    for (v <- Seq("fake-text-utf-16.txt", "fake-text-utf-16-le.txt",
        "fake-text-utf-16-be.txt", "fake-text-utf-32.txt")) {
      assert(auto(v).map(_.text) == expected, v)
    }
  }

  test("UTF-16 steelJIS HTML partitions identically to the UTF-8 variant") {
    val utf8 = auto("example-steelJIS-datasheet.html").map(_.text)
    val utf16 = auto("example-steelJIS-datasheet-utf-16.html").map(_.text)
    assert(utf8.nonEmpty)
    assert(utf16 == utf8)
  }

  test("script tags are suppressed (example-with-scripts.html)") {
    val els = auto("example-with-scripts.html")
    assert(els.size > 50)
    assert(els.forall(e => !e.text.contains("function (")))
  }

  test("duplicate HTML elements are retained as distinct elements") {
    // unique ids come from the (doc, seq)-keyed hash pipeline (q_hash_ids);
    // the parser's contract is that duplicates are NOT collapsed
    val texts = auto("fake-html-with-duplicate-elements.html").map(_.text)
    assert(texts.count(_ == "Example heading.") == 2)
    assert(texts.distinct.size < texts.size)
  }

  test("comma delimiter is sniffed on csv-with-long-lines.csv (issue #2643)") {
    val els = auto("csv-with-long-lines.csv")
    assert(els.size == 1)
    assert(els.head.elementType.contains("Table"))
    assert(els.head.text.contains("SpearmanCorrelationCoefficient"))
  }

  test("emoji TSV flattens with the emoji intact") {
    val els = auto("stanley-cups-with-emoji.tsv")
    assert(els.size == 1)
    val t = els.head.text
    assert(t.contains("Stanley Cups"))
    assert(t.contains("Maple Leafs"))
    assert(t.contains("👨")) // the multi-codepoint emoji row survives
  }

  test("category-level.docx derives style-based category depths") {
    val els = auto("category-level.docx")
    def depthOf(prefix: String): Option[Int] =
      els.find(_.text.startsWith(prefix)).flatMap(_.categoryDepth)
    // test_parse_category_depth_by_style's table (0-indexed per type)
    assert(depthOf("A Heading 1").contains(0))
    assert(depthOf("A Heading 2").contains(1))
    assert(depthOf("A top level list item").contains(0))
    assert(depthOf("Next level").contains(1))
    assert(depthOf("Second top-level list item").contains(0))
    assert(els.exists(_.text.startsWith("Call me Ishmael")))
  }

  test("real-workbook XLSX fixtures parse to their sheet content") {
    val segment = auto("2023-half-year-analyses-by-segment.xlsx")
    assert(segment.exists(_.text.contains("Analyses by segment")))
    assert(segment.exists(_.elementType.contains("Table")))
    val vodafone = auto("vodafone.xlsx")
    assert(vodafone.exists(_.text.contains("Nine quarters to 30 June 2023")))
  }

  test("YAML routes through the text partitioner") {
    val els = auto("simple.yaml")
    assert(els.nonEmpty)
    assert(els.exists(_.text.contains("doe: \"a deer, a female deer\"")))
  }

  test("German-language HTML partitions its title") {
    val els = auto("fake-html-lang-de.html")
    assert(els.nonEmpty)
    assert(els.head.text.startsWith("Jahresabschluss zum Gesch"))
  }

  test("real img fixtures parse header metadata exactly") {
    // dimensions cross-checked against an independent SOF/IHDR parse
    val expected = Seq(
      ("chi_sim_image.jpeg", "jpeg", 449, 110),
      ("double-column-A.jpg", "jpeg", 1248, 1664),
      ("english-and-korean.png", "png", 650, 814),
      ("example.jpg", "jpeg", 480, 360),
      ("jpn-vert.jpeg", "jpeg", 169, 350),
      ("layout-parser-paper-fast.jpg", "jpeg", 612, 792),
      ("table-multi-row-column-cells.png", "png", 1377, 648),
      ("embedded-images-tables.jpg", "jpeg", 1300, 1890))
    expected.foreach { case (name, fmt, w, h) =>
      val m = ImagePartitioner.imageMeta(Files.readAllBytes(
        Paths.get(docs + "img/" + name)))
      assert(m.exists(i => i.format == fmt && i.width == w && i.height == h),
        s"$name -> $m")
    }
  }
}
