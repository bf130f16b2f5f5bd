package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Predicates
import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSuiteBase

/**
 * Behavior port of `test_unstructured/partition/test_xml.py` over the
 * reference's own `factbook.xml` / `factbook-utf-16.xml` example docs.
 * File-handle-vs-path and metadata_filename/last_modified plumbing cases
 * collapse here (one byte-array entry point); the partitioning semantics —
 * leaf-text extraction, keep_tags, encodings, end-event ordering, raw
 * line-break retention — are pinned.
 */
class XmlBehaviorSpec extends AnyFunSuite {

  private def refDoc(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(s"/root/reference/example-docs/$name"))

  private def decode(name: String): String = Encodings.decodeText(refDoc(name))

  test("factbook.xml: first leaf is 'United States' (both encodings)") {
    Seq("factbook.xml", "factbook-utf-16.xml").foreach { f =>
      val paras = Partitioners.partitionXml(decode(f))
      assert(paras.head.text == "United States", f)
    }
  }

  test("factbook.xml leaf texts arrive in document order, tags stripped") {
    val texts = Partitioners.partitionXml(decode("factbook.xml")).map(_.text)
    assert(texts.take(4) == Seq("United States", "Washington, DC", "Joe Biden", "Baseball"))
    assert(texts.size == 16) // 4 countries x 4 fields; container whitespace skipped
    // entities decode (&amp; -> &)
    assert(texts.contains("Trinidad & Tobado"))
  }

  // -- test_partition_xml_with_narrative_line_breaks (test_xml.py:192-204):
  // leading text with INTERNAL line breaks stays one element and classifies
  // through the text cascade — Title for the name, NarrativeText for prose --
  test("narrative leaf text with internal line breaks stays one NarrativeText") {
    val xml = """<xml>
        <parrot>
            <name>Conure</name>
            <description>A conure is a very friendly bird.
            Conures are feathery and like to dance.
            </description>
        </parrot>
    </xml>"""
    val paras = Partitioners.partitionXml(xml)
    assert(paras.size == 2, paras.map(_.text))
    val sp = SparkSuiteBase.session
    import org.apache.spark.sql.functions.trim
    val typed = sp.range(1).select(
      Predicates.classifyText(trim(lit(paras(0).text))).as("a"),
      Predicates.classifyText(trim(lit(paras(1).text))).as("b"))
      .collect().head
    assert(paras(0).text == "Conure" && typed.getString(0) == "Title")
    assert(paras(1).text.startsWith("A conure is a very friendly bird.") &&
      paras(1).text.contains("\n"))
    assert(typed.getString(1) == "NarrativeText")
  }

  test("xml_keep_tags=True keeps the raw markup as one Text element") {
    Seq("factbook.xml", "factbook-utf-16.xml").foreach { f =>
      val paras = Partitioners.partitionXmlKeepTags(decode(f))
      assert(paras.size == 1, f)
      assert(paras.head.text.contains("<leader>Joe Biden</leader>"), f)
      assert(paras.head.elementType.contains("UncategorizedText"), f)
    }
  }

  test("narrative leaf text keeps its internal line breaks (raw element.text)") {
    val xml =
      """<xml>
        |    <parrot>
        |        <name>Conure</name>
        |        <description>A conure is a very friendly bird.
        |        Conures are feathery and like to dance.
        |        </description>
        |    </parrot>
        |</xml>""".stripMargin
    val paras = Partitioners.partitionXml(xml)
    assert(paras.head.text == "Conure")
    assert(paras(1).text.startsWith("A conure is a very friendly bird."))
    assert(paras(1).text.trim.endsWith("Conures are feathery and like to dance."))
    // the raw trailing newline+indent survives, as in the reference
    assert(paras(1).text != paras(1).text.trim)
  }

  test("an element's leading text yields AFTER its children (end-event order)") {
    // iterparse end events: inner elements close first; tails are dropped
    val paras = Partitioners.partitionXml("<a>outer<b>inner</b>tail</a>")
    assert(paras.map(_.text) == Seq("inner", "outer"))
  }

  test("blank-only leading text is skipped") {
    val paras = Partitioners.partitionXml("<a>\n  <b>x</b>\n</a>")
    assert(paras.map(_.text) == Seq("x"))
  }
}

/** The Spark-gated slice: classification of XML leaves via the text cascade. */
class XmlBehaviorSparkSpec extends SparkSuiteBase {

  test("factbook leaves classify via the text cascade (element_from_text)") {
    val sp = spark
    import sp.implicits._
    val xml = Encodings.decodeText(
      Files.readAllBytes(Paths.get("/root/reference/example-docs/factbook.xml")))
    val texts = Partitioners.partitionXml(xml).map(_.text)
    val classified = texts.toDF("text")
      .select(Predicates.classifyText(col("text")).as("t")).collect().map(_.getString(0))
    // leaf strings are short title-ish fragments; none are narrative
    assert(!classified.contains("NarrativeText"))
    // "Washington, DC" should not classify as Address (no zip)
    assert(classified.forall(t => t == "Title" || t == "UncategorizedText" || t == "Address"))
  }
}
