package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuiteBase

/**
 * End-to-end behavior port of `test_unstructured/partition/test_doc.py` and
 * `test_ppt.py` over the reference's own binary example docs, driven through
 * `AutoSource.partitionFiles` (detection -> legacy OLE partitioner ->
 * classification). The reference shells out to LibreOffice and re-partitions
 * the converted OOXML; this engine parses the OLE binary streams directly —
 * the pinned expectation is the same element sequence either way.
 */
class LegacyOfficeBehaviorSpec extends SparkSuiteBase {

  private def partitionDoc(name: String): Seq[(String, String)] = {
    val dir = Files.createTempDirectory("graft-legacy").toString
    val bytes = Files.readAllBytes(Paths.get(s"/root/reference/example-docs/$name"))
    Files.write(Paths.get(dir, name), bytes)
    AutoSource.partitionFiles(spark, dir)
      .select("seq", "element_type", "text")
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
  }

  // -- test_doc.py::expected_elements (:273-283) --
  test("simple.doc partitions to the reference's eight typed elements") {
    val out = partitionDoc("simple.doc")
    assert(out == Seq(
      ("Title", "These are a few of my favorite things:"),
      ("ListItem", "Parrots"),
      ("ListItem", "Hockey"),
      ("UncategorizedText", "Analysis"),
      ("NarrativeText", "This is my first thought. This is my second thought."),
      ("NarrativeText", "This is my third thought."),
      ("UncategorizedText", "2023"),
      ("Address", "DOYLESTOWN, PA 18901")))
  }

  // -- test_doc.py::test_partition_doc_matches_partition_docx (:37-41) --
  test("simple.doc matches simple.docx element-for-element") {
    assert(partitionDoc("simple.doc") == partitionDoc("simple.docx"))
  }

  // -- test_auto.py::test_auto_partition_odt_from_filename (:457-460) --
  test("simple.odt routes to the same eight typed elements as simple.docx") {
    assert(partitionDoc("simple.odt") == partitionDoc("simple.docx"))
  }

  // -- test_ppt.py::EXPECTED_PPT_OUTPUT (:14-21) --
  test("fake-power-point.ppt partitions to the reference's six typed elements") {
    val out = partitionDoc("fake-power-point.ppt")
    assert(out == Seq(
      ("Title", "Adding a Bullet Slide"),
      ("ListItem", "Find the bullet slide layout"),
      ("ListItem", "Use _TextFrame.text for first bullet"),
      ("ListItem", "Use _TextFrame.add_paragraph() for subsequent bullets"),
      ("NarrativeText", "Here is a lot of text!"),
      ("NarrativeText", "Here is some text in a text box!")))
  }

  // -- test_ppt.py::test_partition_ppt_matches_partition_pptx --
  test("fake-power-point.ppt matches fake-power-point.pptx element-for-element") {
    assert(partitionDoc("fake-power-point.ppt") == partitionDoc("fake-power-point.pptx"))
  }

  // -- test_partition_doc_grabs_emphasized_texts (test_doc.py:222): CHPX
  // bold/italic runs surface as emphasis metadata
  test("fake-doc-emphasized-text.doc yields the reference emphasis runs") {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/example-docs/fake-doc-emphasized-text.doc"))
    val els = LegacyOfficePartitioner.partitionDoc(bytes)
    val narrative = els.find(_.text == "I am a bold italic bold-italic text.")
    assert(narrative.isDefined, els.map(_.text))
    assert(narrative.get.emphasizedContents ==
      Seq("bold", "italic", "bold-italic", "bold-italic"))
    assert(narrative.get.emphasizedTags == Seq("b", "i", "b", "i"))
    val normal = els.find(_.text == "I am a normal text.")
    assert(normal.isDefined)
    assert(normal.get.emphasizedContents.isEmpty)
    assert(normal.get.emphasizedTags.isEmpty)
  }

  // -- the reference's converted .doc yields a real Table element first
  // (test_doc.py:222 asserts isinstance(elements[0], Table))
  test("fake-doc-emphasized-text.doc assembles its table with emphasis and html") {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/example-docs/fake-doc-emphasized-text.doc"))
    val els = LegacyOfficePartitioner.partitionDoc(bytes)
    assert(els.head.elementType.contains("Table"), els.map(e => (e.elementType, e.text)))
    assert(els.head.textAsHtml.exists(_.startsWith("<table>")))
    assert(els.head.emphasizedContents ==
      Seq("bold", "italic", "bold-italic", "bold-italic"))
    assert(els.head.emphasizedTags == Seq("b", "i", "b", "i"))
  }

  test("emphasized .doc narrative matches its .docx twin's emphasis") {
    val doc = LegacyOfficePartitioner.partitionDoc(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        "/root/reference/example-docs/fake-doc-emphasized-text.doc")))
    val docx = DocxPartitioner.partition(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        "/root/reference/example-docs/fake-doc-emphasized-text.docx")))
    def em(ps: Seq[HtmlPartitioner.RawPara], t: String) =
      ps.find(_.text == t).map(p => (p.emphasizedContents, p.emphasizedTags))
    val t = "I am a bold italic bold-italic text."
    assert(em(doc, t).isDefined && em(docx, t).isDefined)
    assert(em(doc, t) == em(docx, t))
  }
}
