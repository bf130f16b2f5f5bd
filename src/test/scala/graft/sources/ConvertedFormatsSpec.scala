package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/**
 * Behavior tests for the RTF/ODT/EPUB/Org/reST/MSG partitioners against the
 * reference's own example documents (`/root/reference/example-docs/`), asserting
 * the element shapes its test suite asserts
 * (`test_unstructured/partition/test_{rtf,odt,epub,org,rst,msg}.py`).
 */
class ConvertedFormatsSpec extends AnyFunSuite {

  private val docs = "/root/reference/example-docs/"

  private def bytesOf(name: String): Array[Byte] = Files.readAllBytes(Paths.get(docs + name))
  private def textOf(name: String): String =
    new String(bytesOf(name), java.nio.charset.StandardCharsets.UTF_8)

  // --- RTF (test_rtf.py:11-18) ------------------------------------------------------

  test("partition_rtf: fake-doc.rtf begins with the heading and ends with the table") {
    val paras = ConvertedFormats.partitionRtf(textOf("fake-doc.rtf"))
    assert(paras.nonEmpty)
    assert(paras.head.text == "My First Heading")
    assert(paras.head.elementType.contains("Title"))
    val last = paras.last
    assert(last.elementType.contains("Table"))
    assert(last.text.replaceAll("\\s+", " ") ==
      "Column 1 Column 2 Row 1, Cell 1 Row 1, Cell 2 Row 2, Cell 1 Row 2, Cell 2")
    assert(last.textAsHtml.exists(_.contains("<table>")))
    assert(paras.map(_.text).contains("My first paragraph."))
  }

  // --- ODT (test_odt.py:43-55) ------------------------------------------------------

  test("partition_odt: fake.odt yields the narrative paragraph and the table") {
    val paras = ConvertedFormats.partitionOdt(bytesOf("fake.odt"))
    assert(paras.map(_.text).head == "Lorem ipsum dolor sit amet.")
    val table = paras.find(_.elementType.contains("Table")).get
    assert(table.text.replaceAll("\\s+", " ") ==
      "Header row Mon Wed Fri Color Blue Red Green Time 1pm 2pm 3pm Leader Sarah Mark Ryan")
  }

  // --- EPUB (test_epub.py:14-27) ----------------------------------------------------

  test("partition_epub: winter-sports.epub yields ordered chapters with tables") {
    val paras = ConvertedFormats.partitionEpub(bytesOf("winter-sports.epub"))
    assert(paras.size > 50)
    assert(paras.exists(_.text.toLowerCase.startsWith("the project gutenberg ebook of winter sports")))
    assert(paras.exists(_.elementType.contains("Table")))
  }

  // --- Org (test_org.py:19-21) ------------------------------------------------------

  test("partition_org: README.org starts with the Example Docs title") {
    val paras = ConvertedFormats.partitionOrg(textOf("README.org"))
    assert(paras.head.text == "Example Docs")
    assert(paras.head.elementType.contains("Title"))
  }

  // --- reST (test_rst.py:18-20) -----------------------------------------------------

  test("partition_rst: README.rst starts with the Example Docs title") {
    val paras = ConvertedFormats.partitionRst(textOf("README.rst"))
    assert(paras.head.text == "Example Docs")
    assert(paras.head.elementType.contains("Title"))
  }

  // --- MSG (test_msg.py:31-59) ------------------------------------------------------

  test("partition_msg: fake-email.msg yields the expected body elements") {
    val (meta, paras) = MsgPartitioner.partitionMsg(bytesOf("fake-email.msg"))
    assert(meta.subject.contains("Test Email"))
    assert(meta.sentFrom.exists(_.contains("mrobinson@unstructured.io")))
    assert(meta.sentTo.exists(_.contains("mrobinson@unstructured.io")))
    val texts = paras.map(_.text)
    assert(texts.contains("This is a test email to use for unit tests."))
    assert(texts.contains("Important points:"))
    assert(texts.contains("Roses are red"))
    assert(texts.contains("Violets are blue"))
    val rose = paras.find(_.text == "Roses are red").get
    assert(rose.elementType.contains("ListItem"))
  }

  test("partition_msg: attachments are discovered with filenames") {
    val atts = MsgPartitioner.msgAttachments(bytesOf("fake-email-attachment.msg"))
    assert(atts.nonEmpty)
    assert(atts.exists(_._1.nonEmpty))
  }

  test("detect_filetype routes the new formats") {
    assert(DetectFiletype.detect("x.rtf", textOf("fake-doc.rtf").getBytes.take(64)) == FileType.Rtf)
    assert(DetectFiletype.detect("x.bin", bytesOf("fake.odt").take(65536)) == FileType.Odt)
    assert(DetectFiletype.detect("x.bin", bytesOf("winter-sports.epub").take(65536)) == FileType.Epub)
    assert(DetectFiletype.detect("x.msg", bytesOf("fake-email.msg").take(64)) == FileType.Msg)
    assert(DetectFiletype.detect("x.org", "* Title".getBytes) == FileType.Org)
    assert(DetectFiletype.detect("x.rst", "Title\n=====".getBytes) == FileType.Rst)
  }
}
