package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** `partition_md` behavior ports (`test_unstructured/partition/test_md.py`)
  * over the reference's example docs. */
class MarkdownPartitionSpec extends AnyFunSuite {

  private def refDoc(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(s"/root/reference/example-docs/$name"))

  private def partitionFile(name: String): Seq[HtmlPartitioner.RawPara] =
    Partitioners.partitionMd(Encodings.decodeText(refDoc(name)))

  // -- test_partition_md_from_filename/from_text (:18, :36)
  test("README.md partitions to a non-trivial element stream") {
    val els = partitionFile("README.md")
    assert(els.size >= 10)
    assert(els.exists(_.elementType.isEmpty || els.nonEmpty)) // stream non-empty
    // headings surface as depth-carrying titles
    assert(els.exists(p => p.elementType.contains("Title") || p.categoryDepth.isDefined))
  }

  // -- test_partition_md_parse_table (:261)
  test("a pipe table partitions to a Table element first") {
    val els = partitionFile("simple-table.md")
    assert(els.nonEmpty)
    assert(els.head.elementType.contains("Table"))
    val html = els.head.textAsHtml.get
    assert(html.startsWith("<table>"))
    assert(els.head.text.contains("Juicy Apples") && els.head.text.contains("739"))
  }

  // -- test_partition_md_with_umlauts (:269) — both encodings
  test("umlaut documents decode and end with the umlaut run") {
    for (name <- Seq("umlauts-utf8.md", "umlauts-non-utf8.md")) {
      val els = partitionFile(name)
      assert(els.nonEmpty, name)
      assert(els.last.text.endsWith("äöüß"), s"$name: ${els.last.text}")
    }
  }

  // -- test_partition_md_xml_processing_instruction (:276, :289, :302)
  test("xml/php processing instructions inside fences stay one element") {
    val xml = "```\n<?xml version=\"1.0\"?>\n<sparql xmlns=\"http://www.w3.org/2005/sparql-results#\">\n  <head></head>\n  <boolean>true</boolean>\n</sparql>\n```"
    assert(Partitioners.partitionMd(xml).size == 1)
    val xmlIndented = "```\n  <?xml version=\"1.0\"?>\n<sparql xmlns=\"http://www.w3.org/2005/sparql-results#\">\n  <head></head>\n  <boolean>true</boolean>\n</sparql>\n```"
    assert(Partitioners.partitionMd(xmlIndented).size == 1)
    val php = "```\n    <?php echo \"hello\"; ?>\n    ```"
    assert(Partitioners.partitionMd(php).size == 1)
  }

  // -- test_partition_fenced_code (:311)
  test("codeblock.md yields 2 titles and 3 code blocks with exact text") {
    val els = partitionFile("codeblock.md")
    assert(els.size == 5, els.map(e => (e.elementType, e.text.take(20))))
    assert(els(0).text == "HTML Example")
    val expectedHtml =
      """<!DOCTYPE html>
        |<html lang="en">
        |<head>
        |    <meta charset="UTF-8">
        |    <meta name="viewport" content="width=device-width, initial-scale=1.0">
        |    <title>Sample HTML</title>
        |</head>
        |<body>
        |    <h1>Hello, World!</h1>
        |    <p>This is a simple HTML example.</p>
        |</body>
        |</html>""".stripMargin
    assert(els(1).text == expectedHtml)
    assert(els(1).elementType.contains("CodeSnippet"))
    assert(els(2).text == "XML Example")
    val expectedXml =
      """<note>
        |    <to>Tove</to>
        |    <from>Jani</from>
        |    <heading>Reminder</heading>
        |    <body>Don't forget me this weekend!</body>
        |</note>""".stripMargin
    assert(els(3).text == expectedXml)
    assert(els(4).text == expectedXml)
  }

  // -- test_partition_md_tables_only_differs_from_default_for_code_fence (:386)
  test("a # inside a fence stays a CodeSnippet, not a Title") {
    val els = Partitioners.partitionMd("```bash\n# line\n```")
    assert(els.size == 1)
    assert(els.head.elementType.contains("CodeSnippet"))
    assert(els.head.text == "# line")
  }

  // -- test_partition_md_custom_extensions_parameter (:347) — default path only
  test("a fenced docker block is one code element with body preserved") {
    val text = "```bash\n# create the container\ndocker run -dt --name unstructured " +
      "downloads.unstructured.io/unstructured-io/unstructured:latest\n```"
    val els = Partitioners.partitionMd(text)
    assert(els.size == 1)
    assert(els.head.elementType.contains("CodeSnippet"))
    assert(els.head.text ==
      "# create the container\ndocker run -dt --name unstructured " +
      "downloads.unstructured.io/unstructured-io/unstructured:latest")
  }
}
