package graft.sinks

import java.nio.file.Files

import graft.SparkSuiteBase
import graft.model.{Element, ElementMetadata, ElementType}
import graft.operators.{Chunker, ChunkingOptions}

/** Wire-format round-trip and staging-operator tests. */
class ElementSinkSpec extends SparkSuiteBase {

  private def sampleElements: Seq[Element] = Seq(
    Element("id1", ElementType.Title, "A Great Day", "d1", 1,
      ElementMetadata(filename = Some("a.txt"), languages = Some(Seq("en")),
        page_number = Some(1))),
    Element("id2", ElementType.NarrativeText, "Quote \"x\" and\nnewline", "d1", 2,
      ElementMetadata(parent_id = Some("id1"))),
    Element("id3", ElementType.Table, "Heading Cell", "d1", 3,
      ElementMetadata(text_as_html = Some("<table><tr><td>Heading Cell</td></tr></table>"))),
    Element("id4", ElementType.ListItem, "item one", "d2", 1,
      ElementMetadata(is_continuation = Some(true)),
      embeddings = Some(Seq(0.5f, -1.25f))))

  test("ndjson write -> read -> write is a fixpoint") {
    import spark.implicits._
    val ds = sampleElements.toDS()
    val dir = Files.createTempDirectory("graft-ndjson").toString
    ElementSink.writeNdjson(ds, dir)
    val back = ElementSink.readNdjson(spark, dir)
    val lines1 = ElementSink.toNdjson(back).collect().sorted
    val lines0 = sampleElements.map(ElementJson.elementJson).sorted
    assert(lines1.toSeq == lines0)
    // field-level fidelity
    val byId = back.collect().map(e => e.element_id -> e).toMap
    assert(byId("id2").text == "Quote \"x\" and\nnewline")
    assert(byId("id2").metadata.parent_id.contains("id1"))
    assert(byId("id3").metadata.text_as_html.get.startsWith("<table>"))
    assert(byId("id4").embeddings.contains(Seq(0.5f, -1.25f)))
    assert(byId("id1").metadata.page_number.contains(1))
    // sparse: absent fields are None after rehydrate
    assert(byId("id1").metadata.parent_id.isEmpty)
    assert(byId("id1").metadata.is_continuation.isEmpty)
  }

  // r17: the wire under astral + control content. Python json.dumps
  // (ensure_ascii=False) writes \b \f shorthands, \uXXXX for other C0
  // controls, DEL and astral RAW (4-byte UTF-8 via the surrogate pair) —
  // esc must match byte-for-byte and the parser must invert it.
  test("astral and control chars survive the ndjson wire and codec byte-exactly") {
    import spark.implicits._
    val gnarly = "crab 🦀 bell\b feed\f del unit " +
      "clef 𝄞 quote” nbsp end"
    assert(ElementJson.esc(gnarly) ==
      "crab 🦀 bell\\b feed\\f del unit\\u0001 " +
        "clef 𝄞 quote” nbsp end")
    val els = Seq(
      Element("a1", ElementType.NarrativeText, gnarly, "d9", 1,
        ElementMetadata(filename = Some("emoji-🦀.txt"),
          link_texts = Some(Seq("😀 link")))),
      Element("a2", ElementType.Title, "plain", "d9", 2, ElementMetadata()))
    val dir = Files.createTempDirectory("graft-astral").toString
    ElementSink.writeNdjson(els.toDS(), dir)
    val back = ElementSink.readNdjson(spark, dir).collect().sortBy(_.element_id)
    assert(back(0).text == gnarly)
    assert(back(0).metadata.filename.contains("emoji-🦀.txt"))
    assert(back(0).metadata.link_texts.contains(Seq("😀 link")))
    // re-serialization is a fixpoint (byte-identical lines)
    assert(els.map(ElementJson.elementJson).sorted.toSeq ==
      ElementSink.toNdjson(back.toSeq.toDS()).collect().sorted.toSeq)
    // the zlib orig_elements codec carries the same bytes
    val enc = ElementJson.encodeOrigElements(els)
    assert(ElementJson.decodeOrigElementsJson(enc).contains("🦀"))
  }

  test("sparse json omits unpopulated fields") {
    val j = ElementJson.elementJson(sampleElements.head)
    assert(!j.contains("parent_id") && !j.contains("is_continuation"))
    assert(j.contains("\"filename\":\"a.txt\""))
    assert(j.contains("\"languages\":[\"en\"]"))
  }

  test("filterElementTypes include xor exclude") {
    import spark.implicits._
    val ds = sampleElements.toDS()
    assert(ElementSink.filterElementTypes(ds, include = Seq("Title"))
      .collect().map(_.element_id).toSeq == Seq("id1"))
    assert(ElementSink.filterElementTypes(ds, exclude = Seq("Title"))
      .collect().map(_.element_id).sorted.toSeq == Seq("id2", "id3", "id4"))
    intercept[IllegalArgumentException] {
      ElementSink.filterElementTypes(ds, include = Seq("Title"), exclude = Seq("Table"))
    }
  }

  test("markdown render: title heading, table html, plain text") {
    import spark.implicits._
    val md = ElementSink.elementsToMd(sampleElements.toDS())
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(md("d1") ==
      "# A Great Day\nQuote \"x\" and\nnewline\n<table><tr><td>Heading Cell</td></tr></table>")
    assert(md("d2") == "item one")
  }

  test("convertToText joins non-empty texts per doc") {
    import spark.implicits._
    val withEmpty = sampleElements :+
      Element("id5", ElementType.PageBreak, "", "d2", 2, ElementMetadata())
    val txt = ElementSink.convertToText(withEmpty.toDS())
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(txt("d2") == "item one")
  }

  test("orig_elements codec survives the Dataset chunking path") {
    import spark.implicits._
    val els = Seq(
      Element("", ElementType.Title, "T1", "docA", 1),
      Element("", ElementType.NarrativeText, "Body text", "docA", 2)).toDS()
    val chunks = Chunker.chunkByTitle(els, ChunkingOptions()).collect()
    assert(chunks.length == 1)
    val decoded = ElementJson.decodeOrigElementsJson(chunks(0).metadata.orig_elements.get)
    assert(decoded.contains("\"text\":\"T1\"") && decoded.contains("\"text\":\"Body text\""))
  }

  // -- test_elements.py:769-780 test_formskeysvalues_reads_saves --
  test("FormKeysValues round-trips its recursive key_value_pairs verbatim") {
    import spark.implicits._
    val kv = """[{"key":{"text":"MOCK KEY"},"value":{"text":"MOCK VALUE"},"confidence":0.98}]"""
    val els = Seq(Element("form-1", ElementType.FormKeysValues, "", "d1", 1,
      ElementMetadata(page_number = Some(1), key_value_pairs = Some(kv))))
    val line = ElementJson.elementJson(els.head)
    // raw JSON array inline, not a quoted string
    assert(line.contains("\"key_value_pairs\":[{\"key\""))
    val back = ElementSink.parseNdjson(spark, Seq(line)).collect()
    assert(back.head.metadata.key_value_pairs.contains(kv))
    // write -> read -> write is a fixpoint
    assert(ElementJson.elementJson(back.head) == line)
  }

  test("reference form.json rehydrates FormKeysValues like partition_json") {
    val path = "/root/reference/example-docs/test_evaluate_files/unstructured_output/form.json"
    import org.apache.spark.sql.{functions => F}
    val first = ElementSink.fromWire(
      ElementSink.readWireJson(spark, path, multiLine = true)
        .withColumn("doc_id", F.coalesce(F.col("doc_id"), F.lit("form.json")))
        .withColumn("seq", F.coalesce(F.col("seq"), F.lit(0L)))).collect()
    assert(first.length == 1)
    val e = first.head
    assert(e.`type` == ElementType.FormKeysValues)
    val kv = e.metadata.key_value_pairs.get
    assert(kv.contains("MOCK KEY") && kv.contains("MOCK VALUE"))
    // serialize and re-read: as_read == as_read_2. The writer minifies the
    // pretty reference text, so equality holds at the serialized level (the
    // reference compares parsed objects — whitespace-insensitive).
    val again = ElementSink.parseNdjson(spark,
      Seq(ElementJson.elementJson(e))).collect().head
    assert(again.metadata.key_value_pairs.get.contains("MOCK VALUE"))
    assert(ElementJson.elementJson(again.copy(doc_id = e.doc_id, seq = e.seq)) ==
      ElementJson.elementJson(e))
  }

  test("simple.json rehydrates preserving its original elements (auto route)") {
    // test_auto_partition_json_from_file_preserves_original_elements: a
    // partition() over an elements-payload JSON must return the ORIGINAL
    // elements, not re-partitioned text
    val path = "/root/reference/example-docs/simple.json"
    import org.apache.spark.sql.{functions => F}
    val els = ElementSink.fromWire(
      ElementSink.readWireJson(spark, path, multiLine = true)
        .withColumn("doc_id", F.coalesce(F.col("doc_id"), F.lit("simple.json")))
        .withColumn("seq",
          F.row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(F.monotonically_increasing_id())).cast("long")))
      .collect().toSeq
    assert(els.nonEmpty)
    // ids, types, and texts come through verbatim from the payload
    assert(els.head.element_id == "a06d2d9e65212d4aa955c3ab32950ffa")
    assert(els.forall(e => ElementSink.KnownWireTypes.contains(e.`type`)))
    assert(els.forall(_.metadata.filename.contains("simple.docx")))
    // serialize → re-read is a fixpoint on every element
    els.foreach { e =>
      val again = ElementSink.parseNdjson(spark,
        Seq(ElementJson.elementJson(e))).collect().head
      assert(ElementJson.elementJson(again.copy(doc_id = e.doc_id, seq = e.seq))
        == ElementJson.elementJson(e))
    }
  }
}
