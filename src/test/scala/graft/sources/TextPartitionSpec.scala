package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuiteBase

/** `partition_text` behavior ports (`test_unstructured/partition/test_text.py`)
  * driven end-to-end through `AutoSource.partitionFiles` on the reference's own
  * example docs.
  *
  * File mapping (39 reference fns): the encoding matrices, error cases, JSON
  * round trip, hash-id vector and paragraph behaviors are pinned here; the
  * `from_file`/`from_bytes` variants collapse onto the same byte-array entry
  * (`partitionAuto`) this spec drives; `metadata_filename`/`last_modified`
  * preference chains are pinned in `MetadataArgsSpec` (shared `applyMetadata`
  * pass, not per-format); languages arg/per-element/UDHR cases in
  * `MetadataArgsSpec` + `LanguageDocsSweepSpec`; `unique_element_ids=True`
  * (UUID mode) in `ElementModelSpec`; `metadata.filetype` recording in
  * `AutoBehaviorSpec` (`recordedFiletype`); `add_chunking_strategy` equality
  * is the Chunker suite's partition-then-chunk contract (`ChunkerSpec`,
  * `BookGoldenSpec`). */
class TextPartitionSpec extends SparkSuiteBase {

  private def partitionDir(files: (String, Array[Byte])*): Seq[(String, String)] = {
    val dir = Files.createTempDirectory("graft-text").toString
    files.foreach { case (name, bytes) => Files.write(Paths.get(dir, name), bytes) }
    AutoSource.partitionFiles(spark, dir)
      .select("seq", "element_type", "text")
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
  }

  private def refDoc(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(s"/root/reference/example-docs/$name"))

  // -- test_partition_text_from_text (:178) + EXPECTED_OUTPUT (:20-27) --
  test("fake-text.txt partitions to the canonical six typed elements") {
    val out = partitionDir("fake-text.txt" -> refDoc("fake-text.txt"))
    assert(out == Seq(
      ("NarrativeText", "This is a test document to use for unit tests."),
      ("Address", "Doylestown, PA 18901"),
      ("Title", "Important points:"),
      ("ListItem", "Hamburgers are delicious"),
      ("ListItem", "Dogs are the best"),
      ("ListItem", "I love fuzzy blankets")))
  }

  private val CanonicalTexts = Seq(
    "This is a test document to use for unit tests.",
    "Doylestown, PA 18901",
    "Important points:",
    "Hamburgers are delicious",
    "Dogs are the best",
    "I love fuzzy blankets")

  // -- test_partition_text_from_filename (:55-71) — the explicit-encoding
  // matrix: (fake-text.txt, utf-8), (fake-text.txt, None),
  // (fake-text-utf-16-be.txt, utf-16-be) all yield EXPECTED_OUTPUT --
  test("explicit-encoding matrix decodes to the canonical paragraphs") {
    val cases = Seq(
      ("fake-text.txt", Some("utf-8")),
      ("fake-text.txt", None),
      ("fake-text-utf-16-be.txt", Some("utf-16-be")))
    cases.foreach { case (name, enc) =>
      val (ft, paras) = Partitioners.partitionAuto(name, refDoc(name), encoding = enc)
      assert(ft == FileType.Txt, s"$name routed as $ft")
      // raw paragraphs still carry their "- " bullets — the strip happens at
      // element construction (pinned by the canonical-six test above)
      assert(paras.map(_.text) == CanonicalTexts.map(t =>
        if (t.startsWith("Hamburgers") || t.startsWith("Dogs") ||
          t.startsWith("I love")) s"- $t" else t),
        s"$name with encoding=$enc")
    }
  }

  // -- test_partition_text_from_filename_default_encoding (:84-94) +
  // test_partition_text_from_bytes_file_default_encoding (:157-169): BOM'd
  // utf-16/utf-16-le/utf-32 fixtures detect and decode with NO encoding arg,
  // end-to-end through the distributed auto path --
  test("utf-16/utf-16-le/utf-32 fixtures partition to the canonical six " +
      "typed elements with no encoding argument") {
    Seq("fake-text-utf-16.txt", "fake-text-utf-16-le.txt", "fake-text-utf-32.txt")
      .foreach { name =>
        val out = partitionDir(name -> refDoc(name))
        assert(out.map(_._2) == CanonicalTexts, name)
        assert(out.map(_._1) == Seq("NarrativeText", "Address", "Title",
          "ListItem", "ListItem", "ListItem"), name)
      }
  }

  // -- test_partition_text_from_filename_raises_econding_error (:97-111):
  // (fake-text.txt, utf-16) → UnicodeDecodeError (strict decode failure);
  // (fake-text-utf-16-be.txt, utf-16) → UnicodeError (text-mode utf-16
  // demands a BOM) --
  test("a wrong explicit encoding raises instead of garbling") {
    // fake-text.txt as utf-16: CPython attempts the native-order decode
    // first, and the odd-length utf-8 bytes are malformed LE → the
    // UnicodeDecodeError branch, CharacterCodingException here
    intercept[java.nio.charset.CharacterCodingException] {
      Partitioners.partitionAuto("fake-text.txt", refDoc("fake-text.txt"),
        encoding = Some("utf-16"))
    }
    // the BE fixture decodes cleanly as LE garbage but carries no BOM → the
    // UnicodeError("UTF-16 stream does not start with BOM") branch
    val e2 = intercept[IllegalArgumentException] {
      Partitioners.partitionAuto("fake-text-utf-16-be.txt",
        refDoc("fake-text-utf-16-be.txt"), encoding = Some("utf-16"))
    }
    assert(e2.getMessage == "UTF-16 stream does not start with BOM")
  }

  // -- test_Text_element_assigns_id_hashes_that_are_unique_and_deterministic
  // (:374): partition_text(text="hello\nhello\nhello") assigns EXACTLY these
  // three digests (sha256("{filename}{text}{page}{seq}")[:32] with filename
  // and page both absent) --
  test("text-partition hash ids match the reference's exact hello digests") {
    val paras = TextSource.splitParagraphs("hello\nhello\nhello")
    assert(paras == Seq("hello", "hello", "hello"))
    val els = paras.zipWithIndex.map { case (t, i) =>
      graft.model.Element("", "Title", t, "d", i.toLong + 1,
        graft.model.ElementMetadata.empty)
    }
    val out = graft.operators.MetadataOps.assignHashIds(els)
    assert(out.map(_.element_id) == Seq(
      "8657c0ec31a4cfc822f6cd4a5684cafd",
      "72aefb4a12be063ad160931fdb380163",
      "ba8c1a216ca585aecdd365a72e6124f1"))
  }

  // -- test_partition_text_with_json (:393): elements from every encoding
  // fixture round-trip through the JSON wire format unchanged --
  test("partitioned elements round-trip through JSON for each encoding fixture") {
    val sp = spark
    val dir = Files.createTempDirectory("graft-text-json").toString
    Seq("fake-text.txt", "fake-text-utf-16-be.txt", "fake-text-utf-16.txt")
      .foreach(n => Files.write(Paths.get(dir, n), refDoc(n)))
    try {
      val els = org.apache.spark.sql.graft.PartitionPlan.toElements(
        org.apache.spark.sql.graft.PartitionPlan.partitionFiles(sp, dir))
      val before = els.collect().sortBy(e => (e.doc_id, e.seq)).toSeq
      assert(before.size == 18, s"3 fixtures x 6 elements, got ${before.size}")
      val json = "[" + graft.sinks.ElementSink.toNdjson(els)
        .collect().mkString(",") + "]"
      val back = graft.sinks.ElementSink.partitionJson(sp, json)
        .collect().sortBy(e => (e.doc_id, e.seq)).toSeq
      assert(back == before, "JSON round trip changed the elements")
    } finally graft.FsUtil.deleteRecursively(Paths.get(dir))
  }

  // -- test_partition_text_from_text_works_with_empty_string (:190) --
  test("empty text yields no elements") {
    assert(TextSource.splitParagraphs("").isEmpty)
    assert(partitionDir("empty.txt" -> Array.emptyByteArray).isEmpty)
  }

  // -- test_partition_text_captures_everything_even_with_linebreaks (:208) --
  test("indented linebreak memo still classifies Title and Address") {
    val text = "\n    VERY IMPORTANT MEMO\n    DOYLESTOWN, PA 18901\n    "
    val out = partitionDir("memo.txt" -> text.getBytes("UTF-8"))
    assert(out == Seq(
      ("Title", "VERY IMPORTANT MEMO"),
      ("Address", "DOYLESTOWN, PA 18901")))
  }

  // -- test_partition_text_splits_long_text (:241) --
  test("norwich-city.txt: first and last elements bracket the document") {
    val out = partitionDir("norwich-city.txt" -> refDoc("norwich-city.txt"))
    assert(out.nonEmpty)
    assert(out.head._2.startsWith("Iwan Roberts"))
    assert(out.last._2.endsWith("External links"))
  }

  // -- test_partition_text_doesnt_get_page_breaks (:248) --
  test("a dash run is one element and never a ListItem") {
    val out = partitionDir("dashes.txt" -> "--------------------".getBytes("UTF-8"))
    assert(out.size == 1)
    assert(out.head._2 == "--------------------")
    assert(out.head._1 != "ListItem")
  }

  // -- test_partition_text_groups_broken_paragraphs (:222) --
  test("group_broken_paragraphs rejoins line-broken prose before classification") {
    val text = "The big brown fox\nwas walking down the lane.\n\n" +
      "At the end of the lane,\nthe fox met a bear."
    val grouped = TextSource.groupBrokenParagraphs(text)
    val paras = TextSource.splitParagraphs(grouped)
    assert(paras == Seq(
      "The big brown fox was walking down the lane.",
      "At the end of the lane, the fox met a bear."))
  }
}
