package graft.sinks

import graft.SparkSuiteBase
import graft.model.{Element, ElementMetadata}

/**
 * Behavior port of `test_unstructured/partition/test_json.py` and
 * `test_ndjson.py`: the validated rehydrate entry points. The
 * file-vs-path-vs-text and last_modified plumbing cases collapse into the
 * single text entry point; the validation and round-trip semantics are pinned.
 */
class JsonPartitionSpec extends SparkSuiteBase {

  private def els: Seq[Element] = Seq(
    Element("e1", "NarrativeText", "This is a test document to use for unit tests.",
      "d", 1, ElementMetadata(filename = Some("fake-text.txt"))),
    Element("e2", "Address", "Doylestown, PA 18901", "d", 2,
      ElementMetadata(filename = Some("fake-text.txt"))),
    Element("e3", "Title", "Important points:", "d", 3,
      ElementMetadata(filename = Some("fake-text.txt"))))

  private def roundTripArray(elements: Seq[Element]): Seq[Element] = {
    val sp = spark
    import sp.implicits._
    val lines = ElementSink.toNdjson(elements.toDS()).collect()
    val arrayText = lines.mkString("[\n  ", ",\n  ", "\n]")
    ElementSink.partitionJson(sp, arrayText).collect().toSeq.sortBy(_.seq)
  }

  test("elements survive a JSON array round trip (test_partition_json_from_filename)") {
    val back = roundTripArray(els)
    assert(back.map(e => (e.`type`, e.text)) == els.map(e => (e.`type`, e.text)))
    assert(back.map(_.element_id) == els.map(_.element_id))
    assert(back.forall(_.metadata.filename.contains("fake-text.txt")))
  }

  // -- test_partition_json_from_filename/from_file/from_text parametrize over
  // the reference's `test_files` (fake-text.txt, fake-html.html,
  // eml/fake-email.eml): real docs partition -> JSON array -> rehydrate to
  // the identical (type, text) stream
  test("real example docs survive the JSON round trip (test_files sweep)") {
    val sp = spark
    import sp.implicits._
    import java.nio.file.{Files, Paths}
    for (name <- Seq("fake-text.txt", "fake-html.html", "eml/fake-email.eml")) {
      val raw = Files.readAllBytes(
        Paths.get("/root/reference/example-docs/" + name))
      val (_, ps) = graft.sources.Partitioners
        .partitionAuto(name.split('/').last, raw)
      assert(ps.nonEmpty, name)
      // resolve untyped paragraphs through the same classifier cascade the
      // DataFrame pipeline applies
      val typed = {
        val df = ps.zipWithIndex
          .map { case (p, i) => (i, p.elementType.orNull, p.text, p.classifier) }
          .toDF("i", "raw_type", "text", "classifier")
        val derived = graft.sources.HtmlSource.classifierCascade(
          org.apache.spark.sql.functions.col("classifier"),
          org.apache.spark.sql.functions.col("text"))
        df.select(org.apache.spark.sql.functions.col("i"),
            org.apache.spark.sql.functions.coalesce(
              org.apache.spark.sql.functions.col("raw_type"), derived).as("t"),
            org.apache.spark.sql.functions.col("text"))
          .orderBy("i").collect().toSeq
          .map(r => (r.getString(1), r.getString(2)))
          .filter(_._1 != null)
      }
      val els = typed.zipWithIndex.map { case ((t, txt), i) =>
        Element(s"e$i", t, txt, name, i.toLong,
          ElementMetadata(filename = Some(name.split('/').last)))
      }
      val lines = ElementSink.toNdjson(els.toDS()).collect()
      val arrayText = lines.mkString("[\n  ", ",\n  ", "\n]")
      val back = ElementSink.partitionJson(sp, arrayText)
        .collect().toSeq.sortBy(_.seq)
      assert(back.map(e => (e.`type`, e.text)) == els.map(e => (e.`type`, e.text)),
        name)
      assert(back.forall(_.metadata.filename.contains(name.split('/').last)), name)
    }
  }

  test("empty string partitions to no elements") {
    assert(ElementSink.partitionJson(spark, "").count() == 0)
    assert(ElementSink.partitionJson(spark, "   ").count() == 0)
  }

  test("empty list partitions to no elements") {
    assert(ElementSink.partitionJson(spark, "[]").count() == 0)
  }

  test("a bare object is unprocessable ({} and {\"hi\": \"there\"})") {
    intercept[IllegalArgumentException] {
      ElementSink.partitionJson(spark, "{}")
    }
    intercept[IllegalArgumentException] {
      ElementSink.partitionJson(spark, """{"hi": "there"}""")
    }
  }

  test("an array without recognizable element dicts is unprocessable") {
    intercept[IllegalArgumentException] {
      ElementSink.partitionJson(spark, """[{"invalid": "schema"}]""")
    }
  }

  test("malformed JSON raises (trailing garbage)") {
    intercept[IllegalArgumentException] {
      ElementSink.partitionJson(spark, """[{"hi": "there"}]]""")
    }
    intercept[IllegalArgumentException] {
      ElementSink.partitionJson(spark, """[{"type": "Title", "text": "x"""")
    }
  }

  test("dicts with unknown type are dropped, known ones survive") {
    val sp = spark
    import sp.implicits._
    val lines = ElementSink.toNdjson(els.take(1).toDS()).collect()
    val mixed = "[" + lines.head + """,{"type": "NotAThing", "text": "x"}]"""
    val back = ElementSink.partitionJson(sp, mixed).collect()
    assert(back.length == 1 && back.head.`type` == "NarrativeText")
  }

  test("ndjson text entry: one element per line, blank lines skipped") {
    val sp = spark
    import sp.implicits._
    val lines = ElementSink.toNdjson(els.toDS()).collect()
    val text = lines.mkString("\n") + "\n\n"
    val back = ElementSink.partitionNdjsonText(sp, text).collect().sortBy(_.seq)
    assert(back.map(_.`type`).toSeq == Seq("NarrativeText", "Address", "Title"))
  }

  test("ndjson with no recognizable elements raises") {
    intercept[IllegalArgumentException] {
      ElementSink.partitionNdjsonText(spark, """{"invalid": "schema"}""")
    }
  }

  // -- test_partition_ndjson_works_with_empty_string / _fails_with_empty_item /
  // _fails_with_empty_list (test_ndjson.py:188-199)
  test("ndjson: empty text yields nothing; '{}' and '[]' lines raise") {
    assert(ElementSink.partitionNdjsonText(spark, "").count() == 0)
    intercept[IllegalArgumentException] {
      ElementSink.partitionNdjsonText(spark, "{}")
    }
    intercept[IllegalArgumentException] {
      ElementSink.partitionNdjsonText(spark, "[]")
    }
  }

  test("strict array splitter handles nested structures and escapes") {
    val objs = RawJson.splitStrictJsonArray(
      """[{"a": [1, 2, {"b": "x\"]y"}]}, {"c": null}, {"d": -1.5e3}]""")
    assert(objs.size == 3)
    assert(objs(1) == """{"c": null}""")
  }
}
