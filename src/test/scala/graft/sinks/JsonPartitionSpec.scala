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

  test("strict array splitter handles nested structures and escapes") {
    val objs = RawJson.splitStrictJsonArray(
      """[{"a": [1, 2, {"b": "x\"]y"}]}, {"c": null}, {"d": -1.5e3}]""")
    assert(objs.size == 3)
    assert(objs(1) == """{"c": null}""")
  }
}
