package graft.sinks

import graft.SparkSuiteBase
import graft.model.{Element, ElementMetadata, ElementType}
import org.apache.spark.sql.Row

/**
 * Per-tool staging reshape ports (`test_unstructured/staging/test_label_studio
 * .py`, `test_prodigy.py`, `test_huggingface.py`, `test_datasaur.py`,
 * `test_weaviate.py`, `test_label_box.py`, `test_baseplate.py`).
 */
class StagingToolsSpec extends SparkSuiteBase {

  private def twoElements = Seq(
    Element("id-t", ElementType.Title, "Title 1", "d", 1),
    Element("id-n", ElementType.NarrativeText, "Narrative 1", "d", 2))

  // -- test_label_studio.py:15-33 ---------------------------------------------

  test("label studio tasks carry text and ref_id under data") {
    import spark.implicits._
    val rows = Staging.stageForLabelStudio(twoElements.toDS()).collect()
    val data0 = rows(0).getStruct(0)
    assert(data0.getAs[String]("text") == "Title 1")
    assert(data0.getAs[String]("ref_id") == "id-t")
    val data1 = rows(1).getStruct(0)
    assert(data1.getAs[String]("text") == "Narrative 1")
    assert(data1.getAs[String]("ref_id") == "id-n")
  }

  test("label studio text_field and id_field are configurable") {
    import spark.implicits._
    val rows = Staging.stageForLabelStudio(twoElements.toDS(),
      textField = "random_text", idField = "random_id").collect()
    val data = rows(0).getStruct(0)
    assert(data.getAs[String]("random_text") == "Title 1")
    assert(data.getAs[String]("random_id") == "id-t")
  }

  // -- test_prodigy.py --------------------------------------------------------

  test("prodigy rows pair text with a metadata id") {
    import spark.implicits._
    val rows = Staging.stageForProdigy(twoElements.toDS()).collect()
    assert(rows(0).getAs[String]("text") == "Title 1")
    assert(rows(0).getAs[Row]("meta").getAs[String]("id") == "id-t")
  }

  test("prodigy csv form is (text, id)") {
    import spark.implicits._
    val df = Staging.stageCsvForProdigy(twoElements.toDS())
    assert(df.columns.toSeq == Seq("text", "id"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "Title 1" && rows(0).getString(1) == "id-t")
  }

  // -- test_huggingface.py ----------------------------------------------------

  test("chunk_by_attention_window packs whitespace tokens into the window") {
    val text = ("hello " * 20 + "there " * 20).trim
    val chunks = Staging.chunkByAttentionWindow(text, maxInputSize = 20, buffer = 10)
    val hello = ("hello " * 10).trim
    val there = ("there " * 10).trim
    assert(chunks == Seq(hello, hello, there, there))
  }

  test("chunk_by_attention_window with no buffer uses the full window") {
    val text = ("hello " * 20 + "there " * 20).trim
    val chunks = Staging.chunkByAttentionWindow(text, maxInputSize = 20, buffer = 0)
    assert(chunks == Seq(("hello " * 20).trim, ("there " * 20).trim))
  }

  test("chunk_by_attention_window raises on a negative buffer") {
    intercept[IllegalArgumentException] {
      Staging.chunkByAttentionWindow("hello there", maxInputSize = 20, buffer = -10)
    }
  }

  // -- test_chunk_by_attention_window (:34) — the reference's exact vectors,
  // untrimmed input so the trailing empty segment exercises the final-flush path
  test("chunk_by_attention_window reference vectors with a trailing separator") {
    val text = "hello " * 20 + "there " * 20
    val hello = ("hello " * 10).trim
    val there = ("there " * 10).trim
    assert(Staging.chunkByAttentionWindow(text, maxInputSize = 20, buffer = 10) ==
      Seq(hello, hello, there, there))
    assert(Staging.chunkByAttentionWindow(text, maxInputSize = 20, buffer = 0) ==
      Seq(("hello " * 20).trim, ("there " * 20).trim))
  }

  // -- test_chunk_by_attention_window_raises_if_buffer_too_big (:61)
  test("chunk_by_attention_window raises when the buffer exceeds the window") {
    intercept[IllegalArgumentException] {
      Staging.chunkByAttentionWindow("hello " * 20, maxInputSize = 20, buffer = 40)
    }
  }

  // -- test_chunk_by_attention_window_raises_if_chunk_exceeds_window (:69)
  test("chunk_by_attention_window raises when one segment exceeds the window") {
    val text = "hello " * 100 + "."
    intercept[IllegalArgumentException] {
      Staging.chunkByAttentionWindow(text, maxInputSize = 20, buffer = 0,
        splitFunction = _.split("\\.", -1).toSeq)
    }
  }

  test("stage_for_transformers chunks long text and passes short elements") {
    import spark.implicits._
    val els = Seq(
      Element("t", ElementType.Title, "Here is a wonderful story", "d", 1),
      Element("x", ElementType.UncategorizedText,
        ("hello " * 20 + "there " * 20).trim, "d", 2))
    val out = Staging.stageForTransformers(els.toDS(), maxInputSize = 20, buffer = 10)
      .collect().toSeq
    val hello = ("hello " * 10).trim
    val there = ("there " * 10).trim
    assert(out.map(_.text) == Seq("Here is a wonderful story",
      hello, hello, there, there))
    // chunks keep their source element's identity fields
    assert(out.tail.forall(_.element_id == "x"))
  }

  // -- test_weaviate_schema_is_valid (test_weaviate.py:58) --------------------
  test("weaviate class schema lists text+category first and maps field types") {
    val (className, props) = Staging.createUnstructuredWeaviateClass()
    assert(className == "UnstructuredDocument")
    assert(props.take(2) == Seq("text" -> Seq("text"), "category" -> Seq("text")))
    val byName = props.toMap
    // excluded metadata keys never become properties (weaviate.py:11-20)
    Staging.WeaviateExcludeMetadataKeys.foreach(k => assert(!byName.contains(k), k))
    assert(byName("page_number") == Seq("int"))
    assert(byName("filename") == Seq("text"))
    assert(byName("languages") == Seq("text"))
    assert(byName("segment_start_seconds") == Seq("number"))
    // every property has exactly one dataType and a nonempty name
    assert(props.forall { case (n, dt) => n.nonEmpty && dt.size == 1 })
    assert(props.map(_._1).distinct.size == props.size)
  }

  // -- test_datasaur.py -------------------------------------------------------

  test("datasaur rows default to empty entity lists") {
    import spark.implicits._
    val els = Seq(
      Element("1", ElementType.UncategorizedText, "Text 1", "d", 1),
      Element("2", ElementType.UncategorizedText, "Text 2", "d", 2),
      Element("3", ElementType.UncategorizedText, "Text 3", "d", 3))
    val rows = Staging.stageForDatasaur(els.toDS()).collect()
    assert(rows.map(_.getAs[String]("text")).toSeq == Seq("Text 1", "Text 2", "Text 3"))
    assert(rows.forall(_.getAs[scala.collection.Seq[Row]]("entities").isEmpty))
  }

  test("datasaur accepts a caller-supplied entity column") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val els = Seq(Element("1", ElementType.UncategorizedText, "I'm Matt and", "d", 1))
    val ents = when(col("text").contains("Matt"),
      array(struct(lit("Matt").as("text"), lit("PER").as("type"),
        lit(4).as("start_idx"), lit(8).as("end_idx"))))
      .otherwise(array().cast(
        "array<struct<text:string,type:string,start_idx:int,end_idx:int>>"))
    val rows = Staging.stageForDatasaur(els.toDS(), Some(ents)).collect()
    val es = rows(0).getAs[scala.collection.Seq[Row]]("entities")
    assert(es.size == 1 && es.head.getAs[String]("text") == "Matt")
  }

  // -- test_weaviate.py:22-53 -------------------------------------------------

  test("weaviate properties carry flattened metadata + category") {
    import spark.implicits._
    val els = Seq(Element("015301d4", ElementType.Title,
      "LayoutParser: A Unified Toolkit", "d", 1,
      ElementMetadata(filename = Some("layout-parser-paper-fast.pdf"),
        filetype = Some("application/json"), page_number = Some(1))))
    val row = Staging.stageForWeaviate(els.toDS()).collect().head
    assert(row.getAs[String]("filename") == "layout-parser-paper-fast.pdf")
    assert(row.getAs[String]("filetype") == "application/json")
    assert(row.getAs[Int]("page_number") == 1)
    assert(row.getAs[String]("text") == "LayoutParser: A Unified Toolkit")
    assert(row.getAs[String]("category") == "Title")
  }

  // -- test_label_box.py / test_baseplate.py ----------------------------------

  test("label box config rows address per-element text objects") {
    import spark.implicits._
    val rows = Staging.stageForLabelBox(twoElements.toDS(),
      "https://storage.example.com/bucket/").collect()
    assert(rows(0).getAs[String]("data") ==
      "https://storage.example.com/bucket/id-t.txt")
    assert(rows(0).getAs[String]("externalId") == "id-t")
    assert(rows(0).getAs[scala.collection.Seq[Row]]("attachments").isEmpty)
  }

  test("baseplate rows-of-columns carry text/type/element_id") {
    import spark.implicits._
    val row = Staging.stageForBaseplate(twoElements.toDS()).collect().head
    val data = row.getAs[Map[String, String]]("data")
    assert(data("text") == "Title 1")
    assert(data("type") == "Title")
    assert(data("element_id") == "id-t")
  }
}
