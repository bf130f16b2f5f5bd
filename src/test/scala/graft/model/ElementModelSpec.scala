package graft.model

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MetadataOps
import graft.sinks.ElementJson

/** Element-model behavior ports (`test_unstructured/documents/test_elements.py`
  * — the `DescribeElementMetadata` filename cases and serialization edges). */
class ElementModelSpec extends AnyFunSuite {

  // -- it_accommodates_either_a_pathlib_Path_or_str_for_its_filename_arg (:256)
  test("a path-ish filename splits into file_directory and basename") {
    assert(ElementMetadata.splitFilename("documents/docx/memos/memo-2023-11-10.docx") ==
      (Some("documents/docx/memos"), "memo-2023-11-10.docx"))
  }

  // -- and_it_leaves_file_directory_None_when_not_specified_and_filename_is_not_a_path (:271)
  test("a bare filename leaves file_directory unset") {
    assert(ElementMetadata.splitFilename("memo.docx") == (None, "memo.docx"))
  }

  // -- it_leaves_both_filename_and_file_directory_None_when_neither_is_specified (:264)
  test("apply_metadata stamps split filename across a document") {
    val els = Seq(
      Element("a", ElementType.Title, "Heading", "d", 1),
      Element("b", ElementType.NarrativeText, "Body", "d", 2))
    val out = MetadataOps.applyMetadataDoc(els,
      filename = Some("documents/docx/memo-2023-11-11.docx"))
    out.foreach { e =>
      assert(e.metadata.filename.contains("memo-2023-11-11.docx"))
      assert(e.metadata.file_directory.contains("documents/docx"))
    }
    val bare = MetadataOps.applyMetadataDoc(els, filename = Some("memo.docx"))
    bare.foreach { e =>
      assert(e.metadata.filename.contains("memo.docx"))
      assert(e.metadata.file_directory.isEmpty)
    }
    val none = MetadataOps.applyMetadataDoc(els)
    none.foreach { e =>
      assert(e.metadata.filename.isEmpty && e.metadata.file_directory.isEmpty)
    }
  }

  // -- test_non_text_elements_are_serializable_to_text (:91)
  test("non-text elements serialize with empty text") {
    val checkbox = Element("cb", ElementType.CheckBox, "", "d", 1)
    val json = ElementJson.elementJson(checkbox)
    assert(json.contains("\"type\":\"CheckBox\""))
    assert(json.contains("\"text\":\"\""))
  }

  // -- it_can_update_itself_from_another_instance (:534): dict.update semantics
  test("updateFrom overwrites populated fields and keeps the rest") {
    val meta = ElementMetadata(category_depth = Some(1), page_number = Some(1))
    val other = ElementMetadata(file_directory = Some("tmp/"), page_number = Some(2))
    val merged = meta.updateFrom(other)
    // known fields present on self but not other are unchanged
    assert(merged.category_depth.contains(1))
    // known fields present on other but not self are added
    assert(merged.file_directory.contains("tmp/"))
    // known fields present on both are updated to other's value
    assert(merged.page_number.contains(2))
    // other is unchanged (immutably: the inputs are untouched)
    assert(other.category_depth.isEmpty && meta.page_number.contains(1))
  }

  // -- it_can_serialize_itself_to_a_dict (:337): sparse — only populated fields
  test("metadata serializes sparsely to its wire dict") {
    val meta = ElementMetadata(
      category_depth = Some(1),
      file_directory = Some("tmp/"),
      page_number = Some(2),
      text_as_html = Some("<table></table>"),
      url = Some("https://google.com"))
    assert(ElementJson.metadataJson(meta) ==
      """{"file_directory":"tmp/","url":"https://google.com","page_number":2,""" +
      """"category_depth":1,"text_as_html":"<table></table>"}""")
    assert(ElementJson.metadataJson(ElementMetadata.empty) == "{}")
  }

  // -- and_it_serializes_a_coordinates_sub_object_to_a_dict_when_it_is_present (:353)
  test("coordinates sub-object serializes to a nested dict") {
    val meta = ElementMetadata(
      category_depth = Some(1),
      coordinates = Some(Coordinates(
        points = Seq(Point(2, 2), Point(1, 4), Point(3, 4), Point(3, 2)),
        system = Some("RelativeCoordinateSystem"),
        layout_width = Some(1), layout_height = Some(1))),
      page_number = Some(2))
    assert(ElementJson.metadataJson(meta) ==
      """{"page_number":2,"coordinates":{"points":[[2.0,2.0],[1.0,4.0],[3.0,4.0],""" +
      """[3.0,2.0]],"system":"RelativeCoordinateSystem","layout_width":1.0,""" +
      """"layout_height":1.0},"category_depth":1}""")
  }

  // -- and_it_serializes_a_data_source_sub_object_to_a_dict_when_it_is_present (:373)
  test("data_source sub-object serializes to a nested dict") {
    val meta = ElementMetadata(
      category_depth = Some(1),
      data_source = Some(DataSource(
        url = Some("https://www.nih.gov/about-nih/who-we-are/nih-director"),
        date_created = Some("2023-11-09"))),
      page_number = Some(2))
    assert(ElementJson.metadataJson(meta) ==
      """{"data_source":{"url":"https://www.nih.gov/about-nih/who-we-are/nih-director",""" +
      """"date_created":"2023-11-09"},"page_number":2,"category_depth":1}""")
  }

  // -- and_it_round_trips_an_enrichment_origins_dict_of_lists_through_a_dict (:391)
  test("enrichment_origins serializes as a dict of record-dict lists") {
    val meta = ElementMetadata(enrichment_origins = Some(Map(
      "text" -> Seq(
        Map("type" -> "enrichment_foo", "provider" -> "provider_a", "model" -> "model_x"),
        Map("type" -> "enrichment_bar", "provider" -> "provider_a", "model" -> "model_x")),
      "embeddings" -> Seq(
        Map("type" -> "enrichment_baz", "provider" -> "provider_b", "model" -> "model_y")))))
    // entries stay record dicts on the wire (elements.py:175), list order kept,
    // keys canonically sorted
    assert(ElementJson.metadataJson(meta) ==
      """{"enrichment_origins":{"embeddings":[{"model":"model_y","provider":"provider_b",""" +
      """"type":"enrichment_baz"}],"text":[{"model":"model_x","provider":"provider_a",""" +
      """"type":"enrichment_foo"},{"model":"model_x","provider":"provider_a",""" +
      """"type":"enrichment_bar"}]}}""")
  }

  // -- and_it_serializes_an_orig_elements_sub_object_to_base64_when_it_is_present (:408)
  test("orig_elements round-trips through base64-gzipped JSON") {
    val els = Seq(
      Element("id1", ElementType.Title, "Lorem", "d", 1),
      Element("id2", ElementType.NarrativeText, "Lorem Ipsum", "d", 2))
    val b64 = ElementJson.encodeOrigElements(els)
    // a plain-ascii base64 string, not raw JSON
    assert(b64.matches("[A-Za-z0-9+/=]+"))
    val restored = ElementJson.decodeOrigElementsJson(b64)
    assert(restored.contains("\"text\":\"Lorem\"") &&
      restored.contains("\"text\":\"Lorem Ipsum\""))
  }

  // -- it_is_not_equal_when_a_list_field_contains_different_items (:636)
  test("metadata equality is structural over list fields") {
    def m(langs: Seq[String]) = ElementMetadata(languages = Some(langs))
    assert(m(Seq("eng", "spa")) == m(Seq("eng", "spa")))
    assert(m(Seq("eng", "spa")) != m(Seq("eng", "deu")))
  }

  // -- minify helper used by the key_value_pairs wire path
  test("minifyJson strips whitespace outside strings only") {
    assert(ElementJson.minifyJson("{\n  \"a b\": [1, 2],\n  \"c\": \"x  y\"\n}") ==
      """{"a b":[1,2],"c":"x  y"}""")
    assert(ElementJson.minifyJson("""{"esc":"a\" b"}""") == """{"esc":"a\" b"}""")
  }
}
