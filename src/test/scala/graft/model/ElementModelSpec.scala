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

  // -- minify helper used by the key_value_pairs wire path
  test("minifyJson strips whitespace outside strings only") {
    assert(ElementJson.minifyJson("{\n  \"a b\": [1, 2],\n  \"c\": \"x  y\"\n}") ==
      """{"a b":[1,2],"c":"x  y"}""")
    assert(ElementJson.minifyJson("""{"esc":"a\" b"}""") == """{"esc":"a\" b"}""")
  }
}
