package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Element, ElementType}

/**
 * The common partitioner kwargs every reference `partition_*` signature takes
 * (`metadata_last_modified`, `languages`, `detect_language_per_element`) as
 * they flow through the `apply_metadata` chain. Ported behaviors from
 * `test_unstructured/partition/common/test_lang.py` (`apply_lang_metadata`
 * cases) and the per-family kwarg tests repeated in
 * `test_unstructured/partition/test_md.py:160-259`, `test_text.py`, etc.
 */
class MetadataArgsSpec extends AnyFunSuite {

  private def el(seq: Int, text: String, tpe: String = ElementType.NarrativeText,
      attached: Option[String] = None): Element =
    Element("", tpe, text, "d1", seq,
      metadata = graft.model.ElementMetadata(attached_to_filename = attached))

  private val english = "The quick brown fox jumps over the lazy dog every single morning."
  private val spanish = "El perro grande come mucha comida porque tiene hambre cada mañana y tarde."
  private val korean = "안녕하세요 저는 한국어로 말합니다"

  private def langsOf(e: Element): Option[Seq[String]] = e.metadata.languages

  // -- apply_lang_metadata: doc-level single-language stamping (lang.py:543-549)
  test("default auto detection stamps the doc-level language on every element") {
    val out = MetadataOps.applyLangMetadata(Seq(el(1, english), el(2, english + " Indeed.")))
    assert(out.forall(e => langsOf(e).contains(Seq("eng"))))
  }

  // -- test_apply_lang_metadata_has_no_warning_for_PageBreak (test_lang.py:155):
  // empty-text control elements ride along with the doc-level language
  test("PageBreak elements are stamped with the doc language in doc-level mode") {
    val out = MetadataOps.applyLangMetadata(
      Seq(el(1, english), el(2, "", ElementType.PageBreak)))
    assert(out.forall(e => langsOf(e).contains(Seq("eng"))))
  }

  // -- languages=[""] skips the pass (lang.py:526-529)
  test("languages=[\"\"] leaves language metadata untouched") {
    val out = MetadataOps.applyLangMetadata(Seq(el(1, english)), Some(Seq("")))
    assert(langsOf(out.head).isEmpty)
  }

  // -- test_partition_md_respects_detect_language_per_element (test_md.py:245)
  test("detect_language_per_element detects each element over its own text") {
    val out = MetadataOps.applyLangMetadata(
      Seq(el(1, english), el(2, korean)), detectLanguagePerElement = true)
    assert(langsOf(out(0)).contains(Seq("eng")))
    assert(langsOf(out(1)).contains(Seq("kor")))
  }

  test("per-element mode leaves empty-text elements without a language") {
    val out = MetadataOps.applyLangMetadata(
      Seq(el(1, english), el(2, "", ElementType.PageBreak)),
      detectLanguagePerElement = true)
    assert(langsOf(out(0)).contains(Seq("eng")))
    assert(langsOf(out(1)).isEmpty)
  }

  // -- explicit languages resolve through the name/ISO tables (lang.py:462-470)
  test("an explicit single language stamps without detection") {
    val out = MetadataOps.applyLangMetadata(Seq(el(1, english)), Some(Seq("spa")))
    assert(langsOf(out.head).contains(Seq("spa")))
  }

  test("explicit multiple languages stamp the resolved list per element") {
    val out = MetadataOps.applyLangMetadata(
      Seq(el(1, english), el(2, "", ElementType.PageBreak)),
      Some(Seq("eng", "spa")))
    // len != 1 routes through the per-element branch (lang.py:543-559)
    assert(langsOf(out(0)).contains(Seq("eng", "spa")))
    assert(langsOf(out(1)).isEmpty) // empty text detects to None even when explicit
  }

  test("mixed-language doc under default mode takes the doc-level winner") {
    val out = MetadataOps.applyLangMetadata(Seq(el(1, spanish), el(2, spanish)))
    assert(out.forall(e => langsOf(e).contains(Seq("spa"))))
  }

  // -- attached files keep their own language metadata (metadata stamp guard)
  test("attached-file elements pass through the language pass untouched") {
    val out = MetadataOps.applyLangMetadata(
      Seq(el(1, english), el(2, english, attached = Some("a.txt"))))
    assert(langsOf(out(0)).contains(Seq("eng")))
    assert(langsOf(out(1)).isEmpty)
  }

  // -- metadata_last_modified preference chain
  // (test_md.py:187-209 — metadata_last_modified beats the filesystem date)
  test("applyMetadataDoc stamps last_modified from the argument") {
    val out = MetadataOps.applyMetadataDoc(Seq(el(1, english)),
      lastModified = Some("2020-07-05T09:24:28"))
    assert(out.head.metadata.last_modified.contains("2020-07-05T09:24:28"))
  }

  test("an explicit last_modified argument overrides an existing stamp") {
    val existing = el(1, english).copy(metadata =
      graft.model.ElementMetadata(last_modified = Some("2019-01-01T00:00:00")))
    val out = MetadataOps.applyMetadataDoc(Seq(existing),
      lastModified = Some("2020-07-05T09:24:28"))
    assert(out.head.metadata.last_modified.contains("2020-07-05T09:24:28"))
  }

  test("last_modified is preserved when no argument is given") {
    val existing = el(1, english).copy(metadata =
      graft.model.ElementMetadata(last_modified = Some("2019-01-01T00:00:00")))
    val out = MetadataOps.applyMetadataDoc(Seq(existing))
    assert(out.head.metadata.last_modified.contains("2019-01-01T00:00:00"))
  }

  // -- test_partition_md_from_filename_gets_filename_from_filename_arg (:116)
  // and the path split into file_directory + basename
  test("a path-ish filename splits into directory and basename") {
    val out = MetadataOps.applyMetadataDoc(Seq(el(1, english)),
      filename = Some("example-docs/sample.md"))
    assert(out.head.metadata.filename.contains("sample.md"))
    assert(out.head.metadata.file_directory.contains("example-docs"))
  }

  // -- test_partition_md_languages_empty_disables_detection (:252) end to end
  test("applyMetadataDoc with languages=[\"\"] yields no language metadata") {
    val out = MetadataOps.applyMetadataDoc(Seq(el(1, english)),
      languages = Some(Seq("")))
    assert(out.head.metadata.languages.isEmpty)
  }

  // -- test_partition_md_element_metadata_has_languages (:239) end to end
  test("applyMetadataDoc default stamps detected languages") {
    val out = MetadataOps.applyMetadataDoc(Seq(el(1, english)))
    assert(out.head.metadata.languages.contains(Seq("eng")))
  }

  // -- test_partition_text_detects_more_than_3_languages (test_text.py:440):
  // per-element detection over the reference's all-languages UDHR fixture
  // spreads across the script cascade + stopword vote
  test("per-element detection finds >10 distinct languages in the UDHR fixture") {
    val raw = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/example-docs/language-docs/UDHR_first_article_all.txt")),
      java.nio.charset.StandardCharsets.UTF_8)
    val els = graft.sources.TextSource.splitParagraphs(raw).zipWithIndex.map {
      case (t, i) => el(i, t)
    }
    val out = MetadataOps.applyLangMetadata(els, detectLanguagePerElement = true)
    val langs = out.flatMap(_.metadata.languages).map(_.head).distinct
    assert(langs.size > 10, s"only ${langs.size}: $langs")
  }

  test("attached elements keep filename, last_modified and languages") {
    val attached = el(2, english, attached = Some("att.txt")).copy(metadata =
      graft.model.ElementMetadata(attached_to_filename = Some("att.txt"),
        filename = Some("att.txt"), last_modified = Some("2018-01-01T00:00:00")))
    val out = MetadataOps.applyMetadataDoc(Seq(el(1, english), attached),
      filename = Some("parent.eml"), lastModified = Some("2020-07-05T09:24:28"))
    assert(out(0).metadata.filename.contains("parent.eml"))
    assert(out(1).metadata.filename.contains("att.txt"))
    assert(out(1).metadata.last_modified.contains("2018-01-01T00:00:00"))
    assert(out(1).metadata.languages.isEmpty)
  }
}
