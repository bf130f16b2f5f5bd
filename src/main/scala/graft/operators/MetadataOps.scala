package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

import graft.model.{Element, ElementMetadata}

/**
 * The `apply_metadata` post-partition chain
 * (`/root/reference/unstructured/partition/common/metadata.py:155-281`) in its
 * normative order: language detect → filetype/filename/url stamping → hash ids
 * (with parent-id remap) → hierarchy assignment.
 *
 * Spark shape: one `groupByKey(doc_id).flatMapSortedGroups(seq)` — the same single
 * shuffle the chunker uses; language detection and hierarchy are inherently
 * whole-document operations (the reference also materializes the element list,
 * `lang.py:525-531`). Memory is O(document); skewed giant docs are bounded by the
 * element count of one document, not the partition.
 */
object MetadataOps {

  /** `HIERARCHY_RULE_SET` — `partition/common/metadata.py:36-60`. */
  val HierarchyRuleSet: Map[String, Seq[String]] = Map(
    "Title" -> Seq("Text", "UncategorizedText", "NarrativeText", "ListItem",
      "BulletedText", "Table", "FigureCaption", "CheckBox"),
    "Header" -> Seq("Title", "Text", "UncategorizedText", "NarrativeText", "ListItem",
      "BulletedText", "Table", "FigureCaption", "CheckBox"))

  private def sha256Hex(s: String): String = graft.operators.Hashing.sha256Hex(s)

  /**
   * `set_element_hierarchy` — stack sweep over document order
   * (`metadata.py:99-147`): the ruleset trumps `category_depth`; depth only breaks
   * ties within a category. Elements with a pre-assigned `parent_id` or no category
   * are passed through untouched and never pushed.
   */
  def setElementHierarchy(els: Seq[Element],
      ruleset: Map[String, Seq[String]] = HierarchyRuleSet): Seq[Element] = {
    val stack = mutable.ArrayBuffer.empty[Element]
    els.map { element =>
      if (element.metadata.parent_id.isDefined) element
      else if (element.`type` == null || element.`type`.isEmpty) element
      else {
        val cat = element.`type`
        val depth = element.metadata.category_depth.getOrElse(0)
        var parent: Option[String] = None
        var done = false
        while (stack.nonEmpty && !done) {
          val top = stack.last
          val topCat = top.`type`
          val topDepth = top.metadata.category_depth.getOrElse(0)
          if ((topCat == cat && topDepth < depth) ||
            (topCat != cat && ruleset.getOrElse(topCat, Nil).contains(cat))) {
            parent = Some(top.element_id)
            done = true
          } else stack.remove(stack.length - 1)
        }
        val out = element.copy(metadata = element.metadata.copy(parent_id = parent))
        stack += out
        out
      }
    }
  }

  /**
   * `_assign_hash_ids` — `metadata.py:284-312`, `elements.py:789-801`: id =
   * sha-256 of `filename + text + page_number + seq_on_page` (Python `f"{None}"`
   * renders as `"None"`), truncated to 32 hex; pre-existing `parent_id`s remapped
   * through the old→new table.
   */
  def assignHashIds(els: Seq[Element], uniqueIds: Boolean = false): Seq[Element] = {
    val pageCounts = mutable.Map.empty[Option[Int], Int]
    val mapping = mutable.Map.empty[String, String]
    val hashed = els.map { e =>
      val page = e.metadata.page_number
      val seqOnPage = pageCounts.getOrElse(page, 0)
      pageCounts(page) = seqOnPage + 1
      val data = e.metadata.filename.getOrElse("None") +
        Option(e.text).getOrElse("") +
        page.map(_.toString).getOrElse("None") +
        seqOnPage
      // `unique_element_ids=True` keeps random UUIDs instead of content hashes
      // (`documents/elements.py` id_to_uuid; every partitioner signature)
      val newId =
        if (uniqueIds) java.util.UUID.randomUUID().toString
        else sha256Hex(data).substring(0, 32)
      if (e.element_id != null && e.element_id.nonEmpty) mapping(e.element_id) = newId
      e.copy(element_id = newId)
    }
    hashed.map { e =>
      e.metadata.parent_id match {
        case Some(p) if mapping.contains(p) =>
          e.copy(metadata = e.metadata.copy(parent_id = Some(mapping(p))))
        case _ => e
      }
    }
  }

  /**
   * `apply_lang_metadata` (`partition/common/lang.py:508-559`) — the language
   * pass every partitioner runs. `languages=None` defaults to auto-detection
   * over the concatenated document text; `languages=[""]` skips the pass
   * entirely (sub-partitioner convention, `lang.py:526-529`); an explicit
   * list resolves through the tesseract-name/ISO-639 tables. When the
   * document-level detection yields exactly one language and
   * `detectLanguagePerElement` is false, that code stamps every element;
   * otherwise each element is detected (or resolved) individually over its
   * own text (`lang.py:543-559` — empty-text elements get no language).
   * Elements for which `keep` is false (attached files) pass through
   * untouched.
   */
  def applyLangMetadata(els: Seq[Element], languages: Option[Seq[String]] = None,
      detectLanguagePerElement: Boolean = false,
      keep: Element => Boolean = _.metadata.attached_to_filename.isEmpty): Seq[Element] = {
    val langs = languages.getOrElse(Seq("auto"))
    if (langs == Seq("")) return els
    def det(t: String): Option[Seq[String]] =
      graft.functions.LangCodes.detectLanguages(if (t == null) "" else t, Some(langs))
    val fullText = els.iterator.map(_.text).filter(t => t != null && t.nonEmpty).mkString(" ")
    val detected = det(fullText)
    def stamp(e: Element, v: Option[Seq[String]]): Element =
      if (!keep(e)) e else e.copy(metadata = e.metadata.copy(languages = v))
    detected match {
      case Some(ds) if ds.length == 1 && !detectLanguagePerElement =>
        els.map(e => stamp(e, detected))
      case _ =>
        els.map(e => stamp(e, det(e.text)))
    }
  }

  /** One document's `apply_metadata` chain in normative order (`metadata.py:196-277`). */
  /**
   * `group_elements_by_parent_id(assign_orphans=True)` (`utils.py:645-686`):
   * an element with no `parent_id` joins the group of the LAST non-null parent
   * seen in document order; orphans before any parented element stay in the
   * null group. Spark-first: a forward-fill window
   * (`last(parent_id, ignoreNulls)` over doc order) — no fold, codegen'd,
   * one shuffle on `doc_id`.
   */
  def fillOrphanParents(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.last
    val w = Window.partitionBy("doc_id").orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("parent_id",
      last(col("metadata.parent_id"), ignoreNulls = true).over(w))
  }

  def applyMetadataDoc(els: Seq[Element], filename: Option[String] = None,
      filetype: Option[String] = None, url: Option[String] = None,
      lastModified: Option[String] = None,
      languages: Option[Seq[String]] = None,
      detectLanguagePerElement: Boolean = false,
      uniqueElementIds: Boolean = false): Seq[Element] = {
    // 1. language pass over concatenated element text (`lang.py:508-559`;
    // attached files keep their own metadata, as with the stamps below)
    val withLang = applyLangMetadata(els, languages, detectLanguagePerElement)
    // 2. stamp filetype/filename/url/last_modified (attached files keep their
    // own). A path-ish filename splits into file_directory + basename, as the
    // reference ElementMetadata constructor does.
    val (fnDir, fnBase) = filename match {
      case Some(p) =>
        val (d, b) = graft.model.ElementMetadata.splitFilename(p)
        (d, Some(b))
      case None => (None, None)
    }
    val stamped = withLang.map { e =>
      if (e.metadata.attached_to_filename.isDefined) e
      else e.copy(metadata = e.metadata.copy(
        filename = fnBase.orElse(e.metadata.filename),
        file_directory = fnDir.orElse(e.metadata.file_directory),
        filetype = filetype.orElse(e.metadata.filetype),
        url = url.orElse(e.metadata.url),
        last_modified = lastModified.orElse(e.metadata.last_modified)))
    }
    // 3. hash ids (before hierarchy so parent-id is stable), 4. hierarchy
    setElementHierarchy(assignHashIds(stamped, uniqueElementIds))
  }

  /** Dataset-level `apply_metadata`: one shuffle on doc_id, per-doc chain. */
  def applyMetadata(ds: Dataset[Element], filetype: Option[String] = None,
      url: Option[String] = None,
      filenameFor: String => Option[String] = _ => None,
      lastModified: Option[String] = None,
      languages: Option[Seq[String]] = None,
      detectLanguagePerElement: Boolean = false): Dataset[Element] = {
    val sp = ds.sparkSession
    import sp.implicits._
    ds.groupByKey(_.doc_id)
      .flatMapSortedGroups(col("seq"))((doc, it) =>
        applyMetadataDoc(it.toSeq, filenameFor(doc), filetype, url,
          lastModified, languages, detectLanguagePerElement).iterator)
  }

  /** `group_elements_by_parent_id` read-side twin: parent/child pairs via self-join
    * (`utils.py:645-688`) — callers use `df.groupBy("metadata.parent_id")`. */
  def parentChildPairs(ds: Dataset[Element]): Dataset[(Element, Element)] = {
    val sp = ds.sparkSession
    import sp.implicits._
    val parents = ds.filter((e: Element) => e.element_id != null && e.element_id.nonEmpty)
    parents.joinWith(ds,
      parents("element_id") === ds("metadata.parent_id") &&
        parents("doc_id") === ds("doc_id"))
  }
}
