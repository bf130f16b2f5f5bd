package graft.sinks

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.sources.HtmlOntology

/**
 * `elements_to_html` — the reference's HTML render sink
 * (`partition/html/convert.py:305-320`): converts a flat element list into a
 * standalone HTML document. Faithful structure:
 *
 *  - type→tag map (`convert.py:178-224`): Title → `h{category_depth or 1}`,
 *    text-ish types → `p`, Image → `img` with a base64 data URI
 *    (suppressed by `excludeBinaryImageData`) and `alt` text, Table reuses its
 *    own `text_as_html` with border styles injected on table/tr/th/td
 *    (`:104-111`), Link → `a href`, checkbox/radio inputs with
 *    `checked="true"`, unmapped types → `div`;
 *  - every element tag carries `class=<element type>` and `id=<element id>`
 *    (`convert.py:72-73`);
 *  - parent nesting (`:246-258`): children attach under their parent inside a
 *    plain `<div>` wrapper (parent tag first); list containers append children
 *    into their own tag (`:126-131`);
 *  - consecutive ListItem/ListItemOther runs are grouped into a synthetic
 *    `<ol class="UncategorizedText">` (`_group_element_children:226-243`;
 *    the reference's wrapper carries a random UUID id — omitted here so output
 *    is deterministic, the one documented divergence);
 *  - page grouping (`:274-302`): one `<div data-page_number="N">` per page in
 *    first-seen order, N = 1-based enumeration; elements with no page number
 *    are skipped in by-page mode (`noGroupByPage=true` disables grouping);
 *  - output is prettify-style (each tag and text run on its own line, one
 *    space per depth, alphabetically sorted attributes, void tags as
 *    `<tag/>`), wrapped in the reference's HTML template.
 *
 * Spark shape: one `groupByKey(doc_id)` + per-doc pure string build — the
 * same single-shuffle render shape as `elements_to_md`.
 */
object ElementsToHtml {

  private val TableBorder = "border: 1px solid black;"
  private val TableStyle = s"$TableBorder border-collapse: collapse;"

  private val ListTypes = Set("ListItem", "ListItemOther")
  /** `TYPE_TO_HTML_MAP` — types that render as `<p>`. */
  private val TextTypes = Set("UncategorizedText", "Text", "Paragraph",
    "NarrativeText", "FigureCaption", "Caption")
  private val CheckedTypes = Set("Checked", "CheckBoxChecked")
  private val UncheckedTypes = Set("Unchecked", "CheckBoxUnchecked")

  private final case class E(seq: Long, id: String, tpe: String, text: String,
      parentId: Option[String], page: Option[Int], depth: Option[Int],
      textAsHtml: Option[String], imgB64: Option[String],
      imgMime: Option[String], url: Option[String])

  /** Render tree: tag + unsorted attrs (sorted at print) + ordered content —
    * text runs and child tags interleaved exactly as in the source, the way
    * bs4 prettify preserves node order (ADVICE r8: a `(text, children)` pair
    * reordered mixed content text-first). */
  private final case class R(tag: String, attrs: Map[String, String],
      content: Vector[Either[String, R]], void: Boolean = false) {
    def children: Vector[R] = content.collect { case Right(r) => r }
    def withKids(kids: Vector[R]): R =
      copy(content = content ++ kids.map(Right(_)))
  }

  private def textContent(s: String): Vector[Either[String, R]] =
    if (s.isEmpty) Vector.empty else Vector(Left(s))

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** `saxutils.quoteattr` convention (what bs4's serializer emits): values
    * containing `"` but no `'` render single-quoted with the `"` raw; all
    * other values double-quoted with `"` as `&quot;`. */
  private def quoteAttr(v: String): String = {
    val base = esc(v)
    if (base.contains("\"") && !base.contains("'")) s"'$base'"
    else "\"" + base.replace("\"", "&quot;") + "\""
  }

  private val VoidTags = Set("br", "img", "hr", "input", "meta", "link")

  /** Parsed `text_as_html` → render tree, with optional per-tag attr inject. */
  private def fromDom(el: HtmlOntology.Elem,
      inject: String => Map[String, String]): R = {
    val content = el.children.flatMap {
      case c: HtmlOntology.Elem => Vector(Right(fromDom(c, inject)))
      case HtmlOntology.TextNode(s) =>
        val t = s.trim
        if (t.isEmpty) Vector.empty else Vector(Left(t))
    }
    R(el.tag, el.attrs.toMap ++ inject(el.tag), content.toVector,
      void = VoidTags.contains(el.tag))
  }

  private def tagFor(e: E): String = e.tpe match {
    case "Title" | "Headline" | "SubHeadline" =>
      "h" + e.depth.filter(_ > 0).getOrElse(1)
    case t if TextTypes.contains(t) => "p"
    case "Image" => "img"
    case "Table" => "table"
    case "Link" => "a"
    case "List" => "ol"
    case t if ListTypes.contains(t) || t == "BulletedText" => "li"
    case "FieldName" => "label"
    case "Form" => "form"
    case t if CheckedTypes.contains(t) || UncheckedTypes.contains(t) ||
      t.startsWith("RadioButton") || t == "Value" => "input"
    case _ => "div"
  }

  /** `_inject_html_element_attrs` (`convert.py:104-175`) — ALWAYS runs on the
    * element's root tag, whether that tag was adopted from `text_as_html` or
    * synthesized (ADVICE r8: a Link/checkbox with text_as_html was rendered
    * without href/type/checked; a synthesized Table went unstyled). Descendant
    * tr/th/td styling for parsed tables happens in [[fromDom]]'s inject. */
  private def injectRootAttrs(e: E, attrs: Map[String, String]): Map[String, String] =
    e.tpe match {
      case "Table" => attrs + ("style" -> TableStyle)
      case "Link" => attrs + ("href" -> e.url.getOrElse(""))
      case t if CheckedTypes.contains(t) =>
        attrs + ("type" -> "checkbox") + ("checked" -> "true")
      case t if UncheckedTypes.contains(t) => attrs + ("type" -> "checkbox")
      case "RadioButtonChecked" => attrs + ("type" -> "radio") + ("checked" -> "true")
      case "RadioButtonUnchecked" => attrs + ("type" -> "radio")
      case _ => attrs
    }

  /** One element → its render node (before child wrapping). */
  private def elementNode(e: E, excludeBinary: Boolean): R = {
    val base = e.textAsHtml.map(HtmlOntology.parseDom)
      .flatMap(_.children.collectFirst { case t: HtmlOntology.Elem => t })
    val injected: String => Map[String, String] =
      if (e.tpe == "Table") {
        case "tr" | "th" | "td" => Map("style" -> TableBorder)
        case _ => Map.empty
      } else _ => Map.empty
    val node = base.map(fromDom(_, injected)).getOrElse {
      val tag = tagFor(e)
      val attrs = mutable.Map.empty[String, String]
      var text = e.text
      tag match {
        case "img" =>
          if (!excludeBinary) e.imgB64.foreach { b64 =>
            attrs("src") = s"data:${e.imgMime.getOrElse("image/png")};base64,$b64"
          }
          attrs("alt") = e.text
          text = ""
        case "input" => text = ""
        case _ => ()
      }
      R(tag, attrs.toMap, textContent(text), void = VoidTags.contains(tag))
    }
    node.copy(attrs =
      injectRootAttrs(e, node.attrs ++ Map("class" -> e.tpe, "id" -> e.id)))
  }

  private def isListContainer(tag: String): Boolean =
    tag == "ol" || tag == "ul" || tag == "li"

  /** Parent nesting + consecutive-ListItem grouping for one page/doc group.
    * Keyed by `seq`, not element id: hash ids collide for identical text, and
    * the reference keeps a list — every element renders, and a parent_id
    * resolves to the FIRST element carrying that id
    * (`_elements_to_html_tags_by_parent`'s `next(...)` lookup,
    * `convert.py:246-258`; ADVICE r8: an id-keyed Map dropped all but the last
    * duplicate). */
  private def assemble(els: Seq[E], excludeBinary: Boolean): Vector[R] = {
    val nodes: Map[Long, (E, R)] =
      els.map(e => e.seq -> (e, elementNode(e, excludeBinary))).toMap
    val firstSeqForId: Map[String, Long] =
      els.groupBy(_.id).view.mapValues(_.map(_.seq).min).toMap
    // children in document order, attached to their parent id's first carrier;
    // a self-parent (identical-text hash collision between parent and child)
    // is dropped rather than recursed into
    val childSeqs: Map[Long, Seq[Long]] = els.filter(_.parentId.isDefined)
      .groupBy(e => firstSeqForId.getOrElse(e.parentId.get, -1L))
      .view.mapValues(_.map(_.seq)).toMap

    def grouped(seqs: Seq[Long]): Vector[R] = {
      val out = Vector.newBuilder[R]
      val run = mutable.ArrayBuffer.empty[R]
      def flushRun(): Unit = if (run.nonEmpty) {
        // synthetic ordered-list wrapper: base Element category, no stable id
        out += R("ol", Map("class" -> "UncategorizedText"), run.toVector.map(Right(_)))
        run.clear()
      }
      for (seq <- seqs) {
        val (e, _) = nodes(seq)
        val built = build(seq)
        if (ListTypes.contains(e.tpe)) run += built
        else { flushRun(); out += built }
      }
      flushRun()
      out.result()
    }

    def build(seq: Long): R = {
      val (_, node) = nodes(seq)
      val kids = childSeqs.get(seq).map(ss => grouped(ss.filter(_ != seq)))
        .getOrElse(Vector.empty)
      if (kids.isEmpty) node
      else if (isListContainer(node.tag)) node.withKids(kids)
      else R("div", Map.empty, (node +: kids).map(Right(_))) // plain wrapper div
    }

    els.filter(_.parentId.isEmpty).map(e => build(e.seq)).toVector
  }

  /** prettify-style print: one space per depth, sorted attrs, text on its own
    * line. */
  private def render(n: R, depth: Int, sb: StringBuilder): Unit = {
    val pad = " " * depth
    val attrs = n.attrs.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=${quoteAttr(v)}" }.mkString(" ")
    val attrPart = if (attrs.isEmpty) "" else " " + attrs
    if (n.void) { sb.append(s"$pad<${n.tag}$attrPart/>\n"); return }
    sb.append(s"$pad<${n.tag}$attrPart>\n")
    n.content.foreach {
      // bs4 prettify emits text nodes stripped (indentation supplies leading
      // space) — pinned by the handbook-1p.docx golden's trailing-tab lines
      case Left(text) => sb.append(" " * (depth + 1)).append(esc(text.strip)).append('\n')
      case Right(child) => render(child, depth + 1, sb)
    }
    sb.append(s"$pad</${n.tag}>\n")
  }

  private def renderDoc(groups: Vector[Vector[R]], byPage: Boolean): String = {
    val sb = new StringBuilder
    sb.append("<!DOCTYPE html>\n<html lang=\"en\">\n <head>\n")
    // bs4's formatter rewrites the template's UTF-8 to lowercase (pinned by the
    // reference's own expected-structured-output-html goldens)
    sb.append("  <meta charset=\"utf-8\"/>\n")
    sb.append("  <meta content=\"width=device-width, initial-scale=1.0\" name=\"viewport\"/>\n")
    sb.append("  <title>\n  </title>\n </head>\n <body>\n")
    if (byPage) groups.zipWithIndex.foreach { case (g, i) =>
      // enumeration index, not the source page number (`convert.py:281`)
      val page = R("div", Map("data-page_number" -> (i + 1).toString),
        g.map(Right(_)))
      render(page, 2, sb)
    }
    else groups.flatten.foreach(render(_, 2, sb))
    sb.append(" </body>\n</html>")
    sb.toString
  }

  /** The shell a document with no elements renders to (`convert.py` emits the
    * template with an empty body — pinned by e.g. the SitePages/Home.aspx
    * ingest golden). Spark can't emit a group for a doc with zero rows, so
    * callers rendering a known doc list substitute this for missing docs. */
  def emptyDocumentHtml: String = renderDoc(Vector.empty, byPage = false)

  /**
   * Render per-doc HTML. Input columns: doc_id, seq, element_id,
   * element_type, text, parent_id, page_number, category_depth, text_as_html,
   * image_base64, image_mime, url. Output: (doc_id, html).
   */
  def elementsToHtml(els: DataFrame, excludeBinaryImageData: Boolean = false,
      noGroupByPage: Boolean = false): DataFrame = {
    val sp = els.sparkSession
    import sp.implicits._
    els.select(
      col("doc_id").cast("long").as("doc_id"),
      col("seq").cast("long").as("seq"),
      col("element_id").cast("string").as("id"),
      col("element_type").as("tpe"), coalesce(col("text"), lit("")).as("text"),
      col("parent_id").cast("string").as("parentId"),
      col("page_number").cast("int").as("page"),
      col("category_depth").cast("int").as("depth"),
      col("text_as_html").as("textAsHtml"),
      col("image_base64").as("imgB64"), col("image_mime").as("imgMime"),
      col("url").as("url"))
      .as[(Long, Long, String, String, String, Option[String], Option[Int],
        Option[Int], Option[String], Option[String], Option[String], Option[String])]
      .groupByKey(_._1)
      .mapGroups { (docId, rows) =>
        val els = rows.toVector.sortBy(_._2).map(r =>
          E(r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9, r._10, r._11, r._12))
        val groups: Vector[Vector[R]] =
          if (noGroupByPage) Vector(assemble(els, excludeBinaryImageData))
          else {
            // first-seen page order; unset page numbers are skipped
            val withPage = els.filter(_.page.isDefined)
            val order = withPage.map(_.page.get).distinct
            order.map(p => assemble(withPage.filter(_.page.contains(p)),
              excludeBinaryImageData)).toVector
          }
        (docId, renderDoc(groups, byPage = !noGroupByPage))
      }
      .toDF("doc_id", "html")
  }
}
