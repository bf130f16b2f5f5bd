package graft.sources

import scala.collection.mutable

import graft.sources.DocxPartitioner.{firstSpan, innerOf, topSpans}
import graft.sources.HtmlPartitioner.RawPara

/**
 * Reference-faithful PPTX partitioner (`/root/reference/unstructured/partition/pptx.py`),
 * re-derived over the shared OPC/DrawingML scanner:
 *
 *  - **Slide iteration in sldIdLst order** with a page counter; `PageBreak`
 *    elements between slides (never before the first), carrying the previous
 *    page number (`pptx.py:382-396`), plus `starting_page_number`.
 *  - **Slide notes** (`pptx.py:185-209`): zero-or-one `NarrativeText` per slide
 *    from the notes-slide body placeholder, only when `includeSlideNotes`
 *    (default off, matching the reference).
 *  - **Shape ordering** (`pptx.py:301-316`): shapes sort by (top, left), group
 *    shapes recursed, off-slide shapes (negative position) skipped
 *    (`pptx.py:323-326`).
 *  - **Title shape** (`pptx.py:269-299`): each non-empty paragraph is a `Title`
 *    with incrementing `category_depth`; bulleted paragraphs are `ListItem`s at
 *    their indent level; email addresses type as `EmailAddress`.
 *  - **Body shapes** (`pptx.py:217-245`): bullet-charactered (`a:buChar`)
 *    paragraphs are `ListItem`s; the rest classify through the codegen'd
 *    `classifier = "pptx"` cascade (email → narrative → title+1 → Text) at
 *    their `a:pPr lvl` depth.
 *  - **Tables** (`pptx.py:247-267`): the cell-text matrix renders through
 *    `htmlify_matrix_of_cell_texts`; an empty table emits nothing.
 *  - **Pictures** (`pptx.py:61-80,211-215`): pluggable sub-partitioner, default
 *    extracts nothing.
 *
 * Scale shape: a pure per-document byte parser — runs inside `flatMap` over a
 * file scan, embarrassingly parallel, no shuffle.
 */
object PptxPartitioner {

  /** `partition_pptx` keyword options (`pptx.py:83-128`). */
  final case class PptxOptions(
      includePageBreaks: Boolean = true,
      includeSlideNotes: Boolean = false,
      inferTableStructure: Boolean = true,
      startingPageNumber: Int = 1)

  /** Pluggable PPTX picture sub-partitioner (`pptx.py:61-80`): receives each
    * `p:pic` shape's XML and a media resolver. */
  trait PptxPicturePartitioner extends Serializable {
    def elements(pictureXml: String, media: String => Option[Array[Byte]]): Seq[RawPara]
  }

  object NullPicturePartitioner extends PptxPicturePartitioner {
    def elements(pictureXml: String, media: String => Option[Array[Byte]]): Seq[RawPara] = Nil
  }

  // ---------------------------------------------------------------- text

  // python-pptx _Paragraph.text: runs and fields contribute their a:t text,
  // a:br line-breaks become vertical-tab ("\v", )
  private val ATokenRe = "(?s)<a:t>(.*?)</a:t>|<a:t/>|<a:br(?: [^>]*)?/>|<a:br>\\s*</a:br>".r

  // `is_email_address` (text_type.py:318-320): anchored match on stripped text
  private val EmailRe = ("^" + graft.functions.Predicates.EmailAddressPattern).r

  private def isEmailStr(s: String): Boolean = EmailRe.findFirstIn(s.strip).isDefined

  private def paraText(paraInner: String): String = {
    val sb = new StringBuilder
    ATokenRe.findAllMatchIn(paraInner).foreach { m =>
      if (m.matched.startsWith("<a:br")) sb.append('\u000b')
      else if (m.group(1) != null) sb.append(HtmlPartitioner.unescape(m.group(1)))
    }
    sb.toString
  }

  private val LvlRe = "<a:pPr [^>]*lvl=\"([0-9]+)\"".r

  private def paraLevel(paraXml: String): Int =
    LvlRe.findFirstMatchIn(paraXml).map(_.group(1).toInt).getOrElse(0)

  /** `_is_bulleted_paragraph` (pptx.py:177-183): `a:buChar` only — autonumber
    * lists are not treated as bullets by the reference. */
  private def isBulleted(paraXml: String): Boolean =
    firstSpan(paraXml, "a:pPr").exists(_.contains("<a:buChar"))

  /** Text-frame text: paragraphs joined by "\n" (python-pptx `TextFrame.text`). */
  private def frameText(txBody: String): String =
    topSpans(innerOf(txBody, "p:txBody"), Seq("a:p"))
      .map(p => paraText(innerOf(p._2, "a:p"))).mkString("\n")

  // ---------------------------------------------------------------- shapes

  private sealed trait Shape {
    def top: Option[Long]
    def left: Option[Long]
    def xml: String
  }
  private final case class SpShape(top: Option[Long], left: Option[Long], xml: String,
      isTitle: Boolean) extends Shape
  private final case class TableShape(top: Option[Long], left: Option[Long], xml: String)
      extends Shape
  private final case class PicShape(top: Option[Long], left: Option[Long], xml: String)
      extends Shape

  private val OffRe = "<a:off [^>]*/?>".r
  private val XRe = "x=\"(-?[0-9]+)\"".r
  private val YRe = "y=\"(-?[0-9]+)\"".r
  private val PhTitleRe = "<p:ph [^>]*type=\"(?:title|ctrTitle)\"".r

  private def offset(shapeXml: String): (Option[Long], Option[Long]) =
    OffRe.findFirstIn(shapeXml) match {
      case Some(off) =>
        (YRe.findFirstMatchIn(off).map(_.group(1).toLong),
          XRe.findFirstMatchIn(off).map(_.group(1).toLong))
      case None => (None, None)
    }

  /** Flattened shape list in document order, recursing into group shapes
    * (`pptx.py:306-311`). */
  private def iterShapes(treeInner: String): Vector[Shape] =
    topSpans(treeInner, Seq("p:sp", "p:graphicFrame", "p:pic", "p:grpSp")).flatMap {
      case ("p:grpSp", g) => iterShapes(innerOf(g, "p:grpSp"))
      case ("p:sp", s) =>
        val (t, l) = offset(s)
        Vector(SpShape(t, l, s, PhTitleRe.findFirstIn(s).isDefined))
      case ("p:graphicFrame", s) if s.contains("<a:tbl") =>
        val (t, l) = offset(s)
        Vector(TableShape(t, l, s))
      case ("p:pic", s) =>
        val (t, l) = offset(s)
        Vector(PicShape(t, l, s))
      case _ => Vector.empty
    }

  /** `_shape_is_off_slide` (pptx.py:323-326). */
  private def offSlide(s: Shape): Boolean =
    (s.top.exists(_ != 0) && s.left.exists(_ != 0)) &&
      (s.top.exists(_ < 0) || s.left.exists(_ < 0))

  // ---------------------------------------------------------------- main

  private val RelTagRe = "<Relationship [^>]*/?>".r
  private val RelIdRe = "Id=\"([^\"]+)\"".r
  private val RelTargetRe = "Target=\"([^\"]+)\"".r
  private val RelTypeRe = "Type=\"([^\"]+)\"".r
  private val SldIdRe = "<p:sldId [^>]*r:id=\"([^\"]+)\"".r

  private def parseRels(xml: String): Map[String, (String, String)] =
    RelTagRe.findAllIn(xml).flatMap { tag =>
      for {
        id <- RelIdRe.findFirstMatchIn(tag).map(_.group(1))
        t <- RelTargetRe.findFirstMatchIn(tag).map(_.group(1))
      } yield id -> (t, RelTypeRe.findFirstMatchIn(tag).map(_.group(1)).getOrElse(""))
    }.toMap

  private def resolve(baseDir: String, target: String): String = {
    val raw = if (target.startsWith("/")) target.stripPrefix("/")
      else baseDir + "/" + target
    raw.split('/').foldLeft(List.empty[String]) {
      case (acc, "..") => if (acc.isEmpty) acc else acc.init
      case (acc, ".") => acc
      case (acc, seg) => acc :+ seg
    }.mkString("/")
  }

  def partition(bytes: Array[Byte],
      opts: PptxOptions = PptxOptions(),
      pictures: PptxPicturePartitioner = NullPicturePartitioner): Seq[RawPara] = {
    val parts = OoxmlPartitioner.zipEntries(bytes, n =>
      n.endsWith(".xml") || n.endsWith(".rels"))
    lazy val media = OoxmlPartitioner.zipEntriesRaw(bytes, _.startsWith("ppt/media/"))

    // slide order: presentation.xml sldIdLst -> presentation rels; fall back to
    // numeric filename order for packages without a presentation part
    val slidePaths: Seq[String] = {
      val pres = parts.getOrElse("ppt/presentation.xml", "")
      val rels = parseRels(parts.getOrElse("ppt/_rels/presentation.xml.rels", ""))
      val ordered = SldIdRe.findAllMatchIn(pres).toSeq
        .flatMap(m => rels.get(m.group(1)))
        .map { case (target, _) => resolve("ppt", target) }
        .filter(parts.contains)
      if (ordered.nonEmpty) ordered
      else parts.keys.filter(n => n.startsWith("ppt/slides/slide") && n.endsWith(".xml"))
        .toSeq.sortBy(n => "slide([0-9]+)".r.findFirstMatchIn(n)
          .map(_.group(1).toInt).getOrElse(0))
    }

    val out = mutable.ArrayBuffer.empty[RawPara]
    var page = opts.startingPageNumber - 1

    slidePaths.foreach { slidePath =>
      // increment_page_number (pptx.py:382-396): no break before the first slide;
      // the PageBreak carries the page it closes
      page += 1
      if (page >= opts.startingPageNumber + 1 && opts.includePageBreaks)
        out += RawPara("", Some("PageBreak"), pageNumber = Some(page - 1),
          classifier = "pptx")

      val slideXml = parts.getOrElse(slidePath, "")
      val slideDir = slidePath.substring(0, slidePath.lastIndexOf('/'))
      val slideRels = parseRels(parts.getOrElse(
        slideDir + "/_rels/" + slidePath.substring(slidePath.lastIndexOf('/') + 1) + ".rels", ""))

      // slide notes (pptx.py:185-209): the notes-slide body placeholder's text
      if (opts.includeSlideNotes) {
        slideRels.values.find(_._2.endsWith("/notesSlide")).foreach { case (target, _) =>
          val notes = parts.getOrElse(resolve(slideDir, target), "")
          val bodyText = topSpans(notes, Seq("p:sp"))
            .filter(_._2.contains("<p:ph type=\"body\""))
            .flatMap(s => firstSpan(s._2, "p:txBody").map(frameText))
            .mkString("\n").strip
          if (bodyText.nonEmpty)
            out += RawPara(bodyText, Some("NarrativeText"), Some(0),
              pageNumber = Some(page), classifier = "pptx")
        }
      }

      val treeInner = firstSpan(slideXml, "p:spTree").map(innerOf(_, "p:spTree")).getOrElse("")
      val shapes = iterShapes(treeInner)
      // slide.shapes.title: the first title/ctrTitle placeholder among direct shapes
      val titleShape = shapes.collectFirst { case s: SpShape if s.isTitle => s }
      val ordered = shapes.sortBy(s => (s.top.getOrElse(0L), s.left.getOrElse(0L)))

      val mediaFor: String => Option[Array[Byte]] = rid =>
        slideRels.get(rid).flatMap { case (t, _) => media.get(resolve(slideDir, t)) }

      ordered.foreach {
        case s: TableShape =>
          val tbl = firstSpan(s.xml, "a:tbl").getOrElse("")
          val matrix = topSpans(innerOf(tbl, "a:tbl"), Seq("a:tr")).map { case (_, tr) =>
            topSpans(innerOf(tr, "a:tr"), Seq("a:tc")).map { case (_, tc) =>
              firstSpan(innerOf(tc, "a:tc"), "p:txBody").orElse(
                firstSpan(innerOf(tc, "a:tc"), "a:txBody"))
                .map(frameTextAny).getOrElse("")
            }
          }
          val text = Partitioners.tableText(matrix)
          if (text.nonEmpty)
            out += RawPara(text, Some("Table"),
              textAsHtml =
                if (opts.inferTableStructure)
                  Some(Partitioners.htmlifyMatrix(matrix, escapeQuotes = true))
                else None,
              pageNumber = Some(page), classifier = "pptx")
        case s: PicShape =>
          pictures.elements(s.xml, mediaFor)
            .foreach(p => out += p.copy(pageNumber = p.pageNumber.orElse(Some(page))))
        case s: SpShape if s.xml.contains("<p:txBody") =>
          if (!offSlide(s)) {
            val txBody = firstSpan(s.xml, "p:txBody").getOrElse("")
            val isTitle = titleShape.contains(s)
            var titleDepth = 0
            topSpans(innerOf(txBody, "p:txBody"), Seq("a:p")).foreach { case (_, p) =>
              val pInner = innerOf(p, "a:p")
              val text = paraText(pInner)
              if (text.strip.nonEmpty) {
                val level = paraLevel(pInner)
                if (isTitle) {
                  // title-shape paragraphs (pptx.py:269-299)
                  if (isBulleted(pInner))
                    out += RawPara(text, Some("ListItem"), Some(level),
                      pageNumber = Some(page), classifier = "pptx")
                  else if (isEmailStr(text))
                    out += RawPara(text, Some("EmailAddress"), None,
                      pageNumber = Some(page), classifier = "pptx")
                  else {
                    out += RawPara(text, Some("Title"), Some(titleDepth),
                      pageNumber = Some(page), classifier = "pptx")
                    titleDepth += 1
                  }
                } else {
                  // body-shape paragraphs (pptx.py:217-245): bullets here, the
                  // email/narrative/title/Text cascade downstream
                  if (isBulleted(pInner))
                    out += RawPara(text, Some("ListItem"), Some(level),
                      pageNumber = Some(page), classifier = "pptx")
                  else
                    out += RawPara(text, None, Some(level),
                      pageNumber = Some(page), classifier = "pptx")
                }
              }
            }
          }
        case _ => ()
      }
    }
    out.toSeq
  }

  /** Cell text frames appear as `a:txBody` inside table cells but `p:txBody`
    * in shapes; accept either span. */
  private def frameTextAny(txBody: String): String = {
    val name = if (txBody.startsWith("<a:txBody")) "a:txBody" else "p:txBody"
    topSpans(innerOf(txBody, name), Seq("a:p"))
      .map(p => paraText(innerOf(p._2, "a:p"))).mkString("\n")
  }
}
