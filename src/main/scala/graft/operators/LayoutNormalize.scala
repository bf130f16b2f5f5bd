package graft.operators

import graft.model.{Coordinates, Element, ElementMetadata, ElementType, Point}

/**
 * Layout-model output → element normalization — the Scala counterpart of
 * `normalize_layout_element` (`partition/common/common.py:34-154`). This is
 * the function the hi_res path applies to every detected region before the
 * per-page merge joins in [[LayoutOps]]: type strings map through the
 * layout-label table, `Headline`/`Subheadline` become depth-1/-2 Titles,
 * `List` regions split into per-bullet ListItems, checkable labels become
 * CheckBox elements, and coordinates attach only when BOTH the points and a
 * coordinate system are present.
 *
 * Pure per-region logic: on a cluster this is a `flatMap` over the detected
 * regions — no state, no shuffle.
 */
object LayoutNormalize {

  /** `ENUMERATED_BULLETS_RE` — `nlp/patterns.py:64`. */
  val EnumeratedBulletsRegex = "(?:(?:\\d{1,3}|[a-z][A-Z])\\.?){1,3}"

  /** One detected layout region (`LayoutElement.to_dict()` shape). */
  final case class LayoutRegion(
      tpe: Option[String],
      text: String,
      coordinates: Seq[Point] = Nil,
      prob: Option[Double] = None,
      source: Option[String] = None,
      textAsHtml: Option[String] = None,
      tableAsCells: Option[Seq[graft.model.TableCellMeta]] = None)

  /** `LayoutElement.from_coords` corner order: (x1,y1) → (x1,y2) → (x2,y2) → (x2,y1). */
  def bboxPoints(x1: Double, y1: Double, x2: Double, y2: Double): Seq[Point] =
    Seq(Point(x1, y1), Point(x1, y2), Point(x2, y2), Point(x2, y1))

  private val CheckableTypes = Map(
    "CheckBoxChecked" -> true, "CheckBoxUnchecked" -> false,
    "RadioButtonChecked" -> true, "RadioButtonUnchecked" -> false,
    "Checked" -> true, "Unchecked" -> false)

  /** The canonical categories `TYPE_TO_TEXT_ELEMENT_MAP` resolves to
    * (`elements.py:1051-1090`): canonical names map to themselves, layout
    * labels through [[ElementType.NormalizationMap]]. */
  private val TextElementTypes: Set[String] = {
    val T = ElementType
    Set(T.Title, T.NarrativeText, T.UncategorizedText, T.ListItem, T.Address,
      T.EmailAddress, T.Image, T.PageBreak, T.Table, T.CompositeElement,
      T.Header, T.Footer, T.Formula, T.FigureCaption, T.CodeSnippet,
      T.PageNumber, T.Form, T.FormKeysValues) ++
      T.NormalizationMap.keySet ++
      Set("Headline", "Subheadline", "BulletedText", "List-item-other",
        "Threading", "DocumentData")
  }

  /**
   * `normalize_layout_element` for one region. Returns one element, or — for
   * a `List` region with `inferListItems` — one ListItem per bullet. The
   * engine-level `element_id`/`doc_id`/`seq` are assigned by the caller
   * (hash-ids pass); placeholders here are empty/0.
   */
  def normalizeLayoutElement(region: LayoutRegion,
      system: Option[String],
      inferListItems: Boolean = true): Seq[Element] = {
    val coords: Option[Coordinates] =
      if (region.coordinates.nonEmpty && system.isDefined)
        Some(Coordinates(points = region.coordinates, system = system))
      else None
    val md = ElementMetadata(
      coordinates = coords,
      detection_class_prob = region.prob,
      detection_origin = region.source,
      // `document_to_element_list` copies these unconditionally (pdf.py:1480-1481)
      text_as_html = region.textAsHtml,
      table_as_cells = region.tableAsCells)
    def el(tpe: String, text: String, depth: Option[Int] = None): Element =
      Element("", tpe, text, "", 0, md.copy(category_depth = depth))

    region.tpe match {
      case Some("List") if inferListItems =>
        layoutListToListItems(region.text).map(t => el(ElementType.ListItem, t))
      case Some("List") =>
        Seq(el(ElementType.ListItem, region.text))
      case Some(t) if CheckableTypes.contains(t) =>
        // the reference builds CheckBox(checked=...); the sparse wire here has
        // no `checked` attribute, so checkedness stays encoded in the type
        // string — the convention ElementsToHtml renders from
        Seq(el(if (CheckableTypes(t)) "CheckBoxChecked" else "CheckBoxUnchecked",
          region.text))
      case Some(t) if TextElementTypes.contains(t) =>
        val depth = t match {
          case "Headline" => Some(1)
          case "Subheadline" => Some(2)
          case _ => None
        }
        Seq(el(ElementType.normalize(t), region.text, depth))
      case _ =>
        // unknown labels fall back to bare Text (category UncategorizedText)
        Seq(el(ElementType.UncategorizedText, region.text))
    }
  }

  /** `ocr_data_to_elements` (`common.py:435-460`): normalize each OCR region
    * against a PixelSpace sized to the source image; layout dims ride in the
    * coordinates metadata. */
  def ocrDataToElements(regions: Seq[LayoutRegion], imageWidth: Double,
      imageHeight: Double, inferListItems: Boolean = true): Seq[Element] =
    regions.flatMap { r =>
      normalizeLayoutElement(r, Some("PixelSpace"), inferListItems).map { e =>
        e.copy(metadata = e.metadata.copy(coordinates = e.metadata.coordinates.map(
          _.copy(layout_width = Some(imageWidth), layout_height = Some(imageHeight)))))
      }
    }

  /** `contains_emoji` (`common.py:395-406`) — codepoint-block probe standing
    * in for the emoji package's sequence tables: pictographs, symbols,
    * dingbats, flags, and the emoji variation selector. */
  def containsEmoji(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val emoji =
        (cp >= 0x1F000 && cp <= 0x1FAFF) || // pictographs, symbols, extended
          (cp >= 0x2600 && cp <= 0x27BF) || // misc symbols + dingbats
          (cp >= 0x1F1E6 && cp <= 0x1F1FF) || // regional indicators (flags)
          (cp >= 0x2B00 && cp <= 0x2BFF) || // arrows/stars block (⭐)
          cp == 0xFE0F || cp == 0x203C || cp == 0x2049
      if (emoji) return true
      i += Character.charCount(cp)
    }
    false
  }

  /** `layout_list_to_list_items` (`common.py:127-154`): split on enumerated
    * bullets, falling back to unicode bullets when nothing splits; blank
    * segments are dropped and survivors stripped. */
  def layoutListToListItems(text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Nil
    val enumerated = text.split(EnumeratedBulletsRegex, -1).toSeq
    val segments =
      if (enumerated.length > 1) enumerated
      else text.split(graft.functions.Cleaners.UnicodeBulletsRegex, -1).toSeq
    segments.map(_.trim).filter(_.nonEmpty)
  }
}
