package graft.model

/**
 * The engine's single tuple type: a typed, flat element record.
 *
 * Mirrors the reference data model (`/root/reference/unstructured/documents/elements.py:718`
 * `Element`, `:150-487` `ElementMetadata`) re-expressed as Scala case classes with Spark
 * `Encoder`s. Two columns are added relative to the reference, where they are implicit:
 * `doc_id` (the source document — the reference's per-call file scope) and `seq` (reading-order
 * ordinal — the reference's implicit list order). All order-sensitive operators
 * (chunking, hierarchy, overlap) sort by `(doc_id, seq)` and never rely on row order.
 *
 * Sparse-metadata semantics (reference deletes None attributes,
 * `elements.py:356-364`) map to nullable fields (`Option`); the JSON sink omits
 * null fields to stay wire-compatible (`staging/base.py:424-455`).
 */
final case class Point(x: Double, y: Double)

/** `CoordinatesMetadata` — `elements.py:55-127`; serialized shape `elements.py:81-87`. */
final case class Coordinates(
    points: Seq[Point] = Nil,
    system: Option[String] = None,
    layout_width: Option[Double] = None,
    layout_height: Option[Double] = None)

/** `Link` TypedDict — `elements.py:130-135`. */
final case class LinkMeta(text: Option[String], url: Option[String], start_index: Option[Int])

/** One `table_as_cells` entry — `SimpleTableCell.to_dict()`
  * (`metrics/table/table_formats.py:13-20`): grid position, span extents,
  * and cell text. */
final case class TableCellMeta(x: Int, y: Int, w: Int, h: Int, content: String)

/** `DataSourceMetadata` — `elements.py:31-52`. Dates kept as ISO-8601 strings.
  * `permissions_data` is a list of arbitrary attribute dicts on the wire (local
  * filesystem writes `[{"mode": 33188}]`; connector goldens carry string/bool/nested
  * values — `List[Dict[str, Any]]` in the reference), so values are held as raw JSON
  * value tokens: strings KEEP their quotes (`"\"reader\""`), numbers/bools/null and
  * nested containers their literal source text ("33188", "false"). The wire reader
  * captures each dict's source verbatim and [[graft.sinks.RawJson]] splits it;
  * [[graft.sinks.ElementJson]] re-emits the tokens unchanged, preserving the
  * string/number distinction (a gdrive string id like "03887..." must not become a
  * bare — and syntactically invalid — leading-zero number). */
final case class DataSource(
    url: Option[String] = None,
    version: Option[String] = None,
    record_locator: Option[Map[String, String]] = None,
    date_created: Option[String] = None,
    date_modified: Option[String] = None,
    date_processed: Option[String] = None,
    permissions_data: Option[Seq[Map[String, String]]] = None)

/** Sparse metadata struct — field set follows `elements.py:163-236`. */
final case class ElementMetadata(
    // provenance
    filename: Option[String] = None,
    file_directory: Option[String] = None,
    filetype: Option[String] = None,
    url: Option[String] = None,
    last_modified: Option[String] = None,
    attached_to_filename: Option[String] = None,
    data_source: Option[DataSource] = None,
    // position
    page_number: Option[Int] = None,
    page_name: Option[String] = None,
    coordinates: Option[Coordinates] = None,
    category_depth: Option[Int] = None,
    parent_id: Option[String] = None,
    // which header/footer definition produced a Header/Footer element:
    // "primary" | "first_page" | "even_page" (`elements.py:186`, docx.py:684,713)
    header_footer_type: Option[String] = None,
    // text decoration
    emphasized_text_contents: Option[Seq[String]] = None,
    emphasized_text_tags: Option[Seq[String]] = None,
    link_texts: Option[Seq[String]] = None,
    link_urls: Option[Seq[String]] = None,
    link_start_indexes: Option[Seq[Int]] = None,
    links: Option[Seq[LinkMeta]] = None,
    languages: Option[Seq[String]] = None,
    // tables
    text_as_html: Option[String] = None,
    table_id: Option[String] = None,
    chunk_index: Option[Int] = None,
    num_carried_over_header_rows: Option[Int] = None,
    // raw table-agent cells (`elements.py:220`, populated by the hi_res
    // table-structure supplement when EXTRACT_TABLE_AS_CELLS is on)
    table_as_cells: Option[Seq[TableCellMeta]] = None,
    // forms: the hi_res form-extraction key/value pairs (`elements.py` FormKeysValues).
    // The reference shape is RECURSIVE (each key/value may carry a full nested
    // element), which a Spark struct schema cannot express — held as the raw
    // JSON array text, schema-opaque, round-tripped verbatim by the wire codec.
    key_value_pairs: Option[String] = None,
    // images
    image_base64: Option[String] = None,
    image_mime_type: Option[String] = None,
    image_path: Option[String] = None,
    image_url: Option[String] = None,
    // email
    sent_from: Option[Seq[String]] = None,
    sent_to: Option[Seq[String]] = None,
    cc_recipient: Option[Seq[String]] = None,
    bcc_recipient: Option[Seq[String]] = None,
    subject: Option[String] = None,
    signature: Option[String] = None,
    email_message_id: Option[String] = None,
    // chunking artifacts
    is_continuation: Option[Boolean] = None,
    orig_elements: Option[String] = None, // base64-gzipped JSON, `elements.py:450-451`
    // ML provenance
    detection_class_prob: Option[Double] = None,
    detection_origin: Option[String] = None,
    // dict-of-list-of-dicts provenance (`enrichment_origins`,
    // elements.py:175 `Optional[dict[str, list[dict[str, str]]]]`, :512-515,534):
    // each entry is a flat record like {"type":..., "provider":..., "model":...}
    enrichment_origins: Option[Map[String, Seq[Map[String, String]]]] = None,
    // audio
    segment_start_seconds: Option[Double] = None,
    segment_end_seconds: Option[Double] = None) {

  /**
   * `ElementMetadata.update` (`elements.py:457-475`) — `dict.update()` semantics:
   * every field populated on `other` overwrites this instance's value; fields
   * unpopulated on `other` are kept. Used by the email/msg flows to stamp
   * message-level metadata over per-element metadata (`partition/msg.py:235`,
   * `partition/email.py:333`, `partition/common/common.py:221`). Immutable
   * variant: returns the merged copy. (The reference's ad-hoc user fields have
   * no typed-model counterpart; known fields all participate.)
   */
  def updateFrom(other: ElementMetadata): ElementMetadata = ElementMetadata(
    filename = other.filename.orElse(filename),
    file_directory = other.file_directory.orElse(file_directory),
    filetype = other.filetype.orElse(filetype),
    url = other.url.orElse(url),
    last_modified = other.last_modified.orElse(last_modified),
    attached_to_filename = other.attached_to_filename.orElse(attached_to_filename),
    data_source = other.data_source.orElse(data_source),
    page_number = other.page_number.orElse(page_number),
    page_name = other.page_name.orElse(page_name),
    coordinates = other.coordinates.orElse(coordinates),
    category_depth = other.category_depth.orElse(category_depth),
    parent_id = other.parent_id.orElse(parent_id),
    header_footer_type = other.header_footer_type.orElse(header_footer_type),
    emphasized_text_contents = other.emphasized_text_contents.orElse(emphasized_text_contents),
    emphasized_text_tags = other.emphasized_text_tags.orElse(emphasized_text_tags),
    link_texts = other.link_texts.orElse(link_texts),
    link_urls = other.link_urls.orElse(link_urls),
    link_start_indexes = other.link_start_indexes.orElse(link_start_indexes),
    links = other.links.orElse(links),
    languages = other.languages.orElse(languages),
    text_as_html = other.text_as_html.orElse(text_as_html),
    table_id = other.table_id.orElse(table_id),
    chunk_index = other.chunk_index.orElse(chunk_index),
    num_carried_over_header_rows =
      other.num_carried_over_header_rows.orElse(num_carried_over_header_rows),
    table_as_cells = other.table_as_cells.orElse(table_as_cells),
    key_value_pairs = other.key_value_pairs.orElse(key_value_pairs),
    image_base64 = other.image_base64.orElse(image_base64),
    image_mime_type = other.image_mime_type.orElse(image_mime_type),
    image_path = other.image_path.orElse(image_path),
    image_url = other.image_url.orElse(image_url),
    sent_from = other.sent_from.orElse(sent_from),
    sent_to = other.sent_to.orElse(sent_to),
    cc_recipient = other.cc_recipient.orElse(cc_recipient),
    bcc_recipient = other.bcc_recipient.orElse(bcc_recipient),
    subject = other.subject.orElse(subject),
    signature = other.signature.orElse(signature),
    email_message_id = other.email_message_id.orElse(email_message_id),
    is_continuation = other.is_continuation.orElse(is_continuation),
    orig_elements = other.orig_elements.orElse(orig_elements),
    detection_class_prob = other.detection_class_prob.orElse(detection_class_prob),
    detection_origin = other.detection_origin.orElse(detection_origin),
    enrichment_origins = other.enrichment_origins.orElse(enrichment_origins),
    segment_start_seconds = other.segment_start_seconds.orElse(segment_start_seconds),
    segment_end_seconds = other.segment_end_seconds.orElse(segment_end_seconds))
}

object ElementMetadata {
  val empty: ElementMetadata = ElementMetadata()

  /** The reference `ElementMetadata` constructor splits a path-ish `filename`
    * into directory + basename (`elements.py` — `file_directory` is only set
    * when the filename argument carries a directory part). */
  def splitFilename(path: String): (Option[String], String) = {
    val i = path.lastIndexOf('/')
    if (i < 0) (None, path)
    else (Some(path.substring(0, i)).filter(_.nonEmpty), path.substring(i + 1))
  }
}

/**
 * One element row. `type` values follow the reference subtype table
 * (`elements.py:819-1049`): Title, NarrativeText, ListItem, Table, TableChunk,
 * CompositeElement, Address, EmailAddress, Image, PageBreak, Header, Footer,
 * CodeSnippet, PageNumber, Formula, FigureCaption, Form, CheckBox, UncategorizedText, ...
 */
final case class Element(
    element_id: String,
    `type`: String,
    text: String,
    doc_id: String,
    seq: Long,
    metadata: ElementMetadata = ElementMetadata.empty,
    embeddings: Option[Seq[Float]] = None)

object ElementType {
  val Title = "Title"
  val NarrativeText = "NarrativeText"
  val UncategorizedText = "UncategorizedText"
  val ListItem = "ListItem"
  val Address = "Address"
  val EmailAddress = "EmailAddress"
  val Image = "Image"
  val PageBreak = "PageBreak"
  val Table = "Table"
  val TableChunk = "TableChunk"
  val CompositeElement = "CompositeElement"
  val Header = "Header"
  val Footer = "Footer"
  val Formula = "Formula"
  val FigureCaption = "FigureCaption"
  val CodeSnippet = "CodeSnippet"
  val PageNumber = "PageNumber"
  val Form = "Form"
  val FormKeysValues = "FormKeysValues"
  val CheckBox = "CheckBox"

  /**
   * Many-to-one normalization of layout-model labels to canonical element types —
   * `TYPE_TO_TEXT_ELEMENT_MAP`, `elements.py:1051-1090`.
   */
  val NormalizationMap: Map[String, String] = Map(
    "Caption" -> FigureCaption,
    "Figure" -> Image,
    "Picture" -> Image,
    "Footnote" -> NarrativeText,
    "Headline" -> Title,
    "Subheadline" -> Title,
    "Section-header" -> Title,
    "Abstract" -> NarrativeText,
    "Text" -> NarrativeText,
    "Paragraph" -> NarrativeText,
    "Field-Name" -> Title,
    "Value" -> NarrativeText,
    "Link" -> NarrativeText,
    "List" -> ListItem,
    "List-item" -> ListItem,
    "Page-header" -> Header,
    "Page-footer" -> Footer,
    "Page-number" -> PageNumber)

  def normalize(raw: String): String = NormalizationMap.getOrElse(raw, raw)
}
