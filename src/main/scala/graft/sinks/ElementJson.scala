package graft.sinks

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import graft.model._

/**
 * Canonical element wire format: sparse JSON, matching the reference's serialization
 * semantics (`/root/reference/unstructured/staging/base.py:434-455`,
 * `documents/elements.py:424-455`): fields that are unpopulated (None/null) are OMITTED
 * from the output, `metadata` is a nested sparse object, and `orig_elements` is a
 * base64-gzipped JSON array (`elements.py:450-451`, `staging/base.py:241-260`).
 *
 * Two engine-added fields (`doc_id`, `seq`) are serialized too — they are implicit in
 * the reference (per-call file scope and list order); a reference-strict consumer can
 * ignore them.
 *
 * The writer is hand-rolled (deterministic field order, no nulls ever emitted) because
 * Spark's `to_json` null-field behavior is config-dependent and struct fields are not
 * sparse. Reading back uses `spark.read.schema(schema).json` — absent fields become
 * nulls, the exact inverse.
 */
object ElementJson {

  def esc(s: String): String = {
    // exact python json.dumps(ensure_ascii=False) escape set: the five
    // C-escape shorthands (incl. \b and \f — not /), \uXXXX for
    // the remaining C0 controls, DEL and above raw; astral chars ride as
    // surrogate pairs here and become 4-byte UTF-8 at the write
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def jStr(s: String): String = "\"" + esc(s) + "\""

  /**
   * Re-emit a raw JSON value token captured by the wire reader
   * ([[ElementSink.fromWire]] keeps permission-dict values verbatim: string values
   * WITH their quotes, numbers/bools/null/containers their literal source text).
   * Valid tokens pass through unchanged, so `{"mode": 33188}` round-trips as a
   * number and a gdrive `"id": "03887..."` stays a string (emitting it bare would
   * be a leading-zero JSON syntax error). Anything else — e.g. a value constructed
   * programmatically rather than read off the wire — is emitted as a JSON string.
   */
  private def jRaw(raw: String): String =
    if (raw == "true" || raw == "false" || raw == "null" ||
        raw.matches("-?(0|[1-9]\\d*)(\\.\\d+)?([eE][+-]?\\d+)?") ||
        (raw.length >= 2 && raw.head == '"' && raw.last == '"') ||
        (raw.length >= 2 && ((raw.head == '{' && raw.last == '}') ||
          (raw.head == '[' && raw.last == ']')))) raw
    else jStr(raw)

  private def jArr(xs: Seq[String]): String = xs.mkString("[", ",", "]")

  /** Sparse field list: only populated fields appear, in declaration order. */
  private def metadataFields(m: ElementMetadata): Seq[(String, String)] = {
    val b = Seq.newBuilder[(String, String)]
    def s(n: String, v: Option[String]): Unit = v.foreach(x => b += n -> jStr(x))
    def i(n: String, v: Option[Int]): Unit = v.foreach(x => b += n -> x.toString)
    def d(n: String, v: Option[Double]): Unit = v.foreach(x => b += n -> x.toString)
    def bool(n: String, v: Option[Boolean]): Unit = v.foreach(x => b += n -> x.toString)
    def ss(n: String, v: Option[Seq[String]]): Unit =
      v.foreach(x => b += n -> jArr(x.map(jStr)))

    s("filename", m.filename)
    s("file_directory", m.file_directory)
    s("filetype", m.filetype)
    s("url", m.url)
    s("last_modified", m.last_modified)
    s("attached_to_filename", m.attached_to_filename)
    m.data_source.foreach { ds =>
      val f = Seq.newBuilder[(String, String)]
      ds.url.foreach(x => f += "url" -> jStr(x))
      ds.version.foreach(x => f += "version" -> jStr(x))
      ds.record_locator.foreach { rl =>
        f += "record_locator" -> rl.toSeq.sortBy(_._1)
          .map { case (k, v) => jStr(k) + ":" + jStr(v) }.mkString("{", ",", "}")
      }
      ds.date_created.foreach(x => f += "date_created" -> jStr(x))
      ds.date_modified.foreach(x => f += "date_modified" -> jStr(x))
      ds.date_processed.foreach(x => f += "date_processed" -> jStr(x))
      ds.permissions_data.foreach { pd =>
        f += "permissions_data" -> jArr(pd.map(m =>
          m.toSeq.sortBy(_._1).map { case (k, v) => jStr(k) + ":" + jRaw(v) }
            .mkString("{", ",", "}")))
      }
      b += "data_source" -> f.result().map { case (k, v) => jStr(k) + ":" + v }
        .mkString("{", ",", "}")
    }
    i("page_number", m.page_number)
    s("page_name", m.page_name)
    m.coordinates.foreach { c =>
      // points can be null (not Nil) after a permissive wire read of a malformed
      // coordinates object — guard rather than NPE the whole writer.
      val pts = jArr(Option(c.points).getOrElse(Nil).map(p => s"[${p.x},${p.y}]"))
      val f = Seq.newBuilder[(String, String)]
      f += "points" -> pts
      c.system.foreach(x => f += "system" -> jStr(x))
      c.layout_width.foreach(x => f += "layout_width" -> x.toString)
      c.layout_height.foreach(x => f += "layout_height" -> x.toString)
      b += "coordinates" -> f.result().map { case (k, v) => jStr(k) + ":" + v }
        .mkString("{", ",", "}")
    }
    i("category_depth", m.category_depth)
    s("parent_id", m.parent_id)
    s("header_footer_type", m.header_footer_type)
    ss("emphasized_text_contents", m.emphasized_text_contents)
    ss("emphasized_text_tags", m.emphasized_text_tags)
    ss("link_texts", m.link_texts)
    ss("link_urls", m.link_urls)
    m.link_start_indexes.foreach(x => b += "link_start_indexes" -> x.mkString("[", ",", "]"))
    m.links.foreach { ls =>
      b += "links" -> jArr(ls.map { l =>
        val f = Seq.newBuilder[(String, String)]
        l.text.foreach(x => f += "text" -> jStr(x))
        l.url.foreach(x => f += "url" -> jStr(x))
        l.start_index.foreach(x => f += "start_index" -> x.toString)
        f.result().map { case (k, v) => jStr(k) + ":" + v }.mkString("{", ",", "}")
      })
    }
    ss("languages", m.languages)
    s("text_as_html", m.text_as_html)
    s("table_id", m.table_id)
    i("chunk_index", m.chunk_index)
    i("num_carried_over_header_rows", m.num_carried_over_header_rows)
    // list of SimpleTableCell dicts, field order x/y/w/h/content (to_dict)
    m.table_as_cells.foreach { cs =>
      b += "table_as_cells" -> jArr(cs.map { c =>
        Seq("\"x\":" + c.x, "\"y\":" + c.y, "\"w\":" + c.w, "\"h\":" + c.h,
          "\"content\":" + jStr(c.content)).mkString("{", ",", "}")
      })
    }
    // raw JSON array, NOT a quoted string — the reference serializes the
    // recursive key/value structure inline. Minified: a pretty-printed source
    // (reference files are indented) would embed newlines and break the
    // one-line NDJSON contract.
    m.key_value_pairs.foreach(x => b += "key_value_pairs" -> minifyJson(x))
    s("image_base64", m.image_base64)
    s("image_mime_type", m.image_mime_type)
    s("image_path", m.image_path)
    s("image_url", m.image_url)
    ss("sent_from", m.sent_from)
    ss("sent_to", m.sent_to)
    ss("cc_recipient", m.cc_recipient)
    ss("bcc_recipient", m.bcc_recipient)
    s("subject", m.subject)
    s("signature", m.signature)
    s("email_message_id", m.email_message_id)
    bool("is_continuation", m.is_continuation)
    s("orig_elements", m.orig_elements)
    d("detection_class_prob", m.detection_class_prob)
    s("detection_origin", m.detection_origin)
    // dict of list-of-record-dicts (elements.py:175): each entry serializes as
    // a JSON object; keys sorted for a deterministic wire (the reference emits
    // dict insertion order, which is unobservable across a Scala Map)
    m.enrichment_origins.foreach { eo =>
      def record(r: Map[String, String]): String =
        r.toSeq.sortBy(_._1).map { case (k, v) => jStr(k) + ":" + jStr(v) }
          .mkString("{", ",", "}")
      b += "enrichment_origins" -> eo.toSeq.sortBy(_._1)
        .map { case (k, vs) => jStr(k) + ":" + jArr(vs.map(record)) }
        .mkString("{", ",", "}")
    }
    d("segment_start_seconds", m.segment_start_seconds)
    d("segment_end_seconds", m.segment_end_seconds)
    b.result()
  }

  /** Metadata alone as a sparse JSON object (the reference's
    * `ElementMetadata.to_dict()` wire shape — unpopulated fields omitted). */
  def metadataJson(m: ElementMetadata): String =
    metadataFields(m).map { case (k, v) => jStr(k) + ":" + v }.mkString("{", ",", "}")

  /** One element as a sparse JSON object string. */
  def elementJson(e: Element): String = {
    val meta = metadataJson(e.metadata)
    val fields = Seq.newBuilder[String]
    fields += jStr("type") + ":" + jStr(e.`type`)
    fields += jStr("element_id") + ":" + jStr(e.element_id)
    fields += jStr("text") + ":" + jStr(e.text)
    fields += jStr("doc_id") + ":" + jStr(e.doc_id)
    fields += jStr("seq") + ":" + e.seq.toString
    fields += jStr("metadata") + ":" + meta
    e.embeddings.foreach(v => fields += jStr("embeddings") + ":" + v.mkString("[", ",", "]"))
    fields.result().mkString("{", ",", "}")
  }

  /** Elements as a JSON array (the `elements_to_json` document form). */
  def elementsJson(els: Seq[Element]): String =
    els.map(elementJson).mkString("[", ",", "]")

  /** Compacts raw JSON text: drops whitespace outside string literals. */
  def minifyJson(s: String): String = {
    val sb = new StringBuilder(s.length)
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        sb.append(c)
        if (c == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 1 }
        else if (c == '"') inStr = false
      } else if (c == '"') { inStr = true; sb.append(c) }
      else if (!Character.isWhitespace(c)) sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Decompression cap mirroring `staging/base.py:41` (`MAX_DECOMPRESSED_SIZE`). */
  val MaxDecompressedSize: Long = 200L * 1024 * 1024

  /** Thrown when a compressed payload inflates past [[MaxDecompressedSize]]
    * (`unstructured/errors.py` `DecompressedSizeExceededError`). */
  final class DecompressedSizeExceededException(message: String)
    extends RuntimeException(message)

  /** Despite the reference's function NAME (`elements_to_base64_gzipped_json`),
    * its wire format is zlib/DEFLATE (`zlib.compress`, `staging/base.py:256`) —
    * payloads start with 0x78 ("eJ…" in base64), not a gzip magic. Emitting real
    * gzip here would make our `orig_elements` unreadable by reference consumers
    * and vice versa, so these use `Deflater`/`Inflater` in their default zlib
    * wrapping. Names kept aligned with the reference's (misleading) terminology. */
  def gzipBase64(s: String): String = {
    val input = s.getBytes(StandardCharsets.UTF_8)
    val deflater = new java.util.zip.Deflater()
    // end() frees the native zlib stream NOW — leaving it to finalization leaks
    // native streams at one-per-group rates and stalls long-running JVMs
    // on the finalizer queue (observed 4 s -> 20-65 s drift for the codec query)
    try {
      deflater.setInput(input)
      deflater.finish()
      val bos = new ByteArrayOutputStream(math.max(64, input.length / 4))
      val buf = new Array[Byte](8192)
      while (!deflater.finished()) {
        val n = deflater.deflate(buf)
        bos.write(buf, 0, n)
      }
      java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
    } finally deflater.end()
  }

  /** Inverse of [[gzipBase64]] with the reference's two failure modes
    * (`staging/base.py:166-200`): a truncated stream raises, and decompression
    * past `maxBytes` raises [[DecompressedSizeExceededException]]. */
  def gunzipBase64(s: String, maxBytes: Long = MaxDecompressedSize): String = {
    val data = java.util.Base64.getDecoder.decode(s)
    val inflater = new java.util.zip.Inflater()
    try {
      inflater.setInput(data)
      val bos = new ByteArrayOutputStream(
        math.max(64, math.min(data.length.toLong * 4, 1L << 20).toInt))
      val buf = new Array[Byte](8192)
      while (!inflater.finished()) {
        val n = inflater.inflate(buf)
        if (n == 0) {
          if (inflater.finished()) ()
          else if (inflater.needsInput() || inflater.needsDictionary())
            throw new java.util.zip.ZipException(
              "incomplete zlib stream: ran out of input before end-of-stream")
        } else {
          bos.write(buf, 0, n)
          if (bos.size() > maxBytes)
            throw new DecompressedSizeExceededException(
              s"Decompressed size exceeds the maximum allowed size of $maxBytes bytes")
        }
      }
      new String(bos.toByteArray, StandardCharsets.UTF_8)
    } finally inflater.end()
  }

  /**
   * `orig_elements` codec — base64-gzipped JSON array of the pre-chunk's elements with
   * their own `orig_elements` stripped (no recursion) — `staging/base.py:241-260`,
   * `chunking/base.py:941-954`.
   */
  def encodeOrigElements(els: Seq[Element]): String =
    gzipBase64(elementsJson(els.map { e =>
      if (e.metadata.orig_elements.isEmpty) e
      else e.copy(metadata = e.metadata.copy(orig_elements = None))
    }))

  def decodeOrigElementsJson(s: String): String = gunzipBase64(s)
}
