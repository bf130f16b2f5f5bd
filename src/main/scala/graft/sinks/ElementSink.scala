package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{Element, ElementType}

/**
 * Staging/sink operators (`/root/reference/unstructured/staging/base.py`):
 * NDJSON/JSON element round-trip, type filtering, markdown/text rendering, CSV
 * flattening and precision rounding.
 *
 * The JSON writer emits the sparse wire format via [[ElementJson]] (absent = null);
 * reading back uses a schema-first `spark.read.json` so absent fields rehydrate as
 * nulls — the exact inverse (`partition_json`, `partition/json.py:30-100`).
 */
object ElementSink {

  private val elementEncoder = Encoders.product[Element]

  /**
   * The on-the-wire read schema: the `Element` encoder schema with
   * `metadata.coordinates.points` retyped to `ARRAY<ARRAY<DOUBLE>>`, and
   * `metadata.data_source.permissions_data` retyped to `ARRAY<STRING>`. The
   * reference serializes points as pair arrays `[[x, y], ...]`
   * (`elements.py:81-87`), not as `{x, y}` objects — reading a golden with the
   * struct-typed encoder schema would silently null the field under Spark's
   * permissive JSON parsing. Permission dicts are captured as raw JSON object
   * text (a `STRING` field under a JSON object token keeps the verbatim source),
   * because a `MAP<STRING, STRING>` read strips the quotes off string values —
   * `"id": "03887..."` (gdrive string id) and `"mode": 33188` (local int mode)
   * would become indistinguishable and could not be re-emitted faithfully.
   */
  lazy val wireSchema: StructType = {
    def patch(st: StructType, path: List[String], dt: DataType): StructType =
      StructType(st.fields.map { f =>
        path match {
          case name :: Nil if f.name == name => f.copy(dataType = dt)
          case name :: rest if f.name == name =>
            f.copy(dataType = patch(f.dataType.asInstanceOf[StructType], rest, dt))
          case _ => f
        }
      })
    patch(
      patch(elementEncoder.schema, List("metadata", "coordinates", "points"),
        ArrayType(ArrayType(DoubleType))),
      List("metadata", "data_source", "permissions_data"), ArrayType(StringType))
  }

  /** Raw permission-dict JSON -> map of raw value tokens (string values keep their
    * quotes; numbers/bools/null/containers their literal text) — the writer re-emits
    * them verbatim, so `"03887..."` stays a string and `33188` stays a number. */
  private val permsToMaps =
    udf((arr: Seq[String]) =>
      if (arr == null) null else arr.map(RawJson.objectRawTokens))

  /** Convert a wire-schema frame (pair-array points, raw permission dicts) to the
    * typed element model. */
  def fromWire(df: DataFrame): Dataset[Element] = {
    val points = transform(col("metadata.coordinates.points"),
      p => struct(p.getItem(0).as("x"), p.getItem(1).as("y")))
    df.withColumn("metadata", col("metadata")
        .withField("coordinates.points", points)
        .withField("data_source.permissions_data",
          permsToMaps(col("metadata.data_source.permissions_data"))))
      .as(elementEncoder)
  }

  /** Read reference-serialized element JSON (array files or NDJSON) into the model. */
  def readWireJson(spark: SparkSession, path: String, multiLine: Boolean = false): DataFrame =
    spark.read.option("multiLine", multiLine.toString).schema(wireSchema).json(path)

  /** One sparse-JSON line per element — `elements_to_ndjson` (`staging/base.py:458-478`). */
  def toNdjson(ds: Dataset[Element]): Dataset[String] = {
    val sp = ds.sparkSession
    import sp.implicits._
    ds.map(ElementJson.elementJson _)
  }

  /** `elements_to_ndjson` to disk. Sorting by (doc_id, seq) inside partitions keeps
    * reading order stable per file. */
  def writeNdjson(ds: Dataset[Element], path: String): Unit =
    toNdjson(ds.sortWithinPartitions(col("doc_id"), col("seq"))).write.mode("overwrite").text(path)

  /** `elements_from_json` / `partition_json` rehydrate — schema-first JSON read
    * through the wire shim (pair-array points → `Point` structs). */
  def readNdjson(spark: SparkSession, path: String): Dataset[Element] =
    fromWire(readWireJson(spark, path))

  /** Parse element JSON lines (driver/test-side rehydrate). */
  def parseNdjson(spark: SparkSession, lines: Seq[String]): Dataset[Element] = {
    import spark.implicits._
    fromWire(spark.read.schema(wireSchema).json(lines.toDS()))
  }

  /** Element type strings `elements_from_dicts` recognizes
    * (`TYPE_TO_TEXT_ELEMENT_MAP`, `elements.py:1051-1090`, plus CheckBox):
    * canonical names and every layout-label alias. */
  val KnownWireTypes: Set[String] = {
    val T = graft.model.ElementType
    Set(T.Title, T.NarrativeText, T.UncategorizedText, T.ListItem, T.Address,
      T.EmailAddress, T.Image, T.PageBreak, T.Table, T.TableChunk,
      T.CompositeElement, T.Header, T.Footer, T.Formula, T.FigureCaption,
      T.CodeSnippet, T.PageNumber, T.Form, T.FormKeysValues, T.CheckBox,
      "DocumentData", "BulletedText", "List-item-other", "Threading") ++
      T.NormalizationMap.keySet
  }

  /**
   * `partition_json` — `partition/json.py:30-103`: rehydrate serialized
   * elements with the reference's validation semantics. Blank text yields no
   * elements; text that does not look like a JSON array of objects
   * (`LIST_OF_DICTS_PATTERN`, `nlp/patterns.py:115`), or parses but contains
   * no dict with a recognized `type` (`elements_from_dicts` skips unknowns),
   * raises; malformed JSON (trailing garbage, unbalanced brackets) raises.
   * Dicts with unrecognized types are dropped, as in the reference.
   */
  def partitionJson(spark: SparkSession, text: String): Dataset[Element] = {
    import spark.implicits._
    if (text.trim.isEmpty) return spark.emptyDataset[Element]
    if (!RawJson.looksLikeListOfDicts(text))
      throw new IllegalArgumentException(
        "JSON cannot be partitioned. Schema does not match the Unstructured schema.")
    val objs = RawJson.splitStrictJsonArray(text)
    if (objs.isEmpty) return spark.emptyDataset[Element]
    val known = objs.filter { o =>
      RawJson.objectRawTokens(o).get("type")
        .map(_.stripPrefix("\"").stripSuffix("\""))
        .exists(KnownWireTypes.contains)
    }
    if (known.isEmpty)
      throw new IllegalArgumentException(
        "JSON cannot be partitioned. Schema does not match the Unstructured schema.")
    parseNdjson(spark, withEngineIds(known))
  }

  /** The reference wire has no doc_id/seq (implicit: file scope + array
    * order); inject them at the token level so rehydrated elements keep their
    * serialized order under any partitioning. */
  private def withEngineIds(objs: Seq[String]): Seq[String] =
    objs.zipWithIndex.map { case (o, i) =>
      val toks = RawJson.objectRawTokens(o)
      val inject = Seq(
        if (toks.contains("seq")) None else Some(s""""seq":${i + 1}"""),
        if (toks.contains("doc_id")) None else Some(""""doc_id":"json"""")).flatten
      if (inject.isEmpty) o
      else {
        val body = o.trim.stripPrefix("{").trim
        "{" + inject.mkString(",") + (if (body.startsWith("}")) "" else ",") + body
      }
    }

  /** `partition_ndjson` — one serialized element per line; same per-dict
    * validation as [[partitionJson]] (`partition/ndjson.py`). */
  def partitionNdjsonText(spark: SparkSession, text: String): Dataset[Element] = {
    val lines = text.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
    if (lines.isEmpty) return {
      import spark.implicits._; spark.emptyDataset[Element]
    }
    val objs = lines.flatMap(l => RawJson.splitStrictJsonArray(s"[$l]"))
    val known = objs.filter { o =>
      RawJson.objectRawTokens(o).get("type")
        .map(_.stripPrefix("\"").stripSuffix("\""))
        .exists(KnownWireTypes.contains)
    }
    if (known.isEmpty)
      throw new IllegalArgumentException(
        "NDJSON cannot be partitioned. Schema does not match the Unstructured schema.")
    parseNdjson(spark, withEngineIds(known))
  }

  /**
   * `filter_element_types` — include XOR exclude (`staging/base.py:705-731`).
   * Plain predicate pushdown-friendly filter: at scale this prunes at the parquet
   * row-group level when the lake is written with `type` statistics.
   */
  def filterElementTypes(ds: Dataset[Element], include: Seq[String] = Nil,
      exclude: Seq[String] = Nil): Dataset[Element] = {
    require(include.isEmpty || exclude.isEmpty,
      "Only one of include and exclude may be specified") // base.py:714-718
    if (include.nonEmpty) ds.filter(col("type").isin(include: _*))
    else if (exclude.nonEmpty) ds.filter(!col("type").isin(exclude: _*))
    else ds
  }

  /** `element_to_md` render — `staging/base.py:273-305` — as a codegen'd expression
    * over (type, text, text_as_html, image_base64, image_mime_type, image_url).
    * With `excludeBinary` the base64 data-URL cases are skipped and an Image falls
    * through to its `image_url` render (if any) or bare text, matching the
    * reference's guard ordering. */
  def elementMd(tpe: org.apache.spark.sql.Column, text: org.apache.spark.sql.Column,
      textAsHtml: org.apache.spark.sql.Column,
      imageBase64: org.apache.spark.sql.Column,
      imageMime: org.apache.spark.sql.Column,
      imageUrl: org.apache.spark.sql.Column,
      excludeBinary: Boolean = false,
      normalizeFormula: Boolean = true,
      formulaStyle: String = graft.functions.expr.FormulaMarkdown.Auto)
      : org.apache.spark.sql.Column = {
    val binary = lit(!excludeBinary)
    when(tpe === ElementType.Title, concat(lit("# "), text))
      .when(tpe === ElementType.Formula,
        graft.functions.expr.FormulaMarkdown.column(text, normalizeFormula, formulaStyle))
      .when(tpe === ElementType.Table && textAsHtml.isNotNull, textAsHtml)
      .when(tpe === ElementType.Image && imageBase64.isNotNull && imageMime.isNull && binary,
        concat(lit("!["), text, lit("](data:image/*;base64,"), imageBase64, lit(")")))
      .when(tpe === ElementType.Image && imageBase64.isNotNull && binary,
        concat(lit("!["), text, lit("](data:"), imageMime, lit(";base64,"), imageBase64, lit(")")))
      .when(tpe === ElementType.Image && imageUrl.isNotNull,
        concat(lit("!["), text, lit("]("), imageUrl, lit(")")))
      .otherwise(text)
  }

  /** `elements_to_md` — per-doc markdown document (`staging/base.py:307-350`). */
  def elementsToMd(ds: Dataset[Element], excludeBinary: Boolean = false,
      normalizeFormula: Boolean = true,
      formulaStyle: String = graft.functions.expr.FormulaMarkdown.Auto): DataFrame =
    ds.select(col("doc_id"), col("seq"),
      elementMd(col("type"), col("text"), col("metadata.text_as_html"),
        col("metadata.image_base64"), col("metadata.image_mime_type"),
        col("metadata.image_url"), excludeBinary, normalizeFormula, formulaStyle).as("md"))
      .groupBy("doc_id")
      .agg(concat_ws("\n", array_sort(collect_list(struct(col("seq"), col("md"))))
        .getField("md")).as("markdown"))

  /** `convert_to_text` — newline-joined non-empty element text per doc
    * (`staging/base.py:529-548`). */
  def convertToText(ds: Dataset[Element]): DataFrame =
    ds.filter(col("text").isNotNull && col("text") =!= "")
      .groupBy("doc_id")
      .agg(concat_ws("\n", array_sort(collect_list(struct(col("seq"), col("text"))))
        .getField("text")).as("text"))

  /** `convert_to_csv` flat column set — `staging/base.py:507-526,604-624`: core
    * fields + flattened metadata (coordinates exploded, `sender` = first sent_from). */
  def flattenForCsv(ds: Dataset[Element]): DataFrame =
    ds.select(
      col("type"), col("text"), col("element_id"),
      col("doc_id"), col("seq"),
      col("metadata.filename").as("filename"),
      col("metadata.file_directory").as("file_directory"),
      col("metadata.filetype").as("filetype"),
      col("metadata.url").as("url"),
      col("metadata.last_modified").as("last_modified"),
      col("metadata.page_number").as("page_number"),
      col("metadata.page_name").as("page_name"),
      col("metadata.category_depth").as("category_depth"),
      col("metadata.parent_id").as("parent_id"),
      concat_ws(";", col("metadata.languages")).as("languages"),
      col("metadata.text_as_html").as("text_as_html"),
      col("metadata.is_continuation").as("is_continuation"),
      element_at(col("metadata.sent_from"), 1).as("sender"),
      col("metadata.subject").as("subject"),
      to_json(col("metadata.coordinates.points")).as("coordinates_points"),
      col("metadata.coordinates.system").as("coordinates_system"),
      col("metadata.coordinates.layout_width").as("coordinates_layout_width"),
      col("metadata.coordinates.layout_height").as("coordinates_layout_height"))

  /** `_fix_metadata_field_precision` — coords to 1dp (PixelSpace; 2dp otherwise),
    * detection prob to 5dp (`staging/base.py:481-504`). */
  def fixMetadataFieldPrecision(ds: Dataset[Element]): Dataset[Element] = {
    val sp = ds.sparkSession
    import sp.implicits._
    ds.map { e =>
      val m = e.metadata
      val m2 = m.coordinates match {
        case Some(c) =>
          val p = if (c.system.contains("PixelSpace")) 1 else 2
          def r(v: Double): Double =
            BigDecimal(v).setScale(p, BigDecimal.RoundingMode.HALF_EVEN).toDouble
          m.copy(coordinates = Some(c.copy(points = c.points.map(pt =>
            pt.copy(x = r(pt.x), y = r(pt.y))))))
        case None => m
      }
      val m3 = m2.detection_class_prob match {
        case Some(v) => m2.copy(detection_class_prob = Some(
          BigDecimal(v).setScale(5, BigDecimal.RoundingMode.HALF_EVEN).toDouble))
        case None => m2
      }
      e.copy(metadata = m3)
    }
  }
}

/**
 * Minimal raw-token scanner for wire permission dicts: splits one JSON object's
 * source text into (key, raw value token) pairs without interpreting the values.
 * Spark's own JSON map reader cannot do this — it converts every scalar token to
 * its unquoted text, losing the string/number distinction the reference wire
 * carries (`DataSourceMetadata.permissions_data: List[Dict[str, Any]]`).
 */
private[sinks] object RawJson {

  def objectRawTokens(src: String): Map[String, String] = {
    val s = if (src == null) "" else src
    val n = s.length
    var i = 0

    def skipWs(): Unit = { while (i < n && Character.isWhitespace(s.charAt(i))) i += 1 }

    // scan a quoted string starting at s(i) == '"'; returns the raw slice with quotes
    def scanString(): String = {
      val start = i
      i += 1
      while (i < n && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') i += 1
        i += 1
      }
      if (i < n) i += 1
      s.substring(start, i)
    }

    def scanValue(): String = {
      skipWs()
      if (i >= n) return ""
      s.charAt(i) match {
        case '"' => scanString()
        case '{' | '[' =>
          val start = i
          var depth = 0
          while (i < n) {
            s.charAt(i) match {
              case '"' => scanString()
              case c @ ('{' | '[') => depth += 1; i += 1; val _ = c
              case c @ ('}' | ']') =>
                depth -= 1; i += 1; val _ = c
                if (depth == 0) return s.substring(start, i)
              case _ => i += 1
            }
          }
          s.substring(start, i)
        case _ =>
          val start = i
          while (i < n && s.charAt(i) != ',' && s.charAt(i) != '}' && s.charAt(i) != ']' &&
            !Character.isWhitespace(s.charAt(i))) i += 1
          s.substring(start, i)
      }
    }

    // JSON string unescape for keys (keys in permission dicts are plain names, but
    // handle the full escape set anyway)
    def unescapeKey(raw: String): String = {
      val body = raw.stripPrefix("\"").stripSuffix("\"")
      if (!body.contains('\\')) return body
      val b = new java.lang.StringBuilder(body.length)
      var j = 0
      while (j < body.length) {
        val c = body.charAt(j)
        if (c == '\\' && j + 1 < body.length) {
          body.charAt(j + 1) match {
            case 'n' => b.append('\n'); j += 2
            case 't' => b.append('\t'); j += 2
            case 'r' => b.append('\r'); j += 2
            case 'b' => b.append('\b'); j += 2
            case 'f' => b.append('\f'); j += 2
            case 'u' if j + 5 < body.length &&
                body.substring(j + 2, j + 6).forall(ch =>
                  Character.digit(ch, 16) >= 0) =>
              b.append(Integer.parseInt(body.substring(j + 2, j + 6), 16).toChar); j += 6
            case other => b.append(other); j += 2
          }
        } else { b.append(c); j += 1 }
      }
      b.toString
    }

    val out = Map.newBuilder[String, String]
    skipWs()
    if (i < n && s.charAt(i) == '{') {
      i += 1
      var done = false
      while (!done) {
        skipWs()
        if (i >= n || s.charAt(i) == '}') done = true
        else {
          val key = unescapeKey(scanString())
          skipWs()
          if (i < n && s.charAt(i) == ':') i += 1
          out += key -> scanValue()
          skipWs()
          if (i < n && s.charAt(i) == ',') i += 1 else done = true
        }
      }
    }
    out.result()
  }

  /** `LIST_OF_DICTS_PATTERN` (`nlp/patterns.py:115`) — prefix probe only. */
  def looksLikeListOfDicts(text: String): Boolean = {
    var i = 0
    val n = text.length
    while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
    i < n && text.charAt(i) == '['
  }

  /**
   * Strict top-level JSON array splitter: returns the raw text of each array
   * entry, validating bracket/string structure and rejecting trailing garbage
   * (`json.loads` strictness — `'[...]]'` raises). Entry contents are NOT
   * fully validated (the schema-first Spark reader handles field-level
   * parsing); structure is.
   */
  def splitStrictJsonArray(text: String): Seq[String] = {
    val s = text
    val n = s.length
    var i = 0
    def fail(): Nothing = throw new IllegalArgumentException("Not a valid json")
    def ws(): Unit = { while (i < n && Character.isWhitespace(s.charAt(i))) i += 1 }
    def skipString(): Unit = {
      // at s(i) == '"'
      i += 1
      while (i < n && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') i += 1
        i += 1
      }
      if (i >= n) fail()
      i += 1
    }
    def skipValue(): Unit = {
      ws()
      if (i >= n) fail()
      s.charAt(i) match {
        case '"' => skipString()
        case '{' =>
          i += 1; ws()
          if (i < n && s.charAt(i) == '}') { i += 1 }
          else {
            var done = false
            while (!done) {
              ws()
              if (i >= n || s.charAt(i) != '"') fail()
              skipString(); ws()
              if (i >= n || s.charAt(i) != ':') fail()
              i += 1
              skipValue(); ws()
              if (i < n && s.charAt(i) == ',') i += 1
              else if (i < n && s.charAt(i) == '}') { i += 1; done = true }
              else fail()
            }
          }
        case '[' =>
          i += 1; ws()
          if (i < n && s.charAt(i) == ']') { i += 1 }
          else {
            var done = false
            while (!done) {
              skipValue(); ws()
              if (i < n && s.charAt(i) == ',') i += 1
              else if (i < n && s.charAt(i) == ']') { i += 1; done = true }
              else fail()
            }
          }
        case c if c == '-' || (c >= '0' && c <= '9') =>
          val numStart = i
          while (i < n && "+-.eE0123456789".indexOf(s.charAt(i)) >= 0) i += 1
          if (i == numStart) fail()
        case 't' if s.startsWith("true", i) => i += 4
        case 'f' if s.startsWith("false", i) => i += 5
        case 'n' if s.startsWith("null", i) => i += 4
        case _ => fail()
      }
    }
    ws()
    if (i >= n || s.charAt(i) != '[') fail()
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    i += 1; ws()
    if (i < n && s.charAt(i) == ']') i += 1
    else {
      var done = false
      while (!done) {
        ws()
        val start = i
        skipValue()
        out += s.substring(start, i)
        ws()
        if (i < n && s.charAt(i) == ',') i += 1
        else if (i < n && s.charAt(i) == ']') { i += 1; done = true }
        else fail()
      }
    }
    ws()
    if (i != n) fail()
    out.toSeq
  }
}
