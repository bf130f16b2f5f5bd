package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Element
import graft.operators.{Chunker, ChunkingOptions}

/**
 * Per-tool staging reshapes (the `/root/reference/unstructured/staging` modules) —
 * each is a projection of the element frame into the shape a downstream tool
 * ingests.
 */
object Staging {

  /** `stage_for_weaviate` (`staging/weaviate.py:23-43`): flattened metadata
    * properties + `text` + `category` (coordinates/orig_elements excluded). */
  def stageForWeaviate(ds: Dataset[Element]): DataFrame =
    ds.select(
      col("text"), col("type").as("category"),
      col("metadata.filename").as("filename"),
      col("metadata.file_directory").as("file_directory"),
      col("metadata.filetype").as("filetype"),
      col("metadata.url").as("url"),
      col("metadata.last_modified").as("last_modified"),
      col("metadata.page_number").as("page_number"),
      col("metadata.page_name").as("page_name"),
      col("metadata.category_depth").as("category_depth"),
      col("metadata.parent_id").as("parent_id"),
      col("metadata.languages").as("languages"),
      col("metadata.text_as_html").as("text_as_html"),
      col("metadata.sent_from").as("sent_from"),
      col("metadata.sent_to").as("sent_to"),
      col("metadata.subject").as("subject"),
      col("metadata.email_message_id").as("email_message_id"))

  /** Metadata keys `stage_for_weaviate` drops (`staging/weaviate.py:11-20`). */
  val WeaviateExcludeMetadataKeys: Set[String] = Set(
    "coordinates", "data_source", "detection_class_prob", "emphasized_texts",
    "is_continuation", "links", "orig_elements", "key_value_pairs")

  /** `create_unstructured_weaviate_class` (`staging/weaviate.py:45-86`): the
    * Weaviate class schema for element uploads, derived from the engine's
    * `ElementMetadata` Spark schema the way the reference derives it from the
    * dataclass annotations — `text` + `category` first, then every
    * non-excluded metadata field with its annotation mapped to a Weaviate
    * dataType (`:88-98`: str→text, int→int, float→number). */
  def createUnstructuredWeaviateClass(
      className: String = "UnstructuredDocument"): (String, Seq[(String, Seq[String])]) = {
    import org.apache.spark.sql.types._
    def dataTypeOf(dt: DataType): Seq[String] = dt match {
      case IntegerType | LongType => Seq("int")
      case DoubleType | FloatType => Seq("number")
      case ArrayType(e, _) => dataTypeOf(e)
      case _ => Seq("text") // strings, and str-keyed composites (`"str" in annotation`)
    }
    val metaSchema = org.apache.spark.sql.Encoders.product[graft.model.ElementMetadata].schema
    val props = Seq("text" -> Seq("text"), "category" -> Seq("text")) ++
      metaSchema.fields.toSeq
        .filterNot(f => WeaviateExcludeMetadataKeys.contains(f.name))
        .map(f => f.name -> dataTypeOf(f.dataType))
    (className, props)
  }

  /** `stage_for_prodigy` (`staging/prodigy.py:39-57`): text + meta dict rows. */
  def stageForProdigy(ds: Dataset[Element]): DataFrame =
    ds.select(col("text"),
      struct(col("element_id").as("id"), col("type").as("category"),
        col("metadata.filename").as("filename")).as("meta"))

  /** `stage_for_label_studio` (`staging/label_studio.py:113+`): one task per
    * element with the text under `data.<text_field>` and the element id under
    * `data.<id_field>` (both names caller-configurable, as upstream). */
  def stageForLabelStudio(ds: Dataset[Element], textField: String = "text",
      idField: String = "ref_id"): DataFrame =
    ds.select(struct(col("text").as(textField), col("element_id").as(idField)).as("data"))

  /** `stage_for_baseplate` (`staging/baseplate.py:27`): rows-of-columns layout. */
  def stageForBaseplate(ds: Dataset[Element]): DataFrame =
    ds.select(
      map(lit("text"), col("text"), lit("type"), col("type"),
        lit("element_id"), col("element_id")).as("data"))

  /**
   * `stage_for_transformers` / `chunk_by_attention_window`
   * (`staging/huggingface.py:9-100`): narrative/plain text split into
   * attention-window-sized chunks (whitespace token count + buffer), other
   * element types pass through. Reuses the chunking kernel's splitter per doc.
   */
  /** `chunk_by_attention_window` on one string (`staging/huggingface.py:32-100`):
    * `splitFunction` segments greedily packed into `maxInputSize - buffer`
    * token windows (the buffer accounts for special tokens like `[CLS]`);
    * a single segment over the window raises, mirroring the reference's
    * ValueError (`:76-83`). `tokenize` defaults to whitespace tokens — plug
    * [[graft.operators.TokenCounter]] for a BPE count. */
  def chunkByAttentionWindow(text: String, maxInputSize: Int = 512,
      buffer: Int = 2,
      splitFunction: String => Seq[String] = _.split(" ", -1).toSeq,
      chunkSeparator: String = " ",
      tokenize: String => Int = _.split(" ", -1).length): Seq[String] = {
    require(buffer >= 0 && buffer < maxInputSize,
      s"buffer is set to $buffer. Must be greater than zero and smaller than " +
        s"max_input_size, which is $maxInputSize.")
    val maxChunkSize = maxInputSize - buffer
    val splitText = splitFunction(text)
    val chunks = scala.collection.mutable.ArrayBuffer.empty[String]
    val chunkText = new StringBuilder
    var chunkSize = 0
    for ((segment, i) <- splitText.zipWithIndex) {
      val numTokens = tokenize(segment)
      if (numTokens > maxChunkSize)
        throw new IllegalArgumentException(
          s"The number of tokens in the segment is $numTokens. " +
            s"The maximum number of tokens is $maxChunkSize.")
      if (chunkSize + numTokens > maxChunkSize) {
        chunks += chunkText.toString + chunkSeparator.strip()
        chunkText.clear()
        chunkSize = 0
      }
      if (chunkSize > 0) chunkText ++= chunkSeparator
      chunkText ++= segment
      chunkSize += numTokens
      if (i == splitText.length - 1 && chunkText.nonEmpty)
        chunks += chunkText.toString
    }
    chunks.toSeq
  }

  def stageForTransformers(ds: Dataset[Element], maxInputSize: Int = 512,
      buffer: Int = 2): Dataset[Element] = {
    require(buffer >= 0 && buffer < maxInputSize,
      s"buffer is set to $buffer. Must be greater than zero and smaller than " +
        s"max_input_size, which is $maxInputSize.")
    val sp = ds.sparkSession
    import sp.implicits._
    ds.flatMap { e =>
      // the reference chunks every `Text` subclass — which is every textual
      // element type in the model; empty/absent text passes through untouched
      if (e.text == null || e.text.isEmpty) Iterator.single(e)
      else chunkByAttentionWindow(e.text, maxInputSize, buffer).iterator
        .map(t => e.copy(text = t))
    }
  }

  /** `stage_for_datasaur` (`staging/datasaur.py:6-24`): text + entity-list rows
    * (entities default empty; caller-supplied column must match the reference's
    * `{text, type, start_idx, end_idx}` entity shape). */
  def stageForDatasaur(ds: Dataset[Element],
      entities: Option[org.apache.spark.sql.Column] = None): DataFrame =
    ds.select(col("text"),
      entities.getOrElse(array().cast(
        "array<struct<text:string,type:string,start_idx:int,end_idx:int>>"))
        .as("entities"))

  /** `stage_for_label_box` (`staging/label_box.py:40-100`): import-config records
    * (`{data, attachments, externalId}`); the reference's driver loop writing one
    * text file per element becomes the `data`-addressed frame a
    * `DataFrameWriter.partitionBy` dump materializes executor-side. */
  def stageForLabelBox(ds: Dataset[Element], urlPrefix: String): DataFrame =
    ds.select(
      concat(lit(urlPrefix.stripSuffix("/") + "/"), col("element_id"), lit(".txt"))
        .as("data"),
      array().cast("array<struct<type:string,value:string>>").as("attachments"),
      col("element_id").as("externalId"),
      col("text"))

  /** `stage_for_argilla` text-classification records (`staging/argilla.py:14-60`):
    * id + text (task-specific prediction/annotation columns ride along unchanged). */
  def stageForArgilla(ds: Dataset[Element]): DataFrame =
    ds.select(col("element_id").as("id"), col("text"))

  /** `stage_csv_for_prodigy` (`staging/prodigy.py:60-90`): the text,id CSV form. */
  def stageCsvForProdigy(ds: Dataset[Element]): DataFrame =
    ds.select(col("text"), col("element_id").as("id"))

  /** `convert_to_coco` (`staging/base.py:734+`): COCO-style detection records
    * from elements carrying coordinates. */
  def convertToCoco(ds: Dataset[Element]): DataFrame =
    ds.filter(col("metadata.coordinates").isNotNull)
      .select(
        col("element_id").as("id"),
        col("doc_id").as("image_id"),
        col("type").as("category_name"),
        struct(
          element_at(col("metadata.coordinates.points"), 1).getField("x").as("x"),
          element_at(col("metadata.coordinates.points"), 1).getField("y").as("y"))
          .as("bbox_origin"),
        col("metadata.coordinates.layout_width").as("width"),
        col("metadata.coordinates.layout_height").as("height"))

  /**
   * `flatten_dict` (`staging/base.py:551-600`) — the driver-side nested-map
   * flattener used when reshaping dynamic JSON metadata (e.g. the weaviate /
   * label-studio property bags). Engine-side metadata flattening is schema-driven
   * (`ElementSink.flattenForCsv`); this covers the arbitrary-JSON case.
   *
   * Keys in `keysToOmit` are kept with their UNflattened value; with an omitted
   * nested key, address it as `parent<separator>key`. `flattenLists` expands
   * `Seq` values to indexed keys; `removeNone` drops `null`/`None` values
   * (including inside expanded lists).
   */
  def flattenDict(dictionary: Seq[(String, Any)], parentKey: String = "",
      separator: String = "_", flattenLists: Boolean = false,
      removeNone: Boolean = false, keysToOmit: Seq[String] = Nil): Map[String, Any] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    def isNone(v: Any): Boolean = v == null || v == None
    dictionary.foreach { case (key, value) =>
      val newKey = if (parentKey.nonEmpty) s"$parentKey$separator$key" else key
      if (keysToOmit.contains(newKey)) out += newKey -> value
      else if (isNone(value) && removeNone) ()
      else value match {
        case m: Map[_, _] =>
          out ++= flattenDict(m.toSeq.asInstanceOf[Seq[(String, Any)]], newKey,
            separator, flattenLists, removeNone, keysToOmit)
        case l: Seq[_] if flattenLists =>
          l.zipWithIndex.foreach { case (item, i) =>
            out ++= flattenDict(Seq(s"$newKey$separator$i" -> item), "", separator,
              flattenLists, removeNone, keysToOmit)
          }
        case other => out += newKey -> other
      }
    }
    out.toMap
  }

  /** Map overload — insertion order is irrelevant to the flattened result. */
  def flattenDict(dictionary: Map[String, Any]): Map[String, Any] =
    flattenDict(dictionary.toSeq)
}
