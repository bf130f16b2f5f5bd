package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Element, ElementMetadata, ElementType}
import graft.operators.{Chunker, ChunkingOptions}
import graft.queries.{OracleSql => O}
import graft.sources.TextSource

/**
 * The partition → chunk pipeline as declared queries: `partition_text` produces
 * element rows from the `documents` corpus (paragraph breaks injected by replacing a
 * frequent token — construction mirrored in the oracle), and the chunking kernel
 * consumes them.
 *
 * The chunk oracles are an INDEPENDENT re-implementation of the greedy fold as a
 * DuckDB recursive CTE (per-doc sequential walk), not a replay of the Spark code —
 * they verify pre-chunk packing with separator accounting and (for by_title) Title
 * boundaries. Element texts are truncated to 100 chars so no element exceeds the
 * window (the oversized-split path is covered by ChunkerSpec unit tests, which the
 * CTE could not express).
 *
 * Scale: partition is a per-doc flatMap (no shuffle); chunking is one shuffle on
 * doc_id with streaming per-group folds — the plan at 100 TB is scan → exchange on
 * doc_id → per-group fold, with AQE handling skewed giant documents.
 */
object PipelineQueries {

  // fan-out read: the paragraph split + classifier cascade run BEFORE the
  // chunkers' doc_id shuffle, so a single-split scan would funnel that CPU work
  // through one core (see Tables.readFanout — no-op at real scale)
  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.readFanout(s, dir, "documents")

  /** documents with paragraph breaks injected at every " merge " token. */
  private def withParagraphs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      replace(col("text"), lit(" merge "), lit("\n\n")).as("text"))

  private def partitioned(s: SparkSession, dir: String): DataFrame =
    TextSource.partitionText(withParagraphs(s, dir), col("text"))

  /** Element stream for the chunkers: texts truncated to 100 chars. */
  private def elements(s: SparkSession, dir: String): Dataset[Element] = {
    import s.implicits._
    partitioned(s, dir)
      .select(col("doc_id"), col("seq"), col("element_type"), substring(col("text"), 1, 100).as("text"))
      .as[(String, Long, String, String)]
      .map { case (d, q, tpe, t) => Element("", tpe, t, d, q) }
  }

  /** Untruncated element stream for the metadata chain. */
  private def fullElements(s: SparkSession, dir: String): Dataset[Element] = {
    import s.implicits._
    partitioned(s, dir)
      .select(col("doc_id"), col("seq"), col("element_type"), col("text"))
      .as[(String, Long, String, String)]
      .map { case (d, q, tpe, t) => Element("", tpe, t, d, q) }
  }

  private def chunkResult(chunked: Dataset[Element]): DataFrame =
    chunked.select(
      col("doc_id").cast("long").as("doc_id"),
      col("seq").as("chunk_seq"),
      col("text"))
      .orderBy("doc_id", "chunk_seq")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_partition_text" -> ((s, dir) =>
      partitioned(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("seq"),
          col("element_type"), col("text"))
        .orderBy("doc_id", "seq")),

    "q_chunk_basic" -> ((s, dir) =>
      chunkResult(Chunker.chunkElements(elements(s, dir),
        ChunkingOptions(maxCharacters = 120, includeOrigElements = false)))),

    // the same chunk fold routed through the first-class logical node +
    // strategy (org.apache.spark.sql.graft.ChunkPlan) — the plan-visible
    // path the doc-filter pushdown rule targets; identical oracle
    "q_chunk_plan_node" -> ((s, dir) =>
      chunkResult(org.apache.spark.sql.graft.ChunkPlan.chunkElements(
        elements(s, dir),
        ChunkingOptions(maxCharacters = 120, includeOrigElements = false)))),

    "q_chunk_by_title" -> ((s, dir) =>
      chunkResult(Chunker.chunkByTitle(elements(s, dir),
        ChunkingOptions(maxCharacters = 120, includeOrigElements = false,
          combineTextUnderNChars = Some(0))))),

    // Structured-Streaming chunk_elements: same derivation and options as
    // q_chunk_basic, folded incrementally per doc with EndOfDocument control
    // markers flushing the open tail — verified by the SAME batch oracle (the
    // incremental fold equals the batch fold, pinned in ChunkerSpec).
    // splitBatches = 3 stages every document's elements across THREE
    // micro-batches (maxFilesPerTrigger = 1), so the oracle gate verifies the
    // carry/nextSeq/overlap state across real batch boundaries, not just the
    // single-batch drain.
    "q_stream_chunk_basic" -> ((s, dir) =>
      graft.streaming.StreamingOps.chunkBasicAvailableNow(s,
        dir + "/documents.parquet",
        ChunkingOptions(maxCharacters = 120, includeOrigElements = false),
        splitBatches = 3)),

    // by_title with small-chunk recombination ENABLED (PreChunkCombiner,
    // base.py:1734-1809): 30-char elements make most pre-chunks far under the
    // window, so adjacent small sections genuinely recombine (first under
    // combine_text_under_n_chars AND joint within max_characters). The oracle
    // re-walks both folds: the boundary/fit pre-chunk walk, then the adjacent
    // combine walk over pre-chunk texts.
    "q_chunk_combine" -> ((s, dir) => {
      import s.implicits._
      val els = partitioned(s, dir)
        .select(col("doc_id"), col("seq"), col("element_type"),
          substring(col("text"), 1, 30).as("text"))
        .as[(String, Long, String, String)]
        .map { case (d, q, tpe, t) => Element("", tpe, t, d, q) }
      chunkResult(Chunker.chunkByTitle(els,
        ChunkingOptions(maxCharacters = 120, includeOrigElements = false,
          combineTextUnderNChars = Some(120))))
    }),

    // token-mode chunking: window measured with the deterministic regex tokenizer
    // (max_tokens, chunking/base.py:176-190). Oversized elements exercise the
    // token splitter's rightmost-space scan (greedy word packing).
    "q_chunk_tokens" -> ((s, dir) =>
      chunkResult(Chunker.chunkElements(elements(s, dir),
        ChunkingOptions(maxTokens = Some(24), includeOrigElements = false)))),

    // BPE token-mode chunking: fixed canonical elements per doc, window
    // measured by the corpus-derived merge-rule tokenizer ([[TokenCounter]],
    // the reference's tiktoken-backed counter with an offline vocabulary).
    // The oracle rows come from an independent Python implementation of the
    // same published BPE algorithm over the same committed merge table.
    "q_chunk_tokens_bpe" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.TokenCounter
      graft.Tables.readFanout(s, dir, "documents")
        .select(col("doc_id").cast("long")).as[Long]
        .flatMap { d =>
          val els = Seq(
            "Well, Prince, so Genoa and Lucca are now just family estates.",
            "It was in July, 1805, and the speaker was the well-known Anna Pavlovna.",
            "Heavens! what a virulent attack! replied the prince, not in the " +
              "least disconcerted by this reception.")
            .zipWithIndex.map { case (t, i) =>
              Element("", "NarrativeText", t, d.toString, i + 1L)
            }
          Chunker.chunkDoc(d.toString, els.iterator,
            ChunkingOptions.validated(maxTokens = Some(24),
              tokenizer = Some("cl100k_base")))
            .map(c => (d, c.seq, c.text, TokenCounter.countTokens(c.text)))
        }.toDF("doc_id", "chunk_seq", "text", "n_tokens")
        .orderBy("doc_id", "chunk_seq")
    }),

    // inter-chunk overlap (overlap_all, base.py:229-246,723-732): each pre-chunk
    // after the first is seeded with the stripped 20-char tail of the previous
    // chunk's text, which also consumes window capacity. 80-char elements keep
    // prefix + separator + element under the window, so the fold (not the
    // splitter) is what the oracle walks.
    "q_chunk_overlap" -> ((s, dir) => {
      import s.implicits._
      val els = partitioned(s, dir)
        .select(col("doc_id"), col("seq"), col("element_type"),
          substring(col("text"), 1, 80).as("text"))
        .as[(String, Long, String, String)]
        .map { case (d, q, tpe, t) => Element("", tpe, t, d, q) }
      chunkResult(Chunker.chunkElements(els,
        ChunkingOptions(maxCharacters = 120, overlap = 20, overlapAll = true,
          includeOrigElements = false)))
    }),

    // detect_language_per_element=True (`lang.py:543-559`): every element runs
    // its own detection instead of inheriting the doc-level code; the oracle
    // mirrors the detectLanguages SQL per row
    "q_lang_per_element" -> ((s, dir) => {
      val els = graft.operators.MetadataOps.applyMetadata(
        fullElements(s, dir), detectLanguagePerElement = true)
      els.select(
        col("doc_id").cast("long").as("doc_id"), col("seq"),
        element_at(col("metadata.languages"), 1).as("lang"))
        .orderBy("doc_id", "seq")
    }),

    // apply_metadata chain: doc language -> filename/filetype stamp -> hash ids ->
    // hierarchy. Oracle recomputes ids (sha-256 of filename+text+page+seq_on_page)
    // and parents (last preceding Title for ruleset children) independently.
    "q_apply_metadata" -> ((s, dir) => {
      val els = graft.operators.MetadataOps.applyMetadata(
        fullElements(s, dir),
        filetype = Some("text/plain"),
        filenameFor = d => Some(s"doc_$d.txt"))
      els.select(
        col("doc_id").cast("long").as("doc_id"),
        col("seq"),
        col("element_id"),
        col("metadata.parent_id").as("parent_id"),
        element_at(col("metadata.languages"), 1).as("lang"),
        col("metadata.filetype").as("filetype"))
        .orderBy("doc_id", "seq")
    }),

    // filter_element_types (include mode) — staging/base.py:705-731
    "q_filter_element_types" -> ((s, dir) =>
      graft.sinks.ElementSink.filterElementTypes(
        fullElements(s, dir), include = Seq("Title", "ListItem"))
        .select(col("doc_id").cast("long").as("doc_id"), col("seq"),
          col("type").as("element_type"), col("text"))
        .orderBy("doc_id", "seq")),

    // elements_to_md render per doc — staging/base.py:273-350
    "q_elements_to_md" -> ((s, dir) =>
      graft.sinks.ElementSink.elementsToMd(fullElements(s, dir))
        .select(col("doc_id").cast("long").as("doc_id"), col("markdown"))
        .orderBy("doc_id")),

    // convert_to_text concat per doc — staging/base.py:529-548
    "q_convert_to_text" -> ((s, dir) =>
      graft.sinks.ElementSink.convertToText(fullElements(s, dir))
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .orderBy("doc_id")),

    // elements_to_html render per doc — partition/html/convert.py:305-320:
    // constructed two-page element corpus exercising parent-div wrapping,
    // consecutive-ListItem ol grouping, table style injection, the image data
    // URI and checkbox rendering; the oracle re-builds the prettified document
    "q_elements_to_html" -> ((s, dir) => {
      val d = col("doc_id").cast("long")
      val t3 = array_join(slice(graft.functions.TextAnalysis.words(col("text")),
        lit(1), lit(3)), " ")
      val p1 = element_at(split(col("text"), " merge "), 1)
      def e(seq: Int, id: Column, tpe: String, text: Column,
          parent: Column = lit(null), page: Int = 1,
          depth: Column = lit(null), html: Column = lit(null),
          b64: Column = lit(null), mime: Column = lit(null)) =
        struct(lit(seq.toLong).as("seq"), id.as("element_id"),
          lit(tpe).as("element_type"), text.as("text"),
          parent.cast("string").as("parent_id"),
          lit(page).as("page_number"), depth.cast("int").as("category_depth"),
          html.cast("string").as("text_as_html"),
          b64.cast("string").as("image_base64"), mime.cast("string").as("image_mime"),
          lit(null).cast("string").as("url"))
      val els = graft.Tables.readFanout(s, dir, "documents").select(
        d.as("doc_id"),
        explode(array(
          e(1, concat(lit("t1-"), d), "Title", t3, depth = lit(0)),
          e(2, concat(lit("n1-"), d), "NarrativeText", p1,
            parent = concat(lit("t1-"), d)),
          e(3, concat(lit("li1-"), d), "ListItem",
            concat(lit("item "), (d % 5).cast("string")),
            parent = concat(lit("t1-"), d)),
          e(4, concat(lit("li2-"), d), "ListItem", lit("second item"),
            parent = concat(lit("t1-"), d)),
          e(5, concat(lit("tb-"), d), "Table", concat(lit("k "), col("source")),
            html = concat(lit("<table><tr><td>k</td><td>"), col("source"),
              lit("</td></tr></table>"))),
          e(6, concat(lit("t2-"), d), "Title",
            concat(lit("section "), (d % 5).cast("string")), page = 2,
            depth = lit(2)),
          e(7, concat(lit("im-"), d), "Image",
            concat(lit("figure "), (d % 11).cast("string")),
            parent = concat(lit("t2-"), d), page = 2,
            b64 = lit("QUJDRA=="), mime = lit("image/png")),
          e(8, concat(lit("cb-"), d), "CheckBoxChecked", lit(""),
            parent = concat(lit("t2-"), d), page = 2))).as("el"))
        .select(col("doc_id"), col("el.*"))
      graft.sinks.ElementsToHtml.elementsToHtml(els)
        .orderBy("doc_id")
    }),

    // group_elements_by_parent_id (utils.py:645-688): children per Title parent
    "q_group_by_parent" -> ((s, dir) => {
      val els = graft.operators.MetadataOps.applyMetadata(
        fullElements(s, dir),
        filetype = Some("text/plain"),
        filenameFor = d => Some(s"doc_$d.txt"))
      els.filter(col("metadata.parent_id").isNotNull)
        .groupBy(col("metadata.parent_id").as("parent_id"))
        .agg(count(lit(1)).as("n_children"),
          min("seq").as("first_child_seq"))
        .orderBy("parent_id")
    }),

    // group_elements_by_parent_id(assign_orphans=True) — utils.py:645-686:
    // orphans forward-fill into the last-seen parent's group (window
    // last-non-null over doc order), pre-parent orphans stay unassigned.
    "q_group_by_parent_orphans" -> ((s, dir) => {
      val els = graft.operators.MetadataOps.applyMetadata(
        fullElements(s, dir),
        filetype = Some("text/plain"),
        filenameFor = d => Some(s"doc_$d.txt"))
      graft.operators.MetadataOps.fillOrphanParents(els.toDF())
        .groupBy(col("parent_id"))
        .agg(count(lit(1)).as("n_children"),
          min("seq").as("first_child_seq"))
        .orderBy(coalesce(col("parent_id"), lit("")))
    }),

    // element-type frequency accuracy (metrics/element_type.py): histogram of
    // classified types for the corpus vs the truncated-text corpus, scored as
    // sum(min(freq_out, freq_gt)) / sum(freq_gt)
    "q_element_type_accuracy" -> ((s, dir) => {
      val p = partitioned(s, dir)
      val gt = p.groupBy("element_type").agg(count(lit(1)).as("gt_n"))
      val out = TextSource.partitionText(
        withParagraphs(s, dir),
        expr("substring(text, 1, greatest(length(text) - 5, 1))"))
        .groupBy("element_type").agg(count(lit(1)).as("out_n"))
      gt.join(out, Seq("element_type"), "full")
        .agg(round(
          sum(least(coalesce(col("gt_n"), lit(0L)), coalesce(col("out_n"), lit(0L))))
            .cast("double") /
            sum(coalesce(col("gt_n"), lit(0L))).cast("double"), 4).as("accuracy"))
    }),

    // calculate_element_type_percent_match (metrics/element_type.py:43-94):
    // depth-weighted two-stage histogram match. Depths are synthesized
    // deterministically (ListItem depth = seq mod 3; the output side is
    // perturbed by one) so the exact-match and the 0.5-weighted
    // type-only-leftover stages both fire.
    "q_element_type_percent_match" -> ((s, dir) => {
      def depth(off: Int) = when(col("element_type") === "ListItem",
        ((col("seq") + off) % 3).cast("int"))
      val src = partitioned(s, dir)
        .groupBy(col("element_type"), depth(0).as("category_depth"))
        .agg(count(lit(1)).as("n"))
      val out = TextSource.partitionText(
        withParagraphs(s, dir),
        expr("substring(text, 1, greatest(length(text) - 5, 1))"))
        .groupBy(col("element_type"), depth(1).as("category_depth"))
        .agg(count(lit(1)).as("n"))
      graft.operators.MetricsOps.elementTypePercentMatch(out, src)
        .select(round(col("percent_match"), 6).as("percent_match"))
    }),

    // ElementTypeMetricsCalculator end-to-end (evaluate.py:444-509): per-DOC
    // rows (filename/doctype/connector from the output path, depth-weighted
    // percent match rounded 3) over the same truncated-output derivation the
    // corpus-level rows use; paths nest under two connectors
    "q_element_type_eval" -> ((s, dir) => {
      def depth(off: Int) = when(col("element_type") === "ListItem",
        ((col("seq") + off) % 3).cast("int"))
      def path(ext: String) = concat(lit("c"), (col("doc_id") % 2).cast("string"),
        lit("/doc"), col("doc_id").cast("string"), lit(s".pdf.$ext"))
      val src = partitioned(s, dir)
        .select(path("json").as("path"), col("element_type"),
          depth(0).as("category_depth"))
      val out = TextSource.partitionText(
          withParagraphs(s, dir),
          expr("substring(text, 1, greatest(length(text) - 5, 1))"))
        .select(path("json").as("path"), col("element_type"),
          depth(1).as("category_depth"))
      graft.operators.MetricsOps.elementTypeEvaluation(out, src)
    }),

    // the evaluation capstone — the composition test_unstructured_ingest/
    // evaluation-metrics.sh runs: BOTH metric strategies' per-doc frames
    // (the same derivations as q_text_eval / q_element_type_eval) fold into
    // the calculators' aggregate-scores TSV shape (AGG_HEADERS — metric,
    // average, sample_sd, population_sd, count; evaluate.py:437-443,497-507),
    // one row set per eval, exactly what the harness writes to
    // aggregate-scores-cct.tsv / aggregate-scores-element-type.tsv
    "q_eval_capstone" -> ((s, dir) => {
      val text = graft.queries.AnalysisQueries.queries("q_text_eval")(s, dir)
      val elem = queries("q_element_type_eval")(s, dir)
      graft.operators.MetricsOps.aggregateScores(text, "text_extraction")
        .withColumn("eval", lit("text_extraction"))
        .unionByName(
          graft.operators.MetricsOps.aggregateScores(elem, "element_type")
            .withColumn("eval", lit("element_type")))
        .select(col("eval"), col("metric"), col("average"),
          col("sample_sd"), col("population_sd"), col("count"))
        .orderBy("eval", "metric")
    }),

    // convert_to_csv flat projection — staging/base.py:507-526,604-624
    "q_csv_flatten" -> ((s, dir) => {
      val els = graft.operators.MetadataOps.applyMetadata(
        fullElements(s, dir),
        filetype = Some("text/plain"),
        filenameFor = d => Some(s"doc_$d.txt"))
      graft.sinks.ElementSink.flattenForCsv(els)
        .select(col("type"), col("text"), col("element_id"),
          col("doc_id").cast("long").as("doc_id"), col("seq"),
          col("filename"), col("filetype"), col("languages"), col("parent_id"))
        .orderBy("doc_id", "seq")
    }),

    // stage_for_weaviate property projection — staging/weaviate.py:23-43. The
    // sink drops engine provenance (doc_id/seq), so the compare orders by the
    // projected business columns (ties only between fully identical rows).
    "q_stage_weaviate" -> ((s, dir) => {
      graft.sinks.Staging.stageForWeaviate(metaElements(s, dir))
        .select(col("filename"), col("category"), col("text"),
          col("filetype"), col("parent_id"),
          element_at(col("languages"), 1).as("lang"))
        .orderBy(col("filename"), col("text"), col("category"),
          coalesce(col("parent_id"), lit("")))
    }),

    // stage_for_prodigy text+meta rows — staging/prodigy.py:39-57
    "q_stage_prodigy" -> ((s, dir) =>
      graft.sinks.Staging.stageForProdigy(metaElements(s, dir))
        .select(col("text"), col("meta.id").as("meta_id"),
          col("meta.category").as("meta_category"),
          col("meta.filename").as("meta_filename"))
        .orderBy("meta_id")),

    // stage_for_label_studio task records — staging/label_studio.py:113+
    "q_stage_label_studio" -> ((s, dir) =>
      graft.sinks.Staging.stageForLabelStudio(metaElements(s, dir))
        .select(col("data.text").as("text"), col("data.ref_id").as("ref_id"))
        .orderBy("ref_id")),

    // stage_for_baseplate rows-of-columns — staging/baseplate.py:27
    "q_stage_baseplate" -> ((s, dir) =>
      graft.sinks.Staging.stageForBaseplate(metaElements(s, dir))
        .select(element_at(col("data"), "element_id").as("element_id"),
          element_at(col("data"), "type").as("type"),
          element_at(col("data"), "text").as("text"))
        .orderBy("element_id")),

    // Oversized-text splitter, char mode (base.py:1396-1460): one whole-document
    // element per doc (far over the 100-char window) forces the repeated
    // rightmost-space split; the oracle re-walks the identical algorithm as a
    // recursive CTE (rightmost separator within [1, maxlen], rstrip fragment,
    // lstrip remainder, hard cut when no separator).
    "q_chunk_split" -> ((s, dir) => {
      import s.implicits._
      val els = docs(s, dir)
        .select(col("doc_id").cast("string").as("doc_id"),
          trim(regexp_replace(col("text"), "\\s+", " ")).as("t"))
        .as[(String, String)]
        .map { case (d, t) => Element("", ElementType.NarrativeText, t, d, 1L) }
      chunkResult(Chunker.chunkElements(els,
        ChunkingOptions(maxCharacters = 100, includeOrigElements = false)))
    }),

    // Table chunk -> reconstruct fixpoint (base.py:957-1393 + dispatch.py:146-325):
    // an oversized Table with a <thead> header splits into TableChunks with the
    // header repeated on continuations, then reconstruct_table_from_chunks
    // inverts the split. The oracle predicts the reconstructed element straight
    // from the construction, so header carry/strip, row packing, or the
    // canonical-thead rebuild breaking shows as a hash mismatch. Row widths vary
    // per doc (cycled words), so the packing boundaries differ across rows.
    "q_reconstruct_table" -> ((s, dir) => {
      import s.implicits._
      // corpus built in the typed map: a HOF-lambda `element_at(words(text), i)`
      // re-splits the text per element per column (24 non-codegen regex splits
      // per row — dominated CPU samples); here the split runs once per row
      val src = docs(s, dir).select(
        col("doc_id").cast("string").as("doc_id"), col("text"))
        .as[(String, String)]
        .map { case (d, text) =>
          val ws = text.split("\\s+").filter(_.nonEmpty)
          val cells = (1 to 12).map(i => (ws((i - 1) % ws.length), i))
          val t = "hA hB " + cells.map { case (w, i) => s"$w cell$i" }.mkString(" ")
          val h = "<table><thead><tr><th>hA</th><th>hB</th></tr></thead>" +
            cells.map { case (w, i) => s"<tr><td>$w</td><td>cell$i</td></tr>" }.mkString +
            "</table>"
          Element("", ElementType.Table, t, d, 1L,
            ElementMetadata(text_as_html = Some(h)))
        }
      val chunked = Chunker.chunkElements(src,
        ChunkingOptions(maxCharacters = 80, includeOrigElements = false))
      chunked.groupByKey(_.doc_id)
        .mapGroups { (d, it) =>
          val r = Chunker.reconstructTable(it.toSeq).get
          (d.toLong, r.`type`, r.text, r.metadata.text_as_html.getOrElse(""))
        }
        .toDF("doc_id", "element_type", "text", "text_as_html")
        .orderBy("doc_id")
    }),

    // stage_for_label_box import-config records — staging/label_box.py:40-100
    "q_stage_label_box" -> ((s, dir) =>
      graft.sinks.Staging.stageForLabelBox(metaElements(s, dir), "https://cdn.example.com/els/")
        .select(col("data"), col("externalId"), size(col("attachments")).as("n_attachments"),
          col("text"))
        .orderBy("externalId")),

    // stage_for_datasaur text+entities rows — staging/datasaur.py:6-24
    "q_stage_datasaur" -> ((s, dir) =>
      graft.sinks.Staging.stageForDatasaur(metaElements(s, dir))
        .select(col("text"), size(col("entities")).as("n_entities"))
        .orderBy("text")),

    // stage_for_argilla text-classification records — staging/argilla.py:14-60
    "q_stage_argilla" -> ((s, dir) =>
      graft.sinks.Staging.stageForArgilla(metaElements(s, dir))
        .orderBy("id")),

    // stage_csv_for_prodigy — staging/prodigy.py:60-90
    "q_stage_prodigy_csv" -> ((s, dir) =>
      graft.sinks.Staging.stageCsvForProdigy(metaElements(s, dir))
        .orderBy("id")),

    // stage_for_transformers / chunk_by_attention_window — staging/huggingface.py:
    // every textual element (all types are `Text` subclasses upstream) split
    // into attention-window-sized word groups (window = max_input_size -
    // buffer = 10).
    "q_stage_transformers" -> ((s, dir) => {
      import s.implicits._
      val els = partitioned(s, dir)
        .select(col("doc_id"), col("seq"), col("element_type"),
          regexp_replace(col("text"), "\\s+", " ").as("text"))
        .as[(String, Long, String, String)]
        .map { case (d, q, tpe, t) => Element("", tpe, t, d, q) }
      graft.sinks.Staging.stageForTransformers(els, maxInputSize = 12, buffer = 2)
        .select(col("doc_id").cast("long").as("doc_id"), col("seq"),
          col("type").as("element_type"), col("text"))
        .orderBy("doc_id", "seq", "text")
    }),

    // orig_elements codec fixpoint (staging/base.py:241-260): elements encode to
    // the base64-gzipped JSON array and decode back; the oracle predicts the
    // decoded rows straight from the paragraph walk, so any encoder/decoder
    // asymmetry (JSON escaping, gzip framing, base64) breaks the hash. Encoding
    // is scoped to 8-element groups — the pre-chunk scope orig_elements actually
    // carries in the reference (chunking/base.py:941-954), and whole-document
    // arrays produced multi-MB humongous allocations that made the query's wall
    // time GC-bound and erratic (2 s to 65 s run-to-run at sf0.1).
    "q_orig_elements_codec" -> ((s, dir) => {
      import s.implicits._
      val els = fullElements(s, dir)
      val decoded = els.groupByKey(e => (e.doc_id, (e.seq - 1) / 8))
        .mapGroups { (k: (String, Long), it: Iterator[Element]) =>
          val sorted = it.toSeq.sortBy(_.seq)
          val enc = graft.sinks.ElementJson.encodeOrigElements(sorted)
          (k._1, graft.sinks.ElementJson.decodeOrigElementsJson(enc))
        }
        .toDF("doc_id", "json")
      decoded
        .select(col("doc_id").cast("long").as("doc_id"),
          explode(from_json(col("json"),
            org.apache.spark.sql.types.DataType.fromDDL(
              "ARRAY<STRUCT<`type`: STRING, text: STRING, seq: BIGINT>>"))).as("e"))
        .select(col("doc_id"), col("e.seq").as("seq"),
          col("e.type").as("element_type"), col("e.text").as("text"))
        .orderBy("doc_id", "seq")
    }))

  /** apply_metadata-enriched element stream shared by the staging-sink queries. */
  private def metaElements(s: SparkSession, dir: String): Dataset[Element] =
    graft.operators.MetadataOps.applyMetadata(
      fullElements(s, dir),
      filetype = Some("text/plain"),
      filenameFor = d => Some(s"doc_$d.txt"))

  // -- oracle SQL ------------------------------------------------------------------

  private val inputExpr =
    O.strip("replace(text, ' merge ', chr(10)||chr(10))")

  /** Stripped non-empty paragraphs per doc (`_split_by_paragraph` mirror). */
  private val parsCte =
    s"""pars AS (
       |  SELECT doc_id, list_filter(list_transform(
       |    string_split_regex($inputExpr, '\\s*\\n\\s*'),
       |    p -> ${O.strip("p")}), p -> p <> '') AS ps
       |  FROM documents)""".stripMargin

  /** `clean_bullets` mirror for the element text (identity off the bullet path). */
  private def cleanBullets(x: String): String =
    s"(CASE WHEN regexp_matches($x, '^(?:${O.bulletsAlt})') " +
      s"THEN ${O.strip(s"regexp_replace($x, '^(?:${O.bulletsAlt})', '')")} ELSE $x END)"

  /** Greedy-fold walk as a recursive CTE; `boundaryExpr` references e.* columns. */
  private def chunkWalkSql(boundaryExpr: String): String =
    s"""WITH RECURSIVE $parsCte,
       |els AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(ps)+1), i ->
       |    {'seq': i, 'full_text': ps[i],
       |     'text': substring(${cleanBullets("ps[i]")}, 1, 100)}), recursive := true)
       |  FROM pars),
       |walk AS (
       |  SELECT doc_id, seq, text, 0 AS chunk_idx, length(text) AS acc_len
       |  FROM els WHERE seq = 1
       |  UNION ALL
       |  SELECT e.doc_id, e.seq, e.text,
       |    CASE WHEN NOT ($boundaryExpr)
       |           AND w.acc_len + 2 + length(e.text) <= 120
       |         THEN w.chunk_idx ELSE w.chunk_idx + 1 END,
       |    CASE WHEN NOT ($boundaryExpr)
       |           AND w.acc_len + 2 + length(e.text) <= 120
       |         THEN w.acc_len + 2 + length(e.text) ELSE length(e.text) END
       |  FROM els e JOIN walk w ON e.doc_id = w.doc_id AND e.seq = w.seq + 1)
       |SELECT doc_id, chunk_idx AS chunk_seq,
       |  string_agg(regexp_replace(${O.strip("text")}, '\\s+', ' ', 'g'),
       |             chr(10)||chr(10) ORDER BY seq) AS text
       |FROM walk GROUP BY doc_id, chunk_idx ORDER BY doc_id, chunk_seq""".stripMargin

  /** q_element_type_eval's oracle SQL — a val so the capstone oracle can
    * embed it as a CTE without re-entering the (self-referencing) map. */
  private lazy val ElementTypeEvalOracleSql: String = {
      val replaced = "replace(text, ' merge ', chr(10)||chr(10))"
      val trunc = s"substring($replaced, 1, greatest(length($replaced) - 5, 1))"
      def parsOf(input: String) =
        s"""SELECT doc_id, list_filter(list_transform(
           |    string_split_regex(${O.strip(input)}, '\\s*\\n\\s*'),
           |    p -> ${O.strip("p")}), p -> p <> '') AS ps
           |  FROM documents""".stripMargin
      def histOf(pars: String, off: Int) =
        s"""SELECT doc_id, element_type,
           |    CASE WHEN element_type = 'ListItem'
           |      THEN CAST((seq + $off) % 3 AS INT) END AS d,
           |    count(*) AS n
           |  FROM (SELECT doc_id, ${O.classify("full_text")} AS element_type, seq
           |    FROM (SELECT doc_id, unnest(list_transform(range(1, len(ps)+1), i ->
           |      {'seq': i, 'full_text': ps[i]}), recursive := true) FROM $pars))
           |  GROUP BY 1, 2, 3""".stripMargin
      s"""WITH parsA AS (${parsOf(O.strip(replaced))}),
         |parsB AS (${parsOf(trunc)}),
         |src AS (${histOf("parsA", 0)}),
         |outt AS (${histOf("parsB", 1)}),
         |j AS (
         |  SELECT coalesce(o.doc_id, s.doc_id) AS doc_id,
         |    coalesce(o.element_type, s.element_type) AS t,
         |    coalesce(o.n, 0) AS o_n, coalesce(s.n, 0) AS s_n,
         |    LEAST(coalesce(o.n, 0), coalesce(s.n, 0)) AS m
         |  FROM outt o FULL JOIN src s
         |    ON o.doc_id = s.doc_id AND o.element_type = s.element_type
         |    AND o.d IS NOT DISTINCT FROM s.d),
         |pt AS (
         |  SELECT doc_id, t, sum(m) AS exact, sum(o_n - m) AS o_left,
         |    sum(s_n - m) AS s_left, sum(o_n) AS o_tot, sum(s_n) AS s_tot
         |  FROM j GROUP BY doc_id, t),
         |pd AS (
         |  SELECT doc_id,
         |    sum(exact) + 0.5 * sum(LEAST(o_left, s_left)) AS num,
         |    sum(exact) + sum(s_left) AS den,
         |    sum(o_tot) AS o_all, sum(s_tot) AS s_all
         |  FROM pt GROUP BY doc_id)
         |SELECT 'doc' || CAST(doc_id AS VARCHAR) || '.pdf' AS filename,
         |  '.pdf' AS doctype,
         |  'c' || CAST(doc_id % 2 AS VARCHAR) AS connector,
         |  CASE WHEN o_all = 0 OR s_all = 0 OR den = 0 THEN 0.0
         |    ELSE round_even(LEAST(GREATEST(num::DOUBLE / den::DOUBLE, 0.0), 1.0), 3)
         |    END AS "element-type-accuracy"
         |FROM pd WHERE o_all > 0 AND s_all > 0
         |ORDER BY 'c' || CAST(doc_id % 2 AS VARCHAR) || '/doc' ||
         |  CAST(doc_id AS VARCHAR) || '.pdf.json'""".stripMargin
    }

  def oracles: Map[String, String] = Map(
    "q_partition_text" ->
      s"""WITH $parsCte
         |SELECT doc_id, seq, ${O.classify("full_text")} AS element_type,
         |  ${cleanBullets("full_text")} AS text
         |FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, len(ps)+1), i ->
         |    {'seq': i, 'full_text': ps[i]}), recursive := true)
         |  FROM pars)
         |ORDER BY doc_id, seq""".stripMargin,

    "q_chunk_basic" -> chunkWalkSql("FALSE"),
    "q_chunk_plan_node" -> chunkWalkSql("FALSE"),

    // streaming result == batch result by the incremental-fold invariant
    "q_stream_chunk_basic" -> chunkWalkSql("FALSE"),

    "q_chunk_by_title" -> chunkWalkSql(O.classify("e.full_text") + " = 'Title'"),

    // Overlap fold: the walk carries (nsegs, raw-length sum, accumulated chunk
    // text); a boundary seeds the next chunk with strip(right(acc, 20)), which
    // counts as a segment in the separator/capacity arithmetic exactly as the
    // builder's seeded state does.
    "q_chunk_overlap" -> {
      val fits = "NOT (w.textlen + (w.nsegs - 1) * 2 > 120) " +
        "AND (120 - w.textlen - 2 * w.nsegs >= e.len)"
      val tail = s"${O.strip("right(w.acc, 20)")}"
      s"""WITH RECURSIVE $parsCte,
         |els AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(ps)+1), i ->
         |    {'seq': i, 'text': substring(${cleanBullets("ps[i]")}, 1, 80)}),
         |    recursive := true)
         |  FROM pars),
         |norm AS (
         |  SELECT doc_id, seq,
         |    regexp_replace(${O.strip("text")}, '\\s+', ' ', 'g') AS t,
         |    length(text) AS len
         |  FROM els),
         |walk AS (
         |  SELECT doc_id, seq, 0 AS chunk_idx, 1 AS nsegs, len AS textlen, t AS acc
         |  FROM norm WHERE seq = 1
         |  UNION ALL
         |  SELECT e.doc_id, e.seq,
         |    CASE WHEN $fits THEN w.chunk_idx ELSE w.chunk_idx + 1 END,
         |    CASE WHEN $fits THEN w.nsegs + 1
         |         WHEN $tail = '' THEN 1 ELSE 2 END,
         |    CASE WHEN $fits THEN w.textlen + e.len
         |         ELSE length($tail) + e.len END,
         |    CASE WHEN $fits THEN w.acc || chr(10)||chr(10) || e.t
         |         WHEN $tail = '' THEN e.t
         |         ELSE $tail || chr(10)||chr(10) || e.t END
         |  FROM norm e JOIN walk w ON e.doc_id = w.doc_id AND e.seq = w.seq + 1)
         |SELECT doc_id, chunk_idx AS chunk_seq, arg_max(acc, seq) AS text
         |FROM walk GROUP BY doc_id, chunk_idx ORDER BY doc_id, chunk_seq""".stripMargin
    },

    // BPE token-mode: fixed canonical input, so the expected chunks are
    // constants — produced by an independent Python implementation of the same
    // BPE spec (split regex + greedy lowest-rank merges) over the committed
    // merge table, then verified to agree with the Scala kernel
    "q_chunk_tokens_bpe" ->
      s"""WITH k AS (SELECT * FROM (VALUES
         |  (0, 21, 'Well, Prince, so Genoa and Lucca are now just family estates.'),
         |  (1, 22, 'It was in July, 1805, and the speaker was the well-known Anna Pavlovna.'),
         |  (2, 24, 'Heavens! what a virulent attack! replied the prince, not in the least disconcerted'),
         |  (3, 4, 'by this reception.')
         |  ) AS t(chunk_seq, n_tokens, text))
         |SELECT doc_id, chunk_seq::BIGINT AS chunk_seq, k.text,
         |  n_tokens::INTEGER AS n_tokens
         |FROM documents CROSS JOIN k ORDER BY doc_id, chunk_seq""".stripMargin,

    // Token-mode fold: element packing in token units (separator "\n\n" is pure
    // whitespace, so token counts are additive across the join), then oversized
    // pre-chunks — necessarily single-element, since willFit re-measures the join —
    // word-walked greedily, mirroring the splitter's rightmost-fitting-space scan.
    "q_chunk_tokens" -> {
      val tokOf = (x: String) =>
        s"len(regexp_extract_all($x, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))"
      s"""WITH RECURSIVE $parsCte,
         |els AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(ps)+1), i ->
         |    {'seq': i, 'text': substring(${cleanBullets("ps[i]")}, 1, 100)}),
         |    recursive := true)
         |  FROM pars),
         |toks AS (
         |  SELECT doc_id, seq, text, ${tokOf("text")} AS tok FROM els),
         |walk AS (
         |  SELECT doc_id, seq, text, tok, 0 AS chunk_idx, tok AS acc_tok
         |  FROM toks WHERE seq = 1
         |  UNION ALL
         |  SELECT e.doc_id, e.seq, e.text, e.tok,
         |    CASE WHEN w.acc_tok + e.tok <= 24 THEN w.chunk_idx ELSE w.chunk_idx + 1 END,
         |    CASE WHEN w.acc_tok + e.tok <= 24 THEN w.acc_tok + e.tok ELSE e.tok END
         |  FROM toks e JOIN walk w ON e.doc_id = w.doc_id AND e.seq = w.seq + 1),
         |chunks AS (
         |  SELECT doc_id, chunk_idx,
         |    string_agg(regexp_replace(${O.strip("text")}, '\\s+', ' ', 'g'),
         |               chr(10)||chr(10) ORDER BY seq) AS ctext,
         |    sum(tok) AS total_tok
         |  FROM walk GROUP BY doc_id, chunk_idx),
         |words AS (
         |  SELECT doc_id, chunk_idx, unnest(list_transform(range(1, len(ws)+1), i ->
         |    {'widx': i, 'word': ws[i]}), recursive := true)
         |  FROM (SELECT doc_id, chunk_idx, string_split(ctext, ' ') AS ws
         |        FROM chunks WHERE total_tok > 24)),
         |wtoks AS (
         |  SELECT doc_id, chunk_idx, widx, word, ${tokOf("word")} AS wtok FROM words),
         |wwalk AS (
         |  SELECT doc_id, chunk_idx, widx, word, wtok, 0 AS frag_idx, wtok AS acc
         |  FROM wtoks WHERE widx = 1
         |  UNION ALL
         |  SELECT x.doc_id, x.chunk_idx, x.widx, x.word, x.wtok,
         |    CASE WHEN w.acc + x.wtok <= 24 THEN w.frag_idx ELSE w.frag_idx + 1 END,
         |    CASE WHEN w.acc + x.wtok <= 24 THEN w.acc + x.wtok ELSE x.wtok END
         |  FROM wtoks x JOIN wwalk w
         |    ON x.doc_id = w.doc_id AND x.chunk_idx = w.chunk_idx AND x.widx = w.widx + 1),
         |frags AS (
         |  SELECT doc_id, chunk_idx, frag_idx,
         |    string_agg(word, ' ' ORDER BY widx) AS ctext
         |  FROM wwalk GROUP BY doc_id, chunk_idx, frag_idx),
         |allchunks AS (
         |  SELECT doc_id, chunk_idx, 0 AS sub, ctext FROM chunks WHERE total_tok <= 24
         |  UNION ALL
         |  SELECT doc_id, chunk_idx, frag_idx, ctext FROM frags)
         |SELECT doc_id,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY chunk_idx, sub) - 1 AS chunk_seq,
         |  ctext AS text
         |FROM allchunks ORDER BY doc_id, chunk_seq""".stripMargin
    },

    "q_lang_per_element" -> {
      val rowDet = s"NULLIF(${AnalysisQueries.detectLanguagesSql("text")}, 'und')"
      s"""WITH $parsCte,
         |typed AS ($typedSelect)
         |SELECT doc_id, seq, $rowDet AS lang
         |FROM typed ORDER BY doc_id, seq""".stripMargin
    },

    "q_apply_metadata" ->
      s"""$applyMetaCtes
         |SELECT h.doc_id, h.seq, h.element_id, h.parent_id, $rowLangSql AS lang,
         |  'text/plain' AS filetype
         |FROM withparent h JOIN langs l ON h.doc_id = l.doc_id
         |ORDER BY h.doc_id, h.seq""".stripMargin,

    "q_filter_element_types" ->
      s"""WITH $parsCte,
         |typed AS ($typedSelect)
         |SELECT doc_id, seq, element_type, text FROM typed
         |WHERE element_type IN ('Title', 'ListItem')
         |ORDER BY doc_id, seq""".stripMargin,

    "q_elements_to_md" ->
      s"""WITH $parsCte,
         |typed AS ($typedSelect)
         |SELECT doc_id, string_agg(
         |  CASE WHEN element_type = 'Title' THEN '# ' || text ELSE text END,
         |  chr(10) ORDER BY seq) AS markdown
         |FROM typed GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_convert_to_text" ->
      s"""WITH $parsCte,
         |typed AS ($typedSelect)
         |SELECT doc_id, string_agg(text, chr(10) ORDER BY seq) AS text
         |FROM typed WHERE text <> '' GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the prettified two-page document, rebuilt line by line
    "q_elements_to_html" -> {
      val ws = O.words("text")
      s"""WITH base AS (
         |  SELECT doc_id, array_to_string(list_slice($ws, 1, 3), ' ') AS t3,
         |    string_split(text, ' merge ')[1] AS p1, source
         |  FROM documents)
         |SELECT doc_id,
         | '<!DOCTYPE html>' || chr(10) ||
         | '<html lang="en">' || chr(10) ||
         | ' <head>' || chr(10) ||
         | '  <meta charset="utf-8"/>' || chr(10) ||
         | '  <meta content="width=device-width, initial-scale=1.0" name="viewport"/>' || chr(10) ||
         | '  <title>' || chr(10) ||
         | '  </title>' || chr(10) ||
         | ' </head>' || chr(10) ||
         | ' <body>' || chr(10) ||
         | '  <div data-page_number="1">' || chr(10) ||
         | '   <div>' || chr(10) ||
         | '    <h1 class="Title" id="t1-' || doc_id || '">' || chr(10) ||
         | '     ' || t3 || chr(10) ||
         | '    </h1>' || chr(10) ||
         | '    <p class="NarrativeText" id="n1-' || doc_id || '">' || chr(10) ||
         | '     ' || p1 || chr(10) ||
         | '    </p>' || chr(10) ||
         | '    <ol class="UncategorizedText">' || chr(10) ||
         | '     <li class="ListItem" id="li1-' || doc_id || '">' || chr(10) ||
         | '      item ' || (doc_id % 5) || chr(10) ||
         | '     </li>' || chr(10) ||
         | '     <li class="ListItem" id="li2-' || doc_id || '">' || chr(10) ||
         | '      second item' || chr(10) ||
         | '     </li>' || chr(10) ||
         | '    </ol>' || chr(10) ||
         | '   </div>' || chr(10) ||
         | '   <table class="Table" id="tb-' || doc_id ||
         |   '" style="border: 1px solid black; border-collapse: collapse;">' || chr(10) ||
         | '    <tr style="border: 1px solid black;">' || chr(10) ||
         | '     <td style="border: 1px solid black;">' || chr(10) ||
         | '      k' || chr(10) ||
         | '     </td>' || chr(10) ||
         | '     <td style="border: 1px solid black;">' || chr(10) ||
         | '      ' || source || chr(10) ||
         | '     </td>' || chr(10) ||
         | '    </tr>' || chr(10) ||
         | '   </table>' || chr(10) ||
         | '  </div>' || chr(10) ||
         | '  <div data-page_number="2">' || chr(10) ||
         | '   <div>' || chr(10) ||
         | '    <h2 class="Title" id="t2-' || doc_id || '">' || chr(10) ||
         | '     section ' || (doc_id % 5) || chr(10) ||
         | '    </h2>' || chr(10) ||
         | '    <img alt="figure ' || (doc_id % 11) || '" class="Image" id="im-' ||
         |   doc_id || '" src="data:image/png;base64,QUJDRA=="/>' || chr(10) ||
         | '    <input checked="true" class="CheckBoxChecked" id="cb-' || doc_id ||
         |   '" type="checkbox"/>' || chr(10) ||
         | '   </div>' || chr(10) ||
         | '  </div>' || chr(10) ||
         | ' </body>' || chr(10) ||
         | '</html>' AS html
         |FROM base ORDER BY doc_id""".stripMargin
    },

    "q_group_by_parent" ->
      s"""$applyMetaCtes
         |SELECT parent_id, CAST(count(*) AS BIGINT) AS n_children,
         |  min(seq) AS first_child_seq
         |FROM withparent WHERE parent_id IS NOT NULL
         |GROUP BY parent_id ORDER BY parent_id""".stripMargin,

    "q_element_type_accuracy" -> {
      val replaced = "replace(text, ' merge ', chr(10)||chr(10))"
      val trunc = s"substring($replaced, 1, greatest(length($replaced) - 5, 1))"
      def parsOf(input: String) =
        s"""SELECT doc_id, list_filter(list_transform(
           |    string_split_regex(${O.strip(input)}, '\\s*\\n\\s*'),
           |    p -> ${O.strip("p")}), p -> p <> '') AS ps
           |  FROM documents""".stripMargin
      def histOf(pars: String) =
        s"""SELECT ${O.classify("full_text")} AS element_type, count(*) AS n
           |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(ps)+1), i ->
           |    {'seq': i, 'full_text': ps[i]}), recursive := true) FROM $pars)
           |  GROUP BY 1""".stripMargin
      s"""WITH parsA AS (${parsOf(O.strip(replaced))}),
         |parsB AS (${parsOf(trunc)}),
         |gt AS (${histOf("parsA")}),
         |outt AS (${histOf("parsB")})
         |SELECT round(SUM(LEAST(coalesce(gt.n, 0), coalesce(outt.n, 0)))::DOUBLE /
         |  SUM(coalesce(gt.n, 0))::DOUBLE, 4) AS accuracy
         |FROM gt FULL JOIN outt ON gt.element_type = outt.element_type""".stripMargin
    },

    "q_group_by_parent_orphans" ->
      s"""$applyMetaCtes, filled AS (
         |  SELECT seq, last_value(parent_id IGNORE NULLS) OVER (
         |    PARTITION BY doc_id ORDER BY seq
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS parent_id
         |  FROM withparent)
         |SELECT parent_id, CAST(count(*) AS BIGINT) AS n_children,
         |  min(seq) AS first_child_seq
         |FROM filled GROUP BY parent_id ORDER BY coalesce(parent_id, '')""".stripMargin,

    "q_element_type_percent_match" -> {
      val replaced = "replace(text, ' merge ', chr(10)||chr(10))"
      val trunc = s"substring($replaced, 1, greatest(length($replaced) - 5, 1))"
      def parsOf(input: String) =
        s"""SELECT doc_id, list_filter(list_transform(
           |    string_split_regex(${O.strip(input)}, '\\s*\\n\\s*'),
           |    p -> ${O.strip("p")}), p -> p <> '') AS ps
           |  FROM documents""".stripMargin
      def histOf(pars: String, off: Int) =
        s"""SELECT element_type,
           |    CASE WHEN element_type = 'ListItem'
           |      THEN CAST((seq + $off) % 3 AS INT) END AS d,
           |    count(*) AS n
           |  FROM (SELECT ${O.classify("full_text")} AS element_type, seq
           |    FROM (SELECT doc_id, unnest(list_transform(range(1, len(ps)+1), i ->
           |      {'seq': i, 'full_text': ps[i]}), recursive := true) FROM $pars))
           |  GROUP BY 1, 2""".stripMargin
      s"""WITH parsA AS (${parsOf(O.strip(replaced))}),
         |parsB AS (${parsOf(trunc)}),
         |src AS (${histOf("parsA", 0)}),
         |outt AS (${histOf("parsB", 1)}),
         |j AS (
         |  SELECT coalesce(o.element_type, s.element_type) AS t,
         |    coalesce(o.n, 0) AS o_n, coalesce(s.n, 0) AS s_n,
         |    LEAST(coalesce(o.n, 0), coalesce(s.n, 0)) AS m
         |  FROM outt o FULL JOIN src s
         |    ON o.element_type = s.element_type AND o.d IS NOT DISTINCT FROM s.d),
         |pt AS (
         |  SELECT t, sum(m) AS exact, sum(o_n - m) AS o_left, sum(s_n - m) AS s_left
         |  FROM j GROUP BY t)
         |SELECT CASE WHEN coalesce(sum(exact) + sum(s_left), 0) = 0 THEN 0.0
         |  ELSE round(LEAST(GREATEST(
         |    (sum(exact) + 0.5 * sum(LEAST(o_left, s_left)))::DOUBLE /
         |    (sum(exact) + sum(s_left))::DOUBLE, 0.0), 1.0), 6) END AS percent_match
         |FROM pt""".stripMargin
    },

    // per-doc depth-weighted histogram match re-derived with the same
    // synthetic paths; round_even matches the Spark side's bround (Python
    // round() is banker's -- HALF_UP diverges on exact decimal ties)
    "q_element_type_eval" -> ElementTypeEvalOracleSql,

    "q_eval_capstone" -> {
      // keepEmpty mirrors aggregateScores: an empty text_extraction frame
      // aggregates to NO rows (the reference emits headers only) while an
      // empty element_type frame keeps its count-0 row — without the HAVING
      // guard an aggregate over an empty CTE still yields one row and the
      // two sides would disagree on an all-empty-ground-truth corpus
      def aggOf(src: String, evalTag: String, field: String,
          keepEmpty: Boolean = false) =
        s"""SELECT '$evalTag' AS eval, '$field' AS metric,
           |  round_even(avg("$field"), 3) AS average,
           |  CASE WHEN count(*) > 1
           |    THEN round_even(stddev_samp("$field"), 3) END AS sample_sd,
           |  CASE WHEN count(*) > 1
           |    THEN round_even(stddev_pop("$field"), 3) END AS population_sd,
           |  count(*) AS "count"
           |FROM $src""".stripMargin +
          (if (keepEmpty) "" else "\nHAVING count(*) > 0")
      s"""WITH text_rows AS (
         |${graft.queries.AnalysisQueries.oracles("q_text_eval")}),
         |elem_rows AS (
         |$ElementTypeEvalOracleSql)
         |${aggOf("elem_rows", "element_type", "element-type-accuracy", keepEmpty = true)}
         |UNION ALL
         |${aggOf("text_rows", "text_extraction", "cct-accuracy")}
         |UNION ALL
         |${aggOf("text_rows", "text_extraction", "cct-%missing")}
         |ORDER BY eval, metric""".stripMargin
    },

    "q_csv_flatten" ->
      s"""$applyMetaCtes
         |SELECT h.element_type AS type, h.text, h.element_id, h.doc_id, h.seq,
         |  'doc_' || h.doc_id || '.txt' AS filename, 'text/plain' AS filetype,
         |  coalesce($rowLangSql, '') AS languages, h.parent_id
         |FROM withparent h JOIN langs l ON h.doc_id = l.doc_id
         |ORDER BY h.doc_id, h.seq""".stripMargin,

    "q_stage_weaviate" ->
      s"""$applyMetaCtes
         |SELECT 'doc_' || h.doc_id || '.txt' AS filename,
         |  h.element_type AS category, h.text, 'text/plain' AS filetype,
         |  h.parent_id, $rowLangSql AS lang
         |FROM withparent h JOIN langs l ON h.doc_id = l.doc_id
         |ORDER BY filename, h.text, category, coalesce(h.parent_id, '')""".stripMargin,

    "q_stage_prodigy" ->
      s"""$applyMetaCtes
         |SELECT h.text, h.element_id AS meta_id, h.element_type AS meta_category,
         |  'doc_' || h.doc_id || '.txt' AS meta_filename
         |FROM withparent h ORDER BY meta_id""".stripMargin,

    "q_stage_label_studio" ->
      s"""$applyMetaCtes
         |SELECT h.text, h.element_id AS ref_id
         |FROM withparent h ORDER BY ref_id""".stripMargin,

    "q_stage_baseplate" ->
      s"""$applyMetaCtes
         |SELECT h.element_id, h.element_type AS type, h.text
         |FROM withparent h ORDER BY element_id""".stripMargin,

    "q_chunk_combine" -> {
      val boundary = O.classify("e.full_text") + " = 'Title'"
      val nn = "chr(10)||chr(10)"
      s"""WITH RECURSIVE $parsCte,
         |els AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(ps)+1), i ->
         |    {'seq': i, 'full_text': ps[i],
         |     'text': substring(${cleanBullets("ps[i]")}, 1, 30)}), recursive := true)
         |  FROM pars),
         |walk AS (
         |  SELECT doc_id, seq, text, 0 AS chunk_idx, length(text) AS acc_len
         |  FROM els WHERE seq = 1
         |  UNION ALL
         |  SELECT e.doc_id, e.seq, e.text,
         |    CASE WHEN NOT ($boundary)
         |           AND w.acc_len + 2 + length(e.text) <= 120
         |         THEN w.chunk_idx ELSE w.chunk_idx + 1 END,
         |    CASE WHEN NOT ($boundary)
         |           AND w.acc_len + 2 + length(e.text) <= 120
         |         THEN w.acc_len + 2 + length(e.text) ELSE length(e.text) END
         |  FROM els e JOIN walk w ON e.doc_id = w.doc_id AND e.seq = w.seq + 1),
         |pchunks AS (
         |  SELECT doc_id, chunk_idx,
         |    string_agg(regexp_replace(${O.strip("text")}, '\\s+', ' ', 'g'),
         |               $nn ORDER BY seq) AS ptext
         |  FROM walk GROUP BY doc_id, chunk_idx),
         |cwalk AS (
         |  SELECT doc_id, chunk_idx, ptext, 0 AS comb_idx, length(ptext) AS acc_len
         |  FROM pchunks WHERE chunk_idx = 0
         |  UNION ALL
         |  SELECT p.doc_id, p.chunk_idx, p.ptext,
         |    CASE WHEN c.acc_len < 120 AND c.acc_len + 2 + length(p.ptext) <= 120
         |         THEN c.comb_idx ELSE c.comb_idx + 1 END,
         |    CASE WHEN c.acc_len < 120 AND c.acc_len + 2 + length(p.ptext) <= 120
         |         THEN c.acc_len + 2 + length(p.ptext) ELSE length(p.ptext) END
         |  FROM pchunks p JOIN cwalk c
         |    ON p.doc_id = c.doc_id AND p.chunk_idx = c.chunk_idx + 1)
         |SELECT doc_id, comb_idx AS chunk_seq,
         |  string_agg(ptext, $nn ORDER BY chunk_idx) AS text
         |FROM cwalk GROUP BY doc_id, comb_idx
         |ORDER BY doc_id, chunk_seq""".stripMargin
    },

    "q_chunk_split" ->
      s"""WITH RECURSIVE nrm AS (
         |  SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t
         |  FROM documents),
         |walk AS (
         |  SELECT doc_id, t AS rem, 0 AS idx, CAST(NULL AS VARCHAR) AS frag FROM nrm
         |  UNION ALL
         |  SELECT doc_id,
         |    CASE WHEN len(rem) <= 100 THEN ''
         |         WHEN sp = 0 THEN ltrim(substring(rem, 101))
         |         ELSE ltrim(substring(rem, sp + 1)) END,
         |    idx + 1,
         |    CASE WHEN len(rem) <= 100 THEN rem
         |         WHEN sp = 0 THEN rtrim(substring(rem, 1, 100))
         |         ELSE rtrim(substring(rem, 1, sp - 1)) END
         |  FROM (
         |    SELECT doc_id, rem, idx,
         |      CASE WHEN strpos(reverse(substring(rem, 1, 101)), ' ') = 0 THEN 0
         |           ELSE 102 - strpos(reverse(substring(rem, 1, 101)), ' ') END AS sp
         |    FROM walk WHERE rem <> ''))
         |SELECT doc_id, CAST(idx - 1 AS BIGINT) AS chunk_seq, frag AS text
         |FROM walk WHERE frag IS NOT NULL
         |ORDER BY doc_id, chunk_seq""".stripMargin,

    "q_reconstruct_table" ->
      s"""WITH tb AS (SELECT doc_id, ${O.words("text")} AS ws FROM documents)
         |SELECT doc_id, 'Table' AS element_type,
         |  'hA hB ' || array_to_string(list_transform(range(1, 13), i ->
         |    ws[CAST((i - 1) % len(ws) AS INT) + 1] || ' cell' || i), ' ') AS text,
         |  '<table><thead><tr><th>hA</th><th>hB</th></tr></thead>' ||
         |  array_to_string(list_transform(range(1, 13), i ->
         |    '<tr><td>' || ws[CAST((i - 1) % len(ws) AS INT) + 1] ||
         |    '</td><td>cell' || i || '</td></tr>'), '') || '</table>' AS text_as_html
         |FROM tb ORDER BY doc_id""".stripMargin,

    "q_stage_label_box" ->
      s"""$applyMetaCtes
         |SELECT 'https://cdn.example.com/els/' || h.element_id || '.txt' AS data,
         |  h.element_id AS externalId, CAST(0 AS INT) AS n_attachments, h.text
         |FROM withparent h ORDER BY externalId""".stripMargin,

    "q_stage_datasaur" ->
      s"""$applyMetaCtes
         |SELECT h.text, CAST(0 AS INT) AS n_entities
         |FROM withparent h ORDER BY h.text""".stripMargin,

    "q_stage_argilla" ->
      s"""$applyMetaCtes
         |SELECT h.element_id AS id, h.text
         |FROM withparent h ORDER BY id""".stripMargin,

    "q_stage_prodigy_csv" ->
      s"""$applyMetaCtes
         |SELECT h.text, h.element_id AS id
         |FROM withparent h ORDER BY id""".stripMargin,

    "q_stage_transformers" ->
      s"""WITH $parsCte,
         |typed AS ($typedSelect),
         |norm AS (
         |  SELECT doc_id, seq, element_type,
         |    regexp_replace(text, '\\s+', ' ', 'g') AS text FROM typed),
         |parts AS (
         |  SELECT doc_id, seq, element_type, text,
         |    string_split(text, ' ') AS ws FROM norm),
         |expanded AS (
         |  SELECT doc_id, seq, element_type,
         |    CASE WHEN len(ws) > 10
         |      THEN list_transform(range(0, CAST(ceil(len(ws) / 10.0) AS INT)),
         |             g -> array_to_string(ws[g * 10 + 1 : g * 10 + 10], ' '))
         |      ELSE [text] END AS pieces
         |  FROM parts)
         |SELECT doc_id, seq, element_type, unnest(pieces) AS text
         |FROM expanded ORDER BY doc_id, seq, text""".stripMargin,

    "q_orig_elements_codec" ->
      s"""WITH $parsCte
         |SELECT doc_id, seq, ${O.classify("full_text")} AS element_type,
         |  ${cleanBullets("full_text")} AS text
         |FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, len(ps)+1), i ->
         |    {'seq': i, 'full_text': ps[i]}), recursive := true)
         |  FROM pars)
         |ORDER BY doc_id, seq""".stripMargin)

  /** typed-element projection shared by several oracles. */
  private lazy val typedSelect: String =
    s"""
       |  SELECT doc_id, seq, ${O.classify("full_text")} AS element_type,
       |    ${cleanBullets("full_text")} AS text
       |  FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(ps)+1), i ->
       |      {'seq': i, 'full_text': ps[i]}), recursive := true)
       |    FROM pars)""".stripMargin

  /** Shared CTE chain for the apply_metadata oracles. */
  private lazy val applyMetaCtes: String = {
    val childTypes = graft.operators.MetadataOps.HierarchyRuleSet("Title")
      .map(t => s"'$t'").mkString(", ")
    // `apply_lang_metadata` doc-level detection: the detectLanguages mirror
    // (part3 codes, script cascade, short-ascii eng fallback, NULL for empty)
    // with the detector's latin 'und' verdict mapping to no-language, as the
    // Scala default detector does (`LangCodes.defaultDetector`).
    val langSql = s"NULLIF(${AnalysisQueries.detectLanguagesSql("full_txt")}, 'und')"
    s"""WITH $parsCte,
       |typed AS ($typedSelect),
       |hashed AS (
       |  SELECT *, substring(sha256(
       |    'doc_' || doc_id || '.txt' || text || 'None' || (seq - 1)::VARCHAR), 1, 32)
       |    AS element_id
       |  FROM typed),
       |withparent AS (
       |  SELECT *, CASE WHEN element_type IN ($childTypes) THEN
       |    last_value(CASE WHEN element_type = 'Title' THEN element_id END IGNORE NULLS)
       |      OVER (PARTITION BY doc_id ORDER BY seq
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |    ELSE NULL END AS parent_id
       |  FROM hashed),
       |langs AS (
       |  SELECT doc_id, $langSql AS lang
       |  FROM (SELECT doc_id, string_agg(text, ' ' ORDER BY seq) AS full_txt
       |        FROM typed GROUP BY doc_id)
       |  GROUP BY doc_id, full_txt)""".stripMargin
  }

  /** Per-row language under `apply_lang_metadata`: the doc-level code when
    * detection succeeded, else the per-element detect over the row's own text
    * (`lang.py:543-559`). `l`/`h` are the langs/withparent aliases. */
  private lazy val rowLangSql: String =
    s"(CASE WHEN l.lang IS NOT NULL THEN l.lang " +
      s"ELSE NULLIF(${AnalysisQueries.detectLanguagesSql("h.text")}, 'und') END)"
}
