package graft.operators

import graft.operators.Chunker.TableChunker

/**
 * Table-evaluation metric (`/root/reference/unstructured/metrics/evaluate.py:207-339`,
 * `metrics/table/table_eval.py` — TEDS-like): cell-level similarity between a
 * predicted and a gold HTML table. Score = 2·|matched cells| / (|gold| + |pred|),
 * where a cell matches when its (row, column, normalized text) agree — the
 * structure+content variant; `contentOnly=true` ignores position (bag of cell
 * texts).
 */
object MetricsOps {

  /**
   * `filter_metrics` — `metrics/evaluate.py:599-662`: keep only the metric rows
   * whose `filterBy` column appears in the allow-list. The DataFrame variant is a
   * broadcast semi-join (the allow-list is a file-name list, always small relative
   * to the metrics table — never shuffle the metrics side for it).
   */
  def filterMetrics(df: org.apache.spark.sql.DataFrame, filterList: Seq[String],
      filterBy: String = "filename"): org.apache.spark.sql.DataFrame = {
    require(df.columns.contains(filterBy),
      "`filter_by` key does not exists in the data provided") // evaluate.py:647-648
    df.filter(org.apache.spark.sql.functions.col(filterBy)
      .isin(filterList: _*))
  }

  def filterMetrics(df: org.apache.spark.sql.DataFrame,
      filterDf: org.apache.spark.sql.DataFrame, filterBy: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(df.columns.contains(filterBy),
      "`filter_by` key does not exists in the data provided")
    val keys = filterDf.select(col(filterDf.columns.head).cast("string").as(filterBy))
      .distinct()
    df.join(broadcast(keys), Seq(filterBy), "left_semi")
  }

  /**
   * `TextExtractionMetricsCalculator` (`metrics/evaluate.py:342-455`) as a
   * DataFrame evaluation: inputs are `(path, text)` frames — `outputs` holds
   * each document's extracted clean-concatenated text under its output path
   * (e.g. `connector_a/Report.pdf.json`), `groundTruths` the gold CCT under
   * the same relative path with a `.txt` suffix. One row per output doc:
   * `filename, doctype, connector, cct_accuracy, cct_pct_missing` —
   *  - `filename` = path stem ("Report.pdf"), `doctype` = second-to-last
   *    suffix (".pdf"), `connector` = first path segment when nested, else
   *    null (evaluate.py:409-412);
   *  - accuracy = `calculate_accuracy` with the calculator's (1,1,1)
   *    weights, rounded 3 — UNLESS the output/source byte-length ratio
   *    falls outside (0.5, 2.0), where the reference pins 0.01 instead of
   *    paying a hopeless Levenshtein (evaluate.py:417-421);
   *  - pct missing = `calculate_percent_missing_text`, rounded 3.
   * Rows are ordered by path for determinism. Scale shape: one equi-join on
   * the path stem + a per-row map — the quadratic Levenshtein cost is
   * per-document and distributed, never a corpus-wide comparison.
   */
  def textExtractionEvaluation(outputs: org.apache.spark.sql.DataFrame,
      groundTruths: org.apache.spark.sql.DataFrame,
      documentType: String = "json"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    if (documentType != "json" && documentType != "txt")
      throw new IllegalArgumentException(
        "Specified file type under `documents_dir` or `output_list` should " +
          s"be one of `json` or `txt`. The given file type is $documentType, " +
          "exiting.") // evaluate.py:386-391
    val sp = outputs.sparkSession
    import sp.implicits._
    def stem(c: org.apache.spark.sql.Column) =
      regexp_replace(c, "\\.[^./]+$", "")
    val o = outputs
      .filter(col("path").endsWith(s".$documentType")) // inconsistent types skip
      .select(stem(col("path")).as("k"), col("path"), col("text").as("o_text"))
    val g = groundTruths.select(stem(col("path")).as("k"), col("text").as("s_text"))
    o.join(g, Seq("k"))
      .select(col("path"), col("o_text"), col("s_text"))
      .as[(String, String, String)]
      .flatMap { case (path, oText, sText) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        val stemName = name.substring(0, name.lastIndexOf('.'))
        val doctype =
          if (stemName.contains('.')) stemName.substring(stemName.lastIndexOf('.'))
          else ""
        val connector =
          if (path.contains('/')) Some(path.substring(0, path.indexOf('/'))) else None
        val oBytes = oText.getBytes("UTF-8").length.toDouble
        val sBytes = sText.getBytes("UTF-8").length.toDouble
        // an EMPTY ground truth drops the document: the reference's byte
        // ratio divides by the source size (`evaluate.py` _process_document),
        // so sBytes == 0 raises ZeroDivisionError there and the doc is
        // recorded as a per-doc failure, never a row
        if (sBytes == 0) None
        else {
          val accuracy =
            if (oBytes / sBytes > 0.5 && oBytes / sBytes < 2.0)
              BigDecimal(TextExtractionMetrics.calculateAccuracy(
                oText, sText, weights = (1, 1, 1)))
                .setScale(3, BigDecimal.RoundingMode.HALF_EVEN).toDouble
            else 0.01 // the reference's skip-the-hopeless-Levenshtein pin
          val missing = TextExtractionMetrics.calculatePercentMissingText(oText, sText)
          Some((path, stemName, doctype, connector, accuracy, missing))
        }
      }
      .toDF("path", "filename", "doctype", "connector",
        "cct-accuracy", "cct-%missing") // the reference's exact tsv headers,
      .orderBy("path").drop("path")     // so getMeanGrouping composes directly
  }

  /**
   * `ElementTypeMetricsCalculator` (`metrics/evaluate.py:444-509`) as a
   * DataFrame evaluation — the element-type twin of
   * [[textExtractionEvaluation]]: inputs are ELEMENT-level `(path,
   * element_type, category_depth)` frames (one row per element of each
   * document's output/ground-truth), output is one row per document —
   * `filename, doctype, connector, element-type-accuracy` — where accuracy
   * is the per-doc [[elementTypePercentMatch]] (exact (type, depth) matches
   * count fully, type-only leftovers at weight 0.5, normalized by the
   * source's total, clamped to [0,1], rounded 3). A document whose output
   * or source side has zero elements scores 0.0
   * (`calculate_element_type_percent_match`'s empty rule); documents
   * missing a ground truth drop (the reference's per-doc failure drop).
   * Scale shape: the whole evaluation is ONE tagged union + three grouped
   * aggregations keyed by the path stem — per-doc python loops become
   * map-side-combinable group-bys, linear at any corpus size.
   */
  def elementTypeEvaluation(outputs: org.apache.spark.sql.DataFrame,
      groundTruths: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    def stem(c: org.apache.spark.sql.Column) = regexp_replace(c, "\\.[^./]+$", "")
    def tag(d: org.apache.spark.sql.DataFrame, isO: Boolean) =
      d.select(stem(col("path")).as("k"),
        (if (isO) col("path") else lit(null).cast("string")).as("path"),
        col("element_type").as("t"), col("category_depth").cast("int").as("d"),
        lit(isO).as("is_o"))
    val tagged = tag(outputs, isO = true).unionByName(tag(groundTruths, isO = false))
    // two-level rollup so the ELEMENT-grain aggregation hash-aggregates:
    // min(path) is a string aggregate, unsupported by HashAggregate, and one
    // min(path) at (k,t,d) grain forced the whole element-level pass (and its
    // map-side partial) through Sort+SortAggregate. Grouping path/is_o as
    // KEYS (strings are fine as grouping keys) keeps level 1 a pure count —
    // whole-stage hash — and the min(path)/count merge runs over the
    // collapsed (k,t,d,path,is_o) rows, a few per document. Same totals by
    // construction: min over per-group mins, sums over partial counts.
    val keyed = tagged.groupBy("k", "t", "d", "path", "is_o")
      .agg(count(lit(1)).as("c"))
      .groupBy("k", "t", "d")
      .agg(min("path").as("path"),
        sum(when(col("is_o"), col("c")).otherwise(0L)).as("o_n"),
        sum(when(!col("is_o"), col("c")).otherwise(0L)).as("s_n"))
      .withColumn("m", least(col("o_n"), col("s_n")))
    val perType = keyed.groupBy("k", "t")
      .agg(min("path").as("path"), sum("m").as("exact"),
        sum(col("o_n") - col("m")).as("o_left"),
        sum(col("s_n") - col("m")).as("s_left"),
        sum("o_n").as("o_tot"), sum("s_n").as("s_tot"))
    val perDoc = perType.groupBy("k")
      .agg(min("path").as("path"),
        (sum("exact") + lit(0.5) * sum(least(col("o_left"), col("s_left"))))
          .as("num"),
        (sum("exact") + sum("s_left")).as("den"),
        sum("o_tot").as("o_all"), sum("s_tot").as("s_all"))
      // inner-join semantics: a doc needs an output row (path != null) AND a
      // ground truth (s_all > 0 — a missing gt FILE drops the doc, the
      // reference's per-doc failure drop; element frames cannot represent
      // an existing-but-empty file, the one case the reference scores 0.0)
      .filter(col("path").isNotNull && col("s_all") > 0)
    val name = element_at(split(col("path"), "/"), -1)
    val stemName = regexp_replace(name, "\\.[^./]+$", "")
    perDoc.select(
        col("path"),
        stemName.as("filename"),
        when(stemName.contains("."),
          regexp_extract(stemName, "(\\.[^.]*)$", 1)).otherwise(lit(""))
          .as("doctype"),
        when(col("path").contains("/"), element_at(split(col("path"), "/"), 1))
          .as("connector"),
        when(col("o_all") === 0 || col("s_all") === 0 || col("den") === 0, lit(0.0))
          // bround = HALF_EVEN, matching Python round() (banker's) and the
          // sibling textExtractionEvaluation; Spark round() is HALF_UP and
          // diverges from the reference on exact ties (1/16 -> .063 vs .062)
          .otherwise(bround(
            least(greatest(col("num") / col("den"), lit(0.0)), lit(1.0)), 3))
          .as("element-type-accuracy"))
      .orderBy("path").drop("path")
  }

  /**
   * `calculate_element_type_percent_match` (`metrics/element_type.py:43-94`) as
   * a DataFrame aggregation. Inputs are (type, depth) frequency tables —
   * `get_element_type_frequency` — with columns `element_type` STRING,
   * `category_depth` nullable INT, `n` LONG. Two-stage match: exact
   * (type, depth) pairs count fully; leftovers re-matched on type alone count
   * at `categoryDepthWeight`; normalized by the source's total element count
   * and clamped to [0, 1]. Empty output or source scores 0.0. Shape: tag-union
   * of the two histograms + two-level aggregation — a full outer join would be
   * un-broadcastable and cost an extra shuffle pair; the union aggregates with
   * map-side partials instead, linear at any histogram size.
   */
  def elementTypePercentMatch(output: org.apache.spark.sql.DataFrame,
      source: org.apache.spark.sql.DataFrame,
      categoryDepthWeight: Double = 0.5): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val tagged = output
      .select(col("element_type"), col("category_depth"), col("n"), lit(true).as("is_o"))
      .unionByName(source.select(col("element_type"), col("category_depth"),
        col("n"), lit(false).as("is_o")))
    val keyed = tagged.groupBy(col("element_type").as("t"), col("category_depth"))
      .agg(sum(when(col("is_o"), col("n")).otherwise(0L)).as("o_n"),
        sum(when(!col("is_o"), col("n")).otherwise(0L)).as("s_n"))
      .withColumn("m", least(col("o_n"), col("s_n")))
    val perType = keyed.groupBy("t").agg(
      sum("m").as("exact"),
      sum(col("o_n") - col("m")).as("o_left"),
      sum(col("s_n") - col("m")).as("s_left"))
    perType.agg(
      (sum("exact") + lit(categoryDepthWeight) * sum(least(col("o_left"), col("s_left"))))
        .as("num"),
      (sum("exact") + sum("s_left")).as("den"))
      .select(
        when(col("den").isNull || col("den") === 0, lit(0.0))
          .otherwise(least(greatest(col("num") / col("den"), lit(0.0)), lit(1.0)))
          .as("percent_match"))
  }

  /** Aggregation fields per evaluated metric — `get_mean_grouping`
    * (`evaluate.py:533-548`). */
  def aggFieldsFor(evalName: String): Seq[String] = evalName match {
    case "text_extraction" => Seq("cct-accuracy", "cct-%missing")
    case "element_type" => Seq("element-type-accuracy")
    case "object_detection" => Seq("f1_score", "m_ap")
    case other => throw new IllegalArgumentException(
      s"Unknown metric for eval $other. " +
        "Expected `text_extraction` or `element_type` or `table_extraction`.")
  }

  /**
   * `get_mean_grouping` (`evaluate.py:510-597`) as a DataFrame aggregation:
   * mean / sample-stdev / population-stdev / count of each metric field,
   * grouped by `doctype`/`connector` (or one global row for "all"). The
   * reference's validations carry over: an invalid grouping category and an
   * unknown eval name raise; a missing or all-null grouping column and an
   * empty frame raise (its SystemExit branches).
   */
  def getMeanGrouping(df: org.apache.spark.sql.DataFrame, groupBy: String,
      evalName: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    if (groupBy != "doctype" && groupBy != "connector" && groupBy != "all")
      throw new IllegalArgumentException(
        "Invalid grouping category. Returning a non-group evaluation.")
    val fields = aggFieldsFor(evalName).filter(df.columns.contains)
    if (df.isEmpty)
      throw new IllegalStateException("Data is empty. Exiting.")
    if (groupBy != "all" && (!df.columns.contains(groupBy) ||
        df.filter(col(groupBy).isNotNull).isEmpty))
      throw new IllegalStateException(
        s"Data cannot be aggregated by `$groupBy`." +
          " Check if it's empty or the column is missing/empty.")
    val keyed =
      if (groupBy == "all") df.withColumn("grouping_key", lit(0)) else df
    val key = if (groupBy == "all") "grouping_key" else groupBy
    // bround = HALF_EVEN, matching Python round(); _mean/_stdev/_pstdev all
    // default to 3 decimals in the reference (`metrics/utils.py:178-231`).
    // Both deviations are None under 2 scores there (`_stdev`/`_pstdev`
    // docstrings) — Spark's stddev_samp(1)=NaN / stddev_pop(1)=0.0 are both
    // wrong, so gate them on the group's non-null count like aggregateScores.
    val aggs = fields.flatMap { f =>
      Seq(bround(avg(col(f)), 3).as(s"$f _mean"),
        when(count(col(f)) > 1, bround(stddev_samp(col(f)), 3)).as(s"$f _stdev"),
        when(count(col(f)) > 1, bround(stddev_pop(col(f)), 3)).as(s"$f _pstdev"),
        count(col(f)).as(s"$f _count"))
    }
    val out = keyed.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
    if (groupBy == "all") out.drop("grouping_key") else out
  }

  /**
   * The calculators' aggregate frame (`_generate_dataframes`,
   * `evaluate.py:437-443,497-507`): one row per metric field under
   * AGG_HEADERS — `metric, average, sample_sd, population_sd, count`.
   * average / sample_sd / population_sd round half-even at 3 (Python
   * round); fewer than two scores yield null deviations
   * (`statistics.stdev` needs n >= 2 — and Spark's stddev_samp(1) is NaN,
   * stddev_pop(1) is 0.0, both wrong here), zero scores a null mean. An
   * empty `text_extraction` frame aggregates to an EMPTY frame (the
   * reference emits headers only, `evaluate.py:439-440`), while an empty
   * `element_type` frame keeps its single count-0 row — the exact shape
   * committed in the reference's own golden
   * `test_unstructured_ingest/metrics/element-type/aggregate-scores-element-type.tsv`.
   */
  def aggregateScores(df: org.apache.spark.sql.DataFrame,
      evalName: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val fields = aggFieldsFor(evalName)
    val aggs = fields.zipWithIndex.flatMap { case (f, i) => Seq(
      bround(avg(col(f)), 3).as(s"avg_$i"),
      bround(stddev_samp(col(f)), 3).as(s"sd_$i"),
      bround(stddev_pop(col(f)), 3).as(s"psd_$i"),
      count(col(f)).as(s"n_$i")) }
    // one physical aggregation: the per-metric rows below each reference
    // this ONE-ROW frame, and without materialization every union branch
    // re-runs the whole upstream per-doc eval pipeline (k× scans in the
    // r17 q_eval_capstone before-plan); checkpointing one row is free at
    // any scale
    val one = df.agg(aggs.head, aggs.tail: _*).localCheckpoint(true)
    val rows = fields.zipWithIndex.map { case (f, i) =>
      one.select(lit(f).as("metric"),
        col(s"avg_$i").as("average"),
        when(col(s"n_$i") > 1, col(s"sd_$i")).as("sample_sd"),
        when(col(s"n_$i") > 1, col(s"psd_$i")).as("population_sd"),
        col(s"n_$i").cast("long").as("count")) }
    val out = rows.reduce(_.unionByName(_))
    if (evalName == "text_extraction") out.filter(col("count") > 0) else out
  }

  def tableEvalScore(goldHtml: String, predHtml: String,
      contentOnly: Boolean = false): Double = {
    val gold = TableChunker.parseRows(goldHtml)
    val pred = TableChunker.parseRows(predHtml)
    val goldCells = for ((r, ri) <- gold.zipWithIndex; (t, ci) <- r.cellTexts.zipWithIndex)
      yield (ri, ci, t)
    val predCells = for ((r, ri) <- pred.zipWithIndex; (t, ci) <- r.cellTexts.zipWithIndex)
      yield (ri, ci, t)
    if (goldCells.isEmpty && predCells.isEmpty) return 1.0
    if (goldCells.isEmpty || predCells.isEmpty) return 0.0
    val matched =
      if (contentOnly) {
        val bag = scala.collection.mutable.Map.empty[String, Int]
        goldCells.foreach { case (_, _, t) => bag(t) = bag.getOrElse(t, 0) + 1 }
        predCells.count { case (_, _, t) =>
          val n = bag.getOrElse(t, 0)
          if (n > 0) { bag(t) = n - 1; true } else false
        }
      } else {
        val goldSet = goldCells.toSet
        predCells.count(goldSet.contains)
      }
    2.0 * matched / (goldCells.size + predCells.size)
  }
}
