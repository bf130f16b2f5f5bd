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
    val aggs = fields.flatMap { f =>
      Seq(round(avg(col(f)), 3).as(s"$f _mean"),
        round(stddev_samp(col(f)), 3).as(s"$f _stdev"),
        round(stddev_pop(col(f)), 4).as(s"$f _pstdev"),
        count(col(f)).as(s"$f _count"))
    }
    val out = keyed.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
    if (groupBy == "all") out.drop("grouping_key") else out
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
