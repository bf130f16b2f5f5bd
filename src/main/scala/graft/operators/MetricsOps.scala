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
