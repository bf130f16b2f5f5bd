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
