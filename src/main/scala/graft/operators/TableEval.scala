package graft.operators

import scala.collection.mutable

import graft.operators.TableExtraction.Cell

/**
 * Table-structure evaluation — the Scala counterpart of
 * `metrics/table/table_eval.py` (`TableEvalProcessor.process_file`,
 * `:230-327`) and `metrics/table/table_alignment.py`:
 *
 *  - table-level alignment: each predicted table matches the closest
 *    ground-truth table by concatenated-content similarity (difflib
 *    `get_close_matches` semantics, cutoff 0.1);
 *  - `table_level_acc`: mean `SequenceMatcher.ratio` between matched
 *    concatenated contents (0 for unmatched predictions);
 *  - detection recall/precision/F1 over matched-index sets;
 *  - element-level index accuracy: per predicted cell, the closest
 *    ground-truth cell content (cutoff 0.8, duplicate-aware index rotation)
 *    and the fraction whose row/col indices agree;
 *  - element-level content accuracy: mean per-column / per-row token-sort
 *    ratios between aligned contents (the `compare_contents_as_df` step from
 *    unstructured-inference, reproduced as token-sort-ratio over
 *    column-/row-grouped content).
 *
 * The similarity kernel reproduces difflib's Ratcliff-Obershelp `ratio`
 * including the autojunk popularity rule (elements above 1% of a 200+-char
 * second sequence are excluded from matching).
 *
 * Per-document metric: on a cluster this runs inside the per-doc groupBy the
 * other metric calculators use — no cross-document state.
 */
object TableEval {

  /** `TableEvaluation` (`table_eval.py:40-60`). NaN marks the reference's
    * no-ground-truth-no-prediction case. */
  final case class Evaluation(
      totalTables: Int,
      totalPredictedTables: Int,
      tableLevelAcc: Double,
      tableDetectionRecall: Double,
      tableDetectionPrecision: Double,
      tableDetectionF1: Double,
      elementColLevelIndexAcc: Double,
      elementRowLevelIndexAcc: Double,
      elementColLevelContentAcc: Double,
      elementRowLevelContentAcc: Double) {
    /** `composite_structure_acc` (`table_eval.py:55-60`). */
    def compositeStructureAcc: Double =
      (elementColLevelIndexAcc + elementRowLevelIndexAcc +
        (elementColLevelContentAcc + elementRowLevelContentAcc) / 2) / 3
  }

  // ------------------------------------------------------------ difflib kernel

  /** `difflib.SequenceMatcher(None, a, b).ratio()` — Ratcliff-Obershelp with
    * the autojunk popularity rule on `b`. Elements are CODE POINTS (Python
    * strings), not UTF-16 units: unit-level matching would let two different
    * astral chars "half-match" through a shared high surrogate, and the
    * ratio denominator / autojunk length threshold would both miscount. */
  def sequenceRatio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    sequenceRatioCp(a.codePoints().toArray, new BSide(b.codePoints().toArray))
  }

  /** Precomputed b-side matcher state — Python's `SequenceMatcher.set_seq2`:
    * the element→positions index with the autojunk popularity rule applied.
    * Built ONCE per `word` in [[closestIndex]] (get_close_matches sets seq2
    * once and only swaps seq1 per candidate). */
  private final class BSide(val b: Array[Int]) {
    val b2j: mutable.Map[Int, mutable.ArrayBuffer[Int]] = {
      val m = mutable.Map.empty[Int, mutable.ArrayBuffer[Int]]
      var bi = 0
      while (bi < b.length) {
        m.getOrElseUpdate(b(bi), mutable.ArrayBuffer.empty) += bi
        bi += 1
      }
      if (b.length >= 200) { // autojunk: drop elements above 1% popularity
        val ntest = b.length / 100 + 1
        val popular = m.collect { case (c, idxs) if idxs.length > ntest => c }
        popular.foreach(m.remove)
      }
      m
    }
  }

  private def sequenceRatioCp(a: Array[Int], bs: BSide): Double = {
    val b = bs.b
    val b2j = bs.b2j

    def longestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var besti = alo
      var bestj = blo
      var bestsize = 0
      var j2len = Map.empty[Int, Int]
      var i = alo
      while (i < ahi) {
        val newj2len = mutable.Map.empty[Int, Int]
        b2j.getOrElse(a(i), Nil).foreach { j =>
          if (j >= blo && j < bhi) {
            val k = j2len.getOrElse(j - 1, 0) + 1
            newj2len(j) = k
            if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
          }
        }
        j2len = newj2len.toMap
        i += 1
      }
      // CPython find_longest_match's extension phases (difflib.py): an
      // autojunk-POPULAR element is removed from b2j so it cannot SEED a
      // match, but an anchored match (or the empty anchor at (alo, blo))
      // still EXTENDS through equal elements missing from b2j — without
      // this, two long strings of all-popular chars score 0.0 where the
      // reference scores their common run. With junk=None the b-junk set is
      // empty, so the "non-junk then junk" extension pair collapses to one
      // unconditional equal-extension in each direction.
      while (besti > alo && bestj > blo && a(besti - 1) == b(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
          a(besti + bestsize) == b(bestj + bestsize)) {
        bestsize += 1
      }
      (besti, bestj, bestsize)
    }

    var matches = 0
    val queue = mutable.Stack((0, a.length, 0, b.length))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val (i, j, k) = longestMatch(alo, ahi, blo, bhi)
      if (k > 0) {
        matches += k
        queue.push((alo, i, blo, j))
        queue.push((i + k, ahi, j + k, bhi))
      }
    }
    2.0 * matches / (a.length + b.length)
  }

  /** `difflib.get_close_matches(word, possibilities, n=1, cutoff)` followed by
    * `possibilities.index(match)` — the reference's alignment idiom. The
    * winner is the max by `(ratio, candidate)` tuple (heapq.nlargest compares
    * the CANDIDATE STRING on ratio ties, code-point order — not first-wins),
    * and `.index` then returns that string's FIRST occurrence. -1 when
    * nothing reaches the cutoff. */
  def closestIndex(word: String, possibilities: Seq[String], cutoff: Double): Int = {
    val bside = new BSide(word.codePoints().toArray) // set_seq2: built ONCE
    var bestStr: String = null
    var bestRatio = -1.0
    possibilities.foreach { p =>
      val r =
        if (p.isEmpty && word.isEmpty) 1.0
        else sequenceRatioCp(p.codePoints().toArray, bside)
      if (r >= cutoff &&
          (r > bestRatio || (r == bestRatio && cpCompare(p, bestStr) > 0))) {
        bestStr = p
        bestRatio = r
      }
    }
    if (bestStr == null) -1 else possibilities.indexOf(bestStr)
  }

  /** `fuzz.token_sort_ratio` on 0..100: ratio over whitespace-token-sorted
    * strings. The split is Python whitespace ([[graft.functions.Cleaners.PySpaceClass]]
    * — an HTML table's NBSP cells must tokenize as the reference does). */
  def tokenSortRatio(a: String, b: String): Double = {
    def norm(s: String) = s.toLowerCase(java.util.Locale.ROOT)
      .split(graft.functions.Cleaners.PySpaceClass + "+")
      .filter(_.nonEmpty).sortWith(cpCompare(_, _) < 0).mkString(" ")
    sequenceRatio(norm(a), norm(b)) * 100.0
  }

  /** Python `sorted()` compares strings by CODE POINT; Java's natural String
    * ordering compares UTF-16 units, which ranks every astral char BELOW
    * U+E000..FFFF instead of above. */
  private def cpCompare(x: String, y: String): Int = {
    var i = 0
    var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i)
      val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx)
      j += Character.charCount(cy)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  // ------------------------------------------------------------ alignment

  /** `TableAlignment.get_content_in_tables` (`table_alignment.py:14-24`). */
  def contentOf(table: Seq[Cell]): String = table.map(_.content).mkString(" ")

  /** `get_table_level_alignment` (`table_alignment.py:27-50`): cutoff 0.1. */
  def tableLevelAlignment(pred: Seq[Seq[Cell]], gt: Seq[Seq[Cell]]): Seq[Int] = {
    val gtTexts = gt.map(contentOf)
    pred.map(td => closestIndex(contentOf(td), gtTexts, cutoff = 0.1))
  }

  /** `table_level_acc` (`table_eval.py:63-81`): per-prediction content ratio
    * against its matched ground truth; unmatched predictions score 0. */
  def tableLevelAcc(pred: Seq[Seq[Cell]], gt: Seq[Seq[Cell]],
      matched: Seq[Int]): Seq[Double] = {
    val gtTexts = gt.map(contentOf)
    pred.zip(matched).map { case (td, idx) =>
      if (idx == -1) 0.0 else sequenceRatio(contentOf(td), gtTexts(idx))
    }
  }

  /** `calculate_table_detection_metrics` (`table_eval.py:98-132`). */
  def detectionMetrics(matched: Seq[Int], gtTables: Int): (Double, Double, Double) = {
    val truePositive = matched.filter(_ >= 0).toSet.size
    val falsePositive = matched.length - truePositive
    val recall = if (gtTables > 0) truePositive.toDouble / gtTables else 0.0
    val denom = truePositive + falsePositive
    val precision = if (denom > 0) truePositive.toDouble / denom else 0.0
    val f1 = if (precision + recall > 0) 2 * precision * recall / (precision + recall) else 0.0
    (recall, precision, f1)
  }

  private def round2(d: Double): Double = math.round(d * 100.0) / 100.0

  /** `get_element_level_alignment` (`table_alignment.py:59-180`). */
  def elementLevelAlignment(pred: Seq[Seq[Cell]], gt: Seq[Seq[Cell]],
      matched: Seq[Int], cutoff: Double = 0.8): Map[String, Double] = {
    val contentDiffCols = mutable.ArrayBuffer.empty[Double]
    val contentDiffRows = mutable.ArrayBuffer.empty[Double]
    val colIndexAcc = mutable.ArrayBuffer.empty[Double]
    val rowIndexAcc = mutable.ArrayBuffer.empty[Double]

    matched.zip(pred).foreach { case (idx, td) =>
      if (idx == -1) {
        contentDiffCols += 0; contentDiffRows += 0
        colIndexAcc += 0; rowIndexAcc += 0
      } else {
        val gtTd = gt(idx)
        // compare_contents_as_df: token-sort ratio over column-/row-grouped
        // content (indices as strings, missing groups compare against "")
        def grouped(cells: Seq[Cell], byCol: Boolean): Map[Int, String] =
          cells.groupBy(c => if (byCol) c.colIndex else c.rowIndex)
            .map { case (k, cs) => k -> cs.map(_.content).mkString(" ") }
        def groupRatio(byCol: Boolean): Double = {
          val g = grouped(gtTd, byCol)
          val p = grouped(td, byCol)
          val keys = (g.keySet ++ p.keySet).toSeq.sorted
          if (keys.isEmpty) 100.0
          else keys.map(k =>
            tokenSortRatio(g.getOrElse(k, ""), p.getOrElse(k, ""))).sum / keys.size
        }
        contentDiffCols += groupRatio(byCol = true)
        contentDiffRows += groupRatio(byCol = false)

        // index accuracy: duplicate-aware closest-content matching
        // (Locale.ROOT like Python str.lower() — default-locale lowercase
        // turns "ID" into dotless-i under tr-TR)
        val gtContents = gtTd.map(_.content.toLowerCase(java.util.Locale.ROOT))
        val used = mutable.Set.empty[Int]
        var alignedRow = 0
        var alignedCol = 0
        var total = 0
        td.foreach { cell =>
          val m = closestIndex(
            cell.content.toLowerCase(java.util.Locale.ROOT), gtContents, cutoff)
          if (m >= 0) {
            val matchContent = gtContents(m)
            var candidates = gtContents.zipWithIndex
              .collect { case (s, i) if s == matchContent && !used.contains(i) => i }
            if (candidates.isEmpty) {
              used.clear()
              candidates = gtContents.zipWithIndex
                .collect { case (s, i) if s == matchContent => i }
            }
            val mi = candidates.head
            used += mi
            if (cell.rowIndex == gtTd(mi).rowIndex) alignedRow += 1
            if (cell.colIndex == gtTd(mi).colIndex) alignedCol += 1
            total += 1
          }
        }
        colIndexAcc += (if (total > 0) round2(alignedCol.toDouble / total) else 0.0)
        rowIndexAcc += (if (total > 0) round2(alignedRow.toDouble / total) else 0.0)
      }
    }
    // unmatched ground-truth tables drag every mean down (:166-173)
    gt.indices.filterNot(matched.contains).foreach { _ =>
      contentDiffCols += 0; contentDiffRows += 0
      colIndexAcc += 0; rowIndexAcc += 0
    }
    def mean(xs: Seq[Double]): Double = if (xs.isEmpty) 0.0 else xs.sum / xs.size
    Map(
      "col_index_acc" -> round2(mean(colIndexAcc.toSeq)),
      "row_index_acc" -> round2(mean(rowIndexAcc.toSeq)),
      "col_content_acc" -> round2(mean(contentDiffCols.toSeq) / 100.0),
      "row_content_acc" -> round2(mean(contentDiffRows.toSeq) / 100.0))
  }

  /** `TableEvalProcessor.process_file` (`table_eval.py:230-327`) over
    * already-extracted cell tables ([[TableExtraction.extractFromPrediction]]
    * supplies the prediction side; ground truth arrives as Deckerd cells). */
  def processFile(pred0: Seq[Seq[Cell]], gt0: Seq[Seq[Cell]],
      cutoff: Double = 0.8): Evaluation = {
    // _sort_table_cells runs on both sides before any comparison
    // (table_extraction.py:162 + prediction path)
    val pred = pred0.map(_.sortBy(c => (c.rowIndex, c.colIndex)))
    val gt = gt0.map(_.sortBy(c => (c.rowIndex, c.colIndex)))
    val hasGt = gt.nonEmpty
    val hasPred = pred.nonEmpty
    if (!hasGt) {
      val score = if (hasPred) 0.0 else Double.NaN
      val tableAcc = if (hasPred) 0.0 else 1.0
      Evaluation(0, pred.length, tableAcc, score, score, score, score, score,
        score, score)
    } else if (!hasPred) {
      Evaluation(gt.length, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    } else {
      val matched = tableLevelAlignment(pred, gt)
      processWithAlignment(pred, gt, matched, cutoff)
    }
  }

  /** The matched-indices-injected variant (the reference's tests mock
    * `get_table_level_alignment` to force a no-match case). */
  def processWithAlignment(pred0: Seq[Seq[Cell]], gt0: Seq[Seq[Cell]],
      matched: Seq[Int], cutoff: Double = 0.8): Evaluation = {
    val pred = pred0.map(_.sortBy(c => (c.rowIndex, c.colIndex)))
    val gt = gt0.map(_.sortBy(c => (c.rowIndex, c.colIndex)))
    val acc = tableLevelAcc(pred, gt, matched)
    val meanAcc = if (acc.isEmpty) 0.0 else acc.sum / acc.size
    val metrics = elementLevelAlignment(pred, gt, matched, cutoff)
    val (recall, precision, f1) = detectionMetrics(matched, gt.length)
    Evaluation(
      totalTables = gt.length,
      totalPredictedTables = pred.length,
      tableLevelAcc = meanAcc,
      tableDetectionRecall = recall,
      tableDetectionPrecision = precision,
      tableDetectionF1 = f1,
      elementColLevelIndexAcc = metrics("col_index_acc"),
      elementRowLevelIndexAcc = metrics("row_index_acc"),
      elementColLevelContentAcc = metrics("col_content_acc"),
      elementRowLevelContentAcc = metrics("row_content_acc"))
  }
}
