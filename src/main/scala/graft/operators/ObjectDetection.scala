package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Object-detection evaluation metrics — the reference's
 * `metrics/object_detection.py` (ObjectDetectionEvalProcessor, itself adapted
 * from the Apache-2.0 super-gradients `detection_utils.py`): COCO-style
 * mAP@[.5:.95] plus precision/recall/F1 at a confidence cutoff, computed per
 * document and surfaced through `metrics/evaluate.py:665-831`.
 *
 * Faithful pieces (constants `object_detection.py:12-16`):
 *  - 10 IoU thresholds 0.50..0.95, score threshold 0.1, 101 recall points;
 *  - per-page greedy matching (`_compute_targets:341-415`): predictions
 *    visited in per-class-rank order (`_get_top_k_idx_per_cls:266-291`, top-k
 *    100), targets per prediction in stable IoU-descending order, a pair
 *    claims every IoU threshold it clears where both sides are still free;
 *    class mismatch zeroes IoU; pred boxes clipped to the page box;
 *  - per-class curves (`_compute_detection_metrics_per_cls:578-664`):
 *    confidence-descending cumulative TP/FP, precision made monotone by
 *    reversed cummax, P/R read at the lowest score >= 0.1, AP = mean of the
 *    precision envelope sampled at 101 recall thresholds (0 past the curve);
 *  - only classes present in ground truth contribute
 *    (`_compute_detection_metrics:546`); per-doc aggregates are plain means
 *    over (class, IoU-threshold) cells (`get_metrics:186-199`).
 *
 * Divergence: arithmetic is double throughout (the reference mixes float32
 * tensors); the epsilons (2.22e-16 for precision, 1e-16 for F1) are kept.
 *
 * Spark shape: one `groupByKey(doc_id)` — per-doc box sets are model output,
 * thousands at most, so the greedy loop is cheap per task and the job scales
 * linearly with document count; no driver collection anywhere.
 */
object ObjectDetection {

  val IouThresholds: Array[Double] =
    Array(0.50, 0.55, 0.60, 0.65, 0.70, 0.75, 0.80, 0.85, 0.90, 0.95)
  val ScoreThreshold = 0.1
  val RecallThresholds: Array[Double] = Array.tabulate(101)(_ * 0.01)
  /** torch.finfo(float64).eps — added to the precision denominator. */
  val PrecisionEps = 2.220446049250313e-16
  val F1Eps = 1e-16
  val TopKPerClass = 100

  final case class BoxRow(doc_id: Long, kind: String, page: Int, cls: Int,
      x1: Double, y1: Double, x2: Double, y2: Double, score: Double)

  final case class DocMetrics(doc_id: Long, m_ap: Double, precision: Double,
      recall: Double, f1_score: Double)

  private def iou(ax1: Double, ay1: Double, ax2: Double, ay2: Double,
      bx1: Double, by1: Double, bx2: Double, by2: Double): Double = {
    val iw = math.max(0.0, math.min(ax2, bx2) - math.max(ax1, bx1))
    val ih = math.max(0.0, math.min(ay2, by2) - math.max(ay1, by1))
    val inter = iw * ih
    val union = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    if (union <= 0) 0.0 else inter / union
  }

  /** Per-page greedy matching. Returns (predsMatched[i][j], predsIgnore[i]). */
  private def matchPage(preds: IndexedSeq[BoxRow], targets: IndexedSeq[BoxRow],
      width: Double, height: Double): (Array[Array[Boolean]], Array[Boolean]) = {
    val nThr = IouThresholds.length
    val predsMatched = Array.ofDim[Boolean](preds.size, nThr)
    val targetsMatched = Array.ofDim[Boolean](targets.size, nThr)
    val ignore = Array.fill(preds.size)(true)
    if (preds.isEmpty) return (predsMatched, ignore)

    // top-k per class; visit order is (rank, class) — the row-major nonzero of
    // the reference's per-class sorted score matrix
    val idxToUse: Seq[Int] = preds.indices.groupBy(i => preds(i).cls).toSeq
      .flatMap { case (c, idxs) =>
        idxs.sortBy(i => (-preds(i).score, i)).take(TopKPerClass)
          .zipWithIndex.map { case (i, rank) => (rank, c, i) }
      }.sortBy(t => (t._1, t._2)).map(_._3)
    idxToUse.foreach(ignore(_) = false)
    if (targets.isEmpty) return (predsMatched, ignore)

    def clippedIou(pi: Int, ti: Int): Double = {
      val p = preds(pi); val t = targets(ti)
      if (p.cls != t.cls) 0.0 // class mismatch zeroes IoU
      else iou(
        math.min(math.max(p.x1, 0.0), width), math.min(math.max(p.y1, 0.0), height),
        math.min(math.max(p.x2, 0.0), width), math.min(math.max(p.y2, 0.0), height),
        t.x1, t.y1, t.x2, t.y2)
    }

    for (pi <- idxToUse) {
      val ious = targets.indices.map(clippedIou(pi, _))
      val order = targets.indices.sortBy(ti => (-ious(ti), ti)) // stable desc
      for (ti <- order if ious(ti) > IouThresholds(0)) {
        var j = 0
        while (j < nThr) {
          if (ious(ti) > IouThresholds(j) && !predsMatched(pi)(j) &&
            !targetsMatched(ti)(j)) {
            predsMatched(pi)(j) = true
            targetsMatched(ti)(j) = true
          }
          j += 1
        }
      }
    }
    (predsMatched, ignore)
  }

  /** Per-class curves for one class: (ap, precision, recall) per threshold. */
  private def perClassCurves(matched: IndexedSeq[Array[Boolean]],
      ignored: IndexedSeq[Boolean], scores: IndexedSeq[Double], nTargets: Int)
      : (Array[Double], Array[Double], Array[Double]) = {
    val nThr = IouThresholds.length
    val ap = new Array[Double](nThr)
    val prec = new Array[Double](nThr)
    val rec = new Array[Double](nThr)
    if (matched.isEmpty) return (ap, prec, rec)

    val order = scores.indices.sortBy(i => (-scores(i), i))
    val n = order.size
    // lowest index with score below the cutoff (scores sorted descending;
    // score == threshold counts as above, like searchsorted right=True)
    val cut = order.count(i => scores(i) >= ScoreThreshold)
    var j = 0
    while (j < nThr) {
      val rollPrec = new Array[Double](n)
      val rollRec = new Array[Double](n)
      var tp = 0.0; var fp = 0.0
      var i = 0
      while (i < n) {
        val oi = order(i)
        if (matched(oi)(j)) tp += 1
        else if (!ignored(oi)) fp += 1
        rollPrec(i) = tp / (tp + fp + PrecisionEps)
        rollRec(i) = if (nTargets > 0) tp / nTargets else 0.0
        i += 1
      }
      // reversed cummax: precision envelope is non-increasing
      i = n - 2
      while (i >= 0) { rollPrec(i) = math.max(rollPrec(i), rollPrec(i + 1)); i -= 1 }

      if (cut > 0) { prec(j) = rollPrec(cut - 1); rec(j) = rollRec(cut - 1) }
      // AP: sample the envelope at each recall threshold; 0 beyond the curve
      var s = 0.0
      for (rt <- RecallThresholds) {
        var i2 = 0
        while (i2 < n && rollRec(i2) < rt) i2 += 1
        s += (if (i2 < n) rollPrec(i2) else 0.0)
      }
      ap(j) = s / RecallThresholds.length
      j += 1
    }
    (ap, prec, rec)
  }

  final case class ClassMetrics(doc_id: Long, cls: Int, ap: Double,
      precision: Double, recall: Double, f1_score: Double)

  /** Per-(present)class metrics for one document: threshold-averaged AP/P/R/F1
    * (`get_metrics:200-213` — `*_per_class = *_per_present_classes.mean(1)`). */
  def evaluateDocPerClass(docId: Long, rows: Iterator[BoxRow], pageWidth: Double,
      pageHeight: Double): Seq[ClassMetrics] = {
    val all = rows.toVector
    val preds = all.filter(_.kind == "pred")
    val targets = all.filter(_.kind == "gt")
    // per-page matching, then concatenate across pages
    val pages = (preds.map(_.page) ++ targets.map(_.page)).distinct.sorted
    val mm = Vector.newBuilder[(BoxRow, Array[Boolean], Boolean)]
    val allTargets = Vector.newBuilder[BoxRow]
    for (p <- pages) {
      val pp = preds.filter(_.page == p)
      val tt = targets.filter(_.page == p)
      val (m, ig) = matchPage(pp, tt, pageWidth, pageHeight)
      pp.indices.foreach(i => mm += ((pp(i), m(i), ig(i))))
      allTargets ++= tt
    }
    val matchedRows = mm.result()
    val targetRows = allTargets.result()
    val uniqueClasses = targetRows.map(_.cls).distinct.sorted
    uniqueClasses.map { c =>
      val cp = matchedRows.filter(_._1.cls == c)
      val (ap, p, r) = perClassCurves(cp.map(_._2), cp.map(_._3),
        cp.map(_._1.score), targetRows.count(_.cls == c))
      val n = IouThresholds.length
      val f1 = (0 until n).map(j => 2 * p(j) * r(j) / (p(j) + r(j) + F1Eps))
      ClassMetrics(docId, c, ap.sum / n, p.sum / n, r.sum / n, f1.sum / n)
    }
  }

  /** Evaluate one document's boxes → aggregated metrics (mean over the
    * per-class × per-threshold cells, `get_metrics:186-199`). */
  def evaluateDoc(docId: Long, rows: Iterator[BoxRow], pageWidth: Double,
      pageHeight: Double): DocMetrics = {
    val perClass = evaluateDocPerClass(docId, rows, pageWidth, pageHeight)
    if (perClass.isEmpty)
      return DocMetrics(docId, -1.0, -1.0, -1.0, -1.0) // reference sentinel
    // classes carry equal threshold counts, so the cell mean = class mean
    val n = perClass.size
    DocMetrics(docId,
      perClass.map(_.ap).sum / n, perClass.map(_.precision).sum / n,
      perClass.map(_.recall).sum / n, perClass.map(_.f1_score).sum / n)
  }

  /**
   * Distributed evaluation: `boxes` carries one row per box with columns
   * (doc_id, kind in {pred, gt}, page, cls, x1, y1, x2, y2, score). One
   * doc_id shuffle; per-doc greedy matching in the task.
   */
  private def typedBoxes(boxes: DataFrame): Dataset[BoxRow] = {
    val sp = boxes.sparkSession
    import sp.implicits._
    boxes.select(
      col("doc_id").cast("long").as("doc_id"), col("kind"),
      col("page").cast("int").as("page"), col("cls").cast("int").as("cls"),
      col("x1").cast("double"), col("y1").cast("double"),
      col("x2").cast("double"), col("y2").cast("double"),
      col("score").cast("double").as("score"))
      .as[BoxRow]
  }

  def evaluate(boxes: DataFrame, pageWidth: Double, pageHeight: Double): DataFrame = {
    val sp = boxes.sparkSession
    import sp.implicits._
    typedBoxes(boxes)
      .groupByKey(_.doc_id)
      .mapGroups((id, rows) => evaluateDoc(id, rows, pageWidth, pageHeight))
      .toDF()
  }

  /** Per-(doc, class) rows — `ObjectDetectionPerClassMetricsCalculator`
    * (`metrics/evaluate.py:784-898`). Same single doc_id shuffle. */
  def evaluatePerClass(boxes: DataFrame, pageWidth: Double,
      pageHeight: Double): DataFrame = {
    val sp = boxes.sparkSession
    import sp.implicits._
    typedBoxes(boxes)
      .groupByKey(_.doc_id)
      .flatMapGroups((id, rows) => evaluateDocPerClass(id, rows, pageWidth, pageHeight))
      .toDF()
  }
}
