package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

import graft.model.{Coordinates, Element}

/**
 * Reading-order sorting — `sort_page_elements`
 * (`/root/reference/unstructured/partition/utils/sorting.py:99-188`) with the
 * recursive-XY-cut projection-profile algorithm (`partition/utils/xycut.py:17-213`)
 * ported directly (same integer histograms, same split rules, both axis orders).
 *
 * Spark shape: boxes for one page are small (tens to hundreds) — the cut runs as a
 * pure per-page function inside a per-doc group fold; the output is a reassigned
 * dense `seq`, after which every downstream operator (chunker, hierarchy) keeps
 * using `(doc_id, seq)` ordering. No extra shuffle beyond the doc_id exchange.
 */
object Sorting {

  val SortModeXyCut = "xy-cut"
  val SortModeBasic = "basic"
  val SortModeDont = "dont"

  type Bbox = (Int, Int, Int, Int) // (left, top, right, bottom)

  /** `coordinates_to_bbox` — `sorting.py:17-32`: top-left is `points[0]`,
    * bottom-right is `points[2]` (the canonical clockwise-from-top-left point
    * order), truncated to int — NOT a min/max envelope. */
  def coordinatesToBbox(c: Coordinates): Bbox = {
    val p0 = c.points.head
    val p2 = c.points(2)
    (p0.x.toInt, p0.y.toInt, p2.x.toInt, p2.y.toInt)
  }

  /** `shrink_bbox` — keeps top-left, scales width/height (`sorting.py:35-59`). */
  def shrinkBbox(b: Bbox, factor: Double): Bbox = {
    val (l, t, r, bo) = b
    val dw = (r - l) - (r - l) * factor
    val dh = (bo - t) - (bo - t) * factor
    (l, t, (r - dw).toInt, (bo - dh).toInt)
  }

  /** `coord_has_valid_points` — `sorting.py:62-79`: exactly 4 points, all
    * non-negative. (The reference's non-numeric/arity point checks are
    * unrepresentable in the typed model.) */
  def coordHasValidPoints(c: Coordinates): Boolean =
    c.points.length == 4 && c.points.forall(p => p.x >= 0 && p.y >= 0)

  /** `points_to_bbox` — `xycut.py:215-228`: flat `[x1,y1,…,x4,y4]` to a
    * min/max envelope with every edge clamped at 0. */
  def pointsToBbox(points: Seq[Int]): Bbox = {
    require(points.length == 8, s"expected 8 coords, got ${points.length}")
    val xs = Seq(points(0), points(2), points(4), points(6))
    val ys = Seq(points(1), points(3), points(5), points(7))
    (math.max(xs.min, 0), math.max(ys.min, 0), math.max(xs.max, 0), math.max(ys.max, 0))
  }

  /** `bbox2points` — `xycut.py:231-233`: clockwise from top-left. */
  def bboxToPoints(b: Bbox): Seq[Int] = {
    val (l, t, r, bo) = b
    Seq(l, t, r, t, r, bo, l, bo)
  }

  /** `projection_by_bboxes` — per-pixel histogram (`xycut.py:17-40`). */
  private[operators] def projection(boxes: Seq[Bbox], axis: Int): Array[Int] = {
    val length = boxes.map(b => if (axis == 0) b._3 else b._4).max
    if (length <= 0) return Array.empty
    val res = new Array[Int](length)
    boxes.foreach { b =>
      val start = if (axis == 0) b._1 else b._2
      val end = if (axis == 0) b._3 else b._4
      var j = math.max(start, 0)
      while (j < end && j < length) { res(j) += 1; j += 1 }
    }
    res
  }

  /** `split_projection_profile` — (start, end) index pairs of profile groups
    * separated by gaps > minGap (`xycut.py:47-93`). */
  private[operators] def splitProfile(arr: Array[Int], minValue: Int, minGap: Int): Seq[(Int, Int)] = {
    val idx = arr.indices.filter(arr(_) > minValue)
    if (idx.isEmpty) return Nil
    val starts = mutable.ArrayBuffer(idx.head)
    val ends = mutable.ArrayBuffer.empty[Int]
    idx.sliding(2).foreach {
      case Seq(a, b) if b - a > minGap => ends += a; starts += b
      case _ => ()
    }
    ends += idx.last
    starts.zip(ends).map { case (s, e) => (s, e + 1) }.toSeq
  }

  /** `recursive_xy_cut` — y first, then x (`xycut.py:96-152`). */
  def recursiveXyCut(boxes: IndexedSeq[Bbox], indices: IndexedSeq[Int],
      res: mutable.ArrayBuffer[Int]): Unit = {
    if (boxes.isEmpty) return
    val order = boxes.indices.sortBy(boxes(_)._2)
    val yBoxes = order.map(boxes(_))
    val yIdx = order.map(indices(_))
    splitProfile(projection(yBoxes, 1), 0, 1).foreach { case (r0, r1) =>
      val in = yBoxes.indices.filter(i => r0 <= yBoxes(i)._2 && yBoxes(i)._2 < r1)
      val chunkOrder = in.sortBy(i => yBoxes(i)._1)
      val xBoxes = chunkOrder.map(yBoxes(_))
      val xIdx = chunkOrder.map(yIdx(_))
      if (xBoxes.nonEmpty) {
        val segs = splitProfile(projection(xBoxes, 0), 0, 1)
        if (segs.size <= 1) res ++= xIdx
        else segs.foreach { case (c0, c1) =>
          val sub = xBoxes.indices.filter(i => c0 <= xBoxes(i)._1 && xBoxes(i)._1 < c1)
          recursiveXyCut(sub.map(xBoxes(_)), sub.map(xIdx(_)), res)
        }
      }
    }
  }

  /** `recursive_xy_cut_swapped` — x first, then y (`xycut.py:155-213`). */
  def recursiveXyCutSwapped(boxes: IndexedSeq[Bbox], indices: IndexedSeq[Int],
      res: mutable.ArrayBuffer[Int]): Unit = {
    if (boxes.isEmpty) return
    val order = boxes.indices.sortBy(boxes(_)._1)
    val xBoxes = order.map(boxes(_))
    val xIdx = order.map(indices(_))
    splitProfile(projection(xBoxes, 0), 0, 1).foreach { case (c0, c1) =>
      val in = xBoxes.indices.filter(i => c0 <= xBoxes(i)._1 && xBoxes(i)._1 < c1)
      val chunkOrder = in.sortBy(i => xBoxes(i)._2)
      val yBoxes = chunkOrder.map(xBoxes(_))
      val yIdx = chunkOrder.map(xIdx(_))
      if (yBoxes.nonEmpty) {
        val segs = splitProfile(projection(yBoxes, 1), 0, 1)
        if (segs.size <= 1) res ++= yIdx
        else segs.foreach { case (r0, r1) =>
          val sub = yBoxes.indices.filter(i => r0 <= yBoxes(i)._2 && yBoxes(i)._2 < r1)
          recursiveXyCutSwapped(sub.map(yBoxes(_)), sub.map(yIdx(_)), res)
        }
      }
    }
  }

  /** `sort_page_elements` — one page's elements in reading order. */
  def sortPageElements(els: Seq[Element], sortMode: String = SortModeXyCut,
      shrinkFactor: Double = 0.9, primaryDirection: String = "x"): Seq[Element] = {
    if (els.isEmpty) return els
    val coords = els.map(_.metadata.coordinates)
    // _coords_ok (sorting.py:138-153): any missing/empty coordinates skip the
    // sort in both modes; invalid points (negatives) only gate xy-cut.
    def coordsOk(strictPoints: Boolean): Boolean =
      coords.forall(c => c.exists(_.points.nonEmpty) &&
        (!strictPoints || coordHasValidPoints(c.get)))
    sortMode match {
      case SortModeXyCut =>
        if (!coordsOk(strictPoints = true)) return els
        val bboxes = coords.map(c => shrinkBbox(coordinatesToBbox(c.get), shrinkFactor))
          .toIndexedSeq
        val res = mutable.ArrayBuffer.empty[Int]
        if (primaryDirection == "x")
          recursiveXyCutSwapped(bboxes, bboxes.indices, res)
        else recursiveXyCut(bboxes, bboxes.indices, res)
        // degenerate geometry (e.g. zero-extent boxes after int truncation)
        // can collapse the projection profile and lose indices — a sort must
        // NEVER drop elements, so fall back to source order when it would
        if (res.length != els.length) els else res.map(els(_)).toSeq
      case SortModeBasic =>
        if (!coordsOk(strictPoints = false)) return els
        els.sortBy { e =>
          e.metadata.coordinates.flatMap(_.points.headOption) match {
            case Some(p) => (p.y, p.x)
            case None => (Double.MaxValue, Double.MaxValue)
          }
        }
      case _ => els
    }
  }

  /** Dataset operator: per-(doc, page) reading-order sort, then reassign a dense
    * doc-wide `seq` (pages in order, xy-cut order within page). */
  def assignReadingOrder(ds: Dataset[Element], sortMode: String = SortModeXyCut,
      shrinkFactor: Double = 0.9, primaryDirection: String = "x"): Dataset[Element] = {
    val sp = ds.sparkSession
    import sp.implicits._
    ds.groupByKey(_.doc_id)
      .flatMapSortedGroups(col("metadata.page_number"), col("seq")) { (_, it) =>
        val byPage = it.toSeq.groupBy(_.metadata.page_number.getOrElse(1)).toSeq.sortBy(_._1)
        var seq = 0L
        byPage.iterator.flatMap { case (_, els) =>
          sortPageElements(els, sortMode, shrinkFactor, primaryDirection).map { e =>
            seq += 1
            e.copy(seq = seq)
          }
        }
      }
  }
}
