package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Bounding-box geometry + layout-fusion operators
 * (`/root/reference/unstructured/utils.py:271-644`,
 * `partition/pdf_image/pdfminer_processing.py` via `partition/pdf.py:910-929`):
 *
 *  - `is_parent_box` containment with pixel tolerance;
 *  - `calculate_overlap_percentage` with parent / partial / total ratio methods;
 *  - pairwise overlap diagnostics as a per-page SELF-JOIN (the reference loops
 *    all pairs per page — here the join is an equi-join on `(doc, page)` with the
 *    overlap predicate, so per-page pair generation scales out);
 *  - `merge_inferred_with_extracted_layout` — the hi-res layout fusion: extracted
 *    text boxes are attached to the inferred region that contains them (tolerance
 *    `add`), a per-page spatial theta-join; per-page sides are small → broadcast.
 *
 * Column helpers operate on flat (x1, y1, x2, y2) columns so the predicates stay
 * inside whole-stage codegen.
 */
object LayoutOps {

  /** `is_parent_box` — child nested within parent expanded by `add` px (`utils.py:271-296`). */
  def isParentBox(px1: Column, py1: Column, px2: Column, py2: Column,
      cx1: Column, cy1: Column, cx2: Column, cy2: Column, add: Double = 0.0): Column =
    cx1 >= px1 - add && cy1 >= py1 - add && cx2 <= px2 + add && cy2 <= py2 + add

  def intersectionArea(ax1: Column, ay1: Column, ax2: Column, ay2: Column,
      bx1: Column, by1: Column, bx2: Column, by2: Column): Column =
    greatest(least(ax2, bx2) - greatest(ax1, bx1), lit(0.0)) *
      greatest(least(ay2, by2) - greatest(ay1, by1), lit(0.0))

  /**
   * `calculate_overlap_percentage` (`utils.py:299-340`): percentage of overlap
   * relative to the larger box ("parent"), the smaller box ("partial"), or the
   * disjunctive union ("total").
   */
  def overlapPercentage(ax1: Column, ay1: Column, ax2: Column, ay2: Column,
      bx1: Column, by1: Column, bx2: Column, by2: Column,
      method: String = "total"): Column = {
    val areaA = (ax2 - ax1) * (ay2 - ay1)
    val areaB = (bx2 - bx1) * (by2 - by1)
    val inter = intersectionArea(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)
    val denom = method match {
      case "parent" => greatest(areaA, areaB)
      case "partial" => least(areaA, areaB)
      case _ => areaA + areaB - inter
    }
    when(denom > 0, round(inter / denom * 100.0, 2)).otherwise(lit(0.0))
  }

  /**
   * `catch_overlapping_and_nested_bboxes` (`utils.py:461-644` simplified to the
   * geometric facts): all overlapping pairs per (doc, page) with their case
   * classification. Input needs columns: doc_id, page_number, seq, element_type,
   * x1, y1, x2, y2.
   */
  def overlappingPairs(boxes: DataFrame, nestedTolerancePx: Double = 5.0): DataFrame = {
    val a = boxes.alias("a")
    val b = boxes.alias("b")
    def c(side: String, n: String) = col(s"$side.$n")
    val inter = intersectionArea(
      c("a", "x1"), c("a", "y1"), c("a", "x2"), c("a", "y2"),
      c("b", "x1"), c("b", "y1"), c("b", "x2"), c("b", "y2"))
    // the reference gates pairs on STRICT corner comparisons (utils.py:491-492),
    // which also admit degenerate inverted/zero-extent boxes whose area
    // intersection is 0 — `inter > 0` would drop those pairs
    val refOverlap =
      c("a", "x1") < c("b", "x2") && c("a", "x2") > c("b", "x1") &&
        c("a", "y1") < c("b", "y2") && c("a", "y2") > c("b", "y1")
    val aInB = isParentBox(c("b", "x1"), c("b", "y1"), c("b", "x2"), c("b", "y2"),
      c("a", "x1"), c("a", "y1"), c("a", "x2"), c("a", "y2"), nestedTolerancePx)
    val bInA = isParentBox(c("a", "x1"), c("a", "y1"), c("a", "x2"), c("a", "y2"),
      c("b", "x1"), c("b", "y1"), c("b", "x2"), c("b", "y2"), nestedTolerancePx)
    a.join(b,
        c("a", "doc_id") === c("b", "doc_id") &&
          c("a", "page_number") === c("b", "page_number") &&
          c("a", "seq") < c("b", "seq"))
      .filter(refOverlap)
      .select(
        c("a", "doc_id").as("doc_id"),
        c("a", "page_number").as("page_number"),
        c("a", "seq").as("seq_a"), c("b", "seq").as("seq_b"),
        c("a", "element_type").as("type_a"), c("b", "element_type").as("type_b"),
        when(aInB && bInA, "identical")
          .when(aInB, "nested Aa_in_Bb")
          .when(bInA, "nested Bb_in_Aa")
          .otherwise("partial overlap").as("overlap_case"),
        overlapPercentage(
          c("a", "x1"), c("a", "y1"), c("a", "x2"), c("a", "y2"),
          c("b", "x1"), c("b", "y1"), c("b", "x2"), c("b", "y2"), "partial")
          .as("overlap_pct"))
  }

  /**
   * `calculate_largest_ngram_percentage` (`utils.py:213-270`): over the two
   * texts' word lists, find the largest n (starting from shorter-length - 1,
   * descending) whose n-gram sets intersect; the percentage is distinct shared
   * n-grams over the SHORTER text's n-gram list (duplicates counted in the
   * denominator). Returns (pct — 0.0 when nothing shared, n — null when
   * nothing shared). Pure HOF columns; runs on overlap-pair rows only, so the
   * k-pass lambda re-evaluation stays off the hot path.
   */
  def largestNgramPct(textA: Column, textB: Column): (Column, Column) = {
    val wa = split(textA, " ")
    val wb = split(textB, " ")
    val firstW = when(size(wa) < size(wb), wa).otherwise(wb) // shorter (ties: b)
    val secondW = when(size(wa) < size(wb), wb).otherwise(wa)
    val n0 = size(firstW) - 1
    def ng(words: Column, n: Column): Column =
      when(size(words) - n >= 0,
        transform(sequence(lit(1), size(words) - n + 1), i => slice(words, i, n)))
        .otherwise(array().cast("array<array<string>>"))
    val candidates = when(n0 >= 1,
      filter(sequence(n0, lit(1), lit(-1)),
        n => arrays_overlap(ng(firstW, n), ng(secondW, n))))
      .otherwise(array().cast("array<int>"))
    val bestN = try_element_at(candidates, lit(1)) // empty -> null, not an error
    val pct = when(bestN.isNotNull,
      round(size(array_intersect(ng(firstW, bestN), ng(secondW, bestN)))
        .cast("double") / size(ng(firstW, bestN)) * 100.0, 2))
      .otherwise(lit(0.0))
    (pct, bestN)
  }

  /**
   * `identify_overlapping_case` (`utils.py:348-448`) on top of the pair join:
   * nested/identical pairs keep their geometric label; partial overlaps refine
   * through the reference's five text cases — below the 10% small-overlap
   * threshold, empty content on either side, substring-duplicate text, no
   * shared vocabulary, or the largest shared n-gram with its percentage (the
   * case string reproduces the reference's `"from" + ref_type + "(n-gram)"`
   * formatting, ref_type = the type of the shorter text). Input needs the
   * overlappingPairs columns plus `text`.
   *
   * The n-gram refinement is staged through intermediate projections: the word
   * arrays, best-n search, and best-n n-gram arrays are each materialized ONCE
   * as columns and referenced downstream (multi-referenced non-cheap producers
   * are kept by CollapseProject), and the whole search is gated behind the
   * text-case predicate — the naive single-select formulation re-expanded the
   * O(words²) n-gram subtree four times per row and was the bench's slowest
   * query by 4×.
   */
  def overlappingPairsWithText(boxes: DataFrame, nestedTolerancePx: Double = 5.0,
      smOverlapThreshold: Double = 10.0): DataFrame = {
    val a = boxes.alias("a")
    val b = boxes.alias("b")
    def c(side: String, n: String) = col(s"$side.$n")
    val inter = intersectionArea(
      c("a", "x1"), c("a", "y1"), c("a", "x2"), c("a", "y2"),
      c("b", "x1"), c("b", "y1"), c("b", "x2"), c("b", "y2"))
    // the reference gates pairs on STRICT corner comparisons (utils.py:491-492),
    // which also admit degenerate inverted/zero-extent boxes whose area
    // intersection is 0 — `inter > 0` would drop those pairs
    val refOverlap =
      c("a", "x1") < c("b", "x2") && c("a", "x2") > c("b", "x1") &&
        c("a", "y1") < c("b", "y2") && c("a", "y2") > c("b", "y1")
    val aInB = isParentBox(c("b", "x1"), c("b", "y1"), c("b", "x2"), c("b", "y2"),
      c("a", "x1"), c("a", "y1"), c("a", "x2"), c("a", "y2"), nestedTolerancePx)
    val bInA = isParentBox(c("a", "x1"), c("a", "y1"), c("a", "x2"), c("a", "y2"),
      c("b", "x1"), c("b", "y1"), c("b", "x2"), c("b", "y2"), nestedTolerancePx)
    val pctPartial = overlapPercentage(
      c("a", "x1"), c("a", "y1"), c("a", "x2"), c("a", "y2"),
      c("b", "x1"), c("b", "y1"), c("b", "x2"), c("b", "y2"), "partial")
    val ta = coalesce(c("a", "text"), lit(""))
    val tb = coalesce(c("b", "text"), lit(""))

    val joined = a.join(b,
        c("a", "doc_id") === c("b", "doc_id") &&
          c("a", "page_number") === c("b", "page_number") &&
          c("a", "seq") < c("b", "seq"))
      .filter(refOverlap)
      .select(
        c("a", "doc_id").as("doc_id"),
        c("a", "page_number").as("page_number"),
        c("a", "seq").as("seq_a"), c("b", "seq").as("seq_b"),
        c("a", "element_type").as("type_a"), c("b", "element_type").as("type_b"),
        aInB.as("a_in_b"), bInA.as("b_in_a"),
        pctPartial.as("overlap_pct"),
        ta.as("ta"), tb.as("tb"))

    def ng(words: Column, n: Column): Column =
      when(size(words) - n >= 0,
        transform(sequence(lit(1), size(words) - n + 1), i => slice(words, i, n)))
        .otherwise(array().cast("array<array<string>>"))

    val textCasesApply = !(col("a_in_b") || col("b_in_a")) &&
      col("overlap_pct") >= smOverlapThreshold &&
      col("ta") =!= "" && col("tb") =!= "" &&
      !col("tb").contains(col("ta")) && !col("ta").contains(col("tb"))
    val n0 = size(col("first_w")) - 1

    val staged = joined
      .withColumn("text_case", textCasesApply)
      .withColumn("wa", split(col("ta"), " "))
      .withColumn("wb", split(col("tb"), " "))
      .withColumn("first_w",
        when(size(col("wa")) < size(col("wb")), col("wa")).otherwise(col("wb")))
      .withColumn("second_w",
        when(size(col("wa")) < size(col("wb")), col("wb")).otherwise(col("wa")))
      .withColumn("best_n", // utils.py:240-255 — largest n whose n-gram sets intersect
        when(col("text_case") && n0 >= 1,
          try_element_at(
            filter(sequence(n0, lit(1), lit(-1)),
              n => arrays_overlap(ng(col("first_w"), n), ng(col("second_w"), n))),
            lit(1))))
      .withColumn("ng_first", when(col("best_n").isNotNull, ng(col("first_w"), col("best_n"))))
      .withColumn("ng_second", when(col("best_n").isNotNull, ng(col("second_w"), col("best_n"))))
      .withColumn("ng_pct",
        when(col("best_n").isNotNull,
          round(size(array_intersect(col("ng_first"), col("ng_second"))).cast("double") /
            size(col("ng_first")) * 100.0, 2))
          .otherwise(lit(0.0)))

    val refType = when(size(col("wa")) < size(col("wb")), col("type_a"))
      .otherwise(col("type_b"))
    staged.select(
      col("doc_id"), col("page_number"), col("seq_a"), col("seq_b"),
      col("type_a"), col("type_b"),
      when(col("a_in_b") && col("b_in_a"), lit("identical"))
        .when(col("a_in_b"), lit("nested Aa_in_Bb"))
        .when(col("b_in_a"), lit("nested Bb_in_Aa"))
        .when(col("overlap_pct") < smOverlapThreshold, lit("Small partial overlap"))
        .when(col("ta") === "", concat(lit("partial overlap with empty content in "),
          col("type_a")))
        .when(col("tb") === "", concat(lit("partial overlap with empty content in "),
          col("type_b")))
        .when(col("tb").contains(col("ta")) || col("ta").contains(col("tb")),
          lit("partial overlap with duplicate text"))
        .when(col("ng_pct") === 0.0, lit("partial overlap without sharing text"))
        .otherwise(concat(lit("partial overlap sharing "),
          col("ng_pct").cast("string"), lit("% of the text from"), refType,
          lit("("), col("best_n").cast("string"), lit("-gram)")))
        .as("overlap_case"),
      col("overlap_pct"),
      when(col("text_case"), col("ng_pct")).as("largest_ngram_pct"))
  }

  /**
   * `merge_inferred_with_extracted_layout` — attach each extracted text box to
   * the inferred layout region containing it (per-page theta-join; the inferred
   * side is small per page → broadcast). Unmatched extracted boxes survive with a
   * null region (the OCR-supplement anti-join is this same join's null side).
   */
  def mergeInferredWithExtracted(inferred: DataFrame, extracted: DataFrame,
      tolerancePx: Double = 5.0): DataFrame = {
    val i = inferred.alias("i")
    val e = extracted.alias("e")
    def c(side: String, n: String) = col(s"$side.$n")
    e.join(broadcast(i),
        c("e", "doc_id") === c("i", "doc_id") &&
          c("e", "page_number") === c("i", "page_number") &&
          isParentBox(c("i", "x1"), c("i", "y1"), c("i", "x2"), c("i", "y2"),
            c("e", "x1"), c("e", "y1"), c("e", "x2"), c("e", "y2"), tolerancePx),
        "left")
      .select(
        c("e", "doc_id").as("doc_id"),
        c("e", "page_number").as("page_number"),
        c("e", "seq").as("seq"),
        c("e", "text").as("text"),
        c("i", "element_type").as("region_type"),
        c("i", "seq").as("region_seq"))
  }

  /**
   * OCR supplement (`pdf_image/ocr.py:491`, called `partition/pdf.py:916-929`):
   * inferred layout regions that contain NO extracted text box get their text
   * from an OCR kernel; regions with extracted text keep it (boxes concatenated
   * in reading order). The "regions lacking text" set is the null side of the
   * same containment left-join hi-res fusion uses — an anti-join, never a loop.
   * The OCR kernel is pluggable (the sandbox ships no OCR model; callers pass a
   * deterministic stub — cf. MultimodalOps); at scale the kernel is the only
   * per-region expensive step and runs map-side after the per-page broadcast
   * join, so the plan is scan → broadcast-join → groupBy(region) → kernel.
   */
  def supplementWithOcr(inferred: DataFrame, extracted: DataFrame,
      ocrKernel: Seq[Column] => Column, tolerancePx: Double = 5.0): DataFrame = {
    val i = inferred.alias("i")
    val e = extracted.alias("e")
    def c(side: String, n: String) = col(s"$side.$n")
    i.join(broadcast(e),
        c("i", "doc_id") === c("e", "doc_id") &&
          c("i", "page_number") === c("e", "page_number") &&
          isParentBox(c("i", "x1"), c("i", "y1"), c("i", "x2"), c("i", "y2"),
            c("e", "x1"), c("e", "y1"), c("e", "x2"), c("e", "y2"), tolerancePx),
        "left")
      .groupBy(
        c("i", "doc_id").as("doc_id"),
        c("i", "page_number").as("page_number"),
        c("i", "seq").as("seq"),
        c("i", "element_type").as("element_type"),
        c("i", "x1").as("x1"), c("i", "y1").as("y1"),
        c("i", "x2").as("x2"), c("i", "y2").as("y2"))
      .agg(sort_array(collect_list(when(c("e", "seq").isNotNull,
        struct(c("e", "seq").as("s"), c("e", "text").as("t"))))).as("ordered"))
      .select(col("doc_id"), col("page_number"), col("seq"), col("element_type"),
        when(size(col("ordered")) > 0,
          concat_ws(" ", transform(col("ordered"), o => o.getField("t"))))
          .otherwise(ocrKernel(Seq(col("element_type"),
            col("x1"), col("y1"), col("x2"), col("y2"))))
          .as("text"),
        (size(col("ordered")) === 0).as("from_ocr"))
  }
}
