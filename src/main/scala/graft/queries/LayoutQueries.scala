package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Embedder, TextAnalysis}
import graft.operators.LayoutOps
import graft.queries.{OracleSql => O}

/**
 * Layout/geometry, sorting, weighted-edit-distance and embedding-encoder queries.
 * Box corpora are constructed deterministically from the `events` table; the
 * oracle mirrors the construction and recomputes the geometry independently.
 */
object LayoutQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    graft.Tables.readFanout(s, dir, "events")

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.readFanout(s, dir, "documents")

  /** Deterministic box corpus: ~1/3 of events become boxes on a 500x500 page. */
  private def boxes(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(col("event_id") % 3 === 0)
      .select(
        (col("user_id") % 20).as("doc_id"),
        lit(1).as("page_number"),
        col("event_id").as("seq"),
        col("event_type").as("element_type"),
        (col("event_id") * 7 % 500).cast("double").as("x1"),
        (col("event_id") * 13 % 500).cast("double").as("y1"),
        (col("event_id") * 7 % 500 + col("event_id") % 90 + 10).cast("double").as("x2"),
        (col("event_id") * 13 % 500 + col("event_id") % 60 + 10).cast("double").as("y2"))

  private val boxesSql =
    """(SELECT user_id % 20 AS doc_id, 1 AS page_number, event_id AS seq,
      |  event_type AS element_type,
      |  CAST(event_id * 7 % 500 AS DOUBLE) AS x1,
      |  CAST(event_id * 13 % 500 AS DOUBLE) AS y1,
      |  CAST(event_id * 7 % 500 + event_id % 90 + 10 AS DOUBLE) AS x2,
      |  CAST(event_id * 13 % 500 + event_id % 60 + 10 AS DOUBLE) AS y2
      |FROM events WHERE event_id % 3 = 0)""".stripMargin

  /** Quadrant "inferred layout" regions per doc (from the region table: 5 docs). */
  private def inferredRegions(s: SparkSession, dir: String): DataFrame =
    graft.Tables.read(s, dir, "region")
      .select(col("r_regionkey").as("doc_id"),
        explode(array(
          struct(lit(1L).as("seq"), lit("Q1").as("element_type"),
            lit(0.0).as("x1"), lit(0.0).as("y1"), lit(250.0).as("x2"), lit(250.0).as("y2")),
          struct(lit(2L).as("seq"), lit("Q2").as("element_type"),
            lit(250.0).as("x1"), lit(0.0).as("y1"), lit(500.0).as("x2"), lit(250.0).as("y2")),
          struct(lit(3L).as("seq"), lit("Q3").as("element_type"),
            lit(0.0).as("x1"), lit(250.0).as("y1"), lit(250.0).as("x2"), lit(500.0).as("y2")),
          struct(lit(4L).as("seq"), lit("Q4").as("element_type"),
            lit(250.0).as("x1"), lit(250.0).as("y1"), lit(500.0).as("x2"), lit(500.0).as("y2"))))
          .as("q"))
      .select(col("doc_id"), lit(1).as("page_number"), col("q.*"))

  private val inferredSql =
    """(SELECT r_regionkey AS doc_id, 1 AS page_number, q.seq, q.element_type,
      |  q.x1, q.y1, q.x2, q.y2
      |FROM region, unnest([
      |  {'seq': 1, 'element_type': 'Q1', 'x1': 0.0, 'y1': 0.0, 'x2': 250.0, 'y2': 250.0},
      |  {'seq': 2, 'element_type': 'Q2', 'x1': 250.0, 'y1': 0.0, 'x2': 500.0, 'y2': 250.0},
      |  {'seq': 3, 'element_type': 'Q3', 'x1': 0.0, 'y1': 250.0, 'x2': 250.0, 'y2': 500.0},
      |  {'seq': 4, 'element_type': 'Q4', 'x1': 250.0, 'y1': 250.0, 'x2': 500.0, 'y2': 500.0}
      |]) AS t(q))""".stripMargin

  /** Extracted text boxes for the layout-fusion join: small boxes from events. */
  private def extractedBoxes(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(col("event_id") % 5 === 0)
      .select(
        (col("user_id") % 5).as("doc_id"),
        lit(1).as("page_number"),
        col("event_id").as("seq"),
        col("event_type").as("text"),
        (col("event_id") * 11 % 490).cast("double").as("x1"),
        (col("event_id") * 17 % 490).cast("double").as("y1"),
        (col("event_id") * 11 % 490 + 8).cast("double").as("x2"),
        (col("event_id") * 17 % 490 + 8).cast("double").as("y2"))

  private val extractedSql =
    """(SELECT user_id % 5 AS doc_id, 1 AS page_number, event_id AS seq,
      |  event_type AS text,
      |  CAST(event_id * 11 % 490 AS DOUBLE) AS x1,
      |  CAST(event_id * 17 % 490 AS DOUBLE) AS y1,
      |  CAST(event_id * 11 % 490 + 8 AS DOUBLE) AS x2,
      |  CAST(event_id * 17 % 490 + 8 AS DOUBLE) AS y2
      |FROM events WHERE event_id % 5 = 0)""".stripMargin

  /** OD-metrics corpus: per (doc, class c∈0..2), (doc_id%3)+2 disjoint ground
    * truths on a 1000x1000 page; each but the last gets a prediction whose
    * horizontal shift pins its IoU to one of {1.0, 95/105, 80/120, 60/140};
    * plus a high-confidence near-miss on target 0 (IoU 46/154 < 0.5) and a
    * no-overlap false positive. Greedy matching therefore reduces to the
    * closed form `IoU > threshold` the oracle recomputes. */
  private def odBoxes(s: SparkSession, dir: String) = {
    import s.implicits._
    docs(s, dir).select(col("doc_id").cast("long")).as[Long].flatMap { id =>
      val shifts = Array(0.0, 5.0, 20.0, 40.0)
      (0 until 3).flatMap { c =>
        val tC = (id % 3).toInt + 2
        val y = c * 250.0
        val gts = (0 until tC).map(j => graft.operators.ObjectDetection.BoxRow(
          id, "gt", 1, c, j * 200.0, y, j * 200.0 + 100, y + 100, 0.0))
        val reals = (0 until tC - 1).map { j =>
          val sft = shifts(((id + j + c) % 4).toInt)
          graft.operators.ObjectDetection.BoxRow(
            id, "pred", 1, c, j * 200.0 + sft, y, j * 200.0 + 100 + sft, y + 100,
            0.9 - j * 0.1)
        }
        val nearMiss = graft.operators.ObjectDetection.BoxRow(
          id, "pred", 1, c, 54.0, y, 154.0, y + 100, 0.95)
        val falsePos = graft.operators.ObjectDetection.BoxRow(
          id, "pred", 1, c, 850.0, y, 950.0, y + 100, 0.3)
        gts ++ reals ++ Seq(nearMiss, falsePos)
      }
    }.toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // object-detection mAP@[.5:.95] + P/R/F1 per document over the synthetic
    // box corpus (metrics/evaluate.py:665-831, object_detection.py)
    "q_od_map" -> ((s, dir) =>
      graft.operators.ObjectDetection.evaluate(odBoxes(s, dir), 1000.0, 1000.0)
        .select(col("doc_id"), round(col("m_ap"), 4).as("m_ap"),
          round(col("precision"), 4).as("precision"),
          round(col("recall"), 4).as("recall"),
          round(col("f1_score"), 4).as("f1_score"))
        .orderBy("doc_id")),

    // coordinate-system conversion (documents/coordinates.py): the 500x500
    // PixelSpace box corpus re-expressed in a 1000x800 PointSpace (y-axis
    // flip through the relative system) and in relative coordinates — pure
    // codegen'd projection, no shuffle beyond the determinism sort
    "q_convert_coordinates" -> ((s, dir) => {
      import graft.functions.{Coordinates => C}
      val from = C.pixelSpace(500, 500)
      val toPoint = C.pointSpace(1000, 800)
      boxes(s, dir).select(col("doc_id"), col("seq"),
        C.convertX(col("x1"), from, toPoint).as("px1"),
        C.convertY(col("y1"), from, toPoint).as("py1"),
        C.convertX(col("x2"), from, toPoint).as("px2"),
        C.convertY(col("y2"), from, toPoint).as("py2"),
        C.convertX(col("x1"), from, C.relative).as("rx1"),
        C.convertY(col("y1"), from, C.relative).as("ry1"))
        .orderBy("doc_id", "seq")
    }),

    // per-class variant (ObjectDetectionPerClassMetricsCalculator): one row
    // per (doc, present class) with threshold-averaged AP/P/R/F1
    "q_od_map_per_class" -> ((s, dir) =>
      graft.operators.ObjectDetection.evaluatePerClass(odBoxes(s, dir), 1000.0, 1000.0)
        .select(col("doc_id"), col("cls"), round(col("ap"), 4).as("ap"),
          round(col("precision"), 4).as("precision"),
          round(col("recall"), 4).as("recall"),
          round(col("f1_score"), 4).as("f1_score"))
        .orderBy("doc_id", "cls")),

    // pairwise bbox overlap diagnostics per (doc, page) — self-join, not O(n²) loop
    "q_bbox_overlap_pairs" -> ((s, dir) =>
      LayoutOps.overlappingPairs(boxes(s, dir))
        .orderBy("doc_id", "seq_a", "seq_b")),

    // identify_overlapping_case text refinement (utils.py:348-448): one page
    // per engineered pair hitting each of the five cases — empty content,
    // substring-duplicate, sub-threshold small overlap, disjoint vocabulary,
    // and a shared 2-gram with the reference's from<type>(n-gram) wording
    "q_overlap_cases" -> ((s, dir) => {
      def box(seq: Int, page: Int, tpe: String, x1: Double, text: String) =
        struct(lit(seq.toLong).as("seq"), lit(page).as("page_number"),
          lit(tpe).as("element_type"), lit(x1).as("x1"), lit(0.0).as("y1"),
          lit(x1 + 100.0).as("x2"), lit(100.0).as("y2"), lit(text).as("text"))
      val boxesDf = docs(s, dir).select(
        col("doc_id").cast("long").as("doc_id"),
        explode(array(
          box(1, 1, "Title", 0, ""),
          box(2, 1, "NarrativeText", 50, "filler words here"),
          box(3, 2, "ListItem", 0, "alpha beta"),
          box(4, 2, "Text", 50, "x alpha beta y"),
          box(5, 3, "Image", 0, "aa"),
          box(6, 3, "Table", 95, "bb"),
          box(7, 4, "Header", 0, "q1x q2x q3x"),
          box(8, 4, "Footer", 50, "q4x q5x q6x q7x"),
          box(9, 5, "Caption", 0, "one two three four"),
          box(10, 5, "UncategorizedText", 50, "two three five six seven"))).as("b"))
        .select(col("doc_id"), col("b.*"))
      LayoutOps.overlappingPairsWithText(boxesDf)
        .orderBy("doc_id", "page_number")
    }),

    // hi-res layout fusion: extracted text boxes -> containing inferred region
    "q_merge_layout" -> ((s, dir) =>
      LayoutOps.mergeInferredWithExtracted(
        inferredRegions(s, dir), extractedBoxes(s, dir), tolerancePx = 0.0)
        .orderBy("doc_id", "seq")),

    // normalize_layout_element (partition/common/common.py:34-154) over the box
    // corpus: seq%8 routes every branch — plain Title, Headline/Subheadline
    // depth assignment, Figure->Image label mapping, enumerated-List fan-out,
    // checkable, unknown-label fallback, Text->NarrativeText. Pure flatMap over
    // regions: no shuffle beyond the final presentation sort.
    "q_normalize_layout" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.LayoutNormalize
      boxes(s, dir)
        .select(col("doc_id"), col("seq"), (col("seq") % 8).cast("int").as("variant"),
          col("x1"), col("y1"), col("x2"), col("y2"))
        .as[(Long, Long, Int, Double, Double, Double, Double)]
        .flatMap { case (doc, seq, v, x1, y1, x2, y2) =>
          val label = v match {
            case 0 => "Title"
            case 1 => "Headline"
            case 2 => "Subheadline"
            case 3 => "Figure"
            case 4 => "List"
            case 5 => "CheckBoxChecked"
            case 6 => "Aliens"
            case _ => "Text"
          }
          val text =
            if (label == "List") "1. alpha item 2. beta item 3. gamma item"
            else s"region $seq"
          LayoutNormalize.normalizeLayoutElement(
            LayoutNormalize.LayoutRegion(Some(label), text,
              LayoutNormalize.bboxPoints(x1, y1, x2, y2)),
            Some("PixelSpace")).zipWithIndex.map { case (e, i) =>
            (doc, seq, i + 1, e.`type`, e.metadata.category_depth, e.text,
              e.metadata.coordinates.map(_.points.head.x))
          }
        }
        .toDF("doc_id", "seq", "sub", "element_type", "category_depth", "text",
          "coord_x1")
        .orderBy("doc_id", "seq", "sub")
    }),

    // sort_page_elements basic mode: (top-left y, x) within page
    "q_sort_basic" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id", "page_number").orderBy("y1", "x1", "seq")
      boxes(s, dir)
        .select(col("doc_id"), col("page_number"), col("seq").as("orig_seq"),
          col("y1"), col("x1"),
          row_number().over(w).cast("long").as("reading_order"))
        .select(col("doc_id"), col("orig_seq"), col("reading_order"))
        .orderBy("doc_id", "orig_seq")
    }),

    // recursive XY-cut reading order (partition/utils/xycut.py:96-213) through the
    // real per-page cut: a constructed 2-column, 3-row grid per page (clear
    // projection gaps both ways, 2 pages per doc) whose cut order has a closed
    // form — column-major within page, pages in order — that the oracle predicts
    "q_sort_xycut" -> ((s, dir) => {
      import s.implicits._
      val els = docs(s, dir).select(col("doc_id")).as[Long].flatMap { d =>
        (0 until 12).map { i =>
          val j = i % 6
          val x1 = (j % 2) * 300.0
          val y1 = (j / 2) * 50.0
          graft.model.Element(
            element_id = s"$d-$i", `type` = "NarrativeText", text = i.toString,
            doc_id = d.toString, seq = i.toLong,
            metadata = graft.model.ElementMetadata(
              page_number = Some(i / 6 + 1),
              coordinates = Some(graft.model.Coordinates(points = Seq(
                graft.model.Point(x1, y1), graft.model.Point(x1, y1 + 20),
                graft.model.Point(x1 + 100, y1 + 20), graft.model.Point(x1 + 100, y1))))))
        }
      }
      graft.operators.Sorting.assignReadingOrder(els)
        .select(col("doc_id").cast("long").as("doc_id"),
          col("text").cast("long").as("orig_seq"),
          col("seq").as("reading_order"))
        .orderBy("doc_id", "orig_seq")
    }),

    // positional header/footer classification (partition/text.py:111-127,174-211):
    // mean box y under 7% of the layout height -> Header, over 93% -> Footer,
    // otherwise the text cascade classifies a constructed text
    "q_classify_positional" -> ((s, dir) =>
      boxes(s, dir).select(
        col("doc_id"), col("seq"),
        graft.functions.Predicates.classifyTextPositional(
          concat(lit("Note "), col("element_type")),
          (col("y1") + col("y2")) / lit(2.0), lit(520.0)).as("element_type"))
        .orderBy("doc_id", "seq")),

    // weighted edit distance (ins=2,del=1,sub=1): closed-form cases (pure
    // insertion/deletion/substitution over the full document text — '§' never
    // occurs in the corpus, so each replaced char is exactly one substitution)
    // plus mixed-edit word pairs whose weighted distances were precomputed with
    // an independent DP, selected per row by doc_id so the compare covers them all
    "q_weighted_levenshtein" -> ((s, dir) => {
      def wlev(a: Column, b: Column): Column =
        org.apache.spark.sql.graft.bridge.column(
          graft.functions.expr.WeightedLevenshtein(
            org.apache.spark.sql.graft.bridge.expression(a),
            org.apache.spark.sql.graft.bridge.expression(b)))
      val pairs = Seq(("kitten", "sitting"), ("sunday", "saturday"), ("flaw", "lawn"),
        ("ab", "ba"), ("intention", "execution"), ("distributed", "structured"))
      val pairA = element_at(array(pairs.map(p => lit(p._1)): _*),
        (col("doc_id") % 6).cast("int") + 1)
      val pairB = element_at(array(pairs.map(p => lit(p._2)): _*),
        (col("doc_id") % 6).cast("int") + 1)
      // the DP is O(n·m) per column — cap the input at 500 chars (mirrored in the
      // oracle) so four DP columns stay a sub-second scan, not the bench tail
      val t = substring(col("text"), 1, 500)
      docs(s, dir).select(
        col("doc_id"),
        wlev(regexp_replace(t, "e", ""), t).as("ins_dist"),
        wlev(concat(t, lit("xyz")), t).as("del_dist"),
        wlev(t, t).as("self_dist"),
        wlev(regexp_replace(t, "e", "§"), t).as("sub_dist"),
        wlev(pairA, pairB).as("mixed_dist"))
        .orderBy("doc_id")
    }),

    // calculate_edit_distance / calculate_accuracy (text_extraction.py:69-120):
    // the FULL pipeline — prepare_str whitespace collapse, standardize_quotes
    // (smart-quoted output vs ASCII-quoted source must cost nothing), weighted
    // DP, then the division-safe bounded score. The output corrupts via
    // substitution only ('e' -> '§', a char absent from the corpus) so the
    // closed-form distance is exactly the 'e' count.
    "q_edit_distance_accuracy" -> ((s, dir) => {
      def wlev(a: Column, b: Column): Column =
        org.apache.spark.sql.graft.bridge.column(
          graft.functions.expr.WeightedLevenshtein(
            org.apache.spark.sql.graft.bridge.expression(a),
            org.apache.spark.sql.graft.bridge.expression(b)))
      val prep: Column => Column = x =>
        graft.functions.Cleaners.standardizeQuotes(
          array_join(filter(split(x, "\\s+"), w => w =!= ""), " "))
      val t = substring(col("text"), 1, 500)
      val source = prep(concat(lit("\""), t, lit("\"")))
      val output = prep(concat(lit("“"),
        regexp_replace(regexp_replace(t, "e", "§"), " ", "   "),
        lit("”")))
      val dist = wlev(output, source).cast("long")
      val score = round(lit(1.0) - least(greatest(
        dist.cast("double") / greatest(length(source), lit(1)).cast("double"),
        lit(0.0)), lit(1.0)), 4)
      docs(s, dir).select(col("doc_id"), dist.as("edit_dist"),
        score.as("accuracy")).orderBy("doc_id")
    }),

    // table cell extraction for evaluation (metrics/table/table_extraction.py):
    // a spanned thead/tbody table per doc runs html -> Deckerd (with the
    // spanned-cell right-shift) -> (row, col, content) rows; two cells carry
    // doc fields so the compare is per-doc, the layout is the reference
    // round-trip fixture's
    "q_table_cells_extract" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
        element_at(TextAnalysis.words(col("text")), 1).as("w1"), col("source"))
        .as[(Long, String, String)]
        .flatMap { case (id, w1, source) =>
          val html = "<table><thead><tr>" +
            s"""<th rowspan="2">$w1</th><th colspan="2">$source</th><th>h1col4</th>""" +
            "</tr><tr><th>h2col2</th><th colspan=\"2\">h2col34</th></tr></thead>" +
            "<tbody><tr><td>r3col1</td><td>r3col2</td>" +
            "<td colspan=\"2\" rowspan=\"2\">r34col34</td></tr>" +
            "<tr><td colspan=\"2\">r4col12</td></tr></tbody></table>"
          graft.operators.TableExtraction
            .extractFromPrediction(Some(html), None)
            .map(c => (id, c.rowIndex, c.colIndex, c.content))
        }.toDF("doc_id", "row_index", "col_index", "content")
        .orderBy("doc_id", "row_index", "col_index")
    }),

    // clean_pdfminer_inner_elements (pdfminer_processing.py:831-860) per doc:
    // one fixed non-pdfminer "table" region per page; every corpus box is
    // pdfminer-sourced and survives unless it is an almost-subregion (0.99,
    // +1 pixel-inclusive areas) of the table — the oracle recomputes the
    // same inclusive-area arithmetic in SQL
    "q_pdfminer_cleanup" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.PdfminerGeometry
      import graft.operators.PdfminerGeometry.PageRegion
      boxes(s, dir)
        .select(col("doc_id"), col("seq"), col("x1"), col("y1"), col("x2"), col("y2"))
        .as[(Long, Long, Double, Double, Double, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (doc, it) =>
          val rows = it.toSeq.sortBy(_._2)
          val regions = PageRegion((0.0, 0.0, 250.0, 250.0), isPdfminer = false) +:
            rows.map(r => PageRegion((r._3, r._4, r._5, r._6), isPdfminer = true))
          val kept = PdfminerGeometry.cleanPdfminerInnerElements(regions).toSet
          rows.zipWithIndex.map { case (r, i) => (doc, r._2, kept.contains(i + 1)) }
        }
        .toDF("doc_id", "seq", "kept")
        .orderBy("doc_id", "seq")
    }),

    // TableEvalProcessor (metrics/table/table_eval.py:230-327) end-to-end:
    // even docs predict the ground-truth table exactly (perfect scores through
    // the full difflib alignment machinery), odd docs predict nothing (the
    // zeros branch) — every metric lands on an oracle-predictable constant
    // while the real ratio/alignment/grouping code runs on every row
    "q_table_eval_processor" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.{TableEval, TableExtraction}
      docs(s, dir)
        .select(col("doc_id"), split(col("text"), " merge ").as("ps"))
        .as[(Long, Seq[String])]
        .map { case (doc, ps) =>
          // cells capped at 30 chars: identical long strings score BELOW 1.0
          // under difflib's autojunk popularity rule (b >= 200 chars), which
          // would make the oracle constant wrong — short cells sidestep it
          val cells = ps.take(4).zipWithIndex.map { case (p, i) =>
            TableExtraction.Cell(i / 2, i % 2, p.take(30))
          }
          val pred = if (doc % 2 == 0) Seq(cells) else Nil
          val r = TableEval.processFile(pred, Seq(cells))
          (doc, r.totalTables, r.totalPredictedTables, r.tableLevelAcc,
            r.tableDetectionF1, r.elementRowLevelIndexAcc,
            r.elementColLevelContentAcc, r.compositeStructureAcc)
        }
        .toDF("doc_id", "total_tables", "total_predicted", "table_level_acc",
          "detection_f1", "row_index_acc", "col_content_acc", "composite_acc")
        .orderBy("doc_id")
    }),

    // TEDS-like table eval: real parse+cell-match on constructed gold/pred pair —
    // pred corrupts one of 4 cells for every 3rd part -> score 2*3/8, else 1.0
    "q_table_eval" -> ((s, dir) => {
      import s.implicits._
      val gold = concat(lit("<table><tr><td>"), col("p_brand"), lit("</td><td>"),
        col("p_type"), lit("</td></tr><tr><td>"), col("p_name"), lit("</td><td>"),
        col("p_size").cast("string"), lit("</td></tr></table>"))
      val pred = when(col("p_partkey") % 3 === 0,
        concat(lit("<table><tr><td>XX</td><td>"), col("p_type"),
          lit("</td></tr><tr><td>"), col("p_name"), lit("</td><td>"),
          col("p_size").cast("string"), lit("</td></tr></table>")))
        .otherwise(gold)
      graft.Tables.readFanout(s, dir, "part")
        .select(col("p_partkey"), gold.as("g"), pred.as("p"))
        .as[(Long, String, String)]
        .map { case (k, g, p) =>
          (k, graft.operators.MetricsOps.tableEvalScore(g, p))
        }
        .toDF("doc_id", "score")
        .orderBy("doc_id")
    }),

    // deterministic hash-embedding encoder: first dims of the normalized vector
    "q_embed_documents" -> ((s, dir) => {
      val v = Embedder.embedColumn(col("text"), Embedder.DefaultDim)
      docs(s, dir).select(
        col("doc_id"),
        round(element_at(v, 1).cast("double"), 4).as("e0"),
        round(element_at(v, 2).cast("double"), 4).as("e1"),
        round(element_at(v, 16).cast("double"), 4).as("e15"))
        .orderBy("doc_id")
    }),

    // OCR supplement (ocr.py:491, pdf.py:916-929): inferred regions with no
    // contained extracted box get text from the (stubbed, deterministic) OCR
    // kernel; others concatenate their boxes in reading order. Anti-join shape.
    "q_ocr_supplement" -> ((s, dir) => {
      val kernel = (cols: Seq[Column]) => concat(lit("[OCR "), cols(0), lit(" @"),
        cols(1).cast("int").cast("string"), lit(","),
        cols(2).cast("int").cast("string"), lit("]"))
      LayoutOps.supplementWithOcr(
        inferredRegions(s, dir), extractedBoxes(s, dir), kernel, tolerancePx = 0.0)
        .orderBy("doc_id", "seq")
    }),

    // convert_to_coco (staging/base.py:734+): detection records from elements
    // carrying coordinates; four-corner points built from the box corpus.
    "q_convert_to_coco" -> ((s, dir) => {
      import s.implicits._
      import graft.model.{Coordinates, Element, ElementMetadata, Point}
      val els = boxes(s, dir)
        .select(col("doc_id").cast("string"), col("seq"), col("element_type"),
          col("x1"), col("y1"), col("x2"), col("y2"))
        .as[(String, Long, String, Double, Double, Double, Double)]
        .map { case (d, q, tpe, x1, y1, x2, y2) =>
          Element(s"b$q", tpe, "", d, q,
            ElementMetadata(coordinates = Some(Coordinates(
              points = Seq(Point(x1, y1), Point(x1, y2), Point(x2, y2), Point(x2, y1)),
              system = Some("PixelSpace"),
              layout_width = Some(500.0), layout_height = Some(500.0)))))
        }
      graft.sinks.Staging.convertToCoco(els)
        .select(col("image_id").cast("long").as("image_id"), col("id"),
          col("category_name"),
          col("bbox_origin.x").as("x"), col("bbox_origin.y").as("y"),
          col("width"), col("height"))
        .orderBy("image_id", "id")
    }))

  /** Shared OD-metric pipeline in SQL (per doc/class/threshold cells) — see
    * q_od_map for the derivation. Ends with CTE `f(doc_id, c, ap, p, r, f1)`. */
  private val odMetricCtes: String =
    """WITH d AS (SELECT DISTINCT doc_id, (doc_id % 3) + 2 AS tc FROM documents),
      |cls AS (SELECT unnest(range(0, 3)) AS c),
      |thr AS (SELECT unnest([0.50,0.55,0.60,0.65,0.70,0.75,0.80,0.85,0.90,0.95]) AS thr),
      |real AS (
      |  SELECT d.doc_id, d.tc, cls.c, j.j, 0.9 - j.j*0.1 AS conf,
      |    CASE (d.doc_id + j.j + cls.c) % 4
      |      WHEN 0 THEN 1.0 WHEN 1 THEN 95.0/105.0
      |      WHEN 2 THEN 80.0/120.0 ELSE 60.0/140.0 END AS iou
      |  FROM d CROSS JOIN cls CROSS JOIN (SELECT unnest(range(0, 3)) AS j) j
      |  WHERE j.j < d.tc - 1),
      |preds AS (
      |  SELECT * FROM real
      |  UNION ALL SELECT doc_id, tc, c, -1, 0.95, 46.0/154.0 FROM d CROSS JOIN cls
      |  UNION ALL SELECT doc_id, tc, c, 99, 0.3, 0.0 FROM d CROSS JOIN cls),
      |pt AS (
      |  SELECT p.*, t.thr, CASE WHEN p.iou > t.thr THEN 1 ELSE 0 END AS tp
      |  FROM preds p CROSS JOIN thr t),
      |roll AS (
      |  SELECT *,
      |    SUM(tp) OVER w AS tpc,
      |    COUNT(*) OVER w - SUM(tp) OVER w AS fpc,
      |    SUM(tp) OVER w / CAST(tc AS DOUBLE) AS rec
      |  FROM pt
      |  WINDOW w AS (PARTITION BY doc_id, c, thr ORDER BY conf DESC
      |    ROWS UNBOUNDED PRECEDING)),
      |adj AS (
      |  SELECT *, MAX(tpc / (tpc + fpc + 2.220446049250313e-16)) OVER
      |    (PARTITION BY doc_id, c, thr ORDER BY conf DESC
      |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS prec_adj
      |  FROM roll),
      |rt AS (SELECT unnest(range(0, 101)) AS k),
      |ap AS (
      |  SELECT doc_id, c, thr, AVG(samp) AS ap FROM (
      |    SELECT a.doc_id, a.c, a.thr, rt.k,
      |      COALESCE(MAX(CASE WHEN a.rec >= rt.k/100.0 THEN a.prec_adj END), 0.0)
      |        AS samp
      |    FROM adj a CROSS JOIN rt
      |    GROUP BY a.doc_id, a.c, a.thr, rt.k)
      |  GROUP BY doc_id, c, thr),
      |pr AS (
      |  SELECT doc_id, c, thr,
      |    MAX(CASE WHEN rn = 1 THEN prec_adj END) AS p,
      |    MAX(CASE WHEN rn = 1 THEN rec END) AS r
      |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, c, thr
      |    ORDER BY conf ASC) AS rn FROM adj)
      |  GROUP BY doc_id, c, thr),
      |f AS (
      |  SELECT pr.doc_id, pr.c, ap.ap, pr.p, pr.r,
      |    2*pr.p*pr.r/(pr.p + pr.r + 1e-16) AS f1
      |  FROM pr JOIN ap USING (doc_id, c, thr))""".stripMargin

  def oracles: Map[String, String] = Map(
    // per-class rows: same cells grouped by (doc, class)
    "q_od_map_per_class" ->
      s"""$odMetricCtes
         |SELECT doc_id, c AS cls, round(AVG(ap), 4) AS ap,
         |  round(AVG(p), 4) AS precision, round(AVG(r), 4) AS recall,
         |  round(AVG(f1), 4) AS f1_score
         |FROM f GROUP BY doc_id, c ORDER BY doc_id, cls""".stripMargin,
    // one engineered pair per page with its predicted classification
    "q_overlap_cases" ->
      """WITH k AS (
        |  SELECT * FROM (VALUES
        |    (1, 1, 2, 'Title', 'NarrativeText',
        |     'partial overlap with empty content in Title', 50.0, CAST(NULL AS DOUBLE)),
        |    (2, 3, 4, 'ListItem', 'Text',
        |     'partial overlap with duplicate text', 50.0, NULL),
        |    (3, 5, 6, 'Image', 'Table', 'Small partial overlap', 5.0, NULL),
        |    (4, 7, 8, 'Header', 'Footer',
        |     'partial overlap without sharing text', 50.0, 0.0),
        |    (5, 9, 10, 'Caption', 'UncategorizedText',
        |     'partial overlap sharing 33.33% of the text fromCaption(2-gram)',
        |     50.0, 33.33)
        |  ) AS t(page_number, seq_a, seq_b, type_a, type_b, overlap_case,
        |         overlap_pct, largest_ngram_pct))
        |SELECT d.doc_id, k.page_number, CAST(k.seq_a AS BIGINT) AS seq_a,
        |  CAST(k.seq_b AS BIGINT) AS seq_b, k.type_a, k.type_b, k.overlap_case,
        |  k.overlap_pct, k.largest_ngram_pct
        |FROM documents d CROSS JOIN k
        |ORDER BY doc_id, page_number""".stripMargin,

    // identical closed forms: x rescale, y flip through the relative system
    "q_convert_coordinates" ->
      s"""SELECT doc_id, seq,
         |  x1 / 500 * 1000 AS px1, (1.0 - y1 / 500) * 800 AS py1,
         |  x2 / 500 * 1000 AS px2, (1.0 - y2 / 500) * 800 AS py2,
         |  x1 / 500 * 1.0 AS rx1, (1.0 - y1 / 500) * 1.0 AS ry1
         |FROM $boxesSql b ORDER BY doc_id, seq""".stripMargin,

    // Re-derives the full metric pipeline in SQL: per-pred IoU from the shift
    // table, cumulative TP/FP over confidence, reversed-cummax precision
    // envelope, 101-point AP, P/R at the 0.1 score cut, then per-doc means
    // over the 30 (class, IoU-threshold) cells.
    "q_od_map" ->
      s"""$odMetricCtes
         |SELECT doc_id, round(AVG(ap), 4) AS m_ap, round(AVG(p), 4) AS precision,
         |  round(AVG(r), 4) AS recall, round(AVG(f1), 4) AS f1_score
         |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_bbox_overlap_pairs" ->
      s"""WITH b AS $boxesSql
         |SELECT a.doc_id, a.page_number, a.seq AS seq_a, b.seq AS seq_b,
         |  a.element_type AS type_a, b.element_type AS type_b,
         |  CASE
         |    WHEN (a.x1 >= b.x1 - 5 AND a.y1 >= b.y1 - 5 AND a.x2 <= b.x2 + 5 AND a.y2 <= b.y2 + 5)
         |     AND (b.x1 >= a.x1 - 5 AND b.y1 >= a.y1 - 5 AND b.x2 <= a.x2 + 5 AND b.y2 <= a.y2 + 5)
         |      THEN 'identical'
         |    WHEN (a.x1 >= b.x1 - 5 AND a.y1 >= b.y1 - 5 AND a.x2 <= b.x2 + 5 AND a.y2 <= b.y2 + 5)
         |      THEN 'nested Aa_in_Bb'
         |    WHEN (b.x1 >= a.x1 - 5 AND b.y1 >= a.y1 - 5 AND b.x2 <= a.x2 + 5 AND b.y2 <= a.y2 + 5)
         |      THEN 'nested Bb_in_Aa'
         |    ELSE 'partial overlap' END AS overlap_case,
         |  CASE WHEN least((a.x2-a.x1)*(a.y2-a.y1), (b.x2-b.x1)*(b.y2-b.y1)) > 0
         |    THEN round(greatest(least(a.x2,b.x2)-greatest(a.x1,b.x1), 0) *
         |               greatest(least(a.y2,b.y2)-greatest(a.y1,b.y1), 0) /
         |               least((a.x2-a.x1)*(a.y2-a.y1), (b.x2-b.x1)*(b.y2-b.y1)) * 100.0, 2)
         |    ELSE 0.0 END AS overlap_pct
         |FROM b a JOIN b b ON a.doc_id = b.doc_id AND a.page_number = b.page_number
         |  AND a.seq < b.seq
         |WHERE greatest(least(a.x2,b.x2)-greatest(a.x1,b.x1), 0) *
         |      greatest(least(a.y2,b.y2)-greatest(a.y1,b.y1), 0) > 0
         |ORDER BY a.doc_id, seq_a, seq_b""".stripMargin,

    "q_merge_layout" ->
      s"""WITH i AS $inferredSql, e AS $extractedSql
         |SELECT e.doc_id, e.page_number, e.seq, e.text,
         |  i.element_type AS region_type, i.seq AS region_seq
         |FROM e LEFT JOIN i ON e.doc_id = i.doc_id AND e.page_number = i.page_number
         |  AND e.x1 >= i.x1 AND e.y1 >= i.y1 AND e.x2 <= i.x2 AND e.y2 <= i.y2
         |ORDER BY e.doc_id, e.seq""".stripMargin,

    "q_normalize_layout" ->
      s"""WITH b AS $boxesSql,
         |v AS (SELECT doc_id, seq, CAST(seq % 8 AS INT) AS variant, x1 FROM b),
         |rows0 AS (
         |  SELECT doc_id, seq, 1 AS sub,
         |    CASE variant WHEN 0 THEN 'Title' WHEN 1 THEN 'Title' WHEN 2 THEN 'Title'
         |      WHEN 3 THEN 'Image' WHEN 5 THEN 'CheckBoxChecked'
         |      WHEN 6 THEN 'UncategorizedText' WHEN 7 THEN 'NarrativeText' END
         |      AS element_type,
         |    CASE variant WHEN 1 THEN 1 WHEN 2 THEN 2 END AS category_depth,
         |    'region ' || seq AS text, x1 AS coord_x1
         |  FROM v WHERE variant <> 4
         |  UNION ALL
         |  SELECT doc_id, seq, i, 'ListItem', NULL,
         |    (['alpha item', 'beta item', 'gamma item'])[i], x1
         |  FROM v, unnest([1, 2, 3]) AS t(i) WHERE variant = 4)
         |SELECT doc_id, seq, sub, element_type, category_depth, text, coord_x1
         |FROM rows0 ORDER BY doc_id, seq, sub""".stripMargin,

    "q_sort_basic" ->
      s"""WITH b AS $boxesSql
         |SELECT doc_id, seq AS orig_seq,
         |  row_number() OVER (PARTITION BY doc_id, page_number ORDER BY y1, x1, seq)
         |    AS reading_order
         |FROM b ORDER BY doc_id, orig_seq""".stripMargin,

    // grid cut order closed form: page offset + column-major rank within page
    "q_sort_xycut" ->
      """SELECT doc_id, i AS orig_seq,
        |  (i // 6) * 6 + ((i % 6) % 2) * 3 + ((i % 6) // 2) + 1 AS reading_order
        |FROM documents, range(0, 12) t(i)
        |ORDER BY doc_id, orig_seq""".stripMargin,

    "q_classify_positional" ->
      s"""WITH b AS $boxesSql
         |SELECT doc_id, seq,
         |  CASE WHEN (y1 + y2) / 2.0 / 520.0 < 0.07 THEN 'Header'
         |       WHEN (y1 + y2) / 2.0 / 520.0 > 0.93 THEN 'Footer'
         |       ELSE ${O.classify("'Note ' || element_type")} END AS element_type
         |FROM b ORDER BY doc_id, seq""".stripMargin,

    // pure-insertion = 2 x (chars removed); pure-deletion = chars added;
    // pure-substitution = chars replaced; mixed-edit pairs precomputed by an
    // independent DP (ins=2, del=1, sub=1)
    "q_weighted_levenshtein" ->
      """SELECT doc_id,
        |  2 * (length(t) - length(replace(t, 'e', ''))) AS ins_dist,
        |  3 AS del_dist,
        |  0 AS self_dist,
        |  length(t) - length(replace(t, 'e', '')) AS sub_dist,
        |  CASE doc_id % 6 WHEN 0 THEN 4 WHEN 1 THEN 5 WHEN 2 THEN 3
        |                  WHEN 3 THEN 2 WHEN 4 THEN 5 WHEN 5 THEN 7 END AS mixed_dist
        |FROM (SELECT doc_id, substring(text, 1, 500) AS t FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // substitution-only corruption: distance = 'e' count; source length after
    // quote-wrapping = len + 2; score = 1 - bounded(dist / max(len, 1))
    "q_edit_distance_accuracy" ->
      """SELECT doc_id,
        |  CAST(length(t) - length(replace(t, 'e', '')) AS BIGINT) AS edit_dist,
        |  round(1.0 - LEAST(GREATEST(
        |    (length(t) - length(replace(t, 'e', '')))::DOUBLE /
        |      GREATEST(length(t) + 2, 1)::DOUBLE, 0.0), 1.0), 4) AS accuracy
        |FROM (SELECT doc_id, substring(text, 1, 500) AS t FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // the constant spanned layout resolves to 9 grid positions; the rowspan
    // pushes the second header row right, the 2x2 body span leaves row 4 at 0
    "q_table_cells_extract" ->
      s"""WITH w AS (SELECT doc_id, (${O.words("text")})[1] AS w1, source
         |  FROM documents),
         |k AS (SELECT * FROM (VALUES
         |  (0, 0, 'W1'), (0, 1, 'SRC'), (0, 3, 'h1col4'),
         |  (1, 1, 'h2col2'), (1, 2, 'h2col34'),
         |  (2, 0, 'r3col1'), (2, 1, 'r3col2'), (2, 2, 'r34col34'),
         |  (3, 0, 'r4col12')) AS t(row_index, col_index, content))
         |SELECT doc_id, row_index, col_index,
         |  CASE content WHEN 'W1' THEN w1 WHEN 'SRC' THEN source
         |       ELSE content END AS content
         |FROM w CROSS JOIN k
         |ORDER BY doc_id, row_index, col_index""".stripMargin,

    "q_table_eval" ->
      """SELECT p_partkey AS doc_id,
        |  CASE WHEN p_partkey % 3 = 0 THEN 0.75 ELSE 1.0 END AS score
        |FROM part ORDER BY doc_id""".stripMargin,

    "q_pdfminer_cleanup" ->
      s"""WITH b AS $boxesSql
         |SELECT doc_id, seq,
         |  NOT (
         |    (GREATEST(LEAST(x2, 250) - GREATEST(x1, 0) + 1, 0) *
         |     GREATEST(LEAST(y2, 250) - GREATEST(y1, 0) + 1, 0))
         |      / GREATEST((x2 - x1 + 1) * (y2 - y1 + 1), 0.01) > 0.99
         |    AND (x2 - x1 + 1) * (y2 - y1 + 1) <= 251.0 * 251.0
         |  ) AS kept
         |FROM b ORDER BY doc_id, seq""".stripMargin,

    // identical pred (even docs) -> 1.0 across the board; no pred (odd) -> 0s
    "q_table_eval_processor" ->
      """SELECT doc_id, 1 AS total_tables,
        |  CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS total_predicted,
        |  CASE WHEN doc_id % 2 = 0 THEN 1.0 ELSE 0.0 END AS table_level_acc,
        |  CASE WHEN doc_id % 2 = 0 THEN 1.0 ELSE 0.0 END AS detection_f1,
        |  CASE WHEN doc_id % 2 = 0 THEN 1.0 ELSE 0.0 END AS row_index_acc,
        |  CASE WHEN doc_id % 2 = 0 THEN 1.0 ELSE 0.0 END AS col_content_acc,
        |  CASE WHEN doc_id % 2 = 0 THEN 1.0 ELSE 0.0 END AS composite_acc
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_embed_documents" -> {
      val h = O.polyHash("text")
      val raw = s"list_transform(range(0, ${Embedder.DefaultDim}), i -> " +
        s"CAST(($h * (i * 2 + 1) + i * 7919) % 1000000007 AS DOUBLE) / 1000000007.0 * 2.0 - 1.0)"
      s"""WITH v AS (
         |  SELECT doc_id, raw,
         |    sqrt(list_sum(list_transform(raw, x -> x * x))) AS nrm
         |  FROM (SELECT doc_id, $raw AS raw FROM documents)),
         |n AS (
         |  SELECT doc_id, list_transform(raw, x ->
         |    CAST(CASE WHEN nrm > 0 THEN x / nrm ELSE x END AS FLOAT)) AS e
         |  FROM v)
         |SELECT doc_id, round(CAST(e[1] AS DOUBLE), 4) AS e0,
         |  round(CAST(e[2] AS DOUBLE), 4) AS e1,
         |  round(CAST(e[16] AS DOUBLE), 4) AS e15
         |FROM n ORDER BY doc_id""".stripMargin
    },

    "q_ocr_supplement" ->
      s"""WITH i AS $inferredSql, e AS $extractedSql,
         |j AS (
         |  SELECT i.doc_id, i.page_number, i.seq, i.element_type,
         |    i.x1, i.y1, i.x2, i.y2, e.seq AS es, e.text AS et
         |  FROM i LEFT JOIN e ON i.doc_id = e.doc_id AND i.page_number = e.page_number
         |    AND e.x1 >= i.x1 AND e.y1 >= i.y1 AND e.x2 <= i.x2 AND e.y2 <= i.y2)
         |SELECT doc_id, page_number, seq, element_type,
         |  CASE WHEN count(es) > 0 THEN string_agg(et, ' ' ORDER BY es)
         |       ELSE '[OCR ' || element_type || ' @' ||
         |         CAST(CAST(x1 AS INT) AS VARCHAR) || ',' ||
         |         CAST(CAST(y1 AS INT) AS VARCHAR) || ']' END AS text,
         |  count(es) = 0 AS from_ocr
         |FROM j GROUP BY doc_id, page_number, seq, element_type, x1, y1, x2, y2
         |ORDER BY doc_id, seq""".stripMargin,

    "q_convert_to_coco" ->
      s"""WITH b AS $boxesSql
         |SELECT doc_id AS image_id, 'b' || CAST(seq AS VARCHAR) AS id,
         |  element_type AS category_name, x1 AS x, y1 AS y,
         |  CAST(500.0 AS DOUBLE) AS width, CAST(500.0 AS DOUBLE) AS height
         |FROM b ORDER BY image_id, id""".stripMargin)
}
