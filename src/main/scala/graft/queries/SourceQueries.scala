package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.queries.{OracleSql => O}
import graft.sources.HtmlSource

/**
 * Partitioner coverage queries: HTML documents constructed from the `documents`
 * corpus (title → `<h1>`, paragraphs → `<p>`, a list and a table per doc), run
 * through the real flow/phrasing partitioner; the oracle mirrors the construction
 * and independently applies the derive-from-text rules (`parser.py:921-936`).
 */
object SourceQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.readFanout(s, dir, "documents")

  private def htmlCorpus(s: SparkSession, dir: String): DataFrame = {
    val title3 = array_join(slice(TextAnalysis.words(col("text")), lit(1), lit(3)), " ")
    val paras = transform(split(col("text"), " merge "),
      p => concat(lit("<p>"), p, lit("</p>")))
    docs(s, dir).select(
      col("doc_id"),
      concat(
        lit("<html><body><h1>"), title3, lit("</h1>"),
        array_join(paras, ""),
        lit("<ul><li>item "), (col("doc_id") % 5).cast("string"),
        lit("</li><li>second item</li></ul>"),
        lit("<table><tr><td>k</td><td>"), col("source"),
        lit("</td></tr></table></body></html>")).as("html"))
  }

  /** Shared shape for the converted-format partitioners (RTF/Org/reST): per-doc
    * parse in a flatMap, untyped paragraphs derive via the TEXT cascade
    * (`element_from_text`), dense seq. */
  private def partitionCol(df: DataFrame,
      parser: String => Seq[graft.sources.HtmlPartitioner.RawPara]): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val raw = df.select(col("doc_id").cast("long").as("doc_id"), col("payload"))
      .as[(Long, String)]
      .flatMap { case (d, t) =>
        parser(if (t == null) "" else t).zipWithIndex.map { case (p, i) =>
          (d, i + 1L, p.elementType.orNull, p.categoryDepth, p.text, p.textAsHtml.orNull)
        }
      }.toDF("doc_id", "seq", "raw_type", "category_depth", "raw_text", "text_as_html")
    raw.select(col("doc_id"), col("seq"),
      coalesce(col("raw_type"),
        graft.functions.Predicates.classifyText(col("raw_text"))).as("element_type"),
      col("category_depth"), col("raw_text").as("text"), col("text_as_html"))
      .orderBy("doc_id", "seq")
  }

  private def title3 = array_join(slice(TextAnalysis.words(col("text")), lit(1), lit(3)), " ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_partition_html" -> ((s, dir) =>
      HtmlSource.partitionHtml(htmlCorpus(s, dir), col("html"))
        .select(col("doc_id").cast("long").as("doc_id"), col("seq"),
          col("element_type"), col("category_depth"), col("text"), col("text_as_html"))
        .orderBy("doc_id", "seq")),

    // RTF corpus: heading (outlinelevel0) + one group per paragraph + one table row.
    "q_partition_rtf" -> ((s, dir) => {
      val paras = transform(split(col("text"), " merge "),
        p => concat(lit("{\\pard "), p, lit("\\par}")))
      val rtf = concat(
        lit("{\\rtf1\\ansi\\deff0 {\\pard \\outlinelevel0 "), title3, lit("\\par}"),
        array_join(paras, ""),
        lit("{\\trowd\\cellx3000\\cellx6000\\pard\\intbl k\\cell "), col("source"),
        lit("\\cell\\row}}"))
      partitionCol(docs(s, dir).select(col("doc_id"), rtf.as("payload")),
        graft.sources.ConvertedFormats.partitionRtf)
    }),

    // Org corpus: '*' heading, prose paragraphs, two bullets, a pipe table.
    "q_partition_org" -> ((s, dir) => {
      val org = concat(
        lit("* "), title3, lit("\n\n"),
        array_join(split(col("text"), " merge "), "\n\n"),
        lit("\n\n- item "), (col("doc_id") % 5).cast("string"),
        lit("\n- second item\n\n| k | "), col("source"), lit(" |\n"))
      partitionCol(docs(s, dir).select(col("doc_id"), org.as("payload")),
        graft.sources.ConvertedFormats.partitionOrg)
    }),

    // reST corpus: adornment-underlined title, prose, bullets, an enumeration.
    "q_partition_rst" -> ((s, dir) => {
      val rst = concat(
        title3, lit("\n"), repeat(lit("="), length(title3).cast("int")), lit("\n\n"),
        array_join(split(col("text"), " merge "), "\n\n"),
        lit("\n\n- item "), (col("doc_id") % 5).cast("string"),
        lit("\n- second item\n\n1. third item\n"))
      partitionCol(docs(s, dir).select(col("doc_id"), rst.as("payload")),
        graft.sources.ConvertedFormats.partitionRst)
        .drop("text_as_html") // no tables in the corpus: all-NULL column flakes the compare
    }))

  // -- oracle ----------------------------------------------------------------------

  /** `derive_element_type_from_text` mirror; NULL = paragraph skipped. */
  private def derive(x: String): String =
    s"(CASE WHEN ${O.isBulleted(x)} THEN 'ListItem' " +
      s"WHEN ${O.isUsCityStateZip(x)} THEN 'Address' " +
      s"WHEN ${O.isEmailAddr(x)} THEN 'EmailAddress' " +
      s"WHEN length($x) < 2 THEN NULL " +
      s"WHEN ${O.isPossibleNarrative(x)} THEN 'NarrativeText' " +
      s"ELSE 'UncategorizedText' END)"

  def oracles: Map[String, String] = Map(
    "q_partition_html" -> {
      val ws = O.words("text")
      s"""WITH base AS (
         |  SELECT doc_id, string_split(text, ' merge ') AS ps,
         |    array_to_string(list_slice($ws, 1, 3), ' ') AS title3, source
         |  FROM documents),
         |rows0 AS (
         |  SELECT doc_id, 0 AS ord, 0 AS sub, 'Title' AS element_type,
         |    0 AS category_depth, title3 AS text, NULL AS text_as_html
         |  FROM base
         |  UNION ALL
         |  SELECT doc_id, 1, i, ${derive("ps[i]")}, NULL, ps[i], NULL
         |  FROM base, unnest(range(1, len(ps) + 1)) AS t(i)
         |  WHERE ${derive("ps[i]")} IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, 2, 1, 'ListItem', 1, 'item ' || (doc_id % 5), NULL FROM base
         |  UNION ALL
         |  SELECT doc_id, 2, 2, 'ListItem', 1, 'second item', NULL FROM base
         |  UNION ALL
         |  SELECT doc_id, 3, 1, 'Table', NULL, 'k ' || source,
         |    '<table><tr><td>k</td><td>' || source || '</td></tr></table>'
         |  FROM base)
         |SELECT doc_id,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY ord, sub) AS seq,
         |  element_type, category_depth, text, text_as_html
         |FROM rows0 ORDER BY doc_id, seq""".stripMargin
    },

    "q_partition_rtf" -> convertedOracle(listItems = Nil, table = true),
    "q_partition_org" -> convertedOracle(
      listItems = Seq("'item ' || (doc_id % 5)", "'second item'"), table = true),
    "q_partition_rst" -> convertedOracle(
      listItems = Seq("'item ' || (doc_id % 5)", "'second item'", "'third item'"),
      table = false))

  /**
   * Shared oracle for the converted-format corpora: Title (depth 0), ` merge `-split
   * paragraphs classified by the TEXT cascade (`element_from_text`,
   * `partition/text.py:111-166`), optional ListItems (depth 0), optional
   * single-row `k | source` table.
   */
  private def convertedOracle(listItems: Seq[String], table: Boolean): String = {
    val ws = O.words("text")
    val lis = listItems.zipWithIndex.map { case (t, i) =>
      s"UNION ALL SELECT doc_id, 2, ${i + 1}, 'ListItem', 0, $t, NULL FROM base"
    }.mkString("\n")
    val tbl = if (table)
      """UNION ALL SELECT doc_id, 3, 1, 'Table', NULL, 'k ' || source,
        |  '<table><tr><td>k</td><td>' || source || '</td></tr></table>' FROM base""".stripMargin
    else ""
    val htmlCol = if (table) ", text_as_html" else ""
    s"""WITH base AS (
       |  SELECT doc_id, string_split(text, ' merge ') AS ps,
       |    array_to_string(list_slice($ws, 1, 3), ' ') AS title3, source
       |  FROM documents),
       |rows0 AS (
       |  SELECT doc_id, 0 AS ord, 0 AS sub, 'Title' AS element_type,
       |    0 AS category_depth, title3 AS text, NULL AS text_as_html
       |  FROM base
       |  UNION ALL
       |  SELECT doc_id, 1, i, ${O.classify("ps[i]")}, NULL, ps[i], NULL
       |  FROM base, unnest(range(1, len(ps) + 1)) AS t(i)
       |  $lis
       |  $tbl)
       |SELECT doc_id,
       |  row_number() OVER (PARTITION BY doc_id ORDER BY ord, sub) AS seq,
       |  element_type, category_depth, text$htmlCol
       |FROM rows0 ORDER BY doc_id, seq""".stripMargin
  }
}
