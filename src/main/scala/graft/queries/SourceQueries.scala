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

  /** Ontology-annotated HTML (the v2 schema) built from the same corpus: two
    * `Page` containers with ids, headings at two levels, mergeable text runs
    * (NarrativeText+Hyperlink; Quote+PhoneNumber+plain p), a table, an image
    * with alt text, fallback-classified tags, a checkbox and a PageBreak. An
    * attr-less `<div>` wrapper and an empty `<p></p>` exercise preprocessing. */
  private def htmlV2Corpus(s: SparkSession, dir: String): DataFrame = {
    val paras = transform(split(col("text"), " merge "),
      p => concat(lit("""<p class="NarrativeText">"""), p, lit("</p>")))
    val d = col("doc_id").cast("string")
    docs(s, dir).select(
      col("doc_id"),
      concat(
        lit("""<body class="Document" id="b"""), d, lit("""">"""),
        lit("""<div class="Page" data-page-number="1" id="p1-"""), d, lit("""">"""),
        lit("""<h1 class="Title">"""), title3, lit("</h1><div>"),
        array_join(paras, ""),
        lit("""<a class="Hyperlink" href="https://example.com/"""), d,
        lit("""">see also """), (col("doc_id") % 7).cast("string"), lit("</a></div>"),
        lit("""<table class="Table"><tbody class="TableBody"><tr class="TableRow">""" +
          """<td class="TableCell">k</td><td class="TableCell">"""), col("source"),
        lit("</td></tr></tbody></table>"),
        lit("""<img class="Image" alt="figure """), (col("doc_id") % 11).cast("string"),
        lit(""""/></div>"""),
        lit("""<div class="Page" data-page-number="2" id="p2-"""), d, lit("""">"""),
        lit("""<h3 class="Heading">section """), (col("doc_id") % 5).cast("string"),
        lit("""</h3><p></p><blockquote class="Quote">quoted """),
        (col("doc_id") % 17).cast("string"),
        lit("""</blockquote><span class="PhoneNumber">215-555-"""),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit("""</span><p>plain paragraph """), (col("doc_id") % 3).cast("string"),
        lit("""</p><foo>mystery """), (col("doc_id") % 13).cast("string"),
        lit("""</foo><div class="Quote">misplaced """), (col("doc_id") % 19).cast("string"),
        lit("""</div><input class="Checkbox" type="checkbox" checked/>"""),
        lit("""<hr class="PageBreak" id="br-"""), d, lit(""""/>"""),
        lit("""<pre class="CodeBlock">let x = """), d, lit("</pre></div></body>")
      ).as("html"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_partition_html" -> ((s, dir) =>
      HtmlSource.partitionHtml(htmlCorpus(s, dir), col("html"))
        .select(col("doc_id").cast("long").as("doc_id"), col("seq"),
          col("element_type"), col("category_depth"), col("text"), col("text_as_html"))
        .orderBy("doc_id", "seq")),

    // v1 annotation surface (parser.py Bold/Italic/Anchor iter_text_segments):
    // per-leaf emphasis entries with composite tags, anchor link text/url
    // pairs — flattened to one row per annotation so the gate is scalar
    "q_html_annotations" -> ((s, dir) => {
      import s.implicits._
      val d = col("doc_id").cast("string")
      val html = concat(
        lit("<p>intro <b>bold one <i>nest "), (col("doc_id") % 7).cast("string"),
        lit("</i></b> <a href=\"https://example.com/"), d,
        lit("\">link "), (col("doc_id") % 5).cast("string"),
        lit("</a> tail</p>"))
      docs(s, dir).select(col("doc_id").cast("long").as("doc_id"), html.as("html"))
        .as[(Long, String)]
        .flatMap { case (id, h) =>
          val ps = graft.sources.HtmlPartitioner.partition(h)
          ps.headOption.toSeq.flatMap { p =>
            p.emphasizedContents.zip(p.emphasizedTags).zipWithIndex.map {
              case ((c, t), i) => (id, "emphasis", i + 1L, c, t)
            } ++ p.linkTexts.zip(p.linkUrls).zipWithIndex.map {
              case ((c, u), i) => (id, "link", i + 1L, c, u)
            }
          }
        }
        .toDF("doc_id", "kind", "idx", "content", "extra")
        .orderBy("doc_id", "kind", "idx")
    }),

    // html_parser_version="v2": the full ontology flow (parse → flatten →
    // inline-merge) per doc in a flatMap — no shuffle until the final
    // oracle-determinism sort; scales as one task per input split.
    "q_partition_html_v2" -> ((s, dir) => {
      import s.implicits._
      htmlV2Corpus(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("html"))
        .as[(Long, String)]
        .flatMap { case (d, h) =>
          graft.sources.HtmlOntology.partition(h).zipWithIndex.map { case (e, i) =>
            (d, i + 1L, e.elementType, e.text, e.textAsHtml, e.categoryDepth,
              e.pageNumber, e.parentId)
          }
        }
        .toDF("doc_id", "seq", "element_type", "text", "text_as_html",
          "category_depth", "page_number", "parent_id")
        .orderBy("doc_id", "seq")
    }),

    // v2 inverse: flattened elements -> ontology tree -> serialized HTML
    // (`unstructured_elements_to_ontology`). The rebuilt document is the
    // id-less normalization of the corpus (merged runs re-split per tag,
    // fallback-classified tags normalized, post-break content nested inside
    // the PageBreak container — the reference's stack semantics).
    "q_html_v2_roundtrip" -> ((s, dir) => {
      import s.implicits._
      htmlV2Corpus(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("html"))
        .as[(Long, String)]
        .map { case (d, h) =>
          val els = graft.sources.HtmlOntology.partition(h)
          (d, graft.sources.HtmlOntology.toHtml(
            graft.sources.HtmlOntology.elementsToOntology(els)))
        }
        .toDF("doc_id", "html")
        .orderBy("doc_id")
    }),

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

    // three annotation rows per doc: two emphasis leaves (b, bi) + one link
    "q_html_annotations" ->
      """SELECT doc_id, kind, idx, content, extra FROM (
        |  SELECT doc_id, 'emphasis' AS kind, CAST(1 AS BIGINT) AS idx,
        |    'bold one' AS content, 'b' AS extra FROM documents
        |  UNION ALL SELECT doc_id, 'emphasis', 2,
        |    'nest ' || (doc_id % 7), 'bi' FROM documents
        |  UNION ALL SELECT doc_id, 'link', 1, 'link ' || (doc_id % 5),
        |    'https://example.com/' || doc_id FROM documents)
        |ORDER BY doc_id, kind, idx""".stripMargin,

    // v2 ontology flow over the constructed two-page corpus: 13 rows per doc,
    // every field (merge runs, normalized HTML, heading depths, container
    // parent ids, page numbers) predicted independently from `documents`.
    "q_partition_html_v2" -> {
      val ws = O.words("text")
      s"""WITH base AS (
         |  SELECT doc_id, string_split(text, ' merge ') AS ps,
         |    array_to_string(list_slice($ws, 1, 3), ' ') AS title3, source,
         |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS ph
         |  FROM documents),
         |rows0 AS (
         |  SELECT doc_id, 1 AS ord, 'UncategorizedText' AS element_type, '' AS text,
         |    '<div class="Page" data-page-number="1" />' AS text_as_html,
         |    CAST(NULL AS INT) AS category_depth, 1 AS page_number,
         |    'b' || doc_id AS parent_id FROM base
         |  UNION ALL SELECT doc_id, 2, 'Title', title3,
         |    '<h1 class="Title">' || title3 || '</h1>', 0, 1, NULL FROM base
         |  UNION ALL SELECT doc_id, 3, 'NarrativeText',
         |    array_to_string(ps, ' ') || ' see also ' || (doc_id % 7),
         |    array_to_string(list_transform(ps,
         |      p -> '<p class="NarrativeText">' || p || '</p>'), '')
         |      || '<a class="Hyperlink" href="https://example.com/' || doc_id
         |      || '">see also ' || (doc_id % 7) || '</a>',
         |    NULL, 1, NULL FROM base
         |  UNION ALL SELECT doc_id, 4, 'Table', 'k ' || source,
         |    '<table class="Table"><tbody><tr><td>k</td><td>' || source ||
         |      '</td></tr></tbody></table>', NULL, 1, NULL FROM base
         |  UNION ALL SELECT doc_id, 5, 'Image', 'figure ' || (doc_id % 11),
         |    '<img class="Image" alt="figure ' || (doc_id % 11) || '" />',
         |    NULL, 1, NULL FROM base
         |  UNION ALL SELECT doc_id, 6, 'UncategorizedText', '',
         |    '<div class="Page" data-page-number="2" />', NULL, 2,
         |    'b' || doc_id FROM base
         |  UNION ALL SELECT doc_id, 7, 'Title', 'section ' || (doc_id % 5),
         |    '<h3 class="Heading">section ' || (doc_id % 5) || '</h3>', 2, 2,
         |    NULL FROM base
         |  UNION ALL SELECT doc_id, 8, 'NarrativeText',
         |    'quoted ' || (doc_id % 17) || ' 215-555-' || ph ||
         |      ' plain paragraph ' || (doc_id % 3),
         |    '<blockquote class="Quote">quoted ' || (doc_id % 17) ||
         |      '</blockquote><span class="PhoneNumber">215-555-' || ph ||
         |      '</span><p class="Paragraph">plain paragraph ' || (doc_id % 3) ||
         |      '</p>', NULL, 2, NULL FROM base
         |  UNION ALL SELECT doc_id, 9, 'UncategorizedText', 'mystery ' || (doc_id % 13),
         |    '<span class="UncategorizedText">mystery ' || (doc_id % 13) ||
         |      '</span>', NULL, 2, NULL FROM base
         |  UNION ALL SELECT doc_id, 10, 'NarrativeText',
         |    'misplaced ' || (doc_id % 19),
         |    '<blockquote class="Quote">misplaced ' || (doc_id % 19) ||
         |      '</blockquote>', NULL, 2, NULL FROM base
         |  UNION ALL SELECT doc_id, 11, 'UncategorizedText', '',
         |    '<input class="Checkbox" type="checkbox" checked />', NULL, 2,
         |    NULL FROM base
         |  UNION ALL SELECT doc_id, 12, 'UncategorizedText', '',
         |    '<hr class="PageBreak" />', NULL, 2, 'p2-' || doc_id FROM base
         |  UNION ALL SELECT doc_id, 13, 'CodeSnippet', 'let x = ' || doc_id,
         |    '<pre class="CodeBlock">let x = ' || doc_id || '</pre>', NULL, 2,
         |    NULL FROM base)
         |SELECT doc_id,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS seq,
         |  element_type, text, text_as_html, category_depth, page_number,
         |  parent_id
         |FROM rows0 ORDER BY doc_id, seq""".stripMargin
    },

    // the rebuilt document as one string per doc
    "q_html_v2_roundtrip" -> {
      val ws = O.words("text")
      s"""WITH base AS (
         |  SELECT doc_id, string_split(text, ' merge ') AS ps,
         |    array_to_string(list_slice($ws, 1, 3), ' ') AS title3, source,
         |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS ph
         |  FROM documents)
         |SELECT doc_id,
         |  '<body class="Document"><div class="Page" data-page-number="1">' ||
         |  '<h1 class="Title">' || title3 || '</h1>' ||
         |  array_to_string(list_transform(ps,
         |    p -> '<p class="NarrativeText">' || p || '</p>'), '') ||
         |  '<a class="Hyperlink" href="https://example.com/' || doc_id ||
         |    '">see also ' || (doc_id % 7) || '</a>' ||
         |  '<table class="Table"><tbody><tr><td>k</td><td>' || source ||
         |    '</td></tr></tbody></table>' ||
         |  '<img class="Image" alt="figure ' || (doc_id % 11) || '" />' ||
         |  '</div><div class="Page" data-page-number="2">' ||
         |  '<h3 class="Heading">section ' || (doc_id % 5) || '</h3>' ||
         |  '<blockquote class="Quote">quoted ' || (doc_id % 17) || '</blockquote>' ||
         |  '<span class="PhoneNumber">215-555-' || ph || '</span>' ||
         |  '<p class="Paragraph">plain paragraph ' || (doc_id % 3) || '</p>' ||
         |  '<span class="UncategorizedText">mystery ' || (doc_id % 13) || '</span>' ||
         |  '<blockquote class="Quote">misplaced ' || (doc_id % 19) || '</blockquote>' ||
         |  '<input class="Checkbox" type="checkbox" checked />' ||
         |  '<hr class="PageBreak"><pre class="CodeBlock">let x = ' || doc_id ||
         |    '</pre></hr>' ||
         |  '</div></body>' AS html
         |FROM base ORDER BY doc_id""".stripMargin
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
