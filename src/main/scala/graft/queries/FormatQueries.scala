package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Cleaners, TextAnalysis}
import graft.queries.{OracleSql => O}
import graft.sources.{HtmlSource, Partitioners, TextSource}
import graft.sources.HtmlPartitioner.RawPara

/**
 * Driver-visible coverage for the text-format partitioners — CSV, TSV, Markdown,
 * XML, EML. Same pattern as [[SourceQueries]]: a corpus is constructed from the
 * `documents` table in-query, the REAL parser runs over it in a flatMap, and the
 * DuckDB oracle independently mirrors the construction plus the classification
 * cascades. A parse bug (quoting, MIME decode, markdown inline rules) shows up as
 * a hash mismatch against the construction-predicted output.
 */
object FormatQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.readFanout(s, dir, "documents")

  private def title3: Column =
    array_join(slice(TextAnalysis.words(col("text")), lit(1), lit(3)), " ")
  private def w1: Column = element_at(TextAnalysis.words(col("text")), 1)
  private def ps: Column = split(col("text"), " merge ")

  /**
   * Shared element-typing path for `(doc_id, payload)` corpora — the same
   * derive-vs-classify routing the production auto-router applies
   * ([[graft.sources.AutoSource]]): untyped paragraphs with `classifier="text"`
   * go through the TEXT cascade, others through the HTML derive rules (NULL =
   * dropped), then dense reseq.
   */
  private[queries] def partitionRows(df: DataFrame,
      parser: String => Seq[RawPara]): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val raw = df.select(col("doc_id").cast("long").as("doc_id"), col("payload"))
      .as[(Long, String)]
      .flatMap { case (d, t) =>
        parser(if (t == null) "" else t).zipWithIndex.map { case (p, i) =>
          (d, i + 1L, p.elementType.orNull, p.categoryDepth, p.text,
            p.textAsHtml.orNull, p.classifier)
        }
      }.toDF("doc_id", "seq", "raw_type", "category_depth", "raw_text",
        "text_as_html", "classifier")
    val derived = HtmlSource.classifierCascade(col("classifier"), col("raw_text"))
    val typed = raw.select(
      col("doc_id"), col("seq"),
      coalesce(col("raw_type"), derived).as("element_type"),
      HtmlSource.adjustedDepth(col("classifier"), col("raw_type"), derived,
        col("category_depth")).as("category_depth"),
      when(col("raw_type").isNull && derived === "ListItem",
        Cleaners.cleanBullets(col("raw_text")))
        .otherwise(col("raw_text")).as("text"),
      col("text_as_html"))
      .filter(col("element_type").isNotNull && col("text") =!= "")
    TextSource.resequence(typed)
  }

  // ----------------------------------------------------------------- corpora

  /** Quoting-adversarial CSV: embedded delimiter, escaped quotes. */
  private def csvPayload: Column = concat(
    lit("k,v\n"),
    lit("\"a,"), col("source"), lit("\",w"), col("doc_id").cast("string"), lit("\n"),
    lit("\"say \"\"hi\"\"\","), w1, lit("\n"),
    lit("plain,"), col("n_chars").cast("string"))

  /** CSV whose header line has EMPTY labels — the `include_header=True`
    * pandas rendering must surface them as `Unnamed: <index>`. */
  private def csvHeaderPayload: Column = concat(
    lit("hdr,,\n"),
    lit("\"a,"), col("source"), lit("\",w"), col("doc_id").cast("string"), lit(",x\n"),
    lit("plain,"), col("n_chars").cast("string"), lit(",y"))

  /** TSV with an empty middle cell (renders `<td/>`, drops from row text). */
  private def tsvPayload: Column = concat(
    lit("k\tv\tz\n"),
    col("source"), lit("\t\t"), w1, lit("\n"),
    lit("end\t"), col("doc_id").cast("string"), lit("\tlast"))

  private def mdPayload: Column = concat(
    lit("# "), title3, lit("\n\n"),
    array_join(ps, "\n\n"),
    lit("\n\n- item "), (col("doc_id") % 5).cast("string"),
    lit("\n- second item\n\nsee [docs "), w1,
    lit("](http://example.com/"), col("source"), lit(") now **"), w1, lit("** done\n"))

  private def xmlPayload: Column = concat(
    lit("<?xml version=\"1.0\"?>\n<catalog><title>"), title3, lit("</title>"),
    array_join(transform(ps, p => concat(lit("<item>"), p, lit("</item>"))), ""),
    lit("<note id=\""), (col("doc_id") % 10).cast("string"), lit("\">note "),
    col("source"), lit("</note></catalog>"))

  private def emlHeaders: Column = concat(
    lit("From: Alice <"), col("source"), lit("@example.com>\n"),
    lit("To: bob@example.com, carol@example.com\n"),
    lit("Subject: Update "), title3, lit("\n"),
    lit("Message-ID: <m"), col("doc_id").cast("string"), lit("@example.com>\n"),
    lit("Date: Mon, 01 Jan 2024 00:00:00 +0000\n"))

  private def emlHtmlBody: Column = concat(
    lit("<html><body><h1>"), title3, lit("</h1>"),
    array_join(transform(ps, p => concat(lit("<p>"), p, lit("</p>"))), ""),
    lit("</body></html>"))

  /** Quoted-printable body with a non-ASCII prefix (=C3=A9 → é). */
  private def emlQpBody: Column =
    concat(lit("caf=C3=A9 "), array_join(ps, "\n\n"))

  /** Even doc_id: multipart/alternative (QP plain + base64 HTML; html preferred).
    * Odd doc_id: single-part QP plain. */
  private def emlPayload: Column = {
    val b = concat(lit("B"), col("doc_id").cast("string"))
    val multipart = concat(emlHeaders,
      lit("MIME-Version: 1.0\nContent-Type: multipart/alternative; boundary=\""),
      b, lit("\"\n\n--"), b,
      lit("\nContent-Type: text/plain\nContent-Transfer-Encoding: quoted-printable\n\n"),
      emlQpBody, lit("\n--"), b,
      lit("\nContent-Type: text/html\nContent-Transfer-Encoding: base64\n\n"),
      base64(emlHtmlBody.cast("binary")), lit("\n--"), b, lit("--\n"))
    val single = concat(emlHeaders,
      lit("Content-Type: text/plain\nContent-Transfer-Encoding: quoted-printable\n\n"),
      emlQpBody)
    when(col("doc_id") % 2 === 0, multipart).otherwise(single)
  }

  /** multipart/mixed EML: one plain body paragraph + an attached .txt with two
    * paragraphs (`email.py:372-441` attachment recursion corpus). */
  private def emlAttPayload: Column = concat(
    emlHeaders,
    lit("MIME-Version: 1.0\nContent-Type: multipart/mixed; boundary=\"MX\"\n\n--MX\n"),
    lit("Content-Type: text/plain\n\nbody para "), w1,
    lit("\n--MX\nContent-Type: text/plain\nContent-Disposition: attachment; " +
      "filename=\"note_"),
    col("doc_id").cast("string"),
    lit(".txt\"\n\nattached first "), w1, lit("\n\nattached second\n--MX--\n"))

  // ----------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // attachment recursion (email.py:372-441): the attachment is re-partitioned
    // (bounded depth 1) and unioned with the body stream under an
    // `attached_to` marker — the AutoSource.partitionFiles union, corpus-shaped.
    "q_partition_attachments" -> ((s, dir) => {
      import s.implicits._
      val raw = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), emlAttPayload.as("payload"))
        .as[(Long, String)]
        .flatMap { case (d, t) =>
          val payload = if (t == null) "" else t
          val (_, paras) = Partitioners.partitionEmail(payload)
          val main = paras.zipWithIndex.map { case (p, i) =>
            (d, "main", i + 1L, p.text, null.asInstanceOf[String])
          }
          val atts = Partitioners.emailAttachments(payload).flatMap { case (fn, body) =>
            TextSource.splitParagraphs(body).zipWithIndex.map { case (p, i) =>
              (d, fn, i + 1L, p, s"doc_$d.eml")
            }
          }
          main ++ atts
        }.toDF("doc_id", "part", "seq", "raw_text", "attached_to")
      val tpe = graft.functions.Predicates.classifyText(col("raw_text"))
      raw.select(col("doc_id"), col("part"), col("seq"),
        tpe.as("element_type"),
        when(tpe === "ListItem",
          graft.functions.Cleaners.cleanBullets(col("raw_text")))
          .otherwise(col("raw_text")).as("text"),
        col("attached_to"))
        .orderBy("doc_id", "part", "seq")
    }),
    "q_partition_csv" -> ((s, dir) =>
      partitionRows(
        docs(s, dir).select(col("doc_id"), csvPayload.as("payload")),
        t => Partitioners.partitionCsv(t))
        .select(col("doc_id"), col("element_type"), col("text"), col("text_as_html"))
        .orderBy("doc_id")),

    // include_header=True: the first line becomes pandas column labels,
    // empty labels rendering `Unnamed: <index>`, labels joining text and
    // html (`csv.py:28-68`, `test_csv.py:204-211`)
    "q_partition_csv_header" -> ((s, dir) =>
      partitionRows(
        docs(s, dir).select(col("doc_id"), csvHeaderPayload.as("payload")),
        t => Partitioners.partitionCsv(t, includeHeader = true))
        .select(col("doc_id"), col("element_type"), col("text"), col("text_as_html"))
        .orderBy("doc_id")),

    // infer_table_structure=False: Table text survives, text_as_html drops
    "q_partition_csv_no_html" -> ((s, dir) =>
      partitionRows(
        docs(s, dir).select(col("doc_id"), csvPayload.as("payload")),
        t => Partitioners.partitionCsv(t, inferTableStructure = false))
        .select(col("doc_id"), col("element_type"), col("text"), col("text_as_html"))
        .orderBy("doc_id")),

    "q_partition_tsv" -> ((s, dir) =>
      partitionRows(
        docs(s, dir).select(col("doc_id"), tsvPayload.as("payload")),
        Partitioners.partitionTsv(_))
        .select(col("doc_id"), col("element_type"), col("text"), col("text_as_html"))
        .orderBy("doc_id")),

    "q_partition_md" -> ((s, dir) =>
      partitionRows(
        docs(s, dir).select(col("doc_id"), mdPayload.as("payload")),
        Partitioners.partitionMd)
        .select(col("doc_id"), col("seq"), col("element_type"),
          col("category_depth"), col("text"))
        .orderBy("doc_id", "seq")),

    "q_partition_xml" -> ((s, dir) =>
      partitionRows(
        docs(s, dir).select(col("doc_id"), xmlPayload.as("payload")),
        Partitioners.partitionXml)
        .select(col("doc_id"), col("seq"), col("element_type"), col("text"))
        .orderBy("doc_id", "seq")),

    // partition_json / elements_from_json rehydrate as a distributed fixpoint:
    // Element → sparse NDJSON line (ElementJson) → from_json with the Element
    // schema → fields back out. A writer/reader asymmetry (wrong key, type, or
    // sparse-null handling) breaks the construction-predicted compare.
    "q_json_rehydrate" -> ((s, dir) => {
      import s.implicits._
      val elems: org.apache.spark.sql.Dataset[graft.model.Element] =
        docs(s, dir)
          .select(col("doc_id").cast("long").as("doc_id"),
            posexplode(ps).as(Seq("pos", "ptext")))
          .select(col("doc_id"), (col("pos") + 1).as("seq"),
            graft.functions.Predicates.classifyText(col("ptext")).as("element_type"),
            col("ptext").as("text"))
          .as[(Long, Long, String, String)]
          .map { case (d, q, tpe, t) =>
            graft.model.Element(s"e$d-$q", tpe, t, d.toString, q,
              graft.model.ElementMetadata.empty.copy(
                filename = Some(s"doc$d.txt"),
                page_number = Some(((q - 1) / 2 + 1).toInt),
                languages = Some(Seq("eng", "spa"))))
          }
      val lines = graft.sinks.ElementSink.toNdjson(elems)
      val schema = org.apache.spark.sql.Encoders.product[graft.model.Element].schema
      lines.select(from_json(col("value"), schema).as("e"))
        .select(col("e.doc_id").cast("long").as("doc_id"), col("e.seq").as("seq"),
          col("e.type").as("element_type"), col("e.text").as("text"),
          col("e.element_id").as("element_id"),
          col("e.metadata.page_number").as("page_number"),
          col("e.metadata.filename").as("filename"),
          array_join(col("e.metadata.languages"), ",").as("langs"))
        .orderBy("doc_id", "seq")
    }),

    "q_partition_eml" -> ((s, dir) => {
      import s.implicits._
      val raw = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), emlPayload.as("payload"))
        .as[(Long, String)]
        .flatMap { case (d, t) =>
          val (meta, paras) = Partitioners.partitionEmail(if (t == null) "" else t)
          paras.zipWithIndex.map { case (p, i) =>
            (d, i + 1L, p.elementType.orNull, p.text, p.classifier,
              meta.subject.orNull, meta.sentFrom.mkString(","),
              meta.sentTo.mkString(","), meta.messageId.orNull)
          }
        }.toDF("doc_id", "seq", "raw_type", "raw_text", "classifier",
          "subject", "sent_from", "sent_to", "message_id")
      val derived = HtmlSource.classifierCascade(col("classifier"), col("raw_text"))
      val typed = raw.select(
        col("doc_id"), col("seq"),
        coalesce(col("raw_type"), derived).as("element_type"),
        // element_from_text bullet-cleans ListItems (text.py:124-127) — the
        // whole-message differential corpus pins this leg of the pipeline
        when(col("raw_type").isNull && derived === "ListItem",
          graft.functions.Cleaners.cleanBullets(col("raw_text")))
          .otherwise(col("raw_text")).as("text"),
        col("subject"), col("sent_from"), col("sent_to"), col("message_id"))
        .filter(col("element_type").isNotNull && col("text") =!= "")
      TextSource.resequence(typed).orderBy("doc_id", "seq")
    }))

  // ----------------------------------------------------------------- oracles

  /** The shared `documents` projection every oracle starts from. */
  private val base =
    s"""SELECT doc_id, string_split(text, ' merge ') AS ps,
       |  array_to_string(list_slice(${O.words("text")}, 1, 3), ' ') AS title3,
       |  (${O.words("text")})[1] AS w1, source, n_chars
       |FROM documents""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_partition_attachments" ->
      s"""WITH base AS ($base),
         |rows0 AS (
         |  SELECT doc_id, 'main' AS part, CAST(1 AS BIGINT) AS seq,
         |    'body para ' || w1 AS text, CAST(NULL AS VARCHAR) AS attached_to
         |  FROM base
         |  UNION ALL
         |  SELECT doc_id, 'note_' || doc_id || '.txt', CAST(1 AS BIGINT),
         |    'attached first ' || w1, 'doc_' || doc_id || '.eml' FROM base
         |  UNION ALL
         |  SELECT doc_id, 'note_' || doc_id || '.txt', CAST(2 AS BIGINT),
         |    'attached second', 'doc_' || doc_id || '.eml' FROM base)
         |SELECT doc_id, part, seq, ${O.classify("text")} AS element_type,
         |  text, attached_to
         |FROM rows0 ORDER BY doc_id, part, seq""".stripMargin,

    "q_partition_csv" ->
      s"""WITH base AS ($base)
         |SELECT doc_id, 'Table' AS element_type,
         |  'k v a,' || source || ' w' || doc_id ||
         |    ' say "hi" ' || w1 || ' plain ' || n_chars AS text,
         |  '<table><tr><td>k</td><td>v</td></tr><tr><td>a,' || source ||
         |    '</td><td>w' || doc_id || '</td></tr><tr><td>say "hi"</td><td>' || w1 ||
         |    '</td></tr><tr><td>plain</td><td>' || n_chars || '</td></tr></table>'
         |    AS text_as_html
         |FROM base ORDER BY doc_id""".stripMargin,

    "q_partition_csv_header" ->
      s"""WITH base AS ($base)
         |SELECT doc_id, 'Table' AS element_type,
         |  'hdr Unnamed: 1 Unnamed: 2 a,' || source || ' w' || doc_id ||
         |    ' x plain ' || n_chars || ' y' AS text,
         |  '<table><tr><td>hdr</td><td>Unnamed: 1</td><td>Unnamed: 2</td></tr>' ||
         |    '<tr><td>a,' || source || '</td><td>w' || doc_id ||
         |    '</td><td>x</td></tr><tr><td>plain</td><td>' || n_chars ||
         |    '</td><td>y</td></tr></table>' AS text_as_html
         |FROM base ORDER BY doc_id""".stripMargin,

    "q_partition_csv_no_html" ->
      s"""WITH base AS ($base)
         |SELECT doc_id, 'Table' AS element_type,
         |  'k v a,' || source || ' w' || doc_id ||
         |    ' say "hi" ' || w1 || ' plain ' || n_chars AS text,
         |  CAST(NULL AS VARCHAR) AS text_as_html
         |FROM base ORDER BY doc_id""".stripMargin,

    "q_partition_tsv" ->
      s"""WITH base AS ($base)
         |SELECT doc_id, 'Table' AS element_type,
         |  'k v z ' || source || ' ' || w1 ||
         |    ' end ' || doc_id || ' last' AS text,
         |  '<table><tr><td>k</td><td>v</td><td>z</td></tr><tr><td>' || source ||
         |    '</td><td/><td>' || w1 || '</td></tr><tr><td>end</td><td>' || doc_id ||
         |    '</td><td>last</td></tr></table>' AS text_as_html
         |FROM base ORDER BY doc_id""".stripMargin,

    "q_partition_md" -> {
      val inline = "'see docs ' || w1 || ' now ' || w1 || ' done'"
      s"""WITH base AS ($base),
         |rows0 AS (
         |  SELECT doc_id, 0 AS ord, 0 AS sub, 'Title' AS element_type,
         |    0 AS category_depth, title3 AS text FROM base
         |  UNION ALL
         |  SELECT doc_id, 1, i, ${O.deriveHtml("ps[i]")}, NULL, ps[i]
         |  FROM base, unnest(range(1, len(ps) + 1)) AS t(i)
         |  WHERE ${O.deriveHtml("ps[i]")} IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, 2, 1, 'ListItem', 1, 'item ' || (doc_id % 5) FROM base
         |  UNION ALL
         |  SELECT doc_id, 2, 2, 'ListItem', 1, 'second item' FROM base
         |  UNION ALL
         |  SELECT doc_id, 3, 1, ${O.deriveHtml(inline)}, NULL, $inline FROM base)
         |SELECT doc_id,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY ord, sub) AS seq,
         |  element_type, category_depth, text
         |FROM rows0 ORDER BY doc_id, seq""".stripMargin
    },

    "q_partition_xml" ->
      s"""WITH base AS ($base),
         |rows0 AS (
         |  SELECT doc_id, 0 AS ord, 0 AS sub, ${O.classify("title3")} AS element_type,
         |    title3 AS text FROM base
         |  UNION ALL
         |  SELECT doc_id, 1, i, ${O.classify("ps[i]")}, ps[i]
         |  FROM base, unnest(range(1, len(ps) + 1)) AS t(i)
         |  UNION ALL
         |  SELECT doc_id, 2, 1, ${O.classify("('note ' || source)")}, 'note ' || source
         |  FROM base)
         |SELECT doc_id,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY ord, sub) AS seq,
         |  element_type, text
         |FROM rows0 ORDER BY doc_id, seq""".stripMargin,

    "q_json_rehydrate" ->
      s"""WITH base AS ($base)
         |SELECT doc_id, i AS seq, ${O.classify("ps[i]")} AS element_type, ps[i] AS text,
         |  'e' || doc_id || '-' || i AS element_id,
         |  ((i - 1) // 2 + 1) AS page_number,
         |  'doc' || doc_id || '.txt' AS filename,
         |  'eng,spa' AS langs
         |FROM base, unnest(range(1, len(ps) + 1)) AS t(i)
         |ORDER BY doc_id, seq""".stripMargin,

    "q_partition_eml" -> {
      val cafe = s"(CASE WHEN i = 1 THEN 'caf' || chr(233) || ' ' || ps[i] ELSE ps[i] END)"
      s"""WITH base AS ($base),
         |rows0 AS (
         |  SELECT doc_id, 0 AS ord, 0 AS sub, 'Title' AS element_type, title3 AS text
         |  FROM base WHERE doc_id % 2 = 0
         |  UNION ALL
         |  SELECT doc_id, 1, i, ${O.deriveHtml("ps[i]")}, ps[i]
         |  FROM base, unnest(range(1, len(ps) + 1)) AS t(i)
         |  WHERE doc_id % 2 = 0 AND ${O.deriveHtml("ps[i]")} IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, 1, i, ${O.classify(cafe)}, $cafe
         |  FROM base, unnest(range(1, len(ps) + 1)) AS t(i)
         |  WHERE doc_id % 2 = 1)
         |SELECT r.doc_id,
         |  row_number() OVER (PARTITION BY r.doc_id ORDER BY ord, sub) AS seq,
         |  element_type, text,
         |  'Update ' || b.title3 AS subject,
         |  'Alice <' || b.source || '@example.com>' AS sent_from,
         |  'bob@example.com,carol@example.com' AS sent_to,
         |  'm' || r.doc_id || '@example.com' AS message_id
         |FROM rows0 r JOIN base b USING (doc_id)
         |ORDER BY doc_id, seq""".stripMargin
    })
}
