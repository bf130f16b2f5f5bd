package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Cleaners, Predicates}

/**
 * `partition_text` — the plain-text partitioner
 * (`/root/reference/unstructured/partition/text.py:42-166`): paragraph grouping
 * (`cleaners/core.py:187-268`), paragraph split (`text.py:214-216`,
 * `nlp/patterns.py:73`), empty-bullet drop (`text.py:182-184`), then the
 * first-match-wins classifier cascade (`text.py:111-166`).
 *
 * Spark shape: the paragraph splitter is a per-document Scala function applied in a
 * `flatMap` (parsing is inherently per-doc imperative work — the same shape every
 * file-format parser uses, embarrassingly parallel per document, no shuffle); the
 * classifier cascade stays a codegen'd column expression
 * (`Predicates.classifyText`) so the per-element hot path never leaves Tungsten.
 */
object TextSource {

  private val PS = Cleaners.PySpaceClass
  private def pyStrip(s: String): String = Cleaners.pyStripStr(s)

  /** `LINE_BREAK_RE = (?<=\n)` (`patterns.py:83-84`): pieces KEEP their trailing
    * newline, and a trailing `\n` yields a final empty piece. */
  private def lineBreakSplit(text: String): Array[String] = text.split("(?<=\n)", -1)

  /** `PARAGRAPH_PATTERN`, `nlp/patterns.py:73` — with Python's unicode `\s`. */
  private val ParagraphPattern = s"$PS*\\n$PS*"
  private val ParagraphSplit = ParagraphPattern.r
  /** `PARAGRAPH_PATTERN_RE` (`patterns.py:75-77`) — the broken-paragraph LINE
    * splitter: bullets or line breaks, not before another bullet or the end.
    * The capture group matters: Python `re.split` interleaves captured
    * separators into the result. */
  private val ParagraphPatternRe = java.util.regex.Pattern.compile(
    s"((?:${Cleaners.BulletsPattern})|$ParagraphPattern)(?!${Cleaners.BulletsPattern}|$$)")
  /** `DOUBLE_PARAGRAPH_PATTERN_RE` (`patterns.py:78`) — captured separator
    * pieces are whitespace-only and get dropped by the empty-paragraph check. */
  private val DoubleParagraphRe =
    java.util.regex.Pattern.compile(s"($ParagraphPattern){2}")
  /** Anchored `UNICODE_BULLETS_RE.match` (`patterns.py:55`): one bullet NOT
    * followed by another (a doubled bullet is not a bullet paragraph). */
  private val BulletRe = ("^" + Cleaners.UnicodeBulletsRegex).r
  /** `E_BULLET_PATTERN` (`patterns.py:58`) — pytesseract's lone-`e` bullets. */
  private val EBulletRe = java.util.regex.Pattern.compile(s"(?md)^e(?=$PS)")
  /** `E_BULLET_PATTERN.match(...)` — anchored at the string start only. */
  private val EBulletAnchor = java.util.regex.Pattern.compile(s"e(?=$PS)")

  /** Python `re.split` with one capturing group: captured separator text is
    * interleaved into the result list (bullet separators survive downstream
    * filtering — whitespace ones don't). */
  private def pySplitCapturing(re: java.util.regex.Pattern, s: String): Vector[String] = {
    val m = re.matcher(s)
    val out = Vector.newBuilder[String]
    var last = 0
    while (m.find()) {
      out += s.substring(last, m.start())
      out += m.group(1)
      last = m.end()
    }
    out += s.substring(last)
    out.result()
  }

  /** `new_line_grouper` (`core.py:187-210`): split AFTER each newline, keep
    * non-blank pieces verbatim (trailing `\n` included), join with blank lines. */
  def newLineGrouper(text: String): String =
    lineBreakSplit(text).iterator.filter(p => pyStrip(p).nonEmpty).mkString("\n\n")

  /** `group_bullet_paragraph` — split a bullet paragraph at each bullet (zero-width
    * lookahead/lookbehind keeps the bullet), rejoining wrapped lines; OCR
    * `e`-bullet quirk (`core.py:107-134`). */
  def groupBulletParagraph(paragraph: String): Seq[String] = {
    val p = pyStrip(EBulletRe.matcher(paragraph).replaceAll("·"))
    p.split(s"(?=${Cleaners.BulletsPattern})(?<!${Cleaners.BulletsPattern})").toSeq
      .filter(_.nonEmpty)
      .map(b => ParagraphSplit.replaceAllIn(b, " "))
  }

  /** `group_broken_paragraphs` — merge line-broken paragraphs (`core.py:137-184`). */
  def groupBrokenParagraphs(text: String): String =
    groupBrokenParagraphs(text, ParagraphPatternRe, DoubleParagraphRe)

  /** `group_broken_paragraphs(text, line_split, paragraph_split)` with the
    * reference's injectable split patterns (`core.py:187-231`) — a caller
    * whose corpus separates paragraphs differently (e.g. three blank lines,
    * `test_core.py:220-238`) supplies its own compiled patterns. */
  def groupBrokenParagraphs(text: String,
      lineSplit: java.util.regex.Pattern,
      paragraphSplit: java.util.regex.Pattern): String = {
    val paragraphs = pySplitCapturing(paragraphSplit, text)
    val out = Seq.newBuilder[String]
    paragraphs.foreach { paragraph =>
      val stripped = pyStrip(paragraph)
      if (stripped.nonEmpty) {
        if (BulletRe.findFirstIn(stripped).isDefined ||
          EBulletAnchor.matcher(stripped).lookingAt()) {
          out ++= groupBulletParagraph(paragraph)
        } else {
          // line split interleaves captured bullet separators — they count in
          // the all-short check and survive into the output when kept
          val lines = pySplitCapturing(lineSplit, paragraph)
          val allShort = lines.forall(l => pyStrip(l).split(" ", -1).length < 5)
          if (allShort) out ++= lines.filter(l => pyStrip(l).nonEmpty)
          else out += ParagraphSplit.replaceAllIn(paragraph, " ")
        }
      }
    }
    out.result().mkString("\n\n")
  }

  /** `auto_paragraph_grouper` — empty-line-ratio routing (`core.py:233-268`);
    * lines come from the newline-keeping `LINE_BREAK_RE` split. */
  def autoParagraphGrouper(text: String, maxLineCount: Int = 2000,
      threshold: Double = 0.1): String = {
    val lines = lineBreakSplit(text)
    val n = math.min(lines.length, maxLineCount)
    if (n == 0) return text
    val empty = lines.iterator.take(n).count(l => pyStrip(l).isEmpty)
    val ratio = empty.toDouble / n
    if (ratio < threshold) newLineGrouper(text) else groupBrokenParagraphs(text)
  }

  /** `_split_by_paragraph` + strip + empty/empty-bullet drop (`text.py:92-107`). */
  def splitParagraphs(fileText: String, autoGroup: Boolean = true): Seq[String] = {
    val grouped = if (autoGroup) autoParagraphGrouper(fileText) else fileText
    ParagraphSplit.split(pyStrip(grouped)).toSeq
      .map(pyStrip)
      .filter(p => p.nonEmpty && !(p.length == 1 && BulletRe.findFirstIn(p).isDefined))
  }

  /**
   * Partition a corpus of documents into element rows.
   *
   * Input: (`doc_id` STRING-castable, `textCol` STRING). Output columns:
   * `doc_id`, `seq` (1-based reading order), `element_type`, `text` (bullet-cleaned
   * for ListItems, like `element_from_text`, `text.py:124-127`).
   */
  def partitionText(df: DataFrame, textCol: Column, autoGroup: Boolean = true): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val pars = df.select(col("doc_id").cast("string").as("doc_id"), textCol.as("t"))
      .as[(String, String)]
      .flatMap { case (d, t) =>
        val text = if (t == null) "" else t
        splitParagraphs(text, autoGroup).zipWithIndex.map { case (p, i) => (d, i + 1L, p) }
      }
      .toDF("doc_id", "seq", "ptext")
    pars.select(
      col("doc_id"),
      col("seq"),
      Predicates.classifyText(col("ptext")).as("element_type"),
      when(Predicates.isBulletedText(col("ptext")), Cleaners.cleanBullets(col("ptext")))
        .otherwise(col("ptext")).as("text"))
  }

  /**
   * [[partitionText]] plus an `n_elements` column — the doc's TOTAL element
   * count, free to emit from the per-doc flatMap (the paragraph list is
   * already materialized per document). With the count on every row, any
   * per-doc contiguous range split (the streaming staging slices, file
   * packing) becomes a pure projection instead of a window — the
   * `ntile() over (partition by doc_id order by seq)` it replaces cost a
   * full exchange + sort of the element stream. A separate flatMap (not a
   * carry column in [[partitionText]]) so the 20+ batch consumers' rows
   * don't grow by a serialized long each.
   */
  private[graft] def partitionTextCounted(df: DataFrame, textCol: Column,
      autoGroup: Boolean = true): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val pars = df.select(col("doc_id").cast("string").as("doc_id"), textCol.as("t"))
      .as[(String, String)]
      .flatMap { case (d, t) =>
        val text = if (t == null) "" else t
        val ps = splitParagraphs(text, autoGroup)
        val n = ps.length.toLong
        ps.zipWithIndex.map { case (p, i) => (d, i + 1L, p, n) }
      }
      .toDF("doc_id", "seq", "ptext", "n_elements")
    pars.select(
      col("doc_id"),
      col("seq"),
      Predicates.classifyText(col("ptext")).as("element_type"),
      when(Predicates.isBulletedText(col("ptext")), Cleaners.cleanBullets(col("ptext")))
        .otherwise(col("ptext")).as("text"),
      col("n_elements"))
  }

  /** Re-sequence after any filtering so `seq` stays dense per doc. */
  /** Contiguous per-doc `seq` after drops. `constantKeys` are columns known
    * constant within a doc (e.g. `filetype`): adding them to the window's
    * partition spec changes nothing semantically but lets Catalyst push
    * predicates on them through the Window — which is what carries a
    * `filetype` filter down to the `GraftPartitionDocs` pushdown rule. */
  def resequence(df: DataFrame, constantKeys: String*): DataFrame =
    df.withColumn("seq",
      row_number().over(
        Window.partitionBy("doc_id", constantKeys: _*).orderBy("seq")).cast("long"))
}
