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

  private val LineBreak = "\\r?\\n".r
  /** `PARAGRAPH_PATTERN`, `nlp/patterns.py:73`. */
  private val ParagraphSplit = "\\s*\\n\\s*".r
  private val DoubleParagraphSplit = "(\\s*\\n\\s*){2}".r
  /** Leading unicode-bullet match (`nlp/patterns.py:29-55`). */
  private val BulletRe = ("^(?:" + graft.functions.Cleaners.BulletsPattern + ")").r

  /** `new_line_grouper` — join non-blank lines with blank lines (`core.py:187-210`). */
  def newLineGrouper(text: String): String =
    LineBreak.split(text).iterator.filter(_.strip.nonEmpty).mkString("\n\n")

  /** `group_bullet_paragraph` — split a bullet paragraph at each bullet (zero-width
    * lookahead keeps the bullet), rejoining wrapped lines; OCR `e`-bullet quirk
    * (`core.py:107-134`). */
  def groupBulletParagraph(paragraph: String): Seq[String] = {
    val p = paragraph.replaceAll("(?m)^e(?=\\s)", "·").strip
    p.split(s"(?=${Cleaners.BulletsPattern})").toSeq
      .filter(_.nonEmpty)
      .map(b => ParagraphSplit.replaceAllIn(b, " "))
  }

  /** `group_broken_paragraphs` — merge line-broken paragraphs (`core.py:137-184`). */
  def groupBrokenParagraphs(text: String): String = {
    val paragraphs = DoubleParagraphSplit.split(text)
    val out = Seq.newBuilder[String]
    paragraphs.foreach { paragraph =>
      val stripped = paragraph.strip
      if (stripped.nonEmpty) {
        if (BulletRe.findFirstIn(stripped).isDefined ||
          stripped.matches("(?s)^e\\s.*")) {
          out ++= groupBulletParagraph(paragraph)
        } else {
          val lines = ParagraphSplit.split(paragraph)
          val allShort = lines.forall(_.strip.split(" ").length < 5)
          if (allShort) out ++= lines.filter(_.strip.nonEmpty)
          else out += ParagraphSplit.replaceAllIn(paragraph, " ")
        }
      }
    }
    out.result().mkString("\n\n")
  }

  /** `auto_paragraph_grouper` — empty-line-ratio routing (`core.py:233-268`). */
  def autoParagraphGrouper(text: String, maxLineCount: Int = 2000,
      threshold: Double = 0.1): String = {
    val lines = LineBreak.split(text)
    val n = math.min(lines.length, maxLineCount)
    if (n == 0) return text
    val empty = lines.iterator.take(n).count(_.strip.isEmpty)
    val ratio = empty.toDouble / n
    if (ratio < threshold) newLineGrouper(text) else groupBrokenParagraphs(text)
  }

  /** `_split_by_paragraph` + strip + empty/empty-bullet drop (`text.py:92-107`). */
  def splitParagraphs(fileText: String, autoGroup: Boolean = true): Seq[String] = {
    val grouped = if (autoGroup) autoParagraphGrouper(fileText) else fileText
    ParagraphSplit.split(grouped.strip).toSeq
      .map(_.strip)
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

  /** Re-sequence after any filtering so `seq` stays dense per doc. */
  def resequence(df: DataFrame): DataFrame =
    df.withColumn("seq",
      row_number().over(Window.partitionBy("doc_id").orderBy("seq")).cast("long"))
}
