package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Cleaners, Predicates}

/**
 * Dataset-level `partition_html`: the per-doc DOM walk runs in a `flatMap`
 * ([[HtmlPartitioner]]), then un-typed paragraphs derive their element type in the
 * codegen'd classifier column (`derive_element_type_from_text`,
 * `parser.py:921-936` — note the order differs from `partition_text`'s cascade:
 * bullet → city/state/zip → email → too-short → narrative → Text).
 */
object HtmlSource {

  /** `derive_element_type_from_text` as a column over (normalized) paragraph text.
    * NULL means "skip this paragraph" (single-character non-bullet text). */
  def deriveElementType(c: Column): Column =
    when(Predicates.isBulletedText(c), "ListItem")
      .when(Predicates.isUsCityStateZip(c), "Address")
      .when(Predicates.isEmailAddress(c), "EmailAddress")
      .when(length(c) < 2, lit(null).cast("string"))
      .when(Predicates.isPossibleNarrativeText(c), "NarrativeText")
      .otherwise("UncategorizedText")

  /** The DOCX untyped-paragraph cascade (`docx.py:938-951`): city/state/zip →
    * email → narrative, falling back to `Text` (never skipped; list items are
    * recognized in the partitioner before this runs). */
  def deriveDocx(c: Column): Column =
    when(Predicates.isUsCityStateZip(c), "Address")
      .when(Predicates.isEmailAddress(c), "EmailAddress")
      .when(Predicates.isPossibleNarrativeText(c), "NarrativeText")
      .otherwise("UncategorizedText")

  /** The PPTX body-paragraph cascade (`pptx.py:225-245`): email → narrative →
    * possible-title (which bumps category_depth by one) → `Text`; XML-level
    * bullets are recognized in the partitioner. */
  def derivePptx(c: Column): Column =
    when(Predicates.isEmailAddress(c), "EmailAddress")
      .when(Predicates.isPossibleNarrativeText(c), "NarrativeText")
      .when(Predicates.isPossibleTitle(c), "Title")
      .otherwise("UncategorizedText")

  /** The spreadsheet single-cell cascade (`xlsx.py:441-452` `_create_element`):
    * bullet → numbered-list → narrative → title → `Text` — narrower than the
    * text-file cascade (no email/address branches, so a lone e-mail cell
    * classifies as Title exactly like the reference). */
  def deriveTabular(c: Column): Column =
    when(Predicates.isBulletedText(c), "ListItem")
      .when(Predicates.isPossibleNumberedList(c), "ListItem")
      .when(Predicates.isPossibleNarrativeText(c), "NarrativeText")
      .when(Predicates.isPossibleTitle(c), "Title")
      .otherwise("UncategorizedText")

  /** Untyped-paragraph routing by the RawPara `classifier` tag — the one place
    * every source (auto-router, format queries) resolves element types. */
  def classifierCascade(classifier: Column, text: Column): Column =
    when(classifier === "text", Predicates.classifyText(text))
      .when(classifier === "docx", deriveDocx(text))
      .when(classifier === "pptx", derivePptx(text))
      .when(classifier === "tabular", deriveTabular(text))
      .otherwise(deriveElementType(text))

  /** PPTX text-derived Titles carry `category_depth = level + 1`
    * (`pptx.py:240-243`); everything else keeps the partitioner's depth. */
  def adjustedDepth(classifier: Column, rawType: Column, derived: Column,
      depth: Column): Column =
    when(classifier === "pptx" && rawType.isNull && derived === "Title",
      coalesce(depth, lit(0)) + 1)
      .otherwise(depth)

  /**
   * Partition an HTML corpus into element rows. Input: (`doc_id`, `htmlCol`).
   * Output: `doc_id, seq, element_type, category_depth, text, text_as_html,
   * image_url, emphasized_text_contents, emphasized_text_tags, link_texts,
   * link_urls` — dense reading-order `seq` per doc.
   */
  def partitionHtml(df: DataFrame, htmlCol: Column,
      skipHeadersAndFooters: Boolean = false): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val raw = df.select(col("doc_id").cast("string").as("doc_id"), htmlCol.as("h"))
      .as[(String, String)]
      .flatMap { case (d, h) =>
        val html = if (h == null) "" else h
        HtmlPartitioner.partition(html, skipHeadersAndFooters).zipWithIndex.map {
          case (p, i) =>
            (d, i + 1L, p.elementType.orNull, p.categoryDepth, p.text, p.textAsHtml.orNull,
              p.imageUrl.orNull, p.emphasizedContents, p.emphasizedTags,
              p.linkTexts, p.linkUrls)
        }
      }
      .toDF("doc_id", "seq", "raw_type", "category_depth", "raw_text", "text_as_html",
        "image_url", "emphasized_text_contents", "emphasized_text_tags",
        "link_texts", "link_urls")

    val derived = deriveElementType(col("raw_text"))
    val typed = raw.select(
      col("doc_id"), col("seq"),
      coalesce(col("raw_type"), derived).as("element_type"),
      when(col("raw_type").isNull && derived === "ListItem",
        Cleaners.cleanBullets(col("raw_text")))
        .otherwise(col("raw_text")).as("text"),
      when(col("raw_type").isNull && derived === "ListItem", lit(0))
        .when(coalesce(col("raw_type"), derived).isin("Title", "ListItem"),
          col("category_depth"))
        .otherwise(lit(null).cast("int")).as("category_depth"),
      col("text_as_html"), col("image_url"),
      col("emphasized_text_contents"), col("emphasized_text_tags"),
      col("link_texts"), col("link_urls"))
      .filter(col("element_type").isNotNull && col("text") =!= "")
    TextSource.resequence(typed)
  }
}
