package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Repetition- and rule-based corpus quality filters — the standard
 * LLM-training-data cleaning passes published with Gopher/MassiveText
 * (Rae et al. 2021, "Scaling Language Models", appendix A1.1) and C4
 * (Raffel et al. 2020, "Exploring the Limits of Transfer Learning", §2.2).
 * The reference engine stops at per-document quality scoring; a 100 TB
 * pre-training pipeline also prunes by intra-document repetition and
 * line-level heuristics before dedup.
 *
 * Scale shape: [[repetitionSignals]] computes every n-gram order in ONE
 * explode pass — grams for n=2..7 are tagged and unioned per row, so the
 * whole stat family costs one shuffle on `(doc_id, n, gram)` plus one
 * per-doc reduce, with map-side partial aggregation throughout; nothing is
 * ever pairwise. [[c4LineFilter]] is a pure higher-order-function column
 * (whole-stage codegen, no shuffle at all).
 */
object QualityFilters {

  /** Exact fraction formulas (documented because published variants differ):
    *  - `dup_line_frac`      = occurrences of non-unique lines / all lines
    *  - `dup_line_char_frac` = chars in non-unique line occurrences / chars in all lines
    *  - `top_<n>gram_frac`   = count*len of the most frequent n-gram / sum(count*len)
    *                           (ties broken by count, then gram length, then gram text)
    *  - `dup_<n>gram_frac`   = sum(count*len) over n-grams seen more than once /
    *                           sum(count*len) over all n-grams
    * All rounded to 4 places; a doc with no grams (or no lines) reports null.
    * Unlike Gopher's positional char accounting, repeated-occurrence chars
    * count every occurrence — deterministic and one-pass, same decision power.
    */
  def repetitionSignals(d: DataFrame, text: Column, lineSep: String): DataFrame =
    repetitionSignalsWith(d, text, lineSep, Nil)

  /** [[repetitionSignals]] carrying extra PER-ROW columns of `d` through the
    * final doc-id join — a composed decision (e.g. [[pruneDecision]]) rides
    * its pure columns on the join repetitionSignals already pays instead of
    * re-scanning `d` and joining a second per-doc frame. */
  private[graft] def repetitionSignalsWith(d: DataFrame, text: Column,
      lineSep: String, extra: Seq[Column]): DataFrame = {
    val topNs = Seq(2, 3, 4)
    val dupNs = Seq(5, 6, 7)

    // ONE tagged explode feeds every stat family: n=1 rows are the trimmed
    // raw lines, n>=2 rows the lowercased n-grams. The whole computation is
    // explode -> groupBy(doc,n,token) -> groupBy(doc,n) -> groupBy(doc) ->
    // one left join back to the doc ids — 4 shuffles total regardless of how
    // many n-gram orders are measured.
    val lines = transform(
      filter(transform(split(text, java.util.regex.Pattern.quote(lineSep)),
        l => trim(l)), l => l =!= ""),
      l => struct(lit(1).as("n"), l.as("g")))
    // ONE word split for all six shingle orders: the per-order wordShingles
    // calls each re-ran words(lower(text)) — six regex splits per row inside
    // one expression, invisible to subexpression elimination because each
    // sits under its own HOF lambda
    val gramArrays = TextAnalysis.letCol(TextAnalysis.words(lower(text))) {
      ws =>
        concat((topNs ++ dupNs).map { n =>
          transform(TextAnalysis.shinglesOfWords(ws, n),
            g => struct(lit(n).as("n"), g.as("g")))
        }: _*)
    }
    val counts = d.select(col("doc_id"), explode(concat(lines, gramArrays)).as("x"))
      .select(col("doc_id"), col("x.n").as("n"), col("x.g").as("g"))
      .groupBy("doc_id", "n", "g").agg(count(lit(1)).as("c"))

    def nullIfZero(c: Column): Column = when(c === 0, lit(null)).otherwise(c)
    val perN = counts.groupBy("doc_id", "n").agg(
      max(struct(col("c"), length(col("g")).as("l"), col("g").as("g"))).as("top"),
      sum(col("c")).as("cnt_tot"),
      sum(when(col("c") > 1, col("c")).otherwise(0L)).as("cnt_dup"),
      sum(col("c") * length(col("g"))).as("tot"),
      sum(when(col("c") > 1, col("c") * length(col("g"))).otherwise(0L)).as("dup"))
      .select(col("doc_id"), col("n"), col("cnt_tot"),
        round(col("cnt_dup").cast("double") / col("cnt_tot").cast("double"), 4)
          .as("cntf"),
        round((col("top.c") * col("top.l")).cast("double") /
          nullIfZero(col("tot")).cast("double"), 4).as("topf"),
        round(col("dup").cast("double") / nullIfZero(col("tot")).cast("double"), 4)
          .as("dupf"))

    val wideCols =
      Seq(max(when(col("n") === 1, col("cnt_tot"))).as("n_lines"),
        max(when(col("n") === 1, col("cntf"))).as("dup_line_frac"),
        max(when(col("n") === 1, col("dupf"))).as("dup_line_char_frac")) ++
        topNs.map(n => max(when(col("n") === n, col("topf"))).as(s"top_${n}gram_frac")) ++
        dupNs.map(n => max(when(col("n") === n, col("dupf"))).as(s"dup_${n}gram_frac"))
    val wide = perN.groupBy("doc_id").agg(wideCols.head, wideCols.tail: _*)

    d.select(col("doc_id") +: extra: _*).join(wide, Seq("doc_id"), "left")
  }

  /** The composed corpus-prune decision a Gopher/C4-style pipeline applies
    * before dedup: repetition ceilings + document flags + at least one
    * C4-clean line. Null signals (doc too small to measure) pass the
    * repetition gates — tiny docs are pruned by other floors, not these.
    * Returns `doc_id, repetitive, flagged, no_clean_lines, keep`. */
  def pruneDecision(d: DataFrame, text: Column, lineSep: String,
      maxDupLineFrac: Double = 0.30, maxTop2gramFrac: Double = 0.20,
      maxDup5gramFrac: Double = 0.15): DataFrame = {
    val rep = repetitionSignalsWith(d, text, lineSep,
      Seq(c4LineFilter(text, lineSep).as("f")))
    val repetitive =
      coalesce(col("dup_line_frac"), lit(0.0)) > maxDupLineFrac ||
        coalesce(col("top_2gram_frac"), lit(0.0)) > maxTop2gramFrac ||
        coalesce(col("dup_5gram_frac"), lit(0.0)) > maxDup5gramFrac
    val flagged = col("f.has_lorem") || col("f.has_brace")
    val noClean = col("f.n_kept") === 0
    rep.select(col("doc_id"),
        repetitive.as("repetitive"),
        flagged.as("flagged"),
        noClean.as("no_clean_lines"),
        (!repetitive && !flagged && !noClean).as("keep"))
  }

  /**
   * The Gopher document-level quality rules (Rae et al. 2021 Appendix A1.1)
   * — the half of the Gopher filter [[repetitionSignals]] doesn't cover:
   * word-count bounds, mean word length in [3, 10], symbol-to-word ratio
   * ('#', '...', '…') <= 0.1, <= 90% of lines bullet-started, <= 30%
   * ellipsis-ended, >= 80% of words containing an alphabetic char, and >= 2
   * hits from the 8-word stopword probe. All pure per-row columns over
   * let-bound word/line arrays — no shuffle, no UDF; ratios round to 6
   * decimals for stable cross-engine hashing. Returns
   * `struct(n_words, mean_word_len, symbol_ratio, bullet_line_frac,
   * ellipsis_line_frac, alpha_word_frac, n_stop_hits, keep)`.
   */
  def gopherRules(text: Column, minWords: Int = 50,
      maxWords: Int = 100000): Column = {
    import TextAnalysis.letCol
    val stopProbe = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    letCol(TextAnalysis.words(text)) { ws =>
      letCol(filter(transform(split(text, "\n"), l => trim(l)),
          l => l =!= "")) { lines =>
        letCol(transform(ws, w => lower(w))) { lws =>
          val nWords = size(ws)
          val nLines = size(lines)
          val meanLen = when(nWords > 0,
            aggregate(ws, lit(0L), (a, w) => a + length(w)).cast("double") / nWords)
            .otherwise(lit(0.0))
          def removed(pat: String, width: Int): Column =
            (length(text) - length(regexp_replace(text, pat, ""))) / lit(width)
          val symbols = removed("#", 1) + removed("\\.\\.\\.", 3) + removed("…", 1)
          val symbolRatio =
            when(nWords > 0, symbols / nWords).otherwise(lit(0.0))
          val bulletFrac = when(nLines > 0,
            size(filter(lines, l => l.rlike("^[-•*‣▪]"))).cast("double") / nLines)
            .otherwise(lit(0.0))
          val ellipsisFrac = when(nLines > 0,
            size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$"))).cast("double") /
              nLines).otherwise(lit(0.0))
          val alphaFrac = when(nWords > 0,
            size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double") / nWords)
            .otherwise(lit(0.0))
          val stopHits = stopProbe
            .map(sw => when(array_contains(lws, sw), 1).otherwise(0))
            .reduce(_ + _)
          val keep = nWords >= minWords && nWords <= maxWords &&
            meanLen >= 3.0 && meanLen <= 10.0 &&
            symbolRatio <= 0.1 && bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
            alphaFrac >= 0.8 && stopHits >= 2
          struct(
            nWords.cast("int").as("n_words"),
            round(meanLen, 6).as("mean_word_len"),
            round(symbolRatio, 6).as("symbol_ratio"),
            round(bulletFrac, 6).as("bullet_line_frac"),
            round(ellipsisFrac, 6).as("ellipsis_line_frac"),
            round(alphaFrac, 6).as("alpha_word_frac"),
            stopHits.cast("int").as("n_stop_hits"),
            keep.as("keep"))
        }
      }
    }
  }

  /** C4's line-level cleaning (Raffel et al. 2020 §2.2) as one codegen'd
    * column: keep lines that end in terminal punctuation (optionally followed
    * by a closing quote), have at least 3 words, and do not mention
    * "javascript"; flag documents containing "lorem ipsum" or a curly brace.
    * Returns `struct(n_lines, n_kept, kept_text, has_lorem, has_brace)`. */
  def c4LineFilter(text: Column, lineSep: String): Column = {
    // lines is referenced once directly and once under kept, kept twice —
    // let-bound so interpreted HOF eval splits/filters the document once
    // (see TextAnalysis.letCol)
    val linesExpr = filter(transform(split(text, java.util.regex.Pattern.quote(lineSep)),
      l => trim(l)), l => l =!= "")
    TextAnalysis.letCol(linesExpr) { lines =>
      val keptExpr = filter(lines, t =>
        t.rlike("[.!?][\"”']?$") &&
          size(filter(split(t, "\\s+"), w => w =!= "")) >= 3 &&
          !lower(t).contains("javascript"))
      TextAnalysis.letCol(keptExpr) { kept =>
        struct(
          size(lines).as("n_lines"),
          size(kept).as("n_kept"),
          array_join(kept, "\n").as("kept_text"),
          lower(text).contains("lorem ipsum").as("has_lorem"),
          text.contains("{").as("has_brace"))
      }
    }
  }
}
