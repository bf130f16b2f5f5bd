package graft.functions.expr

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native language-ID kernels. The columnar formulation (7 × `size(filter(split(...)))`
 * higher-order-function trees + 9 `regexp_count` script probes per row) evaluates the
 * HOF lambdas interpreted and re-splits the text once per language; these expressions
 * do the same work in one compiled pass per row.
 *
 * Semantics are bit-identical to the columnar versions they replace (and to the DuckDB
 * oracle mirrors): tokens are maximal runs of non-`\s` characters (Java regex `\s` =
 * `[ \t\n\x0B\f\r]`, exactly what `split(c, "\\s+")` produces), matched lowercase
 * against the per-language stopword lists in [[graft.functions.TextAnalysis]].
 */
object LangStopwordVotes {

  /** Language order is normative: eng, spa, deu, fra, ita, por, nld — the vote
    * tie-break in `detectLanguages` resolves by first index reaching the max. */
  def lists: Seq[Seq[String]] = {
    val T = graft.functions.TextAnalysis
    Seq(T.StopwordsEn, T.StopwordsEs, T.StopwordsDe, T.StopwordsFr,
      T.StopwordsIt, T.StopwordsPt, T.StopwordsNl)
  }

  val NumLangs: Int = 7

  /** token (lowercase) -> indices of languages whose stopword list contains it
    * (lists overlap: "de" is Spanish, French and Dutch). */
  private val memberOf: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    lists.zipWithIndex.foreach { case (sw, i) =>
      sw.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  private def isSep(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' || ch == '\f' || ch == '\r'

  /** One pass: per-language stopword hit counts (multiplicity preserved). */
  def votes(s: String): Array[Int] = {
    val out = new Array[Int](NumLangs)
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && isSep(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isSep(s.charAt(i))) i += 1
        // only lowercase + lookup tokens short enough to be stopwords (max 5 chars
        // across the lists; lowercasing never lengthens past 2x)
        if (i - start <= 8) {
          val langs = memberOf.get(s.substring(start, i).toLowerCase(Locale.ROOT))
          if (langs != null) {
            var k = 0
            while (k < langs.length) { out(langs(k)) += 1; k += 1 }
          }
        }
      }
    }
    out
  }

  def votesData(s: UTF8String): ArrayData =
    new GenericArrayData(votes(s.toString).map(Integer.valueOf))

  /** Whitespace token count — mirrors `size(filter(split(c, "\\s+"), _ != ""))`. */
  def tokenCount(s: String): Int = {
    var count = 0
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && isSep(s.charAt(i))) i += 1
      if (i < n) {
        count += 1
        while (i < n && !isSep(s.charAt(i))) i += 1
      }
    }
    count
  }
}

/** `ARRAY<INT>` of stopword hit counts, one per language in
  * [[LangStopwordVotes.lists]] order — one compiled tokenize pass. */
case class LangStopwordVotes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lang_stopword_votes"

  override protected def nullSafeEval(input: Any): Any =
    LangStopwordVotes.votesData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.LangStopwordVotes.votesData($c)")

  override protected def withNewChildInternal(newChild: Expression): LangStopwordVotes =
    copy(child = newChild)
}

/**
 * The full `detect_languages` "auto" cascade
 * (`/root/reference/unstructured/partition/common/lang.py:412-505`, re-expressed
 * deterministically — see [[graft.functions.TextAnalysis.detectLanguages]] for the
 * semantics derivation) as one native expression: a single scan classifies the
 * non-Latin scripts (kana before han so Japanese isn't misread as Chinese) and the
 * ASCII short-text default; a single tokenize pass takes the 7-language stopword
 * vote. Returns null for (space-)blank text, matching `trim(c) === ""`.
 */
case class DetectLanguage(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "detect_language"

  override protected def nullSafeEval(input: Any): Any =
    DetectLanguage.detect(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.expr.DetectLanguage.detect($c.toString());
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): DetectLanguage =
    copy(child = newChild)
}

object DetectLanguage {

  private val codes: Array[UTF8String] =
    Array("eng", "spa", "deu", "fra", "ita", "por", "nld").map(UTF8String.fromString)
  private val und = UTF8String.fromString("und")
  private val jpn = UTF8String.fromString("jpn")
  private val kor = UTF8String.fromString("kor")
  private val zho = UTF8String.fromString("zho")
  private val rus = UTF8String.fromString("rus")
  private val ara = UTF8String.fromString("ara")
  private val hin = UTF8String.fromString("hin")
  private val ell = UTF8String.fromString("ell")
  private val heb = UTF8String.fromString("heb")
  private val tha = UTF8String.fromString("tha")
  private val eng = UTF8String.fromString("eng")

  def detect(s: String): UTF8String = {
    val n = s.length
    // space-trim blank check (Spark `trim` strips 0x20 only)
    var a = 0
    while (a < n && s.charAt(a) == ' ') a += 1
    if (a == n) return null

    // single scan: script presence flags + all-ASCII
    var kana, hangul, han, cyr, arab, deva, greek, hebr, thai = false
    var ascii = true
    var i = 0
    while (i < n) {
      val ch = s.charAt(i)
      if (ch > '\u007F') {
        ascii = false
        if (ch >= '\u3040' && ch <= '\u30FF') kana = true
        else if (ch >= '\uAC00' && ch <= '\uD7AF') hangul = true
        else if (ch >= '\u4E00' && ch <= '\u9FFF') han = true
        else if (ch >= '\u0400' && ch <= '\u04FF') cyr = true
        else if (ch >= '\u0600' && ch <= '\u06FF') arab = true
        else if (ch >= '\u0900' && ch <= '\u097F') deva = true
        else if (ch >= '\u0370' && ch <= '\u03FF') greek = true
        else if (ch >= '\u0590' && ch <= '\u05FF') hebr = true
        else if (ch >= '\u0E00' && ch <= '\u0E7F') thai = true
      }
      i += 1
    }
    if (kana) return jpn
    if (hangul) return kor
    if (han) return zho
    if (cyr) return rus
    if (arab) return ara
    if (deva) return hin
    if (greek) return ell
    if (hebr) return heb
    if (thai) return tha
    if (ascii && LangStopwordVotes.tokenCount(s) < 5) return eng

    val votes = LangStopwordVotes.votes(s)
    var max = 0
    i = 0
    while (i < votes.length) { if (votes(i) > max) max = votes(i); i += 1 }
    if (max == 0) return und
    i = 0
    while (votes(i) != max) i += 1
    codes(i)
  }
}
