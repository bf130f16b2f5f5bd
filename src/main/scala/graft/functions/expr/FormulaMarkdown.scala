package graft.functions.expr

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `Formula` → markdown serialization with the "auto" display-math heuristic
 * (`staging/base.py:43-164`): wrap in `$$\n...\n$$` only when the raw text
 * scores as notation (LaTeX commands, sub/superscripts, math glyphs,
 * function-like equals) and carries no `$` delimiter; long prose-looking OCR
 * ("was/were/using/where...") needs a higher score. Text emitted inside the
 * block gets the conservative Unicode→LaTeX substitutions (`\times{}` etc.,
 * `{}`-terminated so the next char can't fuse into the command name).
 */
case class FormulaMarkdown(child: Expression, normalize: Boolean = true,
    style: String = FormulaMarkdown.Auto) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "formula_markdown"

  override protected def nullSafeEval(input: Any): Any =
    FormulaMarkdown.render(input.asInstanceOf[UTF8String], normalize, style)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.expr.FormulaMarkdown.render($c, $normalize, "$style")""")

  override protected def withNewChildInternal(newChild: Expression): FormulaMarkdown =
    copy(child = newChild)
}

object FormulaMarkdown {

  // staging/base.py:43-48 — the three formula_markdown_style values
  val Auto = "auto"
  val DisplayMath = "display_math"
  val Plain = "plain"
  private val Styles = Set(Auto, DisplayMath, Plain)

  // staging/base.py:67-82 — order matters only for readability; keys are disjoint
  private val substitutions: Seq[(String, String)] = Seq(
    "−" -> "-", // Unicode minus -> ASCII hyphen-minus
    "×" -> "\\times{}", "÷" -> "\\div{}", "∞" -> "\\infty{}",
    "∈" -> "\\in{}", "∉" -> "\\notin{}", "≤" -> "\\leq{}",
    "≥" -> "\\geq{}", "≈" -> "\\approx{}", "≠" -> "\\neq{}")

  private val latexCmd = Pattern.compile("\\\\[a-zA-Z]+")
  private val subscript = Pattern.compile("_(\\{|[0-9A-Za-z])")
  private val mathGlyph = Pattern.compile("[∈∉≤≥≠≈" +
    "×÷∞∑∫√∂∇]")
  private val vulgarFraction = Pattern.compile("[¼½¾]")
  private val equalsLike =
    Pattern.compile("(?<=[A-Za-z0-9\\)\\]])\\s*=\\s*(?=[A-Za-z0-9\\(\\\\])")
  private val functionEquals = Pattern.compile("(?<=[A-Za-z])\\([^)]*\\)\\s*=\\s*")
  private val proseHint = Pattern.compile(
    "\\b(was|were|using|calculated|where|respectively|determined|following)\\b",
    Pattern.CASE_INSENSITIVE)

  private def count(p: Pattern, s: String): Int = {
    val m = p.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** `_formula_math_signal_score` (base.py:90-114). */
  private[expr] def score(text: String): Int = {
    var s = 0
    if (latexCmd.matcher(text).find()) s += 3
    if (text.contains("^")) s += 1
    if (subscript.matcher(text).find()) s += 1
    s += math.min(count(mathGlyph, text) * 2, 6)
    if (vulgarFraction.matcher(text).find()) s += 1
    s += math.min(count(equalsLike, text), 2)
    if (functionEquals.matcher(text).find()) s += 2
    s
  }

  private def useDisplayMath(raw: String): Boolean =
    if (raw.length >= 80 && proseHint.matcher(raw).find()) score(raw) >= 3
    else score(raw) >= 2

  /** `_emit_formula_markdown` (`staging/base.py:127-163`): `plain` returns the
    * stripped raw text untouched (never normalized); embedded `$` always blocks
    * wrapping; `display_math` wraps whenever safe; `auto` wraps only when the raw
    * text scores as notation. Normalization applies only inside `$$` blocks. */
  def renderString(rawText: String, normalize: Boolean = true,
      style: String = Auto): String = {
    val raw = rawText.strip()
    if (raw.isEmpty) return raw
    val st = style.strip().toLowerCase
    require(Styles.contains(st),
      s"formula_markdown_style must be one of ${Styles.toSeq.sorted.mkString(", ")}, got '$style'")
    if (st == Plain) return raw
    if (raw.contains("$")) return raw // unsafe markdown delimiters
    if (st == Auto && !useDisplayMath(raw)) return raw
    val body =
      if (normalize) substitutions.foldLeft(raw) { case (acc, (k, v)) => acc.replace(k, v) }
      else raw
    s"$$$$\n$body\n$$$$"
  }

  def render(input: UTF8String, normalize: Boolean, style: String): UTF8String =
    UTF8String.fromString(renderString(input.toString, normalize, style))

  def render(input: UTF8String): UTF8String = render(input, normalize = true, Auto)

  def column(c: Column): Column = column(c, normalize = true, Auto)

  def column(c: Column, normalize: Boolean, style: String): Column =
    org.apache.spark.sql.graft.bridge.column(
      FormulaMarkdown(org.apache.spark.sql.graft.bridge.expression(c), normalize, style))
}
