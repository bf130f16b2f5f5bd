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
case class FormulaMarkdown(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "formula_markdown"

  override protected def nullSafeEval(input: Any): Any =
    FormulaMarkdown.render(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.FormulaMarkdown.render($c)")

  override protected def withNewChildInternal(newChild: Expression): FormulaMarkdown =
    copy(child = newChild)
}

object FormulaMarkdown {

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

  /** `_emit_formula_markdown` with the default auto style + normalization. */
  def renderString(rawText: String): String = {
    val raw = rawText.strip()
    if (raw.isEmpty) return raw
    if (raw.contains("$")) return raw // unsafe markdown delimiters
    if (!useDisplayMath(raw)) return raw
    val body = substitutions.foldLeft(raw) { case (acc, (k, v)) => acc.replace(k, v) }
    s"$$$$\n$body\n$$$$"
  }

  def render(input: UTF8String): UTF8String =
    UTF8String.fromString(renderString(input.toString))

  def column(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      FormulaMarkdown(org.apache.spark.sql.graft.bridge.expression(c)))
}
