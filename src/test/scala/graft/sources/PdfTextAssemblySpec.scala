package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-style proof of the width-aware text assembly: a grid of words is
 * emitted as one `BT … Tm (w) Tj ET` text object PER WORD in a SHUFFLED
 * order, and the assembled text must equal the x,y-sorted reading order —
 * every word present, words spaced within a line, lines in y order, blocks
 * separated on large leading. The shuffle makes the invariant independent of
 * content-stream emission order (pdfminer's line/textbox sort).
 */
class PdfTextAssemblySpec extends AnyFunSuite {

  // 1-byte font whose every code advances 500/1000 em — widths nonEmpty
  // switches extractText into width-aware mode
  private val font = PdfPartitioner.PdfFont(
    toUnicode = Map.empty, twoByte = false, differences = Map.empty,
    widths = (32 to 126).map(c => c -> 500.0).toMap, defaultWidth = 500.0)
  private val fonts = Map("F1" -> font)

  /** Lay out `lineWords` left-to-right per line (3 pt word gaps, 12 pt
    * leading at 10 pt font = same text block), return (per-line content-ops,
    * expected line texts). */
  private def layout(lineWords: Seq[Seq[String]]): (Seq[Seq[String]], Seq[String]) = {
    val ops = lineWords.zipWithIndex.map { case (ws, li) =>
      val y = 700 - 12 * li
      var x = 50.0
      ws.map { w =>
        val op = s"BT /F1 10 Tf 1 0 0 1 $x $y Tm ($w) Tj ET"
        x += w.length * 5.0 + 3.0 // advance 0.5 em/char at 10 pt + 0.3 em gap
        op
      }
    }
    (ops, lineWords.map(_.mkString(" ")))
  }

  test("within-line shuffled emission reassembles into x reading order") {
    // writers reorder runs WITHIN a line (sub/superscripts, style changes);
    // lines themselves are emitted in reading order. Arbitrary cross-line
    // shuffling is deliberately unsupported — full y-bucketing would
    // interleave same-y lines across COLUMNS, which stream order keeps apart.
    val lineWords = Seq(
      Seq("alpha", "beta", "gamma"),
      Seq("delta", "epsilon"),
      Seq("zeta", "eta", "theta", "iota"))
    val (lineOps, expected) = layout(lineWords)
    for (seed <- 1 to 10) {
      val rng = new scala.util.Random(seed)
      val content = lineOps.map(rng.shuffle(_).mkString("\n")).mkString("\n")
      val got = PdfPartitioner.extractText(content, fonts)
      assert(got == expected.mkString("\n"), s"seed $seed")
    }
  }

  test("a leading jump beyond 1.8 em separates text blocks with a blank line") {
    // two 2-line blocks 40 pt apart (4 em at 10 pt)
    val ops = Seq(
      s"BT /F1 10 Tf 1 0 0 1 50 700 Tm (one) Tj ET",
      s"BT /F1 10 Tf 1 0 0 1 50 688 Tm (two) Tj ET",
      s"BT /F1 10 Tf 1 0 0 1 50 648 Tm (three) Tj ET",
      s"BT /F1 10 Tf 1 0 0 1 50 636 Tm (four) Tj ET")
    val got = PdfPartitioner.extractText(ops.mkString("\n"), fonts)
    assert(got == "one\ntwo\n\nthree\nfour")
  }

  test("butted-up segments glue without a space; displaced ones get one") {
    // "wo" starts exactly at the pen end of "hello " -> same word run;
    // "world" at a 5 pt gap -> spaced
    val ops = Seq(
      "BT /F1 10 Tf 1 0 0 1 50 700 Tm (hel) Tj ET",
      "BT /F1 10 Tf 1 0 0 1 65 700 Tm (lo) Tj ET", // 3 chars * 5pt after 50
      "BT /F1 10 Tf 1 0 0 1 80 700 Tm (world) Tj ET") // 5pt gap after "lo"
    assert(PdfPartitioner.extractText(ops.mkString("\n"), fonts) ==
      "hello world")
  }

  test("a baseline wiggle within 0.45 em splices into the line at its x position") {
    // a subscript 2 pt below the baseline, emitted LAST but x-positioned
    // between the words — the x-sort splices it back tight (H2SO, like the
    // H2SO4 journal fixture), not trailing at the line end
    val ops = Seq(
      "BT /F1 10 Tf 1 0 0 1 50 700 Tm (H) Tj ET",
      "BT /F1 10 Tf 1 0 0 1 62 700 Tm (SO) Tj ET",
      "BT /F1 10 Tf 1 0 0 1 56 698 Tm (2) Tj ET") // wiggle dy=2 < 4.5
    assert(PdfPartitioner.extractText(ops.mkString("\n"), fonts) == "H2SO")
  }

  test("a rotation-shaped Tm extracts lines in stream order, words intact") {
    // 90° rotated margin text (`0 1 -1 0 x y Tm`): x-pen geometry would see
    // a zero advance for every glyph — the run must fall back to the legacy
    // stream-order assembly (one line per Tm translation), not emit glyphs
    // as if the matrix were unrotated
    val ops = Seq(
      "BT /F1 10 Tf 0 1 -1 0 30 100 Tm (rotated one) Tj ET",
      "BT /F1 10 Tf 0 1 -1 0 42 100 Tm (rotated two) Tj ET")
    assert(PdfPartitioner.extractText(ops.mkString("\n"), fonts) ==
      "rotated one\nrotated two")
  }

  test("a rotation via cm is detected and confined by q/Q") {
    // a watermark rotated through the CTM between normal paragraphs: the
    // rotated show keeps its own line, and after Q the diagonal geometry
    // (including word spacing) resumes exactly
    val ops = Seq(
      "BT /F1 10 Tf 1 0 0 1 50 700 Tm (before) Tj ET",
      "q 0 1 -1 0 300 0 cm BT /F1 10 Tf 1 0 0 1 0 0 Tm (DRAFT) Tj ET Q",
      "BT /F1 10 Tf 1 0 0 1 50 688 Tm (after) Tj ET",
      "BT /F1 10 Tf 1 0 0 1 85 688 Tm (words) Tj ET")
    assert(PdfPartitioner.extractText(ops.mkString("\n"), fonts) ==
      "before\nDRAFT\nafter words")
  }

  test("a 180° rotation composed from two 90° cm steps is NOT rotation-shaped") {
    // two quarter-turns compose to a diagonal (-1, -1) matrix — the full 2x2
    // composition must see through the intermediate rotation and keep
    // width-aware geometry for the (upside-down but axis-aligned) text
    val ops = Seq(
      "q 0 1 -1 0 0 0 cm 0 1 -1 0 0 0 cm " +
        "BT /F1 10 Tf 1 0 0 1 -100 -700 Tm (upside) Tj ET " +
        "BT /F1 10 Tf 1 0 0 1 -135 -700 Tm (down) Tj ET Q")
    // the mirrored x maps -100 right of -135 in device space; the within-line
    // x-sort reads device order, so "upside" (dev x 100) precedes "down" (135)
    assert(PdfPartitioner.extractText(ops.mkString(""), fonts) ==
      "upside down")
  }

  test("a TJ kern never doubles a space glyph on either side") {
    // a trailing space glyph before the kern, and a leading space glyph
    // after it, each yield exactly ONE separator
    val ops = Seq(
      "BT /F1 10 Tf 1 0 0 1 50 700 Tm [(foo ) -250 (bar)] TJ ET",
      "BT /F1 10 Tf 1 0 0 1 50 688 Tm [(baz) -250 ( qux)] TJ ET")
    assert(PdfPartitioner.extractText(ops.mkString("\n"), fonts) ==
      "foo bar\nbaz qux")
  }

  test("a TJ kern before the first show displaces the placed pen") {
    // the -600 (0.6 em = 6 pt) leading kern pushes "two" 6 pt PAST the end
    // of "one" — a word gap. Applying the kern to the stale pen and letting
    // place() overwrite it would glue the words instead.
    val ops = Seq(
      "BT /F1 10 Tf 1 0 0 1 50 700 Tm [(one)] TJ ET",
      "BT /F1 10 Tf 1 0 0 1 65 700 Tm [-600 (two)] TJ ET")
    assert(PdfPartitioner.extractText(ops.mkString("\n"), fonts) == "one two")
  }
}
