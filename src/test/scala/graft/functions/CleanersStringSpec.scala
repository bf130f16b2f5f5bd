package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TextSource

/**
 * Behavior tests for the string-level (parser-side) cleaners, ported from
 * `/root/reference/test_unstructured/cleaners/test_core.py`.
 *
 * File mapping (20 reference fns): every `test_core.py` case is pinned —
 * the per-cleaner vector tables and the composite `clean()` option matrix
 * live in `CleanersVectorsSpec` (column-level, through the codegen'd
 * expressions); mime-encoding charsets, byte repair, paragraph/bullet
 * grouping (default and custom `paragraph_split`) here.
 */
class CleanersStringSpec extends AnyFunSuite {

  // --- replace_mime_encodings (test_core.py:106-126) -------------------------------

  test("replace_mime_encodings decodes utf-8 escapes") {
    assert(Cleaners.replaceMimeEncodings("5 w=E2=80=99s") == "5 w’s")
  }

  test("replace_mime_encodings honors latin-1") {
    assert(Cleaners.replaceMimeEncodings("5 w=E2=80-99s=E2=80-92", "latin-1")
      == "5 wâ-99sâ-92")
  }

  test("replace_mime_encodings honors right-to-left charsets") {
    assert(Cleaners.replaceMimeEncodings("=EE=E0=E9=E4", "iso-8859-8")
      == "מאיה")
  }

  // --- bytes_string_to_string (test_core.py:303-305) -------------------------------

  test("bytes_string_to_string repairs latin-1-misdecoded utf-8") {
    val text = "æ¯æ¥æ°é»"
    assert(Cleaners.bytesStringToString(text) == "每日新闻")
  }

  // --- group_broken_paragraphs (test_core.py:205-217) ------------------------------

  test("group_broken_paragraphs merges line-broken paragraphs") {
    val text = "The big red fox\nis walking down the lane.\n\n" +
      "At the end of the lane\nthe fox met a friendly bear."
    assert(TextSource.groupBrokenParagraphs(text)
      == "The big red fox is walking down the lane.\n\n" +
        "At the end of the lane the fox met a friendly bear.")
  }

  test("group_broken_paragraphs keeps all-short-line blocks split") {
    val text = "Apache License\nVersion 2.0, January 2004\nhttp://www.apache.org/licenses/"
    assert(TextSource.groupBrokenParagraphs(text)
      == "Apache License\n\nVersion 2.0, January 2004\n\nhttp://www.apache.org/licenses/")
  }

  // --- test_group_broken_paragraphs_non_default_settings (test_core.py:220) --------
  test("group_broken_paragraphs accepts a custom paragraph_split pattern") {
    // paragraphs separated by THREE newline runs; single blank lines are
    // in-paragraph formatting under the custom split
    val text = "The big red fox\n\nis walking down the lane.\n\n\n" +
      "At the end of the lane\n\nthe fox met a friendly bear."
    val paraSplit = java.util.regex.Pattern.compile("(\\s*\\n\\s*){3}")
    val lineSplit = java.util.regex.Pattern.compile(
      // PARAGRAPH_PATTERN_RE, as the reference test leaves line_split default
      "((?:" + graft.functions.Cleaners.BulletsPattern + ")|" +
        graft.functions.Cleaners.PySpaceClass + "*\\n" +
        graft.functions.Cleaners.PySpaceClass + "*)" +
        "(?!" + graft.functions.Cleaners.BulletsPattern + "|$)")
    assert(TextSource.groupBrokenParagraphs(text, lineSplit, paraSplit)
      == "The big red fox is walking down the lane.\n\n" +
        "At the end of the lane the fox met a friendly bear.")
  }

  // --- group_bullet_paragraph (test_core.py:241-262) -------------------------------

  test("group_bullet_paragraph splits at bullets and rejoins wrapped lines") {
    val text = "○The big red fox\nis walking down the lane.\n\n" +
      "○At the end of the lane\nthe fox met a friendly bear."
    assert(TextSource.groupBulletParagraph(text) == Seq(
      "○The big red fox is walking down the lane. ",
      "○At the end of the lane the fox met a friendly bear."))
  }

  test("group_bullet_paragraph substitutes OCR e-bullets") {
    val text = "e The big red fox\nis walking down the lane.\n\n" +
      "e At the end of the lane\nthe fox met a friendly bear."
    assert(TextSource.groupBulletParagraph(text) == Seq(
      "· The big red fox is walking down the lane. ",
      "· At the end of the lane the fox met a friendly bear."))
  }

  // --- auto_paragraph_grouper routing (core.py:233-268) ----------------------------

  test("auto grouper routes low newline-ratio text to the new-line grouper") {
    val text = "line one alpha beta gamma\nline two delta epsilon zeta\nline three"
    // each LINE_BREAK_RE piece keeps its trailing \n (lookbehind split), so the
    // blank-line join yields THREE newlines between lines — reference-verified
    assert(TextSource.autoParagraphGrouper(text)
      == "line one alpha beta gamma\n\n\nline two delta epsilon zeta\n\n\nline three")
  }

  test("auto grouper routes blank-line text to the broken-paragraph grouper") {
    val text = "aa bb cc dd ee ff\nwrapped tail line one two\n\ngg hh ii"
    assert(TextSource.autoParagraphGrouper(text)
      == "aa bb cc dd ee ff wrapped tail line one two\n\ngg hh ii")
  }

  // --- clean_extra_whitespace_with_index_run (test_core.py docstring example) ------

  test("index run collapses whitespace and reports moved indices") {
    val (cleaned, moved) = Cleaners.cleanExtraWhitespaceWithIndexRun("ITEM 1.     BUSINESS")
    assert(cleaned == "ITEM 1. BUSINESS")
    assert(moved.toSeq == (Seq.fill(8)(0L) ++ Seq.fill(12)(4L)))
    assert(Cleaners.indexAdjustmentAfterCleanExtraWhitespace(8, moved) == 4L)
  }

  test("index run handles nbsp and newline like spaces") {
    val (cleaned, moved) = Cleaners.cleanExtraWhitespaceWithIndexRun("a \nb")
    assert(cleaned == "a b")
    assert(moved.toSeq == Seq(0L, 0L, 1L, 1L))
  }

  // --- translate_text stub ----------------------------------------------------------

  test("translate_text short-circuits same language and is deterministic otherwise") {
    assert(Cleaners.translateText("hola", "es", "es") == "hola")
    assert(Cleaners.translateText("  ", "es", "en") == "  ")
    val a = Cleaners.translateText("hola", "es", "en")
    assert(a == Cleaners.translateText("hola", "es", "en") && a.contains("hola"))
  }
}
