package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/**
 * The reference's parametrized cleaner vectors
 * (`test_unstructured/cleaners/test_core.py:8-305`), run through the
 * column-level cleaners exactly as production queries evaluate them.
 */
class CleanersVectorsSpec extends SparkSuiteBase {

  /** Evaluate a cleaner column over one input string. */
  private def run(s: String)(f: Column => Column): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(f(col("t")).as("out")).collect().head.getString(0)
  }

  private def table(cases: Seq[(String, String)], name: String)(f: Column => Column): Unit =
    cases.foreach { case (in, want) =>
      assert(run(in)(f) == want, s"$name(${in.take(40)})")
    }

  test("clean_non_ascii_chars vectors (:8)") {
    table(Seq(
      "This text contains non-ascii characters!" ->
        "This text contains non-ascii characters!",
      "A lovely quote!" -> "A lovely quote!",
      "● An excellent point! ●●●" -> " An excellent point! ",
      "Item 1A" -> "Item1A",
      "Our dog&apos;s bowl." -> "Our dog&apos;s bowl.",
      "5 w=E2=80=99s" -> "5 w=E2=80=99s"), "clean_non_ascii_chars")(
      Cleaners.cleanNonAsciiChars)
  }

  test("clean_bullets vectors (:26) — and through the composite clean()") {
    val cases = Seq(
      "● An excellent point!" -> "An excellent point!",
      "● An excellent point! ●●●" -> "An excellent point! ●●●",
      "An excellent point!" -> "An excellent point!",
      "Morse code! ●●●" -> "Morse code! ●●●",
      "– An EN DASH bullet point!" -> "An EN DASH bullet point!",
      "– Another EN DASH bullet!" -> "Another EN DASH bullet!",
      "Text with – inside" -> "Text with – inside")
    table(cases, "clean_bullets")(Cleaners.cleanBullets)
    table(cases, "clean(bullets=true)")(c => Cleaners.clean(c, bullets = true))
  }

  test("clean_ordered_bullets vectors (:43)") {
    table(Seq(
      "1. Introduction:" -> "Introduction:",
      "a. Introduction:" -> "Introduction:",
      "20.3 Morse code ●●●" -> "Morse code ●●●",
      "5.3.1 Convolutional Networks " -> "Convolutional Networks",
      "D.b.C Recurrent Neural Networks" -> "Recurrent Neural Networks",
      "2.b.1 Recurrent Neural Networks" -> "Recurrent Neural Networks",
      "eins. Neural Networks" -> "eins. Neural Networks",
      "bb.c Feed Forward Neural Networks" -> "Feed Forward Neural Networks",
      "aaa.ccc Metrics" -> "aaa.ccc Metrics",
      " version = 3.8" -> " version = 3.8",
      "1 2. 3 4" -> "1 2. 3 4",
      "1) 2. 3 4" -> "1) 2. 3 4",
      "2,3. Morse code 3. ●●●" -> "2,3. Morse code 3. ●●●",
      "1..2.3 four" -> "1..2.3 four",
      "Fig. 2: The relationship" -> "Fig. 2: The relationship",
      "23 is everywhere" -> "23 is everywhere"), "clean_ordered_bullets")(
      Cleaners.cleanOrderedBullets)
  }

  test("clean_ligatures vectors (:68)") {
    table(Seq(
      "The æther is a classic element." -> "The aether is a classic element.",
      "In old texts, Æsop's fables are" -> "In old texts, AEsop's fables are",
      "The buﬀer zone is there." -> "The buffer zone is there.",
      "The ﬁle was found in the system." -> "The file was found in the system.",
      "She had a ﬂower in her hair." -> "She had a flower in her hair.",
      "The coﬃn was placed in the grave." -> "The coffin was placed in the grave.",
      "The buﬄe zone was clearly marked." -> "The buffle zone was clearly marked.",
      "The craﬅsman worked with dedication." -> "The craftsman worked with dedication.",
      "The symbol ʪ is very rare." -> "The symbol ls is very rare.",
      "The word 'cœur' means 'heart' in French." -> "The word 'coeur' means 'heart' in French.",
      "The word 'Œuvre' refers to the works" -> "The word 'OEuvre' refers to the works",
      "The ȹ symbol is used in some contexts." -> "The qp symbol is used in some contexts.",
      "The poﬆman delivers mail daily." -> "The postman delivers mail daily.",
      "The symbol ʦ can be found in certain alphabets." ->
        "The symbol ts can be found in certain alphabets."), "clean_ligatures")(
      Cleaners.cleanLigatures)
  }

  test("replace_unicode_quotes vectors (:94)") {
    table(Seq(
      "A lovely quote!" -> "“A lovely quote!”",
      "A lovely quote!" -> "‘A lovely quote!’",
      "Our dog&apos;s bowl." -> "Our dog's bowl."), "replace_unicode_quotes")(
      Cleaners.replaceUnicodeQuotes)
  }

  test("remove_punctuation vectors (:124)") {
    table(Seq(
      "“A lovely quote!”" -> "A lovely quote",
      "‘A lovely quote!’" -> "A lovely quote",
      "'()[]{};:'\",.?/\\-_" -> ""), "remove_punctuation")(
      Cleaners.removePunctuation)
  }

  test("clean_extra_whitespace vectors (:136) — and through clean()") {
    val cases = Seq(
      "RISK\n\nFACTORS" -> "RISK FACTORS",
      "Item 1A" -> "Item 1A",
      "  Risk factors " -> "Risk factors",
      "Risk   factors " -> "Risk factors")
    table(cases, "clean_extra_whitespace")(Cleaners.cleanExtraWhitespace)
    table(cases, "clean(extra_whitespace)")(c => Cleaners.clean(c, extraWhitespace = true))
  }

  test("clean_dashes vectors (:150) — and through clean()") {
    val cases = Seq(
      "Risk-factors" -> "Risk factors",
      "Risk – factors" -> "Risk   factors",
      "Risk–factors" -> "Risk factors",
      "Risk factors-–" -> "Risk factors")
    table(cases, "clean_dashes")(Cleaners.cleanDashes)
    table(cases, "clean(dashes)")(c => Cleaners.clean(c, dashes = true))
  }

  test("clean_trailing_punctuation vectors (:164) — and through clean()") {
    val cases = Seq(
      "Item 1A:" -> "Item 1A",
      "Item 1A;" -> "Item 1A",
      "Item 1A." -> "Item 1A",
      "Item 1A," -> "Item 1A",
      "Item, 1A: " -> "Item, 1A")
    table(cases, "clean_trailing_punctuation")(Cleaners.cleanTrailingPunctuation)
    table(cases, "clean(trailing_punctuation)")(
      c => Cleaners.clean(c, trailingPunctuation = true))
  }

  test("clean_prefix vectors (:179)") {
    assert(run("SUMMARY: A great SUMMARY")(
      Cleaners.cleanPrefix(_, "(SUMMARY|DESC):")) == "A great SUMMARY")
    assert(run("DESC: A great SUMMARY")(
      Cleaners.cleanPrefix(_, "(SUMMARY|DESC):")) == "A great SUMMARY")
    assert(run("SUMMARY: A great SUMMARY")(
      Cleaners.cleanPrefix(_, "(SUMMARY|DESC):", strip = false)) == " A great SUMMARY")
    assert(run("summary: A great SUMMARY")(
      Cleaners.cleanPrefix(_, "(SUMMARY|DESC):", ignoreCase = true)) == "A great SUMMARY")
  }

  test("clean_postfix vectors (:192)") {
    assert(run("The END! END")(
      Cleaners.cleanPostfix(_, "(END|STOP)")) == "The END!")
    assert(run("The END! STOP")(
      Cleaners.cleanPostfix(_, "(END|STOP)")) == "The END!")
    assert(run("The END! END")(
      Cleaners.cleanPostfix(_, "(END|STOP)", strip = false)) == "The END! ")
    assert(run("The END! end")(
      Cleaners.cleanPostfix(_, "(END|STOP)", ignoreCase = true)) == "The END!")
  }

  test("composite clean() option matrix (:265)") {
    def cl(s: String, ws: Boolean = false, da: Boolean = false, bu: Boolean = false,
        lc: Boolean = false, tp: Boolean = false): String =
      run(s)(c => Cleaners.clean(c, extraWhitespace = ws, dashes = da, bullets = bu,
        lowercase = lc, trailingPunctuation = tp))
    assert(cl("  Risk-factors ", ws = true, da = true) == "Risk factors")
    assert(cl("● Point!  ●●● ", ws = true, bu = true) ==
      "Point! ●●●")
    assert(cl("Risk- factors ", ws = true, lc = true) == "risk- factors")
    assert(cl("Risk   factors: ", ws = true, tp = true) == "Risk factors")
    assert(cl("● Risk-factors●●● ", da = true, bu = true) ==
      "Risk factors●●●")
    assert(cl("Risk-factors ", da = true, lc = true) == "risk factors")
    assert(cl("Risk-factors: ", da = true, tp = true) == "Risk factors")
    assert(cl("● Point! ●●● ", bu = true, lc = true) ==
      "point! ●●●")
    assert(cl("● Point! ●●●: ", bu = true, tp = true) ==
      "Point! ●●●")
    assert(cl("Risk factors: ", lc = true, tp = true) == "risk factors")
  }
}
