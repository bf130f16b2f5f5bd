package graft.sources

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import graft.SparkSuiteBase
import graft.functions.Predicates._
import graft.functions.Cleaners.pyStrip
import org.apache.spark.sql.functions._

/**
 * Whole-book golden parity: the REFERENCE `partition_text` output on its own
 * largest text document (book-war-and-peace-1225p.txt, 11,751 elements),
 * pinned by `dev/gen_book_golden.py` as one `category \t sha256(text)[:16]`
 * line per element. Splitting, broken-paragraph grouping and every pre-gate
 * classifier check replay through the engine; the reference side ran with the
 * trivial tokenizer stub (nltk is a network download), under which the
 * narrative sentence-or-verb gate and the title sentence-count gate are
 * constant-true — mirrored below, as documented in the generator.
 */
class BookGoldenSpec extends SparkSuiteBase {

  test("war-and-peace partitions to the reference's exact 11,751-element stream") {
    val sp = spark
    import sp.implicits._
    val text = new String(Files.readAllBytes(
      Paths.get("/root/reference/example-docs/book-war-and-peace-1225p.txt")), "UTF-8")
    val paras = TextSource.splitParagraphs(text)

    val c = col("text")
    // `exceeds_cap_ratio` under the generator's stub: word_tokenize is a
    // whitespace split, tokens filter to `isalpha`, capitalized means
    // istitle-or-isupper (text_type.py:268-303)
    val stubToks = filter(split(c, "\\s+"), w => w.rlike("^\\p{L}+$"))
    val stubCaps = size(filter(stubToks,
      w => w.rlike("^\\p{Lu}(?:\\p{Ll}*|\\p{Lu}*)$")))
    val stubExceedsCap =
      when(isUpperText(c), lit(true))
        .when(size(stubToks) === 0, lit(true))
        .otherwise(stubCaps.cast("double") / size(stubToks).cast("double") > 0.5)
    // the text cascade with the generator's stubbed gates held constant-true
    val stubClassify =
      when(pyStrip(c) === "", "UncategorizedText")
        .when(isBulletedText(c), "ListItem")
        .when(isEmailAddress(c), "EmailAddress")
        .when(isUsCityStateZip(c), "Address")
        .when(isPossibleNumberedList(c), "ListItem")
        .when((length(c) > 0) && !isNumericText(c) &&
          !stubExceedsCap && !underNonAlphaRatio(c, 0.5), "NarrativeText")
        .when((length(c) > 0) &&
          !(isUpperText(c) && regexp_like(c, lit(EndsInPunctPattern))) &&
          (size(split(c, " ")) <= 12) && !underNonAlphaRatio(c, 0.5) &&
          !c.endsWith(",") && !isNumericText(c), "Title")
        .otherwise("UncategorizedText")

    // bulleted ListItems carry clean_bullets(text) (text.py:129); numbered
    // lists and everything else keep the raw paragraph
    val outText = when(isBulletedText(c),
      graft.functions.Cleaners.cleanBullets(c)).otherwise(c)
    val got = paras.toDF("text")
      .select(stubClassify.as("category"), outText.as("text2"), c)
      .collect()
      .map { r =>
        val md = MessageDigest.getInstance("SHA-256")
        val h = md.digest(r.getString(1).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(16)
        s"${r.getString(0)}\t$h"
      }.toSeq

    val want = Files.readAllLines(
      Paths.get("src/test/resources/graft/refvec/book_golden.txt"))
    assert(got.size == want.size, s"element count ${got.size} != ${want.size}")
    val firstDiff = got.zip(want.toArray().map(_.toString)).zipWithIndex
      .find { case ((g, w), _) => g != w }
    val msg = firstDiff.map { case ((g, w), i) =>
      s"first divergence at element $i: got '$g' want '$w' " +
        s"(text: ${paras(i).take(80)})"
    }.getOrElse("")
    assert(firstDiff.isEmpty, msg)
  }
}
