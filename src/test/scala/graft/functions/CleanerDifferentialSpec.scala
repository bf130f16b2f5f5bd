package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuiteBase
import graft.sources.TextSource

/**
 * Differential fuzz harness against the reference cleaner/extractor string
 * library: `dev/gen_cleaner_diff_vectors.py` ran the reference implementations
 * (`cleaners/core.py`, `cleaners/extract.py`) over a seeded adversarial corpus
 * (unicode bullets, ligatures, mojibake, NBSP/NEL whitespace, astral emoji,
 * phone/email/IP shapes, paragraph-grouper layouts) and pinned
 * (function, input, output) rows to `refvec/cleaner_diff.ndjson`. This spec
 * replays every pinned row through the matching `Cleaners`/`Extractors` column
 * or `TextSource` grouper and asserts identical output. Rows where the
 * reference itself raises (empty-input IndexError in `clean_ordered_bullets`,
 * unmatched-pattern UnboundLocalError in `extract_text_before/after`) are out
 * of contract and skipped.
 */
class CleanerDifferentialSpec extends SparkSuiteBase {

  private val vecPath = "src/test/resources/graft/refvec/cleaner_diff.ndjson"

  private val schema = StructType(Seq(
    StructField("fn", StringType),
    StructField("input", StringType),
    StructField("kind", StringType),
    StructField("out", ArrayType(StringType, containsNull = true))))

  private lazy val byFn: Map[String, Vector[(String, String, Vector[Option[String]])]] = {
    val rows = spark.read.schema(schema).json(vecPath).collect()
    rows.toVector
      .map { r =>
        val out =
          if (r.isNullAt(3)) Vector.empty[Option[String]]
          else r.getSeq[String](3).toVector.map(Option(_))
        (r.getString(0), (Option(r.getString(1)).getOrElse(""), r.getString(2), out))
      }
      .groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\n", "\\n").replace("\t", "\\t")
      .replace("\u00a0", "\\xa0").replace("\u0085", "\\x85")

  /** Run a Column function over the fn's pinned inputs in pinned order. */
  private def runColumn(fn: String, expr: Column => Column): Unit = {
    val cases = byFn(fn).filter(_._2 != "error")
    assert(cases.nonEmpty, s"no vectors for $fn")
    import spark.implicits._
    val df = cases.map(_._1).zipWithIndex.toDF("input", "id")
    val got = df.select($"id", expr($"input").as("r")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.get(1)))
      .toMap
    val failures = mutable.ArrayBuffer[String]()
    cases.zipWithIndex.foreach { case ((in, kind, out), i) =>
      val actual = got(i)
      val ok = kind match {
        case "s" => actual != null && actual.toString == out.head.getOrElse("")
        case "l" =>
          val exp = out
          actual match {
            case null => exp.isEmpty
            case s: scala.collection.Seq[_] =>
              s.toVector.map(v => Option(v).map(_.toString)) == exp
            case r: Row => // struct outputs (ordered bullets)
              (0 until r.length).toVector
                .map(j => if (r.isNullAt(j)) None else Some(r.get(j).toString)) == exp
            case other => Vector(Some(other.toString)) == exp
          }
        case "null" => actual == null
        case k => sys.error(s"unknown kind $k")
      }
      if (!ok)
        failures += s"$fn case $i: input <${esc(in.take(60))}> ours <${esc(String.valueOf(actual).take(80))}>" +
          s" theirs <${esc(out.map(_.getOrElse("null")).mkString("|").take(80))}> kind=$kind"
    }
    if (failures.nonEmpty)
      fail(s"${failures.length}/${cases.length} divergences for $fn:\n" +
        failures.take(6).mkString("\n"))
  }

  /** Run a plain String=>String function over the pinned inputs. */
  private def runString(fn: String, f: String => String): Unit = {
    val cases = byFn(fn).filter(_._2 != "error")
    val failures = mutable.ArrayBuffer[String]()
    cases.zipWithIndex.foreach { case ((in, kind, out), i) =>
      val actual = f(in)
      if (!(kind == "s" && actual == out.head.getOrElse("")))
        failures += s"$fn case $i: input <${esc(in.take(60))}> ours <${esc(actual.take(80))}>" +
          s" theirs <${esc(out.map(_.getOrElse("null")).mkString("|").take(80))}>"
    }
    if (failures.nonEmpty)
      fail(s"${failures.length}/${cases.length} divergences for $fn:\n" +
        failures.take(6).mkString("\n"))
  }

  private def runStringSeq(fn: String, f: String => Seq[String]): Unit = {
    val cases = byFn(fn).filter(_._2 != "error")
    val failures = mutable.ArrayBuffer[String]()
    cases.zipWithIndex.foreach { case ((in, kind, out), i) =>
      val actual = f(in).toVector.map(Option(_))
      if (!(kind == "l" && actual == out))
        failures += s"$fn case $i: input <${esc(in.take(60))}> ours <${esc(actual.map(_.getOrElse("null")).mkString("|").take(80))}>" +
          s" theirs <${esc(out.map(_.getOrElse("null")).mkString("|").take(80))}>"
    }
    if (failures.nonEmpty)
      fail(s"${failures.length}/${cases.length} divergences for $fn:\n" +
        failures.take(6).mkString("\n"))
  }

  test("clean_extra_whitespace matches the reference")(
    runColumn("clean_extra_whitespace", Cleaners.cleanExtraWhitespace))
  test("clean_bullets matches the reference")(
    runColumn("clean_bullets", Cleaners.cleanBullets))
  test("clean_ordered_bullets matches the reference")(
    runColumn("clean_ordered_bullets", Cleaners.cleanOrderedBullets))
  test("clean_ligatures matches the reference")(
    runColumn("clean_ligatures", Cleaners.cleanLigatures))
  test("clean_dashes matches the reference")(
    runColumn("clean_dashes", Cleaners.cleanDashes))
  test("clean_trailing_punctuation matches the reference")(
    runColumn("clean_trailing_punctuation", Cleaners.cleanTrailingPunctuation))
  test("clean_non_ascii_chars matches the reference")(
    runColumn("clean_non_ascii_chars", Cleaners.cleanNonAsciiChars))
  test("replace_unicode_quotes matches the reference")(
    runColumn("replace_unicode_quotes", Cleaners.replaceUnicodeQuotes))
  test("remove_punctuation matches the reference")(
    runColumn("remove_punctuation", Cleaners.removePunctuation))
  test("clean composite matches the reference")(
    runColumn("clean_all", c => Cleaners.clean(c, extraWhitespace = true,
      dashes = true, bullets = true, trailingPunctuation = true, lowercase = true)))
  test("clean_prefix matches the reference")(
    runColumn("clean_prefix_summary", c =>
      Cleaners.cleanPrefix(c, "SUMMARY:", ignoreCase = true, strip = true)))
  test("clean_postfix matches the reference")(
    runColumn("clean_postfix_end", c =>
      Cleaners.cleanPostfix(c, "(END|STOP)", ignoreCase = false, strip = true)))

  test("group_broken_paragraphs matches the reference")(
    runString("group_broken_paragraphs", TextSource.groupBrokenParagraphs))
  test("new_line_grouper matches the reference")(
    runString("new_line_grouper", TextSource.newLineGrouper))
  test("blank_line_grouper matches the reference")(
    runString("blank_line_grouper", TextSource.groupBrokenParagraphs))
  test("auto_paragraph_grouper matches the reference")(
    runString("auto_paragraph_grouper", t => TextSource.autoParagraphGrouper(t)))
  test("group_bullet_paragraph matches the reference")(
    runStringSeq("group_bullet_paragraph", TextSource.groupBulletParagraph))

  test("extract_email_address matches the reference")(
    runColumn("extract_email_address", Extractors.extractEmailAddress))
  test("extract_ip_address matches the reference")(
    runColumn("extract_ip_address", Extractors.extractIpAddress))
  test("extract_ip_address_name matches the reference")(
    runColumn("extract_ip_address_name", Extractors.extractIpAddressName))
  test("extract_us_phone_number matches the reference")(
    runColumn("extract_us_phone_number", Extractors.extractUsPhoneNumber))
  test("extract_mapi_id matches the reference")(
    runColumn("extract_mapi_id", Extractors.extractMapiId))
  test("extract_ordered_bullets matches the reference")(
    runColumn("extract_ordered_bullets", Extractors.extractOrderedBullets))
  test("extract_image_urls_from_html matches the reference")(
    runColumn("extract_image_urls_from_html", Extractors.extractImageUrlsFromHtml))
  test("extract_text_before matches the reference")(
    runColumn("extract_text_before_phone", c =>
      Extractors.extractTextBefore(c, "215", strip = true, index = 0)))
  test("extract_text_after matches the reference")(
    runColumn("extract_text_after_bullet", c =>
      Extractors.extractTextAfter(c, "a", strip = true, index = 0)))

  test("replace_mime_encodings matches the reference")(
    runString("replace_mime_encodings_utf8", t => Cleaners.replaceMimeEncodings(t)))
  test("bytes_string_to_string matches the reference")(
    runString("bytes_string_to_string_utf8", t => Cleaners.bytesStringToString(t)))

  // r17: binascii.a2b_qp edge semantics ('==', trailing '=', '=\r' soft
  // breaks, lowercase hex) and the target-charset literal re-encode — pinned
  // across three encodings
  test("replace_mime_encodings (latin-1) matches the reference")(
    runString("replace_mime_encodings_latin1",
      t => Cleaners.replaceMimeEncodings(t, "latin-1")))
  test("replace_mime_encodings (iso-8859-8) matches the reference")(
    runString("replace_mime_encodings_iso8859_8",
      t => Cleaners.replaceMimeEncodings(t, "iso-8859-8")))
  test("bytes_string_to_string (latin-1) matches the reference")(
    runString("bytes_string_to_string_latin1",
      t => Cleaners.bytesStringToString(t, "latin-1")))

  test("mime/bytes error rows raise here too (UnicodeError <-> " +
      "CharacterCodingException, ValueError <-> IllegalArgumentException)") {
    val fns: Map[String, String => String] = Map(
      "replace_mime_encodings_utf8" -> (t => Cleaners.replaceMimeEncodings(t)),
      "replace_mime_encodings_latin1" ->
        (t => Cleaners.replaceMimeEncodings(t, "latin-1")),
      "replace_mime_encodings_iso8859_8" ->
        (t => Cleaners.replaceMimeEncodings(t, "iso-8859-8")),
      "bytes_string_to_string_utf8" -> (t => Cleaners.bytesStringToString(t)),
      "bytes_string_to_string_latin1" ->
        (t => Cleaners.bytesStringToString(t, "latin-1")))
    var checked = 0
    fns.foreach { case (fn, f) =>
      byFn.getOrElse(fn, Vector.empty).filter(_._2 == "error").foreach {
        case (in, _, out) =>
          val e = intercept[Exception](f(in))
          val ok = out.head.getOrElse("") match {
            case "ValueError" => e.isInstanceOf[IllegalArgumentException]
            case _ => e.isInstanceOf[java.nio.charset.CharacterCodingException]
          }
          assert(ok, s"$fn <${esc(in.take(40))}>: expected ${out.head} " +
            s"analogue, got ${e.getClass.getName}")
          checked += 1
      }
    }
    assert(checked == 8) // the corpus pins exactly 8 raising rows
  }

  test("clean_extra_whitespace_with_index_run matches the reference") {
    val cases = byFn("ws_index_run")
    val failures = mutable.ArrayBuffer[String]()
    cases.zipWithIndex.foreach { case ((in, _, out), i) =>
      val (cleaned, moved) = Cleaners.cleanExtraWhitespaceWithIndexRun(in)
      val ours = Vector(Some(cleaned)) ++ moved.toVector.map(v => Some(v.toString))
      if (ours != out)
        failures += s"ws_index_run case $i: input <${esc(in.take(50))}> " +
          s"ours <${esc(ours.take(8).map(_.getOrElse("null")).mkString("|"))}> " +
          s"theirs <${esc(out.take(8).map(_.getOrElse("null")).mkString("|"))}>"
    }
    if (failures.nonEmpty)
      fail(s"${failures.length}/${cases.length} divergences:\n" + failures.take(6).mkString("\n"))
  }

  test("extract_datetimetz matches the reference") {
    import spark.implicits._
    val cases = byFn("extract_datetimetz")
    val df = cases.map(_._1).zipWithIndex.toDF("input", "id")
    val got = df.select($"id",
        Extractors.extractDatetimeTz($"input").cast("string").as("r"))
      .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    cases.zipWithIndex.foreach { case ((in, kind, out), i) =>
      (kind, got(i)) match {
        case ("null", None) => ()
        case ("s", Some(ts)) =>
          val expected = java.time.OffsetDateTime.parse(out.head.get).toInstant
          val actual = java.sql.Timestamp.valueOf(ts).toInstant
          assert(actual == expected, s"case $i <$in>: $actual != $expected")
        case other => fail(s"case $i <$in>: mismatch $other vs kind=$kind ${out}")
      }
    }
  }
}
