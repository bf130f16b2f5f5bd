package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** The reference's extractor test vectors
  * (`test_unstructured/cleaners/test_extract.py:7-155`). */
class ExtractorsVectorsSpec extends SparkSuiteBase {

  // EMAIL_META_DATA_INPUT (test_extract.py:7-9) — note the literal
  // backslash-n continuation quirks in the original triple-quoted string
  private val emailMeta =
    "from ABC.DEF.local ([ba23::58b5:2236:45g2:88h2]) by\n" +
      "    \n ABC.DEF.local ([68.183.71.12]) with mapi id    " +
      "n 32.88.5467.123; Fri, 26 Mar 2021 11:04:09 +1200"

  private def run(s: String)(f: Column => Column): org.apache.spark.sql.Row = {
    import spark.implicits._
    Seq(s).toDF("t").select(f(col("t")).as("out")).collect().head
  }
  private def runSeq(s: String)(f: Column => Column): Seq[String] =
    run(s)(f).getSeq[String](0)
  private def runStr(s: String)(f: Column => Column): String =
    run(s)(f).getString(0)

  test("extract_text_before with a match index (:22)") {
    val text = "Teacher: BLAH BLAH BLAH; Student: BLAH BLAH BLAH!"
    assert(runStr(text)(Extractors.extractTextBefore(_, "BLAH", index = 1)) ==
      "Teacher: BLAH")
  }

  test("extract_text_after at the first match (:27)") {
    val text = "Teacher: BLAH BLAH BLAH; Student: BLAH BLAH BLAH!"
    assert(runStr(text)(Extractors.extractTextAfter(_, "BLAH;")) ==
      "Student: BLAH BLAH BLAH!")
  }

  test("indexed match out of range yields null, not a wrong span (:12-19)") {
    val text = "BLAH BLAH BLAH"
    assert(run(text)(Extractors.extractTextBefore(_, "BLAH", index = 4)).isNullAt(0))
    assert(run(text)(Extractors.extractTextBefore(_, "BLAH", index = -1)).isNullAt(0))
  }

  test("extract_email_address lowercases and collects all (:32)") {
    assert(runSeq("Im Rabn <Im.Rabn@npf.gov.nr>")(Extractors.extractEmailAddress) ==
      Seq("im.rabn@npf.gov.nr"))
  }

  test("extract_ip_address / _name / mapi_id over the email metadata fixture (:37-52)") {
    assert(runSeq(emailMeta)(Extractors.extractIpAddress) ==
      Seq("ba23::58b5:2236:45g2:88h2", "68.183.71.12"))
    assert(runSeq(emailMeta)(Extractors.extractIpAddressName) ==
      Seq("ABC.DEF.local", "ABC.DEF.local"))
    assert(runSeq(emailMeta)(Extractors.extractMapiId) == Seq("32.88.5467.123"))
  }

  test("extract_datetimetz parses the RFC-2822 date, null when absent (:55-68)") {
    val ts = run(emailMeta)(c =>
      date_format(Extractors.extractDatetimeTz(c), "yyyy-MM-dd HH:mm:ss XXX"))
    // 2021-03-26 11:04:09 +12:00 == 2021-03-25 23:04:09 UTC
    assert(ts.getString(0) == "2021-03-25 23:04:09 Z" ||
      ts.getString(0).startsWith("2021-03-25 23:04:09"))
    assert(run("NO DATE HERE")(Extractors.extractDatetimeTz).isNullAt(0))
  }

  test("extract_us_phone_number vectors (:71)") {
    assert(runStr("215-867-5309")(Extractors.extractUsPhoneNumber) == "215-867-5309")
    assert(runStr("Phone Number: +1 215.867.5309")(Extractors.extractUsPhoneNumber) ==
      "+1 215.867.5309")
    assert(runStr("Phone Number: Just Kidding")(Extractors.extractUsPhoneNumber) == "")
  }

  test("extract_ordered_bullets vectors (:84)") {
    def parts(s: String): (Option[String], Option[String], Option[String]) = {
      val r = run(s)(Extractors.extractOrderedBullets).getStruct(0)
      (Option(r.getString(0)), Option(r.getString(1)), Option(r.getString(2)))
    }
    assert(parts("1. Introduction:") == (Some("1"), None, None))
    assert(parts("a. Introduction:") == (Some("a"), None, None))
    assert(parts("20.3 Morse code ●●●") == (Some("20"), Some("3"), None))
    assert(parts("5.3.1 Convolutional Networks ") == (Some("5"), Some("3"), Some("1")))
    assert(parts("D.b.C Recurrent Neural Networks") == (Some("D"), Some("b"), Some("C")))
    assert(parts("2.b.1 Recurrent Neural Networks") == (Some("2"), Some("b"), Some("1")))
    assert(parts("eins. Neural Networks") == (None, None, None))
    assert(parts("bb.c Feed Forward Neural Networks") == (Some("bb"), Some("c"), None))
    assert(parts("aaa.ccc Metrics") == (None, None, None))
    assert(parts(" version = 3.8") == (None, None, None))
    assert(parts("1 2. 3 4") == (None, None, None))
    assert(parts("1) 2. 3 4") == (None, None, None))
    assert(parts("2,3. Morse code 3. ●●●") == (None, None, None))
    assert(parts("1..2.3 four") == (None, None, None))
    assert(parts("Fig. 2: The relationship") == (None, None, None))
    assert(parts("23 is everywhere") == (None, None, None))
  }

  test("extract_image_urls_from_html vectors (:109)") {
    def urls(s: String): Seq[String] = runSeq(s)(Extractors.extractImageUrlsFromHtml)
    assert(urls("https://my-image.jpg") == Seq("https://my-image.jpg"))
    assert(urls("https://my-image.png with some text") == Seq("https://my-image.png"))
    assert(urls("https://my-image/with/some/path.png") ==
      Seq("https://my-image/with/some/path.png"))
    assert(urls("some text https://my-image.jpg with another http://my-image.bmp") ==
      Seq("https://my-image.jpg", "http://my-image.bmp"))
    assert(urls("http://not-an-image.com") == Seq.empty)
    assert(urls("some text") == Seq.empty)
    assert(urls("some text https://my-image.JPG with another http://my-image.BMP") ==
      Seq("https://my-image.JPG", "http://my-image.BMP"))
    assert(urls("http://my-path-with-CAPS/my-image.JPG") ==
      Seq("http://my-path-with-CAPS/my-image.JPG"))
    assert(urls("http://my-path/my%20image.JPG") == Seq("http://my-path/my%20image.JPG"))
    assert(urls("https://my-image.jpg#ref") == Seq("https://my-image.jpg"))
  }
}
