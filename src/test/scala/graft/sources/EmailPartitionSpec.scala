package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuiteBase

/** `partition_email` behavior ports (`test_unstructured/partition/test_email.py`)
  * against the reference's real eml fixtures. */
class EmailPartitionSpec extends SparkSuiteBase {

  private def eml(name: String): String =
    Encodings.decodeText(
      Files.readAllBytes(Paths.get(s"/root/reference/example-docs/eml/$name")))

  private def partitioned(name: String, contentSource: String = "text/html") =
    Partitioners.partitionEmail(eml(name), contentSource)._2

  private def typed(name: String): Seq[(String, String)] = {
    val dir = Files.createTempDirectory("graft-eml").toString
    Files.copy(Paths.get(s"/root/reference/example-docs/eml/$name"),
      Paths.get(dir, name))
    AutoSource.partitionFiles(spark, dir)
      .select("seq", "element_type", "text")
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
  }

  // -- DescribeEmailPartitioningContext.body_part (:437-459) --
  test("html body preferred by default; text/plain preferred when requested") {
    val htmlFirst = partitioned("mime-different-plain-html.eml")
    assert(htmlFirst.map(_.text).mkString(" ").contains("text/html part"),
      s"default should take the HTML body: ${htmlFirst.map(_.text)}")
    val plainFirst = partitioned("mime-different-plain-html.eml", "text/plain")
    assert(plainFirst.head.text.startsWith("This is the text/plain part"),
      s"content_source=text/plain should take the plain body: ${plainFirst.map(_.text)}")
  }

  // -- test_partition_email_from_filename_can_partition_an_RFC_822_email (:39) --
  test("RFC-822 plain email partitions to three NarrativeTexts") {
    val out = typed("simple-rfc-822.eml")
    assert(out.size == 3)
    assert(out.forall(_._1 == "NarrativeText"))
    assert(out.head._2 == "This is an RFC 822 email message.")
    assert(out(2)._2.startsWith("The structure ensures compatibility"))
  }

  // -- EXPECTED_OUTPUT (:31) via the default html body path --
  test("fake-email.eml yields the canonical four elements") {
    val out = typed("fake-email.eml")
    assert(out.map(_._2) == Seq(
      "This is a test email to use for unit tests.",
      "Important points:",
      "Roses are red",
      "Violets are blue"))
    assert(out(2)._1 == "ListItem" && out(3)._1 == "ListItem")
  }

  // -- test_partition_email_can_partition_an_HTML_only_email_... (:71) --
  test("HTML-only email with base64 ISO-8859-1 charset decodes cleanly") {
    val texts = partitioned("mime-html-only.eml").map(_.text)
    assert(texts.head == "This is a text/html part.")
    assert(texts.exists(_.contains("proposed by Scott Fahlman in 1982")))
    assert(texts.exists(_.contains("launched by Google in 2004")))
  }

  // -- test_extract_email_from_text_plain_matches_elements_extracted_from_text_html (:85) --
  test("text/plain and text/html content sources agree on fake-email") {
    // the plain path's bullet strip happens in the downstream classifier
    // cascade; mirror it here at string level (same as the reference, where
    // partition_text's ListItem branch runs clean_bullets)
    val fromHtml = partitioned("fake-email.eml", "text/html").map(_.text)
    val fromPlain = partitioned("fake-email.eml", "text/plain")
      .map(p => graft.functions.Cleaners.cleanBulletsStr(p.text))
    assert(fromHtml == fromPlain)
    assert(fromHtml == Seq("This is a test email to use for unit tests.",
      "Important points:", "Roses are red", "Violets are blue"))
  }

  // -- test_partition_email_partitions_an_HTML_part_with_Base64_encoded_UTF_8 (:104) --
  test("base64 UTF-8 HTML part matches the plain fake-email output") {
    assert(partitioned("fake-email-b64.eml").map(_.text) ==
      partitioned("fake-email.eml").map(_.text))
  }

  // -- ..._a_text_plain_part_with_Base64_encoded_windows_1255_charset (:108) --
  test("base64 windows-1255 plain part decodes to Hebrew, not mojibake") {
    val texts = partitioned("email-no-utf8-2008-07-16.062410.eml", "text/plain")
      .map(_.text)
    assert(texts.nonEmpty)
    assert(texts.exists(_.contains("אני חושב שזה לא יהיה מקצועי והוגן")))
    assert(!texts.exists(_.contains("�")))
  }

  // -- ..._an_html_part_with_quoted_printable_encoded_ISO_8859_1_charset (:118) --
  test("quoted-printable ISO-8859-1 HTML part yields the Google table") {
    val paras = partitioned("email-no-utf8-2014-03-17.111517.eml", "text/html")
    assert(paras.nonEmpty)
    val all = paras.map(_.text).mkString(" ")
    assert(all.contains("Hi Slava"))
    assert(all.contains("The password for your Google"))
  }

  // -- edge cases (:133-158) --
  test("whitespace-only, bodyless, and encrypted emails yield no elements") {
    assert(partitioned("empty.eml").isEmpty)
    assert(partitioned("mime-no-body.eml").isEmpty)
    assert(partitioned("fake-encrypted.eml").isEmpty)
  }

  test("content-disposition inline body is still found") {
    val texts = partitioned("email-inline-content-disposition.eml").map(_.text)
    assert(texts == Seq("This is a test of inline"))
  }

  private def meta(name: String) = Partitioners.partitionEmail(eml(name))._1

  // -- test_partition_email_augments_message_body_elements_with_email_metadata (:182) --
  // -- test_partition_email_round_trips_via_json (test_email.py): elements
  // WITH their email-specific metadata (sent_from/sent_to/subject/message
  // id) survive the JSON wire format unchanged --
  test("email elements round-trip through JSON with their email metadata") {
    val sp = graft.SparkSuiteBase.session
    import sp.implicits._
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Path.of("/root/reference/example-docs/fake-email.eml")),
      java.nio.charset.StandardCharsets.UTF_8)
    val (meta, paras) = Partitioners.partitionEmail(raw)
    assert(meta.sentFrom.nonEmpty && meta.subject.isDefined)
    val before = paras.zipWithIndex.map { case (p, i) =>
      graft.model.Element(s"e$i", p.elementType.getOrElse("NarrativeText"),
        p.text, "fake-email.eml", i.toLong + 1,
        graft.model.ElementMetadata.empty.copy(
          filename = Some("fake-email.eml"),
          sent_from = Some(meta.sentFrom), sent_to = Some(meta.sentTo),
          subject = meta.subject, email_message_id = meta.messageId))
    }
    val json = "[" + graft.sinks.ElementSink.toNdjson(before.toDS())
      .collect().mkString(",") + "]"
    val back = graft.sinks.ElementSink.partitionJson(sp, json)
      .collect().sortBy(_.seq).toSeq
    assert(back == before, "JSON round trip changed the email elements")
    assert(back.forall(_.metadata.sent_from.contains(meta.sentFrom)))
    assert(back.forall(_.metadata.email_message_id == meta.messageId))
  }

  test("multi to/cc/bcc headers parse into address lists with message id") {
    val m = meta("mime-multi-to-cc-bcc.eml")
    assert(m.sentFrom == Seq("sender@example.com"))
    assert(m.sentTo == Seq("Bob <bob@example.com>", "Sue <sue@example.com>"))
    assert(m.cc == Seq("Tom <tom@example.com>", "Alice <alice@example.com>"))
    assert(m.bcc == Seq("John <john@example.com>", "Mary <mary@example.com>"))
    assert(m.messageId.contains("2143658709@example.com"))
    assert(m.subject.contains("Example Plain-Text MIME Message"))
  }

  // -- DescribeEmailPartitioningContext subject/to accessors (:602-618) --
  test("RFC-2047 encoded-word subject decodes; absent headers stay None") {
    assert(meta("mime-word-encoded-subject.eml").subject
      .contains("Simple email with ☸☿ Unicode subject"))
    assert(meta("mime-no-subject.eml").subject.isEmpty)
    assert(meta("mime-no-to.eml").sentTo.isEmpty)
    assert(meta("mime-simple.eml").bcc.isEmpty)
  }

  // -- and_it_correctly_parses_various_date_formats_... (:536-548) --
  test("Date header parses RFC-2822 and ISO-8601 forms to UTC ISO seconds") {
    assert(meta("test-rfc2822-date.eml").date.flatMap(Partitioners.sentDateIso)
      .contains("2025-07-29T12:42:06+00:00"))
    assert(meta("test-iso-8601-date.eml").date.flatMap(Partitioners.sentDateIso)
      .contains("2025-07-29T12:42:06+00:00"))
    assert(meta("simple-rfc-822.eml").date.flatMap(Partitioners.sentDateIso)
      .contains("2024-10-01T17:34:56+00:00"))
    assert(meta("test-invalid-date.eml").date.flatMap(Partitioners.sentDateIso).isEmpty)
    assert(meta("rfc822-no-date.eml").date.isEmpty)
  }

  // -- test_partition_email_from_filename_malformed_encoding (:161) --
  test("malformed encoding email still yields the canonical four elements") {
    val out = partitioned("fake-email-malformed-encoding.eml").map(_.text)
    assert(out == Seq("This is a test email to use for unit tests.",
      "Important points:", "Roses are red", "Violets are blue"))
  }

  // -- test_partition_email_also_partitions_attachments_when_so_instructed (:340) --
  test("attachment whose filename contains '=' partitions after the body") {
    val raw = eml("email-equals-attachment-filename.eml")
    val body = Partitioners.partitionEmail(raw)._2.map(_.text)
    assert(body == Seq("Below is an example of an odd filename"))
    val atts = Partitioners.emailAttachments(raw)
    assert(atts.size == 1)
    val (fn, content) = atts.head
    assert(fn.startsWith("odd=file=name"))
    assert(content.contains("Odd filename"))
  }

  // -- test_partition_email_can_process_attachments (:351) --
  test("fake-email-attachment.eml routes body + attachment through partitioning") {
    val raw = eml("fake-email-attachment.eml")
    val body = Partitioners.partitionEmail(raw)._2.map(_.text)
    // trailing NBSP from the html body; the cascade cleans it downstream
    assert(body.head.startsWith("Hello!"))
    assert(body.exists(_.startsWith("Here's the attachments!")))
    val atts = Partitioners.emailAttachments(raw)
    assert(atts.map(_._1) == Seq("fake-attachment.txt"))
    val attParas = TextSource.splitParagraphs(atts.head._2)
    assert(attParas == Seq("Hey this is a fake attachment!"))
    // sent-date flows to last_modified (email.py:222)
    assert(Partitioners.partitionEmail(raw)._1.date.flatMap(Partitioners.sentDateIso)
      .contains("2022-12-23T18:08:48+00:00"))
  }

  // -- test_partition_email_silently_skips_attachments_it_cannot_partition (:374) --
  test("multipart/digest messages partition as recursive eml attachments") {
    // a multipart/digest has NO text/html|plain body candidate — Python's
    // get_body returns None and iter_attachments yields every message/rfc822
    // part; with attachment processing on (partition_email's default) the
    // digest messages partition recursively
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/example-docs/eml/mime-multipart-digest.eml"))
    val rows = AutoSource.parseDoc("mime-multipart-digest.eml", bytes,
      processAttachments = true)
    assert(rows.map(_.raw_text) == Seq(
      "This is the first message in the digest.",
      "This is the second message in the digest.",
      "This is the third message in the digest."))
    assert(rows.forall(_.attached_to_filename.contains("mime-multipart-digest.eml")))
    assert(rows.map(_.doc_id).distinct.size == 3)
  }

  test("legacy eml fixtures partition without crashing, bodies found") {
    // encoding-error regression fixtures + UTF-16 variants + inline images:
    // every one must find a body (never zero elements, never an exception)
    val dir = "/root/reference/example-docs/eml/"
    val expectNonEmpty = Seq(
      "email-no-html-content-1.eml", "email-replace-mime-encodings-error-1.eml",
      "email-replace-mime-encodings-error-2.eml",
      "email-replace-mime-encodings-error-3.eml",
      "email-replace-mime-encodings-error-4.eml",
      "email-replace-mime-encodings-error-5.eml",
      "email-with-image.eml", "fake-email-header.eml",
      "fake-email-image-embedded.eml", "family-day.eml",
      "fake-email-utf-16.eml", "fake-email-utf-16-le.eml",
      "fake-email-utf-16-be.eml")
    expectNonEmpty.foreach { n =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir + n))
      val (ft, paras) = Partitioners.partitionAuto(n, bytes)
      assert(ft == FileType.Eml, n)
      assert(paras.nonEmpty, n)
    }
    // the UTF-16 email variants all decode to the same body as the UTF-8 one
    val expected = Partitioners.partitionAuto("fake-email.eml",
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir + "fake-email.eml")))._2.map(_.text)
    for (v <- Seq("fake-email-utf-16.eml", "fake-email-utf-16-le.eml",
        "fake-email-utf-16-be.eml")) {
      val got = Partitioners.partitionAuto(v, java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir + v)))._2.map(_.text)
      assert(got == expected, v)
    }
  }

  test("unpartitionable attachment (mp3) is skipped, body still partitions") {
    val raw = eml("mime-attach-mp3.eml")
    val body = Partitioners.partitionEmail(raw)._2.map(_.text)
    assert(body == Seq("This is an email with an MP3 attachment."))
    val atts = Partitioners.emailAttachments(raw)
    // the attachment is surfaced but routes to no partitioner (audio = seam),
    // so the element stream holds only the body — the reference skips it the
    // same way via EXPECTED_ATTACHMENT_ERRORS
    assert(atts.map(_._1).forall(_.endsWith(".mp3")))
  }
}
