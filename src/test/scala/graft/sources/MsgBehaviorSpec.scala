package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.sources.HtmlPartitioner.RawPara

/**
 * Behavior suite ported from the reference's MSG tests
 * (`/root/reference/test_unstructured/partition/test_msg.py`) over the same
 * example messages, exercising the hand-rolled CFB reader end-to-end.
 */
class MsgBehaviorSpec extends SparkSuiteBase {

  private val docs = "/root/reference/example-docs/"

  private def bytes(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(docs + name))

  private def typed(ps: Seq[RawPara]): Seq[(String, String)] = {
    val sp = spark
    import sp.implicits._
    val df = ps.zipWithIndex
      .map { case (p, i) => (i, p.elementType.orNull, p.text, p.classifier) }
      .toDF("i", "raw_type", "text", "classifier")
    val derived = HtmlSource.classifierCascade(col("classifier"), col("text"))
    df.select(col("i"), coalesce(col("raw_type"), derived).as("t"),
        when(col("raw_type").isNull && derived === "ListItem",
          graft.functions.Cleaners.cleanBullets(col("text")))
          .otherwise(col("text")).as("text"))
      .orderBy("i").collect().toSeq.map(r => (r.getString(1), r.getString(2)))
  }

  // -- test_partition_msg_from_filename -------------------------------------------

  test("fake-email.msg: body elements match EXPECTED_MSG_OUTPUT") {
    val (_, ps) = MsgPartitioner.partitionMsg(bytes("fake-email.msg"))
    assert(typed(ps) == Seq(
      ("NarrativeText", "This is a test email to use for unit tests."),
      ("UncategorizedText", "Important points:"),
      ("ListItem", "Roses are red"),
      ("ListItem", "Violets are blue")))
  }

  test("fake-email.msg: sender, recipient, subject, and sent-date metadata") {
    val (meta, _) = MsgPartitioner.partitionMsg(bytes("fake-email.msg"))
    assert(meta.sentFrom == Seq("\"Matthew Robinson\" <mrobinson@unstructured.io>"))
    assert(meta.sentTo == Seq("mrobinson@unstructured.io"))
    assert(meta.subject.contains("Test Email"))
    // last_modified pulls from PR_CLIENT_SUBMIT_TIME (msg.py:135-138)
    assert(meta.date.contains("2023-03-28T17:00:31+00:00"))
  }

  // -- transport-header metadata --------------------------------------------------

  test("cc and bcc recipients surface from the transport headers") {
    val (meta, ps) = MsgPartitioner.partitionMsg(bytes("fake-email-with-cc-and-bcc.msg"))
    assert(ps.nonEmpty)
    assert((meta.cc ++ meta.bcc).nonEmpty,
      s"expected cc/bcc from transport headers, got cc=${meta.cc} bcc=${meta.bcc}")
    assert((meta.cc ++ meta.bcc).forall(_.contains("@")))
  }

  // -- DescribeMsgPartitionerOptions.extra_msg_metadata (test_msg.py:462-478) ------

  test("cc-and-bcc message pins the reference's exact extra metadata") {
    val (m, _) = MsgPartitioner.partitionMsg(bytes("fake-email-with-cc-and-bcc.msg"))
    assert(m.bcc == Seq("hello@unstructured.io"))
    assert(m.cc == Seq("steve@unstructured.io"))
    // angle brackets stripped (msg.py:98-99)
    assert(m.messageId.contains("14DDEF33-2BA7-4CDD-A4D8-E7C5873B37F2@gmail.com"))
    assert(m.sentFrom == Seq("\"John\" <johnjennings702@gmail.com>"))
    assert(m.sentTo == Seq("john-ctr@unstructured.io", "steve@unstructured.io",
      "hello@unstructured.io"))
    assert(m.subject.contains("Fake email with cc and bcc recipients"))
  }

  // -- DescribeMsgPartitionerOptions.is_encrypted parametrize (test_msg.py:482-491)

  test("encryption detection contrasts: encrypted empty, plain non-empty") {
    assert(MsgPartitioner.partitionMsg(bytes("fake-encrypted.msg"))._2.isEmpty)
    assert(MsgPartitioner.partitionMsg(bytes("fake-email.msg"))._2.nonEmpty)
  }

  // -- test_partition_msg_with_pgp_encrypted_message ------------------------------

  test("encrypted message partitions to zero elements") {
    val (_, ps) = MsgPartitioner.partitionMsg(bytes("fake-encrypted.msg"))
    assert(ps.isEmpty)
  }

  // -- attachment processing ------------------------------------------------------

  test("attachments extract with filenames and partition through the auto router") {
    val atts = MsgPartitioner.msgAttachments(bytes("fake-email-attachment.msg"))
    assert(atts.map(_._1) == Seq("fake-attachment.txt"))
    val (ft, ps) = Partitioners.partitionAuto(atts.head._1, atts.head._2)
    assert(ft == FileType.Txt)
    assert(ps.nonEmpty)
    assert(ps.head.text == "Hey this is a fake attachment!")
  }

  // -- test_partition_msg_silently_skips_attachments_it_cannot_partition
  // (test_msg.py:163-181; same contract for eml, email.py:418-427): a
  // poisoned attachment — ZIP-magic garbage routed by its .msg extension
  // into the CFB reader, which throws — is dropped without sinking the host
  // message's elements --
  test("an attachment that cannot partition is silently skipped; the body survives") {
    val corrupt = ("PK" + "garbage not a real zip").getBytes("ISO-8859-1")
    val b64 = java.util.Base64.getEncoder.encodeToString(corrupt)
    val eml =
      s"""From: a@example.com
         |To: b@example.com
         |Subject: attachments
         |MIME-Version: 1.0
         |Content-Type: multipart/mixed; boundary="BBB"
         |
         |--BBB
         |Content-Type: text/plain
         |
         |Here are those documents.
         |--BBB
         |Content-Type: text/plain
         |Content-Disposition: attachment; filename="ok.txt"
         |
         |Hey this is a fake attachment!
         |--BBB
         |Content-Type: application/vnd.ms-outlook
         |Content-Transfer-Encoding: base64
         |Content-Disposition: attachment; filename="broken.msg"
         |
         |$b64
         |--BBB--
         |""".stripMargin.replace("\n", "\r\n")
    // the poisoned attachment REALLY throws when partitioned directly — the
    // skip below is the Try at work, not a vacuous empty parse
    intercept[Exception](Partitioners.partitionAuto("broken.msg", corrupt))
    val rows = AutoSource.parseDoc("mail.eml", eml.getBytes("UTF-8"),
      processAttachments = true)
    assert(rows.exists(r => r.raw_text == "Here are those documents." &&
      r.attached_to_filename.isEmpty), rows.map(_.raw_text).mkString("|"))
    assert(rows.exists(r => r.raw_text == "Hey this is a fake attachment!" &&
      r.attached_to_filename.contains("mail.eml")))
    assert(!rows.exists(_.doc_id.endsWith("broken.msg")),
      "the corrupt attachment's rows should have been skipped")
  }

  // -- Describe_AttachmentPartitioner filename sanitization (test_msg.py:315-460) --

  test("attachment filenames sanitize path traversal, separators, and null bytes") {
    import MsgPartitioner.{sanitizeAttachmentFileName => sanitize}
    assert(sanitize(Some("../../../etc/passwd")) == "passwd")
    assert(sanitize(Some("/etc/passwd")) == "passwd")
    assert(sanitize(Some("C:\\Windows\\System32\\config\\sam")) == "sam")
    assert(sanitize(Some("file\u0000.txt")) == "file.txt")
    assert(sanitize(Some("..\\../\\..\\etc/passwd")) == "passwd")
  }

  test("attachment filename degenerate cases fall back to 'unknown'") {
    import MsgPartitioner.{sanitizeAttachmentFileName => sanitize}
    assert(sanitize(Some(".")) == "unknown")
    assert(sanitize(Some("..")) == "unknown")
    assert(sanitize(None) == "unknown")
    assert(sanitize(Some("")) == "unknown")
    assert(sanitize(Some("document.pdf")) == "document.pdf")
  }
}
