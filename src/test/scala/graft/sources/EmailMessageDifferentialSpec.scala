package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuiteBase, TestEscapes}

/**
 * Differential fuzz harness for WHOLE-MESSAGE `partition_email`
 * (`partition/email.py:31-180`): `dev/gen_email_message_diff_vectors.py`
 * executed the reference pipeline — RFC-822 parse under `policy.default`,
 * body-part selection skipping attachment parts, content-transfer decode
 * (7bit/QP/base64 × utf-8/latin-1/iso-8859-8), partition_text over the
 * body, RFC-2047 header decoding into per-element message metadata — over
 * 200 seeded ASCII-wire messages (160 single/mixed-part plus 40
 * multipart/alternative replayed with content_source="text/plain", pinning
 * the body-preference logic: the plain part wins in either part order even
 * though html is present) and pinned the element stream plus
 * sent_from/sent_to/cc/bcc/subject/message_id.
 *
 * The header corpus pins field decoding and the QP rows pin the transfer
 * decode in isolation; this one pins their COMPOSITION through
 * [[Partitioners.partitionEmail]] + the text classifier cascade — the same
 * route `q_partition_eml` takes. Reference semantics include the ListItem
 * bullet-clean (`element_from_text`, `text.py:124-127`).
 */
class EmailMessageDifferentialSpec extends SparkSuiteBase {

  private val vecPath = "src/test/resources/graft/refvec/email_message_diff.ndjson"

  test("200 whole-message partition_email vectors reproduce exactly") {
    val sp = spark
    import sp.implicits._
    val schema = StructType(Seq(
      StructField("raw", StringType),
      StructField("elements", ArrayType(ArrayType(StringType))),
      StructField("sent_from", ArrayType(StringType)),
      StructField("sent_to", ArrayType(StringType)),
      StructField("cc", ArrayType(StringType)),
      StructField("bcc", ArrayType(StringType)),
      StructField("subject", StringType),
      StructField("message_id", StringType),
      StructField("content_source", StringType)))
    val rows = sp.read.schema(schema).json(vecPath).collect()
    assert(rows.length == 200)
    def arr(r: org.apache.spark.sql.Row, i: Int): Vector[String] =
      if (r.isNullAt(i)) Vector.empty
      else r.getSeq[String](i).toVector.map(TestEscapes.unescape)

    // metadata + untyped paragraphs, scalar side
    val parsed = rows.map { r => Partitioners.partitionEmail(
      TestEscapes.unescape(r.getString(0)),
      contentSource = r.getString(8)) }

    // classify every paragraph in ONE job through the production cascade,
    // with the reference's ListItem bullet-clean
    val paraRows = parsed.zipWithIndex.flatMap { case ((_, paras), mi) =>
      paras.zipWithIndex.map { case (p, pi) => (mi.toLong, pi.toLong, p.text) }
    }.toSeq
    val typed = paraRows.toDF("mi", "pi", "raw_text")
      .select(col("mi"), col("pi"),
        HtmlSource.classifierCascade(lit("text"), col("raw_text")).as("tpe"),
        col("raw_text"))
      .select(col("mi"), col("pi"), col("tpe"),
        when(col("tpe") === "ListItem",
          graft.functions.Cleaners.cleanBullets(col("raw_text")))
          .otherwise(col("raw_text")).as("text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(_._2).toVector.map(t => (t._3, t._4))).toMap

    val failures = scala.collection.mutable.ArrayBuffer[String]()
    rows.zipWithIndex.foreach { case (r, mi) =>
      val wantEls =
        if (r.isNullAt(1)) Vector.empty[(String, String)]
        else r.getSeq[scala.collection.Seq[String]](1).toVector
          .map(p => (p(0), TestEscapes.unescape(p(1))))
      val oursEls = typed.getOrElse(mi.toLong, Vector.empty)
        .filter { case (t, txt) => t != null && txt.nonEmpty }
      if (oursEls != wantEls)
        failures += s"msg $mi elements:\n  ours   $oursEls\n  theirs $wantEls"
      // metadata rides on elements — a message with no elements pins none
      if (wantEls.nonEmpty) {
      val meta = parsed(mi)._1
      if (meta.sentFrom.toVector != arr(r, 2))
        failures += s"msg $mi sent_from: ours ${meta.sentFrom} theirs ${arr(r, 2)}"
      if (meta.sentTo.toVector != arr(r, 3))
        failures += s"msg $mi sent_to: ours ${meta.sentTo} theirs ${arr(r, 3)}"
      if (meta.cc.toVector != arr(r, 4))
        failures += s"msg $mi cc: ours ${meta.cc} theirs ${arr(r, 4)}"
      if (meta.bcc.toVector != arr(r, 5))
        failures += s"msg $mi bcc: ours ${meta.bcc} theirs ${arr(r, 5)}"
      val wantSubject = Option(r.getString(6)).map(TestEscapes.unescape)
      if (meta.subject != wantSubject)
        failures += s"msg $mi subject: ours ${meta.subject} theirs $wantSubject"
      val wantMsgId = Option(r.getString(7)).map(TestEscapes.unescape)
      if (meta.messageId != wantMsgId)
        failures += s"msg $mi message_id: ours ${meta.messageId} theirs $wantMsgId"
      }
    }
    if (failures.nonEmpty)
      fail(s"${failures.length} divergences over 200 messages:\n" +
        failures.take(6).mkString("\n"))
  }
}
