package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.types._

import graft.SparkSuiteBase

/**
 * Differential harness for RFC-822 header parsing:
 * `dev/gen_email_diff_vectors.py` ran the reference `partition_email` over 128
 * seeded messages with adversarial headers — quoted display names containing
 * commas, RFC-2047 encoded words (valid and over-length-invalid), folded
 * subjects, multiple recipients, bare and bracketed Message-IDs, date-zone
 * variants — and pinned the header metadata. Bodies are bullet lines so the
 * reference's model-bound classification never runs; only header fields (which
 * never touch that seam) are pinned. Replayed through
 * [[Partitioners.partitionEmail]].
 */
class EmailHeaderDifferentialSpec extends SparkSuiteBase {

  private val schema = StructType(Seq(
    StructField("case", LongType),
    StructField("eml", StringType),
    StructField("sent_from", ArrayType(StringType)),
    StructField("sent_to", ArrayType(StringType)),
    StructField("cc", ArrayType(StringType)),
    StructField("bcc", ArrayType(StringType)),
    StructField("subject", StringType),
    StructField("message_id", StringType),
    StructField("last_modified", StringType)))

  test("all reference email-header differential vectors replay identically") {
    val rows = spark.read.schema(schema)
      .json("src/test/resources/graft/refvec/email_header_diff.ndjson")
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 128)
    val failures = mutable.ArrayBuffer[String]()
    rows.foreach { r =>
      val caseId = r.getLong(0)
      val (meta, _) = Partitioners.partitionEmail(r.getString(1))
      def optSeq(i: Int): Seq[String] =
        if (r.isNullAt(i)) Nil else r.getSeq[String](i)
      def escAny(v: Any): String = v match {
        case s: Seq[_] => s.map(x => "[" + String.valueOf(x).flatMap {
          case c if c >= 32 && c < 127 => c.toString
          case c => f"\\u${c.toInt}%04X"
        } + "]").mkString("|")
        case other => String.valueOf(other)
      }
      def check(name: String, ours: Any, theirs: Any): Unit =
        if (ours != theirs)
          failures += s"case $caseId $name:\n  ours   ${escAny(ours)}\n  theirs ${escAny(theirs)}"
      check("sent_from", meta.sentFrom, optSeq(2))
      check("sent_to", meta.sentTo, optSeq(3))
      check("cc", meta.cc, optSeq(4))
      check("bcc", meta.bcc, optSeq(5))
      check("subject", meta.subject.getOrElse(null),
        if (r.isNullAt(6)) null else r.getString(6))
      check("message_id", meta.messageId.getOrElse(null),
        if (r.isNullAt(7)) null else r.getString(7))
      check("last_modified",
        Partitioners.sentDateIso(meta.date.getOrElse("")).getOrElse(null),
        if (r.isNullAt(8)) null else r.getString(8))
    }
    if (failures.nonEmpty)
      fail(s"${failures.length} header divergences:\n" + failures.take(12).mkString("\n"))
  }
}
