package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuiteBase

/**
 * Differential fuzz harness for WHOLE-DOCUMENT `partition_text`
 * (`partition/text.py:40-108`): `dev/gen_partition_text_diff_vectors.py`
 * executed the reference pipeline — auto_paragraph_grouper line-ratio
 * routing, PARAGRAPH_PATTERN splitting, per-paragraph strip, the
 * empty-bullet drop, element_from_text classification with ListItem bullet
 * cleaning — over 309 seeded documents (randomized paragraph mixes plus
 * hand edges: empty/whitespace docs, newline-heavy grouper routes,
 * empty-bullet-only paragraphs, the e-bullet quirk, astral + ideographic-
 * space boundaries, untranslated \r\n through the text= branch; 60 of them
 * run with paragraph_grouper=False, the grouper-bypass route where single
 * newlines become paragraph boundaries) and pinned the full
 * (category, text) element stream per document.
 *
 * The per-piece corpora (classifier cascade, paragraph groupers) pin the
 * stages in isolation; this one pins their COMPOSITION through
 * [[TextSource.partitionText]] — the same deterministic tokenize/pos twins
 * on both sides, so any stream difference is a real pipeline divergence.
 */
class PartitionTextDifferentialSpec extends SparkSuiteBase {

  private val vecPath = "src/test/resources/graft/refvec/partition_text_diff.ndjson"

  test("309 whole-document partition_text vectors reproduce exactly") {
    val sp = spark
    import sp.implicits._
    val schema = StructType(Seq(
      StructField("input", StringType),
      StructField("auto", BooleanType),
      StructField("elements", ArrayType(ArrayType(StringType)))))
    val rows = sp.read.schema(schema).json(vecPath).collect()
    assert(rows.count(!_.getBoolean(1)) == 60)
    assert(rows.length == 309)
    val expected: Map[Long, Vector[(String, String)]] = rows.zipWithIndex.map {
      case (r, i) =>
        val els =
          if (r.isNullAt(2)) Vector.empty[(String, String)]
          else r.getSeq[scala.collection.Seq[String]](2).toVector
            .map(p => (p(0), p(1)))
        i.toLong -> els
    }.toMap
    val inputs = rows.zipWithIndex.map { case (r, i) =>
      (i.toLong, Option(r.getString(0)).getOrElse(""), r.getBoolean(1))
    }.toSeq
    // two replays, one per grouper route, merged back by doc_id
    val got = Seq(true, false).flatMap { auto =>
      val df = inputs.filter(_._3 == auto).map(t => (t._1, t._2))
        .toDF("doc_id", "text")
      TextSource.partitionText(df, col("text"), autoGroup = auto)
        .select(col("doc_id").cast("long"), col("seq"),
          col("element_type"), col("text"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    }.groupBy(_._1)
      .view.mapValues(_.sortBy(_._2).toVector.map(t => (t._3, t._4))).toMap
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    expected.foreach { case (id, want) =>
      val ours = got.getOrElse(id, Vector.empty)
      if (ours != want)
        failures += s"doc $id:\n  input <${inputs(id.toInt)._2.take(80)}>" +
          s"\n  ours   $ours\n  theirs $want"
    }
    if (failures.nonEmpty)
      fail(s"${failures.length}/309 documents diverged:\n" +
        failures.take(5).mkString("\n"))
  }
}
