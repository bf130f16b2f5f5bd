package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.types._

import graft.SparkSuiteBase
import graft.model.{Element, ElementMetadata}

/**
 * Chained differential for the chunk->reconstruct table round trip:
 * `dev/gen_table_reconstruct_diff_vectors.py` ran the reference
 * `chunk_elements([Table(text)])` + `reconstruct_table_from_chunks`
 * (`chunking/dispatch.py:146-325`) over 120 seeded table texts and window
 * sizes, pinning the intermediate TableChunk texts and the reconstructed
 * table. This spec replays through [[Chunker.chunkDoc]] +
 * [[Chunker.reconstructTable]].
 */
class TableReconstructDifferentialSpec extends SparkSuiteBase {

  private val schema = StructType(Seq(
    StructField("case", LongType),
    StructField("text", StringType),
    StructField("max_characters", IntegerType),
    StructField("chunks", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("text", StringType),
      StructField("chunk_index", IntegerType))))),
    StructField("reconstructed", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("text", StringType)))))))

  test("all reference table chunk->reconstruct vectors replay identically") {
    val rows = spark.read.schema(schema)
      .json("src/test/resources/graft/refvec/table_reconstruct_diff.ndjson")
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 120)
    val failures = mutable.ArrayBuffer[String]()
    rows.foreach { r =>
      val caseId = r.getLong(0)
      val els = Seq(Element("e0", "Table", r.getString(1), "doc", 0L, ElementMetadata.empty))
      val opts = ChunkingOptions(maxCharacters = r.getInt(2), includeOrigElements = false)
      val chunks = Chunker.chunkDoc("doc", els.iterator, opts).toVector
      val expChunks = r.getSeq[org.apache.spark.sql.Row](3)
      if (chunks.map(c => (c.`type`, c.text)) !=
          expChunks.map(c => (c.getString(0), c.getString(1))))
        failures += s"case $caseId: chunk texts diverge " +
          s"(ours ${chunks.length}, theirs ${expChunks.length})"
      else {
        // dispatch.py:155-168 — only TableChunk rows with a table_id take part;
        // a fits-whole Table element reconstructs to nothing
        val tcs = chunks.filter(c =>
          c.`type` == "TableChunk" && c.metadata.table_id.isDefined)
        val rec =
          if (tcs.isEmpty) Vector.empty[Element]
          else tcs.groupBy(_.metadata.table_id).values.toVector
            .sortBy(_.head.seq)
            .flatMap(g => Chunker.reconstructTable(g))
        val expRec = r.getSeq[org.apache.spark.sql.Row](4)
        if (rec.map(e => (e.`type`, e.text)) !=
            expRec.map(e => (e.getString(0), e.getString(1))))
          failures += s"case $caseId: reconstruction diverges\n" +
            s"  ours:   ${rec.map(e => e.`type` + ":" + e.text.take(60))}\n" +
            s"  theirs: ${expRec.map(e => e.getString(0) + ":" + e.getString(1).take(60))}"
      }
    }
    if (failures.nonEmpty)
      fail(s"${failures.length}/120 divergences:\n" + failures.take(6).mkString("\n"))
  }
}
