package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.types._

import graft.SparkSuiteBase

/**
 * Differential harness for XY-cut reading order: `dev/gen_xycut_diff_vectors.py`
 * ran the reference `sort_bboxes_by_xy_cut` (`partition/utils/sorting.py:190`,
 * `xycut.py` with numba stubbed to plain Python — same semantics) over 240
 * seeded layouts (random scatter, two-column, row bands, nested boxes; both
 * primary directions; shrink factors 0.5/0.9/1.0) and pinned the resulting
 * orders. This spec replays each through [[Sorting.shrinkBbox]] +
 * [[Sorting.recursiveXyCut]]/[[Sorting.recursiveXyCutSwapped]].
 */
class XyCutDifferentialSpec extends SparkSuiteBase {

  private val schema = StructType(Seq(
    StructField("case", LongType),
    StructField("boxes", ArrayType(ArrayType(IntegerType))),
    StructField("direction", StringType),
    StructField("shrink", DoubleType),
    StructField("order", ArrayType(IntegerType))))

  test("all reference xy-cut differential vectors replay identically") {
    val rows = spark.read.schema(schema)
      .json("src/test/resources/graft/refvec/xycut_diff.ndjson")
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 240)
    val failures = mutable.ArrayBuffer[String]()
    rows.foreach { r =>
      val caseId = r.getLong(0)
      val boxes = r.getSeq[scala.collection.Seq[Int]](1)
        .map(b => (b(0), b(1), b(2), b(3))).toIndexedSeq
      val direction = r.getString(2)
      val shrink = r.getDouble(3)
      val expected = r.getSeq[Int](4).toVector
      val shrunken = boxes.map(Sorting.shrinkBbox(_, shrink))
      val res = mutable.ArrayBuffer.empty[Int]
      if (direction == "x")
        Sorting.recursiveXyCutSwapped(shrunken, boxes.indices, res)
      else Sorting.recursiveXyCut(shrunken, boxes.indices, res)
      // Deliberate divergence: the reference SILENTLY DROPS boxes whose
      // shrunken extent is zero (their projection profile is empty, xycut.py
      // `if not pos_x: continue`). Our guard keeps them (appended in source
      // order) — so the contract is: our order restricted to the reference's
      // survivors is byte-identical, and the only extras are reference-dropped.
      val ours = res.toVector
      val survivors = expected.toSet
      if (ours.filter(survivors) != expected)
        failures += s"case $caseId dir=$direction shrink=$shrink: " +
          s"ours ${ours.mkString(",")} theirs ${expected.mkString(",")} boxes=${boxes.take(6)}"
      else if (ours.length < expected.length)
        failures += s"case $caseId dir=$direction: ours lost elements " +
          s"(${ours.length} < ${expected.length})"
    }
    if (failures.nonEmpty)
      fail(s"${failures.length}/240 divergences from reference xy-cut:\n" +
        failures.take(8).mkString("\n"))
  }
}
