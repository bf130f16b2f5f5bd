package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.types._

import graft.SparkSuiteBase
import graft.model.{Element, ElementMetadata}

/**
 * Differential harness for the hierarchy stack sweep:
 * `dev/gen_hierarchy_diff_vectors.py` ran the reference
 * `set_element_hierarchy` (`partition/common/metadata.py:99-147`) over 150
 * seeded random element streams (all ruleset categories, depths None..3,
 * occasional pre-set parent_ids which must be preserved) and pinned each
 * element's parent as a source index. This spec replays each stream through
 * [[MetadataOps.setElementHierarchy]].
 */
class HierarchyDifferentialSpec extends SparkSuiteBase {

  private val schema = StructType(Seq(
    StructField("case", LongType),
    StructField("elements", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("depth", IntegerType),
      StructField("preset", StringType))))),
    StructField("parents", ArrayType(StringType))))

  test("all reference hierarchy differential vectors replay identically") {
    val rows = spark.read.schema(schema)
      .json("src/test/resources/graft/refvec/hierarchy_diff.ndjson")
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 150)
    val failures = mutable.ArrayBuffer[String]()
    rows.foreach { r =>
      val caseId = r.getLong(0)
      val descs = r.getSeq[org.apache.spark.sql.Row](1)
      val els = descs.zipWithIndex.map { case (d, ix) =>
        Element(s"id-$ix", d.getString(0), s"t$ix", "doc", ix.toLong,
          ElementMetadata(
            category_depth = if (d.isNullAt(1)) None else Some(d.getInt(1)),
            parent_id = Option(d.getString(2))))
      }
      val out = MetadataOps.setElementHierarchy(els)
      val expected = if (r.isNullAt(2)) Vector.empty[Option[String]]
        else r.getSeq[String](2).toVector.map(Option(_))
      val ours = out.toVector.map(_.metadata.parent_id.map { pid =>
        if (pid.startsWith("preset-")) pid
        else pid.stripPrefix("id-") // parent index
      })
      if (ours != expected)
        failures += s"case $caseId: ours ${ours.map(_.getOrElse("-")).mkString(",")} " +
          s"theirs ${expected.map(_.getOrElse("-")).mkString(",")} " +
          s"types ${descs.map(d => d.getString(0) + ":" + (if (d.isNullAt(1)) "-" else d.getInt(1))).mkString(" ")}"
    }
    if (failures.nonEmpty)
      fail(s"${failures.length}/150 divergences from reference hierarchy:\n" +
        failures.take(6).mkString("\n"))
  }
}
