package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSuiteBase
import graft.model.{Element, ElementMetadata}

/**
 * `group_elements_by_parent_id` orphan handling, ported from
 * `test_unstructured/test_utils.py`
 * (`it_groups_elements_by_parent_id_with_orphans_in_none_group`,
 * `it_assigns_orphans_to_previous_element_group_when_assign_orphans_is_true`,
 * `it_keeps_first_orphan_in_none_group_when_assign_orphans_is_true`) against
 * [[MetadataOps.fillOrphanParents]] (`utils.py:645-686`).
 */
class OrphanGroupingSpec extends SparkSuiteBase {

  private def el(seq: Long, parent: Option[String]): Element =
    Element(s"e$seq", "NarrativeText", s"t$seq", "d", seq,
      ElementMetadata(parent_id = parent))

  private def fill(els: Seq[Element]): Seq[(Long, Option[String])] = {
    import spark.implicits._
    MetadataOps.fillOrphanParents(els.toDF())
      .select(col("seq"), col("parent_id"))
      .collect().toSeq
      .map(r => (r.getLong(0), Option(r.getString(1))))
      .sortBy(_._1)
  }

  test("without filling, orphans stay in the None group") {
    // default mode is a plain groupBy on the raw parent_id — nothing to fill;
    // pin that the raw column keeps orphans null
    val els = Seq(el(1, Some("p1")), el(2, None), el(3, Some("p2")), el(4, None))
    assert(els.map(e => e.metadata.parent_id).count(_.isEmpty) == 2)
  }

  test("orphans join the previous element's parent group") {
    val els = Seq(el(1, Some("p1")), el(2, None), el(3, Some("p2")), el(4, None), el(5, None))
    assert(fill(els) == Seq(1L -> Some("p1"), 2L -> Some("p1"),
      3L -> Some("p2"), 4L -> Some("p2"), 5L -> Some("p2")))
  }

  test("a leading orphan stays in the None group") {
    val els = Seq(el(1, None), el(2, Some("p1")), el(3, None))
    assert(fill(els) == Seq(1L -> None, 2L -> Some("p1"), 3L -> Some("p1")))
  }
}
