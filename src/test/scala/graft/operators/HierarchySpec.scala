package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Element, ElementMetadata}

/**
 * Behavior port of `partition/common/test_metadata.py::
 * Describe_set_element_hierarchy` — the parent-assignment stack sweep over
 * the reference's exact vectors.
 */
class HierarchySpec extends AnyFunSuite {

  private def el(id: String, tpe: String, depth: Option[Int] = None,
      parent: Option[String] = None): Element =
    Element(id, tpe, tpe, "d", 0,
      ElementMetadata(category_depth = depth, parent_id = parent))

  private def parents(els: Seq[Element],
      ruleset: Map[String, Seq[String]] = null): Seq[Option[String]] = {
    val out =
      if (ruleset == null) MetadataOps.setElementHierarchy(els)
      else MetadataOps.setElementHierarchy(els, ruleset)
    out.map(_.metadata.parent_id)
  }

  test("default ruleset (it_applies_default_ruleset)") {
    val els = Seq(
      el("0", "Title"), el("1", "UncategorizedText"), el("2", "Header"),
      el("3", "UncategorizedText"), el("4", "Title"), el("5", "UncategorizedText"))
    assert(parents(els) == Seq(
      None, Some("0"), None, Some("2"), Some("2"), Some("4")))
  }

  test("category_depth breaks ties within a category " +
    "(it_applies_category_depth_when_element_category_is_the_same)") {
    val els = Seq(
      el("0", "Title", depth = Some(1)),
      el("1", "ListItem", depth = Some(0)),
      el("2", "ListItem", depth = Some(1)),
      el("3", "ListItem", depth = Some(0)))
    assert(parents(els) == Seq(None, Some("0"), Some("1"), Some("0")))
  }

  test("category_depth is ignored across categories " +
    "(but_it_ignores_category_depth_when_elements_are_of_different_categories)") {
    val els = Seq(
      el("0", "Title", depth = Some(2)),
      el("1", "UncategorizedText", depth = Some(0)),
      el("2", "Header", depth = Some(2)),
      el("3", "UncategorizedText", depth = Some(0)),
      el("4", "ListItem", depth = Some(1)),
      el("5", "NarrativeText", depth = Some(0)))
    assert(parents(els) == Seq(
      None, Some("0"), None, Some("2"), Some("2"), Some("2")))
  }

  test("pre-existing parent_id is kept and the element skipped " +
    "(it_skips_elements_with_pre_existing_parent_id)") {
    val els = Seq(
      el("0", "Title", parent = Some("10")),
      el("1", "Title"),
      el("2", "UncategorizedText"))
    assert(parents(els) == Seq(Some("10"), None, Some("1")))
  }

  test("full default-ruleset sweep (it_sets_parent_id_for_each_element_in_elements)") {
    val els = Seq(
      el("0", "Title"), el("1", "NarrativeText"), el("2", "FigureCaption"),
      el("3", "ListItem"), el("4", "ListItem", depth = Some(1)),
      el("5", "ListItem", depth = Some(1)), el("6", "ListItem"),
      el("7", "CheckBox"), el("8", "Title"), el("9", "ListItem"),
      el("10", "ListItem"), el("11", "UncategorizedText"))
    val p = parents(els)
    assert(p(1) == Some("0") && p(2) == Some("0") && p(3) == Some("0"))
    assert(p(4) == Some("3") && p(5) == Some("3") && p(6) == Some("0"))
    assert(p(8).isEmpty)
    assert(p(9) == Some("8") && p(10) == Some("8") && p(11) == Some("8"))
  }

  test("custom rule set (it_applies_custom_rule_set)") {
    val els = Seq(
      el("0", "Header"), el("1", "Title"), el("2", "NarrativeText"),
      el("3", "UncategorizedText"), el("4", "Title"), el("5", "FigureCaption"))
    val custom = Map(
      "Header" -> Seq("Title", "Text"),
      "Title" -> Seq("NarrativeText", "UncategorizedText", "FigureCaption"))
    assert(parents(els, custom) == Seq(
      None, Some("0"), Some("1"), Some("1"), Some("0"), Some("4")))
  }
}
