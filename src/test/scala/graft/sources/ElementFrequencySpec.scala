package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuiteBase

/**
 * Behavior port of `metrics/test_element_type.py::
 * test_get_element_type_frequency` — end-to-end (type, category_depth)
 * frequency over the reference's own example docs, pinned against the exact
 * dicts the reference asserts.
 */
class ElementFrequencySpec extends SparkSuiteBase {

  private def frequency(name: String): Map[(String, Option[Int]), Int] = {
    val dir = Files.createTempDirectory("freq").toString
    Files.write(Paths.get(dir, name),
      Files.readAllBytes(Paths.get(s"/root/reference/example-docs/$name")))
    AutoSource.partitionFiles(spark, dir)
      .select("element_type", "category_depth").collect()
      .groupBy(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .view.mapValues(_.length).toMap
  }

  test("fake-email.txt frequency matches the reference dict") {
    assert(frequency("fake-email.txt") == Map(
      ("NarrativeText", None) -> 1,
      ("UncategorizedText", None) -> 1,
      ("ListItem", Some(1)) -> 2))
  }

  test("sample-presentation.pptx frequency matches the reference dict") {
    assert(frequency("sample-presentation.pptx") == Map(
      ("Title", Some(0)) -> 4,
      ("Title", Some(1)) -> 2,
      ("NarrativeText", Some(0)) -> 2,
      ("PageBreak", None) -> 3,
      ("ListItem", Some(0)) -> 6,
      ("ListItem", Some(1)) -> 6,
      ("ListItem", Some(2)) -> 3,
      ("Table", None) -> 1))
  }
}
