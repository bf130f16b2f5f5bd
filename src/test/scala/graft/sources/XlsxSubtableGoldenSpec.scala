package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuiteBase

/**
 * Golden port of `test_xlsx.py::test_partition_xlsx_subtables` — the
 * 34-element typed stream over the reference's xlsx-subtable-cases.xlsx,
 * exercising every leading/trailing single-cell arrangement of the
 * connected-component subtable splitter, end-to-end through the auto router.
 */
class XlsxSubtableGoldenSpec extends SparkSuiteBase {

  test("xlsx-subtable-cases.xlsx partitions to the reference's 34 typed elements") {
    val dir = Files.createTempDirectory("xlsx-golden").toString
    Files.write(Paths.get(dir, "xlsx-subtable-cases.xlsx"),
      Files.readAllBytes(Paths.get(
        "/root/reference/example-docs/xlsx-subtable-cases.xlsx")))
    val out = AutoSource.partitionFiles(spark, dir)
      .select("seq", "element_type", "text")
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(out == Seq(
      ("Table", "a b c d e"), ("ListItem", "f"), ("Title", "a"),
      ("Table", "b c d e"), ("Title", "a"), ("Title", "b"),
      ("Table", "c d e f"), ("Table", "a b c d"), ("ListItem", "2. e"),
      ("Table", "a b c d"), ("Title", "e"), ("Title", "f"), ("Title", "a"),
      ("Table", "b c d e"), ("Title", "f"), ("Title", "a"), ("Title", "b"),
      ("Table", "c d e f"), ("Title", "g"), ("Title", "a"),
      ("Table", "b c d e"), ("Title", "f"), ("Title", "g"), ("Title", "a"),
      ("Title", "b"), ("Table", "c d e f"), ("Title", "g"), ("Title", "h"),
      ("Table", "a b c"), ("Title", "a"), ("Table", "b c d"),
      ("Table", "a b c"), ("Title", "d"), ("Title", "e")))
  }
}
