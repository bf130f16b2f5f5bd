package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuiteBase

/** `partition_text` behavior ports (`test_unstructured/partition/test_text.py`)
  * driven end-to-end through `AutoSource.partitionFiles` on the reference's own
  * example docs. */
class TextPartitionSpec extends SparkSuiteBase {

  private def partitionDir(files: (String, Array[Byte])*): Seq[(String, String)] = {
    val dir = Files.createTempDirectory("graft-text").toString
    files.foreach { case (name, bytes) => Files.write(Paths.get(dir, name), bytes) }
    AutoSource.partitionFiles(spark, dir)
      .select("seq", "element_type", "text")
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
  }

  private def refDoc(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(s"/root/reference/example-docs/$name"))

  // -- test_partition_text_from_text (:178) + EXPECTED_OUTPUT (:20-27) --
  test("fake-text.txt partitions to the canonical six typed elements") {
    val out = partitionDir("fake-text.txt" -> refDoc("fake-text.txt"))
    assert(out == Seq(
      ("NarrativeText", "This is a test document to use for unit tests."),
      ("Address", "Doylestown, PA 18901"),
      ("Title", "Important points:"),
      ("ListItem", "Hamburgers are delicious"),
      ("ListItem", "Dogs are the best"),
      ("ListItem", "I love fuzzy blankets")))
  }

  // -- test_partition_text_from_text_works_with_empty_string (:190) --
  test("empty text yields no elements") {
    assert(TextSource.splitParagraphs("").isEmpty)
    assert(partitionDir("empty.txt" -> Array.emptyByteArray).isEmpty)
  }

  // -- test_partition_text_captures_everything_even_with_linebreaks (:208) --
  test("indented linebreak memo still classifies Title and Address") {
    val text = "\n    VERY IMPORTANT MEMO\n    DOYLESTOWN, PA 18901\n    "
    val out = partitionDir("memo.txt" -> text.getBytes("UTF-8"))
    assert(out == Seq(
      ("Title", "VERY IMPORTANT MEMO"),
      ("Address", "DOYLESTOWN, PA 18901")))
  }

  // -- test_partition_text_splits_long_text (:241) --
  test("norwich-city.txt: first and last elements bracket the document") {
    val out = partitionDir("norwich-city.txt" -> refDoc("norwich-city.txt"))
    assert(out.nonEmpty)
    assert(out.head._2.startsWith("Iwan Roberts"))
    assert(out.last._2.endsWith("External links"))
  }

  // -- test_partition_text_doesnt_get_page_breaks (:248) --
  test("a dash run is one element and never a ListItem") {
    val out = partitionDir("dashes.txt" -> "--------------------".getBytes("UTF-8"))
    assert(out.size == 1)
    assert(out.head._2 == "--------------------")
    assert(out.head._1 != "ListItem")
  }

  // -- test_partition_text_groups_broken_paragraphs (:222) --
  test("group_broken_paragraphs rejoins line-broken prose before classification") {
    val text = "The big brown fox\nwas walking down the lane.\n\n" +
      "At the end of the lane,\nthe fox met a bear."
    val grouped = TextSource.groupBrokenParagraphs(text)
    val paras = TextSource.splitParagraphs(grouped)
    assert(paras == Seq(
      "The big brown fox was walking down the lane.",
      "At the end of the lane, the fox met a bear."))
  }
}
