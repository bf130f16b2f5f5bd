package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Element, ElementMetadata}

/** Hash-id assignment ports (`test_unstructured/documents/test_elements.py:682-766`)
  * — exact reference digests. */
class HashIdsSpec extends AnyFunSuite {

  private def text(t: String, id: String = "", page: Option[Int] = Some(1),
      parent: Option[String] = None, filename: Option[String] = None): Element =
    Element(id, "NarrativeText", t, "d", 0,
      ElementMetadata(page_number = page, parent_id = parent, filename = filename))

  // -- test_hash_ids_are_deterministic (:723) — exact reference digests --
  test("hash ids and remapped parent ids match the reference digests") {
    val els = Seq(
      text("Parent", id = "p0"),
      text("Element", id = "c1", parent = Some("p0")),
      text("Element", id = "c2", parent = Some("p0")))
    val out = MetadataOps.assignHashIds(els)
    assert(out.map(_.element_id) == Seq(
      "ea9eb7e80383c190f8cafce1ad666624",
      "4112a8d24886276e18e759d06956021b",
      "eba84bbe7f03e8b91a1527323040ee3d"))
    assert(out.map(_.metadata.parent_id) == Seq(
      None,
      Some("ea9eb7e80383c190f8cafce1ad666624"),
      Some("ea9eb7e80383c190f8cafce1ad666624")))
  }

  // -- test_hash_ids_are_unique_for_duplicate_elements (:682) --
  test("duplicate text gets unique ids via the per-page sequence number") {
    val els = Seq(
      text("Parent", id = "p0"),
      text("Element", id = "c1", parent = Some("p0")),
      text("Element", id = "c2", parent = Some("p0")))
    val out = MetadataOps.assignHashIds(els)
    val ids = out.map(_.element_id)
    assert(ids.distinct.size == ids.size)
    // every remapped parent id points at an element in the output
    out.flatMap(_.metadata.parent_id).foreach(p => assert(ids.contains(p)))
    // and ids all changed from their originals
    assert(ids.intersect(Seq("p0", "c1", "c2")).isEmpty)
  }

  // -- test_assign_hash_ids_leaves_unknown_parent_id_unchanged
  // (partition/common/test_metadata.py:506-518): a parent filtered out of
  // the input must not KeyError OR be rewritten --
  test("an unknown (external/filtered) parent_id survives hash assignment unchanged") {
    val orphan = text("Orphan", id = "o1",
      parent = Some("some-external-or-filtered-id"), filename = Some("foo.bar"))
    val out = MetadataOps.assignHashIds(Seq(orphan))
    assert(out.head.metadata.parent_id.contains("some-external-or-filtered-id"))
    // and the id itself is a 32-hex content hash, never a 36-char UUID
    // (test_metadata.py:521-540's length pin)
    assert(out.head.element_id.length == 32 &&
      out.head.element_id.forall(c => c.isDigit || ('a' to 'f').contains(c)))
  }

  // -- test_id_to_hash_calculates (:758) — the parametrized digest table --
  test("id_to_hash digest table: pdf with pages, txt without") {
    def one(t: String, seqOnPage: Int, filename: String, page: Option[Int]): String = {
      // seed earlier same-page elements so the target lands at seqOnPage
      val fillers = (0 until seqOnPage).map(i =>
        text(s"filler$i", page = page, filename = Some(filename)))
      MetadataOps.assignHashIds(fillers :+ text(t, page = page,
        filename = Some(filename))).last.element_id
    }
    assert(one("foo", 1, "foo.pdf", Some(1)) == "4bb264eb23ceb44cd8fcc5af44f8dc71")
    assert(one("foo", 2, "foo.pdf", Some(1)) == "75fc1de48cf724ec00aa8d1c5a0d3758")
    assert(one("some text", 0, "some.txt", None) == "1a2627b5760c06b1440102f11a1edb0f")
    assert(one("some text", 1, "some.txt", None) == "e3fd10d867c4a1c0264dde40e3d7e45a")
  }

  // -- test_Text_element_assigns_id_hashes_that_are_unique_and_deterministic
  // (test_text.py:374) — the no-filename no-page "hello" vector
  test("partition_text-style ids match the reference hello vector") {
    val els = (0 until 3).map(_ => text("hello", page = None, filename = None))
    assert(MetadataOps.assignHashIds(els).map(_.element_id) == Seq(
      "8657c0ec31a4cfc822f6cd4a5684cafd",
      "72aefb4a12be063ad160931fdb380163",
      "ba8c1a216ca585aecdd365a72e6124f1"))
  }

  // -- test_Text_element_assings_UUID_when_unique_element_ids_is_True (:383)
  test("unique_element_ids=true assigns distinct v4 UUIDs") {
    val els = (0 until 3).map(_ => text("hello", page = None, filename = None))
    val ids = MetadataOps.assignHashIds(els, uniqueIds = true).map(_.element_id)
    assert(ids.distinct.size == 3)
    ids.foreach { id =>
      val u = java.util.UUID.fromString(id)
      assert(u.version == 4, id)
    }
  }
}
