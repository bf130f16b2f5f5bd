package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSuiteBase
import graft.model.{Element, ElementMetadata}
import graft.operators.MetadataOps

/**
 * `test_partition_pptx_hierarchy_sample_document` (`test_pptx.py:487-527`) —
 * the full (depth, parent_id, element_id) chain over the reference's
 * sample-presentation.pptx, through partition → hierarchy → hash-id
 * assignment. The expected ids are the REFERENCE's own hash values, so this
 * cross-checks the partitioner's element stream, the hierarchy ruleset, AND
 * the id formula (sha-256 of filename+text+page+seq-on-page) in one pass.
 */
class PptxHierarchySpec extends SparkSuiteBase {

  test("sample-presentation.pptx reproduces the reference's hierarchy and hash ids") {
    val paras = PptxPartitioner.partition(Files.readAllBytes(
      Paths.get("/root/reference/example-docs/sample-presentation.pptx")))
    // resolve untyped paragraphs through the production pptx cascade
    import spark.implicits._
    val els: Seq[Element] = paras.zipWithIndex.map { case (p, i) =>
      val tpe = p.elementType.getOrElse {
        Seq(p.text).toDF("text")
          .select(HtmlSource.classifierCascade(lit(p.classifier), col("text")))
          .collect().head.getString(0)
      }
      val depth =
        if (p.elementType.isEmpty && tpe == "Title" && p.classifier == "pptx")
          Some(p.categoryDepth.getOrElse(0) + 1)
        else p.categoryDepth
      // provisional unique ids stand in for the reference's UUIDs; the
      // hash-id pass remaps parent references through them
      Element(s"prov-$i", tpe, p.text, "d", i.toLong, ElementMetadata(
        filename = Some("sample-presentation.pptx"),
        page_number = p.pageNumber,
        category_depth = depth))
    }
    val finalEls = MetadataOps.assignHashIds(MetadataOps.setElementHierarchy(els))

    val expected = Seq(
      (Some(0), None, "b2859226ba1f9243fb3f1b2ace889f43"),
      (Some(1), Some("b2859226ba1f9243fb3f1b2ace889f43"), "d13f8827e94541c8b818b0df8f942526"),
      (None, None, "cbb95b030de22979af6bfa42969c8202"),
      (Some(0), None, "e535f799d1f0e79d6777efa873a16ce1"),
      (Some(1), Some("e535f799d1f0e79d6777efa873a16ce1"), "f02bbfb417ad60daa2ba35080e96262f"),
      (Some(0), Some("f02bbfb417ad60daa2ba35080e96262f"), "414dfce72ea53cd4649176af0d62a4c1"),
      (Some(1), Some("414dfce72ea53cd4649176af0d62a4c1"), "3d45a95c79473a07db4edca5534a7c49"),
      (Some(1), Some("414dfce72ea53cd4649176af0d62a4c1"), "a33333f527851f700ca175acd04b8a2c"),
      (Some(2), Some("a33333f527851f700ca175acd04b8a2c"), "6f1b87689e4da2b0fb865bc5f92d5702"),
      (Some(0), Some("f02bbfb417ad60daa2ba35080e96262f"), "3f58e0be3b8e8b15cba7adc4eae68586"),
      (None, None, "e5de1b503e64da424fb7d8113371e16d"),
      (Some(0), None, "8319096532fe2e55f66c491ea8313150"),
      (Some(0), Some("8319096532fe2e55f66c491ea8313150"), "17a7e78277ab131a627cb4538bab7390"),
      (Some(0), Some("8319096532fe2e55f66c491ea8313150"), "41a9e1d0390f4edd77181142ceae51bc"),
      (Some(1), Some("41a9e1d0390f4edd77181142ceae51bc"), "cbbc78ef38a035fd66f7b030dcf12f66"),
      (Some(1), Some("41a9e1d0390f4edd77181142ceae51bc"), "2a551e3cbe67561debe0da262a294f24"),
      (Some(2), Some("2a551e3cbe67561debe0da262a294f24"), "7a121a056eedb11ac8804d6fd17afc0c"),
      (Some(0), Some("8319096532fe2e55f66c491ea8313150"), "a24a3caf9853702cb73daae23020b7b4"),
      (Some(0), Some("8319096532fe2e55f66c491ea8313150"), "18367f334b5c8c4602ea413ab68ac35b"),
      (Some(0), Some("8319096532fe2e55f66c491ea8313150"), "7f647b1f0f20c3db40c36ab57d9a5550"),
      (Some(1), Some("7f647b1f0f20c3db40c36ab57d9a5550"), "591c24b41b53aba873188a0881d10961"),
      (Some(1), Some("7f647b1f0f20c3db40c36ab57d9a5550"), "6ec455f5f19782facf184886876c9a66"),
      (Some(2), Some("6ec455f5f19782facf184886876c9a66"), "5614b00c3f6bff23ebba1360e10f6428"),
      (Some(0), Some("8319096532fe2e55f66c491ea8313150"), "2f57a8d4182e6fd5bd5842b0a2d9841b"),
      (None, None, "4120066d251ba675ade42e8a167ca61f"),
      (None, None, "efb9d74b4f8be6308c9a9006da994e12"),
      (Some(0), None, "fd08cacbaddafee5cbacc02528536ee5"))

    val got = finalEls.map(e =>
      (e.metadata.category_depth, e.metadata.parent_id, e.element_id))
    assert(got == expected)
  }
}
