package graft.sinks

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{functions => F}

import graft.SparkSuiteBase

/**
 * Exhaustive render parity: EVERY (json, md, html) golden triple under the
 * reference's `expected-structured-output*` trees — all 172 fixtures across
 * every connector — re-renders byte-identically through `elements_to_md` and
 * `elements_to_html`. (GoldenRenderSpec keeps a curated per-fixture list for
 * faster failure diagnostics; this sweep guards the full corpus.)
 */
class GoldenRenderFullSweepSpec extends SparkSuiteBase {
  private val root = "/root/reference/test_unstructured_ingest/"

  test("all 172 reference render goldens reproduce byte-identically") {
    import scala.jdk.CollectionConverters._
    val mdRoot = Paths.get(root + "expected-structured-output-markdown")
    val all = Files.walk(mdRoot).iterator().asScala
      .filter(p => p.toString.endsWith(".md"))
      .map(p => mdRoot.relativize(p).toString.stripSuffix(".md"))
      .toVector.sorted
    var okMd = 0
    var okHtml = 0
    var missing = 0
    val failMd = Vector.newBuilder[String]
    val failHtml = Vector.newBuilder[String]
    all.foreach { rel =>
      val json = Paths.get(root + "expected-structured-output/" + rel + ".json")
      val html = Paths.get(root + "expected-structured-output-html/" + rel + ".html")
      if (!Files.exists(json) || !Files.exists(html)) missing += 1
      else {
        val df = ElementSink.readWireJson(spark, json.toString, multiLine = true)
          .coalesce(1).withColumn("doc_id", F.lit(rel))
          .withColumn("seq", F.monotonically_increasing_id())
        val els = ElementSink.fromWire(df)
        val gotMd = ElementSink.elementsToMd(els)
          .select("markdown").collect().headOption.map(_.getString(0)).getOrElse("")
        val expMd = new String(Files.readAllBytes(
          Paths.get(root + "expected-structured-output-markdown/" + rel + ".md")), "UTF-8")
        if (gotMd == expMd) okMd += 1 else failMd += rel
        val htmlIn = els.toDF()
          .select(F.lit(0L).as("doc_id"), F.col("seq"), F.col("element_id"),
            F.col("type").as("element_type"), F.col("text"),
            F.col("metadata.parent_id").as("parent_id"),
            F.col("metadata.page_number").as("page_number"),
            F.col("metadata.category_depth").as("category_depth"),
            F.col("metadata.text_as_html").as("text_as_html"),
            F.col("metadata.image_base64").as("image_base64"),
            F.col("metadata.image_mime_type").as("image_mime"),
            F.col("metadata.url").as("url"))
        val gotHtml = ElementsToHtml.elementsToHtml(htmlIn, noGroupByPage = true)
          .select("html").collect().headOption.map(_.getString(0))
          .getOrElse(ElementsToHtml.emptyDocumentHtml) + "\n"
        val expHtml = new String(Files.readAllBytes(html), "UTF-8")
        if (gotHtml == expHtml) okHtml += 1 else failHtml += rel
      }
    }
    assert(missing == 0, s"$missing fixtures missing a json/html sibling")
    assert(okMd == all.size,
      s"markdown diverged for: ${failMd.result().take(10).mkString(", ")}")
    assert(okHtml == all.size,
      s"html diverged for: ${failHtml.result().take(10).mkString(", ")}")
  }
}
