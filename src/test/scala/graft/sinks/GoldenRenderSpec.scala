package graft.sinks

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{functions => F}

import graft.SparkSuiteBase
import graft.model.Element

/**
 * Render-compat against the reference's own ingest render goldens: the
 * `expected-structured-output-markdown/` and `-html/` corpora are
 * `elements_to_md` / `elements_to_html` outputs of the matching JSON wire
 * goldens (`create_file_from_elements`, `staging/base.py:353-400`;
 * `check-diff-expected-output-{markdown,html}.sh`). We rehydrate the JSON,
 * render with OUR sinks, and require byte-equality — pinning the renderers
 * against reference output, not just the JSON wire.
 */
class GoldenRenderSpec extends SparkSuiteBase {

  private val root = "/root/reference/test_unstructured_ingest/"

  /** (json, md, html) triples spanning txt/html/csv/eml/docx/xlsx/xml/pdf
    * partitioners plus the db-connector element dumps. */
  private val triples = Seq(
    "gcs/nested-1/fake-text.txt",
    "Sharepoint/ideas-page.html",
    "s3-minio/wiki_movie_plots_small.csv",
    "outlook/21be155fb0c95885.eml",
    "outlook/497eba8c81c801c6.eml",
    "google-drive/test-drive-doc.docx",
    "Sharepoint/stanley-cups.xlsx",
    "elasticsearch/movies-0-57554198",
    "mongodb/659daefa21dd8c9054b084b6",
    "confluence-diff/MFS/1540126",
    "salesforce/Campaign/701Hu000001eX9EIAU.xml",
    "salesforce/EmailMessage/02sHu00001efErPIAU.eml",
    "azure/rfc854.txt",
    "delta-table/0-9d594ee0-ad36-4e7e-a6be-f53975fe3d10-0",
    "github/LICENSE.txt",
    "github/test.html",
    "notion/122b2c22-996b-435b-9de2-ee0e9d2b04bc",
    "hubspot/products/2362691415",
    "jira-diff/1/10000",
    "discord/1099442333440802930",
    "kafka/fake-topic",
    "slack/C07ABKJ83C6",
    "onedrive/utic-test-ingest-fixtures/fake-text.txt",
    "local-single-file/UDHR_first_article_all.txt",
    // Formula display-math auto-style (staging/base.py:43-164)
    "s3/page-with-formula.pdf",
    // hi_res PDFs with tables, figures, forms
    "azure/IRS-form-1987.pdf",
    "azure/Core-Skills-for-Biomedical-Data-Scientists-2-pages.pdf",
    "azure/spring-weather.html",
    "local-single-file-with-pdf-infer-table-structure/layout-parser-paper.pdf",
    "local-single-file-with-pdf-infer-table-structure/layout-parser-paper-with-table.jpg",
    "local-single-file-chunk-no-orig-elements/multi-column-2p.pdf",
    "local-single-file-basic-chunking/handbook-1p.docx",
    "local-single-file-with-encoding/fake-html-cp1252.html",
    "Sharepoint/nested/page-with-formula.pdf",
    "Sharepoint/nested/2023-Jan-economic-outlook.pdf",
    "Sharepoint/SitePages/Home.aspx",
    "s3/Silent-Giant-(1).pdf",
    "s3/recalibrating-risk-report.pdf",
    "box/science-exploration-1p.pptx",
    "dropbox/handbook-1p.docx",
    "onedrive/utic-test-ingest-fixtures/tests-example.xls",
    "biomed-path/07/07/sbaa031.073.PMC7234218.pdf",
    "google-drive/fake.docx",
    // connector dumps: tables (airtable/astradb), nested lists (notion),
    // issue/ticket trees (jira/confluence/hubspot)
    "airtable-diff/app5YQxSfp220fWtm/tblBoUk54tWXGqYai",
    "astradb/25b75f1d-a2ea-4c97-b75f-1da2eadc97f7.csv",
    "notion/438dbc49-2e06-4f01-8031-bf283be58a60",
    "notion/8d8bee42-2167-441c-af6c-7b2cff268809",
    "hubspot/tickets/1976928828",
    "jira-diff/JCTP2/10006",
    "confluence-diff/testteamsp/1867777",
    "outlook/4a16a411f162ebbb.eml",
    "salesforce/Campaign/701Hu000001eX9FIAU.xml")

  private def read(p: String): String =
    new String(Files.readAllBytes(Paths.get(root + p)), "UTF-8")

  /** Rehydrate with array order preserved as `seq` (one multiLine file reads
    * as a single ordered partition; the reference renders in list order). */
  private def readGolden(rel: String): org.apache.spark.sql.Dataset[Element] = {
    val df = ElementSink
      .readWireJson(spark, root + "expected-structured-output/" + rel + ".json",
        multiLine = true)
      .coalesce(1)
      .withColumn("doc_id", F.lit(rel))
      .withColumn("seq", F.monotonically_increasing_id())
    ElementSink.fromWire(df)
  }

  test("markdown goldens: our elements_to_md matches the reference's .md output byte-for-byte") {
    triples.foreach { rel =>
      val got = ElementSink.elementsToMd(readGolden(rel))
        .select("markdown").collect().headOption.map(_.getString(0))
        .getOrElse("") // zero-element doc renders as empty markdown
      val expected = read("expected-structured-output-markdown/" + rel + ".md")
      assert(got == expected, s"$rel markdown diverged")
    }
  }

  test("html goldens: our elements_to_html matches the reference's .html output byte-for-byte") {
    triples.foreach { rel =>
      val els = readGolden(rel).toDF()
        .select(F.lit(0L).as("doc_id"), F.col("seq"), F.col("element_id"),
          F.col("type").as("element_type"), F.col("text"),
          F.col("metadata.parent_id").as("parent_id"),
          F.col("metadata.page_number").as("page_number"),
          F.col("metadata.category_depth").as("category_depth"),
          F.col("metadata.text_as_html").as("text_as_html"),
          F.col("metadata.image_base64").as("image_base64"),
          F.col("metadata.image_mime_type").as("image_mime"),
          F.col("metadata.url").as("url"))
      val got = ElementsToHtml.elementsToHtml(els, noGroupByPage = true)
        .select("html").collect().headOption.map(_.getString(0))
        .getOrElse(ElementsToHtml.emptyDocumentHtml) + "\n"
      val expected = read("expected-structured-output-html/" + rel + ".html")
      assert(got == expected, s"$rel html diverged")
    }
  }
}
