package graft.sinks

import org.apache.spark.sql.{functions => F}

import graft.SparkSuiteBase
import graft.model.Element

/**
 * Wire-compat against the reference's own ingest goldens
 * (`/root/reference/test_unstructured_ingest/expected-structured-output/`, the
 * corpus its `check-diff-expected-output.sh` pins): each file is a JSON array of
 * sparse elements as the reference serialized them. We rehydrate with the
 * schema-first reader, re-serialize with [[ElementJson]], parse our own output
 * back, and require the fixpoint — plus spot-asserts that reference-written
 * values (ids, languages, data_source, coordinates, tables, email routing)
 * survive the trip and that the writer stays sparse (no null fields emitted).
 */
class GoldenWireSpec extends SparkSuiteBase {

  private val root = "/root/reference/test_unstructured_ingest/expected-structured-output/"

  /** One golden per partitioner family the engine implements. */
  private val goldens = Seq(
    "local-single-file/UDHR_first_article_all.txt.json",
    "Sharepoint/ideas-page.html.json",
    "Sharepoint/permissions-fake-text.docx.json",
    "s3-minio/wiki_movie_plots_small.csv.json",
    "outlook/21be155fb0c95885.eml.json",
    "dropbox/science-exploration-1p.pptx.json",
    "Sharepoint/stanley-cups.xlsx.json",
    "salesforce/Campaign/701Hu000001eX9EIAU.xml.json",
    "Sharepoint/nested/2023-Jan-economic-outlook.pdf.json",
    "google-drive/fake.docx.json",
    // round-8 widening: permissions-bearing variants, formula PDF, more
    // DOCX/HTML/TXT families, and the db-connector element dumps
    "Sharepoint-with-permissions/permissions-fake-text.docx.json",
    "Sharepoint-with-permissions/fake-text.txt.json",
    "Sharepoint-with-permissions/stanley-cups.xlsx.json",
    "Sharepoint-with-permissions/SitePages/This-is-a-title.aspx.json",
    "azure/spring-weather.html.json",
    "azure/rfc854.txt.json",
    "azure/IRS-form-1987.pdf.json",
    "s3/page-with-formula.pdf.json",
    "box/handbook-1p.docx.json",
    "google-drive/test-drive-doc.docx.json",
    "elasticsearch/movies-0-57554198.json",
    "delta-table/0-9d594ee0-ad36-4e7e-a6be-f53975fe3d10-0.json",
    "confluence-diff/MFS/1540126.json",
    "astradb/25b75f1d-a2ea-4c97-b75f-1da2eadc97f7.csv.json",
    "mongodb/659daefa21dd8c9054b084b6.json",
    // round-9 widening: more eml (outlook + salesforce EmailMessage), the
    // connector dumps whose renders GoldenRenderSpec pins (notion, hubspot,
    // jira, discord, kafka, slack), nested onedrive/gcs txt, github html,
    // and the formula PDF
    "outlook/497eba8c81c801c6.eml.json",
    "outlook/4a16a411f162ebbb.eml.json",
    "salesforce/EmailMessage/02sHu00001efErPIAU.eml.json",
    "salesforce/EmailMessage/02sHu00001efErQIAU.eml.json",
    "notion/122b2c22-996b-435b-9de2-ee0e9d2b04bc.json",
    "hubspot/products/2362691415.json",
    "hubspot/tickets/1976928828.json",
    "jira-diff/1/10000.json",
    "discord/1099442333440802930.json",
    "kafka/fake-topic.json",
    "slack/C07ABKJ83C6.json",
    "onedrive/utic-test-ingest-fixtures/fake-text.txt.json",
    "gcs/nested-1/fake-text.txt.json",
    "github/test.html.json",
    "s3/2023-Jan-economic-outlook.pdf.json")

  /** Rehydrate a golden array file; the engine-added doc_id/seq (implicit in the
    * reference: file scope + array order) are filled deterministically. */
  private def readGolden(rel: String): Seq[Element] = {
    val df = ElementSink.readWireJson(spark, root + rel, multiLine = true)
      .withColumn("doc_id", F.coalesce(F.col("doc_id"), F.lit(rel)))
      .withColumn("seq", F.coalesce(F.col("seq"), F.lit(0L)))
    ElementSink.fromWire(df).collect().toSeq
  }

  private def sorted(els: Seq[Element]): Seq[Element] =
    els.sortBy(e => (e.element_id, e.`type`, e.text))

  test("golden fixpoint: reference wire -> model -> our writer -> our reader is lossless") {
    goldens.foreach { g =>
      val once = readGolden(g)
      assert(once.nonEmpty, s"$g rehydrated empty")
      val lines = once.map(ElementJson.elementJson)
      val back = ElementSink.parseNdjson(spark, lines).collect().toSeq
      assert(sorted(back) == sorted(once), s"$g did not round-trip")
    }
  }

  test("golden corpus volume: hundreds of reference-written elements survive") {
    val total = goldens.map(readGolden(_).size).sum
    assert(total > 600)
  }

  test("reference-written values survive the trip (UDHR txt)") {
    val els = readGolden("local-single-file/UDHR_first_article_all.txt.json")
    assert(els.size == 526)
    val head = els.find(_.element_id == "f604d94aa69cf0073e13e3be1dced533").get
    assert(head.`type` == "Title")
    assert(head.text.startsWith("Universal Declaration of Human Right"))
    assert(head.metadata.languages.contains(Seq("ind", "est")))
    assert(head.metadata.filetype.contains("text/plain"))
    val ds = head.metadata.data_source.get
    assert(ds.record_locator.get("path").endsWith("language-docs/UDHR_first_article_all.txt"))
    assert(ds.permissions_data.contains(Seq(Map("mode" -> "33188"))))
  }

  test("writer stays sparse on golden elements: absent fields are omitted, never null") {
    val els = readGolden("local-single-file/UDHR_first_article_all.txt.json")
    val line = ElementJson.elementJson(els.head)
    assert(line.contains("\"languages\""))
    assert(line.contains("\"filetype\""))
    assert(line.contains("\"permissions_data\":[{\"mode\":33188}]"))
    assert(!line.contains(":null"), s"writer emitted a null: $line")
    assert(!line.contains("page_number") && !line.contains("coordinates") &&
      !line.contains("text_as_html"))
  }

  test("connector permissions_data round-trips arbitrary value types (gdrive)") {
    // the gdrive golden's permission dicts carry string/bool values (id, role,
    // emailAddress, deleted) — the raw-JSON-token representation must hold them
    // all, not just the local-filesystem [{"mode": int}] shape
    val els = readGolden("google-drive/fake.docx.json")
    val pd = els.head.metadata.data_source.get.permissions_data.get
    assert(pd.size >= 3)
    // raw-token values: strings keep their quotes, bools their literal text
    assert(pd.exists(m => m.get("role").contains("\"reader\"")))
    assert(pd.exists(m => m.get("emailAddress").exists(_.contains("@"))))
    assert(pd.exists(m => m.get("deleted").contains("false")))
    // the golden's numeric-looking ids are STRINGS (one even has a leading zero,
    // which would be a JSON syntax error if re-emitted bare) — they must stay quoted
    assert(pd.exists(m => m.get("id").contains("\"03887347926440898356\"")))
    // writer re-emits bools/strings with their JSON types intact
    val line = ElementJson.elementJson(els.head)
    assert(line.contains("\"role\":\"reader\""))
    assert(line.contains("\"deleted\":false"))
    assert(line.contains("\"id\":\"03887347926440898356\""))
  }

  test("layout metadata survives: PDF coordinates and page numbers") {
    val els = readGolden("Sharepoint/nested/2023-Jan-economic-outlook.pdf.json")
    val withCoords = els.filter(_.metadata.coordinates.exists(_.points.nonEmpty))
    assert(withCoords.nonEmpty)
    assert(els.exists(_.metadata.page_number.isDefined))
    val lines = withCoords.take(5).map(ElementJson.elementJson)
    val back = ElementSink.parseNdjson(spark, lines).collect().toSeq
    assert(sorted(back) == sorted(withCoords.take(5)))
  }

  test("legacy pandas render reproduces the old-era XLSX golden's text_as_html bytes") {
    val els = readGolden("Sharepoint/stanley-cups.xlsx.json")
    val golden = els.find(e => e.`type` == "Table" && e.metadata.text_as_html.isDefined)
      .get.metadata.text_as_html.get
    val matrix = Seq(
      Seq("Team", "Location", "Stanley Cups"),
      Seq("Blues", "STL", "1"),
      Seq("Flyers", "PHI", "2"),
      Seq("Maple Leafs", "TOR", "13"))
    assert(graft.sources.Partitioners.pandasTableHtml(matrix) == golden)
  }

  test("compact render and table text match the current-era CSV golden byte-for-byte") {
    val els = readGolden("s3-minio/wiki_movie_plots_small.csv.json")
    val table = els.find(_.`type` == "Table").get
    val html = table.metadata.text_as_html.get
    // parse the golden's own cells back out, re-render, require the byte fixpoint
    val rows = "(?s)<tr>(.*?)</tr>".r.findAllMatchIn(html).map { tr =>
      "(?s)<td>(.*?)</td>|<td/>".r.findAllMatchIn(tr.group(1)).map(c =>
        Option(c.group(1)).getOrElse("").replace("<br/>", "\n")
          .replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")).toSeq
    }.toSeq
    assert(rows.nonEmpty)
    assert(graft.sources.Partitioners.htmlifyMatrix(rows) == html)
    assert(graft.sources.Partitioners.tableText(rows) == table.text)
  }

  test("table and email metadata survive: XLSX text_as_html, EML routing headers") {
    val xlsx = readGolden("Sharepoint/stanley-cups.xlsx.json")
    // pandas-style render: `<table border="1" class="dataframe">` (DataFrame.to_html)
    assert(xlsx.exists(_.metadata.text_as_html.exists(
      _.startsWith("<table border=\"1\" class=\"dataframe\">"))))
    val eml = readGolden("outlook/21be155fb0c95885.eml.json")
    assert(eml.exists(e => e.metadata.sent_from.isDefined || e.metadata.sent_to.isDefined ||
      e.metadata.subject.isDefined))
  }

  test("Formula elements and their text survive (page-with-formula PDF)") {
    val els = readGolden("s3/page-with-formula.pdf.json")
    val formula = els.find(_.`type` == "Formula").get
    assert(formula.element_id == "2f5b0b2ffa8872dde498f34cd4af6bd9")
    assert(formula.text.startsWith("MultiHead(Q, K, V )"))
    assert(formula.metadata.page_number.contains(1))
    val back = ElementSink.parseNdjson(spark,
      Seq(ElementJson.elementJson(formula))).collect().toSeq
    assert(back == Seq(formula))
  }

  test("db-connector element dumps round-trip (elasticsearch, delta-table, mongodb)") {
    Seq("elasticsearch/movies-0-57554198.json",
      "delta-table/0-9d594ee0-ad36-4e7e-a6be-f53975fe3d10-0.json",
      "mongodb/659daefa21dd8c9054b084b6.json").foreach { g =>
      val els = readGolden(g)
      assert(els.nonEmpty, s"$g empty")
      // every element must carry the connector's data_source through the trip
      val lines = els.map(ElementJson.elementJson)
      val back = ElementSink.parseNdjson(spark, lines).collect().toSeq
      assert(sorted(back) == sorted(els), s"$g did not round-trip")
    }
  }
}
