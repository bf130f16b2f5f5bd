package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuiteBase

class AutoSourceSpec extends SparkSuiteBase {

  test("partitionFiles routes mixed formats and recurses into email attachments") {
    val dir = Files.createTempDirectory("graft-auto").toString
    Files.write(Paths.get(dir, "page.html"),
      "<html><body><h1>Doc Title</h1><p>page body text</p></body></html>".getBytes)
    Files.write(Paths.get(dir, "table.csv"), "a,b\n1,2".getBytes)
    val eml =
      "From: a@b.com\r\nTo: c@d.com\r\nSubject: S\r\n" +
        "Content-Type: multipart/mixed; boundary=\"B\"\r\n\r\n" +
        "--B\r\nContent-Type: text/plain\r\n\r\nemail body here\r\n" +
        "--B\r\nContent-Type: text/csv\r\n" +
        "Content-Disposition: attachment; filename=\"data.csv\"\r\n\r\nx,y\n3,4\r\n--B--\r\n"
    Files.write(Paths.get(dir, "mail.eml"), eml.getBytes)

    val out = AutoSource.partitionFiles(spark, dir, processAttachments = true)
      .select("doc_id", "filetype", "element_type", "text", "attached_to_filename")
      .collect()
    def rowsOf(suffix: String) = out.filter(_.getString(0).contains(suffix))

    assert(rowsOf("page.html").exists(r =>
      r.getString(2) == "Title" && r.getString(3) == "Doc Title"))
    assert(rowsOf("table.csv").exists(r =>
      r.getString(1) == "text/csv" && r.getString(2) == "Table"))
    assert(rowsOf("mail.eml").exists(_.getString(3) == "email body here"))
    // attachment partitioned recursively, marked with the parent path
    val att = out.filter(_.getString(0).endsWith("!data.csv"))
    assert(att.length == 1)
    assert(att(0).getString(2) == "Table" && att(0).getString(3) == "x y 3 4")
    assert(att(0).getString(4) != null && att(0).getString(4).endsWith("mail.eml"))
  }
}
