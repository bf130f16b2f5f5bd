package graft.operators

import graft.SparkSuiteBase
import graft.model.{Element, ElementMetadata, ElementType}
import graft.sinks.Staging
import graft.sources.{FileType, HtmlPartitioner, Partitioners}

/** Registries, staging reshapes, multimodal plumbing, remaining cleaners, table eval. */
class ExtensionSpec extends SparkSuiteBase {

  private def els = Seq(
    Element("i1", ElementType.Title, "A Title", "d1", 1,
      ElementMetadata(filename = Some("f.txt"))),
    Element("i2", ElementType.NarrativeText, ("word " * 600).trim, "d1", 2))

  test("cleaner registry composes named cleaners over the text column") {
    import spark.implicits._
    val ds = Seq(Element("x", "NarrativeText", "  Hello   world;:, ", "d", 1)).toDS()
    val out = Registries.applyCleaners(ds,
      Seq("clean_extra_whitespace", "clean_trailing_punctuation"))
    assert(out.collect()(0).text == "Hello world")
    intercept[IllegalArgumentException] { Registries.applyCleaners(ds, Seq("nope")) }
  }

  test("chunker registry dispatches and accepts custom strategies") {
    import spark.implicits._
    val ds = Seq(Element("", ElementType.Title, "T", "d", 1),
      Element("", ElementType.NarrativeText, "body", "d", 2)).toDS()
    assert(Registries.chunk(ds, "by_title").collect().length == 1)
    Registries.registerChunkingStrategy("noop", (d, _) => d)
    assert(Registries.chunk(ds, "noop").collect().length == 2)
    // -- it_raises_when_the_requested_chunking_strategy_is_not_registered
    // -- (chunking/test_dispatch.py:53-58), reference's exact message --
    val e = intercept[IllegalArgumentException](Registries.chunk(ds, "foobar"))
    assert(e.getMessage.contains("unrecognized chunking strategy 'foobar'"))
  }

  test("partitioner registry overrides the auto router") {
    Registries.registerPartitioner(FileType.Rst,
      _ => Seq(HtmlPartitioner.RawPara("custom rst", Some("Title"))))
    val (ft, ps) = Partitioners.partitionAuto("doc.rst", "anything".getBytes)
    assert(ft == FileType.Rst && ps.head.text == "custom rst")
  }

  // -- test_auto_partition_works_with_custom_types (test_auto.py:1444) +
  // -- create_file_type/register_partitioner (file_utils/model.py:559) --
  test("a created custom FileType resolves and routes through partition()") {
    val foo = FileType.createFileType("foo", "application/foo", Seq(".foo"))
    // the custom type joins extension and mime resolution (params stripped)
    assert(FileType.fromExtension(".foo").contains(foo))
    assert(FileType.fromExtension("FOO").contains(foo))
    assert(FileType.fromMimeType("application/foo; charset=utf-8").contains(foo))
    // and its canonical mime is what partition() records
    assert(Partitioners.recordedFiletype(None, foo).contains("application/foo"))
    // register_partitioner: the loader returns it, and the router dispatches
    // on an asserted content type (the reference detector's first strategy)
    Registries.registerPartitioner(foo, bytes =>
      Seq(HtmlPartitioner.RawPara(
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8).toUpperCase,
        Some("Title"))))
    assert(Registries.partitioner(foo).isDefined)
    val (ft, ps) = Partitioners.partitionAuto("report.foo", "hello foo".getBytes,
      contentType = Some("application/foo"))
    assert(ft == foo && ps.head.text == "HELLO FOO")
    // built-in names stay protected — shipped-format detection is invariant
    intercept[IllegalArgumentException](
      FileType.createFileType("pdf", "application/x-not-pdf", Seq(".pdf2")))
  }

  test("stage_for_transformers splits long narrative text by attention window") {
    import spark.implicits._
    val out = Staging.stageForTransformers(els.toDS(), maxInputSize = 102, buffer = 2)
      .collect()
    val title = out.filter(_.`type` == ElementType.Title)
    val chunks = out.filter(_.`type` == ElementType.NarrativeText)
    assert(title.length == 1 && title(0).text == "A Title")
    assert(chunks.length == 6) // 600 words / 100-word window
    assert(chunks.forall(_.text.split(" ").length <= 100))
  }

  test("weaviate/prodigy/label-studio reshapes project the element frame") {
    import spark.implicits._
    val ds = els.toDS()
    val w = Staging.stageForWeaviate(ds).collect()
    assert(w.map(_.getAs[String]("category")).toSet == Set("Title", "NarrativeText"))
    val p = Staging.stageForProdigy(ds).collect()
    assert(p(0).getStruct(1).getAs[String]("id") == "i1")
    val l = Staging.stageForLabelStudio(ds).collect()
    assert(l(0).getStruct(0).getAs[String]("ref_id") == "i1")
  }

  test("multimodal: feature extraction and frame sampling plumbing") {
    import spark.implicits._
    val df = Seq(("v1", "0123456789abcdef" * 8, 7.0))
      .toDF("id", "payload_str", "duration")
      .withColumn("payload", org.apache.spark.sql.functions.col("payload_str")
        .cast("binary"))
    val feats = MultimodalOps.extractFeatures(df, "payload", dim = 8).collect()
    assert(feats(0).getAs[scala.collection.Seq[Float]]("features").length == 8)
    // deterministic across runs
    val feats2 = MultimodalOps.extractFeatures(df, "payload", dim = 8).collect()
    assert(feats(0).getAs[scala.collection.Seq[Float]]("features").toSeq ==
      feats2(0).getAs[scala.collection.Seq[Float]]("features").toSeq)
    val frames = MultimodalOps.sampleFrames(df, everyNSeconds = 2, durationCol = "duration")
    assert(frames.collect().length == 4) // t = 0, 2, 4, 6
  }

  test("multimodal: image header decode parses PNG/GIF and falls back elsewhere") {
    import spark.implicits._
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13) ++ "IHDR".getBytes ++
      Array[Byte](0, 0, 1, 0x2c, 0, 0, 0, 0x96.toByte, 8, 2, 0, 0, 0) // 300x150 rgb
    val gif = "GIF89a".getBytes ++ Array[Byte](0x40, 0x01, 0xf0.toByte, 0) // 320x240 LE
    val other = "notanimage".getBytes
    val df = Seq(("png", png), ("gif", gif), ("other", other)).toDF("id", "payload")
    val out = MultimodalOps.decodeImageMeta(df).collect()
      .map(r => r.getAs[String]("id") -> r.getStruct(2)).toMap
    assert(out("png").getAs[Int]("width") == 300)
    assert(out("png").getAs[Int]("height") == 150)
    assert(out("png").getAs[Int]("n_channels") == 3)
    assert(out("png").getAs[String]("format") == "png")
    assert(out("gif").getAs[Int]("width") == 320)
    assert(out("gif").getAs[Int]("height") == 240)
    assert(out("gif").getAs[String]("format") == "gif")
    assert(out("other").getAs[String]("format") == "unknown")
    assert(out("other").getAs[Int]("width") >= 1) // deterministic stub dims
  }

  test("multimodal: JPEG marker walk finds SOF dimensions") {
    // SOI, APP0 (JFIF, 16 bytes), DQT (dummy 4 bytes), SOF0 with 640x480
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array[Byte](0xff.toByte, 0xe0.toByte, 0, 16) ++ new Array[Byte](14) ++
      Array[Byte](0xff.toByte, 0xdb.toByte, 0, 4) ++ new Array[Byte](2) ++
      Array[Byte](0xff.toByte, 0xc0.toByte, 0, 11, 8,
        0x01, 0xe0.toByte, // height 480
        0x02, 0x80.toByte, // width 640
        1, 0x11, 0, 0)
    assert(MultimodalOps.jpegDims(jpeg) == Some((640, 480)))
    assert(MultimodalOps.jpegDims("nope".getBytes) == None)
    assert(MultimodalOps.jpegDims(Array(0xff.toByte, 0xd8.toByte)) == None)
  }

  test("multimodal: STT segmentation follows clip duration") {
    import spark.implicits._
    val df = Seq(("a", 12.0), ("b", 3.0)).toDF("id", "duration")
      .withColumn("payload", org.apache.spark.sql.functions.lit("x").cast("binary"))
    val segs = MultimodalOps.transcribeAudio(df, "duration").collect()
      .groupBy(_.getAs[String]("id"))
    assert(segs("a").length == 3) // ceil(12/5)
    assert(segs("a").map(_.getAs[Double]("segment_end_seconds")).max == 12.0)
    assert(segs("b").length == 1)
    assert(segs("b")(0).getAs[Double]("segment_end_seconds") == 3.0)
  }

  test("mime-encoding and bytes-string cleaners") {
    import graft.functions.Cleaners
    assert(Cleaners.replaceMimeEncodings("Caf=C3=A9") == "Café")
    assert(Cleaners.bytesStringToString("CafÃ©") == "Café")
  }

  test("table eval scores cell-level similarity") {
    val gold = "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"
    val predGood = gold
    val predOneOff =
      "<table><tr><td>X</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"
    assert(MetricsOps.tableEvalScore(gold, predGood) == 1.0)
    assert(MetricsOps.tableEvalScore(gold, predOneOff) == 0.75)
    assert(MetricsOps.tableEvalScore(gold, "<table></table>") == 0.0)
    // content-only ignores position
    val shuffled =
      "<table><tr><td>d</td><td>c</td></tr><tr><td>b</td><td>a</td></tr></table>"
    assert(MetricsOps.tableEvalScore(gold, shuffled, contentOnly = true) == 1.0)
  }

  // -- partition_audio's model-free half: real WAV duration from the header
  test("multimodal: wav header duration matches the reference clip exactly") {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/example-docs/CantinaBand3.wav"))
    assert(MultimodalOps.wavDuration(bytes).contains(3.0))
    assert(MultimodalOps.wavDuration("not audio".getBytes).isEmpty)
    assert(MultimodalOps.wavDuration(bytes.take(20)).isEmpty)
  }
}
