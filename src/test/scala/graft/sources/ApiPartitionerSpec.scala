package graft.sources

import scala.collection.mutable

import graft.SparkSuiteBase
import ApiPartitioner.{ApiClient, ApiResponse, RetryConfig}

/** `partition_via_api` surface (`partition/api.py:24-237`) against a fake
  * transport — validation, base-url normalization, retry/backoff resolution
  * and loop, response dispatch, element rehydration. */
class ApiPartitionerSpec extends SparkSuiteBase {

  private val okBody =
    """[{"type": "NarrativeText", "element_id": "e1", "text": "hello api",
      |  "metadata": {"filetype": "text/plain", "languages": ["eng"]}},
      | {"type": "Title", "element_id": "e2", "text": "A Title",
      |  "metadata": {"filetype": "text/plain"}}]""".stripMargin

  private final class FakeClient(script: Seq[ApiResponse]) extends ApiClient {
    val calls = mutable.ArrayBuffer.empty[(String, String, String)]
    private var i = 0
    def post(url: String, apiKey: String, fileName: String,
        content: Array[Byte], params: Map[String, String]): ApiResponse = {
      calls += ((url, apiKey, fileName))
      val r = script(math.min(i, script.size - 1)); i += 1; r
    }
  }

  test("argument validation mirrors the reference's errors") {
    val c = new FakeClient(Seq(ApiResponse(200, okBody)))
    // neither filename nor file
    assert(ApiPartitioner.partitionViaApi(client = c).isLeft)
    // both filename and file
    assert(ApiPartitioner.partitionViaApi(fileName = Some("a.txt"),
      content = Some("x".getBytes), client = c).isLeft)
    // file without metadata_filename
    val noMeta = ApiPartitioner.partitionViaApi(content = Some("x".getBytes), client = c)
    assert(noMeta.swap.exists(_.contains("metadata_filename must be specified")))
    // metadata_filename + deprecated file_filename together
    val both = ApiPartitioner.partitionViaApi(content = Some("x".getBytes),
      metadataFilename = Some("a"), fileFilename = Some("b"), client = c)
    assert(both.swap.exists(_.contains("file_filename is marked for deprecation")))
    assert(c.calls.isEmpty) // validation errors never hit the wire
  }

  test("base url strips the /general/v0/general path as the reference does") {
    assert(ApiPartitioner.baseUrl("https://api.unstructured.io/general/v0/general") ==
      "https://api.unstructured.io")
    assert(ApiPartitioner.baseUrl("http://localhost:8000/general/v0/general") ==
      "http://localhost:8000")
    assert(ApiPartitioner.baseUrl("http://localhost:8000") == "http://localhost:8000")
  }

  test("retry config: None when unset, client defaults fill the rest") {
    assert(ApiPartitioner.getRetriesConfig().isEmpty)
    val cfg = ApiPartitioner.getRetriesConfig(retriesExponent = Some(2.0)).get
    assert(cfg == RetryConfig(3000L, 720000L, 2.0, 1800000L, connectionErrors = true))
  }

  test("non-200 surfaces the reference's status-code error; 200 returns the body") {
    val bad = new FakeClient(Seq(ApiResponse(422, "nope")))
    assert(ApiPartitioner.partitionViaApi(fileName = Some("a.txt"), client = bad) ==
      Left("Receive unexpected status code 422 from the API."))
    val ok = new FakeClient(Seq(ApiResponse(200, okBody)))
    assert(ApiPartitioner.partitionViaApi(fileName = Some("a.txt"), client = ok)
      .exists(_ == okBody))
    assert(ok.calls == Seq(("https://api.unstructured.io", "", "a.txt")))
  }

  test("5xx retries with exponential backoff until success, intervals capped") {
    val c = new FakeClient(Seq(ApiResponse(503, ""), ApiResponse(503, ""),
      ApiResponse(200, okBody)))
    val sleeps = mutable.ArrayBuffer.empty[Long]
    val out = ApiPartitioner.partitionViaApi(fileName = Some("a.txt"), client = c,
      retries = ApiPartitioner.getRetriesConfig(retriesInitialInterval = Some(100L),
        retriesExponent = Some(2.0)),
      sleep = sleeps += _)
    assert(out.isRight)
    assert(c.calls.size == 3)
    assert(sleeps.toSeq == Seq(100L, 200L)) // 100 * 2.0^n backoff
  }

  test("connection errors retry only when enabled, and give up past max elapsed") {
    // disabled: one call, immediate connection failure
    val c1 = new FakeClient(Seq(ApiResponse(0, "", connectionError = true)))
    val r1 = ApiPartitioner.partitionViaApi(fileName = Some("a.txt"), client = c1,
      retries = ApiPartitioner.getRetriesConfig(retriesConnectionErrors = Some(false)))
    assert(r1 == Left("Connection error from the API."))
    assert(c1.calls.size == 1)
    // enabled with a tiny elapsed budget: the loop stops once budget is spent
    var now = 0L
    val c2 = new FakeClient(Seq(ApiResponse(0, "", connectionError = true)))
    val r2 = ApiPartitioner.partitionViaApi(fileName = Some("a.txt"), client = c2,
      retries = ApiPartitioner.getRetriesConfig(
        retriesInitialInterval = Some(100L), retriesMaxElapsedTime = Some(250L)),
      sleep = ms => now += ms, clock = () => now)
    assert(r2.isLeft)
    assert(c2.calls.size >= 2 && c2.calls.size <= 4) // bounded, not infinite
  }

  test("partition_multiple_via_api batches one request and validates lengths") {
    val seen = mutable.ArrayBuffer.empty[Seq[String]]
    val batch = new ApiClient {
      def post(url: String, apiKey: String, fileName: String,
          content: Array[Byte], params: Map[String, String]): ApiResponse =
        fail("single post must not be called for a batch")
      override def postMultiple(url: String, apiKey: String,
          files: Seq[(String, Array[Byte])],
          params: Map[String, String]): ApiResponse = {
        seen += files.map(_._1)
        ApiResponse(200, "[[], []]")
      }
    }
    val ok = ApiPartitioner.partitionMultipleViaApi(
      fileNames = Seq("a.txt", "b.txt"),
      contents = Seq("x".getBytes, "y".getBytes), client = batch)
    assert(ok.exists(_ == "[[], []]"))
    assert(seen.toSeq == Seq(Seq("a.txt", "b.txt"))) // ONE request for both files
    // in-memory files demand matching metadata_filenames
    val noMeta = ApiPartitioner.partitionMultipleViaApi(fileNames = Seq.empty,
      contents = Seq("x".getBytes), client = batch)
    assert(noMeta.swap.exists(_.contains("metadata_filenames must be specified")))
    val badLen = ApiPartitioner.partitionMultipleViaApi(fileNames = Seq.empty,
      contents = Seq("x".getBytes), metadataFilenames = Some(Seq("a", "b")),
      client = batch)
    assert(badLen.swap.exists(_.contains("must have the same length")))
    val badCt = ApiPartitioner.partitionMultipleViaApi(fileNames = Seq("a.txt"),
      contents = Seq("x".getBytes), contentTypes = Some(Seq("t/a", "t/b")),
      client = batch)
    assert(badCt.swap.exists(_.contains("must have the same length")))
  }

  test("a 200 body rehydrates through the shared wire reader") {
    val c = new FakeClient(Seq(ApiResponse(200, okBody)))
    val els = ApiPartitioner.partitionViaApi(fileName = Some("a.txt"), client = c)
      .map(ApiPartitioner.elementsFromResponse(spark, _).collect().toSeq)
      .getOrElse(Seq.empty)
    assert(els.map(_.`type`) == Seq("NarrativeText", "Title"))
    assert(els.head.text == "hello api")
    assert(els.head.metadata.languages.contains(Seq("eng")))
  }
}
