package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.Element

/**
 * `partition_via_api` (`/root/reference/unstructured/partition/api.py:24-237`)
 * re-expressed over an injectable transport seam. The hosted-API HTTP call is
 * the one genuinely network-bound piece (README non-goals); everything around
 * it — argument validation, base-url normalization, the retry/backoff config
 * resolution and loop, response dispatch, element rehydration — is pure and
 * runs offline, exercised by `ApiPartitionerSpec` with a fake client.
 *
 * Scale shape: the call is per-document and executor-side (the client is
 * `Serializable`), so a corpus partitions via API with an ordinary `flatMap`
 * over document bytes — no driver round-trips.
 */
object ApiPartitioner {

  val DefaultApiUrl = "https://api.unstructured.io/general/v0/general"

  // Default retry configuration taken from the client code (api.py:17-21)
  val DefaultRetriesInitialInterval = 3000L
  val DefaultRetriesMaxInterval = 720000L
  val DefaultRetriesExponent = 1.5
  val DefaultRetriesMaxElapsedTime = 1800000L
  val DefaultRetriesConnectionErrors = true

  /** One HTTP POST of the multipart partition request. Implementations decide
    * transport; the engine never opens sockets itself. */
  trait ApiClient extends Serializable {
    def post(url: String, apiKey: String, fileName: String,
        content: Array[Byte], params: Map[String, String]): ApiResponse
    /** One batched multipart POST carrying several files
      * (`partition_multiple_via_api`'s single request). */
    def postMultiple(url: String, apiKey: String,
        files: Seq[(String, Array[Byte])],
        params: Map[String, String]): ApiResponse =
      throw new UnsupportedOperationException(
        "this client does not support batched partitioning")
  }

  /** `connectionError=true` models a transport-level failure (no status). */
  final case class ApiResponse(statusCode: Int, body: String,
      connectionError: Boolean = false)

  /** Resolved `retries.RetryConfig` (`get_retries_config`, api.py:140-231):
    * None when every setting is unset (SDK-managed defaults), otherwise each
    * unset field takes the client default. */
  final case class RetryConfig(initialInterval: Long, maxInterval: Long,
      exponent: Double, maxElapsedTime: Long, connectionErrors: Boolean)

  def getRetriesConfig(
      retriesInitialInterval: Option[Long] = None,
      retriesMaxInterval: Option[Long] = None,
      retriesExponent: Option[Double] = None,
      retriesMaxElapsedTime: Option[Long] = None,
      retriesConnectionErrors: Option[Boolean] = None): Option[RetryConfig] =
    if (Seq(retriesInitialInterval, retriesMaxInterval, retriesExponent,
        retriesMaxElapsedTime, retriesConnectionErrors).forall(_.isEmpty)) None
    else Some(RetryConfig(
      retriesInitialInterval.getOrElse(DefaultRetriesInitialInterval),
      retriesMaxInterval.getOrElse(DefaultRetriesMaxInterval),
      retriesExponent.getOrElse(DefaultRetriesExponent),
      retriesMaxElapsedTime.getOrElse(DefaultRetriesMaxElapsedTime),
      retriesConnectionErrors.getOrElse(DefaultRetriesConnectionErrors)))

  /** `api_url[:-19] if "/general/v0/general" in api_url` (api.py:96-97). */
  def baseUrl(apiUrl: String): String =
    if (apiUrl.contains("/general/v0/general")) apiUrl.dropRight(19) else apiUrl

  /**
   * The full call: validate → resolve retries → POST with exponential backoff
   * on retryable failures (connection errors when enabled, HTTP 5xx/429 —
   * the SDK's backoff strategy) → return the 200 body, or Left with the
   * reference's error message. `sleep` is injectable so specs can count
   * backoff intervals without waiting.
   */
  def partitionViaApi(
      fileName: Option[String] = None,
      content: Option[Array[Byte]] = None,
      metadataFilename: Option[String] = None,
      fileFilename: Option[String] = None,
      apiUrl: String = DefaultApiUrl,
      apiKey: String = "",
      client: ApiClient,
      requestParams: Map[String, String] = Map.empty,
      retries: Option[RetryConfig] = None,
      sleep: Long => Unit = _ => (),
      clock: () => Long = () => 0L): Either[String, String] = {
    // exactly_one(filename=filename, file=file) — common/common.py
    if (fileName.isDefined == content.isDefined)
      return Left("Exactly one of filename and file must be specified.")
    if (metadataFilename.isDefined && fileFilename.isDefined)
      return Left("Only one of metadata_filename and file_filename is specified. " +
        "metadata_filename is preferred. file_filename is marked for deprecation.")
    val metaName = metadataFilename.orElse(fileFilename)
    if (content.isDefined && metaName.isEmpty)
      return Left("If file is specified in partition_via_api, " +
        "metadata_filename must be specified as well.")
    val name = fileName.orElse(metaName).get
    val bytes = content.getOrElse(Array.emptyByteArray)
    val url = baseUrl(apiUrl)

    def retryable(r: ApiResponse, cfg: RetryConfig): Boolean =
      (r.connectionError && cfg.connectionErrors) ||
        r.statusCode == 429 || (r.statusCode >= 500 && r.statusCode <= 599)

    var response = client.post(url, apiKey, name, bytes, requestParams)
    retries.foreach { cfg =>
      var interval = cfg.initialInterval
      val start = clock()
      while (retryable(response, cfg) &&
          clock() - start + interval <= cfg.maxElapsedTime) {
        sleep(interval)
        interval = math.min((interval * cfg.exponent).toLong, cfg.maxInterval)
        response = client.post(url, apiKey, name, bytes, requestParams)
      }
    }
    if (response.connectionError) Left("Connection error from the API.")
    else if (response.statusCode == 200) Right(response.body)
    else Left(s"Receive unexpected status code ${response.statusCode} from the API.")
  }

  /**
   * `partition_multiple_via_api` (`api.py:232-337`): one batched multipart
   * POST for several documents. Validation mirrors the reference — paired
   * content-type lengths, metadata_filenames required (and length-matched)
   * for in-memory files, the metadata/file_filenames conflict. On 200 the
   * caller receives the raw body (a list of element lists; a single-document
   * response degenerates to one list, exactly the quirk the reference
   * normalizes — `api.py:330-336`).
   */
  def partitionMultipleViaApi(
      fileNames: Seq[String],
      contents: Seq[Array[Byte]],
      contentTypes: Option[Seq[String]] = None,
      metadataFilenames: Option[Seq[String]] = None,
      fileFilenames: Option[Seq[String]] = None,
      apiUrl: String = DefaultApiUrl,
      apiKey: String = "",
      client: ApiClient,
      requestParams: Map[String, String] = Map.empty): Either[String, String] = {
    if (metadataFilenames.isDefined && fileFilenames.isDefined)
      return Left("Only one of metadata_filenames and file_filenames is specified. " +
        "metadata_filenames is preferred. file_filenames is marked for deprecation.")
    val metaNames = metadataFilenames.orElse(fileFilenames)
    if (contentTypes.exists(_.size != contents.size))
      return Left("content_types and files must have the same length.")
    if (fileNames.isEmpty) {
      if (metaNames.isEmpty)
        return Left("metadata_filenames must be specified if files are passed")
      if (metaNames.exists(_.size != contents.size))
        return Left("metadata_filenames and files must have the same length.")
    }
    val names = if (fileNames.nonEmpty) fileNames else metaNames.get
    val response = client.postMultiple(apiUrl, apiKey, names.zip(contents),
      requestParams)
    if (response.statusCode == 200) Right(response.body)
    else Left(s"Receive unexpected status code ${response.statusCode} from the API.")
  }

  /** 200 body (a JSON element array) → rehydrated elements through the same
    * wire reader every other JSON path uses (`elements_from_json`); the
    * engine-side doc_id/seq (implicit in the reference: response scope +
    * array order) are filled deterministically. */
  def elementsFromResponse(spark: SparkSession, body: String,
      docId: String = "api"): Dataset[Element] = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = spark.read.schema(graft.sinks.ElementSink.wireSchema)
      .json(Seq(body).toDS())
      .coalesce(1)
      .withColumn("doc_id", coalesce(col("doc_id"), lit(docId)))
      .withColumn("seq", coalesce(col("seq"), monotonically_increasing_id()))
    graft.sinks.ElementSink.fromWire(df)
  }
}
