package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64

/**
 * URL entry point for the auto router — the reference's
 * `partition(url=...)` flow (`partition/auto.py:303-320`,
 * `file_and_type_from_url`): resolve the URL to bytes + a Content-Type, strip
 * any `;charset=` parameter, run filetype detection with the content-type as
 * the hint, then route to the matching partitioner.
 *
 * Offline-first: `file://` (and bare absolute paths) read the local
 * filesystem and `data:` URLs (RFC 2397) decode inline payloads — both fully
 * deterministic and executor-safe. `http(s)://` is genuinely network-bound, so
 * it sits behind the [[UrlFetcher]] seam: a deployment passes a fetcher that
 * performs the GET (the reference's `requests.get`); the default refuses with
 * a clear error rather than attempting egress from inside a Spark task.
 */
trait UrlFetcher extends Serializable {
  /** Resolve a URL to (payload bytes, optional Content-Type header value). */
  def fetch(url: String): (Array[Byte], Option[String])
}

object UrlSource {

  /** Default fetcher: `file://`, bare paths, and `data:` URLs. */
  object LocalFetcher extends UrlFetcher {
    def fetch(url: String): (Array[Byte], Option[String]) = {
      val u = url.trim
      if (u.startsWith("data:")) decodeDataUrl(u)
      else if (u.startsWith("file://"))
        (Files.readAllBytes(Paths.get(stripFileScheme(u))), None)
      else if (u.startsWith("/")) (Files.readAllBytes(Paths.get(u)), None)
      else if (u.startsWith("http://") || u.startsWith("https://"))
        throw new UnsupportedOperationException(
          "http(s) URLs need a network-capable UrlFetcher; the default resolves " +
            "only file:// and data: URLs")
      else throw new IllegalArgumentException(s"unsupported URL scheme: $u")
    }
  }

  private def stripFileScheme(u: String): String = {
    // file:///path and file://host/path; only localhost/empty hosts supported
    val rest = u.stripPrefix("file://")
    if (rest.startsWith("/")) rest
    else {
      val slash = rest.indexOf('/')
      if (slash < 0) rest else rest.substring(slash)
    }
  }

  /** RFC 2397: `data:[<mediatype>][;base64],<data>`. */
  private[sources] def decodeDataUrl(u: String): (Array[Byte], Option[String]) = {
    val comma = u.indexOf(',')
    require(comma >= 5, s"malformed data: URL: $u")
    val meta = u.substring(5, comma)
    val payload = u.substring(comma + 1)
    val isB64 = meta.endsWith(";base64")
    val mediaType = (if (isB64) meta.dropRight(7) else meta).split(";").head.trim
    val bytes =
      if (isB64) Base64.getDecoder.decode(payload)
      else percentDecode(payload).getBytes(StandardCharsets.UTF_8)
    (bytes, Some(mediaType).filter(_.nonEmpty))
  }

  private def percentDecode(s: String): String = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 2 < s.length) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3
      } else {
        // literal run: emit UTF-8 bytes — truncating a non-ASCII literal to one
        // byte (ADVICE r8) forms invalid UTF-8 that decodes to U+FFFD, and
        // chars above 0xFF lose their high byte entirely
        val end = { var j = i + 1; while (j < s.length && s.charAt(j) != '%') j += 1; j }
        out.write(s.substring(i, end).getBytes(StandardCharsets.UTF_8))
        i = end
      }
    }
    new String(out.toByteArray, StandardCharsets.UTF_8)
  }

  /** Filename hint from the URL path — drives extension-based routing exactly
    * as a downloaded file's name would. `data:` URLs carry none. */
  private[sources] def filenameOf(url: String): String = {
    if (url.startsWith("data:")) return "url"
    val noQuery = url.takeWhile(c => c != '?' && c != '#')
    val seg = noQuery.substring(noQuery.lastIndexOf('/') + 1)
    if (seg.isEmpty) "url" else seg
  }

  /** Content-Type normalization (`auto.py:313-315`): parameters stripped,
    * lower-cased. */
  private[sources] def normalizeContentType(ct: Option[String]): Option[String] =
    ct.map(_.split(";").head.trim.toLowerCase).filter(_.nonEmpty)

  /** `partition(url=...)`: fetch → detect (content-type hint + magic +
    * extension) → route through the auto router. */
  def partitionUrl(url: String, fetcher: UrlFetcher = LocalFetcher,
      contentType: Option[String] = None)
      : (FileType, Seq[HtmlPartitioner.RawPara]) = {
    val (bytes, fetchedCt) = fetcher.fetch(url)
    val ct = normalizeContentType(contentType.orElse(fetchedCt))
    Partitioners.partitionAuto(filenameOf(url), bytes, ct)
  }
}
