package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/**
 * Differential fuzz harness for explicit-encoding strict decode:
 * `dev/gen_encoding_diff_vectors.py` ran Python's text-mode decode machinery
 * (io.TextIOWrapper — the reference `read_txt_file` filename branch,
 * `file_utils/encoding.py:118-133`) over a seeded adversarial byte corpus ×
 * encoding matrix (BOM'd/unmarked utf-16/32, truncations, clipped heads,
 * random bytes, single-byte charsets) and pinned 2,210
 * (bytes, encoding, text | error_kind) vectors. This spec replays each
 * through [[Encodings.decodeTextStrict]]: identical text on success,
 * `UnicodeDecodeError` ↔ CharacterCodingException, the BOM-demand
 * `UnicodeError` ↔ IllegalArgumentException. Newline translation is out of
 * scope by construction (the generator reads with newline='' — the
 * reference's own from_file branch performs no translation either).
 */
class EncodingDifferentialSpec extends AnyFunSuite {

  private val vecPath = "src/test/resources/graft/refvec/encoding_diff.ndjson"

  private case class Vec(bytes: Array[Byte], encoding: String,
    text: Option[String], error: Option[String])

  private lazy val vectors: Vector[Vec] = {
    val src = scala.io.Source.fromFile(vecPath, "UTF-8")
    try src.getLines().filter(_.nonEmpty).toVector.map { line =>
      // tiny sparse parser for the generator's flat ASCII JSON rows
      def strField(k: String): Option[String] = {
        val key = "\"" + k + "\": \""
        val i = line.indexOf(key)
        if (i < 0) None
        else {
          val from = i + key.length
          val sb = new StringBuilder
          var j = from
          var done = false
          while (!done) {
            line.charAt(j) match {
              case '"' => done = true
              case '\\' =>
                line.charAt(j + 1) match {
                  case 'u' =>
                    sb.append(Integer.parseInt(line.substring(j + 2, j + 6), 16).toChar)
                    j += 5
                  case 'n' => sb.append('\n'); j += 1
                  case 'r' => sb.append('\r'); j += 1
                  case 't' => sb.append('\t'); j += 1
                  case 'b' => sb.append('\b'); j += 1
                  case 'f' => sb.append('\f'); j += 1
                  case c => sb.append(c); j += 1
                }
                j += 1
              case c => sb.append(c); j += 1
            }
          }
          Some(sb.toString)
        }
      }
      Vec(java.util.Base64.getDecoder.decode(strField("bytes").getOrElse("")),
        strField("encoding").get, strField("text"), strField("error"))
    }
    finally src.close()
  }

  test("2,210 reference decode vectors replay byte-identically (incl. error classes)") {
    assert(vectors.size == 2210, s"corpus drifted: ${vectors.size}")
    var ok = 0
    val failures = Vector.newBuilder[String]
    vectors.foreach { v =>
      val got: Either[String, String] =
        try Right(Encodings.decodeTextStrict(v.bytes, v.encoding))
        catch {
          case _: java.nio.charset.CharacterCodingException => Left("decode")
          case e: IllegalArgumentException
            if e.getMessage != null && e.getMessage.contains("BOM") => Left("unicode")
        }
      val want: Either[String, String] =
        v.error.map(Left(_)).getOrElse(Right(v.text.getOrElse("")))
      if (got == want) ok += 1
      else failures += s"enc=${v.encoding} bytes=${v.bytes.take(12).map("%02x".format(_)).mkString}" +
        s" want=$want got=$got"
    }
    val f = failures.result()
    assert(f.isEmpty, s"$ok/${vectors.size} matched; first failures:\n" +
      f.take(10).mkString("\n"))
  }
}
