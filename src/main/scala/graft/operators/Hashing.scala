package graft.operators

/**
 * Shared hot-path hashing helpers. The former per-byte `f"$b%02x"` formatting
 * allocated a `java.util.Formatter` per byte and dominated CPU samples of the
 * chunk-id stage; a table-lookup hex encode plus a thread-local digest is
 * allocation-free per call.
 */
object Hashing {
  private val HexChars = "0123456789abcdef".toCharArray

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  def sha256Hex(s: String): String = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HexChars(b >>> 4)
      out(i * 2 + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }
}
