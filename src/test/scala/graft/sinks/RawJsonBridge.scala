package graft.sinks
/** test-only access shim for RawJson (private[sinks]). */
object RawJsonBridge {
  def split(s: String): Seq[String] = RawJson.splitStrictJsonArray(s)
  def tokens(o: String): Map[String, String] = RawJson.objectRawTokens(o)
}
