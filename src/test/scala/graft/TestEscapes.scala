package graft

/** The ONE `\\uXXXX` unescape for differential-vector resources — the BPE
  * split and classifier-cascade specs both decode with it, so the escape
  * format cannot silently diverge between them (or from the generators,
  * `dev/gen_bpe_vocab.py` / `dev/gen_classifier_vectors.py`, which emit one
  * escape per UTF-16 code unit: astral chars arrive as surrogate pairs and
  * reassemble naturally in Java's UTF-16 strings). */
object TestEscapes {
  def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 6 <= s.length && s.charAt(i + 1) == 'u') {
        sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
        i += 6
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }
}
