package graft.operators

import scala.collection.mutable

/**
 * Token counting for token-mode chunking — the reference's `TokenCounter`
 * (`chunking/base.py:54-78`) resolves a tokenizer name (model name first,
 * encoding name second, tiktoken semantics) and counts tokens with a
 * byte-pair-encoding vocabulary.
 *
 * The vocabularies themselves are model downloads unavailable offline, so the
 * engine runs the SAME algorithm — cl100k-style pre-tokenizer split, then
 * greedy lowest-rank byte-pair merges — against a merge table derived
 * deterministically from the reference's public-domain corpus
 * (`dev/gen_bpe_vocab.py`, 4000 merges). Counts differ from OpenAI
 * vocabularies (documented seam); the merge mechanics, name resolution, and
 * option plumbing are real and exercised end-to-end.
 */
object TokenCounter {

  /** Byte → printable symbol used by the merges file (GPT-2 byte-to-unicode
    * convention: byte b ↦ U+0100+b). */
  @inline private def byteChar(b: Byte): Char = (0x100 + (b & 0xFF)).toChar

  /** cl100k-style pre-tokenizer split, using the pattern published in the
    * tiktoken repository with its exact `\s+(?!\S)` whitespace-run clause
    * (all-but-last whitespace of a run groups together; the final space
    * attaches to the following word via the earlier alternatives). The
    * letter/number classes are expressed with Java's Unicode `\w` family
    * instead of `\p{L}`/`\p{N}` so the generator (`dev/gen_bpe_vocab.py`,
    * Python `re`, which lacks `\p{}`) trains on MATCHING segmentation:
    * Java's UNICODE_CHARACTER_CLASS `\w` additionally contains combining
    * marks (Mn/Mc/Me) and join controls, which Python's `\w` excludes, so
    * those are subtracted from the word classes (and added to the
    * punctuation classes) via class arithmetic -- NFD text and ZWJ
    * sequences now segment identically in both engines
    * (`BpeSplitDifferentialSpec` pins Python-generated vectors). The one
    * remaining divergence from cl100k proper is the `\w`-vs-`\p{L}`
    * treatment of `_`. Counts still
    * differ from OpenAI vocabularies unless a real `.tiktoken` file is
    * supplied (the merge table here is corpus-derived — documented seam). */
  // Mn/Mc/Me + ZWNJ/ZWJ: in Java's \\w, not in Python's
  private val Marks = "\\p{Mn}\\p{Mc}\\p{Me}\\u200c\\u200d"
  private val SplitRe = java.util.regex.Pattern.compile(
    "(?i:'s|'t|'re|'ve|'m|'ll|'d)" +
      s"|[[^\\r\\n\\w\\d][$Marks]]?[[^\\W\\d_]&&[^$Marks]]+" +
      "|\\d{1,3}" +
      s"| ?[[^\\s\\w\\d][$Marks]]+[\\r\\n]*" +
      "|\\s*[\\r\\n]+" +
      "|\\s+(?!\\S)" +
      "|\\s+",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** Pre-tokenizer segmentation of `text` — exposed for the cross-language
    * differential against the Python generator's identical pattern. */
  private[operators] def splitPieces(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val m = SplitRe.matcher(text)
    while (m.find()) if (m.group().nonEmpty) out += m.group()
    out.result()
  }

  /** merge pair → rank (lower = earlier = applied first). */
  private lazy val ranks: Map[(String, String), Int] = {
    val in = getClass.getResourceAsStream("/graft/bpe-merges.txt")
    require(in != null, "bpe-merges.txt missing from resources")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().zipWithIndex.flatMap { case (line, i) =>
      val sp = line.indexOf(' ')
      if (sp <= 0) None
      else Some((line.substring(0, sp), line.substring(sp + 1)) -> i)
    }.toMap
    finally src.close()
  }

  private def rankOf(a: String, b: String): Int =
    ranks.getOrElse((a, b), Int.MaxValue)

  /** Encode one pre-tokenized piece: UTF-8 bytes → symbols → greedy
    * lowest-rank merges until no merge applies (standard BPE). */
  private[operators] def encodePiece(piece: String): Vector[String] = {
    var syms: Vector[String] =
      piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => byteChar(b).toString).toVector
    while (syms.length > 1) {
      var best = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rankOf(syms(i), syms(i + 1))
        if (r < best) { best = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) return syms
      syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
        syms.drop(bestIdx + 2)
    }
    syms
  }

  /** Tokenize `text`: split, then BPE-encode each piece. */
  def encode(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val m = SplitRe.matcher(text)
    while (m.find()) {
      val piece = m.group()
      if (piece.nonEmpty) out ++= encodePiece(piece)
    }
    out.result()
  }

  def countTokens(text: String): Int = encode(text).length

  // ---- user-supplied tiktoken vocabularies ---------------------------------

  /** Per-JVM cache of loaded .tiktoken files: each EXECUTOR lazily reads the
    * file itself (from a path visible cluster-wide, e.g. a distributed FS),
    * so a 1000-executor job needs no driver-side registry or broadcast. */
  private val fileVocabs =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Int]]()

  /** Open `path` through Hadoop's FileSystem API so local paths, `hdfs://`,
    * `s3a://`, etc. all resolve — both on the driver (validation) and on each
    * executor (lazy load). On the driver the session's full Hadoop conf is
    * used; on executors (no SparkSession thread-local) the `spark.hadoop.*`
    * overrides are replayed from SparkEnv's conf so credentials/FS impls
    * still apply. */
  private def hadoopPath(p: String): (org.apache.hadoop.fs.FileSystem,
      org.apache.hadoop.fs.Path) = {
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse {
        val c = new org.apache.hadoop.conf.Configuration()
        Option(org.apache.spark.SparkEnv.get).map(_.conf).foreach { sc =>
          sc.getAll.foreach { case (k, v) =>
            if (k.startsWith("spark.hadoop."))
              c.set(k.stripPrefix("spark.hadoop."), v)
          }
        }
        c
      }
    val path = new org.apache.hadoop.fs.Path(p)
    (path.getFileSystem(conf), path)
  }

  /** Parse the public tiktoken vocabulary format — one `<base64 token>
    * <rank>` pair per line — into merged-byte-string → rank (bytes symbolized
    * via [[byteChar]] so keys are plain strings). */
  private[operators] def loadTiktokenFile(path: String): Map[String, Int] =
    fileVocabs.computeIfAbsent(path, { p =>
      val (fs, hp) = hadoopPath(p)
      val src = scala.io.Source.fromInputStream(fs.open(hp), "UTF-8")
      try src.getLines().flatMap { line =>
        val sp = line.indexOf(' ')
        if (sp <= 0) None
        else {
          val bytes = java.util.Base64.getDecoder.decode(line.substring(0, sp))
          Some(new String(bytes.map(byteChar)) -> line.substring(sp + 1).trim.toInt)
        }
      }.toMap
      finally src.close()
    })

  /** Encode one piece against a tiktoken-style vocabulary: ranks key the
    * MERGED byte string (tiktoken stores whole tokens, not merge pairs), so
    * the greedy step merges the adjacent pair whose concatenation has the
    * lowest whole-token rank. */
  private[operators] def encodePieceTiktoken(
      piece: String, rank: Map[String, Int]): Vector[String] = {
    var syms: Vector[String] =
      piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => byteChar(b).toString).toVector
    while (syms.length > 1) {
      var best = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse(syms(i) + syms(i + 1), Int.MaxValue)
        if (r < best) { best = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) return syms
      syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
        syms.drop(bestIdx + 2)
    }
    syms
  }

  /** Count tokens with a user-supplied .tiktoken vocabulary. */
  def countTokensWith(path: String)(text: String): Int = {
    val vocab = loadTiktokenFile(path)
    var n = 0
    val m = SplitRe.matcher(text)
    while (m.find()) {
      val piece = m.group()
      if (piece.nonEmpty) n += encodePieceTiktoken(piece, vocab).length
    }
    n
  }

  /** tiktoken's public model→encoding map (subset): model names resolve
    * first, encoding names second (`base.py:66-73`). All names resolve to the
    * derived stand-in vocabulary — the resolution logic, not the vocabulary,
    * is what the engine mirrors. */
  private val ModelNames = Set(
    "gpt-4", "gpt-4o", "gpt-4-turbo", "gpt-3.5-turbo", "gpt-3.5", "gpt-2",
    "text-davinci-003", "text-embedding-ada-002", "text-embedding-3-small",
    "text-embedding-3-large")
  private val EncodingNames = Set(
    "cl100k_base", "o200k_base", "p50k_base", "r50k_base", "gpt2", "graft_bpe")

  /** Validate a tokenizer name, returning the counting function. Throws for
    * names tiktoken would also reject. A name ending in `.tiktoken` is
    * treated as a path to a real vocabulary file (public base64-rank format)
    * on storage visible to every executor — local, `hdfs://`, `s3a://`, any
    * Hadoop-resolvable filesystem — giving true count parity with tiktoken
    * when the user supplies the actual model vocabulary. */
  def resolve(name: String): String => Int = {
    if (name.endsWith(".tiktoken")) {
      val (fs, hp) = hadoopPath(name)
      require(fs.exists(hp) && fs.getFileStatus(hp).isFile,
        s"Vocabulary file not found: $name")
      countTokensWith(name)
    } else {
      if (!ModelNames.contains(name) && !EncodingNames.contains(name))
        throw new IllegalArgumentException(s"Unknown tokenizer: $name")
      countTokens
    }
  }
}
