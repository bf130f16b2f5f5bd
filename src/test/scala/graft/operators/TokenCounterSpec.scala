package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Element, ElementMetadata, ElementType}

/**
 * BPE token counting behind the chunker's tokenizer option — the merge-rule
 * mechanics of the reference's tiktoken-backed `TokenCounter`
 * (`chunking/base.py:54-78`) against the corpus-derived merge table, plus the
 * `DescribeTokenBasedChunking` option-validation ports
 * (`test_title.py:710-830`).
 */
class TokenCounterSpec extends AnyFunSuite {

  // ------------------------------------------------------------ BPE mechanics

  test("common English words merge to a single token; encode is deterministic") {
    // 'the'/'and' dominate the training corpus -> fully merged
    assert(TokenCounter.encodePiece("the").length === 1)
    assert(TokenCounter.encodePiece(" the").length === 1)
    assert(TokenCounter.encodePiece("and").length === 1)
    assert(TokenCounter.encode("the quick brown fox") ===
      TokenCounter.encode("the quick brown fox"))
  }

  test("rare byte runs stay near byte-granular; merges reduce counts") {
    val rare = TokenCounter.encodePiece("qzxv")
    assert(rare.length >= 2) // no training mass -> few merges apply
    // a merged word costs fewer tokens than its letter count
    assert(TokenCounter.countTokens("Pierre went to Moscow") < "Pierre went to Moscow".length)
  }

  test("pre-tokenizer splits contractions, digit triples, and punctuation") {
    // contraction suffix is its own piece (cl100k rule)
    assert(TokenCounter.countTokens("don't") >= 2)
    // digits group at most 3 per piece
    assert(TokenCounter.countTokens("1234567") >= 3)
    // token count is additive over whitespace-separated pieces
    val a = TokenCounter.countTokens("alpha")
    val b = TokenCounter.countTokens(" beta")
    assert(TokenCounter.countTokens("alpha beta") === a + b)
  }

  test("multibyte UTF-8 encodes through the byte mapping without loss") {
    val n = TokenCounter.countTokens("héllo wörld ☸")
    assert(n > 0)
    assert(TokenCounter.countTokens("") === 0)
  }

  // --------------------------------------------- tokenizer name resolution

  test("model and encoding names resolve; unknown names are rejected") {
    assert(TokenCounter.resolve("gpt-4")("the cat") ===
      TokenCounter.countTokens("the cat"))
    TokenCounter.resolve("cl100k_base")
    TokenCounter.resolve("graft_bpe")
    intercept[IllegalArgumentException] { TokenCounter.resolve("not-a-tokenizer") }
  }

  // ------------------------------------- option validation (test_title.py:783+)

  test("max_tokens and max_characters are mutually exclusive") {
    val e = intercept[IllegalArgumentException] {
      ChunkingOptions.validated(maxTokens = Some(100), maxCharacters = Some(500),
        tokenizer = Some("cl100k_base"))
    }
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("max_tokens requires a tokenizer") {
    val e = intercept[IllegalArgumentException] {
      ChunkingOptions.validated(maxTokens = Some(100))
    }
    assert(e.getMessage.contains("'tokenizer' is required"))
  }

  test("new_after_n_tokens requires max_tokens; negatives rejected") {
    val e = intercept[IllegalArgumentException] {
      ChunkingOptions.validated(newAfterNTokens = Some(50))
    }
    assert(e.getMessage.contains("requires 'max_tokens'"))
    intercept[IllegalArgumentException] {
      ChunkingOptions.validated(maxTokens = Some(10), newAfterNTokens = Some(-1),
        tokenizer = Some("cl100k_base"))
    }
  }

  // ----------------------------------- chunking with the real BPE counter

  private var seq = 0L
  private def el(tpe: String, t: String): Element = {
    seq += 1
    Element("", tpe, t, "doc1", seq, ElementMetadata.empty)
  }

  // -- it_accepts_model_name_as_tokenizer (test_title.py:802) --
  test("model name as tokenizer: every chunk within the BPE token budget") {
    seq = 0
    val opts = ChunkingOptions.validated(maxTokens = Some(50),
      tokenizer = Some("gpt-4"), combineTextUnderNChars = Some(0), byTitle = true)
    val chunks = Chunker.chunkDoc("doc1",
      Iterator(el(ElementType.Title, "Test"),
        el(ElementType.NarrativeText, "Some test content.")), opts).toVector
    assert(chunks.map(_.text) === Vector("Test\n\nSome test content."))
    assert(chunks.forall(c => TokenCounter.countTokens(c.text) <= 50))
  }

  // -- it_splits_oversized_element_respecting_token_limit (test_title.py:830) --
  test("oversized element splits into fragments measured by the BPE counter") {
    seq = 0
    val words = (1 to 120).map(i => s"word$i").mkString(" ")
    val opts = ChunkingOptions.validated(maxTokens = Some(40),
      tokenizer = Some("cl100k_base"), byTitle = false)
    val chunks = Chunker.chunkDoc("doc1",
      Iterator(el(ElementType.NarrativeText, words)), opts).toVector
    assert(chunks.size > 1)
    chunks.foreach(c => assert(TokenCounter.countTokens(c.text) <= 40,
      s"chunk over budget: '${c.text.take(60)}'"))
    // no text lost across the splits
    assert(chunks.map(_.text).mkString(" ").split("\\s+").toSeq ===
      words.split("\\s+").toSeq)
  }

  // -- it_applies_token_based_overlap_in_split_chunks (test_title.py:854) --
  test("token-based overlap carries a tail between split fragments") {
    seq = 0
    val words = (1 to 80).map(i => s"tok$i").mkString(" ")
    val opts = ChunkingOptions.validated(maxTokens = Some(30), overlap = 5,
      tokenizer = Some("cl100k_base"), byTitle = false)
    val chunks = Chunker.chunkDoc("doc1",
      Iterator(el(ElementType.NarrativeText, words)), opts).toVector
    assert(chunks.size > 1)
    // each continuation starts with the tail of its predecessor
    chunks.sliding(2).foreach { case Vector(a, b) =>
      val tailWord = a.text.split("\\s+").last
      assert(b.text.contains(tailWord), s"'${b.text.take(40)}' missing overlap")
    }
  }

  // -- DescribeTextSplitterTokenMode (test_base.py:332-457): the token-mode
  // splitter behaviors; counts come from the corpus-trained BPE (documented
  // seam), so the assertions are the reference's structural ones plus the one
  // vector where the split boundary happens to coincide.
  test("token-mode splitter: under-limit passthrough, boundaries, overlap") {
    import graft.operators.{Chunker, ChunkingOptions}
    // it_returns_text_unchanged_when_under_token_limit
    val big = ChunkingOptions.validated(maxTokens = Some(100),
      tokenizer = Some("cl100k_base"))
    val splitBig = new Chunker.TextSplitter(big)
    assert(splitBig("Hello, World!") == (("Hello, World!", "")))
    // it_splits_oversized_text_respecting_token_limit
    val ten = ChunkingOptions.validated(maxTokens = Some(10),
      tokenizer = Some("cl100k_base"))
    val splitTen = new Chunker.TextSplitter(ten)
    val (frag, rem) = splitTen("The quick brown fox jumps over the lazy dog. " * 5)
    assert(frag.nonEmpty && rem.nonEmpty && ten.measure(frag) <= 10)
    // it_prefers_separator_boundaries_when_splitting: never mid-word, never
    // trailing space
    val fifteen = ChunkingOptions.validated(maxTokens = Some(15),
      tokenizer = Some("cl100k_base"))
    val (f2, _) = new Chunker.TextSplitter(fifteen)(
      "First sentence here. Second sentence here. Third sentence here.")
    assert(f2.endsWith(".") || f2.last.isLetterOrDigit)
    assert(!f2.endsWith(" "))
    // it_handles_text_with_no_good_split_points
    val five = ChunkingOptions.validated(maxTokens = Some(5),
      tokenizer = Some("cl100k_base"))
    val (f3, _) = new Chunker.TextSplitter(five)(
      "Supercalifragilisticexpialidocious " * 10)
    assert(f3.nonEmpty && five.measure(f3) <= 5)
    // it_produces_correct_overlapping_splits — boundary coincides with the
    // reference vector on this corpus-trained vocabulary
    val eight = ChunkingOptions.validated(maxTokens = Some(8), overlap = 2,
      tokenizer = Some("cl100k_base"))
    val splitEight = new Chunker.TextSplitter(eight)
    val (f4, r4) = splitEight(
      "one two three four five six seven eight nine ten eleven twelve")
    assert(f4 == "one two three four five six seven eight")
    assert(r4 == "seven eight nine ten eleven twelve")
    // walking the remainder to completion keeps every fragment within the
    // token budget (the corpus-trained vocabulary counts number words
    // slightly differently from tiktoken, so the tail may split once more)
    var t = r4
    while (t.nonEmpty) {
      val (f5, r5) = splitEight(t)
      assert(eight.measure(f5) <= 8)
      t = if (r5 == t) "" else r5
    }
  }

  test("a user-supplied .tiktoken vocabulary file drives real whole-token ranks") {
    // tiny vocabulary in the public base64-rank format: 256 byte tokens,
    // then "ab" (256), "abc" (257), " x" (258)
    val b64 = java.util.Base64.getEncoder
    val lines = (0 until 256).map(b =>
      s"${b64.encodeToString(Array(b.toByte))} $b") ++ Seq(
      s"${b64.encodeToString("ab".getBytes)} 256",
      s"${b64.encodeToString("abc".getBytes)} 257",
      s"${b64.encodeToString(" x".getBytes)} 258")
    val f = java.nio.file.Files.createTempFile("graft-vocab", ".tiktoken")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    val count = TokenCounter.resolve(f.toString)
    assert(count("abc") == 1)  // ab (rank 256) then ab+c -> abc (rank 257)
    assert(count("abq") == 2)  // ab + q: no "abq" or "bq" token
    assert(count("q x") == 2)  // pre-split "q" / " x"; " x" is one token
    // resolve validates the path early; the parsed file is cached per JVM
    assertThrows[IllegalArgumentException](
      TokenCounter.resolve("/nope/missing.tiktoken"))
    assert(TokenCounter.loadTiktokenFile(f.toString) eq
      TokenCounter.loadTiktokenFile(f.toString))
  }

  test("token-mode chunking accepts a .tiktoken path as the tokenizer") {
    val b64 = java.util.Base64.getEncoder
    val lines = (0 until 256).map(b => s"${b64.encodeToString(Array(b.toByte))} $b")
    val f = java.nio.file.Files.createTempFile("graft-bytes", ".tiktoken")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    // byte-only vocabulary: every byte is one token -> measure = byte count
    val opts = ChunkingOptions.validated(maxTokens = Some(4),
      tokenizer = Some(f.toString))
    assert(opts.measure("abcd") == 4)
    assert(opts.measure("ab") == 2)
  }
}
