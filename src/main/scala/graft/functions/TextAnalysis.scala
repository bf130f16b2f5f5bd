package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines: token counting,
 * quality scoring, language-ID heuristic, document fingerprinting, SimHash and MinHash
 * primitives.
 *
 * Everything here is a pure, codegen-friendly column expression built from Spark
 * higher-order functions — no UDFs, no shuffles, deterministic across retries (a
 * requirement for speculative execution; cf. the reference's seeded langdetect,
 * `/root/reference/unstructured/partition/common/lang.py:453`). The hash family is a
 * simple 31-base polynomial rolling hash mod 1e9+7, chosen because it is exactly
 * reproducible in ANSI SQL (DuckDB oracle) with integer arithmetic only.
 */
object TextAnalysis {

  val HashMod = 1000000007L

  /** Word tokens: split on whitespace, drop empties. */
  def words(c: Column): Column = filter(split(c, "\\s+"), w => w =!= "")

  /** Let-binding for HOF pipelines: binds `x` as the lambda variable of a
    * single-element `transform`, so the body can reference it any number of
    * times while it is EVALUATED exactly once. HOF expressions run
    * interpreted (no codegen, no common-subexpression elimination), so a
    * subtree referenced k times is otherwise re-computed k times per row —
    * the winnowing fingerprint was 10x slower before let-binding. */
  private[graft] def letCol(x: Column)(body: Column => Column): Column =
    element_at(transform(array(x), body), 1)

  /**
   * Polynomial rolling hash of a string: `h = fold(h * 31 + codepoint) mod 1e9+7`
   * — a native codegen'd Catalyst expression ([[graft.functions.expr.PolyHash]]);
   * one compiled loop per value, whole-stage-codegen friendly.
   */
  def polyHash(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.expr.PolyHash(
        org.apache.spark.sql.graft.bridge.expression(c)))

  /** A keyed hash family over [[polyHash]]: `h_k(s) = ((2k+1) * h(s) + 7919k) mod p`. */
  def keyedHash(c: Column, k: Int): Column =
    (polyHash(c) * (2L * k + 1L) + 7919L * k) % HashMod

  /** Whitespace token count. */
  def tokenCountWhitespace(c: Column): Column = size(words(c))

  /**
   * BPE-ish token count: letter runs, digit runs, and isolated non-alphanumeric
   * symbols each count as one token (a cheap proxy for subword tokenizer counts).
   */
  def tokenCountRegex(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Ratio helpers (all computed over the raw string, 0.0 when empty). */
  private def ratio(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0))

  def punctRatio(c: Column): Column =
    ratio(length(c) - length(regexp_replace(c, "\\p{P}", "")), length(c))

  def digitRatio(c: Column): Column =
    ratio(length(c) - length(regexp_replace(c, "[0-9]", "")), length(c))

  def upperRatio(c: Column): Column =
    ratio(length(c) - length(regexp_replace(c, "[A-Z]", "")), length(c))

  def meanWordLength(c: Column): Column = letCol(words(c)) { ws =>
    ratio(aggregate(ws, lit(0L), (acc, w) => acc + length(w)), size(ws))
  }

  /** English stopwords used by the quality score and the language-ID heuristic. */
  val StopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "this", "was", "are", "be")
  val StopwordsEs: Seq[String] = Seq(
    "el", "la", "los", "las", "de", "y", "en", "que", "un", "una", "es", "por")
  val StopwordsDe: Seq[String] = Seq(
    "der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von", "mit")
  val StopwordsFr: Seq[String] = Seq(
    "le", "la", "les", "de", "et", "un", "une", "est", "que", "pour", "dans")
  val StopwordsIt: Seq[String] = Seq(
    "il", "lo", "gli", "che", "di", "non", "sono", "anche", "ma", "nel", "della")
  val StopwordsPt: Seq[String] = Seq(
    "o", "os", "uma", "não", "são", "mais", "mas", "foi", "ele", "isso", "como")
  val StopwordsNl: Seq[String] = Seq(
    "de", "het", "een", "van", "ik", "je", "niet", "met", "zijn", "voor", "maar")

  /** One `ARRAY<INT>` of stopword hit counts per language (single compiled
    * tokenize pass — [[graft.functions.expr.LangStopwordVotes]]). */
  private def langVotes(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.expr.LangStopwordVotes(
        org.apache.spark.sql.graft.bridge.expression(c)))

  def stopwordCount(c: Column, stopwords: Seq[String]): Column = {
    // the 7 built-in lists resolve to one shared native vote pass (duplicate
    // langVotes subtrees collapse under codegen subexpression elimination);
    // arbitrary lists fall back to the generic HOF formulation.
    // CONTRACT: the two engines tokenize-and-lower differently (native path:
    // per-token String.toLowerCase(Locale.ROOT); HOF path: whole-string
    // UTF8String lowercasing before split). They agree only while every
    // built-in list stays within the ASCII/Latin-1 casing-equivalent subset —
    // LangStopwordVotes.lists is the single source of truth for which lists
    // take the native path, and any content-equal caller-supplied copy takes
    // it too (the match below is by content, not identity).
    require(graft.functions.expr.LangStopwordVotes.lists.forall(_.forall(_.forall(ch =>
      ch < 0x100 || Character.toLowerCase(Character.toUpperCase(ch)) == ch))),
      "built-in stopword lists must stay casing-equivalent across both tokenizers")
    val idx = graft.functions.expr.LangStopwordVotes.lists.indexWhere(_ == stopwords)
    if (idx >= 0) element_at(langVotes(c), idx + 1)
    else size(array_intersect_multi(words(lower(c)), stopwords))
  }

  /** Count of elements of `arr` contained in `set`, multiplicity preserved. */
  private def array_intersect_multi(arr: Column, set: Seq[String]): Column =
    filter(arr, w => set.map(s => w === lit(s)).reduce(_ || _))

  def stopwordRatio(c: Column, stopwords: Seq[String] = StopwordsEn): Column =
    ratio(stopwordCount(c, stopwords), tokenCountWhitespace(c))

  /**
   * Document quality score in [0,1] — the reference-style length/punct/stopword
   * heuristics (cf. `is_possible_narrative_text` signals) blended into one number:
   * rewards reasonable length, mid-range word length, stopword presence; penalizes
   * punctuation/digit noise.
   */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / 500.0, lit(1.0))
    val wordLen = meanWordLength(c)
    val wordLenScore = when(wordLen >= 3 && wordLen <= 10, 1.0).otherwise(0.5)
    val stopScore = least(stopwordRatio(c) * 5.0, lit(1.0))
    val punctPenalty = punctRatio(c)
    val digitPenalty = digitRatio(c)
    round(
      greatest(
        lit(0.0),
        lenScore * 0.3 + wordLenScore * 0.2 + stopScore * 0.3 -
          punctPenalty * 0.1 - digitPenalty * 0.1 + lit(0.3)),
      4)
  }

  /**
   * N-gram (word-shingle) heuristic language ID: scores each language by stopword
   * hits; highest score wins with a fixed tie-break order (en, es, de, fr), `und`
   * when no stopword hits at all. Deterministic analog of the reference's seeded
   * langdetect (`partition/common/lang.py:412-505`), ISO-639-1 codes.
   */
  def langIdHeuristic(c: Column): Column = {
    val en = stopwordCount(c, StopwordsEn)
    val es = stopwordCount(c, StopwordsEs)
    val de = stopwordCount(c, StopwordsDe)
    val fr = stopwordCount(c, StopwordsFr)
    when(greatest(en, es, de, fr) === 0, "und")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /**
   * `detect_languages` "auto" mode re-expressed deterministically
   * (`partition/common/lang.py:412-505`): ISO-639-3 output codes; Chinese variants
   * normalize to `zho` (`:489-495`); ASCII text under 5 words defaults to `eng`
   * (`:446-451`); empty text yields null (`:441-443`). The seeded langdetect
   * n-gram model (`:452-453`, a model download this engine avoids) is replaced by
   * a deterministic cascade: unicode-script counts route the non-Latin scripts
   * (kana before han so Japanese isn't misread as Chinese), then a 7-language
   * stopword vote handles Latin text. One native compiled pass per row
   * ([[graft.functions.expr.DetectLanguage]]).
   */
  def detectLanguages(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.expr.DetectLanguage(
        org.apache.spark.sql.graft.bridge.expression(c)))

  /**
   * Document fingerprint: polynomial hash of the whitespace-normalized, lowercased
   * text — the exact-dedup key (cheaper than sha2 to mirror in SQL, and stable).
   */
  def docFingerprint(c: Column): Column =
    polyHash(lower(Cleaners.cleanExtraWhitespace(c)))

  /** 64-bit SimHash (native expression, one compiled pass — see
    * [[graft.functions.expr.SimHash64]]). The production near-dup sketch. */
  def simHash64(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.expr.SimHash64(
        org.apache.spark.sql.graft.bridge.expression(lower(c))))

  /**
   * Legacy 16-bit SimHash over word tokens: bit j of the result is set when the sum
   * of (+1/-1) votes from each word's hash bit j is positive. Near-dup docs differ
   * in few bits (compare via Hamming distance). Superseded by [[simHash64]] — 16
   * bits saturate on large corpora (birthday collisions at ~2^8 docs).
   */
  def simHash16(c: Column): Column = {
    val hashes = transform(words(lower(c)), w => polyHash(w) % 65536L)
    // single pass over the word hashes carrying a 16-wide vote vector (a 16-pass
    // formulation would re-evaluate the hash array per bit)
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), 16),
      (acc, h) => zip_with(acc, sequence(lit(0L), lit(15L)), (v, j) => {
        val pow2j = floor(pow(lit(2.0), j)).cast("long")
        v + floor(h / pow2j).cast("long") % 2L * 2L - 1L
      }))
    aggregate(
      zip_with(votes, sequence(lit(0L), lit(15L)),
        (v, j) => when(v > 0, floor(pow(lit(2.0), j)).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc + b)
  }

  /**
   * Word n-gram shingles: `n` consecutive words joined by a single space.
   * Built by zipping the word array with its own shifted tails (each input array
   * evaluated once — no per-shingle `slice` copies, no O(words²) re-evaluation).
   */
  def wordShingles(c: Column, n: Int): Column =
    letCol(words(c))(shinglesOfWords(_, n))

  /** [[wordShingles]] over an already-bound word array — for callers that
    * build shingles of SEVERAL orders from one text: bind `words(c)` once
    * (letCol / a projected column) and derive each order from it, instead of
    * re-splitting the text per order. */
  def shinglesOfWords(ws: Column, n: Int): Column = {
    val zipped = (2 to n).foldLeft(ws: Column) { (acc, k) =>
      zip_with(acc, slice(ws, lit(k), greatest(size(ws) - (k - 1), lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    when(size(ws) >= n, filter(zipped, s => s.isNotNull))
      .otherwise(array(array_join(ws, " ")))
  }

  /**
   * Winnowing fingerprints (Schleimer, Wilkerson & Aiken, "Winnowing: Local
   * Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS algorithm):
   * lowercase, strip every non-alphanumeric, hash each `k`-char gram, slide a
   * `w`-hash window and select each window's minimum. Returns the sorted
   * distinct selected hashes.
   *
   * Guarantee (the paper's Theorem): any shared substring of length
   * `>= w + k - 1` between two documents shares at least one fingerprint, and
   * no shared substring shorter than `k` produces one. The rightmost-min tie
   * rule in the paper only changes which *position* is recorded — the selected
   * VALUE set (what this column emits) is tie-rule independent.
   *
   * Shapes: the char array enters every zip as the fold INPUT so it is
   * evaluated O(k + w) times, never per-gram (no O(len²) re-evaluation); window
   * minima are a `least`-fold over shifted slices of the hash array, exactly
   * the [[wordShingles]] construction. Fewer than `k` alphanumeric chars →
   * empty set; fewer than `w` grams → one window over all grams.
   */
  def winnowFingerprints(c: Column, k: Int = 8, w: Int = 4): Column = {
    // HOFs evaluate interpreted (no codegen) and every reference to a subtree
    // RE-EVALUATES it, so each expensive intermediate is let-bound as the
    // lambda variable of a single-element transform (`let(x)(body)`): the
    // char array, gram hashes and window minima are each computed exactly
    // once no matter how many times the next stage references them. Without
    // this the inlined tree re-derives the char split O(k·w) times per doc —
    // measured 10x slower at sf0.1.
    def let(x: Column)(body: Column => Column): Column = letCol(x)(body)
    val csExpr =
      filter(split(regexp_replace(lower(c), "[^a-z0-9]", ""), ""), ch => ch =!= "")
    let(csExpr) { cs =>
      val grams = filter(
        (2 to k).foldLeft(cs) { (acc, j) =>
          zip_with(acc, slice(cs, lit(j), greatest(size(cs) - (j - 1), lit(0))),
            (a, b) => concat(a, b))
        }, g => g.isNotNull)
      let(transform(grams, g => polyHash(g))) { hashes =>
        // full-window minima: zip_with pads the shorter (shifted) side with
        // NULL, and the explicit NULL propagation (least() would *skip* nulls
        // and admit partial tail windows) keeps only the len-w+1 complete
        // windows
        val fullMins = filter(
          (2 to w).foldLeft(hashes) { (acc, j) =>
            zip_with(acc,
              slice(hashes, lit(j), greatest(size(hashes) - (j - 1), lit(0))),
              (a, b) => when(a.isNull || b.isNull, lit(null)).otherwise(least(a, b)))
          }, v => v.isNotNull)
        let(fullMins) { fm =>
          val sel = when(size(fm) > 0, fm)
            .when(size(hashes) > 0, array(array_min(hashes)))
            .otherwise(array().cast("array<bigint>"))
          array_sort(array_distinct(sel))
        }
      }
    }
  }

  /**
   * MinHash signature over `n`-word shingles with `k` keyed hash functions:
   * `sig[j] = min over shingles of h_j(shingle)`. The standard scale path for
   * near-dup detection: LSH-band the signature and bucket-join (no O(n^2) pairs).
   */
  def minHashSignature(c: Column, k: Int, shingleN: Int = 3): Column =
    minHashOfShingles(wordShingles(c, shingleN), k)

  /** [[minHashSignature]] from an already-computed shingle column — for
    * callers that also need the shingle set itself (exact-Jaccard verify):
    * shingling runs once and both derive from it. The signature is invariant
    * to duplicate shingles (per-hash MIN over a multiset equals the min over
    * its set), so a deduplicated shingle array yields the identical
    * signature. */
  def minHashOfShingles(shingles: Column, k: Int): Column = {
    val baseHashes = transform(shingles, s => polyHash(s))
    // one pass over the hashes with a k-wide running-min state: the expensive
    // shingle+hash input is evaluated ONCE (a k-pass transform would re-evaluate
    // the whole subtree per hash function)
    aggregate(
      baseHashes,
      array_repeat(lit(Long.MaxValue), k),
      (acc, h) => zip_with(acc, sequence(lit(0L), lit(k - 1L)),
        (m, j) => least(m, (h * (j * 2L + 1L) + j * 7919L) % HashMod)))
  }

  /**
   * LSH band keys from a MinHash signature: adjacent pairs of signature entries
   * combined into one band hash -> `k/2` band keys per document. Docs sharing any
   * band key are near-dup candidates.
   */
  def lshBands(sig: Column, rows: Int = 2): Column = letCol(sig) { s =>
    // let-bound: callers often compose lshBands(minHashSignature(...))
    // directly, and the un-bound lambda would re-derive the whole signature
    // once per band element
    transform(
      sequence(lit(0), (size(s) / lit(rows)).cast("int") - 1),
      b => {
        val i = b * rows
        (element_at(s, i + 1) * 31L + element_at(s, i + 2)) % HashMod
      })
  }
}
