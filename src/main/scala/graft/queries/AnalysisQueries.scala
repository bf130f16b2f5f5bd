package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{CorpusOps, TextAnalysis}
import graft.queries.{OracleSql => O}

/**
 * LLM-training-data-pipeline operators as declared queries (builder's brief + SURVEY
 * §2.9/§2.11): token counting, quality scoring, language ID, document fingerprinting,
 * exact dedup, MinHash+LSH near-dup, SimHash, embedding similarity search (brute-force
 * cosine top-k and an LSH-bucketed variant), bag-of-words, percent-missing-text and
 * n-gram overlap metrics, Gopher-style repetition signals and the C4 line filter
 * ([[graft.functions.QualityFilters]]).
 *
 * Scale shapes (the point at 100 TB):
 *  - exact dedup = `groupBy(fingerprint)` — one hash-partitioned shuffle, map-side
 *    partial aggregation; never a self-join;
 *  - near-dup = MinHash signature → LSH band keys → explode → equi-join on band key —
 *    candidate pairs only, O(n·bands) not O(n²);
 *  - ANN = brute-force per-partition scan with a broadcast query vector (baseline), and
 *    a sign-bit LSH bucket variant that prunes the scan to one bucket (scale path);
 *  - metrics = explode → groupBy(word) with map-side combine.
 */
object AnalysisQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.readFanout(s, dir, "documents")

  private def embs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.readFanout(s, dir, "embeddings")

  private def one(s: SparkSession, dir: String)(c: Column, name: String): DataFrame =
    docs(s, dir).select(col("doc_id"), c.as(name)).orderBy("doc_id")

  /** Σ aᵢ·bᵢ over two float-array columns, accumulated as DOUBLE — native
    * [[graft.functions.expr.DotProduct]], one compiled loop per pair with
    * the fold's exact arithmetic (cast-to-double, left-to-right sum). */
  private def dotCol(a: Column, b: Column): Column =
    graft.functions.expr.DotProduct.dotProduct(a, b)

  private def normCol(c: Column): Column = sqrt(dotCol(c, c))

  /** dot/(n1·n2) with the zero-norm guard (cosine against a zero vector is
    * 0.0, matching `CorpusOps.cosineCol`): an unguarded division yields NaN,
    * which Spark sorts GREATEST under desc — a zero-norm embedding would
    * pollute every top-k. Shared by [[cosineCol]] and the ANN queries that
    * hoist norms into projected columns. */
  private def guardedCos(dot: Column, n1: Column, n2: Column): Column =
    when(n1 * n2 === 0.0, lit(0.0)).otherwise(dot / (n1 * n2))

  /** Cosine similarity — the ONE definition every ANN/near-dup query (and, via
    * [[cosSql]], every oracle) derives from, so a precision/summation-order
    * change lands everywhere at once. */
  private def cosineCol(a: Column, b: Column): Column =
    guardedCos(dotCol(a, b), normCol(a), normCol(b))

  /** documents ∪ exact copies of every 5th doc (ids +10000) — the exact-dedup corpus. */
  private def withExactDups(d: DataFrame): DataFrame = {
    val base = d.select(col("doc_id"), col("text"))
    base.unionByName(
      base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
  }

  /** documents ∪ near-copies (one appended token) of every 7th doc — the near-dup corpus. */
  private def withNearDups(d: DataFrame): DataFrame = {
    val base = d.select(col("doc_id"), col("text"))
    base.unionByName(
      base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit(" xtra")).as("text")))
  }

  /** BOW normalization (reference `metrics/text_extraction.py:123-157`): lowercase,
    * strip punctuation, whitespace-split. */
  // reference-faithful bag_of_words tokenization (text_extraction.py:123-156):
  // in-word '/- survive, spaced-out single-char runs drop, isolated alnum
  // singles stay — one native pass ([[graft.functions.expr.BagOfWordsTokens]])
  private def bowWords(c: Column): Column =
    graft.functions.expr.BagOfWordsTokens.column(c)

  /** Per-(doc,word) counts of a text expression. */
  private def wordCounts(d: DataFrame, text: Column, n: String): DataFrame =
    d.select(col("doc_id"), explode(bowWords(text)).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as(n))

  /** Per-(doc,gram) counts of word 2-grams of a text expression. */
  private def gramCounts(d: DataFrame, text: Column, n: String): DataFrame =
    d.select(col("doc_id"), explode(TextAnalysis.wordShingles(lower(text), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as(n))

  // "output" texts whose divergence from the source the metrics measure — the
  // construction is mirrored verbatim in the oracle SQL.
  private val missingWordsOut: Column => Column =
    t => regexp_replace(t, "\\S*e\\S*", "")
  private val ngramOut: Column => Column =
    t => array_join(slice(TextAnalysis.words(t), lit(1),
      greatest(size(TextAnalysis.words(t)) - 5, lit(1))), " ")

  /** Non-BMP suffix (crab emoji U+1F980 + CJK-ext-B U+2A6B2) appended to every 9th
    * doc in the hash corpora — a UTF-16-code-unit hash would diverge from the
    * oracle's codepoint iteration on exactly these rows. */
  private val NonBmpSuffix = " 🦀上𪚲"

  private def withNonBmp(t: Column): Column =
    when(col("doc_id") % 9 === 0, concat(t, lit(NonBmpSuffix))).otherwise(t)

  private def withNonBmpSql(x: String): String =
    s"(CASE WHEN doc_id % 9 = 0 THEN $x || '$NonBmpSuffix' ELSE $x END)"

  /** The detect_languages corpus: one branch per doc_id residue, constructed
    * identically on both sides (script suffixes ride on the English text — the
    * script checks precede the stopword vote, so the carrier is irrelevant). */
  private val LangPhrases: Seq[(Int, String, Boolean)] = Seq(
    // (residue, phrase, replaceWholeText)
    (0, "ok", true), // ASCII, <5 words -> eng default
    (1, " 汉字处理系统", false), // han -> zho
    (2, " これはテストです", false), // kana -> jpn
    (3, " 한국어 텍스트", false), // hangul -> kor
    (4, " русский текст", false), // cyrillic -> rus
    (5, " نص عربي", false), // arabic -> ara
    (6, "la casa es grande y el perro come en la cocina", true), // spa
    (7, "der Hund ist im Haus und die Katze ist von dem Tisch", true), // deu
    (8, "le chien est dans la maison et le chat est pour toi", true), // fra
    (9, "il cane non mangia anche se il gatto è nel giardino della casa", true), // ita
    (10, "o cão não come mais mas ele foi como isso", true)) // por
  // residue 11: NULL text — pins the cascade's null-propagation (NULL in -> NULL
  // out, NOT 'und'); residue 12: the English document text itself -> eng by vote.
  private def langCorpusText(docId: Column, text: Column): Column =
    when(docId % 13 === 11, lit(null).cast("string")).otherwise(
      LangPhrases.foldRight(text) { case ((r, phrase, replace), els) =>
        when(docId % 13 === r,
          if (replace) lit(phrase) else concat(text, lit(phrase))).otherwise(els)
      })

  private def langCorpusTextSql(x: String): String = {
    val latin = LangPhrases.foldRight(x) { case ((r, phrase, replace), els) =>
      val v = if (replace) s"'$phrase'" else s"$x || '$phrase'"
      s"(CASE WHEN doc_id % 13 = $r THEN $v ELSE $els END)"
    }
    s"(CASE WHEN doc_id % 13 = 11 THEN NULL ELSE $latin END)"
  }

  /** The q_repetition_signals oracle SELECT (shared with q_quality_prune). */
  private def repetitionOracleSql(from: String = "documents"): String = {
      val topNs = Seq(2, 3, 4)
      val dupNs = Seq(5, 6, 7)
      def gramCte(n: Int) =
        s"""g$n AS (
           |  SELECT doc_id, g, count(*) AS c
           |  FROM (SELECT doc_id, unnest(${O.shinglesN(wordsL("text"), n)}) AS g
           |        FROM $from)
           |  GROUP BY doc_id, g)""".stripMargin
      def topCte(n: Int) =
        s"""t$n AS (
           |  SELECT doc_id, round(chars::DOUBLE / NULLIF(tot, 0)::DOUBLE, 4) AS topf
           |  FROM (SELECT doc_id, c * length(g) AS chars,
           |          sum(c * length(g)) OVER (PARTITION BY doc_id) AS tot,
           |          row_number() OVER (PARTITION BY doc_id
           |            ORDER BY c DESC, length(g) DESC, g DESC) AS rn
           |        FROM g$n)
           |  WHERE rn = 1)""".stripMargin
      def dupCte(n: Int) =
        s"""d$n AS (
           |  SELECT doc_id,
           |    round(sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END)::DOUBLE /
           |      NULLIF(sum(c * length(g)), 0)::DOUBLE, 4) AS dupf
           |  FROM g$n GROUP BY doc_id)""".stripMargin
      val lineCtes =
        s"""ln0 AS (
           |  SELECT doc_id, l, count(*) AS c
           |  FROM (SELECT doc_id,
           |          unnest(list_filter(list_transform(
           |            string_split(text, ' merge '), x -> trim(x)), x -> x <> '')) AS l
           |        FROM $from)
           |  GROUP BY doc_id, l),
           |lf AS (
           |  SELECT doc_id, sum(c)::BIGINT AS n_lines,
           |    round(sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE /
           |      sum(c)::DOUBLE, 4) AS dup_line_frac,
           |    round(sum(CASE WHEN c > 1 THEN c * length(l) ELSE 0 END)::DOUBLE /
           |      NULLIF(sum(c * length(l)), 0)::DOUBLE, 4) AS dup_line_char_frac
           |  FROM ln0 GROUP BY doc_id)""".stripMargin
      val ctes = ((topNs ++ dupNs).map(gramCte) ++ topNs.map(topCte) ++
        dupNs.map(dupCte) :+ lineCtes).mkString(",\n")
      val joins = (topNs.map(n => s"LEFT JOIN t$n USING (doc_id)") ++
        dupNs.map(n => s"LEFT JOIN d$n USING (doc_id)")).mkString(" ")
      s"""WITH $ctes
         |SELECT $from.doc_id, n_lines, dup_line_frac, dup_line_char_frac,
         |  ${topNs.map(n => s"t$n.topf AS top_${n}gram_frac").mkString(", ")},
         |  ${dupNs.map(n => s"d$n.dupf AS dup_${n}gram_frac").mkString(", ")}
         |FROM $from LEFT JOIN lf USING (doc_id) $joins
         |ORDER BY $from.doc_id""".stripMargin
  }

  /** The q_c4_line_filter oracle SELECT (shared with q_quality_prune). */
  private def c4OracleSql(from: String = "documents"): String = {
      val lines =
        "list_filter(list_transform(string_split(text, ' merge '), x -> trim(x))," +
          " x -> x <> '')"
      val keepCond =
        """regexp_matches(t, '[.!?]["”'']?$') AND
          |      len(list_filter(string_split_regex(t, '\s+'), w -> w <> '')) >= 3 AND
          |      NOT contains(lower(t), 'javascript')""".stripMargin
      s"""SELECT doc_id,
         |  len($lines)::INT AS n_lines,
         |  len(list_filter($lines, t -> $keepCond))::INT AS n_kept,
         |  coalesce(array_to_string(list_filter($lines, t -> $keepCond), chr(10)), '') AS kept_text,
         |  contains(lower(text), 'lorem ipsum') AS has_lorem,
         |  contains(text, '{') AS has_brace
         |FROM $from ORDER BY doc_id""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_token_counts" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCountWhitespace(col("text")).as("n_ws_tokens"),
        TextAnalysis.tokenCountRegex(col("text")).as("n_bpe_tokens"))
        .orderBy("doc_id")),

    "q_quality_score" -> ((s, dir) => one(s, dir)(
      TextAnalysis.qualityScore(col("text")), "quality")),

    "q_lang_id" -> ((s, dir) => one(s, dir)(
      TextAnalysis.langIdHeuristic(col("text")), "lang_pred")),

    // detect_languages (ISO-639-3) over a 13-way corpus (residue 11 = NULL text,
    // pinning NULL -> NULL): per doc_id residue the
    // text is replaced/suffixed to route every cascade branch — scripts (zho, jpn,
    // kor, rus, ara), the short-ASCII eng default, and six Latin stopword votes
    "q_detect_languages" -> ((s, dir) => one(s, dir)(
      TextAnalysis.detectLanguages(langCorpusText(col("doc_id"), col("text"))),
      "lang_pred")),

    "q_doc_fingerprint" -> ((s, dir) => one(s, dir)(
      TextAnalysis.docFingerprint(withNonBmp(col("text"))), "fp")),

    // Winnowing (MOSS) fingerprint profile per document: count + the full sorted
    // selected-hash set (string-joined into one hashable column). Pure codegen'd
    // columns inside the scan projection — no shuffle, no UDF.
    "q_winnow_fingerprint" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          TextAnalysis.winnowFingerprints(col("text")).as("fps"))
        .select(col("doc_id"),
          size(col("fps")).cast("int").as("n_fp"),
          concat_ws(",", col("fps")).as("fp_str"))
        .orderBy("doc_id")),

    // Winnowing near-dup: docs sharing >= 80% of the smaller side's selected
    // fingerprints — [[CorpusOps.winnowNearDup]] with the default hot-posting
    // cap (100); the cap's recall trade is documented and property-pinned at
    // the operator.
    "q_winnow_near_dup" -> ((s, dir) =>
      graft.functions.CorpusOps
        .winnowNearDup(withNearDups(docs(s, dir)), col("text"))
        .orderBy("doc_a", "doc_b")),

    // streaming winnow near-dup: the per-doc fingerprint sets run through
    // the SAME streaming bucket fold as the MinHash/SimHash bands (a
    // fingerprint is a band key), then the drained candidate events reduce
    // to shared counts + the 80% floor; the batch oracle verifies it
    "q_stream_winnow_near_dup" -> ((s, dir) =>
      graft.streaming.StreamingOps
        .winnowNearDupAvailableNow(s, s"$dir/documents.parquet")),

    // Exact dedup: fingerprint → groupBy → keep collision groups. One shuffle on the
    // hash key; at 100 TB this is the canonical dedup plan (no pairwise compare).
    "q_exact_dedup" -> ((s, dir) =>
      withExactDups(docs(s, dir))
        .select(col("doc_id"), TextAnalysis.docFingerprint(col("text")).as("fp"))
        .groupBy("fp")
        .agg(count(lit(1)).as("n_docs"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .filter(col("n_docs") > 1)
        .orderBy("fp")),

    // the same exact-dedup aggregation executed THROUGH Structured Streaming
    // (readStream → fingerprint → stateful groupBy → AvailableNow): state is
    // one row per distinct fingerprint, and min(doc_id) keeps the winner
    // order-independent across racing file splits
    "q_stream_exact_dedup" -> ((s, dir) =>
      graft.streaming.StreamingOps
        .exactDedupAvailableNow(s, s"$dir/documents.parquet")
        .filter(col("n_docs") > 1)
        .orderBy("fp")),

    // streaming MinHash-LSH near-dup candidates: the same signature/banding
    // as q_lsh_near_dup folded per band-bucket under flatMapGroupsWithState
    // (state = bucket doc list, pairs emitted not stored); the batch LSH
    // oracle (per-band pair events) verifies the streaming result
    "q_stream_lsh_near_dup" -> ((s, dir) =>
      graft.streaming.StreamingOps
        .lshNearDupAvailableNow(s, s"$dir/documents.parquet")
        .orderBy("band_idx", "doc_a", "doc_b")),

    // streaming SimHash near-dup: the four 16-bit simhash bands run through
    // the SAME streaming bucket fold as the MinHash path (a band key space is
    // a band key space), then the exact bit_count(xor) hamming verify joins
    // the drained candidates batch-side; the per-band batch oracle verifies it
    "q_stream_simhash_near_dup" -> ((s, dir) =>
      graft.streaming.StreamingOps.simhashNearDupAvailableNow(
        s, s"$dir/documents.parquet", nonBmpSuffix = NonBmpSuffix)),

    "q_minhash_signature" -> ((s, dir) => one(s, dir)(
      concat_ws(",",
        TextAnalysis.minHashSignature(withNonBmp(col("text")), k = 8, shingleN = 3)),
      "sig_str")),

    // Near-dup end-to-end: MinHash(8) → 4 LSH bands → explode → hot-band guard
    // (buckets over 1000 members dropped before the join — a degenerate band key is
    // otherwise a quadratic blowup inside one task) → self-equi-join on
    // (band_idx, band_key) → distinct candidate pairs. Candidates only, never O(n²).
    "q_lsh_near_dup" -> ((s, dir) => {
      val inp = withNearDups(docs(s, dir))
      val sig = inp.select(col("doc_id"),
        TextAnalysis.minHashSignature(col("text"), k = 8, shingleN = 3).as("sig"))
      val bands = sig.select(col("doc_id"),
        posexplode(TextAnalysis.lshBands(col("sig"), rows = 2))
          .as(Seq("band_idx", "band_key")))
      graft.operators.Dedup.lshCandidatePairs(bands, maxBandSize = 1000)
        .orderBy("doc_a", "doc_b")
    }),

    // Completes the near-dup dedup pipeline: LSH band candidates -> EXACT
    // n-gram (3-shingle set) Jaccard >= 0.8 verify. The verify runs only on
    // candidate pairs (never all pairs), which is the canonical two-stage shape
    // at 100 TB: cheap recall stage, exact precision stage. The near-copy
    // corpus makes the filter discriminative — short docs' appended-token
    // copies fall below 0.8 and are pruned, long docs' survive.
    "q_jaccard_near_dup" -> ((s, dir) => {
      val inp = withNearDups(docs(s, dir))
      val sig = inp.select(col("doc_id"),
        TextAnalysis.minHashSignature(col("text"), k = 8, shingleN = 3).as("sig"))
      val bands = sig.select(col("doc_id"),
        posexplode(TextAnalysis.lshBands(col("sig"), rows = 2))
          .as(Seq("band_idx", "band_key")))
      val cand = graft.operators.Dedup.lshCandidatePairs(bands, maxBandSize = 1000)
      val sh = inp.select(col("doc_id"),
        array_distinct(TextAnalysis.wordShingles(col("text"), 3)).as("sh"))
      cand
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          round(size(array_intersect(col("sha"), col("shb"))).cast("double") /
            size(array_union(col("sha"), col("shb"))).cast("double"), 4).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
        .orderBy("doc_a", "doc_b")
    }),

    // End-to-end corpus curation — the canonical training-data pipeline over
    // the near-dup-augmented corpus in ONE query: exact dedup (fingerprint
    // groupBy, keep-min), near-dup removal (banded LSH candidates → exact
    // 3-shingle Jaccard ≥ 0.8 verify on candidates only → drop the later
    // doc of each verified pair), then language/quality/token annotation with
    // a quality floor. Every stage is the proven 100 TB shape: one shuffle
    // per dedup key, banded never-all-pairs candidates, verification only on
    // candidates, and a left_anti for the drop set.
    "q_curate_corpus" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val inp = withNearDups(docs(s, dir))
      // ONE annotation pass over the corpus: fingerprint, signature, shingle
      // set, and the curation metrics all ride the same projection so no
      // stage re-reads the text
      val annotated = inp.select(col("doc_id"),
        TextAnalysis.docFingerprint(col("text")).as("fp"),
        TextAnalysis.minHashSignature(col("text"), k = 8, shingleN = 3).as("sig"),
        array_distinct(TextAnalysis.wordShingles(col("text"), 3)).as("sh"),
        TextAnalysis.langIdHeuristic(col("text")).as("lang_pred"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.tokenCountWhitespace(col("text")).as("n_tokens"))
      // exact dedup as a window keep-first — one shuffle on fp, no self-join
      val kept = annotated
        .withColumn("rn",
          row_number().over(Window.partitionBy("fp").orderBy("doc_id")))
        .filter(col("rn") === 1).drop("rn", "fp")
      // banded LSH with the shingle set carried into the bucket, so candidate
      // generation AND exact-Jaccard verification are one equi-self-join; the
      // same-key count window is the hot-bucket skew cap
      val bands = kept.select(col("doc_id"), col("sh"),
        posexplode(TextAnalysis.lshBands(col("sig"), rows = 2))
          .as(Seq("band_idx", "band_key")))
      val bounded = bands
        .withColumn("bc",
          count(lit(1)).over(Window.partitionBy("band_idx", "band_key")))
        .filter(col("bc") <= 1000).drop("bc")
      val drops = bounded.as("a").join(bounded.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_key") === col("b.band_key") &&
            col("a.doc_id") < col("b.doc_id"))
        .filter(size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))).cast("double") >= 0.8)
        .select(col("b.doc_id").as("doc_id")).distinct()
      // the verified drop set is tiny — broadcast it into the anti-join
      kept.join(broadcast(drops), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang_pred"), col("quality"), col("n_tokens"))
        .filter(col("quality") >= 0.6)
        .orderBy("doc_id")
    }),

    // 64-bit SimHash rendered as 16 hex chars (hi/lo halves, so the oracle's
    // BIGINT arithmetic never touches the sign bit)
    "q_simhash" -> ((s, dir) => {
      val h = TextAnalysis.simHash64(withNonBmp(col("text")))
      docs(s, dir).select(col("doc_id"),
        format_string("%08x%08x",
          shiftrightunsigned(h, 32),
          h.bitwiseAND(lit(0xFFFFFFFFL))).as("simhash"))
        .orderBy("doc_id")
    }),

    // SimHash hamming near-dup (Manku et al. 2007): 64-bit signatures split
    // into four 16-bit bands — two docs within hamming distance 3 agree on
    // at least one band (pigeonhole), so the candidate set is a per-band
    // equi-join, never all pairs; candidates verify with bit_count(xor).
    // Corpus: every 9th doc re-emitted with one appended token (near-dup in
    // signature space when few vote flips result) and every 15th as an exact
    // copy (hamming 0 — guaranteed hits). A count window caps degenerate hot
    // bands (boilerplate/empty docs) exactly like the MinHash LSH path. The
    // two 32-bit halves are handled separately end-to-end — no sign games.
    "q_simhash_near_dup" -> ((s, dir) => {
      val base = docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val inp = base
        .unionByName(base.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 30000).as("doc_id"),
            concat(col("text"), lit(" xtra")).as("text")))
        .unionByName(base.filter(col("doc_id") % 15 === 0)
          .select((col("doc_id") + 60000).as("doc_id"), col("text")))
      val h = TextAnalysis.simHash64(withNonBmp(col("text")))
      val sigs = inp.select(col("doc_id"),
        shiftrightunsigned(h, 32).as("h32"),
        h.bitwiseAND(lit(0xFFFFFFFFL)).as("h0"))
      val bands = sigs.select(col("doc_id"), col("h32"), col("h0"),
        posexplode(array(
          col("h0").bitwiseAND(lit(65535L)),
          shiftrightunsigned(col("h0"), 16).bitwiseAND(lit(65535L)),
          col("h32").bitwiseAND(lit(65535L)),
          shiftrightunsigned(col("h32"), 16).bitwiseAND(lit(65535L))))
          .as(Seq("band_idx", "band_key")))
      val capped = bands.withColumn("bc", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("band_idx", "band_key")))
        .filter(col("bc") <= 1000)
      val cand = capped.as("a").join(capped.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_key") === col("b.band_key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.h32").as("a32"), col("a.h0").as("a0"),
          col("b.h32").as("b32"), col("b.h0").as("b0"))
        .distinct()
      cand
        .select(col("doc_a"), col("doc_b"),
          (bit_count(col("a32").bitwiseXOR(col("b32"))) +
            bit_count(col("a0").bitwiseXOR(col("b0")))).cast("int")
            .as("hamming"))
        .filter(col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    }),

    // Brute-force cosine top-k against a broadcast query vector — the ANN
    // baseline. The query-vector norm rides in the broadcast and the row norm
    // is one projected column, so the scan does ONE O(dim) dot per row
    // (identical arithmetic to cosineCol — same sums, same division).
    "q_ann_cosine_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"), normCol(col("embedding")).as("qn"))
      CorpusOps.attachBroadcast(
          e.withColumn("nrm", normCol(col("embedding"))), q)
        // the O(dim) dot is PROJECTED before the zero-norm CASE: CaseWhen
        // branches are excluded from codegen subexpression elimination, so
        // a fold inside the branch would leave whole-stage codegen
        .withColumn("dot", dotCol(col("embedding"), col("qv")))
        .select(col("vec_id"),
          round(guardedCos(col("dot"), col("nrm"), col("qn")), 6).as("cos_sim"))
        .orderBy(desc("cos_sim"), asc("vec_id"))
        .limit(10)
    }),

    // LSH-bucketed ANN (scale path): sign bits of the first 8 dims form a bucket key;
    // only the query's bucket is scanned. At 100 TB the element lake is written
    // bucketed/partitioned by this key, so the scan prunes to one partition.
    "q_ann_lsh_bucket" -> ((s, dir) => {
      val e = embs(s, dir)
      val bucket = (c: Column) => aggregate(
        sequence(lit(0), lit(7)),
        lit(0L),
        (acc, i) => acc + when(element_at(c, i + 1) > 0f,
          floor(pow(lit(2.0), i)).cast("long")).otherwise(lit(0L)))
      val withB = e.select(col("vec_id"), col("embedding"),
        normCol(col("embedding")).as("nrm"), bucket(col("embedding")).as("bucket"))
      val q = withB.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"), col("nrm").as("qn"),
          col("bucket").as("qbucket"))
      withB.join(broadcast(q), col("bucket") === col("qbucket"))
        .withColumn("dot", dotCol(col("embedding"), col("qv")))
        .select(col("vec_id"), col("bucket"),
          round(guardedCos(col("dot"), col("nrm"), col("qn")), 6).as("cos_sim"))
        .orderBy(desc("cos_sim"), asc("vec_id"))
        .limit(10)
    }),

    // IVF-style ANN (the second scale path beside the sign-bit LSH bucket): a
    // coarse quantizer assigns every vector to its nearest of 8 centroids (the
    // vectors with vec_id < 8 — deterministic stand-ins for trained k-means
    // centroids), and the query probes ONLY its own cell. At 100 TB the lake is
    // written partitioned by cell, so the probe is a partition-pruned scan; the
    // centroid table is tiny and broadcast. Assignment is a single fold over
    // the sorted centroid array (first-max tie-break = lowest centroid id).
    "q_ann_ivf" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding"))
      // centroid norms ride in the broadcast struct; the row norm is one
      // projected column — assignment is ONE O(dim) dot per centroid
      val cents = e.filter(col("vec_id") < 8)
        .agg(sort_array(collect_list(struct(col("vec_id").as("cid"),
          col("embedding").as("cv"),
          normCol(col("embedding")).as("cnrm")))).as("cents"))
      val best = aggregate(
        col("cents"),
        struct(lit(-1L).as("cid"), lit(-2.0).as("sim")),
        (acc, c) => {
          val sim = guardedCos(dotCol(col("embedding"), c.getField("cv")),
            col("nrm"), c.getField("cnrm"))
          when(sim > acc.getField("sim"),
            struct(c.getField("cid").as("cid"), sim.as("sim"))).otherwise(acc)
        })
      val assigned = CorpusOps.attachBroadcast(
          e.withColumn("nrm", normCol(col("embedding"))), cents)
        .select(col("vec_id"), col("embedding"), col("nrm"),
          best.getField("cid").as("cell"))
      val q = assigned.filter(col("vec_id") === 1)
        .select(col("embedding").as("qv"), col("nrm").as("qn"),
          col("cell").as("qcell"))
      assigned.join(broadcast(q), col("cell") === col("qcell"))
        .withColumn("dot", dotCol(col("embedding"), col("qv")))
        .select(col("vec_id"), col("cell"),
          round(guardedCos(col("dot"), col("nrm"), col("qn")), 6).as("cos_sim"))
        .orderBy(desc("cos_sim"), asc("vec_id"))
        .limit(10)
    }),

    // Margin-based bitext mining (Artetxe & Schwenk 2019 — the LASER/CCMatrix
    // criterion): margin(x,y) = cos(x,y) / ((avgk_x + avgk_y)/2), the pair's
    // similarity relative to its two local neighborhood densities, which
    // suppresses the hub vectors a plain cosine threshold mis-mines. This
    // rendering is CELL-LOCAL — both sides assign to the same seed-centroid
    // IVF cells (CCMatrix mines within FAISS cells at corpus scale), so the
    // candidate stage is ONE equi-join on cell with a per-side hot-cell cap,
    // never |A|×|B|. Per-pair cosine rounds to micro BEFORE aggregation,
    // neighborhood sums are exact longs, the margin is one double expression
    // over them — engine-deterministic end to end. Sides: even/odd label.
    "q_margin_align" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding"), col("label"))
      val cents = e.filter(col("vec_id") < 8)
        .agg(sort_array(collect_list(struct(col("vec_id").as("cid"),
          col("embedding").as("cv"),
          normCol(col("embedding")).as("cnrm")))).as("cents"))
      val best = aggregate(
        col("cents"),
        struct(lit(-1L).as("cid"), lit(-2.0).as("sim")),
        (acc, c) => {
          val sim = guardedCos(dotCol(col("embedding"), c.getField("cv")),
            col("nrm"), c.getField("cnrm"))
          when(sim > acc.getField("sim"),
            struct(c.getField("cid").as("cid"), sim.as("sim"))).otherwise(acc)
        })
      val assigned = CorpusOps.attachBroadcast(
          e.withColumn("nrm", normCol(col("embedding"))), cents)
        .select(col("vec_id"), col("embedding"), col("nrm"), col("label"),
          best.getField("cid").as("cell"))
      // per-side hot-cell cap — a degenerate cell is otherwise a quadratic
      // blowup inside one join key (the semanticDedup re-split is the
      // heavier-duty alternative when capped rows must not be dropped)
      val capped = assigned.withColumn("cn", count(lit(1)).over(
          Window.partitionBy(col("cell"), pmod(col("label"), lit(2)))))
        .filter(col("cn") <= 1000).drop("cn")
      val aSide = capped.filter(pmod(col("label"), lit(2)) === 0)
        .select(col("cell"), col("vec_id").as("vec_a"),
          col("embedding").as("ea"), col("nrm").as("na"))
      val bSide = capped.filter(pmod(col("label"), lit(2)) === 1)
        .select(col("cell"), col("vec_id").as("vec_b"),
          col("embedding").as("eb"), col("nrm").as("nb"))
      val pairs = aSide.join(bSide, Seq("cell"))
        .select(col("cell"), col("vec_a"), col("vec_b"),
          round(guardedCos(dotCol(col("ea"), col("eb")),
            col("na"), col("nb")) * 1e6).cast("long").as("cos_micro"))
      val wx = Window.partitionBy("vec_a")
        .orderBy(col("cos_micro").desc, col("vec_b"))
      val wy = Window.partitionBy("vec_b")
        .orderBy(col("cos_micro").desc, col("vec_a"))
      val ranked = pairs
        .withColumn("rx", row_number().over(wx))
        .withColumn("ry", row_number().over(wy))
      val nx = ranked.filter(col("rx") <= 4).groupBy("vec_a")
        .agg(sum("cos_micro").as("sx"), count(lit(1)).as("kx"))
      val ny = ranked.filter(col("ry") <= 4).groupBy("vec_b")
        .agg(sum("cos_micro").as("sy"), count(lit(1)).as("ky"))
      val denom = (col("sx").cast("double") / col("kx") +
        col("sy").cast("double") / col("ky")) / 2.0
      val margins = pairs.join(nx, Seq("vec_a")).join(ny, Seq("vec_b"))
        .withColumn("margin_micro",
          when(denom > 0.0,
            round(col("cos_micro").cast("double") / denom * 1e6).cast("long")))
      val bw = Window.partitionBy("vec_a")
        .orderBy(col("margin_micro").desc, col("vec_b"))
      margins.withColumn("rn", row_number().over(bw))
        .filter(col("rn") === 1 && col("margin_micro") >= 1000000L)
        .select(col("vec_a"), col("vec_b"), col("cell"), col("margin_micro"))
        .orderBy("vec_a")
    }),

    // IVF with nprobe = 2 — the standard recall knob: the query probes its
    // TWO nearest centroids' cells (a runner-up fold over the same broadcast
    // centroid struct), trading 2× the scanned fraction for the recall lost
    // when the true neighbor sits just across a Voronoi boundary. The probe
    // frame is still a broadcast (2 rows), the join still an equi-join.
    "q_ann_ivf_multiprobe" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding"))
      val cents = e.filter(col("vec_id") < 8)
        .agg(sort_array(collect_list(struct(col("vec_id").as("cid"),
          col("embedding").as("cv"),
          normCol(col("embedding")).as("cnrm")))).as("cents"))
      val best = aggregate(
        col("cents"),
        struct(lit(-1L).as("cid"), lit(-2.0).as("sim")),
        (acc, c) => {
          val sim = guardedCos(dotCol(col("embedding"), c.getField("cv")),
            col("nrm"), c.getField("cnrm"))
          when(sim > acc.getField("sim"),
            struct(c.getField("cid").as("cid"), sim.as("sim"))).otherwise(acc)
        })
      val assigned = CorpusOps.attachBroadcast(
          e.withColumn("nrm", normCol(col("embedding"))), cents)
        .select(col("vec_id"), col("embedding"), col("nrm"),
          best.getField("cid").as("cell"))
      // top-2 fold: strict > keeps the earliest (lowest-cid) centroid on
      // ties, matching the oracle's (sim DESC, cid) ranking
      val top2 = aggregate(
        col("cents"),
        struct(struct(lit(-1L).as("cid"), lit(-2.0).as("sim")).as("b1"),
          struct(lit(-1L).as("cid"), lit(-2.0).as("sim")).as("b2")),
        (acc, c) => {
          val sim = guardedCos(dotCol(col("embedding"), c.getField("cv")),
            col("nrm"), c.getField("cnrm"))
          val cand = struct(c.getField("cid").as("cid"), sim.as("sim"))
          when(sim > acc.getField("b1").getField("sim"),
            struct(cand.as("b1"), acc.getField("b1").as("b2")))
            .when(sim > acc.getField("b2").getField("sim"),
              struct(acc.getField("b1").as("b1"), cand.as("b2")))
            .otherwise(acc)
        })
      val qrows = CorpusOps.attachBroadcast(
          e.filter(col("vec_id") === 1)
            .withColumn("nrm", normCol(col("embedding"))), cents)
        .select(col("embedding").as("qv"), col("nrm").as("qn"),
          explode(array(top2.getField("b1").getField("cid"),
            top2.getField("b2").getField("cid"))).as("qcell"))
      assigned.join(broadcast(qrows), col("cell") === col("qcell"))
        .withColumn("dot", dotCol(col("embedding"), col("qv")))
        .select(col("vec_id"), col("cell"),
          round(guardedCos(col("dot"), col("nrm"), col("qn")), 6).as("cos_sim"))
        .orderBy(desc("cos_sim"), asc("vec_id"))
        .limit(10)
    }),

    // Embedding-cosine near-dup dedup (scale path): 4 OR-ed sign-bit LSH bands
    // (8 dims each over dims 0-31) -> per-band self-equi-join -> distinct
    // candidate pairs -> cosine >= 0.999 verify. A single band drops any true
    // near-dup whose near-zero components in that one slice flip sign; OR-ing
    // bands makes a pair a candidate if it agrees on ANY slice. Candidates only
    // — never the O(n²) cross join — and a window count caps degenerate hot
    // buckets (all-zero/boilerplate embeddings) exactly like the MinHash LSH
    // path. The corpus unions exact copies of every 10th vector (ids +100000),
    // which agree on all 4 bands with cosine 1.0.
    "q_embed_near_dup" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding"))
      val inp = e.unionByName(
        e.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      val bandKey = (c: Column, band: Int) => aggregate(
        sequence(lit(0), lit(7)),
        lit(0L),
        (acc, i) => acc + when(element_at(c, lit(band * 8) + i + 1) > 0f,
          floor(pow(lit(2.0), i)).cast("long")).otherwise(lit(0L)))
      val bands = inp.select(col("vec_id"),
        posexplode(array((0 until 4).map(b => bandKey(col("embedding"), b)): _*))
          .as(Seq("band_idx", "band_key")))
      val safe = bands.withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy("band_idx", "band_key")))
        .filter(col("bucket_n") <= 1000)
        .drop("bucket_n")
      val cand = safe.as("a")
        .join(safe.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_key") === col("b.band_key") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .distinct()
      // per-row norms join WITH the embeddings so the per-pair verify is one
      // O(dim) dot, not three folds (identical arithmetic to cosineCol)
      cand
        .join(inp.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
          normCol(col("embedding")).as("na")), Seq("vec_a"))
        .join(inp.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
          normCol(col("embedding")).as("nb")), Seq("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          round(dotCol(col("ea"), col("eb")) / (col("na") * col("nb")), 6)
            .as("cos_sim"))
        .filter(col("cos_sim") >= 0.999)
        .orderBy("vec_a", "vec_b")
    }),

    // Image-metadata decode over a constructed PNG/GIF payload corpus: the PNG
    // IHDR / GIF screen-descriptor parse is REAL byte decoding (MultimodalOps),
    // and the oracle predicts dims from the construction — any header-layout or
    // endianness bug in the parser breaks the hash.
    "q_image_meta" -> ((s, dir) => {
      val w = (col("doc_id") % 1000 + 1).cast("int")
      val h = (col("doc_id") % 700 + 1).cast("int")
      val png = concat(
        unhex(lit("89504E470D0A1A0A")), // signature
        unhex(lit("0000000D")), // IHDR chunk length
        lit("IHDR").cast("binary"),
        unhex(lpad(hex(w), 8, "0")), // width BE32
        unhex(lpad(hex(h), 8, "0")), // height BE32
        unhex(lit("0806000000"))) // bit depth 8, color type 6 (rgba)
      val gif = concat(
        lit("GIF89a").cast("binary"),
        unhex(lpad(hex(pmod(w, lit(256))), 2, "0")), // width LE16: low byte
        unhex(lpad(hex(floor(w / 256).cast("int")), 2, "0")), // high byte
        unhex(lpad(hex(pmod(h, lit(256))), 2, "0")),
        unhex(lpad(hex(floor(h / 256).cast("int")), 2, "0")))
      val d = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 2 === 0, png).otherwise(gif).as("payload"))
      graft.operators.MultimodalOps.decodeImageMeta(d)
        .select(col("doc_id"),
          col("image_meta.width").as("width"),
          col("image_meta.height").as("height"),
          col("image_meta.n_channels").as("n_channels"),
          col("image_meta.format").as("format"))
        .orderBy("doc_id")
    }),

    // partition_audio segmentation: duration-driven 5 s windows, last clamped to
    // the clip end; transcript text is the documented deterministic STT stub.
    "q_transcribe_audio" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        (col("doc_id") % 23 + 1).cast("double").as("duration"),
        col("text").cast("binary").as("payload"))
      graft.operators.MultimodalOps.transcribeAudio(d, "duration")
        .select(col("doc_id"), col("segment_idx"),
          col("segment_start_seconds"), col("segment_end_seconds"), col("text"))
        .orderBy("doc_id", "segment_idx")
    }),

    // Video frame sampling: one row per sampled offset, frame payload a byte
    // slice of the source (stub kernel, real explode shape).
    "q_frame_sample" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        (col("doc_id") % 7 + 3).cast("int").as("duration"),
        substring(regexp_replace(col("text"), "[^ -~]", ""), 1, 200)
          .cast("binary").as("payload"))
      graft.operators.MultimodalOps.sampleFrames(d, everyNSeconds = 2,
        durationCol = "duration")
        .select(col("doc_id"), col("frame_ts"),
          col("frame_payload").cast("string").as("frame_str"))
        .orderBy("doc_id", "frame_ts")
    }),

    // Corpus-level word frequency (reference `bag_of_words`).
    "q_bag_of_words" -> ((s, dir) =>
      docs(s, dir).select(explode(bowWords(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("word"))
        .limit(100)),

    // percent_missing_text (reference `text_extraction.py:160-203`): 1 − shared word
    // mass / source mass, via per-(doc,word) BOW counts and a left join.
    "q_percent_missing_text" -> ((s, dir) => {
      val d = docs(s, dir)
      val src = wordCounts(d, col("text"), "sn")
      val out = wordCounts(d, missingWordsOut(col("text")), "on")
      src.join(out, Seq("doc_id", "w"), "left")
        .groupBy("doc_id")
        .agg(round(lit(1.0) -
          sum(least(col("sn"), coalesce(col("on"), lit(0L)))).cast("double") /
            sum(col("sn")).cast("double"), 4).as("pct_missing"))
        .orderBy("doc_id")
    }),

    // TextExtractionMetricsCalculator end-to-end (evaluate.py:342-455) as an
    // oracle row: outputs = source with every 'e'-word dropped (the
    // q_percent_missing_text derivation), except every 9th doc whose output
    // triples the source so the size-ratio guard pins accuracy to 0.01;
    // paths nest under two connectors so filename/doctype/connector
    // derivation is exercised. Weights (1,1,1) = plain levenshtein in the
    // oracle; both sides round half-even.
    "q_text_eval" -> ((s, dir) => {
      val d = docs(s, dir)
      val outT = when(col("doc_id") % 9 === 0,
          concat_ws(" ", col("text"), col("text"), col("text")))
        .otherwise(missingWordsOut(col("text")))
      def path(ext: String) = concat(lit("c"), (col("doc_id") % 2).cast("string"),
        lit("/doc"), col("doc_id").cast("string"), lit(s".pdf.$ext"))
      graft.operators.MetricsOps.textExtractionEvaluation(
        d.select(path("json").as("path"), outT.as("text")),
        d.select(path("txt").as("path"), col("text").as("text")))
    }),

    // shared n-gram percentage (reference `metrics/utils.py:213-246`): shared 2-gram
    // mass / source 2-gram mass, as a percentage rounded to 2dp.
    // Gopher/MassiveText repetition signals (Rae et al. 2021 A1.1): duplicate
    // lines + top/duplicated n-gram fractions, every n in ONE explode pass.
    "q_repetition_signals" -> ((s, dir) =>
      graft.functions.QualityFilters.repetitionSignals(
        docs(s, dir), col("text"), " merge ").orderBy("doc_id")),

    // C4 line-level cleaning (Raffel et al. 2020 2.2) as a pure codegen'd
    // column: terminal punctuation, >= 3 words, no "javascript"; doc flags.
    "q_c4_line_filter" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        graft.functions.QualityFilters.c4LineFilter(col("text"), " merge ").as("f"))
        .select(col("doc_id"), col("f.n_lines"), col("f.n_kept"),
          col("f.kept_text"), col("f.has_lorem"), col("f.has_brace"))
        .orderBy("doc_id")),

    // the composed Gopher/C4 prune decision (repetition ceilings + flags +
    // at least one clean line) — the pre-dedup gate of a training pipeline.
    // The corpus is adversarially augmented so every gate fires somewhere:
    // each doc gains one clean closing sentence, every 4th doc repeats its
    // own text (repetition ceilings), every 7th gains a lorem-ipsum + brace
    // tail (C4 flags) — mirrored verbatim in the oracle.
    "q_quality_prune" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit(" merge This document ends with a proper sentence.")).as("text"))
      val augmented = base.select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" merge lorem ipsum tail {")))
          .when(col("doc_id") % 4 === 0,
            concat(col("text"), lit(" merge "), col("text")))
          .otherwise(col("text")).as("text"))
      graft.functions.QualityFilters.pruneDecision(
        augmented, col("text"), " merge ").orderBy("doc_id")
    }),

    // Gopher document-level rules (Rae et al. 2021 A1.1) over a corpus
    // augmented so every rule fires somewhere: residue 0 = symbol spam,
    // 1 = bullet-started lines, 2 = ellipsis-ended lines, 3 = numeric
    // (non-alphabetic) words; pure per-row columns, no shuffle
    "q_gopher_rules" -> ((s, dir) => {
      val aug = when(col("doc_id") % 5 === 0,
          concat(col("text"), lit("\n### # ## spam ... more ... and ...")))
        // Gopher drops docs with MORE than 90% bullet lines (Rae et al. 2021
        // A1.1), so the bullet residue must swamp the doc's own lines: 40
        // bullet lines + the doc's first line keeps frac > 0.9 for the short
        // synthetic docs while the rule still sees real text
        .when(col("doc_id") % 5 === 1,
          concat(concat_ws("", array_repeat(lit("•item number four\n"), 40)),
            element_at(split(col("text"), "\n"), 1)))
        .when(col("doc_id") % 5 === 2,
          concat(col("text"), lit("\ntrailing thought...\nanother one…\nmore...")))
        .when(col("doc_id") % 5 === 3,
          concat(col("text"),
            lit(" 101 202 303 404 505 606 707 808 909 111 222 333")))
        .otherwise(col("text"))
      docs(s, dir).select(col("doc_id"),
          graft.functions.QualityFilters.gopherRules(aug, minWords = 20).as("g"))
        .select(col("doc_id"), col("g.*"))
        .orderBy("doc_id")
    }),

    "q_ngram_overlap" -> ((s, dir) => {
      val d = docs(s, dir)
      val src = gramCounts(d, col("text"), "sn")
      val out = gramCounts(d, ngramOut(col("text")), "on")
      src.join(out, Seq("doc_id", "g"), "left")
        .groupBy("doc_id")
        .agg(round(lit(100.0) *
          sum(least(col("sn"), coalesce(col("on"), lit(0L)))).cast("double") /
            sum(col("sn")).cast("double"), 2).as("shared_pct"))
        .orderBy("doc_id")
    }))

  // -- oracle SQL ------------------------------------------------------------------

  private val ph: String => String = O.polyHash
  private def wordsL(x: String): String = O.words(s"lower($x)")

  /** Winnowing near-dup re-derived (hot-posting cap 100, 80% shared floor) —
    * shared by the batch and streaming renderings. */
  private lazy val WinnowNearDupOracleSql: String =
    s"""WITH n AS (
       |  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
       |  FROM $nearDupUnion),
       |g AS (
       |  SELECT doc_id, CASE WHEN length(s) >= 8
       |    THEN list_transform(range(1, length(s) - 6),
       |           gi -> ${O.polyHash("substring(s, gi, 8)")})
       |    ELSE []::BIGINT[] END AS hs FROM n),
       |m AS (
       |  SELECT doc_id, CASE WHEN len(hs) = 0 THEN []::BIGINT[]
       |    WHEN len(hs) < 4 THEN [list_min(hs)]
       |    ELSE list_transform(range(1, len(hs) - 2), p -> list_min(hs[p:p+3]))
       |    END AS mins FROM g),
       |f AS (SELECT doc_id, list_distinct(mins) AS fps FROM m),
       |e AS (SELECT doc_id, len(fps) AS n_fp, unnest(fps) AS fp FROM f),
       |safe AS (SELECT fp FROM e GROUP BY fp HAVING count(*) <= 100),
       |b AS (SELECT e.* FROM e JOIN safe USING (fp))
       |SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
       |  CAST(count(*) AS INT) AS n_shared
       |FROM b a JOIN b b2 ON a.fp = b2.fp AND a.doc_id < b2.doc_id
       |GROUP BY a.doc_id, b2.doc_id, a.n_fp, b2.n_fp
       |HAVING 5 * count(*) >= 4 * least(a.n_fp, b2.n_fp)
       |ORDER BY doc_a, doc_b""".stripMargin

  private def docSel(expr: String, name: String): String =
    s"SELECT doc_id, $expr AS $name FROM documents ORDER BY doc_id"

  private val dupUnion =
    "(SELECT doc_id, text FROM documents UNION ALL " +
      "SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0)"

  private val nearDupUnion =
    "(SELECT doc_id, text FROM documents UNION ALL " +
      "SELECT doc_id + 10000 AS doc_id, text || ' xtra' AS text FROM documents WHERE doc_id % 7 = 0)"

  /** clean_extra_whitespace → lower → polyHash — mirrors `TextAnalysis.docFingerprint`. */
  private[queries] def fingerprint(x: String): String =
    ph(s"lower(${O.cleanExtraWhitespace(x)})")

  /** Two CTEs (`<alias>0`, `<alias>`) holding the reference bag_of_words
    * tokens of `x` per doc: punctuation removal excluding `'`/`-`, one leading
    * bullet cleaned (RE2 has no lookahead, so "not followed by another bullet"
    * is a second anchored match), whitespace split, then the single-char run
    * rule — a single survives only isolated AND alphanumeric. */
  private def bowKeptSql(x: String, alias: String): String = {
    val noPunct = s"regexp_replace(lower($x), '[^\\P{P}''-]', '', 'g')"
    val alt = s"(?:${O.bulletsAlt})"
    val deBullet = s"(CASE WHEN regexp_matches($noPunct, '^$alt') AND NOT " +
      s"regexp_matches($noPunct, '^$alt$alt') THEN " +
      O.strip(s"regexp_replace($noPunct, '^$alt', '')") + s" ELSE $noPunct END)"
    val toks = s"list_filter(string_split_regex($deBullet, '\\s+'), w -> w <> '')"
    s"""${alias}0 AS (SELECT doc_id, $toks AS t FROM documents),
       |$alias AS (
       |  SELECT doc_id, t[i] AS w FROM ${alias}0, unnest(range(1, len(t)+1)) AS u(i)
       |  WHERE length(t[i]) > 1 OR (
       |    regexp_matches(t[i], '^[\\pL\\p{Nd}]$$') AND
       |    (i = 1 OR length(t[i-1]) > 1) AND (i = len(t) OR length(t[i+1]) > 1)))""".stripMargin
  }

  private val missingOutSql = "regexp_replace(text, '\\S*e\\S*', '', 'g')"
  private val ngramOutSql = {
    val ws = O.words("text")
    s"array_to_string(list_slice($ws, 1, greatest(len($ws) - 5, 1)), ' ')"
  }

  private def grams2(x: String): String = O.shingles2(O.words(s"lower($x)"))

  private[queries] def qualitySql(x: String): String = {
    val ws = O.words(x)
    val nWords = s"len($ws)"
    val lenScore = s"least(length($x)::DOUBLE / 500.0, 1.0)"
    val sumWordLen = s"CAST(list_sum(list_prepend(0, list_transform($ws, w -> length(w)))) AS DOUBLE)"
    val meanWl = s"(CASE WHEN $nWords > 0 THEN $sumWordLen / $nWords ELSE 0.0 END)"
    val wlScore = s"(CASE WHEN $meanWl >= 3 AND $meanWl <= 10 THEN 1.0 ELSE 0.5 END)"
    val stopCnt = O.stopwordCount(x, TextAnalysis.StopwordsEn)
    val stopRatio = s"(CASE WHEN $nWords > 0 THEN $stopCnt::DOUBLE / $nWords ELSE 0.0 END)"
    val stopScore = s"least($stopRatio * 5.0, 1.0)"
    def charRatio(pat: String) =
      s"(CASE WHEN length($x) > 0 THEN " +
        s"(length($x) - length(regexp_replace($x, '$pat', '', 'g')))::DOUBLE / length($x) " +
        s"ELSE 0.0 END)"
    val punct = charRatio("\\p{P}")
    val digit = charRatio("[0-9]")
    s"round(greatest(0.0, $lenScore * 0.3 + $wlScore * 0.2 + $stopScore * 0.3 " +
      s"- $punct * 0.1 - $digit * 0.1 + 0.3), 4)"
  }

  private def langIdSql(x: String): String = {
    val en = O.stopwordCount(x, TextAnalysis.StopwordsEn)
    val es = O.stopwordCount(x, TextAnalysis.StopwordsEs)
    val de = O.stopwordCount(x, TextAnalysis.StopwordsDe)
    val fr = O.stopwordCount(x, TextAnalysis.StopwordsFr)
    s"(CASE WHEN greatest($en, $es, $de, $fr) = 0 THEN 'und' " +
      s"WHEN $en >= $es AND $en >= $de AND $en >= $fr THEN 'en' " +
      s"WHEN $es >= $de AND $es >= $fr THEN 'es' " +
      s"WHEN $de >= $fr THEN 'de' ELSE 'fr' END)"
  }

  /** Mirrors `TextAnalysis.detectLanguages` over a text expression `x` (keep `x`
    * small — it is inlined many times; the oracle wraps the corpus in a subquery). */
  private[queries] def detectLanguagesSql(x: String): String = {
    def cnt(re: String) = s"len(regexp_extract_all($x, '$re'))"
    val pairs = Seq(
      "eng" -> TextAnalysis.StopwordsEn, "spa" -> TextAnalysis.StopwordsEs,
      "deu" -> TextAnalysis.StopwordsDe, "fra" -> TextAnalysis.StopwordsFr,
      "ita" -> TextAnalysis.StopwordsIt, "por" -> TextAnalysis.StopwordsPt,
      "nld" -> TextAnalysis.StopwordsNl)
    val counts = pairs.map { case (code, sw) => code -> O.stopwordCount(x, sw) }
    val mx = s"greatest(${counts.map(_._2).mkString(", ")})"
    val vote = counts.foldRight("'und'") { case ((code, n), els) =>
      s"(CASE WHEN $mx > 0 AND $n = $mx THEN '$code' ELSE $els END)"
    }
    // NULL propagates (a bare CASE would fall through every WHEN to 'und');
    // the corpus' residue-11 NULL row pins this against the native expression.
    s"(CASE WHEN $x IS NULL THEN NULL " +
      s"WHEN trim($x) = '' THEN NULL " +
      s"WHEN ${cnt("[\\x{3040}-\\x{30FF}]")} > 0 THEN 'jpn' " +
      s"WHEN ${cnt("[\\x{AC00}-\\x{D7AF}]")} > 0 THEN 'kor' " +
      s"WHEN ${cnt("[\\x{4E00}-\\x{9FFF}]")} > 0 THEN 'zho' " +
      s"WHEN ${cnt("[\\x{0400}-\\x{04FF}]")} > 0 THEN 'rus' " +
      s"WHEN ${cnt("[\\x{0600}-\\x{06FF}]")} > 0 THEN 'ara' " +
      s"WHEN ${cnt("[\\x{0900}-\\x{097F}]")} > 0 THEN 'hin' " +
      s"WHEN ${cnt("[\\x{0370}-\\x{03FF}]")} > 0 THEN 'ell' " +
      s"WHEN ${cnt("[\\x{0590}-\\x{05FF}]")} > 0 THEN 'heb' " +
      s"WHEN ${cnt("[\\x{0E00}-\\x{0E7F}]")} > 0 THEN 'tha' " +
      s"WHEN regexp_matches($x, '^[\\x00-\\x7f]*$$') AND len(${O.words(x)}) < 5 " +
      s"THEN 'eng' ELSE $vote END)"
  }

  /** `sig` SQL: k=8 minhash over 3-shingles of lowercased words — mirrors
    * `minHashSignature(c, 8, 3)`. NB the Spark side shingles the RAW text's words;
    * mirror exactly (no lowercase). */
  private[queries] def minhashSigSql(x: String): String = {
    val ws = O.words(x)
    val sh3 = O.shingles3(ws)
    s"list_transform(range(0, 8), j -> list_min(list_transform(" +
      s"list_transform($sh3, s -> ${ph("s")}), " +
      s"h -> (h * (2*j + 1) + 7919*j) % 1000000007)))"
  }

  /** Vote total for simhash bit j over word hashes `hs`: parity of the keyed
    * variant `(h·(2j+1) + 7919j) mod 1e9+7` contributes ±1. */
  private def simhashVote(j: String): String =
    s"CAST(list_sum(list_transform(hs, h -> " +
      s"(((h * (2 * $j + 1) + 7919 * $j) % 1000000007) % 2) * 2 - 1)) AS BIGINT)"

  /** One 32-bit half of the 64-bit simhash: bits [base, base+32). */
  private def simhashHalf(base: Int): String =
    s"CAST(list_sum(list_transform(range($base, ${base + 32}), j -> " +
      s"CASE WHEN ${simhashVote("j")} > 0 THEN (1::BIGINT << (j - $base)) ELSE 0 END)) AS BIGINT)"

  private val cosSimSql: String = s"round(${cosSql("embedding", "qv")}, 6)"

  /** Unrounded cosine between two named list columns — mirrors [[guardedCos]]
    * incl. BOTH its edge semantics: zero-norm → 0.0, NULL input → NULL (a
    * bare `coalesce(…, 0.0)` would rank a NULL-embedding row as 0.0 while
    * Spark leaves it NULL). The guard stays `dot / nullif(norms, 0)` so each
    * O(dim) norm fold appears ONCE in the generated SQL (a CASE on the norms
    * would inline them twice — DuckDB does not reliably CSE across CASE
    * branches); the coalesce fallback is 0.0 only when both inputs are
    * non-NULL, which costs two cheap IS NULL checks, not a fold. */
  private def cosSql(a: String, b: String): String = {
    def norm(x: String) =
      s"sqrt(list_sum(list_transform($x, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    s"coalesce(list_sum(list_transform(range(1, len($a) + 1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))) / " +
      s"nullif(${norm(a)} * ${norm(b)}, 0), " +
      s"CASE WHEN $a IS NULL OR $b IS NULL THEN NULL ELSE 0.0 END)"
  }

  def oracles: Map[String, String] = Map(
    "q_token_counts" ->
      ("SELECT doc_id, CAST(len(" + O.words("text") + ") AS INT) AS n_ws_tokens, " +
        "CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) " +
        "AS n_bpe_tokens FROM documents ORDER BY doc_id"),

    "q_quality_score" -> docSel(qualitySql("text"), "quality"),

    "q_lang_id" -> docSel(langIdSql("text"), "lang_pred"),

    "q_detect_languages" ->
      s"""SELECT doc_id, ${detectLanguagesSql("t")} AS lang_pred
         |FROM (SELECT doc_id, ${langCorpusTextSql("text")} AS t FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q_doc_fingerprint" -> docSel(fingerprint(withNonBmpSql("text")), "fp"),

    // winnowing re-derived: k-gram polyHashes over the alnum-stripped text,
    // full-window minima (one window over everything when grams < w), distinct
    // set. The outer lambda vars (gi, p) dodge the polyHash helper's own (i).
    "q_winnow_fingerprint" ->
      s"""WITH n AS (
         |  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, CASE WHEN length(s) >= 8
         |    THEN list_transform(range(1, length(s) - 6),
         |           gi -> ${O.polyHash("substring(s, gi, 8)")})
         |    ELSE []::BIGINT[] END AS hs FROM n),
         |m AS (
         |  SELECT doc_id, CASE WHEN len(hs) = 0 THEN []::BIGINT[]
         |    WHEN len(hs) < 4 THEN [list_min(hs)]
         |    ELSE list_transform(range(1, len(hs) - 2), p -> list_min(hs[p:p+3]))
         |    END AS mins FROM g),
         |f AS (SELECT doc_id, list_sort(list_distinct(mins)) AS fps FROM m)
         |SELECT doc_id, CAST(len(fps) AS INT) AS n_fp,
         |  array_to_string(fps, ',') AS fp_str
         |FROM f ORDER BY doc_id""".stripMargin,

    "q_winnow_near_dup" -> WinnowNearDupOracleSql,

    // the streaming twin reduces the drained per-fingerprint candidate
    // events to the same shared counts — one oracle pins both renderings
    "q_stream_winnow_near_dup" -> WinnowNearDupOracleSql,

    "q_exact_dedup" ->
      s"""SELECT fp, CAST(count(*) AS BIGINT) AS n_docs,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM (SELECT doc_id, ${fingerprint("text")} AS fp FROM $dupUnion)
         |GROUP BY fp HAVING count(*) > 1 ORDER BY fp""".stripMargin,

    // every doc_id % 3 == 0 re-emitted under id+1000000 -> exactly those
    // fingerprints form duplicate groups with first_doc = the original id
    "q_stream_exact_dedup" ->
      s"""SELECT fp, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS first_doc
         |FROM (
         |  SELECT doc_id, ${fingerprint("text")} AS fp FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, ${fingerprint("text")} AS fp FROM documents
         |  WHERE doc_id % 3 = 0)
         |GROUP BY fp HAVING count(*) > 1 ORDER BY fp""".stripMargin,

    // the q_lsh_near_dup pair set with per-band provenance and no cross-band
    // dedup — exactly the candidate events the streaming bucket fold emits
    "q_stream_lsh_near_dup" ->
      s"""WITH sig AS (
         |  SELECT doc_id, ${minhashSigSql("text")} AS sig FROM $nearDupUnion),
         |bands AS (
         |  SELECT doc_id, unnest(list_transform(range(0, len(sig) // 2), b ->
         |    {'band_idx': b,
         |     'band_key': (sig[2*b+1] * 31 + sig[2*b+2]) % 1000000007}),
         |    recursive := true)
         |  FROM sig),
         |safe AS (
         |  SELECT band_idx, band_key FROM bands
         |  GROUP BY band_idx, band_key HAVING count(*) <= 1000),
         |bounded AS (
         |  SELECT b.* FROM bands b JOIN safe s
         |    ON b.band_idx = s.band_idx AND b.band_key = s.band_key)
         |SELECT CAST(a.band_idx AS INTEGER) AS band_idx,
         |  a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bounded a JOIN bounded b
         |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
         |ORDER BY band_idx, doc_a, doc_b""".stripMargin,

    "q_minhash_signature" ->
      docSel(s"array_to_string(${minhashSigSql(withNonBmpSql("text"))}, ',')", "sig_str"),

    "q_lsh_near_dup" ->
      s"""WITH sig AS (
         |  SELECT doc_id, ${minhashSigSql("text")} AS sig FROM $nearDupUnion),
         |bands AS (
         |  SELECT doc_id, unnest(list_transform(range(0, len(sig) // 2), b ->
         |    {'band_idx': b,
         |     'band_key': (sig[2*b+1] * 31 + sig[2*b+2]) % 1000000007}),
         |    recursive := true)
         |  FROM sig),
         |safe AS (
         |  SELECT band_idx, band_key FROM bands
         |  GROUP BY band_idx, band_key HAVING count(*) <= 1000),
         |bounded AS (
         |  SELECT b.* FROM bands b JOIN safe s
         |    ON b.band_idx = s.band_idx AND b.band_key = s.band_key)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bounded a JOIN bounded b
         |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    // the full curation pipeline composed from the proven stage oracles
    "q_curate_corpus" ->
      s"""WITH fp AS (
         |  SELECT doc_id, text, ${fingerprint("text")} AS fp FROM $nearDupUnion),
         |keep AS (SELECT fp, min(doc_id) AS doc_id FROM fp GROUP BY fp),
         |exact_kept AS (
         |  SELECT f.doc_id, f.text FROM fp f
         |  JOIN keep k ON f.fp = k.fp AND f.doc_id = k.doc_id),
         |sig AS (SELECT doc_id, ${minhashSigSql("text")} AS sig FROM exact_kept),
         |bands AS (
         |  SELECT doc_id, unnest(list_transform(range(0, len(sig) // 2), b ->
         |    {'band_idx': b,
         |     'band_key': (sig[2*b+1] * 31 + sig[2*b+2]) % 1000000007}),
         |    recursive := true)
         |  FROM sig),
         |safe AS (
         |  SELECT band_idx, band_key FROM bands
         |  GROUP BY band_idx, band_key HAVING count(*) <= 1000),
         |bounded AS (
         |  SELECT b.* FROM bands b JOIN safe s
         |    ON b.band_idx = s.band_idx AND b.band_key = s.band_key),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bounded a JOIN bounded b
         |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |   AND a.doc_id < b.doc_id),
         |sh AS (
         |  SELECT doc_id, list_distinct(${O.shingles3(O.words("text"))}) AS sh
         |  FROM exact_kept),
         |drops AS (
         |  SELECT DISTINCT doc_b AS doc_id FROM cand
         |  JOIN sh sa ON cand.doc_a = sa.doc_id
         |  JOIN sh sb ON cand.doc_b = sb.doc_id
         |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         |    len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.8),
         |curated AS (
         |  SELECT * FROM exact_kept
         |  WHERE doc_id NOT IN (SELECT doc_id FROM drops))
         |SELECT doc_id, ${langIdSql("text")} AS lang_pred,
         |  ${qualitySql("text")} AS quality,
         |  CAST(len(${O.words("text")}) AS INT) AS n_tokens
         |FROM curated
         |WHERE ${qualitySql("text")} >= 0.6
         |ORDER BY doc_id""".stripMargin,

    "q_jaccard_near_dup" ->
      s"""WITH sig AS (
         |  SELECT doc_id, ${minhashSigSql("text")} AS sig FROM $nearDupUnion),
         |bands AS (
         |  SELECT doc_id, unnest(list_transform(range(0, len(sig) // 2), b ->
         |    {'band_idx': b,
         |     'band_key': (sig[2*b+1] * 31 + sig[2*b+2]) % 1000000007}),
         |    recursive := true)
         |  FROM sig),
         |safe AS (
         |  SELECT band_idx, band_key FROM bands
         |  GROUP BY band_idx, band_key HAVING count(*) <= 1000),
         |bounded AS (
         |  SELECT b.* FROM bands b JOIN safe s
         |    ON b.band_idx = s.band_idx AND b.band_key = s.band_key),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bounded a JOIN bounded b
         |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |   AND a.doc_id < b.doc_id),
         |sh AS (
         |  SELECT doc_id, list_distinct(${O.shingles3(O.words("text"))}) AS sh
         |  FROM $nearDupUnion)
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT doc_a, doc_b,
         |    round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         |      len(list_distinct(list_concat(sa.sh, sb.sh))), 4) AS jaccard
         |  FROM cand
         |  JOIN sh sa ON cand.doc_a = sa.doc_id
         |  JOIN sh sb ON cand.doc_b = sb.doc_id)
         |WHERE jaccard >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q_simhash" ->
      s"""SELECT doc_id, printf('%08x%08x', ${simhashHalf(32)}, ${simhashHalf(0)}) AS simhash
         |FROM (SELECT doc_id,
         |        list_transform(${wordsL(withNonBmpSql("text"))}, w -> ${ph("w")}) AS hs
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q_simhash_near_dup" ->
      s"""WITH inp AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
         |  UNION ALL
         |  SELECT CAST(doc_id AS BIGINT) + 30000, text || ' xtra'
         |  FROM documents WHERE doc_id % 9 = 0
         |  UNION ALL
         |  SELECT CAST(doc_id AS BIGINT) + 60000, text
         |  FROM documents WHERE doc_id % 15 = 0),
         |sigs AS (
         |  SELECT doc_id, ${simhashHalf(32)} AS h32, ${simhashHalf(0)} AS h0
         |  FROM (SELECT doc_id,
         |          list_transform(${wordsL(withNonBmpSql("text"))}, w -> ${ph("w")}) AS hs
         |        FROM inp)),
         |bands AS (
         |  SELECT doc_id, h32, h0, i AS band_idx,
         |    CASE i WHEN 0 THEN h0 & 65535 WHEN 1 THEN (h0 >> 16) & 65535
         |           WHEN 2 THEN h32 & 65535 ELSE (h32 >> 16) & 65535 END AS band_key
         |  FROM sigs, range(0, 4) t(i)),
         |capped AS (
         |  SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY band_idx, band_key) AS bc
         |                 FROM bands) WHERE bc <= 1000),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.h32 AS a32, a.h0 AS a0, b.h32 AS b32, b.h0 AS b0
         |  FROM capped a JOIN capped b
         |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |    AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(bit_count(xor(a32, b32)) + bit_count(xor(a0, b0)) AS INT) AS hamming
         |FROM cand
         |WHERE bit_count(xor(a32, b32)) + bit_count(xor(a0, b0)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,

    // q_simhash_near_dup's pair set with per-band provenance and no
    // cross-band dedup — exactly the candidate events the streaming bucket
    // fold emits, hamming-verified
    "q_stream_simhash_near_dup" ->
      s"""WITH inp AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
         |  UNION ALL
         |  SELECT CAST(doc_id AS BIGINT) + 30000, text || ' xtra'
         |  FROM documents WHERE doc_id % 9 = 0
         |  UNION ALL
         |  SELECT CAST(doc_id AS BIGINT) + 60000, text
         |  FROM documents WHERE doc_id % 15 = 0),
         |sigs AS (
         |  SELECT doc_id, ${simhashHalf(32)} AS h32, ${simhashHalf(0)} AS h0
         |  FROM (SELECT doc_id,
         |          list_transform(${wordsL(withNonBmpSql("text"))}, w -> ${ph("w")}) AS hs
         |        FROM inp)),
         |bands AS (
         |  SELECT doc_id, h32, h0, i AS band_idx,
         |    CASE i WHEN 0 THEN h0 & 65535 WHEN 1 THEN (h0 >> 16) & 65535
         |           WHEN 2 THEN h32 & 65535 ELSE (h32 >> 16) & 65535 END AS band_key
         |  FROM sigs, range(0, 4) t(i)),
         |capped AS (
         |  SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY band_idx, band_key) AS bc
         |                 FROM bands) WHERE bc <= 1000),
         |cand AS (
         |  SELECT CAST(a.band_idx AS INTEGER) AS band_idx,
         |    a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.h32 AS a32, a.h0 AS a0, b.h32 AS b32, b.h0 AS b0
         |  FROM capped a JOIN capped b
         |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |    AND a.doc_id < b.doc_id)
         |SELECT band_idx, doc_a, doc_b,
         |  CAST(bit_count(xor(a32, b32)) + bit_count(xor(a0, b0)) AS INT) AS hamming
         |FROM cand
         |WHERE bit_count(xor(a32, b32)) + bit_count(xor(a0, b0)) <= 3
         |ORDER BY band_idx, doc_a, doc_b""".stripMargin,

    "q_ann_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, $cosSimSql AS cos_sim
         |FROM embeddings, q
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    "q_ann_lsh_bucket" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding,
         |    CAST(list_sum(list_transform(range(0, 8), i ->
         |      CASE WHEN embedding[i + 1] > 0 THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT)
         |      AS bucket
         |  FROM embeddings),
         |q AS (SELECT embedding AS qv, bucket AS qbucket FROM b WHERE vec_id = 0)
         |SELECT vec_id, bucket, $cosSimSql AS cos_sim
         |FROM b, q WHERE bucket = qbucket
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    "q_ann_ivf" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
         |sims AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosSql("e.embedding", "c.cv")} AS sim
         |  FROM embeddings e, cents c),
         |cells AS (
         |  SELECT vec_id, embedding, cid AS cell FROM (
         |    SELECT vec_id, embedding, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
         |    FROM sims) WHERE rn = 1),
         |q AS (SELECT embedding AS qv, cell AS qcell FROM cells WHERE vec_id = 1)
         |SELECT vec_id, cell, $cosSimSql AS cos_sim
         |FROM cells, q WHERE cell = qcell
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    "q_ann_ivf_multiprobe" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
         |sims AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosSql("e.embedding", "c.cv")} AS sim
         |  FROM embeddings e, cents c),
         |cells AS (
         |  SELECT vec_id, embedding, cid AS cell FROM (
         |    SELECT vec_id, embedding, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
         |    FROM sims) WHERE rn = 1),
         |qcells AS (
         |  SELECT cid AS qcell FROM (
         |    SELECT cid, row_number() OVER (ORDER BY sim DESC, cid) AS rn
         |    FROM sims WHERE vec_id = 1) WHERE rn <= 2),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1)
         |SELECT vec_id, cell, $cosSimSql AS cos_sim
         |FROM cells, q WHERE cell IN (SELECT qcell FROM qcells)
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    // margin criterion re-derived: same cell assignment as q_ann_ivf, capped
    // cell equi-join, micro-rounded cosines, exact-long neighborhood sums
    "q_margin_align" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
         |sims AS (
         |  SELECT e.vec_id, e.embedding, e.label, c.cid,
         |    ${cosSql("e.embedding", "c.cv")} AS sim
         |  FROM embeddings e, cents c),
         |cells0 AS (
         |  SELECT vec_id, embedding, label, cid AS cell FROM (
         |    SELECT vec_id, embedding, label, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
         |    FROM sims) WHERE rn = 1),
         |capped AS (
         |  SELECT * FROM (
         |    SELECT *, count(*) OVER (PARTITION BY cell, label % 2) AS cn
         |    FROM cells0) WHERE cn <= 1000),
         |pairs AS (
         |  SELECT a.cell, a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    CAST(round(${cosSql("a.embedding", "b.embedding")} * 1e6) AS BIGINT)
         |      AS cos_micro
         |  FROM capped a JOIN capped b
         |    ON a.cell = b.cell AND a.label % 2 = 0 AND b.label % 2 = 1),
         |ranked AS (
         |  SELECT *,
         |    row_number() OVER (PARTITION BY vec_a ORDER BY cos_micro DESC, vec_b)
         |      AS rx,
         |    row_number() OVER (PARTITION BY vec_b ORDER BY cos_micro DESC, vec_a)
         |      AS ry
         |  FROM pairs),
         |nx AS (
         |  SELECT vec_a, CAST(sum(cos_micro) AS BIGINT) AS sx,
         |    CAST(count(*) AS BIGINT) AS kx
         |  FROM ranked WHERE rx <= 4 GROUP BY vec_a),
         |ny AS (
         |  SELECT vec_b, CAST(sum(cos_micro) AS BIGINT) AS sy,
         |    CAST(count(*) AS BIGINT) AS ky
         |  FROM ranked WHERE ry <= 4 GROUP BY vec_b),
         |m AS (
         |  SELECT p.vec_a, p.vec_b, p.cell,
         |    CASE WHEN (CAST(sx AS DOUBLE) / kx + CAST(sy AS DOUBLE) / ky) / 2.0
         |           > 0.0 THEN
         |      CAST(round(CAST(cos_micro AS DOUBLE) /
         |        ((CAST(sx AS DOUBLE) / kx + CAST(sy AS DOUBLE) / ky) / 2.0)
         |        * 1e6) AS BIGINT) END AS margin_micro
         |  FROM pairs p JOIN nx USING (vec_a) JOIN ny USING (vec_b)),
         |best AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_a
         |    ORDER BY margin_micro DESC, vec_b) AS rn FROM m)
         |SELECT vec_a, vec_b, cell, margin_micro FROM best
         |WHERE rn = 1 AND margin_micro >= 1000000
         |ORDER BY vec_a""".stripMargin,

    "q_embed_near_dup" ->
      s"""WITH inp AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings
         |  WHERE vec_id % 10 = 0),
         |bands AS (
         |  SELECT vec_id, unnest(list_transform(range(0, 4), b ->
         |    {'band_idx': b,
         |     'band_key': CAST(list_sum(list_transform(range(0, 8), i ->
         |       CASE WHEN embedding[b * 8 + i + 1] > 0 THEN (1::BIGINT << i)
         |            ELSE 0 END)) AS BIGINT)}),
         |    recursive := true)
         |  FROM inp),
         |safe AS (
         |  SELECT * FROM (
         |    SELECT vec_id, band_idx, band_key,
         |      count(*) OVER (PARTITION BY band_idx, band_key) AS bucket_n
         |    FROM bands)
         |  WHERE bucket_n <= 1000),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, b2.vec_id AS vec_b
         |  FROM safe a JOIN safe b2
         |    ON a.band_idx = b2.band_idx AND a.band_key = b2.band_key
         |   AND a.vec_id < b2.vec_id)
         |SELECT vec_a, vec_b, cos_sim FROM (
         |  SELECT vec_a, vec_b,
         |    round(list_sum(list_transform(range(1, len(ea.embedding) + 1),
         |        i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE))) /
         |      (sqrt(list_sum(list_transform(ea.embedding,
         |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |       sqrt(list_sum(list_transform(eb.embedding,
         |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos_sim
         |  FROM cand
         |  JOIN inp ea ON cand.vec_a = ea.vec_id
         |  JOIN inp eb ON cand.vec_b = eb.vec_id)
         |WHERE cos_sim >= 0.999
         |ORDER BY vec_a, vec_b""".stripMargin,

    "q_image_meta" ->
      """SELECT doc_id,
        |  CAST(doc_id % 1000 + 1 AS INT) AS width,
        |  CAST(doc_id % 700 + 1 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 3 END AS INT) AS n_channels,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'gif' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_transcribe_audio" ->
      """SELECT doc_id, CAST(i AS INT) AS segment_idx,
        |  CAST(i * 5 AS DOUBLE) AS segment_start_seconds,
        |  CAST(least(i * 5 + 5, doc_id % 23 + 1) AS DOUBLE) AS segment_end_seconds,
        |  '[stt-stub segment ' || i || ' @' || (i * 5) || 's]' AS text
        |FROM (
        |  SELECT doc_id, unnest(list_transform(
        |    range(0, CAST(ceil((doc_id % 23 + 1) / 5.0) AS INT)), x -> {'i': x}),
        |    recursive := true)
        |  FROM documents)
        |ORDER BY doc_id, segment_idx""".stripMargin,

    "q_frame_sample" ->
      """SELECT doc_id, CAST(t AS INT) AS frame_ts,
        |  substring(payload, CAST(t AS INT) * 16 + 1, 16) AS frame_str
        |FROM (
        |  SELECT doc_id,
        |    substring(regexp_replace(text, '[^ -~]', '', 'g'), 1, 200) AS payload,
        |    unnest(list_transform(range(0, doc_id % 7 + 3, 2), x -> {'t': x}),
        |      recursive := true)
        |  FROM documents)
        |ORDER BY doc_id, frame_ts""".stripMargin,

    "q_bag_of_words" ->
      s"""WITH ${bowKeptSql("text", "kept")}
         |SELECT w AS word, CAST(count(*) AS BIGINT) AS n
         |FROM kept
         |GROUP BY w ORDER BY n DESC, word LIMIT 100""".stripMargin,

    "q_percent_missing_text" ->
      s"""WITH ${bowKeptSql("text", "srck")},
         |${bowKeptSql(missingOutSql, "outk")},
         |src AS (
         |  SELECT doc_id, w, count(*) AS sn FROM srck GROUP BY doc_id, w),
         |outw AS (
         |  SELECT doc_id, w, count(*) AS onn FROM outk GROUP BY doc_id, w)
         |SELECT src.doc_id,
         |  round(1.0 - SUM(LEAST(sn, coalesce(onn, 0)))::DOUBLE / SUM(sn)::DOUBLE, 4)
         |    AS pct_missing
         |FROM src LEFT JOIN outw ON src.doc_id = outw.doc_id AND src.w = outw.w
         |GROUP BY src.doc_id ORDER BY src.doc_id""".stripMargin,

    // the calculator re-derived: prepare_str = split+join (whitespace
    // standardization), accuracy = 1 − bounded levenshtein/len(prepared
    // source) with the byte-ratio guard on the RAW ccts, %missing = the BOW
    // missing-mass rule; round_even matches the Spark side's HALF_EVEN
    "q_text_eval" -> {
      val outSql = s"(CASE WHEN doc_id % 9 = 0 THEN text || ' ' || text || ' ' " +
        s"|| text ELSE $missingOutSql END)"
      def prep(x: String) =
        s"array_to_string(list_filter(string_split_regex($x, '\\s+'), w -> w <> ''), ' ')"
      s"""WITH base AS (
         |  SELECT doc_id, text, $outSql AS otext,
         |    ${prep(outSql)} AS po, ${prep("text")} AS ps
         |  FROM documents),
         |acc AS (
         |  SELECT doc_id,
         |    CASE WHEN strlen(otext)::DOUBLE / strlen(text) > 0.5
         |           AND strlen(otext)::DOUBLE / strlen(text) < 2.0
         |         THEN round_even(1.0 - least(greatest(
         |           levenshtein(po, ps)::DOUBLE / greatest(length(ps), 1),
         |           0.0), 1.0), 3)
         |         ELSE 0.01 END AS acc
         |  -- strlen(text) = 0 docs DROP: the reference's byte-ratio guard
         |  -- divides by the source size, so an empty ground truth raises
         |  -- ZeroDivisionError there and the doc is a per-doc failure
         |  FROM base WHERE strlen(text) > 0),
         |${bowKeptSql("text", "srck")},
         |${bowKeptSql(outSql, "outk")},
         |src AS (SELECT doc_id, w, count(*) AS sn FROM srck GROUP BY doc_id, w),
         |outw AS (SELECT doc_id, w, count(*) AS onn FROM outk GROUP BY doc_id, w),
         |msum AS (
         |  SELECT src.doc_id,
         |    SUM(GREATEST(sn - coalesce(onn, 0), 0))::DOUBLE AS missing,
         |    SUM(sn)::DOUBLE AS total
         |  FROM src LEFT JOIN outw ON src.doc_id = outw.doc_id AND src.w = outw.w
         |  GROUP BY src.doc_id)
         |SELECT 'doc' || CAST(d.doc_id AS VARCHAR) || '.pdf' AS filename,
         |  '.pdf' AS doctype,
         |  'c' || CAST(d.doc_id % 2 AS VARCHAR) AS connector,
         |  a.acc AS "cct-accuracy",
         |  CASE WHEN m.total IS NULL OR m.total = 0 THEN 0.0
         |       ELSE least(round_even(m.missing / m.total, 3), 1.0)
         |       END AS "cct-%missing"
         |FROM documents d
         |JOIN acc a USING (doc_id)
         |LEFT JOIN msum m ON d.doc_id = m.doc_id
         |ORDER BY 'c' || CAST(d.doc_id % 2 AS VARCHAR) || '/doc' ||
         |  CAST(d.doc_id AS VARCHAR) || '.pdf.json'""".stripMargin
    },

    "q_repetition_signals" -> repetitionOracleSql(),

    "q_c4_line_filter" -> c4OracleSql(),

    "q_quality_prune" ->
      s"""WITH aug AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 THEN base || ' merge lorem ipsum tail {'
         |         WHEN doc_id % 4 = 0 THEN base || ' merge ' || base
         |         ELSE base END AS text
         |  FROM (SELECT doc_id,
         |          text || ' merge This document ends with a proper sentence.' AS base
         |        FROM documents)),
         |rep AS (${repetitionOracleSql("aug")}), c4 AS (${c4OracleSql("aug")}),
         |j AS (
         |  SELECT rep.doc_id,
         |    (coalesce(dup_line_frac, 0) > 0.30 OR
         |     coalesce(top_2gram_frac, 0) > 0.20 OR
         |     coalesce(dup_5gram_frac, 0) > 0.15) AS repetitive,
         |    (has_lorem OR has_brace) AS flagged,
         |    (n_kept = 0) AS no_clean_lines
         |  FROM rep JOIN c4 USING (doc_id))
         |SELECT doc_id, repetitive, flagged, no_clean_lines,
         |  (NOT repetitive AND NOT flagged AND NOT no_clean_lines) AS keep
         |FROM j ORDER BY doc_id""".stripMargin,

    // every Gopher rule re-derived from the same augmented text; `keep`
    // decides on the UN-rounded signals exactly as the engine does
    "q_gopher_rules" -> {
      val stopHits = Seq("the", "be", "to", "of", "and", "that", "have", "with")
        .map(sw => s"(CASE WHEN list_contains(list_transform(ws, " +
          s"w -> lower(w)), '$sw') THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH aug AS (
         |  SELECT doc_id, CASE
         |    WHEN doc_id % 5 = 0 THEN text || chr(10) ||
         |      '### # ## spam ... more ... and ...'
         |    WHEN doc_id % 5 = 1 THEN repeat('•item number four' || chr(10), 40)
         |      || string_split(text, chr(10))[1]
         |    WHEN doc_id % 5 = 2 THEN text || chr(10) || 'trailing thought...' ||
         |      chr(10) || 'another one…' || chr(10) || 'more...'
         |    WHEN doc_id % 5 = 3 THEN text ||
         |      ' 101 202 303 404 505 606 707 808 909 111 222 333'
         |    ELSE text END AS t
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, t, ${O.words("t")} AS ws,
         |    list_filter(list_transform(string_split(t, chr(10)), l -> trim(l)),
         |      l -> l <> '') AS ls
         |  FROM aug),
         |sig AS (
         |  SELECT doc_id, len(ws) AS nw, len(ls) AS nl,
         |    CASE WHEN len(ws) > 0 THEN
         |      CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) /
         |        len(ws) ELSE 0.0 END AS mean_len,
         |    (length(t) - length(replace(t, '#', ''))) / 1 +
         |      (length(t) - length(replace(t, '...', ''))) / 3 +
         |      (length(t) - length(replace(t, '…', ''))) / 1 AS symbols,
         |    len(list_filter(ls, l -> regexp_matches(l, '^[-•*‣▪]'))) AS n_bullet,
         |    len(list_filter(ls, l -> regexp_matches(l, '(\\.\\.\\.|…)$$')))
         |      AS n_ell,
         |    len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
         |    ($stopHits) AS stop_hits
         |  FROM f),
         |r AS (
         |  SELECT doc_id, nw, stop_hits, mean_len,
         |    CASE WHEN nw > 0 THEN symbols / nw ELSE 0.0 END AS symbol_ratio,
         |    CASE WHEN nl > 0 THEN CAST(n_bullet AS DOUBLE) / nl ELSE 0.0 END
         |      AS bullet_frac,
         |    CASE WHEN nl > 0 THEN CAST(n_ell AS DOUBLE) / nl ELSE 0.0 END
         |      AS ell_frac,
         |    CASE WHEN nw > 0 THEN CAST(n_alpha AS DOUBLE) / nw ELSE 0.0 END
         |      AS alpha_frac
         |  FROM sig)
         |SELECT doc_id, CAST(nw AS INT) AS n_words,
         |  round(mean_len, 6) AS mean_word_len,
         |  round(symbol_ratio, 6) AS symbol_ratio,
         |  round(bullet_frac, 6) AS bullet_line_frac,
         |  round(ell_frac, 6) AS ellipsis_line_frac,
         |  round(alpha_frac, 6) AS alpha_word_frac,
         |  CAST(stop_hits AS INT) AS n_stop_hits,
         |  (nw >= 20 AND nw <= 100000 AND mean_len >= 3.0 AND mean_len <= 10.0
         |    AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9 AND ell_frac <= 0.3
         |    AND alpha_frac >= 0.8 AND stop_hits >= 2) AS keep
         |FROM r ORDER BY doc_id""".stripMargin
    },

    "q_ngram_overlap" ->
      s"""WITH src AS (
         |  SELECT doc_id, g, count(*) AS sn
         |  FROM (SELECT doc_id, unnest(${grams2("text")}) AS g FROM documents)
         |  GROUP BY doc_id, g),
         |outg AS (
         |  SELECT doc_id, g, count(*) AS onn
         |  FROM (SELECT doc_id, unnest(${grams2(ngramOutSql)}) AS g FROM documents)
         |  GROUP BY doc_id, g)
         |SELECT src.doc_id,
         |  round(100.0 * SUM(LEAST(sn, coalesce(onn, 0)))::DOUBLE / SUM(sn)::DOUBLE, 2)
         |    AS shared_pct
         |FROM src LEFT JOIN outg ON src.doc_id = outg.doc_id AND src.g = outg.g
         |GROUP BY src.doc_id ORDER BY src.doc_id""".stripMargin)
}
