package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus prep (SURVEY.md §2.1 K5/K6/K8 +
  * language-ID and document fingerprinting from the builder brief).
  *
  * Everything is column expressions over tokens — narrow, codegen'd, no
  * UDFs; the lexicon join broadcasts (dim-sized at any corpus scale).
  */
object Text {

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Long-document chunking (VERDICT r8 next-round #4 — the missing half of
    * the k22 sequence-packing story): split each doc into ≤ `window`-token
    * chunks on a fixed stride of `window − overlap` tokens, consecutive
    * chunks sharing `overlap` tokens (the standard training-data recipe so
    * no context is lost at a hard cut). Chunk count and per-chunk token
    * counts are pure integer arithmetic over the doc's token count —
    * m = 1 for n ≤ W, else 1 + ⌈(n − W) / stride⌉; chunk i carries
    * min(W, n − i·stride) tokens — so the DuckDB oracle reproduces them
    * exactly; the chunk TEXT is the corresponding token slice rejoined
    * with single spaces (declared whitespace normalization, matching
    * [[tokens]]). Row explosion is per-doc and bounded by n/stride — a
    * narrow keyed flatMap shape, no shuffle at all until a downstream
    * consumer aggregates.
    */
  def chunkDocs(
      df: DataFrame,
      textCol: String,
      window: Int,
      overlap: Int): DataFrame = {
    require(window > 0 && overlap >= 0 && overlap < window,
      s"need 0 <= overlap < window, got window=$window overlap=$overlap")
    val stride = window - overlap
    val n = size(col("__w"))
    val m = when(n <= window, lit(1)).otherwise(
      (lit(1) + floor((n - lit(window) + lit(stride) - 1) / lit(stride)))
        .cast("int"))
    df.withColumn("__w", tokens(col(textCol)))
      .withColumn("chunk_idx", explode(sequence(lit(0), m - 1)))
      .withColumn("chunk_tok",
        least(lit(window), n - col("chunk_idx") * stride).cast("long"))
      .withColumn("chunk_text",
        array_join(slice(col("__w"),
          col("chunk_idx") * stride + 1, col("chunk_tok").cast("int")), " "))
      .drop("__w")
  }

  // --- K6: sentiment lexicon scoring ---------------------------------------

  /** Integer-scored lexicon over the corpus vocabulary (FIXTURES.md §B4).
    * Integer scores keep the per-lang aggregates exactly oracle-matchable.
    */
  val lexicon: Seq[(String, Int)] = Seq(
    "fast" -> 2, "small" -> 1, "key" -> 1, "index" -> 1, "sort" -> 1,
    "merge" -> 1, "hash" -> 1, "join" -> 1, "window" -> 1, "column" -> 1,
    "table" -> 0, "order" -> 0, "part" -> 0, "the" -> 0, "scan" -> -1,
    "slow" -> -2, "error" -> -2, "fail" -> -2, "null" -> -1, "skew" -> -1,
    "spill" -> -2, "shuffle" -> -1, "big" -> 0, "filter" -> 1, "limit" -> 0)

  def lexiconDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    lexicon.toDF("word", "score")
  }

  /** Per-document sentiment: explode tokens, broadcast-join the lexicon,
    * sum matched scores. Returns (doc rows + score_sum, n_matched).
    */
  def sentiment(spark: SparkSession, docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val tok = docs.select(col(idCol), explode(tokens(col(textCol))).as("word"))
    tok.join(broadcast(lexiconDf(spark)), Seq("word"))
      .groupBy(idCol)
      .agg(sum("score").as("score_sum"), count(lit(1)).as("n_matched"))
  }

  // --- K8: text quality filters --------------------------------------------

  /** Quality metrics: word count, mean word length, stopword ratio,
    * non-space char count. All integer-or-exact-ratio valued.
    */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  def withQualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nWords = size(toks)
    val nChars = length(regexp_replace(col(textCol), "\\s+", ""))
    val nStop = size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*)))
    df.withColumn("n_words", nWords)
      .withColumn("n_chars_ns", nChars)
      .withColumn("mean_wlen", nChars.cast("double") / nWords)
      .withColumn("stop_ratio", nStop.cast("double") / nWords)
  }

  /** The keep/drop rule a corpus-prep pipeline would apply. */
  def qualityKeep: Column =
    col("n_words") >= 5 && col("mean_wlen").between(2.0, 12.0) &&
      col("stop_ratio") <= 0.5

  // --- Language ID (n-gram/marker heuristic) -------------------------------

  /** Per-language marker words (tiny, genuinely distinctive function
    * words). Prediction = language with the most marker hits (ties break to
    * the lexicographically greatest language, deterministically); zero hits
    * → 'und'. Heuristic by design — no model, no network.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "es" -> Seq("el", "la", "que", "los", "es"),
    "fr" -> Seq("le", "la", "les", "est", "une"),
    "zh" -> Seq("的", "是", "在", "了", "不"))

  def langid(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = langMarkers.map { case (lang, markers) =>
      struct(
        size(filter(toks, t => t.isin(markers.map(lit(_)): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = greatest(scores: _*) // struct compare: hits first, lang tiebreak
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  // --- Document fingerprinting (bottom-m sketch over shingle hashes) ------

  /** Bottom-m MinHash sketch: the m smallest xxhash64 values over word
    * shingles — a compact fingerprint whose overlap estimates Jaccard
    * (classic bottom-k sketch). Deterministic, narrow, no shuffle; built on
    * pre-hashed shingles (dedup on longs, not strings — see
    * [[Dedup.shingleHashes]]).
    */
  def fingerprintSketch(text: Column, shingleSize: Int, m: Int): Column =
    slice(array_sort(Dedup.shingleHashes(text, shingleSize)), 1, m)

  /** Jaccard estimate from two bottom-m sketches. */
  def sketchSimilarity(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b))

  // --- PII scrubbing (k16) --------------------------------------------------

  /** (name, pattern, replacement) triples, applied in order. The patterns
    * stay inside the RE2 ∩ java.util.regex common dialect (character
    * classes, bounded repetition, `\b` ASCII word boundary — no lookaround,
    * no backrefs) so the DuckDB oracle runs the IDENTICAL regex. Email goes
    * first: its local/domain parts may contain digits and dots that the
    * phone/IP patterns would otherwise see after partial rewrites.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", """[0-9A-Za-z._%+-]+@[0-9A-Za-z.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
    ("phone", """\b\d{3}-\d{3}-\d{4}\b""", "<PHONE>"),
    // Octet-bounded (VERDICT r7 wrong #3): 25[0-5]|2[0-4]\d|[01]?\d\d? caps
    // each octet at 255, so `999.999.999.999` no longer redacts. The third
    // alternative is [01]?\d\d? (not the narrower 1?\d?\d) so zero-padded
    // display forms like 192.168.001.1 keep redacting. Dotted quads that
    // ARE valid addresses but appear as version strings ("upgrade to
    // 1.2.3.4") still redact — that ambiguity is not decidable by regex,
    // and for PII scrubbing the recall-biased side is the right one to err
    // on. Cross-engine safety: java.util.regex and RE2 are both
    // leftmost-first here, and the alternatives are ordered longest-first
    // so greedy octets match identically.
    ("ipv4",
      """\b(25[0-5]|2[0-4]\d|[01]?\d\d?)(\.(25[0-5]|2[0-4]\d|[01]?\d\d?)){3}\b""",
      "<IP>"))

  /** All-pattern redaction: one codegen'd regexp_replace per pattern, in
    * declaration order — narrow, no shuffle, whole-stage-codegen friendly.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, pat, rep)) =>
      regexp_replace(c, pat, rep)
    }

  // --- BPE-style subword tokenization (k39, VERDICT r18 #6) ----------------
  //
  // Deterministic greedy byte-pair merging with integer merge ranks:
  // words pre-tokenize on whitespace ([[tokens]]), each word starts as
  // its character sequence, and a fixture-derived ranked merge list is
  // applied in rank order — every occurrence of a merge's pair fuses
  // left-to-right, exactly the standard BPE-encoder loop (applying
  // merges sequentially in rank order is equivalent to repeatedly
  // merging the lowest-rank pair present, because a merge's operands can
  // only be produced by LOWER-rank merges).
  //
  // The vocab here is single-pass: merges are the top-M corpus character
  // bigrams ranked by (count DESC, bigram ASC) — integer ranks, no
  // floats, derivable identically in DuckDB SQL. (Iterative pair-recount
  // BPE *training* would put an M-pass loop on both engines; for the
  // packing semantics k39 exercises, the encoder loop — not the trainer
  // — is the operator under test, and single-char-pair merges keep every
  // merge's operands primitive so the rank-order equivalence above is
  // trivially satisfied.)
  //
  // Mechanics shared by both engines: a word is rendered with two-space
  // token separators ("  h  i  "), merge (x,y) is the literal replace of
  // " x  y " with " xy " — the two-space separators make one space of
  // each boundary consumable per match, so consecutive occurrences
  // ("abab" under merge (a,b)) all fuse in one left-to-right pass, while
  // patterns can never match inside a multi-char token. Token count =
  // the surviving space-delimited runs. Everything is codegen-friendly
  // string/HOF expressions — no UDFs.

  /** Top-M corpus bigram merge list as a ONE-ROW frame `{merges: array}`
    * in rank order — model-sized (≤ alphabet²), broadcast by callers.
    */
  def bpeMerges(docs: DataFrame, textCol: String, topM: Int): DataFrame = {
    val bigrams = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c"))
    // deterministic rank order without a single-partition window: the
    // distinct-bigram domain is model-sized, so one collect_list + sort
    // on (count DESC, bigram ASC) composite keys stays metadata-scale
    bigrams.agg(
      slice(
        transform(
          sort_array(collect_list(struct(
            (lit(Long.MaxValue) - col("c")).as("nc"), col("bg")))),
          s => s.getField("bg")),
        1, topM).as("merges"))
  }

  /** Character-sequence rendering with two-space separators. */
  private def bpeCharRep(word: Column): Column =
    concat(lit("  "), regexp_replace(word, "(.)", "$1  "))

  /** Subword token count of one word under the ranked `merges` array. */
  def bpeTokenCount(word: Column, merges: Column): Column =
    size(split(trim(aggregate(merges, bpeCharRep(word), (acc, m) =>
      replace(acc,
        concat(lit(" "), m.substr(lit(1), lit(1)), lit("  "),
          m.substr(lit(2), lit(1)), lit(" ")),
        concat(lit(" "), m, lit(" "))))), " +")).cast("long")

  /** Total BPE token count of a document: Σ per-word counts. */
  def bpeDocTokens(text: Column, merges: Column): Column =
    aggregate(tokens(text), lit(0L),
      (a, w) => a + bpeTokenCount(w, merges))
}
