package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed corpus-preparation pipeline (VERDICT r7 next-round #5):
  * the k8/k16/k1/k2/k17/k18 stages a training-data run actually chains,
  * over ONE scan of the documents table.
  *
  * Stage order and rules (each stage = its standalone operator's exact
  * semantics, so every rule is already individually hash-gated):
  *
  *   0. split: doc_id % 50 == 0 is the held-out benchmark set (k17's
  *      convention); the rest is the corpus.
  *   1. quality filter (k8): n_words >= 5, mean word length in [2,12],
  *      stopword ratio <= 0.5 — on the RAW text.
  *   2. PII redaction (k16): email/phone/IPv4 → placeholder tokens; all
  *      later stages see the redacted text.
  *   3. exact dedup (k1 shape): first doc_id per distinct redacted text.
  *   4. near dedup (k2): MinHash-LSH pairs at Jaccard >= 0.8 over word
  *      3-shingles; a doc is dropped iff ANY smaller-id doc (itself
  *      dropped or not — in chain A~B~C with A!~C, C still drops via B)
  *      is its near-duplicate. Deterministic single-pass rule, mirrored
  *      exactly by the oracle's NOT EXISTS.
  *   5. decontamination (k17): drop docs whose 3-shingle overlap with the
  *      benchmark set reaches 20%.
  *   6. repetition filter (k18): drop docs with duplicate-bigram fraction
  *      >= 0.1.
  *
  * Scan discipline: the caller's documents frame is projected to
  * (doc_id, lang, text) and eagerly localCheckpoint'd ONCE — benchmark
  * branch, corpus branch, and every dedup self-reference replay those
  * blocks, never the parquet (CorpusPrepSpec asserts the final plan holds
  * no file scan). At cluster scale the same shape holds with a reliable
  * checkpoint or a staged table.
  *
  * Everything downstream is keyed shuffles and broadcast joins (benchmark
  * shingle set is eval-suite-sized at any corpus scale): the 100 TB story
  * is each stage's own — see the per-operator scaladocs.
  */
object CorpusPrep {

  val NearDupThreshold = 0.8
  val ContaminationMax = 0.2
  val DupBigramMax = 0.1

  /** Cleaned corpus `(doc_id, lang, txt)` ready for tokenization. */
  def prepare(docs: DataFrame): DataFrame = {
    // one scan, one materialization; everything below replays blocks
    val base = docs.select(col("doc_id"), col("lang"), col("text"))
      .localCheckpoint(true)

    // benchmark reference: distinct 3-shingle hashes of the held-out set
    val benchHashes = base.filter(col("doc_id") % 50 === 0)
      .select(explode(Dedup.shingleHashes(col("text"), 3)).as("h"))
      .distinct()

    // 1. quality (k8 rules, raw text)
    val quality = Text.withQualityMetrics(
        base.filter(col("doc_id") % 50 =!= 0), "text")
      .filter(Text.qualityKeep)
      .select(col("doc_id"), col("lang"), col("text"))

    // 2. PII redaction (k16)
    val redacted = quality
      .select(col("doc_id"), col("lang"), Text.redactPii(col("text")).as("txt"))

    // 3. exact dedup (k1 shape: first doc_id per distinct text)
    val exact = Dedup.exactDedup(redacted, Seq("txt"), Seq("doc_id"))
      .localCheckpoint(true) // minhashPairs + anti-join reference it 3×

    // 4. near dedup: drop the greater id of every >= threshold pair
    val dropNear = Dedup
      .minhashPairs(exact, "doc_id", "txt", threshold = NearDupThreshold)
      .select(col("id_b").as("doc_id")).distinct()
    val near = exact.join(dropNear, Seq("doc_id"), "left_anti")

    // 5. decontamination (k17 ratio against the broadcast benchmark set)
    val withSh = near
      .withColumn("s", Dedup.shingleHashes(col("txt"), 3))
      .withColumn("n_sh", size(col("s")))
    val hits = withSh
      .select(col("doc_id"), col("n_sh"), explode(col("s")).as("h"))
      .join(broadcast(benchHashes.withColumn("hit", lit(1L))), Seq("h"), "left")
      .groupBy("doc_id", "n_sh")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    val decon = withSh
      .join(hits
        .filter(col("n_hit").cast("double") / col("n_sh") < ContaminationMax)
        .select("doc_id"),
        Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("txt"))

    // 6. repetition filter (k18 duplicate-bigram rule)
    decon
      .withColumn("n_tok", size(Text.tokens(col("txt"))))
      .withColumn("n_bi", size(Dedup.shingleHashes(col("txt"), 2)))
      .filter(lit(1.0) - col("n_bi").cast("double") / (col("n_tok") - 1)
        < DupBigramMax)
      .select(col("doc_id"), col("lang"), col("txt"))
  }

  /** Per-language stats of the cleaned corpus — k20's output shape. */
  def stats(cleaned: DataFrame): DataFrame =
    cleaned
      .withColumn("n_tok", size(Text.tokens(col("txt"))).cast("long"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        sum(length(col("txt")).cast("long")).as("n_chars"))
      .orderBy("lang")
}
