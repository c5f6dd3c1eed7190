package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (cross-batch) near-dedup against a PERSISTED MinHash-LSH
  * index (VERDICT r7 next-round #3 — the [[Similarity]] `ivfAdd` pattern
  * applied to text).
  *
  * Production LLM pipelines dedup each incoming batch against the existing
  * corpus; re-running [[Dedup.minhashPairs]] over corpus+batch would
  * re-scan and re-shingle the full corpus per batch — O(corpus) work for
  * O(batch) new data. Instead the corpus is summarized ONCE into a
  * hash-only index (no text is stored — IncrementalDedupSpec proves a
  * batch can be deduped after the corpus files are deleted):
  *
  *   - `banded/`   (bucket, id): one row per rep per band — the LSH probe
  *     surface. At cluster scale this is stored bucketed BY `bucket`, so a
  *     probe touches only the new batch's buckets;
  *   - `shingles/` (__g, id, sh): each rep's sorted distinct shingle
  *     hashes, for exact-Jaccard verification of candidates;
  *   - `members/`  (__g, id): every corpus doc under its text-hash group,
  *     for re-expanding rep pairs to doc pairs;
  *   - `params/`   (shingle_size, num_hashes, bands): the build
  *     parameters. Probe and append REQUIRE agreement — a probe banded
  *     with different parameters would silently find ~nothing, the worst
  *     possible failure mode for a dedup gate.
  *
  * The probe then does O(batch)-sized work: band the new reps, semi-join
  * the stored banding rows on JUST those buckets, pair within capped
  * buckets requiring ≥ 1 new endpoint (shared [[Dedup.lshCandidates]]),
  * verify on the stored + fresh shingle sets (shared
  * [[Dedup.verifyJaccard]]), and re-expand side-locally (a rep expands
  * only through its own batch's members, so a text present in both corpus
  * and batch can never double-emit a pair). Output is identical to what a
  * full corpus+batch [[Dedup.minhashPairs]] run emits for pairs involving
  * ≥ 1 batch doc — that equivalence is k19's DuckDB brute-force oracle and
  * IncrementalDedupSpec's property.
  */
object IncrementalDedup {

  final case class IndexPaths(dir: String) {
    val banded = s"$dir/banded"
    val shingles = s"$dir/shingles"
    val members = s"$dir/members"
    val params = s"$dir/params"
  }

  /** Build the index from a corpus and persist it under `dir` (overwrite). */
  def buildIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val p = IndexPaths(dir)
    val spark = df.sparkSession
    val shingled = Dedup.shingledReps(df, idCol, textCol, shingleSize)
      .localCheckpoint(true)
    shingled.write.mode("overwrite").parquet(p.shingles)
    bandRows(shingled, numHashes, bands)
      .write.mode("overwrite").parquet(p.banded)
    df.select(xxhash64(col(textCol)).as("__g"), col(idCol).as("id"))
      .write.mode("overwrite").parquet(p.members)
    spark.createDataFrame(Seq((shingleSize, numHashes, bands)))
      .toDF("shingle_size", "num_hashes", "bands")
      .coalesce(1).write.mode("overwrite").parquet(p.params)
  }

  /** Fail loudly if the caller's parameters disagree with the build's. */
  private def requireParams(
      spark: SparkSession, p: IndexPaths,
      shingleSize: Int, numHashes: Int, bands: Int): Unit = {
    val row = spark.read.parquet(p.params).head()
    val stored = (row.getInt(0), row.getInt(1), row.getInt(2))
    require(stored == ((shingleSize, numHashes, bands)),
      s"index at ${p.dir} was built with (shingleSize, numHashes, bands) = " +
        s"$stored, called with (${shingleSize}, ${numHashes}, ${bands}) — " +
        "mismatched banding would silently miss near-duplicates")
  }

  /** Fold a deduped batch into the index (the `ivfAdd` analog): all batch
    * docs join `members/`; only reps whose text-hash group is NOT already
    * indexed add `shingles/` + `banded/` rows — an already-known text
    * gains members, never a second rep, so later probes can't double-emit
    * through two reps of one group. Appends only; the corpus is never
    * re-read or re-shingled.
    */
  def appendToIndex(
      newBatch: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32): Unit = {
    val p = IndexPaths(dir)
    val spark = newBatch.sparkSession
    requireParams(spark, p, shingleSize, numHashes, bands)
    val known = spark.read.parquet(p.shingles).select(col("__g"))
    val fresh = Dedup.shingledReps(newBatch, idCol, textCol, shingleSize)
      .join(known, Seq("__g"), "left_anti")
      .localCheckpoint(true)
    fresh.write.mode("append").parquet(p.shingles)
    bandRows(fresh, numHashes, bands)
      .write.mode("append").parquet(p.banded)
    newBatch.select(xxhash64(col(textCol)).as("__g"), col(idCol).as("id"))
      .write.mode("append").parquet(p.members)
  }

  private def bandRows(shingled: DataFrame, numHashes: Int, bands: Int): DataFrame =
    shingled
      .withColumn("mh", Dedup.minhashSignature(col("sh"), numHashes))
      .select(col("id"),
        explode(graft.functions.GraftFunctions.band_hashes(col("mh"), bands))
          .as("bucket"))

  /** Near-duplicate pairs (id_a, id_b, jaccard) involving ≥ 1 doc of
    * `newBatch`, probing the persisted index — the corpus side is consulted
    * only through its stored hashes. Parameters are validated against the
    * stored `params/`.
    */
  def incrementalPairs(
      spark: SparkSession,
      indexDir: String,
      newBatch: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.8,
      maxBucket: Int = 1 << 20): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val p = IndexPaths(indexDir)
    requireParams(spark, p, shingleSize, numHashes, bands)

    // Fresh (batch) side — same collapse-first pipeline as the batch op.
    val newMembers = newBatch
      .select(xxhash64(col(textCol)).as("__g"), col(idCol).as("id"))
      .localCheckpoint(true)
    val newShingled = Dedup
      .shingledReps(newBatch, idCol, textCol, shingleSize)
      .localCheckpoint(true)
    val newBanded = bandRows(newShingled, numHashes, bands)
      .localCheckpoint(true)

    // Probe: corpus banding rows for ONLY the batch's buckets (with
    // bucket-keyed index storage this is a pruned read at scale). Bucket
    // sizes — and therefore the skew cap — are computed over the COMBINED
    // bucket population, exactly what a full corpus+batch run would see
    // for these buckets. The combined frame feeds both the bucket-size agg
    // and the candidate self-join inside lshCandidates — eager checkpoint
    // so the probe join against the stored index runs ONCE (the r6
    // un-materialized-collapse lesson). The shingles/members reads below
    // stay plain column-pruned scans: checkpointing them would materialize
    // the whole corpus index per batch, the exact cost this operator
    // exists to avoid.
    val touched = newBanded.select("bucket").distinct()
    // unionAll is positional — pin (bucket, id) on both sides (the using-
    // column join moves `bucket` first on the probe side).
    val oldBanded = spark.read.parquet(p.banded).join(touched, Seq("bucket"))
      .select(col("bucket"), col("id"))
    val banded = oldBanded.withColumn("_new", lit(false))
      .unionAll(newBanded.select(col("bucket"), col("id"))
        .withColumn("_new", lit(true)))
      .localCheckpoint(true)
    val candidates =
      Dedup.lshCandidates(banded, maxBucket, requireNewCol = Some("_new"))

    // Exact verify on stored + fresh shingle sets (shared kernel path).
    val sets = spark.read.parquet(p.shingles).select(col("id"), col("sh"))
      .unionAll(newShingled.select(col("id"), col("sh")))
    val repPairs = Dedup.verifyJaccard(candidates, sets, threshold)

    // Side-local re-expansion: a rep expands ONLY through its own side's
    // members (join on (__g, side)), so a text that exists in both corpus
    // and batch — two reps, identical sets, candidate J = 1.0 — expands to
    // corpus×batch pairs exactly once.
    val repOf = spark.read.parquet(p.shingles)
      .select(col("id").as("rep"), col("__g"), lit(0).as("_s"))
      .unionAll(newShingled
        .select(col("id").as("rep"), col("__g"), lit(1).as("_s")))
    val members = spark.read.parquet(p.members)
      .select(col("__g"), col("id"), lit(0).as("_s"))
      .unionAll(newMembers.select(col("__g"), col("id"), lit(1).as("_s")))
    val cross = repPairs
      .join(repOf.select(col("rep").as("id_a"), col("__g").as("__ga"),
        col("_s").as("_sa")), Seq("id_a"))
      .join(repOf.select(col("rep").as("id_b"), col("__g").as("__gb"),
        col("_s").as("_sb")), Seq("id_b"))
      .join(members.select(col("__g").as("__ga"), col("_s").as("_sa"),
        col("id").as("ma")), Seq("__ga", "_sa"))
      .join(members.select(col("__g").as("__gb"), col("_s").as("_sb"),
        col("id").as("mb")), Seq("__gb", "_sb"))
      .select(
        least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"),
        col("jaccard"))
    // Within-batch identical texts (the only within-GROUP pairs with a new
    // endpoint not covered above; corpus-internal ones have none).
    val shNewMembers = newMembers.join(newShingled.select(col("__g")), Seq("__g"))
    val within = shNewMembers.as("x")
      .join(shNewMembers.as("y"),
        col("x.__g") === col("y.__g") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        lit(1.0).as("jaccard"))
    cross.unionAll(within)
  }
}
