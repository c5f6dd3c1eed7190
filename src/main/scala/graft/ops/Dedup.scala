package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for corpus prep (SURVEY.md §2.1 K1/K2/J5).
  *
  * All variants are keyed shuffles — no driver collection, no all-pairs
  * cross join — so each survives a 100 TB corpus provided the usual LSH
  * assumption (bucket sizes stay bounded) holds:
  *
  *   - exact: one shuffle on the 64-bit content hash;
  *   - minhash LSH: shuffle on (band, band_hash); candidate pairs are only
  *     generated within buckets, then exact-Jaccard verified;
  *   - simhash: embarrassingly parallel signature, one shuffle if paired.
  */
object Dedup {

  // --- K1: exact dedup by content hash -------------------------------------

  /** First row per exact content (xxhash64 of the content columns). */
  def exactDedup(df: DataFrame, content: Seq[String], orderBy: Seq[String]): DataFrame = {
    val w = Window.partitionBy(xxhash64(content.map(col): _*))
      .orderBy(orderBy.map(col): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Content fingerprint (J5): stable 64-bit hash over canonical columns. */
  def fingerprint(cols: Seq[Column]): Column = xxhash64(cols: _*)

  // --- K2: MinHash-LSH near-dedup ------------------------------------------

  /** Distinct word-level shingles of size `n` (H5 higher-order functions:
    * the shingle list is built with transform over an index sequence — no
    * UDF, no explode until the LSH banding step).
    */
  def shingles(text: Column, n: Int): Column = {
    val words = split(trim(text), "\\s+")
    // guard: sequence(0, negative) infers step -1 and would slice from the
    // end — docs shorter than one shingle must yield an empty set instead
    when(size(words) >= n,
      array_distinct(
        transform(
          sequence(lit(0), size(words) - n),
          i => array_join(slice(words, i + lit(1), lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: `numHashes` independent min-hashes, each
    * `min_s xxhash64(seed_i || s)` over the shingle set.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleCol, s => xxhash64(concat(i, lit("|"), s)))))

  /** Near-duplicate pairs by MinHash banding + exact-Jaccard verification.
    *
    * Pipeline: shingle → signature (narrow) → explode `bands` band hashes →
    * shuffle on (band, hash) → within-bucket pairs (idA < idB, distinct) →
    * verify `|A∩B|/|A∪B| >= threshold` on the true shingle sets.
    *
    * With `numHashes`=64, `bands`=32 (rows r=2) a pair at Jaccard 0.8 is a
    * candidate with probability 1-(1-0.8²)³² ≈ 1-1e-13 — effectively exact
    * at the verification threshold, while buckets keep the join local.
    * Docs with fewer than `shingleSize` words have no shingles and cannot
    * pair (they are exact-dedup territory, not near-dup).
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands

    val shingled = df
      .select(col(idCol).as("id"), shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("mh", minhashSignature(col("sh"), numHashes))

    val banded = shingled.select(
      col("id"), col("sh"),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => struct(
            b.as("band"),
            xxhash64(concat_ws(",",
              transform(slice(col("mh"), b * r + 1, lit(r)), _.cast("string"))))
              .as("bh"))))
        .as("bucket"))

    val a = banded.select(col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))

    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // --- SimHash -------------------------------------------------------------

  /** 64-bit SimHash: per-token xxhash64, each bit votes ±1, signature bit
    * is the vote sign. Pure higher-order-function expression — narrow, no
    * shuffle, codegen-friendly. Written as SQL text because the Scala
    * `shiftleft`/`shiftright` wrappers only accept literal Int shift
    * amounts, while the SQL functions take the lambda-bound bit index.
    *
    * @param tokensSql SQL expression yielding an ARRAY<STRING> of tokens
    */
  def simhash(tokensSql: String): Column = expr(
    s"""aggregate(
       |  sequence(0, 63), CAST(0 AS BIGINT),
       |  (acc, j) -> acc + IF(
       |    aggregate($tokensSql, CAST(0 AS BIGINT),
       |      (a, t) -> a + IF((shiftright(xxhash64(t), j) & 1) = 1,
       |                       CAST(1 AS BIGINT), CAST(-1 AS BIGINT))) > 0,
       |    shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))""".stripMargin)

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
