package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the cluster-
  * consolidation step a near-dedup pipeline needs AFTER pairwise detection
  * (SURVEY.md §2.1-K2): MinHash-LSH / exact similarity joins emit PAIRS, but
  * "keep one document per duplicate group" requires the transitive closure
  * of those pairs, or chained duplicates (A~B, B~C, A≁C) survive as two
  * overlapping groups and the corpus keeps 2 of 3 copies.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", ACM SoCC 2014 — public).
  * Each round is two groupBy-min + join passes over the edge list, i.e.
  * pure keyed shuffles; the edge set converges to one star per component
  * (every member pointing at its component's minimum id) in O(log n)
  * rounds even on adversarial path graphs — unlike naive min-label
  * propagation, whose round count is the graph DIAMETER (a 1000-link
  * near-dup chain would need 1000 shuffles; star contraction needs ~10).
  * No driver-side state: the driver loop only compares a (count, hash-sum)
  * fixpoint checksum per round.
  */
object Components {

  /** Connected components of the undirected graph given as an edge list.
    *
    * @param edges  DataFrame with two integral id columns; self-loops are
    *               dropped, direction and duplicates are ignored.
    * @return (id, comp) — one row per distinct node appearing in `edges`,
    *         where comp is the minimum node id of its component. Nodes not
    *         present in `edges` (singletons) are the caller's to union in.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 30): DataFrame = {
    // canonical directed form: (u, v) with u > v. Every round ends in an
    // eager localCheckpoint: without it each iteration's plan embeds the
    // previous one ~6× (sym/large/small each reference it), so a ~10-round
    // run builds a 6¹⁰-node tree — unanalyzable, and a StackOverflow just
    // printing it. Truncating lineage per round is the standard iterative-
    // graph pattern (GraphX checkpoints the same way). Once a round's
    // checkpoint has materialized, its predecessor's blocks are dead
    // weight and are unpersisted below — only ONE round's edge list is
    // resident at a time, not ≤ maxIter copies (ADVICE r4). Local (not
    // reliable) checkpointing does mean an executor loss mid-loop fails
    // the job; on a real cluster pass a reliable `checkpoint()`-style
    // truncation instead if the loop must survive executor churn — the
    // loop itself is restart-safe (pure function of `edges`).
    // (row count, order-independent hash fold): equal across a round ⇔ the
    // distinct edge set reached the algorithm's fixpoint (stars). XOR, not
    // sum — full-range xxhash64 values overflow a long sum under ANSI mode,
    // and XOR over a DISTINCT row set is an equally sound set fingerprint.
    // r19 (optimization round): the checksum rides an observe() on the
    // SAME materialization the round's eager localCheckpoint already runs,
    // instead of a separate aggregate job per round — one Spark job per
    // round saved, identical values (observe aggregates are computed over
    // exactly the checkpointed rows).
    // LOCAL-MODE ASSUMPTION (ADVICE r19), paired with the localCheckpoint
    // caveat above: observe() accumulators can double-count under
    // speculative execution or task retries (the XOR self-cancels on a
    // duplicated partition), unlike the exact separate aggregate they
    // replaced. Local mode never speculates and the loop already requires
    // no executor churn; a cluster deployment with speculation enabled
    // should keep the separate agg-based checksum.
    val obsId = java.util.UUID.randomUUID().toString.take(8)
    var obsN = 0
    def checkpointWithChecksum(df: DataFrame): (DataFrame, (Long, Long)) = {
      obsN += 1
      val name = s"graft.cc.$obsId.$obsN"
      val observed = df.observe(name,
        count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("x"))
      val out = observed.localCheckpoint(true)
      val m = observed.queryExecution.observedMetrics(name)
      (out, (m.getLong(0), m.getLong(1)))
    }

    val (e0, prev0) = checkpointWithChecksum(
      edges
        .select(
          greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("u"),
          least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct())
    var e = e0
    var prev = prev0
    var it = 0
    var converged = prev._1 == 0L
    while (!converged && it < maxIter) {
      // large-star: ∀u, ∀v ∈ Γ(u) with v > u: emit (v, min(Γ(u) ∪ {u}))
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val minsL = sym.groupBy("u")
        .agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      // no distinct here: the join is 1:1 (minsL has one row per u), so
      // `large` carries at most |e| rows either way; min-aggregations are
      // duplicate-insensitive and the round's final distinct dedupes the
      // output — dropping it saves a full (u,v) shuffle per round
      val large = sym.filter(col("v") > col("u"))
        .join(minsL, "u")
        .select(col("v").as("u"), col("m").as("v"))

      // small-star: ∀u with L = {v ∈ Γ(u): v < u} ≠ ∅, m = min(L):
      // emit (u, m) and (v, m) for v ∈ L \ {m}. On the canonical form L is
      // exactly u's edge partners, so one groupBy-min + one join suffices.
      val minsS = large.groupBy("u").agg(min("v").as("mv"))
      val (small, cur) = checkpointWithChecksum(
        large.join(minsS, "u")
          .filter(col("v") =!= col("mv"))
          .select(col("v").as("u"), col("mv").as("v"))
          .union(minsS.select(col("u"), col("mv").as("v")))
          .distinct())
      unpersistCheckpoint(e) // small has materialized; last round's blocks are dead
      e = small
      converged = cur == prev
      prev = cur
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")

    // converged edges are stars (member -> root); roots map to themselves
    e.select(col("u").as("id"), col("v").as("comp"))
      .union(e.select(col("v").as("id"), col("v").as("comp")).distinct())
      .distinct()
  }

  /** Drop the cached blocks behind an eagerly-localCheckpointed frame.
    * Safe only once every downstream consumer has materialized — a
    * local checkpoint has no lineage to recompute from.
    */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _              => ()
    }

  /** Keep one row per duplicate cluster: given pairwise duplicate `pairs`
    * over `df`'s `idCol`, drops every clustered row except the minimum-id
    * representative of each component. Rows in no pair survive untouched.
    */
  def consolidate(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      pairSrc: String = "id_a",
      pairDst: String = "id_b"): DataFrame = {
    val victims = connectedComponents(pairs, pairSrc, pairDst)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    df.join(victims, Seq(idCol), "left_anti")
  }
}
