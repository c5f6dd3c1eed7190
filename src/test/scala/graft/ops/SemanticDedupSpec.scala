package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** K30: SemDeDup-style semantic dedup (cluster-then-compare, smaller-id
  * wins). The k30 oracle hash-locks the full pipeline against DuckDB; this
  * spec pins the two semantic choices the SQL alone can't distinguish, on
  * hand-built geometry where every cosine is known.
  */
class SemanticDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def unit(deg: Double): Seq[Double] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r), math.sin(r), 0.0, 0.0)
  }

  // two clusters ~22.5° apart on the unit circle (dim 4, zero-padded)
  private val centroids = Seq(
    (0, unit(0.0)), (1, unit(22.5))).toDF("list_id", "centroid")

  test("drop rule is greedy '∃ smaller-id similar', NOT iterative-keeper") {
    // chain 1–2–3 at 0°/5°/10°, all in cluster 0: cos(1,2)=cos(2,3)=
    // cos5°≈0.9962 ≥ τ=0.995, cos(1,3)=cos10°≈0.9848 < τ. Row 2 drops
    // (row 1). Row 3's only similar smaller id is row 2 — ALREADY dropped.
    // The documented greedy rule drops row 3 anyway (decomposable: a row's
    // fate never depends on other rows' fates); an iterative
    // keep-if-no-KEPT-similar rule would keep it. Lock greedy.
    val corpus = Seq(
      (1L, unit(0.0)), (2L, unit(5.0)), (3L, unit(10.0)))
      .toDF("id", "v")
    val res = Similarity
      .semanticDedup(corpus, "id", "v", centroids, threshold = 0.995)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(res === Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("pairs are compared only WITHIN a cluster (the SemDeDup trade-off)") {
    // u at 8° → cluster 0 (8° < 14.5°), w at 14° → cluster 1 (8.5° < 14°),
    // yet cos(u,w)=cos6°≈0.9945 ≥ τ=0.9. Cross-cluster pairs are never
    // compared, so BOTH survive — the paper's deliberate recall trade-off
    // for never-all-pairs cost, locked here so a future "fix" that
    // compares across clusters (reintroducing O(n²)) fails loudly.
    val corpus = Seq((1L, unit(8.0)), (2L, unit(14.0))).toDF("id", "v")
    val res = Similarity
      .semanticDedup(corpus, "id", "v", centroids, threshold = 0.9)
    val byId = res.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(byId(1L)._1 !== byId(2L)._1, "fixture must straddle two clusters")
    assert(!byId(1L)._2 && !byId(2L)._2)
  }

  test("no cartesian pair stage: the only cross join is the model-sized " +
    "broadcast centroid assignment") {
    val corpus = Seq((1L, unit(0.0)), (2L, unit(5.0))).toDF("id", "v")
    val plan = Similarity
      .semanticDedup(corpus, "id", "v", centroids, threshold = 0.995)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
