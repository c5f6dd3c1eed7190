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

  // --- k37: the incremental probe against the persisted IVF index ----------

  private def freshDir(name: String): String = {
    import java.nio.file.{Files, Path => JPath, Paths}
    val p = Paths.get(s"target/semantic_dedup_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def probeMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Int, Boolean)] =
    df.collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap

  test("incremental probe == one-shot semanticDedup restricted to batch " +
    "ids (stored AND in-batch smaller ids both decide)") {
    val dir = freshDir("equiv")
    val stored = Seq((1L, unit(0.0)), (5L, unit(30.0))).toDF("id", "v")
    // batch: 7 dups stored 1 (cos0°=1); 8 dups IN-BATCH 7 (cos2°); 9 is
    // alone in cluster 1 beyond τ of 5
    val batch = Seq(
      (7L, unit(1.0)), (8L, unit(3.0)), (9L, unit(16.0))).toDF("id", "v")
    Similarity.saveIvfIndex(
      Similarity.ivfBuildFixed(stored, "id", "v", centroids), dir)
    val inc = probeMap(Similarity.incrementalSemanticDedup(
      spark, dir, batch, "id", "v", threshold = 0.999))
    val oneShot = probeMap(Similarity.semanticDedup(
      stored.unionAll(batch), "id", "v", centroids, threshold = 0.999))
      .filter { case (id, _) => Set(7L, 8L, 9L).contains(id) }
    assert(inc === oneShot, "incremental must equal one-shot on batch ids")
    assert(inc === Map(
      7L -> ((0, true)),   // dropped by STORED 1
      8L -> ((0, true)),   // dropped by IN-BATCH 7 (cos2° ≥ 0.999)
      9L -> ((1, false)))) // cluster-mate 5 is 14° away (cos < 0.999)
  }

  test("redelivery: append with a tag, re-probe with excludeTag " +
    "reproduces the first-delivery view; re-append is a no-op") {
    val dir = freshDir("redeliver")
    val stored = Seq((1L, unit(0.0))).toDF("id", "v")
    val batch = Seq((7L, unit(1.0)), (8L, unit(3.0))).toDF("id", "v")
    Similarity.saveIvfIndex(
      Similarity.ivfBuildFixed(stored, "id", "v", centroids), dir)
    val first = probeMap(Similarity.incrementalSemanticDedup(
      spark, dir, batch, "id", "v", threshold = 0.999))
    Similarity.appendToIvfIndex(batch, "id", "v", dir, tag = "b1")
    // the redelivered probe must NOT see the batch's own committed epoch
    val redelivered = probeMap(Similarity.incrementalSemanticDedup(
      spark, dir, batch, "id", "v", threshold = 0.999, excludeTag = "b1"))
    assert(redelivered === first)
    // and the redelivered APPEND is a provable no-op (same tag)
    Similarity.appendToIvfIndex(batch, "id", "v", dir, tag = "b1")
    assert(spark.read.parquet(s"$dir/assigned")
      .filter(col("id") === 7L).count() === 1L,
      "a tagged re-append must not duplicate rows")
  }

  test("the probe reads ONLY the batch's touched list partitions " +
    "(PartitionFilters, not scaladoc)") {
    val dir = freshDir("pruned")
    val stored = Seq((1L, unit(0.0)), (5L, unit(30.0))).toDF("id", "v")
    Similarity.saveIvfIndex(
      Similarity.ivfBuildFixed(stored, "id", "v", centroids), dir)
    // batch entirely in cluster 0 → only list_id=0 may be scanned
    val batch = Seq((7L, unit(1.0))).toDF("id", "v")
    val plan = Similarity.incrementalSemanticDedup(
      spark, dir, batch, "id", "v", threshold = 0.999)
      .queryExecution.executedPlan.toString
    assert(plan.contains("list_id") && plan.contains("PartitionFilters"),
      plan)
    val pf = plan.linesIterator
      .filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf.contains("list_id IN (0)") || pf.contains("list_id = 0") ||
      pf.contains("list_id#"), pf)
  }

  test("the \u221aN rule (VERDICT r12 #5): nListsFor scales as sqrt, " +
    "auto-sized cluster populations grow SUB-LINEARLY in N, and an " +
    "absurdly coarse explicit nLists fails loudly") {
    assert(Similarity.nListsFor(100) === 10)
    assert(Similarity.nListsFor(10000) === 100)
    assert(Similarity.nListsFor(1) === 1)
    // deterministic pseudo-random corpora at n and 16n: the auto rule
    // must keep max-cluster population growth near sqrt(16)=4x, far
    // below the 16x a fixed-nLists clustering would show
    def corpus(n: Int) = {
      import org.apache.spark.sql.functions._
      spark.range(1, n + 1).select(col("id").as("vec_id"),
        expr("""transform(sequence(0, 15),
                i -> CAST(pmod(xxhash64(id, i), 2000001) - 1000000 AS DOUBLE)
                     / 1000000.0)
             """).as("nv"))
    }
    def maxPop(n: Int): Long = {
      import org.apache.spark.sql.functions._
      Similarity.semanticDedupAuto(corpus(n), "vec_id", "nv", 0.99)
        .groupBy("list_id").agg(count(lit(1)).as("pop"))
        .agg(max("pop")).head().getLong(0)
    }
    val (small, big) = (maxPop(256), maxPop(4096))
    assert(big.toDouble / small <= 8.0,
      s"auto-sized max cluster pop must grow ~sqrt(N): $small -> $big")
    // the guard: explicit nLists far below sqrt(N) with a known corpus
    // size must throw, pointing at the rule
    val ex = intercept[IllegalArgumentException] {
      Similarity.semanticDedup(corpus(4096), "vec_id", "nv",
        corpus(4096).filter(org.apache.spark.sql.functions.col("vec_id") <= 2)
          .select(org.apache.spark.sql.functions.col("vec_id")
            .cast("int").as("list_id"),
            org.apache.spark.sql.functions.col("nv").as("centroid")),
        0.99, corpusSize = Some(4096L))
    }
    assert(ex.getMessage.contains("nListsFor"))
  }
}
