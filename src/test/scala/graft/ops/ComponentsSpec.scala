package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Connected-components correctness (SURVEY.md §2.1-K2 consolidation):
  * deterministic topologies (chain, triangle, forest), randomized
  * equivalence against a sequential union-find, and the consolidate
  * survivor rule.
  */
class ComponentsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components
      .connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  /** Sequential union-find oracle. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // normalize to min-id labels
    val byRoot = nodes.groupBy(find)
    byRoot.values.flatMap(ns => ns.map(_ -> ns.min)).toMap
  }

  test("chain A-B-C collapses transitively to one component") {
    assert(cc(Seq((1L, 2L), (2L, 3L))) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("long path converges (star contraction, not diameter-bounded)") {
    // a 200-link path: naive min-propagation would need 200 rounds; the
    // star algorithm must finish inside the 30-round guard
    val path = (0L until 200L).map(i => (i, i + 1))
    val got = cc(path)
    assert(got.size == 201 && got.values.forall(_ == 0L))
  }

  test("disjoint components keep distinct min-id labels") {
    val got = cc(Seq((5L, 6L), (6L, 7L), (10L, 11L), (3L, 2L)))
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L,
      10L -> 10L, 11L -> 10L, 2L -> 2L, 3L -> 2L))
  }

  test("direction, duplicates and self-loops are ignored") {
    val got = cc(Seq((2L, 1L), (1L, 2L), (2L, 2L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("matches union-find on random graphs (20 seeds)") {
    for (seed <- 0 until 20) {
      val rnd = new Random(seed)
      val n = 2 + rnd.nextInt(40)
      val m = rnd.nextInt(60)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty)
        assert(cc(edges) == unionFind(edges), s"seed=$seed edges=$edges")
    }
  }

  test("consolidate keeps exactly the min-id representative per cluster") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
      .withColumn("payload", col("doc_id") * 10)
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Components.consolidate(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L))
  }

  test("exactJaccardPairs: recall 1 on a planted pair, none across corpora") {
    val long = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"w$i").mkString(" ")
    val other = (100 to 130).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, long), (2L, nearDup), (3L, other)).toDF("id", "text")
    val pairs = Dedup.exactJaccardPairs(df, "id", "text", threshold = 0.8)
      .collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("id_a") == 1L &&
      pairs.head.getAs[Long]("id_b") == 2L)
    // exactness cross-check: same result as brute-force Jaccard in Spark
    val brute = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(
        size(array_intersect(
          Dedup.shingles(col("a.text"), 3), Dedup.shingles(col("b.text"), 3)))
          .cast("double")
          ./(size(array_union(
            Dedup.shingles(col("a.text"), 3), Dedup.shingles(col("b.text"), 3))))
          .as("j"))
      .filter(col("j") >= 0.8).count()
    assert(brute == 1L)
  }
}
