package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KLL quantile sketch: exactness below compaction threshold, the
  * rank-error guarantee on large shuffled inputs under several
  * partitionings (a real shuffle forces serialize/deserialize/merge of
  * partial sketches), null/empty handling, and duplicate-heavy input
  * (the rank-interval formulation must absorb ties).
  */
class KllQuantilesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val probes = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  private def estimates(
      xs: Seq[Double], k: Int, parts: Int): Seq[Double] =
    xs.toDF("x").repartition(parts)
      .agg(GraftFunctions.kll_quantiles(col("x"), k, probes).as("qs"))
      .collect()(0).getSeq[Double](0)

  /** Exact rank interval of v in xs: [#(x < v), #(x <= v)]. */
  private def rankBounds(xs: Seq[Double], v: Double): (Long, Long) =
    (xs.count(_ < v).toLong, xs.count(_ <= v).toLong)

  test("no compaction (n < k): quantiles are exact in any partitioning") {
    val xs = scala.util.Random.shuffle((1 to 100).map(_.toDouble))
    for (parts <- Seq(1, 4)) {
      val est = estimates(xs, 200, parts)
      val expected = probes.map(p => math.max(1, math.ceil(p * 100).toInt).toDouble)
      assert(est == expected, s"parts=$parts: $est")
    }
  }

  test("rank-error guarantee holds on 50k shuffled values across partitionings") {
    val n = 50000
    val xs = scala.util.Random.shuffle((1 to n).map(_.toDouble))
    for (parts <- Seq(1, 8, 32)) {
      val est = estimates(xs, 200, parts)
      probes.zip(est).foreach { case (p, v) =>
        val target = math.max(1L, math.ceil(p * n).toLong)
        val (lt, le) = rankBounds(xs, v)
        val slack = (0.05 * n).toLong
        assert(target >= lt - slack && target <= le + slack,
          s"parts=$parts p=$p v=$v rank=[$lt,$le] target=$target")
      }
    }
  }

  test("duplicate-heavy input: returned values are data values within bound") {
    // 90% of the column is one value — rank intervals, not point ranks,
    // are what the guarantee speaks about
    val xs = scala.util.Random.shuffle(
      Seq.fill(9000)(42.0) ++ (1 to 1000).map(_.toDouble / 1000.0))
    val est = estimates(xs, 64, 8)
    probes.zip(est).foreach { case (p, v) =>
      assert(xs.contains(v), s"estimate $v not a data value")
      val target = math.max(1L, math.ceil(p * xs.size).toLong)
      val (lt, le) = rankBounds(xs, v)
      val slack = (0.05 * xs.size).toLong
      assert(target >= lt - slack && target <= le + slack,
        s"p=$p v=$v rank=[$lt,$le] target=$target")
    }
  }

  test("nulls are skipped; all-null and empty groups yield NULL") {
    val df = Seq[(String, Option[Double])](
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("b", None))
      .toDF("g", "x")
    val rows = df.groupBy("g")
      .agg(GraftFunctions.kll_quantiles(col("x"), 32, Seq(0.5)).as("qs"))
      .orderBy("g").collect()
    assert(rows(0).getSeq[Double](1) == Seq(1.0)) // median of {1,3} at ceil(.5*2)=1
    assert(rows(1).isNullAt(1))
  }

  test("summary stays bounded: 200k rows through a 32-way shuffle") {
    // indirect size probe: the aggregate completes with a small k and the
    // result is still within the guarantee — a full-buffer implementation
    // would either OOM-scale or lose the bound
    val n = 200000
    val xs = (1 to n).map(_.toDouble)
    val est = estimates(scala.util.Random.shuffle(xs), 64, 32)
    probes.zip(est).foreach { case (p, v) =>
      val target = math.max(1L, math.ceil(p * n).toLong)
      val (lt, le) = rankBounds(xs, v)
      // k=64 has a looser constant than k=200; 8% is still far inside a
      // useful bound and fails loudly if compaction/merge breaks weights
      val slack = (0.08 * n).toLong
      assert(target >= lt - slack && target <= le + slack,
        s"p=$p v=$v rank=[$lt,$le] target=$target")
    }
  }
}
