package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** L4 TypedImperativeAggregate: exact mode below k, estimator beyond k,
  * partial/merge + serialization across many partitions, null skipping.
  */
class BottomKSketchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("below k the sketch is the exact sorted distinct set") {
    val df = Seq(5L, 1L, 3L, 1L, 5L).toDF("h").repartition(4)
    val sk = df.agg(GraftFunctions.bottom_k_sketch($"h", 10)).head().getSeq[Long](0)
    assert(sk == Seq(1L, 3L, 5L))
  }

  test("beyond k only the k smallest survive, across partition merges") {
    val df = (1L to 1000L).toDF("h").repartition(16)
    val sk = df.agg(GraftFunctions.bottom_k_sketch($"h", 8)).head().getSeq[Long](0)
    assert(sk == (1L to 8L))
  }

  test("nulls are skipped") {
    val df = Seq(Some(2L), None, Some(1L)).toDF("h")
    val sk = df.agg(GraftFunctions.bottom_k_sketch($"h", 4)).head().getSeq[Long](0)
    assert(sk == Seq(1L, 2L))
  }

  test("distinct-count estimator lands within tolerance beyond k") {
    val k = 64
    val n = 5000
    val df = (1 to n).map(i => s"doc-$i").toDF("t")
      .select(xxhash64($"t").as("h")).repartition(8)
    val sk = df.agg(GraftFunctions.bottom_k_sketch($"h", k)).head().getSeq[Long](0)
    assert(sk.length == k)
    val est = (k - 1) * math.pow(2, 64) / (sk.last.toDouble - Long.MinValue.toDouble)
    assert(math.abs(est - n) <= n * 0.4, s"estimate $est vs $n")
  }
}
