package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** D9 typed Aggregator: correctness vs a hand computation, null handling,
  * and partial/merge behavior across partitions.
  */
class VectorCentroidSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("centroid equals hand-computed mean, merged across many partitions") {
    val rows = Seq(
      (0, Seq(1f, 2f)), (0, Seq(3f, 4f)), (0, Seq(5f, 6f)),
      (1, Seq(10f, 20f)))
    val df = rows.toDF("label", "vec").repartition(8) // force partial+merge
    val centroid = udaf(VectorCentroid)
    val got = df.groupBy("label").agg(centroid($"vec").as("c"))
      .orderBy("label").collect()
    assert(got(0).getSeq[Double](1) == Seq(3.0, 4.0))
    assert(got(1).getSeq[Double](1) == Seq(10.0, 20.0))
  }

  test("null vectors are ignored; all-null group yields null centroid") {
    val df = Seq(
      (0, Some(Seq(2f, 2f))), (0, None), (1, None)
    ).toDF("label", "vec")
    val centroid = udaf(VectorCentroid)
    val got = df.groupBy("label").agg(centroid($"vec").as("c"))
      .orderBy("label").collect()
    assert(got(0).getSeq[Double](1) == Seq(2.0, 2.0))
    assert(got(1).isNullAt(1))
  }

  test("length mismatch inside a group fails loudly, not silently") {
    val df = Seq((0, Seq(1f, 2f)), (0, Seq(1f))).toDF("label", "vec")
    val centroid = udaf(VectorCentroid)
    val e = intercept[Exception] {
      df.groupBy("label").agg(centroid($"vec")).collect()
    }
    assert(e.getMessage != null)
  }
}
