package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Sorted-merge intersection-size kernel: agreement with the generic
  * array_intersect path (the formulation it replaces in the Jaccard-verify
  * joins), codegen/interpreted parity, and edge cases.
  */
class SortedIntersectSizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("equals size(array_intersect) on random sorted distinct sets") {
    val rng = new Random(42)
    def sortedSet() =
      Seq.fill(rng.nextInt(60))(rng.between(-1000L, 1000L)).distinct.sorted
    val pairs = Seq.fill(200)((sortedSet(), sortedSet()))
    val rows = pairs.toDF("a", "b").select(
      GraftFunctions.sorted_intersect_size(col("a"), col("b")).as("k"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    rows.zip(pairs).foreach { case (r, (a, b)) =>
      assert(r.getInt(0) == r.getInt(1), s"a=$a b=$b")
    }
  }

  test("interpreted path (eval) matches the codegen'd result") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = ArrayData.toArrayData(Array(1L, 3L, 5L, 9L))
    val b = ArrayData.toArrayData(Array(3L, 4L, 5L, 10L))
    val e = SortedIntersectSize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        a, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        b, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) == 2) // {3, 5}
    val viaDf = Seq((Seq(1L, 3L, 5L, 9L), Seq(3L, 4L, 5L, 10L))).toDF("a", "b")
      .select(GraftFunctions.sorted_intersect_size(col("a"), col("b")))
      .head().getInt(0)
    assert(viaDf == 2)
  }

  test("empty and null behavior") {
    val df = Seq(
      (Some(Seq.empty[Long]), Some(Seq(1L, 2L))),
      (None, Some(Seq(1L))),
      (Some(Seq(1L)), None)).toDF("a", "b")
    val rows = df.select(
      GraftFunctions.sorted_intersect_size(col("a"), col("b")).as("k")).collect()
    assert(rows(0).getInt(0) == 0)
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
  }

  test("registered SQL name works") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT sorted_intersect_size(array(1L,2L,3L), array(2L,3L,4L)) AS k")
      .head().getInt(0)
    assert(r == 2)
  }
}
