package graft.plans

import graft.{Tables, TestSpark}
import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The opt-in global-trailing-window rewrite: plan shape (Window gone,
  * replaced by keyed join/agg), exact result parity with the Window
  * operator it replaces — including ties, nulls in the ordering column,
  * and multiple sums — and strict scope (no rewrite when the pattern
  * doesn't match or the conf is off).
  */
class RewriteGlobalTrailingWindowSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val Conf = "spark.graft.rewriteGlobalTrailingWindow"

  private def withRewrite[A](on: Boolean)(body: => A): A = {
    GraftFunctions.register(spark) // attaches the rule (idempotent)
    spark.conf.set(Conf, on.toString)
    try body finally spark.conf.unset(Conf)
  }

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  // messy fixture: ties (o=10 ×3), a boundary pair exactly `width` apart,
  // null ordering values, negative values, and a band-crossing pair
  private def fixture: DataFrame = Seq[(Int, java.lang.Long, Double)](
    (1, 0L, 1.0), (2, 10L, 2.0), (3, 10L, 3.0), (4, 10L, -4.0),
    (5, 95L, 5.0), (6, 100L, 6.0), (7, 195L, 7.0), (8, 205L, 8.0),
    (9, null, 9.0), (10, null, -10.0), (11, 300L, 11.0)
  ).toDF("id", "o", "v")

  private def windowed(df: DataFrame, width: Long): DataFrame = {
    val w = Window.orderBy(col("o")).rangeBetween(-width, 0L)
    df.select(col("id"), col("o"), col("v"),
      sum("v").over(w).as("s1"),
      sum(col("v") * 2).over(w).as("s2"),
      count(lit(1)).over(w).as("c1"),
      count(when(col("v") > 0, col("v"))).over(w).as("c2"),
      min("v").over(w).as("m1"),
      max(col("v") * 3).over(w).as("m2"),
      avg("v").over(w).as("a1"),          // double child
      avg(col("id")).over(w).as("a2"))    // integral child → cast-to-double partial
  }

  test("rewrite fires: no Window operator, results exactly equal") {
    val reference = withRewrite(on = false) {
      windowed(fixture, 100L).orderBy("id").collect()
    }
    withRewrite(on = true) {
      val df = windowed(fixture, 100L)
      val plan = optimized(df)
      assert(!plan.contains("Window"), s"Window survived the rewrite:\n$plan")
      val got = df.orderBy("id").collect()
      assert(got.toSeq == reference.toSeq,
        s"rewrite diverged:\n got=${got.mkString("\n ")}\n ref=${reference.mkString("\n ")}")
    }
  }

  test("q13 shape on real events data: rewritten plan matches the Window answer") {
    val ev = Tables.load(spark, TestSpark.sf, "events")
    def q(df: DataFrame) = {
      val w = Window.orderBy(unix_micros(col("ts"))).rangeBetween(-600000000L, 0L)
      df.select(col("event_id"), round(sum("value").over(w), 2).as("w10"))
        .orderBy("event_id")
    }
    val ref = withRewrite(on = false) { q(ev).collect() }
    withRewrite(on = true) {
      val df = q(ev)
      assert(!optimized(df).contains("Window"))
      assert(df.collect().toSeq == ref.toSeq)
    }
  }

  test("scope: conf off, ROWS frames, partitioned and non-sum windows untouched") {
    GraftFunctions.register(spark)
    // conf off → Window stays
    val plain = windowed(fixture, 100L)
    assert(optimized(plain).contains("Window"))
    withRewrite(on = true) {
      // ROWS frame → untouched
      val rows = fixture.select(sum("v").over(
        Window.orderBy("o").rowsBetween(Window.unboundedPreceding, 0)).as("c"))
      assert(optimized(rows).contains("Window"))
      // partitioned → untouched
      val part = fixture.select(sum("v").over(
        Window.partitionBy("id").orderBy("o").rangeBetween(-100L, 0L)).as("c"))
      assert(optimized(part).contains("Window"))
      // decimal avg → untouched (bespoke precision/scale divide rules)
      val av = fixture.select(avg(col("v").cast("decimal(10,2)")).over(
        Window.orderBy("o").rangeBetween(-100L, 0L)).as("c"))
      assert(optimized(av).contains("Window"))
    }
  }

  test("avg: all-null frames yield NULL (no ANSI divide-by-zero), " +
    "null ordering group averaged as one peer group") {
    val df = Seq[(Int, java.lang.Long, java.lang.Double)](
      (1, 0L, null), (2, 5L, null),      // frames entirely null-valued
      (3, 200L, 4.0), (4, 205L, null),   // mixed frame
      (5, null, 2.0), (6, null, null)    // null ordering peer group
    ).toDF("id", "o", "v")
    def q(d: DataFrame) = d.select(col("id"),
      avg("v").over(Window.orderBy("o").rangeBetween(-100L, 0L)).as("a"))
      .orderBy("id")
    val ref = withRewrite(on = false) { q(df).collect() }
    withRewrite(on = true) {
      val out = q(df)
      assert(!optimized(out).contains("Window"))
      assert(out.collect().toSeq == ref.toSeq)
    }
  }

  test("downstream operators over the rewritten output still resolve") {
    withRewrite(on = true) {
      val out = windowed(fixture, 100L)
        .filter(col("s1") > 0)
        .groupBy(col("o")).agg(sum("s2").as("t"))
        .orderBy("o")
      assert(!optimized(out).contains("Window"))
      assert(out.collect().nonEmpty)
    }
  }
}
