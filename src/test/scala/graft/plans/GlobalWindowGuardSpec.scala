package graft.plans

import graft.{SparkEntry, TestSpark}
import graft.functions.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

/** The global-window lint rule (SURVEY.md §4): the one plan shape that
  * cannot scale — Window with no partition spec — is caught at plan time.
  */
class GlobalWindowGuardSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf
  private val failKey = "spark.graft.failOnGlobalWindow"

  private def withFailOn[A](body: => A): A = {
    GraftFunctions.register(spark) // installs the guard idempotently
    spark.conf.set(failKey, "true")
    try body finally spark.conf.unset(failKey)
  }

  test("strict mode fails the q13 shape (unpartitioned range window)") {
    withFailOn {
      val e = intercept[Exception] {
        SparkEntry.queries("q13_range_frame")(spark, sf).collect()
      }
      assert(e.getMessage.contains("global-window guard"), e.getMessage)
      assert(e.getMessage.contains("q13b"), "message should point at the fix")
    }
  }

  test("strict mode passes partitioned windows (q11) and the banded q13b") {
    withFailOn {
      assert(SparkEntry.queries("q11_rank_window")(spark, sf).collect().nonEmpty)
      assert(SparkEntry.queries("q13b_banded_window")(spark, sf).collect().nonEmpty)
    }
  }

  test("default mode only warns: q13 still runs for oracle parity") {
    GraftFunctions.register(spark)
    assert(spark.conf.get(failKey, "false") == "false")
    assert(SparkEntry.queries("q13_range_frame")(spark, sf).collect().nonEmpty)
  }

  test("register is idempotent: one guard instance in extraOptimizations") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    assert(spark.experimental.extraOptimizations
      .count(_.isInstanceOf[GlobalWindowGuard]) == 1)
  }

  test("limit-bounded exemption (r14): a global window over a LIMITed " +
    "unary chain is model-sized by construction and passes strict " +
    "mode; a join below the limit voids the exemption") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val df = (1L to 100L).map(i => (i, i * 2.0)).toDF("id", "x")
    withFailOn {
      // the semanticDedupAuto seed shape: orderBy + limit + row_number
      val seeds = df.orderBy("id").limit(5)
        .select(row_number().over(Window.orderBy(col("id"))).as("list_id"),
          col("x"))
      assert(seeds.collect().map(_.getInt(0)).toSeq === (1 to 5))
      // no limit below -> still caught
      val e = intercept[Exception] {
        df.select(row_number().over(Window.orderBy(col("id"))).as("rn"))
          .collect()
      }
      assert(e.getMessage.contains("global-window guard"))
      // a join ABOVE the limit re-inflates the input: exemption void
      val e2 = intercept[Exception] {
        df.limit(5).crossJoin(df.select(col("id").as("id2")))
          .select(row_number().over(Window.orderBy(col("id"))).as("rn"))
          .collect()
      }
      assert(e2.getMessage.contains("global-window guard"))
    }
  }

  test("a bare LocalLimit is NOT proof of boundedness (ADVICE r14): it " +
    "caps rows per partition only — exemption requires GlobalLimit") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit}
    val spark2 = spark
    import spark2.implicits._
    val base = (1L to 100L).toDF("id").queryExecution.analyzed
    assert(!GlobalWindowGuard.limitBounded(LocalLimit(Literal(5), base)),
      "LocalLimit alone admits numPartitions*limit rows — not bounded")
    assert(GlobalWindowGuard.limitBounded(
      GlobalLimit(Literal(5), LocalLimit(Literal(5), base))))
  }
}
