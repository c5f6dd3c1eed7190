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
}
