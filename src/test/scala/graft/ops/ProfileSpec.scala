package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q55: one-pass table profiling. The oracle value-checks the exact tier
  * on the fixture (which has no nulls), so the null accounting and the
  * exact-vs-approx plan shapes are pinned here.
  */
class ProfileSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a")))
    .toDF("id", "s")

  test("null / distinct / min-max accounting on a frame WITH nulls") {
    val rows = Profile.profile(df, Seq("id", "s"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))).toMap
    // nulls are excluded from distinct/min/max, counted in n_null
    assert(rows("id") === ((4L, 0L, 4L, "1", "4")))
    assert(rows("s") === ((4L, 1L, 2L, "a", "b")))
  }

  test("hostile column names (quote, space, hyphen, dot, backtick) " +
    "profile cleanly — identifiers never reach a SQL string (ADVICE r11)") {
    val hostile = Seq((1L, "x"), (2L, "y"), (2L, "y"))
      .toDF("it's a col", "dotted.na-me `q`")
    val rows = Profile.profile(hostile, hostile.columns.toSeq)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows("it's a col") === ((3L, 0L, 2L)))
    assert(rows("dotted.na-me `q`") === ((3L, 0L, 2L)))
  }

  test("exact tier pays the multi-distinct Expand; HLL tier is one " +
    "narrow pass (the 100 TB default)") {
    val exact = Profile.profile(df, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    val approx = Profile.profile(df, Seq("id", "s"), exact = false)
      .queryExecution.executedPlan.toString
    assert(exact.contains("Expand"), exact)
    assert(!approx.contains("Expand"), approx)
    // approx still profiles: same shape, hll estimates exact on tiny data
    val a = Profile.profile(df, Seq("s"), exact = false).head()
    assert(a.getLong(3) === 2L && a.getString(4) === "a")
  }
}
