package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling (the data-quality sweep every ingest
  * pipeline runs before trusting a new drop): per-column row/null/distinct
  * counts and min/max, computed in ONE aggregation pass over the table and
  * returned long-format (a row per column), ready to diff against the
  * previous drop's profile.
  *
  * Scale: everything is a single map-side-combined aggregate. The one
  * expensive choice is distinct counting — `exact = true` uses
  * count(DISTINCT) (Spark plans multi-distinct via an Expand that
  * replicates the input once per profiled column: right for audits, wrong
  * for a 100 TB routine sweep), `exact = false` uses HyperLogLog++
  * `approx_count_distinct` (D5), which keeps the whole profile one
  * narrow pass — the production default; the exact tier is what the q55
  * oracle value-checks. min/max are rendered to strings so one frame
  * profiles heterogeneous columns.
  */
object Profile {

  def profile(
      df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', __total - __cnt_$c, __nd_$c, __mn_$c, __mx_$c"
    }.mkString(", ")
    wide
      .select(col("__total").as("n_rows"),
        expr(s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_null, n_distinct, min_val, max_val)"))
      .select("col_name", "n_rows", "n_null", "n_distinct",
        "min_val", "max_val")
  }
}
