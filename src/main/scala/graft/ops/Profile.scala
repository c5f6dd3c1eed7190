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
    // Internal aliases are INDEX-based and the long-format pivot is typed
    // Column expressions (ADVICE r11): the previous cut spliced raw column
    // names into a stack() SQL string, so a name containing a quote, space,
    // hyphen, or dot broke parsing (or silently nested). Here user content
    // appears only as a string LITERAL (the label) and inside a BACKTICK-
    // quoted df.col (dots would otherwise still resolve as struct nesting)
    // — both quote-safe by construction (ProfileSpec locks a hostile name).
    def in(c: String): Column = df.col(s"`${c.replace("`", "``")}`")
    val aggs: Seq[Column] = count(lit(1)).as("__total") +:
      cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(
          count(in(c)).as(s"__cnt_$i"),
          (if (exact) countDistinct(in(c))
           else approx_count_distinct(in(c))).as(s"__nd_$i"),
          min(in(c)).cast("string").as(s"__mn_$i"),
          max(in(c)).cast("string").as(s"__mx_$i"))
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("col_name"),
        (col("__total") - col(s"__cnt_$i")).as("n_null"),
        col(s"__nd_$i").as("n_distinct"),
        col(s"__mn_$i").as("min_val"),
        col(s"__mx_$i").as("max_val"))
    }
    wide
      .select(col("__total").as("n_rows"),
        explode(array(entries: _*)).as("__e"))
      .select(col("__e.col_name").as("col_name"), col("n_rows"),
        col("__e.n_null").as("n_null"),
        col("__e.n_distinct").as("n_distinct"),
        col("__e.min_val").as("min_val"),
        col("__e.max_val").as("max_val"))
  }
}
