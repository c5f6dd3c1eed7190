package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Library join helpers for the pipeline API (SURVEY.md §4): the scale-safe
  * forms of the two joins Spark has no native operator for.
  */
object Joins {

  /** Band (range/interval) join: rows of `left` paired with rows of `right`
    * on `leftKey == rightKey` AND `rightTs ∈ (leftTs, leftTs + band]`.
    *
    * The equi-key carries the shuffle; the band is a residual filter on the
    * sort-merge join — O(n·band-density), never a nested loop (q8's shape,
    * regression-locked in PlanSpec). For band joins with NO equi-key, first
    * bucket both sides by `floor(ts / band)` (see CoverageQueries.q13b for
    * the exploded-bucket formulation).
    */
  def bandJoin(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      band: String,
      leftAlias: String = "l", rightAlias: String = "r"): DataFrame =
    // aliases are applied here: band joins are usually self-joins, where
    // dataframe-apply column references are ambiguous (DetectAmbiguousSelfJoin)
    left.as(leftAlias).join(right.as(rightAlias),
      col(s"$leftAlias.$key") === col(s"$rightAlias.$key")
        && col(s"$rightAlias.$rightTs") > col(s"$leftAlias.$leftTs")
        && col(s"$rightAlias.$rightTs") <=
          col(s"$leftAlias.$leftTs") + expr(s"INTERVAL $band"))

  /** As-of lookup: adds `asOfCol` = the greatest `rightTs` value ≤ the
    * row's `leftTs`, resolved against the (bounded) distinct domain of
    * `rightTs` — broadcast as one sorted array and probed per row with the
    * codegen'd binary-search [[graft.functions.ArrayPredecessor]]
    * (O(log D); the domain scales with the calendar, not the fact table).
    *
    * For value-carrying as-of joins (needing columns of the matched right
    * row), join back on the resolved timestamp afterwards — still one keyed
    * equi-join.
    */
  def asofLookup(
      left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String,
      asOfCol: String): DataFrame = {
    val domain = right.agg(sort_array(collect_set(col(rightTs))).as("_dom"))
    left.crossJoin(broadcast(domain))
      .withColumn(asOfCol,
        GraftFunctions.array_predecessor(col("_dom"), col(leftTs)))
      .drop("_dom")
  }
}
