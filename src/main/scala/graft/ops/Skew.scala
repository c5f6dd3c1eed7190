package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4 design rules; builder brief "salting for
  * skew").
  *
  * AQE's skew-join split handles skewed JOINS at runtime; skewed
  * AGGREGATION keys still funnel one key's rows into one task. Salting
  * splits each key into `saltBuckets` sub-keys for the partial aggregate,
  * then combines partials per real key — two small shuffles instead of one
  * hot task. Works for any algebraic aggregate; sum/count/min/max provided.
  */
object Skew {

  /** Two-phase salted sum/count/min/max of `valueCol` by `keys`. Exactly
    * equal to `df.groupBy(keys).agg(sum, count, min, max)` — the salt only
    * changes the physical distribution.
    */
  def saltedStats(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets >= 1)
    val keyCols: Seq[Column] = keys.map(col)
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(
        sum(valueCol).as("_s"),
        count(lit(1)).as("_c"),
        min(valueCol).as("_mn"),
        max(valueCol).as("_mx"))
      .groupBy(keyCols: _*)
      .agg(
        sum("_s").as("sum"),
        sum("_c").as("count"),
        min("_mn").as("min"),
        max("_mx").as("max"))
  }
}
