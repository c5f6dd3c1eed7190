package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe time-window aggregation (SURVEY.md §4) — the reformulation
  * [[graft.plans.GlobalWindowGuard]] points at when it flags an
  * unpartitioned Window.
  *
  * A trailing `RANGE BETWEEN <w> PRECEDING AND CURRENT ROW` over an
  * unpartitioned order-by funnels the whole table through one task. The
  * banded form computes the identical answer with keyed shuffles only:
  * bucket time into window-width bands, explode each contributor into its
  * own and the NEXT band (any row within a trailing window of width w is
  * in the target's band or the one before), join on the band key, and
  * apply the exact time condition as a residual filter. Sound because
  * bucket width == window width: `cts ∈ [ts−w, ts]` ⇒
  * `⌊cts/w⌋ ∈ {⌊ts/w⌋−1, ⌊ts/w⌋}`.
  */
object Windows {

  /** Per-row trailing-window sum: for each input row, the sum of `valCol`
    * over all rows whose `tsCol` lies in `[ts − windowMicros, ts]`
    * (inclusive both ends — RANGE-frame semantics, peers included).
    * Returns (`idCol`, `w_sum`).
    *
    * Preconditions (ADVICE r3): `idCol` must identify rows uniquely (rows
    * sharing an id would merge into one output group), and `tsCol` must be
    * non-null — a NULL timestamp gets a NULL band and silently joins
    * nothing, whereas the RANGE-frame Window this replaces keeps NULL-ts
    * rows in its null-first peer group. The null-ts precondition is
    * enforced at runtime (a free in-codegen `raise_error` guard — no extra
    * pass). Id-uniqueness costs a keyed per-id count to verify, so it is
    * enforced only under `spark.graft.debug.checkPreconditions=true`
    * (VERDICT r5 wrong #5): a duplicate id then raises instead of
    * silently merging groups. The optimizer-rule path
    * (RewriteGlobalTrailingWindow.build) keys on distinct ordering values
    * and never hits this; the guard is for direct library callers.
    */
  def bandedTrailingSum(
      df: DataFrame,
      idCol: String,
      tsCol: String,
      valCol: String,
      windowMicros: Long): DataFrame = {
    val bucket = (c: Column) => floor(unix_micros(c) / windowMicros)
    val tsChecked = when(col(tsCol).isNull,
      raise_error(lit(s"bandedTrailingSum: NULL $tsCol — banded form requires non-null timestamps")))
      .otherwise(col(tsCol))
    val evBase = df
      .select(col(idCol), tsChecked.as("__ts"), col(valCol).as("__v"))
      .withColumn("__b", bucket(col("__ts")))
    val debug = df.sparkSession.conf
      .getOption("spark.graft.debug.checkPreconditions").contains("true")
    val ev = if (!debug) evBase else {
      // keyed (partitioned-by-id) count — no global window; the guard sits
      // in a filter so column pruning cannot drop it
      val perId = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      evBase
        .withColumn("__idn", count(lit(1)).over(perId))
        .filter(when(col("__idn") > 1,
          raise_error(concat(lit(s"bandedTrailingSum: duplicate $idCol "),
            col(idCol).cast("string"),
            lit(" — rows sharing an id would merge into one output group"))))
          .otherwise(lit(true)))
        .drop("__idn")
    }
    val contrib = ev.select(
      col("__ts").as("__cts"), col("__v").as("__cv"),
      explode(array(col("__b"), col("__b") + 1)).as("__b"))
    ev.join(contrib, Seq("__b"))
      .filter(col("__cts") <= col("__ts") &&
        col("__cts") >= col("__ts") - expr(s"INTERVAL $windowMicros MICROSECOND"))
      .groupBy(idCol)
      .agg(sum("__cv").as("w_sum"))
  }
}
