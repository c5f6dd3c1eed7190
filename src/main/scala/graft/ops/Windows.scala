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
    * pass); id-uniqueness would cost an extra aggregate to verify, so it
    * stays a documented contract.
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
    val ev = df
      .select(col(idCol), tsChecked.as("__ts"), col(valCol).as("__v"))
      .withColumn("__b", bucket(col("__ts")))
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
