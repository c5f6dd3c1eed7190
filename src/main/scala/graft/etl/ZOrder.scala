package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for the lake (SURVEY.md §4 layout
  * family). A date-partitioned table (p6/p8) prunes on ONE dimension; real
  * fleets also slice the same fact table by user, by key range, by time
  * window. Sorting by a single column clusters that column's min/max file
  * stats and destroys every other column's; interleaving the bits of two
  * range-bucketized dimensions into one sort key gives every file a
  * rectangle in (a, b) space, so min/max row-group stats stay narrow on
  * BOTH columns and either predicate skips most files at the scan. This is
  * the same layout play as Delta's OPTIMIZE ZORDER BY / Iceberg's sort by
  * truncated z-value, built from plain integer expressions [pub: Morton
  * 1966; public Delta/Iceberg docs].
  *
  * Everything is exact integer arithmetic (shift/and/or), so the key is
  * re-derivable in any engine — p12's oracle recomputes every z-key in
  * DuckDB and value-checks the layout audit.
  */
object ZOrder {

  /** Interleave the low `bits` bits of `a` (even positions) and `b` (odd
    * positions) into one non-negative long — the Morton key. Inputs must
    * already be range-bucketized to `[0, 2^bits)`; 2·bits ≤ 62.
    * Built as a fold of shift/and/or columns: pure codegen'd integer ops,
    * no UDF, no driver involvement.
    */
  def mortonKey(a: Column, b: Column, bits: Int = 16): Column =
    mortonKeyN(Seq(a, b), bits)

  /** N-DIMENSIONAL Morton key: round-robin bit interleave of `dims`
    * (dims(0) owns positions 0, k, 2k…; dims(1) positions 1, k+1…).
    * Every file of a layout range-partitioned on this key owns a
    * k-rectangle in the bucketized space, so min/max stats stay narrow
    * on ALL k columns. k·bits ≤ 62; with the default 16-bit scale that
    * bounds k ≤ 3 — pass a smaller `bits` for more dimensions (each
    * added dimension costs every other dimension stat resolution, the
    * standard z-order trade).
    */
  def mortonKeyN(dims: Seq[Column], bits: Int = 16): Column = {
    val k = dims.length
    require(k >= 2, s"z-order needs at least 2 dimensions, got $k")
    require(bits >= 1 && k * bits <= 62,
      s"$k dims x $bits bits exceed a non-negative long (k*bits <= 62)")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      dims.zipWithIndex.foldLeft(acc) { case (a, (d, j)) =>
        a.bitwiseOR(shiftleft(
          shiftrightunsigned(d.cast("long"), i).bitwiseAND(lit(1L)),
          k * i + j))
      }
    }
  }

  /** Write `df` laid out along `zkeyCol` into `files` roughly-equal files:
    * range-repartition on the key (contiguous z-ranges per file — each
    * file owns a rectangle-ish region of the interleaved space), sort
    * within partitions so row-group stats inside a file are narrow too.
    * At cluster scale `files` is derived from bytes (LakeCompaction's
    * sizing), not a constant.
    */
  def writeZOrdered(
      df: DataFrame, zkeyCol: String, outDir: String, files: Int): Unit =
    df.repartitionByRange(files, col(zkeyCol))
      .sortWithinPartitions(zkeyCol)
      .write.mode("overwrite").parquet(outDir)

  /** Per-file clustering audit over a written layout: for each file and
    * each audited column, the span (max−min). Σ spans ≪ nFiles × global
    * span is what makes min/max stat skipping effective — the quality
    * metric p12 gates on for BOTH z-dimensions (a single-column sort fails
    * it on the second dimension).
    */
  def fileSpans(back: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq((max(col(c)) - min(col(c))).as(s"span_$c"))
    } :+ count(lit(1)).as("n_rows")
    back.withColumn("__f", input_file_name())
      .groupBy("__f").agg(aggs.head, aggs.tail: _*)
  }
}
