package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level MERGE (upsert) into the date-partitioned parquet lake — the
  * Delta/Iceberg `MERGE INTO` shape on the bespoke layout (p6's
  * `day=YYYY-MM-DD` directories), implemented as partition-level
  * copy-on-write:
  *
  *   1. derive the batch's touched day set (a driver-resident list of
  *      partition VALUES — catalog-scale metadata, like LakeCompaction's
  *      inventory, never row data);
  *   2. read ONLY those partitions (the day filter lands in the scan's
  *      PartitionFilters — spec-locked);
  *   3. anti-join stored rows against batch keys, union the batch in
  *      (batch wins on key collision — UPDATE; fresh keys INSERT);
  *   4. rewrite exactly the touched partitions via dynamic partition
  *      overwrite. Untouched days' files are never opened, read, or
  *      rewritten (spec asserts byte-identical file lists).
  *
  * At 100 TB this is the difference between a merge costing O(touched
  * partitions) and O(table). Re-applying the same batch is idempotent
  * (the anti-join removes the previous application, the union re-adds
  * it). The merge key's partition value must be immutable per key (an
  * event's timestamp does not change) — a key that MOVED partitions
  * would leave its old row in the old partition; this is the same
  * constraint Hive-style dynamic-partition upserts carry, and holds for
  * silvia's event streams (event_id → collector day never changes).
  *
  * CRASH CONTRACT (stated, not hidden): dynamic partition overwrite is
  * atomic per partition directory but NOT across the touched set — a
  * crash mid-commit can leave some days merged and others not (the same
  * window a Hive dynamic-partition insert has; closing it fully needs a
  * table-format log, which the zero-egress image lacks). What makes the
  * window harmless is that merge is IDEMPOTENT: re-applying the same
  * batch converges from ANY partial state, so recovery is "re-run the
  * merge" — exactly-once via idempotent retry, the identical contract
  * the JDBC upsert sink (I9) and s19's foreachBatch loop rely on.
  * Spec-locked (LakeUpsertSpec "crash recovery").
  */
object LakeUpsert {

  /** Collapse duplicate keys WITHIN a batch before merging (ADVICE r11):
    * without this, a batch carrying the same key twice sailed through the
    * anti-join and wrote BOTH rows, silently violating the one-row-per-key
    * MERGE contract (and s19's sequential==one-shot equivalence). A batch
    * is an unordered set, so "last wins" has no meaning — the documented
    * rule is GREATEST-STRUCT WINS: one deterministic survivor per key, the
    * lexicographically greatest tuple of the non-key columns (batch-order
    * independent, so replays and re-partitioned batches converge
    * identically). Delta-style MERGE raises on duplicate matches instead;
    * the deterministic collapse is chosen here because the streaming
    * foreachBatch path (s19) cannot usefully retry a poisoned batch.
    */
  private[etl] def dedupBatch(batch: DataFrame, keyCol: String): DataFrame = {
    val parts = LakeSnapshot.keyParts(keyCol)
    val others = batch.columns.filterNot(parts.contains)
    if (others.isEmpty) batch.distinct()
    else if (others.forall(c => org.apache.spark.sql.catalyst.expressions
        .RowOrdering.isOrderable(batch.schema(c).dataType)))
      batch.groupBy(parts.map(col): _*)
        .agg(max(struct(others.map(c => batch.col(c)): _*)).as("__s"))
        .select(parts.map(col) ++
          others.map(c => col("__s").getField(c).as(c)): _*)
    else {
      // UNORDERABLE columns (maps, r15): `max(struct(...))` cannot rank
      // them — rank by the orderable columns plus a canonical JSON
      // rendering of the unorderable ones (same batch-order-independent
      // determinism, the documented greatest-tuple rule extended to the
      // rendered form), then keep the winning ROW intact
      val ord = struct(others.map { c =>
        if (org.apache.spark.sql.catalyst.expressions.RowOrdering
            .isOrderable(batch.schema(c).dataType)) col(c)
        // entry-order-normalized rendering: equal maps rank equal, so
        // the winner never depends on map build order (ADVICE r15)
        else LakeSnapshot.canonicalRender(
          col(c), batch.schema(c).dataType).as(c)
      }: _*)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(parts.map(col): _*).orderBy(ord.desc)
      batch.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
  }

  /** Merge `batch` (same schema as the lake rows, un-partitioned) into
    * the lake at `dir` keyed by `keyCol`, partitioned by `day` derived
    * from `tsCol`. Returns the touched day values (diagnostics).
    */
  /** Row-level DELETE from the lake — the compliance sweep (GDPR
    * erasure) as partition-level copy-on-write: `keys` carries
    * (keyCol, tsCol) pairs (same key→day-immutability contract as
    * [[merge]]), only the touched day partitions are read and rewritten
    * minus the keys. Idempotent (deleting absent keys is a no-op
    * rewrite), same crash contract as merge: re-run to converge. At
    * 100 TB this is O(touched partitions); a delete WITHOUT partition
    * information would be O(table) — which is why erasure requests
    * should carry (or look up) the event time, exactly as real
    * lake-format DELETEs push partition predicates.
    */
  def deleteKeys(
      spark: SparkSession, dir: String, keys: DataFrame,
      keyCol: String, tsCol: String): Seq[java.sql.Date] = {
    val b = keys.select(LakeSnapshot.keyParts(keyCol).map(col) :+
      to_date(col(tsCol)).as("day"): _*)
    val days = b.select("day").distinct()
      .collect().map(_.getDate(0)).toSeq.sortBy(_.toString)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val paths = days.map(d => s"$dir/day=$d")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    if (paths.isEmpty) return days
    val stored = spark.read.option("basePath", dir).parquet(paths: _*)
    val remaining = stored
      .join(b.select(LakeSnapshot.keyParts(keyCol).map(col): _*),
        LakeSnapshot.keyParts(keyCol), "left_anti")
    // dynamic overwrite only replaces partitions PRESENT in the output: a
    // day whose every row was deleted would silently survive. Find the
    // survivors first (metadata-sized result), drop emptied days' dirs
    // after the write.
    val survivors = remaining.select("day").distinct()
      .collect().map(_.getDate(0).toString).toSet
    // dynamic overwrite pinned on the write's cloned session too — the
    // same shared-conf mutate-restore race as the micros pin (r19)
    LakeSnapshot.microsWrite(remaining,
      "spark.sql.sources.partitionOverwriteMode" -> "dynamic")(
      _.write.mode("overwrite").partitionBy("day").parquet(dir))
    days.filterNot(d => survivors(d.toString)).foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/day=$d"), true)
    }
    days
  }

  def merge(
      spark: SparkSession, dir: String, batch: DataFrame,
      keyCol: String, tsCol: String): Seq[java.sql.Date] = {
    val b = dedupBatch(batch, keyCol).withColumn("day", to_date(col(tsCol)))
    val days = b.select("day").distinct()
      .collect().map(_.getDate(0)).toSeq.sortBy(_.toString)
    // Read EXACTLY the touched day dirs (LakeCompaction's idiom: explicit
    // sub-paths + basePath keeps `day` in the schema and sidesteps the
    // self-overwrite guard, which compares the output path against the
    // listed input roots). A day with no existing dir is a pure INSERT —
    // nothing to read there.
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val paths = days.map(d => s"$dir/day=$d")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    val merged =
      if (paths.isEmpty) b
      else {
        val stored = spark.read.option("basePath", dir).parquet(paths: _*)
        stored
          .join(b.select(LakeSnapshot.keyParts(keyCol).map(col): _*),
            LakeSnapshot.keyParts(keyCol), "left_anti")
          .unionByName(b.select(stored.columns.map(col): _*))
      }
    LakeSnapshot.microsWrite(merged,
      "spark.sql.sources.partitionOverwriteMode" -> "dynamic")(
      _.write.mode("overwrite").partitionBy("day").parquet(dir))
    days
  }
}
