package graft.sources

import java.nio.file.{Files, Path => JPath, Paths}

import graft.TestSpark
import graft.etl.LakeSnapshot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual}
import org.scalatest.funsuite.AnyFunSuite

/** p27: the DSv2 BATCH relation over the snapshot lake. The oracle
  * hash-locks the folded values; this spec pins the protocol claims:
  *
  *  - a `spark.read.format("graft-lake")` read equals the Scala-API
  *    [[LakeSnapshot.read]] on a lake carrying every state at once —
  *    base generations, pending upsert/delete deltas, a delta-only day,
  *    added columns, a rename, and a drop;
  *  - `option("epoch", e)` equals [[LakeSnapshot.readAt]];
  *  - `day` filters push into PARTITION PLANNING: the planned
  *    InputPartitions touch only the requested days' files;
  *  - runtime (DPP-style) filters re-prune the day set through
  *    [[LakeScan.filter]];
  *  - column pruning reaches the scan's read schema;
  *  - residual (non-day) filters still evaluate correctly above the
  *    scan;
  *  - INT96 and TIMESTAMP_MICROS generations read identically (the
  *    legacy-vs-modern Spark writer footers).
  */
class GraftLakeSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int, h: Int = 10): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/lake_dsv2_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def dsv2(dir: String, opts: (String, String)*): DataFrame =
    opts.foldLeft(spark.read.format("graft-lake").option("path", dir)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  /** Base merge + concurrent-shape deltas + delete markers + evolution +
    * rename + drop — every storage state the reader must fold.
    */
  private def buildFullLake(dir: String): Unit = {
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.0), (2L, ts(1), 2.0), (3L, ts(2), 3.0),
        (4L, ts(2), 4.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts")
    // delta upserts: update key 1, insert key 10, open delta-only day 3
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((1L, ts(1), 100.0), (10L, ts(1), 10.0), (30L, ts(3), 30.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts")
    // younger delta beats the older for key 1; delete marker kills key 2
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((1L, ts(1), 111.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.deleteKeysDelta(spark, dir,
      Seq((2L, ts(1))).toDF("event_id", "ts"), "event_id", "ts")
    // schema evolution: a COW merge adds `note` on day 2
    LakeSnapshot.merge(spark, dir,
      Seq((4L, ts(2), 40.0, "fixed")).toDF("event_id", "ts", "value", "note"),
      "event_id", "ts")
    // manifest-only column ops
    LakeSnapshot.renameColumn(spark, dir, "value", "amount")
    LakeSnapshot.dropColumn(spark, dir, "note")
  }

  test("DSv2 read == Scala read across base+deltas+evolution+rename+drop") {
    val dir = freshDir("full")
    buildFullLake(dir)
    val scalaRead = LakeSnapshot.read(spark, dir)
    val v2 = dsv2(dir)
    assert(v2.schema.fieldNames.sorted === scalaRead.schema.fieldNames.sorted)
    val cols = scalaRead.columns.sorted.map(col).toSeq
    assert(rows(v2.select(cols: _*)) === rows(scalaRead.select(cols: _*)))
    assert(!v2.columns.contains("note"), "dropped column must be masked")
    assert(v2.columns.contains("amount") && !v2.columns.contains("value"))
  }

  test("epoch option == Scala time travel (pre-rename view, old name)") {
    val dir = freshDir("travel")
    buildFullLake(dir)
    val preRename = LakeSnapshot.currentEpoch(spark, dir) - 2
    val scalaAt = LakeSnapshot.readAt(spark, dir, preRename)
    val v2At = dsv2(dir, "epoch" -> preRename.toString)
    assert(v2At.columns.contains("value") && v2At.columns.contains("note"),
      "the historical epoch surfaces the pre-rename/pre-drop names")
    val cols = scalaAt.columns.sorted.map(col).toSeq
    assert(rows(v2At.select(cols: _*)) === rows(scalaAt.select(cols: _*)))
  }

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in the plan"))

  test("day filter pushdown prunes planned partitions to the touched day") {
    val dir = freshDir("pushdown")
    buildFullLake(dir)
    val all = scanOf(dsv2(dir)).inputPartitions
    val one = dsv2(dir).filter(col("day") === lit("2024-01-01").cast("date"))
    val pruned = scanOf(one).inputPartitions
    assert(all.size > pruned.size, "pruning must drop other days' files")
    val days = pruned.map {
      case b: LakeBaseFilePartition => b.day
      case d: LakeDeltaFoldPartition => d.day
    }.toSet
    assert(days === Set("2024-01-01"))
    // the pruned read still folds its day correctly
    assert(rows(one.select("event_id", "amount")) ===
      Set("1|111.0", "10|10.0"))
  }

  test("runtime (DPP) filter re-prunes the day set through Scan.filter") {
    val dir = freshDir("runtime")
    buildFullLake(dir)
    val schema = dsv2(dir).schema
    val scan = new LakeScan(schema, Map("path" -> dir), Nil)
    val before = scan.planInputPartitions()
    assert(scan.filterAttributes().map(_.describe()).toSeq === Seq("day"))
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      GreaterThanOrEqual("day", java.sql.Date.valueOf("2024-01-02"))))
    val after = scan.planInputPartitions()
    assert(before.length > after.length)
    val days = after.map {
      case b: LakeBaseFilePartition => b.day
      case d: LakeDeltaFoldPartition => d.day
    }.toSet
    assert(days === Set("2024-01-02", "2024-01-03"))
    assert(scan.description().contains("dayFilters"))
  }

  test("column pruning reaches the scan's read schema") {
    val dir = freshDir("prune")
    buildFullLake(dir)
    val df = dsv2(dir).select("amount", "day")
    val scan = scanOf(df).scan
    assert(scan.readSchema().fieldNames.toSet === Set("amount", "day"))
    assert(rows(df.filter(col("day") === lit("2024-01-03").cast("date"))
      .select("amount")) === Set("30.0"))
  }

  test("residual non-day filters evaluate correctly above the scan") {
    val dir = freshDir("residual")
    buildFullLake(dir)
    assert(rows(dsv2(dir).filter(col("amount") > 50.0)
      .select("event_id", "amount")) === Set("1|111.0"))
  }

  test("a delete marker younger than an upsert kills the key; an upsert " +
    "younger than a marker revives it") {
    val dir = freshDir("ordering")
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.0), (2L, ts(1), 2.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((1L, ts(1), 10.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.deleteKeysDelta(spark, dir,
      Seq((1L, ts(1))).toDF("event_id", "ts"), "event_id", "ts")
    LakeSnapshot.deleteKeysDelta(spark, dir,
      Seq((2L, ts(1))).toDF("event_id", "ts"), "event_id", "ts")
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((2L, ts(1), 22.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    assert(rows(dsv2(dir).select("event_id", "value")) === Set("2|22.0"))
  }

  test("INT96 and TIMESTAMP_MICROS generations read identically") {
    val conf = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(conf)
    val dir = freshDir("int96")
    try {
      spark.conf.set(conf, "INT96")
      LakeSnapshot.merge(spark, dir,
        Seq((1L, ts(1), 1.0)).toDF("event_id", "ts", "value"),
        "event_id", "ts")
      spark.conf.set(conf, "TIMESTAMP_MICROS")
      LakeSnapshot.mergeDelta(spark, dir,
        Seq((2L, ts(1, 12), 2.0)).toDF("event_id", "ts", "value"),
        "event_id", "ts")
    } finally spark.conf.set(conf, prev)
    val got = dsv2(dir).select(col("event_id"), col("ts").cast("string"))
    assert(rows(got) === Set(
      "1|2024-01-01 10:00:00", "2|2024-01-01 12:00:00"))
    assert(rows(got) === rows(LakeSnapshot.read(spark, dir)
      .select(col("event_id"), col("ts").cast("string"))))
  }

  test("row-group stats skip provably-empty groups; results unchanged " +
    "and the filters surface as pushed") {
    val dir = freshDir("statskip")
    val ev = graft.Tables.load(spark, graft.TestSpark.sf, "events")
      .select("event_id", "user_id", "ts", "value")
    LakeSnapshot.merge(spark, dir, ev, "event_id", "ts")
    // z-order so user_id min/max stats are NARROW per file — the layout
    // stat skipping exists to exploit
    LakeSnapshot.optimizeZOrderN(spark, dir,
      Seq(col("user_id"), unix_micros(col("ts")), col("event_id")),
      files = 8)
    val mn = ev.agg(min("user_id")).head().getLong(0)
    val filt = col("user_id") <= lit(mn) // selective: one user bucket
    LakeGroupRead.skippedGroups.set(0L)
    val v2 = dsv2(dir).filter(filt)
      .agg(count(lit(1)), round(sum("value"), 2)).head()
    val sc = LakeSnapshot.read(spark, dir).filter(filt)
      .agg(count(lit(1)), round(sum("value"), 2)).head()
    assert(v2 === sc)
    assert(v2.getLong(0) > 0, "the probe key must exist")
    assert(LakeGroupRead.skippedGroups.get() > 0,
      "narrow stats plus a selective filter must skip row groups")
    val explained = dsv2(dir).filter(filt)
      .queryExecution.executedPlan.toString
    assert(explained.contains("user_id"),
      "the skip filter should surface in the scan's pushed filters")
  }

  test("stat skipping resolves the column mapping: a filter on a " +
    "RENAMED column checks the physical chunk's stats") {
    val dir = freshDir("statskip_rename")
    buildFullLake(dir) // value renamed to amount; physical stays `value`
    LakeGroupRead.skippedGroups.set(0L)
    // nothing is ≥ 1e9 — every base group is provably empty by stats
    assert(dsv2(dir).filter(col("amount") >= 1e9).count() === 0L)
    assert(LakeGroupRead.skippedGroups.get() > 0,
      "the impossible range must skip via the physical column's stats")
  }

  test("count(*) over an empty projection still folds deltas") {
    val dir = freshDir("countstar")
    buildFullLake(dir)
    assert(dsv2(dir).count() === LakeSnapshot.read(spark, dir).count())
  }
}
