package graft.etl

import java.nio.file.{Files, Path => JPath, Paths}

import graft.TestSpark
import graft.ops.FsClaimStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** p29: DELETION VECTORS — positional delete files (Iceberg's shape)
  * instead of key markers. The oracle hash-locks the folded values (p29
  * shares p15's oracle verbatim); this spec pins the protocol claims:
  *
  *  - a positional delete folds rows out, and the READ PLAN for a
  *    DV-carrying, delta-free day is a broadcast anti-join — NO key
  *    window, no shuffle of the wide rows (the representation's point);
  *  - prior DVs fold into the location read: an already-dead row never
  *    re-tombstones;
  *  - a day with pending row deltas REFUSES a positional delete (fold
  *    truth for a key under deltas is not positional) with the remedy
  *    in the message;
  *  - positions pin the base layout, so ANY overlapping commit since
  *    staging — including maintenance, which moves the positions —
  *    aborts the DV commit; retries re-stage;
  *  - deltas layered AFTER a DV fold above it (a younger upsert revives
  *    a tombstoned key);
  *  - OPTIMIZE absorbs DVs (and drops a fully-tombstoned day via the
  *    written-layout census), vacuum reclaims the dv directories, and
  *    time travel to a pre-DV epoch still sees the rows;
  *  - the DSv2 relation (graft-lake) folds DVs identically,
  *    executor-side.
  */
class LakeDvSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/lake_dv_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def content(dir: String): Set[(Long, Double, String)] =
    LakeSnapshot.read(spark, dir)
      .select(col("event_id"), col("value"), col("day").cast("string"))
      .as[(Long, Double, String)].collect().toSet

  private def seedLake(dir: String): Unit =
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.0), (2L, ts(1), 2.0), (3L, ts(1), 3.0),
        (4L, ts(2), 4.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts")

  test("a positional delete folds rows out through a broadcast anti-join " +
    "— no key window in the read plan") {
    val dir = freshDir("fold")
    seedLake(dir)
    LakeSnapshot.deleteKeysPositional(spark, dir,
      Seq((2L, ts(1)), (99L, ts(1))).toDF("event_id", "ts"),
      "event_id", "ts")
    assert(content(dir) === Set(
      (1L, 1.0, "2024-01-01"), (3L, 3.0, "2024-01-01"),
      (4L, 4.0, "2024-01-02")))
    val plan = LakeSnapshot.read(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), "DV fold must be an anti-join")
    assert(!plan.contains("Window"),
      "a delete-only day must never pay the key-window fold")
  }

  test("prior DVs fold into the location read: no re-tombstoning, and " +
    "stacked DVs compose") {
    val dir = freshDir("stack")
    seedLake(dir)
    LakeSnapshot.deleteKeysPositional(spark, dir,
      Seq((1L, ts(1))).toDF("event_id", "ts"), "event_id", "ts")
    LakeSnapshot.deleteKeysPositional(spark, dir,
      // key 1 again (already dead — must emit nothing) plus key 3
      Seq((1L, ts(1)), (3L, ts(1))).toDF("event_id", "ts"),
      "event_id", "ts")
    assert(content(dir) === Set(
      (2L, 2.0, "2024-01-01"), (4L, 4.0, "2024-01-02")))
    val p = LakeSnapshot.LakePaths(dir)
    val dv = spark.read.parquet(p.dv)
    // 2 tombstones total across both generations: no duplicates
    assert(dv.count() === 2)
  }

  test("a day with pending row deltas refuses a positional delete, " +
    "naming the remedy") {
    val dir = freshDir("pending")
    seedLake(dir)
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((9L, ts(1), 9.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val ex = intercept[IllegalArgumentException] {
      LakeSnapshot.deleteKeysPositional(spark, dir,
        Seq((1L, ts(1))).toDF("event_id", "ts"), "event_id", "ts")
    }
    assert(ex.getMessage.contains("OPTIMIZE"))
    // after compaction the day is delta-free again and the DV lands
    LakeSnapshot.compactDays(spark, dir)
    LakeSnapshot.deleteKeysPositional(spark, dir,
      Seq((1L, ts(1))).toDF("event_id", "ts"), "event_id", "ts")
    assert(!content(dir).exists(_._1 == 1L))
  }

  test("ANY overlapping commit — even maintenance — aborts a staged DV " +
    "(positions pin the base layout); retries re-stage") {
    val dir = freshDir("abort")
    seedLake(dir)
    val staged = LakeSnapshot.stageDeletePositional(spark, dir,
      Seq((1L, ts(1))).toDF("event_id", "ts"), "event_id", "ts",
      FsClaimStore)
    LakeSnapshot.compactDays(spark, dir) // maint REWRITES the positions
    intercept[LakeSnapshot.ConcurrentLakeMutationException] {
      LakeSnapshot.commit(spark, dir, staged)
    }
    // the public API with retries re-locates against the new layout
    LakeSnapshot.deleteKeysPositional(spark, dir,
      Seq((1L, ts(1))).toDF("event_id", "ts"), "event_id", "ts",
      retries = 2)
    assert(!content(dir).exists(_._1 == 1L))
  }

  test("deltas layered after a DV fold above it: a younger upsert " +
    "revives a tombstoned key") {
    val dir = freshDir("layered")
    seedLake(dir)
    LakeSnapshot.deleteKeysPositional(spark, dir,
      Seq((1L, ts(1))).toDF("event_id", "ts"), "event_id", "ts")
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((1L, ts(1), 100.0), (2L, ts(1), 200.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts")
    assert(content(dir) === Set(
      (1L, 100.0, "2024-01-01"), (2L, 200.0, "2024-01-01"),
      (3L, 3.0, "2024-01-01"), (4L, 4.0, "2024-01-02")))
  }

  test("OPTIMIZE absorbs DVs (dropping a fully-tombstoned day), vacuum " +
    "reclaims dv directories, time travel still sees the rows") {
    val dir = freshDir("absorb")
    seedLake(dir)
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    // tombstone ALL of day 2
    LakeSnapshot.deleteKeysPositional(spark, dir,
      Seq((4L, ts(2)), (1L, ts(1))).toDF("event_id", "ts"),
      "event_id", "ts")
    assert(content(dir) === Set(
      (2L, 2.0, "2024-01-01"), (3L, 3.0, "2024-01-01")))
    LakeSnapshot.compactDays(spark, dir)
    // pre-DV epoch still reads every row while its generations live
    assert(LakeSnapshot.readAt(spark, dir, e0).count() === 4)
    LakeSnapshot.vacuum(spark, dir)
    assert(content(dir) === Set(
      (2L, 2.0, "2024-01-01"), (3L, 3.0, "2024-01-01")))
    // day 2 left the view entirely (written-layout census)
    assert(!LakeSnapshot.read(spark, dir)
      .select(col("day").cast("string")).as[String].collect()
      .contains("2024-01-02"))
    // dv root reclaimed by vacuum
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dvRoot = new org.apache.hadoop.fs.Path(LakeSnapshot.LakePaths(dir).dv)
    assert(!f.exists(dvRoot) || f.listStatus(dvRoot).isEmpty,
      "vacuum must reclaim absorbed deletion vectors")
    // the post-compaction plan is the shuffle-free fast path again
    val plan = LakeSnapshot.read(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LeftAnti") && !plan.contains("Window"))
    // a forced vacuum (retain 0) destroyed pre-compaction reachability:
    // the older-than-retention time travel fails LOUDLY, as contracted
    intercept[Exception] {
      LakeSnapshot.readAt(spark, dir, e0).count()
    }
  }

  test("the DSv2 relation folds DVs identically, executor-side") {
    val dir = freshDir("dsv2")
    seedLake(dir)
    LakeSnapshot.deleteKeysPositional(spark, dir,
      Seq((2L, ts(1))).toDF("event_id", "ts"), "event_id", "ts")
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((2L, ts(1), 222.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val scalaRead = LakeSnapshot.read(spark, dir)
      .select(col("event_id"), col("value"), col("day").cast("string"))
      .as[(Long, Double, String)].collect().toSet
    val v2 = spark.read.format("graft-lake").option("path", dir).load()
      .select(col("event_id"), col("value"), col("day").cast("string"))
      .as[(Long, Double, String)].collect().toSet
    assert(v2 === scalaRead)
    assert(v2.contains((2L, 222.0, "2024-01-01")))
  }

  test("DV staging is ONE PRUNED pass (r14, the p29 watch item): on a " +
    "key-clustered layout the stats sidecar skips base files with no " +
    "victim — never opened — and the fold stays exact") {
    val dir = freshDir("staging_prune")
    // 400 keys on one day, z-ordered on (event_id, value) into 8 files:
    // each file covers a narrow event_id span (the sidecar records it)
    LakeSnapshot.merge(spark, dir,
      (1L to 400L).map(i => (i, ts(1), i * 0.5))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.optimizeZOrder(spark, dir,
      col("event_id"), col("value"), files = 8)
    val before = FileStats.skippedFiles.get()
    // victims live in one tight key range → most files provably clean
    LakeSnapshot.deleteKeysPositional(spark, dir,
      (10L to 20L).map(i => (i, ts(1))).toDF("event_id", "ts"),
      "event_id", "ts")
    assert(FileStats.skippedFiles.get() > before,
      "the sidecar prune must skip at least one base file at staging")
    val got = LakeSnapshot.read(spark, dir)
      .agg(count(lit(1)), round(sum("value"), 2))
      .as[(Long, Double)].head()
    // 400 rows minus the 11 victims; sum(1..400)*0.5 - sum(10..20)*0.5
    assert(got === ((389L, (80200L - 165L) * 0.5)))
  }
}
