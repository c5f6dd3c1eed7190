package graft.etl

import java.nio.file.{Files, Path => JPath, Paths}

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** p56: RESTORE to a committed epoch. The oracle hash-checks the
  * restored VALUES; this spec pins the protocol claims it can't see:
  *
  *  - restore is metadata-only (no data file moves or changes) and the
  *    table keeps writing on top of the restored view;
  *  - history is append-only: the undone epochs still time-travel, and
  *    `.history`/describeHistory show the restore row;
  *  - restore RESETS the column mapping to the historical bindings (a
  *    post-epoch rename is undone);
  *  - idempotence-tag high-waters survive the rollback — a redelivered
  *    pre-restore micro-batch is still refused, even after a
  *    post-restore checkpoint folds the history away;
  *  - a target view whose generations were vacuumed fails loudly,
  *    enumerating the missing dirs;
  *  - a CDC window containing the restore fails loudly (a feed cannot
  *    represent a rollback) instead of silently skipping it.
  */
class LakeRestoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/lake_restore_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def content(dir: String): Set[(Long, Double, String)] =
    LakeSnapshot.read(spark, dir)
      .select(col("event_id"), col("value"), col("day").cast("string"))
      .as[(Long, Double, String)].collect().toSet

  private def seed(dir: String): Int = {
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.0), (2L, ts(1), 2.0), (3L, ts(2), 3.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.currentEpoch(spark, dir)
  }

  private val initial = Set(
    (1L, 1.0, "2024-01-01"), (2L, 2.0, "2024-01-01"), (3L, 3.0, "2024-01-02"))

  private def dataFiles(dir: String): Map[String, Long] = {
    val root = Paths.get(dir)
    import scala.jdk.CollectionConverters._
    Files.walk(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .map(p => root.relativize(p).toString ->
        Files.getLastModifiedTime(p).toMillis)
      .toMap
  }

  test("restore rolls the view back metadata-only, keeps history " +
    "time-travelable, and the table keeps writing") {
    val dir = freshDir("roundtrip")
    val e0 = seed(dir)
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 100.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val eCorrupt = LakeSnapshot.currentEpoch(spark, dir)
    LakeSnapshot.deleteKeys(spark, dir,
      Seq((3L, ts(2))).toDF("event_id", "ts"), "event_id", "ts")
    val before = dataFiles(dir)
    val eRestore = LakeSnapshot.restoreTo(spark, dir, e0)
    assert(eRestore > eCorrupt, "restore commits a NEW epoch")
    assert(content(dir) === initial, "the live view is the epoch-0 view")
    assert(dataFiles(dir) === before,
      "restore must not write, move, or touch any data file")
    // history preserved: the corruption still time-travels
    assert(LakeSnapshot.readAt(spark, dir, eCorrupt)
      .filter(col("event_id") === 1L).select("value").as[Double]
      .head() === 100.0, "the undone epoch must still time-travel")
    assert(LakeSnapshot.describeHistory(spark, dir)
      .filter(col("operation") === "restore").count() === 1L)
    // and the table keeps writing on top of the restored view
    LakeSnapshot.merge(spark, dir,
      Seq((9L, ts(2), 9.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    assert(content(dir) === initial + ((9L, 9.0, "2024-01-02")))
  }

  test("restore resets the column mapping to the historical bindings") {
    val dir = freshDir("colmap")
    val e0 = seed(dir)
    LakeSnapshot.renameColumn(spark, dir, "value", "amount")
    assert(LakeSnapshot.read(spark, dir).columns.contains("amount"))
    LakeSnapshot.restoreTo(spark, dir, e0)
    val cols = LakeSnapshot.read(spark, dir).columns.toSeq
    assert(cols.contains("value") && !cols.contains("amount"),
      s"the pre-rename logical name must be back, got $cols")
  }

  test("idempotence-tag high-waters survive restore (and a post-restore " +
    "checkpoint): a redelivered pre-restore batch is still refused") {
    val dir = freshDir("txns")
    val e0 = seed(dir)
    val staged = LakeSnapshot.stageMergeDelta(spark, dir,
      Seq((2L, ts(1), 22.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val eTagged =
      LakeSnapshot.commitDelta(spark, dir, staged, "event_id", "sink-7")
    assert(LakeSnapshot.tagEpoch(spark, dir, "sink-7").contains(eTagged))
    LakeSnapshot.restoreTo(spark, dir, e0)
    assert(content(dir) === initial, "the tagged delta's data rolls back")
    assert(LakeSnapshot.tagEpoch(spark, dir, "sink-7").isDefined,
      "the tag high-water must NOT roll back with the data")
    // a checkpoint now folds history into one row — protection must ride
    // the restore row's carried txns into it
    LakeSnapshot.checkpointManifest(spark, dir)
    assert(LakeSnapshot.tagEpoch(spark, dir, "sink-7").isDefined,
      "protection must survive checkpoint-folding the restore row")
  }

  test("restoring to a vacuumed epoch fails loudly, naming missing dirs") {
    val dir = freshDir("vacuumed")
    val e0 = seed(dir)
    // supersede day 01's base, then vacuum history with zero retention
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 100.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.vacuum(spark, dir, retainMs = 0L)
    val err = intercept[IllegalArgumentException] {
      LakeSnapshot.restoreTo(spark, dir, e0)
    }
    assert(err.getMessage.contains("vacuumed") &&
      err.getMessage.contains("gen="),
      s"must enumerate the vacuumed generation dirs, got: ${err.getMessage}")
  }

  test("a concurrent commit aborts the restore (no silent clobber)") {
    val dir = freshDir("occ")
    val e0 = seed(dir)
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 100.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    // a writer commits BETWEEN the restore's staging read and its
    // commit loop (the test seam) — the restore must abort, never
    // silently clobber the racer's rows
    intercept[LakeSnapshot.ConcurrentLakeMutationException] {
      LakeSnapshot.restoreToImpl(spark, dir, e0, () =>
        LakeSnapshot.merge(spark, dir,
          Seq((7L, ts(3), 7.0)).toDF("event_id", "ts", "value"),
          "event_id", "ts"))
    }
    // the racer's commit survives intact
    assert(content(dir).contains((7L, 7.0, "2024-01-03")))
  }

  test("a CDC window containing the restore fails loudly") {
    val dir = freshDir("cdc")
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts", cdf = true)
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 2.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts", cdf = true)
    LakeSnapshot.restoreTo(spark, dir, e0)
    val eNow = LakeSnapshot.currentEpoch(spark, dir)
    val err = intercept[RuntimeException] {
      LakeSnapshot.readChangesCdf(spark, dir, e0, eNow).collect()
    }
    assert(err.getMessage.contains("RESTORE"),
      s"the feed must refuse the rollback window, got: ${err.getMessage}")
  }

  test("restoring to a non-committed epoch or an empty table is loud") {
    val dir = freshDir("bounds")
    intercept[IllegalArgumentException] {
      LakeSnapshot.restoreTo(spark, dir, 0)
    }
    seed(dir)
    intercept[IllegalArgumentException] {
      LakeSnapshot.restoreTo(spark, dir, 99)
    }
  }
}
