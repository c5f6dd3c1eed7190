package graft.streaming

import java.nio.file.{Files, Path => JPath, Paths}

import graft.TestSpark
import graft.etl.LakeSnapshot
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** s24's protocol claims for the DSv2 CDC source that the value oracle
  * can't see:
  *
  *  - offsets are manifest epochs; `maxEpochsPerBatch` bounds each
  *    micro-batch (admission control) so AvailableNow drains a fixed
  *    range in MULTIPLE batches, not one giant read;
  *  - a RESTART from the same checkpoint resumes at the committed epoch
  *    offset: rows consumed before the stop are never re-emitted, rows
  *    committed while the stream was down are picked up;
  *  - `_commit_epoch` stamps every row with its commit.
  */
class GraftCdcSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/cdc_source_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def mergeCdf(dir: String, rows: Seq[(Long, java.sql.Timestamp, Double)]): Int = {
    LakeSnapshot.merge(spark, dir,
      rows.toDF("event_id", "ts", "value"), "event_id", "ts", cdf = true)
    LakeSnapshot.currentEpoch(spark, dir)
  }

  test("epoch offsets + admission control + checkpoint restart: no " +
    "re-emission, no loss, multiple bounded batches") {
    val dir = freshDir("restart")
    val cp = freshDir("restart_cp")
    val sinkDir = freshDir("restart_sink")
    // seed (cdf on so the sidecar exists for schema inference)
    mergeCdf(dir, Seq((1L, ts(1), 1.0), (2L, ts(2), 2.0)))
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    // three more cdf commits before the first run
    mergeCdf(dir, Seq((1L, ts(1), 10.0)))
    mergeCdf(dir, Seq((3L, ts(1), 3.0)))
    mergeCdf(dir, Seq((2L, ts(2), 20.0)))

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-cdc")
        .option("path", dir)
        .option("startingEpoch", e0.toString)
        .option("maxEpochsPerBatch", "1")
        .load()
        .select("event_id", "value", "_change_type", "_commit_epoch")
        .writeStream
        .format("parquet")
        .option("path", sinkDir)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 2,
        s"maxEpochsPerBatch=1 over 3 commits must take >= 2 non-empty " +
          s"micro-batches, got $batches")
    }
    runOnce()
    val afterFirst = spark.read.parquet(sinkDir)
      .select("event_id", "value", "_change_type")
      .as[(Long, Double, String)].collect().toSeq
    val expectedFirst = Set(
      (1L, 1.0, "update_preimage"), (1L, 10.0, "update_postimage"),
      (3L, 3.0, "insert"),
      (2L, 2.0, "update_preimage"), (2L, 20.0, "update_postimage"))
    assert(afterFirst.toSet === expectedFirst)
    assert(afterFirst.size === expectedFirst.size, "no duplicate emission")

    // stream down; a new commit lands
    mergeCdf(dir, Seq((4L, ts(2), 4.0)))
    // restart from the SAME checkpoint: only the new commit's rows
    val q2 = spark.readStream.format("graft-cdc")
      .option("path", dir)
      .option("startingEpoch", e0.toString) // ignored: checkpoint wins
      .option("maxEpochsPerBatch", "1")
      .load()
      .select("event_id", "value", "_change_type", "_commit_epoch")
      .writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    val afterSecond = spark.read.parquet(sinkDir)
      .select("event_id", "value", "_change_type")
      .as[(Long, Double, String)].collect().toSeq
    assert(afterSecond.toSet === expectedFirst + ((4L, 4.0, "insert")))
    assert(afterSecond.size === expectedFirst.size + 1,
      "restart must not re-emit rows consumed before the stop")
    // every row carries the epoch of its own commit
    val epochs = spark.read.parquet(sinkDir)
      .select("_commit_epoch").distinct().as[Int].collect().toSet
    assert(epochs.size === 4, s"4 commits -> 4 distinct epochs, got $epochs")
  }

  test("batch-equivalence: the streamed feed equals readChangesCdf over " +
    "the same window") {
    val dir = freshDir("equiv")
    val cp = freshDir("equiv_cp")
    mergeCdf(dir, Seq((1L, ts(1), 1.0)))
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    mergeCdf(dir, Seq((1L, ts(1), 5.0), (2L, ts(1), 2.0)))
    LakeSnapshot.deleteKeys(spark, dir,
      Seq((1L, ts(1))).toDF("event_id", "ts"), "event_id", "ts", cdf = true)
    val e1 = LakeSnapshot.currentEpoch(spark, dir)
    val table = "cdc_equiv_sink"
    val q = spark.readStream.format("graft-cdc")
      .option("path", dir).option("startingEpoch", e0.toString)
      .load()
      .writeStream.format("memory").queryName(table)
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    def census(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("value"), col("_change_type"),
        col("_commit_epoch"))
      .as[(Long, Double, String, Int)].collect().toSet
    assert(census(spark.table(table)) ===
      census(LakeSnapshot.readChangesCdf(spark, dir, e0, e1)))
  }

  test("a stray non-numeric gen directory (crashed-writer artifact like " +
    "gen=3.tmp) does not kill sidecar schema inference (ADVICE r16)") {
    val dir = freshDir("straygen")
    mergeCdf(dir, Seq((1L, ts(1), 1.0), (2L, ts(2), 2.0)))
    // simulate a crashed writer's temp dir next to the real sidecars
    Files.createDirectories(Paths.get(s"$dir/cdf/gen=3.tmp"))
    Files.createDirectories(Paths.get(s"$dir/cdf/gen=junk"))
    val feed = graft.sources.GraftCdcSource.feedSchema(spark, dir)
    assert(feed.fieldNames.contains("event_id") &&
      feed.fieldNames.contains("_change_type"),
      s"schema inference must survive stray dirs, got ${feed.fieldNames.toSeq}")
  }

  test("typed columns stream through the change feed (r17 wave 6): " +
    "map / array / decimal change images decode via the Group bridge") {
    val dir = freshDir("typed")
    val cp = freshDir("typed_cp")
    val sinkDir = freshDir("typed_sink")
    def row(eid: Long, a: Long, v0: Float, amt: String) =
      Seq((eid, ts(1))).toDF("event_id", "ts")
        .withColumn("tags", map(lit("a"), lit(a)))
        .withColumn("vec", array(lit(v0), lit(v0 + 1.0f)))
        .withColumn("amt", lit(amt).cast("decimal(10,2)"))
    LakeSnapshot.merge(spark, dir, row(1L, 1L, 0.5f, "12.34"),
      "event_id", "ts", cdf = true)
    LakeSnapshot.merge(spark, dir, row(1L, 2L, 2.5f, "56.78"),
      "event_id", "ts", cdf = true)
    val q = spark.readStream.format("graft-cdc")
      .option("path", dir)
      .option("startingEpoch", "-1") // the full feed, both commits
      .load()
      .writeStream.format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(sinkDir)
      .select(col("_change_type"), col("tags")("a"),
        col("vec")(0), col("amt").cast("string"))
      .as[(String, Long, Float, String)].collect().toSet
    assert(got === Set(
      ("insert", 1L, 0.5f, "12.34"),
      ("update_preimage", 1L, 0.5f, "12.34"),
      ("update_postimage", 2L, 2.5f, "56.78")), got)
  }

  test("startingTimestamp (r18): the CDC feed resolves T to the first " +
    "commit at or after T — the full-table stream's exact semantics, so " +
    "switching formats never shifts a window") {
    val dir = freshDir("cdc_start_ts")
    val sinkDir = freshDir("cdc_start_ts_sink")
    mergeCdf(dir, Seq((1L, ts(1), 1.0)))
    val t0 = graft.ops.IncrementalDedup.Manifest
      .commitTimeMs(spark, s"$dir/manifest", 0)
    Thread.sleep(1100) // commit times are second-resolution on some FS
    mergeCdf(dir, Seq((2L, ts(2), 2.0)))
    val q = spark.readStream.format("graft-cdc")
      .option("path", dir)
      .option("startingTimestamp", (t0 + 1).toString)
      .load()
      .select("event_id", "value", "_change_type")
      .writeStream.format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", freshDir("cdc_start_ts_cp"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(sinkDir)
      .select("event_id", "value", "_change_type")
      .as[(Long, Double, String)].collect().toSet
      === Set((2L, 2.0, "insert")),
      "only the second commit's changes — the first predates T")
    // both pins refuse loudly
    val e = intercept[Exception] {
      spark.readStream.format("graft-cdc")
        .option("path", dir)
        .option("startingTimestamp", t0.toString)
        .option("startingEpoch", "0")
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", freshDir("cdc_start_ts_cp2"))
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }
    assert(e.getMessage != null)
  }
}
