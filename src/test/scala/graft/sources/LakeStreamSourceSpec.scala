package graft.sources

import java.nio.file.{Files, Path => JPath, Paths}

import graft.TestSpark
import graft.etl.LakeSnapshot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The full-table streaming source (`readStream.format("graft-lake")
  * .option("changes", "true")`, VERDICT r14 #4): pinned initial
  * snapshot in day-bounded batches, then the CDC tail — crash-restarted
  * MID-SNAPSHOT and MID-TAIL from the checkpoint with no row lost or
  * duplicated, offsets round-tripping, loud contracts.
  */
class LakeStreamSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/lake_stream_source_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  /** 4 days × 2 keys, with a MoR delta on day 2 so the snapshot also
    * exercises the fold-partition path.
    */
  private def seed(dir: String): Unit = {
    LakeSnapshot.merge(spark, dir,
      (1 to 4).flatMap(d => Seq((d * 10L, ts(d), 1.0), (d * 10L + 1, ts(d), 2.0)))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((21L, ts(2), 22.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
  }

  /** Run the stream AvailableNow, failing this run's `failAt`-th
    * NON-EMPTY micro-batch (if set) BEFORE it writes — the crash window
    * between checkpoint commits (batch IDs continue across restarts, so
    * the injection counts within the run). Accumulates batches as
    * parquet under `accDir`.
    */
  private def run(dir: String, accDir: String, ckpt: String,
      maxDays: Int, maxEpochs: Int, failAt: Option[Long]): Boolean = {
    val seen = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = spark.readStream.format("graft-lake")
      .option("path", dir).option("changes", "true")
      .option("maxDaysPerBatch", maxDays.toString)
      .option("maxEpochsPerBatch", maxEpochs.toString)
      .load()
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        val n = if (b.isEmpty) seen.get() else seen.incrementAndGet() - 1
        if (failAt.contains(n)) sys.error(s"injected crash at batch $id")
        b.write.mode("append").parquet(accDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    try { q.awaitTermination(); true }
    catch { case e: Exception
        if String.valueOf(e.getMessage).contains("injected") ||
          String.valueOf(e.getCause).contains("injected") => false }
  }

  private def acc(accDir: String): DataFrame =
    spark.read.parquet(accDir)

  test("restart MID-SNAPSHOT: the crashed run's checkpoint resumes at " +
    "the exact day boundary — every pinned row exactly once") {
    val root = freshDir("mid_snapshot")
    val (dir, accDir, ckpt) = (s"$root/lake", s"$root/acc", s"$root/ckpt")
    seed(dir)
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    // one day per batch; crash before batch 2 (days 1 and 2 committed)
    assert(!run(dir, accDir, ckpt, maxDays = 1, maxEpochs = 10,
      failAt = Some(2L)), "the injected crash must surface")
    val partial = acc(accDir).select("event_id").as[Long].collect().toSet
    assert(partial === Set(10L, 11L, 20L, 21L),
      "exactly the first two days' rows land before the crash")
    // resume: the remaining days drain, nothing re-emits
    assert(run(dir, accDir, ckpt, maxDays = 1, maxEpochs = 10, None))
    val all = acc(accDir)
    assert(all.count() === 8L, "every pinned row exactly once")
    assert(all.select("_commit_epoch").distinct().as[Int].collect()
      .toSeq === Seq(e0), "snapshot rows stamp the pinned epoch")
    assert(all.filter(col("event_id") === 21L)
      .select("value").as[Double].head() === 22.0,
      "the snapshot folds MoR deltas exactly like a batch read")
    assert(all.select("_change_type").distinct().as[String].collect()
      .toSeq === Seq("insert"))
  }

  test("restart MID-TAIL: resumed offsets skip committed epochs; new " +
    "commits keep flowing; a delete image arrives as a delete") {
    val root = freshDir("mid_tail")
    val (dir, accDir, ckpt) = (s"$root/lake", s"$root/acc", s"$root/ckpt")
    seed(dir)
    // drain the snapshot completely first
    assert(run(dir, accDir, ckpt, maxDays = 10, maxEpochs = 1, None))
    val snapRows = acc(accDir).count()
    // three cdf commits: update, insert, delete
    LakeSnapshot.merge(spark, dir,
      Seq((10L, ts(1), 100.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts", cdf = true)
    LakeSnapshot.merge(spark, dir,
      Seq((99L, ts(3), 9.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts", cdf = true)
    LakeSnapshot.deleteKeys(spark, dir,
      Seq((41L, ts(4))).toDF("event_id", "ts"), "event_id", "ts",
      cdf = true)
    // one epoch per batch; crash before the second tail batch
    assert(!run(dir, accDir, ckpt, maxDays = 10, maxEpochs = 1,
      failAt = Some(1L)))
    // resume to the end; then one more commit and a final drain
    assert(run(dir, accDir, ckpt, maxDays = 10, maxEpochs = 1, None))
    LakeSnapshot.merge(spark, dir,
      Seq((11L, ts(1), 111.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts", cdf = true)
    assert(run(dir, accDir, ckpt, maxDays = 10, maxEpochs = 1, None))
    val tail = acc(accDir).filter(col("_change_type") =!= "insert" ||
      col("event_id") === 99L)
    // update pre+post for 10, insert for 99, delete for 41, pre+post for 11
    assert(tail.count() === 6L)
    val byType = acc(accDir).groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("update_preimage") === 2L && byType("update_postimage") === 2L)
    assert(byType("delete") === 1L)
    assert(byType("insert") === snapRows + 1L,
      "no snapshot re-emit, one tail insert — exactly once end to end")
    // the folded image equals the batch read (the consumer contract)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id").orderBy(col("_commit_epoch").desc)
    val folded = acc(accDir)
      .filter(col("_change_type") =!= "update_preimage")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("_change_type") =!= "delete")
      .select("event_id", "value").as[(Long, Double)].collect().toSet
    val batch = LakeSnapshot.read(spark, dir)
      .select("event_id", "value").as[(Long, Double)].collect().toSet
    assert(folded === batch,
      "end-of-stream folded state must equal the batch read")
  }

  test("a DROPPED column surfaced by retained change sidecars reads " +
    "NULL in the snapshot — never the pre-drop values (the sentinel " +
    "binding; an identity fallback would resurrect them)") {
    val root = freshDir("dropped_col")
    val (dir, accDir, ckpt) = (s"$root/lake", s"$root/acc", s"$root/ckpt")
    // a cdf merge records sidecars CARRYING `note`; then the column drops
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.0, "secret"), (2L, ts(1), 2.0, "hidden"))
        .toDF("event_id", "ts", "value", "note"),
      "event_id", "ts", cdf = true)
    LakeSnapshot.dropColumn(spark, dir, "note")
    // the stream schema unions table columns with SIDECAR columns, so
    // `note` is in the stream — but the pinned state knows it as dropped
    assert(run(dir, accDir, ckpt, maxDays = 10, maxEpochs = 10, None))
    val acc = spark.read.parquet(accDir)
    assert(acc.columns.contains("note"),
      "retained sidecars surface the dropped column in the stream schema")
    assert(acc.filter(col("note").isNotNull).count() === 0L,
      "snapshot rows must NULL-fill a dropped column — pre-drop values " +
        "in pinned files must never resurface")
    assert(acc.select("event_id", "value").as[(Long, Double)]
      .collect().toSet === Set((1L, 1.0), (2L, 2.0)))
  }

  test("mid-stream schema EVOLUTION is loud, never silent: a tail " +
    "sidecar carrying a column the stream's schema doesn't know fails " +
    "the batch with the restart instruction") {
    val root = freshDir("evolve_mid")
    val (dir, accDir, ckpt) = (s"$root/lake", s"$root/acc", s"$root/ckpt")
    seed(dir)
    assert(run(dir, accDir, ckpt, maxDays = 10, maxEpochs = 10, None))
    val preEvolveSchema = spark.readStream.format("graft-lake")
      .option("path", dir).option("changes", "true").load().schema
    // the table evolves AFTER the stream's schema pinned: a cdf merge
    // carrying a brand-new column
    LakeSnapshot.merge(spark, dir,
      Seq((10L, ts(1), 1.0, "fix")).toDF("event_id", "ts", "value", "src"),
      "event_id", "ts", cdf = true)
    // a LONG-RUNNING stream holds the schema it started with — pin it
    // explicitly (a restart re-infers and self-heals; mid-run there is
    // no re-infer, only this loud failure between it and silent loss)
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft-lake")
        .schema(preEvolveSchema)
        .option("path", dir).option("changes", "true")
        .load()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(accDir); ()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + msgs(t.getCause)
    assert(msgs(e).contains("restart the stream"),
      s"dropping the new column silently would corrupt the fold: ${msgs(e)}")
    // a RESTART (schema re-inferred) picks the evolved column up whole
    val acc2 = s"$root/acc2"
    assert(run(dir, acc2, s"$root/ckpt2", 10, 10, None))
    val snap = spark.read.parquet(acc2)
    assert(snap.columns.contains("src"))
    assert(snap.filter(col("src") === "fix").count() === 1L)
  }

  test("loud contracts: streaming read without changes=true refuses " +
    "with the fix in the message; offsets round-trip their json") {
    val root = freshDir("loud")
    val dir = s"$root/lake"
    seed(dir)
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft-lake").option("path", dir)
        .load()
        .writeStream.format("noop")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt").start()
      q.awaitTermination()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + msgs(t.getCause)
    assert(msgs(e).contains("changes"), msgs(e))
    assert(LakeStreamOffset.parse("s:5:3") ===
      LakeStreamOffset.snapshot(5, 3))
    assert(LakeStreamOffset.parse("t:7") === LakeStreamOffset.tail(7))
    assert(LakeStreamOffset.parse(
      LakeStreamOffset.snapshot(2, 9).json()) ===
      LakeStreamOffset.snapshot(2, 9))
  }

  test("byte-based admission (VERDICT r15 #5): ONE hot day drains in " +
    "multiple bounded micro-batches split at file boundaries — no row " +
    "lost or duplicated, and the offset's unit index survives a " +
    "mid-day crash-restart") {
    val root = freshDir("hot_day")
    val dir = s"$root/lake"
    // one day, many base files, plus a delta fold so the atomic-fold
    // unit is also exercised. stageMerge's dedup window forces a keyed
    // shuffle (4 partitions here), and AQE partition-coalescing would
    // collapse this tiny staged write to ~1 file (VERDICT r16 — the r16
    // fixture assumed repartition(8) survived; it doesn't). Disable
    // coalescing around the seeding merge so the day genuinely has 4
    // base files, and assert the count so a regression fails loudly.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      LakeSnapshot.merge(spark, dir,
        (1 to 400).map(i => (i.toLong, ts(1), i.toDouble))
          .toDF("event_id", "ts", "value"),
        "event_id", "ts")
    } finally
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    val baseFiles = new java.io.File(s"$dir/data").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.isDirectory).flatMap(_.listFiles())
      .count(f => f.isFile && f.getName.startsWith("part-"))
    assert(baseFiles >= 3,
      s"fixture must seed a genuinely multi-file day, got $baseFiles " +
        "base files — did AQE coalescing collapse the staged write again?")
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((1L, ts(1), 111.0), (500L, ts(1), 555.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val accDir = s"$root/acc"
    def runBytes(failAt: Option[Long]): Boolean = {
      val seen = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = spark.readStream.format("graft-lake")
        .option("path", dir).option("changes", "true")
        .option("maxBytesPerBatch", "1") // force one unit per micro-batch
        .load()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          val rows = b.count()
          if (rows > 0) {
            val n = seen.incrementAndGet() - 1
            if (failAt.contains(n)) sys.error("injected crash")
            batchSizes += rows
            b.write.mode("append").parquet(accDir)
          }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      try { q.awaitTermination(); true }
      catch { case e: Exception
          if String.valueOf(e.getMessage).contains("injected") ||
            String.valueOf(e.getCause).contains("injected") => false }
    }
    // crash after 2 non-empty batches (mid-day!), then drain
    assert(!runBytes(Some(2L)))
    assert(runBytes(None))
    assert(batchSizes.size > 2,
      s"a 4 KiB budget must split the hot day into several batches, " +
        s"got $batchSizes")
    // exactly-once across the mid-day restart: every pinned row once
    val got = acc(accDir).filter(col("_change_type") === "insert")
      .select("event_id", "value").as[(Long, Double)].collect()
    assert(got.length === got.toSet.size, "no row delivered twice")
    assert(got.toSet ===
      ((2 to 400).map(i => (i.toLong, i.toDouble)).toSet +
        ((1L, 111.0)) + ((500L, 555.0))),
      "folded snapshot: delta values win, every base row exactly once")
  }

  test("row-based admission (r17, VERDICT r16 #9): maxRowsPerBatch " +
    "bounds every counted micro-batch by the sidecar's exact per-file " +
    "row counts; an unknown-row unit (the delta fold) drains ALONE") {
    val root = freshDir("row_budget")
    val dir = s"$root/lake"
    // one day, 4 base files of ~100 rows each (coalescing pinned off so
    // the keyed staging shuffle genuinely writes 4 files), plus a fold
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      LakeSnapshot.merge(spark, dir,
        (1 to 400).map(i => (i.toLong, ts(1), i.toDouble))
          .toDF("event_id", "ts", "value"),
        "event_id", "ts")
    } finally
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((1L, ts(1), 111.0), (500L, ts(1), 555.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val accDir = s"$root/acc"
    val q = spark.readStream.format("graft-lake")
      .option("path", dir).option("changes", "true")
      .option("maxRowsPerBatch", "250")
      .load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val n = b.count()
        if (n > 0) { sizes += n; b.write.mode("append").parquet(accDir) }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination()
    // 4 counted files (~100 rows each) under a 250-row budget → 2-file
    // batches; the fold (unknown rows) fills the budget → drains alone
    assert(sizes.size >= 3,
      s"a 250-row budget must split the day, got $sizes")
    assert(sizes.forall(_ <= 250L),
      s"every counted batch must respect the row budget, got $sizes")
    // exactly-once, fold-correct
    val got = spark.read.parquet(accDir)
      .filter(col("_change_type") === "insert")
      .select("event_id", "value").as[(Long, Double)].collect()
    assert(got.length === got.toSet.size, "no row delivered twice")
    assert(got.toSet ===
      ((2 to 400).map(i => (i.toLong, i.toDouble)).toSet +
        ((1L, 111.0)) + ((500L, 555.0))))
  }

  test("a tail window crossing a RESTORE fails loudly (r19): a feed " +
    "cannot represent a rollback, so the stream must die naming it — " +
    "never silently skip; restarting past the restore epoch resumes") {
    val root = freshDir("tail_restore")
    val dir = s"$root/lake"
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts", cdf = true)
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 2.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts", cdf = true)
    LakeSnapshot.restoreTo(spark, dir, e0)
    val accDir = s"$root/acc"
    def tail(from: Int, ckpt: String): Either[String, Unit] = {
      val q = spark.readStream.format("graft-lake")
        .option("path", dir).option("changes", "true")
        .option("startingEpoch", from.toString)
        .load()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(accDir); ()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      try { q.awaitTermination(); Right(()) }
      catch { case e: Exception =>
        Left(String.valueOf(e.getMessage) + String.valueOf(e.getCause)) }
    }
    val boom = tail(e0, s"$root/ckpt1")
    assert(boom.isLeft && boom.swap.exists(_.contains("RESTORE")),
      s"the tail window spanning the restore must die naming it: $boom")
    // the documented recovery: restart the feed PAST the restore epoch
    val eRestore = LakeSnapshot.currentEpoch(spark, dir)
    assert(tail(eRestore, s"$root/ckpt2").isRight,
      "a feed subscribed after the restore epoch must run clean")
    LakeSnapshot.merge(spark, dir,
      Seq((9L, ts(2), 9.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts", cdf = true)
    assert(tail(eRestore, s"$root/ckpt2").isRight)
    assert(spark.read.parquet(accDir)
      .filter(col("event_id") === 9L).count() === 1L,
      "post-restore commits flow through the restarted feed")
  }

  test("startingEpoch (r17): tail-only subscribe skips the snapshot " +
    "and emits exactly the change images after the pinned epoch — the " +
    "graft-cdc window semantics, so switching formats never shifts it") {
    val root = freshDir("starting_epoch")
    val dir = s"$root/lake"
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.0), (2L, ts(2), 2.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts", cdf = true)
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((2L, ts(2), 22.0), (3L, ts(3), 3.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts", cdf = true)
    val accDir = s"$root/acc"
    val q = spark.readStream.format("graft-lake")
      .option("path", dir).option("changes", "true")
      .option("startingEpoch", e0.toString)
      .load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("append").parquet(accDir); ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination()
    val got = spark.read.parquet(accDir)
      .select("event_id", "value", "_change_type")
      .as[(Long, Double, String)].collect().toSet
    assert(got === Set(
      (2L, 2.0, "update_preimage"), (2L, 22.0, "update_postimage"),
      (3L, 3.0, "insert")),
      "no snapshot re-emit; exactly the post-epoch change images")
    // the graft-cdc feed over the same window agrees row-for-row
    val cdc = LakeSnapshot.readChangesCdf(spark, dir, e0,
      LakeSnapshot.currentEpoch(spark, dir))
      .select("event_id", "value", "_change_type")
      .as[(Long, Double, String)].collect().toSet
    assert(cdc === got)
  }

  test("startingTimestamp (r18): T resolves to the first commit AT OR " +
    "AFTER T via the manifest's recorded commit wall-clocks — the same " +
    "window the equivalent startingEpoch subscribes") {
    val root = freshDir("starting_ts")
    val dir = s"$root/lake"
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.0), (2L, ts(2), 2.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts", cdf = true)
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    val t0 = graft.ops.IncrementalDedup.Manifest
      .commitTimeMs(spark, s"$dir/manifest", e0)
    // commit times are second-resolution on some filesystems — space
    // the second commit measurably after the first
    Thread.sleep(1100)
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((2L, ts(2), 22.0), (3L, ts(3), 3.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts", cdf = true)
    val e1 = LakeSnapshot.currentEpoch(spark, dir)
    val t1 = graft.ops.IncrementalDedup.Manifest
      .commitTimeMs(spark, s"$dir/manifest", e1)
    require(t1 > t0, "fixture needs measurably spaced commits")
    def run(opts: (String, String)*): Set[(Long, Double, String)] = {
      val tag = opts.map(_._2.replaceAll("[^0-9A-Za-z]", "")).mkString("_")
      val accDir = s"$root/acc_$tag"
      val q = opts.foldLeft(spark.readStream.format("graft-lake")
          .option("path", dir).option("changes", "true")) {
          case (r, (k, v)) => r.option(k, v)
        }.load()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(accDir); ()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt_$tag").start()
      q.awaitTermination()
      spark.read.parquet(accDir)
        .select("event_id", "value", "_change_type")
        .as[(Long, Double, String)].collect().toSet
    }
    // an instant just after commit e0: subscribe the e1-onward window —
    // exactly what startingEpoch=e0 subscribes
    val want = Set(
      (2L, 2.0, "update_preimage"), (2L, 22.0, "update_postimage"),
      (3L, 3.0, "insert"))
    assert(run("startingTimestamp" -> (t0 + 1).toString) === want)
    // epoch-millis and commit-instant forms agree
    assert(run("startingTimestamp" -> t1.toString) === want,
      "T exactly at a commit's wall-clock must include that commit")
    // an instant after every commit: future-only (nothing yet)
    assert(run("startingTimestamp" -> (t1 + 60000).toString) === Set.empty)
    // both pins at once refuse loudly
    val e = intercept[Exception] {
      run("startingTimestamp" -> t0.toString, "startingEpoch" -> "0")
    }
    assert(e.getMessage != null)
  }

  test("schema inference never leaks the gen= partition key (ADVICE " +
    "r15): no spurious always-null 'gen INT' column, a REAL data column " +
    "named 'gen' keeps its declared type and streams its values, and " +
    "the stream feed agrees with the graft-cdc feed") {
    val root = freshDir("genleak")
    val dir = s"$root/lake"
    // a data column literally named `gen` — the collision ADVICE flags
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 50L), (2L, ts(2), 60L)).toDF("event_id", "ts", "gen"),
      "event_id", "ts", cdf = true)
    val sch = LakeFullTableStream.streamSchema(spark, dir)
    assert(sch.fields.count(_.name == "gen") === 1,
      s"exactly one 'gen' field (the data column), got ${sch.fieldNames.toSeq}")
    assert(sch("gen").dataType ===
      org.apache.spark.sql.types.LongType,
      "the data column's LONG, not the partition key's inferred INT")
    val feed = GraftCdcSource.feedSchema(spark, dir)
    assert(feed.fields.count(_.name == "gen") === 1 &&
      feed("gen").dataType === org.apache.spark.sql.types.LongType,
      s"graft-cdc feed schema agrees, got ${feed.fieldNames.toSeq}")
    // end-to-end: the streamed values are the DATA values, never nulls
    val accDir = s"$root/acc"
    assert(run(dir, accDir, s"$root/ckpt", 10, 10, None))
    val got = acc(accDir).select("event_id", "gen").as[(Long, Long)]
      .collect().toMap
    assert(got === Map(1L -> 50L, 2L -> 60L))
  }
}
