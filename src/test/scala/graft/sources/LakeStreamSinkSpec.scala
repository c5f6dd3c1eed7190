package graft.sources

import java.nio.file.{Files, Path => JPath, Paths}

import graft.TestSpark
import graft.etl.LakeSnapshot
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The native DSv2 streaming sink (`writeStream.format("graft-lake")`,
  * VERDICT r13 #3): per-batch tag-idempotent MoR delta commits, staging
  * → claim → move → one manifest row, restart-safe from the checkpoint.
  */
class LakeStreamSinkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/lake_stream_sink_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def ts(day: Int, h: Int = 10): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  private val schema = org.apache.spark.sql.types.StructType.fromDDL(
    "event_id BIGINT, ts TIMESTAMP, value DOUBLE")

  private def addInput(inDir: String, rows: Seq[(Long, java.sql.Timestamp,
      Double)], part: Int): Unit =
    rows.toDF("event_id", "ts", "value").coalesce(1)
      .write.mode("append").parquet(s"$inDir/b$part")

  private def runOnce(inDir: String, outDir: String, ckpt: String): Unit = {
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // one input file per micro-batch
      .parquet(s"$inDir/*")
      .writeStream.format("graft-lake")
      .option("path", outDir).option("key", "event_id")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination()
  }

  test("per-batch delta commits: first stream write creates the lake, " +
    "each micro-batch is ONE tagged delta epoch, folds upsert-by-key") {
    val root = freshDir("basic")
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/lake", s"$root/ckpt")
    addInput(inDir, Seq((1L, ts(1), 1.0), (2L, ts(1), 2.0)), 1)
    addInput(inDir, Seq((1L, ts(1), 100.0), (3L, ts(2), 3.0)), 2)
    runOnce(inDir, outDir, ckpt)
    // youngest wins per key across the two batches
    assert(LakeSnapshot.read(spark, outDir)
      .select("event_id", "value").as[(Long, Double)].collect().toSet ===
      Set((1L, 100.0), (2L, 2.0), (3L, 3.0)))
    val hist = LakeSnapshot.describeHistory(spark, outDir)
      .select("operation").as[String].collect().toSeq
    assert(hist === Seq("delta", "delta"),
      s"each micro-batch must be one delta commit, got $hist")
    // no staging leftovers under delta/.sw
    val sw = new org.apache.hadoop.fs.Path(s"$outDir/delta/.sw")
    val fs = sw.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(sw) || fs.listStatus(sw).forall(st =>
      fs.listStatus(st.getPath).isEmpty),
      "staging areas must be cleaned at batch commit")
  }

  test("restart from the checkpoint: processed batches never re-apply, " +
    "new input lands as exactly one more delta epoch") {
    val root = freshDir("restart")
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/lake", s"$root/ckpt")
    addInput(inDir, Seq((1L, ts(1), 1.0), (2L, ts(1), 2.0)), 1)
    runOnce(inDir, outDir, ckpt)
    val e1 = LakeSnapshot.currentEpoch(spark, outDir)
    // restart with NO new input: nothing re-applies
    runOnce(inDir, outDir, ckpt)
    assert(LakeSnapshot.currentEpoch(spark, outDir) === e1,
      "a restart with no new data must not commit")
    // restart with one new file: exactly one more epoch
    addInput(inDir, Seq((2L, ts(1), 22.0)), 2)
    runOnce(inDir, outDir, ckpt)
    assert(LakeSnapshot.currentEpoch(spark, outDir) === e1 + 1)
    assert(LakeSnapshot.read(spark, outDir)
      .select("event_id", "value").as[(Long, Double)].collect().toSet ===
      Set((1L, 1.0), (2L, 22.0)))
  }

  test("tag idempotence: a redelivered batch commit is a no-op (the " +
    "crash-between-commit-and-checkpoint window)") {
    val dir = freshDir("redeliver")
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val (gen, base, _) = LakeSnapshot.stageExternalDelta(spark, dir, "event_id")
    // simulate a staged batch: one upsert file in the claimed gen
    Seq((2L, ts(1), 2.0)).toDF("event_id", "ts", "value")
      .withColumn("day", lit("2024-01-01")).withColumn("__op", lit("u"))
      .coalesce(1).write.mode("append").partitionBy("day")
      .parquet(s"$dir/delta/gen=$gen")
    val tag = "sw-test-query-7"
    val e = LakeSnapshot.commitExternalDelta(
      spark, dir, gen, base, Seq("2024-01-01"), "event_id", tag)
    // the replay: same tag → same epoch back, no new manifest row
    val e2 = LakeSnapshot.commitExternalDelta(
      spark, dir, gen, base, Seq("2024-01-01"), "event_id", tag)
    assert(e2 === e)
    assert(LakeSnapshot.currentEpoch(spark, dir) === e)
    assert(LakeSnapshot.read(spark, dir).count() === 2L)
  }

  test("the redelivery check is checkpoint-bounded (VERDICT r14 #7): a " +
    "manifest checkpoint folds tag high-waters, so the per-batch scan " +
    "reads O(since-checkpoint) rows — proven by deleting every " +
    "pre-checkpoint row and still refusing the replay") {
    val dir = freshDir("bounded_tags")
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    def taggedCommit(n: Int, v: Double): Int = {
      val (gen, base, _) =
        LakeSnapshot.stageExternalDelta(spark, dir, "event_id")
      Seq((100L + n, ts(1), v)).toDF("event_id", "ts", "value")
        .withColumn("day", lit("2024-01-01")).withColumn("__op", lit("u"))
        .coalesce(1).write.mode("append").partitionBy("day")
        .parquet(s"$dir/delta/gen=$gen")
      LakeSnapshot.commitExternalDelta(
        spark, dir, gen, base, Seq("2024-01-01"), "event_id", s"sw-qA-$n")
    }
    taggedCommit(0, 10.0)
    taggedCommit(1, 11.0)
    val ckptEpoch = LakeSnapshot.checkpointManifest(spark, dir)
    // sever the history: without the txns fold, the tag check would HAVE
    // to read these rows to know sw-qA-0/1 committed
    (0 until ckptEpoch).foreach { e =>
      Files.deleteIfExists(Paths.get(s"$dir/manifest/epoch-$e.properties"))
    }
    assert(LakeSnapshot.tagEpoch(spark, dir, "sw-qA-0").isDefined,
      "a tag absorbed by the checkpoint must still read as committed")
    assert(LakeSnapshot.tagEpoch(spark, dir, "sw-qA-1").isDefined)
    assert(LakeSnapshot.tagEpoch(spark, dir, "sw-qA-2").isEmpty,
      "the NEXT epochId is not committed — high-waters must not over-claim")
    assert(LakeSnapshot.tagEpoch(spark, dir, "sw-qB-0").isEmpty,
      "another query's tags are a different app — never absorbed")
    // the replayed batch is still a no-op through the normal commit path
    val (gen, base, _) = LakeSnapshot.stageExternalDelta(spark, dir, "event_id")
    val before = LakeSnapshot.currentEpoch(spark, dir)
    LakeSnapshot.commitExternalDelta(
      spark, dir, gen, base, Seq("2024-01-01"), "event_id", "sw-qA-1")
    assert(LakeSnapshot.currentEpoch(spark, dir) === before,
      "a redelivered tag must not commit a new row after a checkpoint")
    // post-checkpoint tags keep folding into the NEXT checkpoint
    taggedCommit(2, 12.0)
    LakeSnapshot.checkpointManifest(spark, dir)
    assert(LakeSnapshot.tagEpoch(spark, dir, "sw-qA-2").isDefined)
  }

  test("the monotone-version contract is ENFORCED at commit time " +
    "(ADVICE r15): a NEW out-of-order tag at/below the app's high-water " +
    "is rejected loudly (never silently skipped), incl. the bare-'foo' " +
    "vs 'foo-0' alias; true redeliveries still no-op") {
    val dir = freshDir("monotone_tags")
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    def staged(): (Int, Int) = {
      val (gen, base, _) =
        LakeSnapshot.stageExternalDelta(spark, dir, "event_id")
      Seq((200L, ts(1), 9.0)).toDF("event_id", "ts", "value")
        .withColumn("day", lit("2024-01-01")).withColumn("__op", lit("u"))
        .coalesce(1).write.mode("append").partitionBy("day")
        .parquet(s"$dir/delta/gen=$gen")
      (gen, base)
    }
    val (g1, b1) = staged()
    LakeSnapshot.commitExternalDelta(
      spark, dir, g1, b1, Seq("2024-01-01"), "event_id", "sw-m-5")
    // a NEW tag below the high-water: the old code silently skipped the
    // batch (data loss); now it is a loud producer-bug error
    val (g2, b2) = staged()
    val e = intercept[RuntimeException] {
      LakeSnapshot.commitExternalDelta(
        spark, dir, g2, b2, Seq("2024-01-01"), "event_id", "sw-m-3")
    }
    assert(e.getMessage.contains("monotone"), e.getMessage)
    // the bare-name alias: 'foo' commits as version 0, so a DIFFERENT
    // tag 'foo-0' must be rejected, not treated as already-committed
    val (g3, b3) = staged()
    LakeSnapshot.commitExternalDelta(
      spark, dir, g3, b3, Seq("2024-01-01"), "event_id", "foo")
    val (g4, b4) = staged()
    val e2 = intercept[RuntimeException] {
      LakeSnapshot.commitExternalDelta(
        spark, dir, g4, b4, Seq("2024-01-01"), "event_id", "foo-0")
    }
    assert(e2.getMessage.contains("monotone"), e2.getMessage)
    // true redelivery (exact tag) still no-ops, and the next version
    // commits normally
    val before = LakeSnapshot.currentEpoch(spark, dir)
    LakeSnapshot.commitExternalDelta(
      spark, dir, g4, b4, Seq("2024-01-01"), "event_id", "sw-m-5")
    assert(LakeSnapshot.currentEpoch(spark, dir) === before)
    val (g5, b5) = staged()
    LakeSnapshot.commitExternalDelta(
      spark, dir, g5, b5, Seq("2024-01-01"), "event_id", "sw-m-6")
    assert(LakeSnapshot.currentEpoch(spark, dir) === before + 1)
  }

  test("a LEGACY tag carrying fold separators poisons txnsComplete " +
    "instead of corrupting high-waters (ADVICE r15): the checkpoint " +
    "omits txns, tagEpoch full-scans, redelivery still refused") {
    val dir = freshDir("legacy_tags")
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val (gen, base, _) =
      LakeSnapshot.stageExternalDelta(spark, dir, "event_id")
    Seq((2L, ts(1), 2.0)).toDF("event_id", "ts", "value")
      .withColumn("day", lit("2024-01-01")).withColumn("__op", lit("u"))
      .coalesce(1).write.mode("append").partitionBy("day")
      .parquet(s"$dir/delta/gen=$gen")
    val e = LakeSnapshot.commitExternalDelta(
      spark, dir, gen, base, Seq("2024-01-01"), "event_id", "goodtag-1")
    // rewrite the committed row's tag into the pre-r15 unsanitized shape
    val rowPath = Paths.get(s"$dir/manifest/epoch-$e.properties")
    val rewritten = new String(Files.readAllBytes(rowPath), "UTF-8")
      .replace("tag=goodtag-1", "tag=legacy,bad")
    Files.write(rowPath, rewritten.getBytes("UTF-8"))
    val ckptEpoch = LakeSnapshot.checkpointManifest(spark, dir)
    val ckptRow = new String(Files.readAllBytes(
      Paths.get(s"$dir/manifest/epoch-$ckptEpoch.properties")), "UTF-8")
    assert(!ckptRow.contains("txns="),
      s"a separator-bearing legacy tag must suppress the txns fold, got:\n$ckptRow")
    // the exact legacy tag still reads as committed via the full scan
    assert(LakeSnapshot.tagEpoch(spark, dir, "legacy,bad").isDefined,
      "full-scan fallback must still find the legacy tag")
    assert(LakeSnapshot.tagEpoch(spark, dir, "legacy").isEmpty)
  }

  test("the sink validates its inputs loudly: missing key on a fresh " +
    "lake, and a batch schema without the event-time column") {
    val root = freshDir("loud")
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/lake", s"$root/ckpt")
    addInput(inDir, Seq((1L, ts(1), 1.0)), 1)
    val ex = intercept[Exception] {
      val q = spark.readStream.schema(schema).parquet(s"$inDir/*")
        .writeStream.format("graft-lake")
        .option("path", outDir) // no key, nothing recorded
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
    }
    assert(ex.getMessage.contains("key") ||
      ex.getCause != null && ex.getCause.getMessage.contains("key"))
    val ex2 = intercept[Exception] {
      val q = spark.readStream.schema(schema).parquet(s"$inDir/*")
        .select(col("event_id"), col("value"))
        .writeStream.format("graft-lake")
        .option("path", outDir).option("key", "event_id")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$ckpt2nd").start()
      q.awaitTermination()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " " + msgs(t.getCause)
    assert(msgs(ex2).contains("event-time") || msgs(ex2).contains("ts"))
  }

  private def ckpt2nd = s"target/lake_stream_sink_spec/loud/ckpt2"
}
