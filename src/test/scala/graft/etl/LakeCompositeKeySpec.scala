package graft.etl

import java.nio.file.{Files, Path => JPath, Paths}

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Composite merge keys (r15, VERDICT r14 #5): `key = 'a,b'` through
  * every fold seam — the Group-reader winner maps, the DataFrame window
  * fold, delete markers, deletion vectors, batch dedup, the streaming
  * sink — on tuples whose PARTS collide massively alone, so any seam
  * that folded on a single part (or on the comma-string as a missing
  * column) fails loudly here. Single-key behavior is bit-unchanged (the
  * whole 190-entry board is the proof; this spec adds the tuple cases).
  */
class LakeCompositeKeySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/lake_composite_key_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  private val K = "tenant,seq"

  private def seed(dir: String): Unit =
    LakeSnapshot.merge(spark, dir,
      Seq((1L, 1L, ts(1), 11.0), (1L, 2L, ts(1), 12.0),
        (2L, 1L, ts(1), 21.0), (2L, 2L, ts(2), 22.0))
        .toDF("tenant", "seq", "ts", "value"),
      K, "ts")

  private def content(dir: String): Set[(Long, Long, Double)] =
    LakeSnapshot.read(spark, dir)
      .select("tenant", "seq", "value")
      .as[(Long, Long, Double)].collect().toSet

  test("MoR delta fold is TUPLE-exact: an upsert of (1,2) touches " +
    "neither (1,1) nor (2,2); a delete marker kills only its tuple") {
    val dir = freshDir("mor")
    seed(dir)
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((1L, 2L, ts(1), 120.0)).toDF("tenant", "seq", "ts", "value"),
      K, "ts")
    assert(content(dir) === Set(
      (1L, 1L, 11.0), (1L, 2L, 120.0), (2L, 1L, 21.0), (2L, 2L, 22.0)),
      "a seam folding on one part would have clobbered its collisions")
    LakeSnapshot.deleteKeysDelta(spark, dir,
      Seq((1L, 1L, ts(1))).toDF("tenant", "seq", "ts"), K, "ts")
    assert(content(dir) === Set(
      (1L, 2L, 120.0), (2L, 1L, 21.0), (2L, 2L, 22.0)))
    // COW paths over the same tuples: merge + deleteKeys
    LakeSnapshot.merge(spark, dir,
      Seq((2L, 1L, ts(1), 210.0)).toDF("tenant", "seq", "ts", "value"),
      K, "ts")
    LakeSnapshot.deleteKeys(spark, dir,
      Seq((2L, 2L, ts(2))).toDF("tenant", "seq", "ts"), K, "ts")
    assert(content(dir) === Set((1L, 2L, 120.0), (2L, 1L, 210.0)))
    // OPTIMIZE absorbs, values invariant
    LakeSnapshot.compactDays(spark, dir)
    assert(content(dir) === Set((1L, 2L, 120.0), (2L, 1L, 210.0)))
  }

  test("deletion vectors locate victims by the full tuple (the stats " +
    "range pruning is single-key-only and stays off here)") {
    val dir = freshDir("dv")
    seed(dir)
    val f0 = FileStats.skippedFiles.get()
    LakeSnapshot.deleteKeysPositional(spark, dir,
      Seq((1L, 1L, ts(1))).toDF("tenant", "seq", "ts"), K, "ts")
    assert(content(dir) === Set(
      (1L, 2L, 12.0), (2L, 1L, 21.0), (2L, 2L, 22.0)))
    assert(FileStats.skippedFiles.get() === f0,
      "no per-part range pruning may fire for a composite key")
  }

  test("batch dedup collapses duplicate TUPLES (greatest-struct rule), " +
    "never distinct tuples sharing a part") {
    val dir = freshDir("dedup")
    LakeSnapshot.merge(spark, dir,
      Seq((1L, 1L, ts(1), 5.0), (1L, 1L, ts(1), 9.0), (1L, 2L, ts(1), 7.0))
        .toDF("tenant", "seq", "ts", "value"),
      K, "ts")
    assert(content(dir) === Set((1L, 1L, 9.0), (1L, 2L, 7.0)))
  }

  test("CDF images carry every key part; renaming or dropping ANY key " +
    "part is refused") {
    val dir = freshDir("cdf")
    seed(dir)
    val pre = LakeSnapshot.currentEpoch(spark, dir)
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((2L, 2L, ts(2), 220.0)).toDF("tenant", "seq", "ts", "value"),
      K, "ts", cdf = true)
    val ch = LakeSnapshot.readChangesCdf(spark, dir,
      pre, LakeSnapshot.currentEpoch(spark, dir))
      .select("tenant", "seq", "value", "_change_type")
      .as[(Long, Long, Double, String)].collect().toSet
    assert(ch === Set((2L, 2L, 22.0, "update_preimage"),
      (2L, 2L, 220.0, "update_postimage")))
    Seq("tenant", "seq").foreach { part =>
      val e1 = intercept[Exception] {
        LakeSnapshot.renameColumn(spark, dir, part, "x")
      }
      assert(e1.getMessage.contains("key"), e1.getMessage)
      val e2 = intercept[Exception] {
        LakeSnapshot.dropColumn(spark, dir, part)
      }
      assert(e2.getMessage.contains("key"), e2.getMessage)
    }
  }

  test("the streaming sink upserts by the composite key " +
    "(key = 'tenant,seq' option)") {
    val root = freshDir("sink")
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/lake", s"$root/ckpt")
    Seq((1L, 1L, ts(1), 11.0), (1L, 2L, ts(1), 12.0))
      .toDF("tenant", "seq", "ts", "value")
      .coalesce(1).write.mode("append").parquet(s"$inDir/b1")
    Seq((1L, 1L, ts(1), 110.0), (2L, 1L, ts(1), 21.0))
      .toDF("tenant", "seq", "ts", "value")
      .coalesce(1).write.mode("append").parquet(s"$inDir/b2")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "tenant BIGINT, seq BIGINT, ts TIMESTAMP, value DOUBLE")
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*")
      .writeStream.format("graft-lake")
      .option("path", outDir).option("key", K)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt).start()
    q.awaitTermination()
    assert(content(outDir) === Set(
      (1L, 1L, 110.0), (1L, 2L, 12.0), (2L, 1L, 21.0)),
      "youngest micro-batch wins per TUPLE")
  }

  test("the streaming sink upserts by a THREE-part mixed-type key " +
    "(key = 'site,uid,reg' — STRING+BIGINT+DATE, r17)") {
    val root = freshDir("sink3")
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/lake", s"$root/ckpt")
    def d(i: Int) = java.sql.Date.valueOf(f"2023-06-$i%02d")
    // (a,1,d1) recurs across batches — youngest wins; (a,1,d2) differs
    // ONLY in the date part and must survive untouched
    Seq(("a", 1L, d(1), ts(1), 11.0), ("a", 1L, d(2), ts(1), 12.0),
      ("b", 1L, d(1), ts(1), 21.0))
      .toDF("site", "uid", "reg", "ts", "value")
      .coalesce(1).write.mode("append").parquet(s"$inDir/b1")
    Seq(("a", 1L, d(1), ts(1), 110.0))
      .toDF("site", "uid", "reg", "ts", "value")
      .coalesce(1).write.mode("append").parquet(s"$inDir/b2")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "site STRING, uid BIGINT, reg DATE, ts TIMESTAMP, value DOUBLE")
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*")
      .writeStream.format("graft-lake")
      .option("path", outDir).option("key", "site,uid,reg")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt).start()
    q.awaitTermination()
    val got = LakeSnapshot.read(spark, outDir)
      .select("site", "uid", "reg", "value")
      .as[(String, Long, java.sql.Date, Double)].collect().toSet
    assert(got === Set(("a", 1L, d(1), 110.0), ("a", 1L, d(2), 12.0),
      ("b", 1L, d(1), 21.0)),
      "youngest wins per full 3-part tuple; date-part-only siblings survive")
  }
}
