package graft.etl

import java.nio.file.{Files, Path => JPath, Paths}

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** p24: column RENAME / DROP as manifest-only commits (VERDICT r12 #3).
  * The oracle hash-locks the renamed-view VALUES; this spec pins the
  * mapping protocol:
  *
  *  - rename touches ZERO data files; the physical parquet column keeps
  *    carrying values under the new logical name, merges under the new
  *    name land in the SAME physical column, and time travel to a
  *    pre-rename epoch surfaces the OLD name;
  *  - drop masks the column from every current read while history still
  *    time-travels to it; re-adding the same name allocates a FRESH
  *    physical column so dropped values never resurface;
  *  - renames compose with deltas, OPTIMIZE, checkpoint, and CDC (a
  *    window spanning a rename compares values through the shared
  *    physical, not name-vs-name);
  *  - invalid ops (key/day/missing/colliding) fail loudly.
  */
class LakeColumnMappingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/lake_colmap_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def seedLake(dir: String): Unit =
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.0), (2L, ts(1), 2.0), (3L, ts(2), 3.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts")

  private def dataFiles(dir: String): Map[String, Long] = {
    val root = Paths.get(s"$dir/data")
    import scala.jdk.CollectionConverters._
    Files.walk(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .map(p => root.relativize(p).toString ->
        Files.getLastModifiedTime(p).toMillis)
      .toMap
  }

  test("RENAME is metadata-only: zero data files move; reads surface " +
    "the new name; merges under the new name hit the same physical " +
    "column; time travel surfaces the old name") {
    val dir = freshDir("rename")
    seedLake(dir)
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    val before = dataFiles(dir)
    LakeSnapshot.renameColumn(spark, dir, "value", "amount")
    assert(dataFiles(dir) === before, "rename must not touch a data file")
    val cur = LakeSnapshot.read(spark, dir)
    assert(cur.columns.contains("amount") && !cur.columns.contains("value"))
    // merge a batch speaking the NEW name
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 100.0)).toDF("event_id", "ts", "amount"),
      "event_id", "ts")
    val got = LakeSnapshot.read(spark, dir)
      .select(col("event_id"), col("amount"))
      .as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 100.0, 2L -> 2.0, 3L -> 3.0))
    // the new gen's files carry the PHYSICAL name (value)
    val newGen = LakeSnapshot.liveView(spark, dir).days("2024-01-01").base
    val raw = spark.read.parquet(s"$dir/data/gen=$newGen/day=2024-01-01")
    assert(raw.columns.contains("value") && !raw.columns.contains("amount"),
      "physical names must stay stable in the files")
    // time travel: pre-rename epoch reads the OLD name
    val past = LakeSnapshot.readAt(spark, dir, e0)
    assert(past.columns.contains("value") && !past.columns.contains("amount"))
    assert(past.filter(col("event_id") === 1L).select("value")
      .as[Double].head() === 1.0)
  }

  test("DROP masks the column now, history keeps it; re-added name gets " +
    "a fresh physical column (no resurrection)") {
    val dir = freshDir("drop")
    seedLake(dir)
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    LakeSnapshot.dropColumn(spark, dir, "value")
    assert(!LakeSnapshot.read(spark, dir).columns.contains("value"))
    assert(LakeSnapshot.readAt(spark, dir, e0).columns.contains("value"),
      "history must still surface the dropped column")
    // re-add 'value' via a merge: fresh physical, old values stay buried
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 777.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val got = LakeSnapshot.read(spark, dir)
      .select(col("event_id"), col("value"))
      .as[(Long, java.lang.Double)].collect().toMap
    assert(got(1L) === 777.0)
    assert(got(2L) === null && got(3L) === null,
      "pre-drop values must NOT resurface under the re-added name")
    val st = LakeSnapshot.liveView(spark, dir)
    assert(st.colmap.exists { case (p, l) =>
      p.startsWith("value__") && l.contains("value") },
      s"re-add must allocate a fresh physical (got ${st.colmap})")
  }

  test("renames compose with row deltas, OPTIMIZE, checkpoint, and CDC " +
    "across the rename window") {
    val dir = freshDir("compose")
    seedLake(dir)
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    LakeSnapshot.renameColumn(spark, dir, "value", "amount")
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((2L, ts(1), 22.0)).toDF("event_id", "ts", "amount"),
      "event_id", "ts")
    LakeSnapshot.compactDays(spark, dir)
    LakeSnapshot.checkpointManifest(spark, dir)
    val e1 = LakeSnapshot.currentEpoch(spark, dir)
    val got = LakeSnapshot.read(spark, dir)
      .select(col("event_id"), col("amount"))
      .as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 1.0, 2L -> 22.0, 3L -> 3.0))
    // checkpoint persisted the mapping: a post-checkpoint reader folds
    // from the snapshot row alone and must still map value -> amount
    val cur = LakeSnapshot.read(spark, dir)
    assert(cur.columns.contains("amount") && !cur.columns.contains("value"))
    // CDC across the rename: ONLY key 2 changed, reported under the
    // to-side name with true value comparison through the physical
    val ch = LakeSnapshot.readChanges(spark, dir, e0, e1, "event_id")
      .select(col("event_id"), col("amount"), col("_change_type"))
      .as[(Long, Double, String)].collect().toSet
    assert(ch === Set(
      (2L, 2.0, "update_preimage"), (2L, 22.0, "update_postimage")))
  }

  test("a column op INSIDE a write-time CDF window is exempt (it moved " +
    "no data) and earlier sidecars translate to the window-end names") {
    val dir = freshDir("cdf_colop")
    seedLake(dir)
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((2L, ts(1), 22.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts", cdf = true)
    val eRename = LakeSnapshot.renameColumn(spark, dir, "value", "amount")
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((3L, ts(2), 33.0)).toDF("event_id", "ts", "amount"),
      "event_id", "ts", cdf = true)
    val e1 = LakeSnapshot.currentEpoch(spark, dir)
    // pre-fix this threw 'committed without a change sidecar' at the
    // rename epoch, stalling every feed window containing it forever
    val feed = LakeSnapshot.readChangesCdf(spark, dir, e0, e1)
    assert(!feed.columns.contains("value"),
      "pre-rename sidecar must translate to the window-end name")
    assert(!feed.select("_commit_epoch").as[Int].collect().contains(eRename))
    val got = feed
      .filter(col("_change_type").isin("update_postimage", "insert"))
      .select(col("event_id"), col("amount"), col("_change_type"))
      .as[(Long, Double, String)].collect().toSet
    assert(got === Set(
      (2L, 22.0, "update_postimage"), (3L, 33.0, "update_postimage")))
  }

  test("a cdf delta whose staging->commit window spans a column op " +
    "aborts loudly (its sidecar carries pre-op names)") {
    val dir = freshDir("cdf_stale_colop")
    seedLake(dir)
    val staged = LakeSnapshot.stageMergeDelta(spark, dir,
      Seq((2L, ts(1), 22.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts", cdf = true)
    LakeSnapshot.renameColumn(spark, dir, "value", "amount")
    intercept[LakeSnapshot.ConcurrentLakeMutationException] {
      LakeSnapshot.commitDelta(spark, dir, staged, "event_id")
    }
    // a plain (cdf=false) delta does NOT abort — nothing pins preimages
    val staged2 = LakeSnapshot.stageMergeDelta(spark, dir,
      Seq((3L, ts(2), 33.0)).toDF("event_id", "ts", "amount"),
      "event_id", "ts")
    LakeSnapshot.commitDelta(spark, dir, staged2, "event_id")
    val got = LakeSnapshot.read(spark, dir)
      .select(col("event_id"), col("amount"))
      .as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 1.0, 2L -> 2.0, 3L -> 33.0))
  }

  test("invalid column ops fail loudly") {
    val dir = freshDir("invalid")
    seedLake(dir)
    intercept[IllegalArgumentException] {
      LakeSnapshot.renameColumn(spark, dir, "event_id", "id")
    }
    intercept[IllegalArgumentException] {
      LakeSnapshot.renameColumn(spark, dir, "day", "date")
    }
    intercept[IllegalArgumentException] {
      LakeSnapshot.renameColumn(spark, dir, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      LakeSnapshot.renameColumn(spark, dir, "value", "ts") // collision
    }
    intercept[IllegalArgumentException] {
      LakeSnapshot.dropColumn(spark, dir, "event_id")
    }
  }
}
