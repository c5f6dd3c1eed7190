package graft.sources

import java.nio.file.{Files, Path => JPath, Paths}

import graft.TestSpark
import graft.etl.LakeSnapshot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only COUNT/MIN/MAX (r17, [[LakeAggPushdown]]): over a
  * pure-base lake the answer comes from the manifest fold + stats
  * sidecars — zero data files opened; any condition the stats cannot
  * vouch for (deltas, DVs, residual filters, unusable families) falls
  * back to the normal scan, never to a wrong answer.
  */
class LakeAggPushdownSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/lake_agg_pushdown_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def ts(day: Int, h: Int = 10): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  private def dsv2(dir: String) =
    spark.read.format("graft-lake").option("path", dir).load()

  private def seed(dir: String): Unit =
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.5, "alpha", null.asInstanceOf[String]),
        (2L, ts(1), -2.5, "beta", null.asInstanceOf[String]),
        (3L, ts(2), 30.0, "zulu", null.asInstanceOf[String]),
        (4L, ts(2, 12), 4.0, "mike", null.asInstanceOf[String]))
        .toDF("event_id", "ts", "value", "src", "note"),
      "event_id", "ts")

  test("COUNT(*)/MIN/MAX over a pure-base lake answer from the sidecars" +
    " — no scan; values exact across long/double/string/timestamp; an " +
    "all-null column's min is null; a day filter narrows the count") {
    val dir = freshDir("pure")
    seed(dir)
    val n0 = LakeAggPushdown.pushedAggs.get()
    val r = dsv2(dir).agg(
      count(lit(1)), min("event_id"), max("event_id"),
      min("value"), max("value"), min("src"), max("src"),
      min("ts"), max("ts"), min("note")).head()
    assert(LakeAggPushdown.pushedAggs.get() > n0,
      "the aggregate must be answered from metadata")
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 1L && r.getLong(2) === 4L)
    assert(r.getDouble(3) === -2.5 && r.getDouble(4) === 30.0)
    assert(r.getString(5) === "alpha" && r.getString(6) === "zulu")
    assert(r.getTimestamp(7) === ts(1) && r.getTimestamp(8) === ts(2, 12))
    assert(r.isNullAt(9), "an all-null column's min is null")
    // plan shape: the agg-pushed scan replaces the file scan
    val plan = dsv2(dir).agg(count(lit(1))).queryExecution
      .executedPlan.toString
    assert(plan.contains("agg-pushdown"), s"expected agg-pushdown in:\n$plan")
    // a DAY filter still pushes (day pruning is metadata too)
    val n1 = LakeAggPushdown.pushedAggs.get()
    assert(dsv2(dir).filter(col("day") === "2024-01-02")
      .agg(count(lit(1))).head().getLong(0) === 2L)
    assert(LakeAggPushdown.pushedAggs.get() > n1)
    // min/max(day): answered from the manifest day SET
    val n2 = LakeAggPushdown.pushedAggs.get()
    val d = dsv2(dir).agg(min("day"), max("day")).head()
    assert(d.getDate(0) === java.sql.Date.valueOf("2024-01-01") &&
      d.getDate(1) === java.sql.Date.valueOf("2024-01-02"))
    assert(LakeAggPushdown.pushedAggs.get() > n2)
    // count(col) = rows - nulls from the sidecar null counts: the
    // all-null note column counts 0, src counts 4, day counts rows
    val n3 = LakeAggPushdown.pushedAggs.get()
    val cc = dsv2(dir).agg(count(lit(1)), count(col("note")),
      count(col("src")), count(col("day"))).head()
    assert(cc.toSeq === Seq(4L, 0L, 4L, 4L))
    assert(LakeAggPushdown.pushedAggs.get() > n3,
      "count(col) must be answered from the sidecar null counts")
    // count(DISTINCT col) is NOT stats-answerable — falls back
    val n4 = LakeAggPushdown.pushedAggs.get()
    assert(dsv2(dir).agg(countDistinct(col("src"))).head().getLong(0) === 4L)
    assert(LakeAggPushdown.pushedAggs.get() === n4)
  }

  test("REFUSALS fall back to the true scan: row deltas, deletion " +
    "vectors, residual filters, unsupported functions — and OPTIMIZE " +
    "re-enables the push") {
    val dir = freshDir("refuse")
    seed(dir)
    // a MoR delta: counts now need the fold — push must refuse
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((5L, ts(1), 9.0, "golf", "x")).toDF(
        "event_id", "ts", "value", "src", "note"),
      "event_id", "ts")
    val n0 = LakeAggPushdown.pushedAggs.get()
    assert(dsv2(dir).agg(count(lit(1))).head().getLong(0) === 5L)
    assert(LakeAggPushdown.pushedAggs.get() === n0,
      "a delta-carrying lake must not answer from stats")
    // OPTIMIZE absorbs the delta -> pure base again -> push returns
    LakeSnapshot.compactDays(spark, dir)
    assert(dsv2(dir).agg(count(lit(1))).head().getLong(0) === 5L)
    assert(LakeAggPushdown.pushedAggs.get() > n0,
      "a compacted (pure-base) lake pushes again")
    // a deletion vector: rows subtracted positionally — refuse
    LakeSnapshot.deleteKeysPositional(spark, dir,
      Seq((2L, ts(1))).toDF("event_id", "ts"), "event_id", "ts")
    val n1 = LakeAggPushdown.pushedAggs.get()
    assert(dsv2(dir).agg(count(lit(1))).head().getLong(0) === 4L)
    assert(LakeAggPushdown.pushedAggs.get() === n1,
      "a DV-carrying lake must not answer from stats")
    LakeSnapshot.compactDays(spark, dir)
    // a residual (non-day) filter: the population is filtered — refuse
    val n2 = LakeAggPushdown.pushedAggs.get()
    assert(dsv2(dir).filter(col("value") > 0)
      .agg(count(lit(1))).head().getLong(0) === 4L)
    assert(LakeAggPushdown.pushedAggs.get() === n2,
      "a residual filter must refuse the push")
    // an unsupported function in the mix refuses the WHOLE aggregation
    val n3 = LakeAggPushdown.pushedAggs.get()
    val s = dsv2(dir).agg(count(lit(1)), sum("value")).head()
    assert(s.getLong(0) === 4L)
    assert(LakeAggPushdown.pushedAggs.get() === n3)
    // a NON-day group-by refuses (the KGP grouped plan keeps its path)
    val n4 = LakeAggPushdown.pushedAggs.get()
    assert(dsv2(dir).groupBy("src").agg(count(lit(1))).count() === 4L)
    assert(LakeAggPushdown.pushedAggs.get() === n4)
  }

  test("GROUP BY day pushes: per-day counts and min/max come from the " +
    "sidecars, one row per day, values exact") {
    val dir = freshDir("grouped")
    seed(dir)
    val n0 = LakeAggPushdown.pushedAggs.get()
    val got = dsv2(dir).groupBy("day")
      .agg(count(lit(1)).as("n"), min("event_id").as("lo"),
        max("value").as("hi"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(LakeAggPushdown.pushedAggs.get() > n0,
      "the day-grouped aggregate must be answered from metadata")
    assert(got === Seq(
      ("2024-01-01", 2L, 1L, 1.5), ("2024-01-02", 2L, 3L, 30.0)))
    // min/max(day) inside a day group is the group itself
    val d = dsv2(dir).groupBy("day").agg(min("day"), max("day"))
      .orderBy("day").collect().map(r =>
        (r.getDate(0).toString, r.getDate(1).toString, r.getDate(2).toString))
    assert(d.toSeq === Seq(
      ("2024-01-01", "2024-01-01", "2024-01-01"),
      ("2024-01-02", "2024-01-02", "2024-01-02")))
  }

  test("the SQL catalog surface pushes too (after OPTIMIZE returns the " +
    "table to pure bases — DSv2 INSERTs land as MoR deltas, which " +
    "correctly refuse), and time travel pushes against the pinned " +
    "epoch's sidecars") {
    val root = freshDir("sql")
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", root)
    spark.sql("CREATE TABLE graft.agg1 (event_id BIGINT, ts TIMESTAMP, " +
      "value DOUBLE) TBLPROPERTIES ('key' = 'event_id')")
    spark.sql(s"INSERT INTO graft.agg1 (event_id, ts, value) VALUES " +
      s"(1, TIMESTAMP '${ts(1)}', 1.0), (2, TIMESTAMP '${ts(2)}', 2.0)")
    // the INSERT is a MoR delta: counting needs the fold — no push yet
    val nd = LakeAggPushdown.pushedAggs.get()
    assert(spark.sql("SELECT count(*) FROM graft.agg1")
      .head().getLong(0) === 2L)
    assert(LakeAggPushdown.pushedAggs.get() === nd,
      "a delta-backed catalog table must not answer from stats")
    spark.sql("CALL graft.system.optimize('agg1')")
    val e0 = LakeSnapshot.currentEpoch(spark, s"$root/agg1")
    spark.sql(s"INSERT INTO graft.agg1 (event_id, ts, value) VALUES " +
      s"(3, TIMESTAMP '${ts(3)}', 3.0)")
    spark.sql("CALL graft.system.optimize('agg1')")
    val n0 = LakeAggPushdown.pushedAggs.get()
    assert(spark.sql("SELECT count(*), min(value), max(event_id) " +
      "FROM graft.agg1").head().toSeq === Seq(3L, 1.0, 3L))
    assert(LakeAggPushdown.pushedAggs.get() > n0)
    val n1 = LakeAggPushdown.pushedAggs.get()
    assert(spark.sql(
      s"SELECT count(*) FROM graft.agg1 VERSION AS OF $e0")
      .head().getLong(0) === 2L)
    assert(LakeAggPushdown.pushedAggs.get() > n1,
      "time travel answers from the pinned epoch's sidecars")
  }
}
