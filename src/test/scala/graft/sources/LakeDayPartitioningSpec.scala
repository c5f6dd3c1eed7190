package graft.sources

import java.nio.file.{Files, Path => JPath, Paths}

import graft.TestSpark
import graft.etl.LakeSnapshot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KeyGroupedPartitioning on `day` (VERDICT r13 #4): the DSv2 scan
  * reports the lake's day layout (SupportsReportPartitioning +
  * HasPartitionKey), so under `spark.sql.sources.v2.bucketing.enabled`
  * a day-grouped aggregation plans with ZERO exchange — the
  * storage-partitioned-aggregate shape that saves a whole shuffle pass
  * at 100 TB. Locked both ways: conf off → the Exchange returns.
  */
class LakeDayPartitioningSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val Conf = "spark.sql.sources.v2.bucketing.enabled"

  private def ts(day: Int, h: Int = 10): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  private def freshLake(name: String): String = {
    val p = Paths.get(s"target/lake_day_part_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    val dir = p.toString
    // 3 days, several files per day (two merges), plus a delta on day 1
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.0), (2L, ts(1), 2.0), (3L, ts(2), 3.0),
        (4L, ts(3), 4.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.merge(spark, dir,
      Seq((5L, ts(1), 5.0), (6L, ts(2), 6.0))
        .toDF("event_id", "ts", "value"), "event_id", "ts")
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((1L, ts(1), 100.0), (7L, ts(1), 7.0))
        .toDF("event_id", "ts", "value"), "event_id", "ts")
    dir
  }

  private def withConf[T](v: String)(body: => T): T = {
    val prior = spark.conf.getOption(Conf)
    spark.conf.set(Conf, v)
    try body
    finally prior match {
      case Some(x) => spark.conf.set(Conf, x)
      case None => spark.conf.unset(Conf)
    }
  }

  private def agg(dir: String) =
    spark.read.format("graft-lake").option("path", dir).load()
      .groupBy("day")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))

  test("day-grouped aggregate plans with ZERO exchange under v2 " +
    "bucketing, and the grouped fold (base files + deltas per day-task) " +
    "is value-identical to the Scala read") {
    val dir = freshLake("zero_exchange")
    val want = LakeSnapshot.read(spark, dir)
      .groupBy("day")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getDouble(2))).toSet
    withConf("true") {
      val df = agg(dir)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected an exchange-free grouped plan, got:\n$plan")
      val got = df.collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getDouble(2))).toSet
      assert(got === want)
      // grouped execution: one task per day
      assert(df.rdd.getNumPartitions === 3)
    }
    // the lock is MEANINGFUL: with the conf off the shuffle returns
    withConf("false") {
      val plan = agg(dir).queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"),
        s"conf off must fall back to the shuffled agg, got:\n$plan")
    }
  }

  test("STORAGE-PARTITIONED JOIN: two lakes joined on day run with zero " +
    "shuffle under v2 bucketing + pushPartValues (mismatched day sets " +
    "included), values exact") {
    val a = freshLake("spj_a")
    val b = freshLake("spj_b")
    // desync the day sets: lake b loses day 3 and gains day 4
    LakeSnapshot.dropDays(spark, b, Seq("2024-01-03"))
    LakeSnapshot.merge(spark, b,
      Seq((40L, ts(4), 40.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val priorBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val priorPush = spark.conf
      .getOption("spark.sql.sources.v2.bucketing.pushPartValues.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    try withConf("true") {
      def lake(dir: String, pfx: String) =
        spark.read.format("graft-lake").option("path", dir).load()
          .select(col("day"), col("event_id").as(s"${pfx}_id"),
            col("value").as(s"${pfx}_v"))
      val joined = lake(a, "a").join(lake(b, "b"), Seq("day"))
        .groupBy("day")
        .agg(count(lit(1)).as("n"), round(sum(col("a_v") + col("b_v")), 2)
          .as("s"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"),
        s"day-equi join of two day-partitioned lakes must not shuffle:\n$plan")
      // oracle: the same join through the Scala read path
      val want = LakeSnapshot.read(spark, a)
        .select(col("day"), col("value").as("a_v"))
        .join(LakeSnapshot.read(spark, b)
          .select(col("day"), col("value").as("b_v")), Seq("day"))
        .groupBy("day")
        .agg(count(lit(1)).as("n"), round(sum(col("a_v") + col("b_v")), 2)
          .as("s"))
        .collect().map(r => (r.getDate(0).toString, r.getLong(1),
          r.getDouble(2))).toSet
      val got = joined.collect().map(r => (r.getDate(0).toString,
        r.getLong(1), r.getDouble(2))).toSet
      assert(got === want && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorBc)
      priorPush match {
        case Some(v) => spark.conf.set(
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled", v)
        case None => spark.conf.unset(
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
      }
    }
  }

  test("a day-pruned projection without `day` still plans (partitioning " +
    "reports unknown, never a resolution error)") {
    val dir = freshLake("no_day")
    withConf("true") {
      val got = spark.read.format("graft-lake").option("path", dir).load()
        .select("event_id", "value").agg(round(sum("value"), 2))
        .as[Double].head()
      assert(got === 127.0) // 100+2+5+7 (day1) + 3+6 (day2) + 4 (day3)
    }
  }

  test("day filters compose with the grouped plan: a pushdown-eligible " +
    "COUNT answers from metadata (r17); a SUM keeps the exchange-free " +
    "KGP scan with pruned days never planning a partition") {
    val dir = freshLake("filtered")
    withConf("true") {
      // count per day over a pure-base lake: the metadata answer WINS
      // over the exchange-free scan (one tiny merge exchange over
      // row-per-day partials beats opening any file)
      val dfc = spark.read.format("graft-lake").option("path", dir).load()
        .filter(col("day") >= lit(java.sql.Date.valueOf("2024-01-02")))
        .groupBy("day").agg(count(lit(1)).as("n"))
      assert(dfc.queryExecution.executedPlan.toString
        .contains("agg-pushdown"))
      assert(dfc.orderBy("day").as[(java.sql.Date, Long)].collect()
        .map { case (d, n) => (d.toString, n) }.toSeq ===
        Seq(("2024-01-02", 2L), ("2024-01-03", 1L)))
      // SUM refuses the pushdown (stats cannot answer it): the grouped
      // KGP scan stays exchange-free and pruned days never plan
      val df = spark.read.format("graft-lake").option("path", dir).load()
        .filter(col("day") >= lit(java.sql.Date.valueOf("2024-01-02")))
        .groupBy("day").agg(round(sum("value"), 2).as("v"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(df.rdd.getNumPartitions === 2)
      assert(df.orderBy("day").as[(java.sql.Date, Double)].collect()
        .map { case (d, v) => (d.toString, v) }.toSeq ===
        Seq(("2024-01-02", 9.0), ("2024-01-03", 4.0)))
    }
  }
}
