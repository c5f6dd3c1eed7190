package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-analytics operators over the `events` stream table — the queries a
  * Snowplow-style pipeline's downstream users actually run: sessionization,
  * funnel conversion, cohort retention. All time math is integer epoch
  * MICROSECONDS (`unix_micros` / DuckDB `epoch_us`) — `events.ts` is
  * µs-exact under its nanos encoding, so both engines see identical
  * integers and no float/rendering parity issues exist.
  *
  * Scale notes: every query is per-user keyed — windows partition by
  * user_id (never unpartitioned), funnel stages are keyed joins on
  * user_id, cohort is two keyed aggregations. Nothing here degrades at
  * 100 TB beyond the shuffles the semantics require.
  */
object EventQueries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  private val SessionGapUs = 1800L * 1000000L // 30 min

  // --- q52: batch sessionization (gaps-and-islands) -------------------------
  // The batch analog of s4's streaming session window: a new session starts
  // after a >30-min silence; session id = running count of session starts
  // per user. One window pass (partitioned by user_id — parallel across
  // users) + one keyed aggregate.
  def q52(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val gap = col("us") - lag(col("us"), 1).over(w)
    e.withColumn("is_start",
        when(gap.isNull || gap > SessionGapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("is_start")).over(wRun))
      .groupBy("user_id", "sid")
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("dur_us"))
      .orderBy("user_id", "sid")
  }

  val q52Sql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
       |), m AS (
       |  SELECT user_id, us,
       |         CASE WHEN lag(us) OVER w IS NULL
       |                OR us - lag(us) OVER w > ${SessionGapUs} THEN 1
       |              ELSE 0 END AS is_start,
       |         event_id
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
       |), s AS (
       |  SELECT user_id, us,
       |         CAST(sum(is_start) OVER (PARTITION BY user_id
       |           ORDER BY us, event_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS BIGINT) AS sid
       |  FROM m)
       |SELECT user_id, sid, count(*) AS n_events,
       |       max(us) - min(us) AS dur_us
       |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin

  // --- q53: funnel conversion (view → click → purchase, strictly ordered) ---
  // Stage k's earliest qualifying timestamp must be strictly after stage
  // k-1's — three keyed min-aggregates chained by per-user joins (Catalyst
  // plans broadcast/SMJ as sizes dictate; no window, no per-row re-scan).
  // Conversion latency is an exact integer sum over completers.
  def q53(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = base.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("v_us"))
    val c = base.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("us") > col("v_us"))
      .groupBy("user_id").agg(min("us").as("c_us"))
    val p = base.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("us") > col("c_us"))
      .groupBy("user_id").agg(min("us").as("p_us"))
    v.join(c.select("user_id", "c_us"), Seq("user_id"), "left")
      .join(p.select("user_id", "p_us"), Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_viewers"),
        count(col("c_us")).as("n_clicked"),
        count(col("p_us")).as("n_purchased"),
        sum(when(col("p_us").isNotNull, col("p_us") - col("v_us")))
          .as("tot_convert_us"))
  }

  val q53Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      |), v AS (
      |  SELECT user_id, min(us) AS v_us FROM e
      |  WHERE event_type = 'view' GROUP BY user_id
      |), c AS (
      |  SELECT e.user_id, min(e.us) AS c_us
      |  FROM e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.us > v.v_us
      |  GROUP BY e.user_id
      |), p AS (
      |  SELECT e.user_id, min(e.us) AS p_us
      |  FROM e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.us > c.c_us
      |  GROUP BY e.user_id)
      |SELECT count(*) AS n_viewers,
      |       count(c.c_us) AS n_clicked,
      |       count(p.p_us) AS n_purchased,
      |       CAST(sum(CASE WHEN p.p_us IS NOT NULL
      |                     THEN p.p_us - v.v_us END) AS BIGINT)
      |         AS tot_convert_us
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin

  // --- q54: cohort retention (first-activity day × day offset) --------------
  // Cohort key and offset are integer epoch DAYS (floor-div of epoch
  // micros — the testdata spans one month, so day granularity is what
  // yields a real cohort triangle). No engine-specific week numbering or
  // timestamp rendering; two keyed aggregations + a distinct count.
  def q54(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("d"))
    val cohort = e.groupBy("user_id").agg(min("d").as("cohort_d"))
    e.join(cohort, "user_id")
      .groupBy(col("cohort_d"), (col("d") - col("cohort_d")).as("offset_d"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy("cohort_d", "offset_d")
  }

  val q54Sql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events
      |), cohort AS (
      |  SELECT user_id, min(d) AS cohort_d FROM e GROUP BY user_id)
      |SELECT c.cohort_d, e.d - c.cohort_d AS offset_d,
      |       count(DISTINCT e.user_id) AS active_users
      |FROM e JOIN cohort c ON e.user_id = c.user_id
      |GROUP BY c.cohort_d, offset_d
      |ORDER BY cohort_d, offset_d""".stripMargin

  val declared: Seq[(String, QFn, Option[String])] = Seq(
    ("q52_sessionize", q52 _, Some(q52Sql)),
    ("q53_funnel", q53 _, Some(q53Sql)),
    ("q54_cohort_retention", q54 _, Some(q54Sql)))
}
