package graft.streaming

import java.sql.Timestamp
import java.time.Duration
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, MapState,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger,
  ValueState}

/** Streaming suite S1–S6 (SURVEY.md §2.1-I, §2.2-S).
  *
  * Correctness contract is batch-equivalence: each entry replays the events
  * table as an unbounded file stream (`Trigger.AvailableNow`, one file per
  * micro-batch), runs the streaming computation to completion, and returns
  * the result as a batch DataFrame whose DuckDB oracle is the equivalent
  * batch query over the same events — so the driver's hash gate checks
  * stream == batch directly.
  *
  * Scale notes: all stateful ops are keyed (no global state), watermarks
  * bound state (I2/I8), and the memory sink is test-harness-only — the
  * production sink path is the JDBC upsert (A5, graft.etl).
  *
  * Operator coverage: I1 micro-batch ingest (s1), I2 watermark (s2, s5),
  * I3 tumbling (s2), I4 sliding (s3), I5 session window (s4), I6 streaming
  * dedup (s5), I7 arbitrary state via mapGroupsWithState (s6), I8 late-data
  * semantics via watermark + observe metric (s2), I10 stream–static join
  * (s3). I9 (exactly-once JDBC) lives in the pipeline suite (P3).
  */
object StreamQueries {

  type QFn = (SparkSession, String) => DataFrame

  private val runSeq = new AtomicInteger(0)

  /** (micro-batches, input rows) of the most recent completed replay —
    * engine progress is only reachable from the StreamingQuery handle,
    * which the runners below own, so they record it here for
    * [[graft.StreamBench]]'s rows/s surface (BASELINE.md streaming
    * protocol; VERDICT r5 Missing #4). Runs are sequential per session;
    * volatile covers the harness-thread handoff. */
  @volatile private[graft] var lastReplay: (Long, Long) = (0L, 0L)

  private def recordReplay(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val prog = q.recentProgress
    lastReplay = (prog.length.toLong, prog.map(_.numInputRows).sum)
  }

  /** Run a streaming DF to completion (AvailableNow) into a memory sink and
    * return the sink contents as a batch DataFrame. Fresh checkpoint per
    * run → deterministic full replay.
    */
  private def runToTable(
      spark: SparkSession,
      stream: DataFrame,
      name: String,
      sfDir: String,
      mode: OutputMode): DataFrame = {
    val table = s"${name}_${runSeq.incrementAndGet()}"
    val q = stream.writeStream
      .format("memory")
      .queryName(table)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", StreamInput.freshCheckpoint(name, sfDir))
      .start()
    q.awaitTermination()
    recordReplay(q)
    spark.table(table)
  }

  // --- S1: micro-batch ingest replay (I1, A6) ------------------------------
  // Count + value checksum over the full replay; complete-mode aggregation.
  def s1(spark: SparkSession, sfDir: String): DataFrame = {
    val in = StreamInput.readEventsStream(spark, StreamInput.eventsDir(spark, sfDir))
    val agg = in.agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
    runToTable(spark, agg, "s1_ingest", sfDir, OutputMode.Complete())
  }

  val s1Sql: String =
    "SELECT count(*) AS n, round(sum(value),2) AS v FROM events"

  // --- S2: tumbling 1-hour window + watermark (I2, I3, I8) -----------------
  // Complete mode so the stream's final answer covers every window (append
  // mode would hold back windows newer than the final watermark — the
  // documented late-data semantics; the watermark still bounds state).
  // `observe` hangs a row-count metric on the stream (I8 metric surface).
  def s2(spark: SparkSession, sfDir: String): DataFrame = {
    val in = StreamInput.readEventsStream(spark, StreamInput.eventsDir(spark, sfDir))
    val agg = in
      .observe("s2_metrics", count(lit(1)).as("rows_seen"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      // window start as µs BIGINT, not TIMESTAMP (§2.3 rule 8)
      .select(unix_micros(col("window.start")).as("h"),
        col("event_type"), col("n"), col("v"))
    runToTable(spark, agg, "s2_tumbling", sfDir, OutputMode.Complete())
      .orderBy("h", "event_type")
  }

  val s2Sql: String =
    """SELECT epoch_us(date_trunc('hour', ts)) AS h, event_type,
      |       count(*) AS n, round(sum(value),2) AS v
      |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  // --- S3: sliding window over a stream–static join (I4, I10) --------------
  // The static side is a tiny dim joined broadcast-style into the stream
  // before the windowed aggregation.
  private def categoryDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("click", "engagement"), ("view", "engagement"),
      ("purchase", "conversion"), ("signup", "conversion"),
      ("error", "ops")
    ).toDF("event_type", "category")
  }

  def s3(spark: SparkSession, sfDir: String): DataFrame = {
    val in = StreamInput.readEventsStream(spark, StreamInput.eventsDir(spark, sfDir))
    val joined = in.join(broadcast(categoryDim(spark)), Seq("event_type"))
    val agg = joined
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("category"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      // window start as µs BIGINT, not TIMESTAMP (§2.3 rule 8)
      .select(unix_micros(col("window.start")).as("w_start"),
        col("category"), col("n"), col("v"))
    runToTable(spark, agg, "s3_sliding", sfDir, OutputMode.Complete())
      .orderBy("w_start", "category")
  }

  // Each event falls in exactly two 10-min/5-min-slide windows: the one
  // starting at floor5(ts) and the one 5 minutes earlier.
  val s3Sql: String =
    """SELECT ws AS w_start, category, count(*) AS n, round(sum(value),2) AS v
      |FROM (
      |  SELECT CAST(unnest([floor(epoch(ts)/300)*300*1000000,
      |                      (floor(epoch(ts)/300)*300 - 300)*1000000]) AS BIGINT) AS ws,
      |         CASE WHEN event_type IN ('click','view') THEN 'engagement'
      |              WHEN event_type IN ('purchase','signup') THEN 'conversion'
      |              ELSE 'ops' END AS category,
      |         value
      |  FROM events)
      |GROUP BY ws, category ORDER BY ws, category""".stripMargin

  // --- S4: session windows, 30-minute gap (I5) -----------------------------
  def s4(spark: SparkSession, sfDir: String): DataFrame = {
    val in = StreamInput.readEventsStream(spark, StreamInput.eventsDir(spark, sfDir))
    val agg = in
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .select(
        // session start as µs BIGINT, not TIMESTAMP (§2.3 rule 8)
        unix_micros(col("session_window.start")).as("s_start"),
        col("user_id"), col("n"), col("v"))
    runToTable(spark, agg, "s4_session", sfDir, OutputMode.Complete())
      .orderBy("user_id", "s_start")
  }

  // Batch sessionization: lag-gap flag → running session id → group.
  val s4Sql: String =
    """SELECT epoch_us(CAST(min(ts) AS TIMESTAMP)) AS s_start, user_id,
      |       count(*) AS n, round(sum(value),2) AS v
      |FROM (
      |  SELECT user_id, ts, value,
      |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM (
      |    SELECT user_id, ts, value, event_id,
      |           -- >= not >: Spark session_window is half-open [ts, ts+gap),
      |           -- so a gap of exactly 30 min starts a NEW session (ADVICE r2)
      |           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                     IS NULL
      |                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                     >= INTERVAL 30 MINUTE
      |                THEN 1 ELSE 0 END AS new_sess
      |    FROM events))
      |GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin

  // --- S5: streaming dedup within watermark (I2, I6, J5) -------------------
  // Input carries ~5% duplicated rows; dedup restores the original table, so
  // the oracle is the plain batch aggregate over events.
  def s5(spark: SparkSession, sfDir: String): DataFrame = {
    val in = StreamInput.readEventsStream(spark, StreamInput.eventsDupDir(spark, sfDir))
    val deduped = in
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val unique = runToTable(spark, deduped, "s5_dedup", sfDir, OutputMode.Append())
    unique.agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
  }

  val s5Sql: String =
    "SELECT count(*) AS n, round(sum(value),2) AS v FROM events"

  // --- S6: arbitrary keyed state via mapGroupsWithState (I7) ---------------
  // Per-user running (count, value-sum) state emitted in Update mode; each
  // update for a key strictly increases `n`, so the final state per user is
  // the max-`n` row in the sink — batch-equivalent to GROUP BY user_id.
  def s6(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val in = StreamInput.readEventsStream(spark, StreamInput.eventsDir(spark, sfDir))
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]

    val updates = in
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        case (user: Long, rows: Iterator[(Long, Double)],
              state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var v = v0
          rows.foreach { r => n += 1; v += r._2 }
          state.update((n, v))
          (user, n, v)
      }
      .toDF("user_id", "n", "v")

    val sink = runToTable(spark, updates, "s6_state", sfDir, OutputMode.Update())
    val latest = Window.partitionBy("user_id").orderBy(col("n").desc)
    sink.withColumn("rn", row_number().over(latest))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("n"), round(col("v"), 2).as("v"))
      .orderBy("user_id")
  }

  val s6Sql: String =
    """SELECT user_id, count(*) AS n, round(sum(value),2) AS v
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // --- S6b: transformWithState — I7's named API, with a state TTL ----------
  // Same per-user running (count, sum) as s6, re-expressed on the modern
  // arbitrary-state API (Spark 4 StatefulProcessor): typed ValueState with a
  // processing-time TTL (SURVEY §4's bounded-state rule — abandoned keys
  // expire instead of accreting forever), RocksDB state store (the provider
  // the API requires; also the one a 100 TB deployment would run for
  // larger-than-heap state). Batch-equivalence oracle identical to s6.
  private class RunningAgg
      extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    @transient private var state: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)]("agg",
        Encoders.product[(Long, Double)], TTLConfig(Duration.ofHours(1)))

    override def handleInputRows(
        user: Long,
        rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      val (n0, v0) = if (state.exists()) state.get() else (0L, 0.0)
      var n = n0; var v = v0
      rows.foreach { r => n += 1; v += r._2 }
      state.update((n, v))
      Iterator.single((user, n, v))
    }
  }

  /** Run an Update-mode stream until its source is DRAINED, then stop.
    *
    * A processing-time stateful operator (TWS with TTL) reports
    * `shouldRunAnotherBatch = true` on every batch — timers could expire at
    * any wall-clock instant — so `Trigger.AvailableNow` alone never
    * terminates: the engine loops zero-input batches forever after the file
    * list is exhausted (observed: 2 290 empty batches at a pinned
    * logOffset). Replay-to-completion therefore polls progress and stops
    * the query at the first zero-input batch, which by AvailableNow's
    * prepared file list implies every data batch has committed. Empty
    * batches emit no Update rows, so the sink contents are identical to
    * the pure-replay runs.
    */
  private[streaming] def runToTableUntilDrained(
      spark: SparkSession,
      stream: DataFrame,
      name: String,
      sfDir: String): DataFrame = {
    val table = s"${name}_${runSeq.incrementAndGet()}"
    val q = stream.writeStream
      .format("memory")
      .queryName(table)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", StreamInput.freshCheckpoint(name, sfDir))
      .start()
    try {
      val deadline = System.currentTimeMillis() + 120000L
      while (q.isActive && System.currentTimeMillis() < deadline &&
          !q.recentProgress.exists(_.numInputRows == 0))
        Thread.sleep(50)
      // A partial sink table would surface later as a confusing oracle
      // mismatch; fail loudly at the source instead (ADVICE r3).
      if (q.isActive && !q.recentProgress.exists(_.numInputRows == 0))
        throw new IllegalStateException(
          s"stream '$name' did not drain within 120 s " +
            s"(last progress: ${q.recentProgress.lastOption.fold("none")(_.numInputRows.toString)} input rows)")
    } finally if (q.isActive) q.stop()
    q.awaitTermination()
    recordReplay(q)
    spark.table(table)
  }

  def s6b(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = StreamInput.readEventsStream(spark, StreamInput.eventsDir(spark, sfDir))
        .select(col("user_id"), col("value"))
        .as[(Long, Double)]

      val updates = in
        .groupByKey(_._1)
        .transformWithState(new RunningAgg,
          TimeMode.ProcessingTime(), OutputMode.Update())
        .toDF("user_id", "n", "v")

      val sink = runToTableUntilDrained(spark, updates, "s6b_tws", sfDir)
      val latest = Window.partitionBy("user_id").orderBy(col("n").desc)
      sink.withColumn("rn", row_number().over(latest))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("n"), round(col("v"), 2).as("v"))
        .orderBy("user_id")
    } finally prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None    => spark.conf.unset(providerKey)
    }
  }

  // --- S7: composite keyed state via MapState (I7 state-type depth) --------
  // Per-user map event_type → running count: the state shape silvia's
  // per-entity enrichments use (one composite value per sub-key, updated
  // incrementally, point-readable without deserializing the whole map —
  // which is exactly what MapState-on-RocksDB gives at 100 TB state sizes,
  // vs. a ValueState[Map] that rewrites the full map per update).
  private class PerTypeCounts
      extends StatefulProcessor[Long, (Long, String), (Long, String, Long)] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        rows: Iterator[(Long, String)],
        timerValues: TimerValues): Iterator[(Long, String, Long)] = {
      val batchAdds = rows.foldLeft(Map.empty[String, Long]) {
        case (m, (_, t)) => m.updated(t, m.getOrElse(t, 0L) + 1L)
      }
      batchAdds.iterator.map { case (t, add) =>
        val n = (if (counts.containsKey(t)) counts.getValue(t) else 0L) + add
        counts.updateValue(t, n)
        (user, t, n)
      }
    }
  }

  def s7(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = StreamInput.readEventsStream(spark, StreamInput.eventsDir(spark, sfDir))
        .select(col("user_id"), col("event_type"))
        .as[(Long, String)]

      val updates = in
        .groupByKey(_._1)
        .transformWithState(new PerTypeCounts, TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "event_type", "n")

      val sink = runToTableUntilDrained(spark, updates, "s7_mapstate", sfDir)
      val latest = Window.partitionBy("user_id", "event_type").orderBy(col("n").desc)
      sink.withColumn("rn", row_number().over(latest))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("n"))
        .orderBy("user_id", "event_type")
    } finally prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None    => spark.conf.unset(providerKey)
    }
  }

  val s7Sql: String =
    """SELECT user_id, event_type, count(*) AS n
      |FROM events GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  // --- S8: stream–stream join (click → purchase within 10 min) -------------
  // The one join family S1–S7 left uncovered: BOTH sides unbounded, joined
  // on an equi-key plus an event-time band. Watermarks on both sides let
  // the engine evict buffered rows once they can no longer match (state is
  // bounded by key × 20 min of events — the same band-join shape q8 runs
  // in batch). Inner joins emit eagerly on match, so the append-mode sink
  // after a full AvailableNow replay holds exactly the batch join; the
  // post-sink aggregation is batch-side, keeping the streaming operator
  // under test the join itself. Oracle = q8's SQL (stream == batch).
  def s8(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = StreamInput.eventsDir(spark, sfDir)
    val clicks = StreamInput.readEventsStream(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("a_ts"))
      .withWatermark("a_ts", "10 minutes")
    val purchases = StreamInput.readEventsStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"))
      .withWatermark("b_ts", "10 minutes")
    val joined = clicks.join(purchases,
      col("user_id") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES"))
    runToTable(spark, joined, "s8_ss_join", sfDir, OutputMode.Append())
      .groupBy("user_id")
      .agg(count(lit(1)).as("pairs"))
      .orderBy("user_id")
  }

  // --- S9: stream-stream LEFT OUTER join (I10, outer variant) --------------
  // Same click→purchase band as s8, but unmatched clicks must ALSO emit —
  // which only happens once the watermark passes a click's join horizon
  // (state eviction produces the null-match row). The GLOBAL watermark is
  // min over both sides of (side's max event time − 10 min delay), and a
  // click is only guaranteed resolved when its horizon a_ts + 10 min lies
  // strictly below it — so the deterministic contract scores only clicks
  // STRICTLY more than delay+window = 20 minutes before
  // least(max click ts, max purchase ts), and the batch oracle applies the
  // identical cutoff. (First cut used max over ALL events and <=; one
  // boundary row flaked s10 — the per-side minimum and strictness matter.)
  def s9(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = StreamInput.eventsDir(spark, sfDir)
    val clicks = StreamInput.readEventsStream(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("a_ts"))
      .withWatermark("a_ts", "10 minutes")
    val purchases = StreamInput.readEventsStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"))
      .withWatermark("b_ts", "10 minutes")
    val joined = clicks.join(purchases,
      col("user_id") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
    runToTable(spark, joined, "s9_ss_left_join", sfDir, OutputMode.Append())
      .crossJoin(watermarkCutoff(spark, sfDir))
      .filter(col("a_ts") < col("c"))
      .groupBy("user_id")
      .agg(
        count(col("b_ts")).as("purchased"),
        count(when(col("b_ts").isNull, 1)).as("no_purchase"))
      .orderBy("user_id")
  }

  /** Resolution cutoff for the outer stream-stream joins: rows strictly
    * older than least(max click ts, max purchase ts) − (delay + window)
    * are guaranteed matched-or-evicted by the final watermark.
    */
  private def watermarkCutoff(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.load(spark, sfDir, "events")
      .agg((least(
        max(when(col("event_type") === "click", col("ts"))),
        max(when(col("event_type") === "purchase", col("ts"))))
        - expr("INTERVAL 20 MINUTES")).as("c"))

  private val cutoffSql: String =
    """SELECT least(max(ts) FILTER (WHERE event_type = 'click'),
      |             max(ts) FILTER (WHERE event_type = 'purchase'))
      |       - INTERVAL 20 MINUTE AS c FROM events""".stripMargin

  val s9Sql: String =
    s"""WITH clicks AS (
      |  SELECT user_id, ts AS a_ts FROM events WHERE event_type = 'click'
      |), purchases AS (
      |  SELECT user_id AS b_user, ts AS b_ts FROM events WHERE event_type = 'purchase'
      |), cutoff AS (
      |  $cutoffSql
      |)
      |SELECT c.user_id,
      |       count(p.b_ts) AS purchased,
      |       count(*) FILTER (WHERE p.b_ts IS NULL) AS no_purchase
      |FROM clicks c
      |LEFT JOIN purchases p ON p.b_user = c.user_id
      |  AND p.b_ts > c.a_ts AND p.b_ts <= c.a_ts + INTERVAL 10 MINUTE
      |CROSS JOIN cutoff
      |WHERE c.a_ts < cutoff.c
      |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin

  // --- S10: stream-stream FULL OUTER join (I10, completes the family) ------
  // Both sides emit unmatched rows on state eviction; the 20-minute cutoff
  // (watermark delay + join window) bounds the undetermined tail on BOTH
  // sides — a click's horizon is a_ts + window, a purchase's is b_ts.
  def s10(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = StreamInput.eventsDir(spark, sfDir)
    val clicks = StreamInput.readEventsStream(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("a_user"), col("ts").as("a_ts"))
      .withWatermark("a_ts", "10 minutes")
    val purchases = StreamInput.readEventsStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"))
      .withWatermark("b_ts", "10 minutes")
    val joined = clicks.join(purchases,
      col("a_user") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES"),
      "full_outer")
    runToTable(spark, joined, "s10_ss_full_join", sfDir, OutputMode.Append())
      .crossJoin(watermarkCutoff(spark, sfDir))
      .filter(coalesce(col("a_ts"), col("b_ts")) < col("c"))
      .agg(
        count(when(col("a_ts").isNotNull && col("b_ts").isNotNull, 1)).as("pairs"),
        count(when(col("b_ts").isNull, 1)).as("unmatched_clicks"),
        count(when(col("a_ts").isNull, 1)).as("unmatched_purchases"))
  }

  val s10Sql: String =
    s"""WITH clicks AS (
      |  SELECT user_id AS a_user, ts AS a_ts FROM events WHERE event_type = 'click'
      |), purchases AS (
      |  SELECT user_id AS b_user, ts AS b_ts FROM events WHERE event_type = 'purchase'
      |), cutoff AS (
      |  $cutoffSql
      |)
      |SELECT count(*) FILTER (WHERE a_ts IS NOT NULL AND b_ts IS NOT NULL) AS pairs,
      |       count(*) FILTER (WHERE b_ts IS NULL) AS unmatched_clicks,
      |       count(*) FILTER (WHERE a_ts IS NULL) AS unmatched_purchases
      |FROM clicks c
      |FULL OUTER JOIN purchases p ON p.b_user = c.a_user
      |  AND p.b_ts > c.a_ts AND p.b_ts <= c.a_ts + INTERVAL 10 MINUTE
      |CROSS JOIN cutoff
      |WHERE coalesce(a_ts, b_ts) < cutoff.c""".stripMargin

  // --- S11: streaming load into a day-partitioned lake (I1 + A8 + §4) ------
  // The production ingest shape p9 demonstrates in batch: each micro-batch
  // lands via foreachBatch with partitionOverwriteMode=dynamic, rewriting
  // ONLY the day partitions it carries. The replay input is DAY-ALIGNED
  // ([[StreamInput.eventsByDayAlignedDir]]) — whole days per file — which
  // is exactly the alignment that makes per-batch dynamic overwrite
  // idempotent under re-delivery (a replayed batch rewrites its own
  // partitions; nothing appends, nothing else is touched). The oracle
  // aggregates the final lake per day against the full events table, so a
  // split day (undercount) or a re-appended one (overcount) both fail.
  def s11(spark: SparkSession, sfDir: String): DataFrame = {
    val outDir = StreamInput.lakeDir("s11_lake", sfDir)
    val in = StreamInput.readEventsStream(
      spark, StreamInput.eventsByDayAlignedDir(spark, sfDir))
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try {
      val q = in.withColumn("day", to_date(col("ts")))
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").partitionBy("day").parquet(outDir)
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          StreamInput.freshCheckpoint("s11_lake", sfDir))
        .start()
      q.awaitTermination()
      recordReplay(q)
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
    spark.read.parquet(outDir)
      .groupBy("day")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("day")
  }

  val s11Sql: String =
    """SELECT CAST(ts AS DATE) AS day, count(*) AS n, round(sum(value),2) AS v
      |FROM events GROUP BY day ORDER BY day""".stripMargin

  // --- S12: append-mode lake load + small-files compaction -----------------
  // The OTHER production ingest shape (s11 is per-batch dynamic overwrite
  // over day-aligned input): plain append, where every micro-batch lands
  // one file in every day partition it carries. Over a sharded arrival
  // replay (6 batches, each holding rows from every day) this builds the
  // textbook small-files problem — 6 files per day — which
  // [[graft.etl.LakeCompaction]] then rewrites to target-size files,
  // reading ONLY oversized partitions and touching nothing else. The
  // oracle re-aggregates the compacted lake per day against the batch
  // events table, so compaction that loses, duplicates, or cross-writes a
  // row fails the hash; `compacted_ok` additionally pins that (a) the
  // pre-compaction lake really had the multi-file problem and (b) every
  // partition ended at its size-derived target file count. Exactly-once
  // here comes from the single AvailableNow run over a fresh checkpoint
  // (append is NOT redelivery-idempotent — that trade is s11's subject;
  // compaction is this one's).
  def s12(spark: SparkSession, sfDir: String): DataFrame = {
    val outDir = StreamInput.lakeDir("s12_lake", sfDir)
    val in = StreamInput.readEventsStream(
      spark, StreamInput.eventsShardedDir(spark, sfDir))
    val q = in.withColumn("day", to_date(col("ts")))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").partitionBy("day").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        StreamInput.freshCheckpoint("s12_lake", sfDir))
      .start()
    q.awaitTermination()
    recordReplay(q)
    val target = 256L << 20 // production-sized files; toy days compact to 1
    val (before, after) =
      graft.etl.LakeCompaction.compactDayPartitions(spark, outDir, "day", target)
    val afterByDir = after.map(p => p.dir -> p).toMap
    // Per-partition invariant (shape-robust, not toy-tuned): a compacted
    // partition ends at OR UNDER its size-derived target ((day,bucket)
    // task-hash collisions can only merge files), an untouched partition
    // is bit-unchanged. Map.get keeps a vanished partition a reported
    // `false`, never an exception.
    val compactedOk = before.nonEmpty &&
      before.exists(_.needsCompaction(target)) && // the problem existed
      before.forall { b =>
        afterByDir.get(b.dir).exists { a =>
          a.bytes > 0 &&
            (if (b.needsCompaction(target))
              a.files <= b.targetFiles(target) && a.files < b.files
            else a.files == b.files && a.bytes == b.bytes)
        }
      }
    spark.read.parquet(outDir)
      .groupBy("day")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .withColumn("compacted_ok", lit(compactedOk))
      .orderBy("day")
  }

  val s12Sql: String =
    """SELECT CAST(ts AS DATE) AS day, count(*) AS n, round(sum(value),2) AS v,
      |       TRUE AS compacted_ok
      |FROM events GROUP BY day ORDER BY day""".stripMargin

  // --- S13: heavy hitters INSIDE a streaming windowed aggregation ----------
  // The approximate-monitoring pattern at 100 TB: you cannot keep exact
  // per-key counts per window in stream state, so a mergeable sketch rides
  // the aggregation. The Misra–Gries TypedImperativeAggregate (k14's
  // operator) runs inside the per-hour streaming window — ≤ k counters of
  // state per window, any merge order — over a planted hot term (30% of
  // events; the bot-user shape). The gate leans on MG's DETERMINISTIC
  // guarantee: every term with freq > n/k MUST be in the sketch, whatever
  // the micro-batch cut points did to merge order. Per window the streamed
  // sketch is audited against exact batch counts Spark-side (the k15
  // recompute-exactly pattern); the oracle re-derives n and the exact
  // heavy-hitter count per hour and pins the guarantee booleans.
  def s13(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 8
    val hot = (c: org.apache.spark.sql.Column) =>
      when(c % 10 < 3, lit("hot")).otherwise(c.cast("string"))
    val in = StreamInput.readEventsStream(spark, StreamInput.eventsDir(spark, sfDir))
    val agg = in
      .withColumn("term", hot(col("user_id")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.GraftFunctions.mg_topk(col("term"), k).as("sk"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("h"), col("sk"), col("n"))
    val streamed = runToTable(spark, agg, "s13_mg", sfDir, OutputMode.Complete())
      .localCheckpoint(true) // referenced 3x below (flags, terms, sizes)

    // exact per-window audit off the batch table
    val exact = graft.Tables.load(spark, sfDir, "events")
      .select(date_trunc("hour", col("ts")).as("h"), hot(col("user_id")).as("term"))
      .groupBy("h", "term").agg(count(lit(1)).as("cnt"))
    val heavy = exact.join(streamed.select(col("h"), col("n")), Seq("h"))
      .filter(col("cnt") * k > col("n"))
    val skTerms = streamed
      .select(col("h"), explode(col("sk")).as("e"))
      .select(col("h"), col("e.term").as("term"))
    val missingPerH = heavy
      .join(skTerms, Seq("h", "term"), "left_anti")
      .groupBy("h").agg(count(lit(1)).as("n_missing"))
    val heavyPerH = heavy.groupBy("h").agg(count(lit(1)).as("n_heavy"))
    streamed
      .join(heavyPerH, Seq("h"), "left")
      .join(missingPerH, Seq("h"), "left")
      .select(
        // window start as µs BIGINT, not TIMESTAMP (§2.3 rule 8); the
        // h-keyed joins above stay timestamp-typed — only the dump converts
        unix_micros(col("h")).as("h"),
        col("n"),
        coalesce(col("n_heavy"), lit(0L)).as("n_heavy"),
        (coalesce(col("n_missing"), lit(0L)) === 0L).as("all_heavy_present"),
        (size(col("sk")) <= k).as("size_ok"))
      .orderBy(col("h"))
  }

  val s13Sql: String =
    """WITH t AS (
      |  SELECT date_trunc('hour', ts) AS h,
      |         CASE WHEN user_id % 10 < 3 THEN 'hot'
      |              ELSE CAST(user_id AS VARCHAR) END AS term
      |  FROM events
      |), per AS (
      |  SELECT h, term, count(*) AS cnt FROM t GROUP BY h, term
      |), tot AS (
      |  SELECT h, CAST(sum(cnt) AS BIGINT) AS n FROM per GROUP BY h
      |)
      |SELECT epoch_us(tot.h) AS h, tot.n,
      |       CAST(count(*) FILTER (WHERE per.cnt * 8 > tot.n) AS BIGINT)
      |         AS n_heavy,
      |       TRUE AS all_heavy_present,
      |       TRUE AS size_ok
      |FROM tot JOIN per ON per.h = tot.h
      |GROUP BY tot.h, tot.n ORDER BY tot.h""".stripMargin

  // --- S14: streaming ingest composed with incremental near-dedup ----------
  // The production cross-batch dedup loop (VERDICT r8 next-round #3): the
  // k19 batch arrives as a STREAM, and every micro-batch is probed against
  // the persisted [[graft.ops.IncrementalDedup]] index and then folded into
  // it — so batch N's docs pair against corpus ∪ batches 1..N−1 without
  // ever re-reading corpus text. Both halves of the loop are idempotent
  // under redelivery (a crash between the index commit and the stream's
  // checkpoint commit replays the batch): the pair output re-lands by
  // overwriting its own `batch=<id>` directory, and the index append is a
  // manifest-tag no-op. The union of per-batch probe outputs equals the
  // one-shot k19 probe over the whole batch — every pair with ≥ 1 streamed
  // endpoint is found exactly once, whatever the micro-batch cut points —
  // so s14 shares k19's DuckDB oracle verbatim (the s6b precedent), and
  // StreamIncDedupSpec additionally locks a restart-from-checkpoint
  // mid-sequence onto the same result.
  /** One micro-batch of the loop: probe, land pairs, fold in. Factored out
    * so the restart spec drives the PRODUCTION body through its own
    * stop/restart schedule.
    */
  def dedupMicroBatch(idxDir: String, pairsDir: String)(
      batch: DataFrame, id: Long): Unit = {
    // excludeTag = this batch's own tag: a REDELIVERED batch whose append
    // already committed must probe the index as of before that append, or
    // it would match against itself and overwrite its pair output with a
    // polluted set (StreamIncDedupSpec caught exactly that).
    val pairs = graft.ops.IncrementalDedup.incrementalPairs(
      batch.sparkSession, idxDir, batch, "doc_id", "text", threshold = 0.8,
      excludeTag = s"b$id")
    pairs.write.mode("overwrite").parquet(s"$pairsDir/batch=$id")
    graft.ops.IncrementalDedup.appendToIndex(
      batch, "doc_id", "text", idxDir, tag = s"b$id")
  }

  def s14(spark: SparkSession, sfDir: String): DataFrame = {
    val (corpus, _) = graft.ops.KQueries.incDedupFixture(spark, sfDir)
    val idxDir = StreamInput.lakeDir("s14_index", sfDir)
    graft.ops.IncrementalDedup.buildIndex(corpus, "doc_id", "text", idxDir)
    val pairsDir = StreamInput.lakeDir("s14_pairs", sfDir)
    val in = StreamInput.readEventsStream(
      spark, StreamInput.docsBatchDir(spark, sfDir))
    val q = in.writeStream
      .foreachBatch(dedupMicroBatch(idxDir, pairsDir) _)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", StreamInput.freshCheckpoint("s14", sfDir))
      .start()
    q.awaitTermination()
    recordReplay(q)
    graft.ops.KQueries.incPairStats(
      spark.read.parquet(pairsDir).select("id_a", "id_b", "jaccard"))
  }

  // --- S15: streaming ingest composed with incremental VECTOR near-dedup ---
  // s14's production loop on the embedding path: each micro-batch of the
  // k21 vector batch is probed against the persisted sign-LSH cosine index
  // ([[graft.ops.Similarity.incrementalCosinePairs]]) and folded in via a
  // tagged [[graft.ops.Similarity.appendToCosineIndex]]. Identical
  // redelivery contract to s14 — pair output overwrites its own
  // `batch=<id>` dir, the append is a manifest-tag no-op, and the probe
  // excludes its own tag's epochs so a replayed batch reproduces its
  // first-delivery view. Within-set pairs across micro-batches are found
  // through the index at exact-bucket, precisely the pairs the one-shot
  // k21 probe finds via its within-batch arm, so the per-batch union
  // equals the one-shot k21 output and s15 shares k21's DuckDB oracle
  // verbatim (the s14/k19 precedent).
  def vecDedupMicroBatch(idxDir: String, pairsDir: String)(
      batch: DataFrame, id: Long): Unit = {
    val pairs = graft.ops.Similarity.incrementalCosinePairs(
      batch.sparkSession, idxDir, batch, "vec_id", "embedding",
      threshold = 0.95, excludeTag = s"b$id")
    pairs.write.mode("overwrite").parquet(s"$pairsDir/batch=$id")
    graft.ops.Similarity.appendToCosineIndex(
      batch, "vec_id", "embedding", idxDir, tag = s"b$id")
  }

  def s15(spark: SparkSession, sfDir: String): DataFrame = {
    val (corpus, _) = graft.ops.KQueries.vecDedupFixture(spark, sfDir)
    val idxDir = StreamInput.lakeDir("s15_index", sfDir)
    graft.ops.Similarity.buildCosineIndex(
      corpus, "vec_id", "embedding", idxDir)
    val pairsDir = StreamInput.lakeDir("s15_pairs", sfDir)
    val in = StreamInput.readEventsStream(
      spark, StreamInput.vecsBatchDir(spark, sfDir))
    val q = in.writeStream
      .foreachBatch(vecDedupMicroBatch(idxDir, pairsDir) _)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", StreamInput.freshCheckpoint("s15", sfDir))
      .start()
    q.awaitTermination()
    recordReplay(q)
    graft.ops.KQueries.vecPairStats(
      spark.read.parquet(pairsDir).select("id_a", "id_b", "cos"))
  }

  // --- S16: streaming ingest composed with incremental CORPUS PREP ---------
  // The k26 production loop under a stream: history is summarized once
  // into the persisted prep state, the window's benchmark docs are
  // registered out-of-band (benchmark sets are reference data — eval
  // suites delivered AHEAD of the corpus; decontamination is against the
  // set as of processing time), and then every micro-batch runs the FULL
  // k20 chain through [[graft.ops.CorpusPrep.prepareBatch]] and is folded
  // into the state. Micro-batches arrive in id order (range files +
  // staggered mtimes; prepareBatch fails loudly otherwise), so each
  // doc's smaller-id precedence surface — history ∪ earlier batches ∪
  // its own batch — is complete when it is judged, and the union of
  // per-batch cleaned outputs equals the one-shot chain on hist ∪ batch
  // restricted to batch ids: s16 shares k26's DuckDB oracle verbatim
  // (the s14/k19 precedent, lifted to the whole composed pipeline).
  // Redelivery contract as s14: cleaned output overwrites its own
  // `batch=<id>` dir, the state append is a manifest-tag no-op, and
  // prepareBatch excludes its own tag on all three state surfaces
  // (membership, probe, high-water mark).
  def prepMicroBatch(stateDir: String, cleanedDir: String)(
      batch: DataFrame, id: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    graft.ops.CorpusPrep.prepareBatch(
        spark, stateDir, batch, excludeTag = s"b$id")
      .write.mode("overwrite").parquet(s"$cleanedDir/batch=$id")
    graft.ops.CorpusPrep.appendBatchToState(
      spark, stateDir, batch, tag = s"b$id")
  }

  def s16(spark: SparkSession, sfDir: String): DataFrame = {
    val (hist, batch) = graft.ops.KQueries.incPrepFixture(spark, sfDir)
    val stateDir = StreamInput.lakeDir("s16_state", sfDir)
    graft.ops.CorpusPrep.buildPrepState(hist, stateDir)
    graft.ops.CorpusPrep.appendBenchToState(spark, stateDir, batch)
    val cleanedDir = StreamInput.lakeDir("s16_cleaned", sfDir)
    val in = StreamInput.readEventsStream(
      spark, StreamInput.prepBatchDir(spark, sfDir))
    val q = in.writeStream
      .foreachBatch(prepMicroBatch(stateDir, cleanedDir) _)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", StreamInput.freshCheckpoint("s16", sfDir))
      .start()
    q.awaitTermination()
    recordReplay(q)
    graft.ops.CorpusPrep.stats(spark.read.parquet(cleanedDir)
      .select("doc_id", "lang", "txt"))
  }

  // ------------------------------------------------------------------------
  // --- S17: streaming IVF index ingest (s15's loop for the ANN tier) -------
  // Micro-batches of the odd corpus half (+ the planted query copy) fold
  // into the PERSISTED IVF index via tagged appendToIvfIndex: assignment
  // uses the STORED fixed centroids (never a refit), the epoch claim keeps
  // writers disjoint, and a redelivered batch is a manifest-tag no-op. The
  // even half seeds the index before the stream, so the final index
  // population is exactly k3d's and the closing audit probe shares
  // k3IvfSql verbatim (the s14/s15 oracle-sharing precedent).
  def s17(spark: SparkSession, sfDir: String): DataFrame = {
    val (q, corpus, centroids) = graft.ops.KQueries.ivfFixture(spark, sfDir)
    val idxDir = StreamInput.lakeDir("s17_index", sfDir)
    graft.ops.Similarity.saveIvfIndex(
      graft.ops.Similarity.ivfBuildFixed(
        corpus.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        centroids),
      idxDir)
    val in = StreamInput.readEventsStream(
      spark, StreamInput.ivfBatchDir(spark, sfDir))
    val query = in.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.ops.Similarity.appendToIvfIndex(
          batch.select("vec_id", "embedding"), "vec_id", "embedding",
          idxDir, tag = s"b$id")
        () // appendToIvfIndex now returns the committed epoch
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", StreamInput.freshCheckpoint("s17", sfDir))
      .start()
    query.awaitTermination()
    recordReplay(query)
    graft.ops.KQueries.ivfPersistedAuditFacts(spark, idxDir, q)
  }

  /** s18: streaming span-index ingest (the s17 shape on the FOURTH index
    * kind): the k34 corpus arrives as 4 micro-batches, each folded into
    * the persisted span-hash index by a claim-guarded, tag-idempotent
    * `appendToSpanIndex` (tag = micro-batch id — a redelivered batch
    * no-ops on its committed tag). Existence semantics make ingest
    * order-free, so the closing probe of the k34 batch against the
    * streamed index equals k34's single-build probe exactly — s18 shares
    * k34's oracle verbatim (the s14/s15/s17 precedent).
    */
  def s18(spark: SparkSession, sfDir: String): DataFrame = {
    val (corpus, batch) = graft.ops.KQueries.spanFixture(spark, sfDir)
    val idxDir = StreamInput.lakeDir("s18_span_index", sfDir)
    // seed an empty committed epoch so streamed appends have a manifest
    // (and build constants) to extend
    graft.ops.SpanIndex.buildSpanIndex(
      corpus.limit(0), "doc_id", "text", idxDir)
    val in = StreamInput.readEventsStream(
      spark, StreamInput.spanCorpusDir(spark, sfDir))
    val query = in.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        graft.ops.SpanIndex.appendToSpanIndex(
          b.select("doc_id", "text"), "doc_id", "text", idxDir,
          tag = s"b$id")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", StreamInput.freshCheckpoint("s18", sfDir))
      .start()
    query.awaitTermination()
    recordReplay(query)
    graft.ops.KQueries.spanProbeReport(batch,
      graft.ops.SpanIndex.probeSpanStats(
        spark, idxDir, batch, "doc_id", "text"))
  }

  /** s19: streaming MERGE INTO the lake — silvia's load loop aimed at the
    * date-partitioned lake instead of Postgres. Each micro-batch of
    * row-level upserts merges via [[graft.etl.LakeUpsert.merge]]
    * (partition-level copy-on-write, only touched days rewritten).
    * Redelivery safety here is INHERENT, not tag-based: re-applying a
    * batch converges (anti-join removes the prior application, the union
    * re-adds it), so the crash window between merge and checkpoint commit
    * is harmless. Micro-batches partition the upsert set by key, so the
    * final lake state equals the one-shot p13 merge — s19 shares p13's
    * oracle verbatim.
    */
  def s19(spark: SparkSession, sfDir: String): DataFrame = {
    val outDir = StreamInput.lakeDir("s19_lake_merge", sfDir)
    graft.Tables.load(spark, sfDir, "events")
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(outDir)
    val in = StreamInput.readEventsStream(
      spark, StreamInput.mergeBatchDir(spark, sfDir))
    val query = in.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        graft.etl.LakeUpsert.merge(spark, outDir, b, "event_id", "ts")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", StreamInput.freshCheckpoint("s19", sfDir))
      .start()
    query.awaitTermination()
    recordReplay(query)
    spark.read.parquet(outDir)
      .groupBy("day")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("day")
  }

  /** s20: streaming DELETE FROM the lake — erasure requests (the GDPR
    * queue) arrive as micro-batches and each applies via
    * [[graft.etl.LakeUpsert.deleteKeys]] (copy-on-write, only touched
    * days, emptied dirs dropped). Like s19, redelivery safety is
    * inherent (re-deleting absent keys converges), and key-disjoint
    * micro-batches make sequential deletes equal the one-shot p15
    * erasure — s20 shares p15's oracle verbatim.
    */
  def s20(spark: SparkSession, sfDir: String): DataFrame = {
    val outDir = StreamInput.lakeDir("s20_lake_delete", sfDir)
    graft.Tables.load(spark, sfDir, "events")
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(outDir)
    val in = StreamInput.readEventsStream(
      spark, StreamInput.deleteKeysDir(spark, sfDir))
    val query = in.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        graft.etl.LakeUpsert.deleteKeys(spark, outDir, b, "event_id", "ts")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", StreamInput.freshCheckpoint("s20", sfDir))
      .start()
    query.awaitTermination()
    recordReplay(query)
    spark.read.parquet(outDir)
      .groupBy("day")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("day")
  }

  /** s21: streaming MERGE through the SNAPSHOT-ATOMIC lake — s19's load
    * loop retargeted at [[graft.etl.LakeSnapshot]]: each micro-batch
    * stages its touched-day generations and publishes one conditional
    * manifest commit, so a crash between batches (or inside one) leaves
    * readers on the last committed snapshot, never a half-applied day
    * set. Redelivery converges exactly as s19 (anti-join ∪ re-add), the
    * micro-batches are key-disjoint, so the final view equals the
    * one-shot p13 merge — s21 shares p13's oracle verbatim.
    */
  def s21(spark: SparkSession, sfDir: String): DataFrame = {
    val outDir = StreamInput.lakeDir("s21_snapshot_merge", sfDir)
    graft.etl.LakeSnapshot.merge(spark, outDir,
      graft.Tables.load(spark, sfDir, "events"), "event_id", "ts")
    val in = StreamInput.readEventsStream(
      spark, StreamInput.mergeBatchDir(spark, sfDir))
    val query = in.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        graft.etl.LakeSnapshot.merge(spark, outDir, b, "event_id", "ts")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", StreamInput.freshCheckpoint("s21", sfDir))
      .start()
    query.awaitTermination()
    recordReplay(query)
    graft.etl.LakeSnapshot.read(spark, outDir)
      .groupBy("day")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("day")
  }

  /** s22: the INCREMENTAL CDC CONSUMER — the downstream half of the
    * snapshot lake's change feed. The upstream loop is s21's (micro-batch
    * merges through the snapshot-atomic commit); after each commit the
    * consumer's cursor advances, and it reads
    * [[graft.etl.LakeSnapshot.readChanges]] for exactly its window. The
    * union of every window's changes must equal the changes of the WHOLE
    * ingest — windows compose because each commit's epoch range is
    * disjoint and generations are immutable — so the accumulated feed
    * aggregates to p20's oracle VERBATIM: incremental consumption loses
    * nothing, duplicates nothing, and fabricates nothing (the
    * same-day-rewrite rows of later batches stay silent in earlier
    * batches' windows).
    */
  def s22(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.etl.LakeSnapshot
    val outDir = StreamInput.lakeDir("s22_cdc_consumer", sfDir)
    LakeSnapshot.merge(spark, outDir,
      graft.Tables.load(spark, sfDir, "events"), "event_id", "ts")
    // the consumer's cursor: epoch after each upstream commit
    val cursors = scala.collection.mutable.ArrayBuffer(
      LakeSnapshot.currentEpoch(spark, outDir))
    val in = StreamInput.readEventsStream(
      spark, StreamInput.mergeBatchDir(spark, sfDir))
    val query = in.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        LakeSnapshot.merge(spark, outDir, b, "event_id", "ts")
        cursors += LakeSnapshot.currentEpoch(spark, outDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", StreamInput.freshCheckpoint("s22", sfDir))
      .start()
    query.awaitTermination()
    recordReplay(query)
    val windows = cursors.toSeq.distinct.sliding(2).collect {
      case Seq(from, to) =>
        LakeSnapshot.readChanges(spark, outDir, from, to, "event_id")
          .select(col("day"), col("_change_type"), col("value"))
    }.toSeq
    require(windows.nonEmpty, "the ingest stream committed no batches")
    windows.reduce(_.unionAll(_))
      .groupBy(col("day"), col("_change_type").as("change_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("day", "change_type")
  }

  /** s23: streaming IVFPQ ingest — the s17 shape on the composed serving
    * index: the odd corpus half plus the planted copy arrive as 4
    * micro-batches, each assigned AND PQ-encoded with the STORED
    * quantizers and committed (vectors + codes sidecar) as one
    * claim-guarded, tag-idempotent epoch. The closing audit probes the
    * persisted index through the production path (centroids → pruned
    * code partitions → rerank vector fetch), and must equal k3i's
    * single-build in-memory composition — s23 shares k3i's oracle
    * verbatim.
    */
  def s23(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.{KQueries, Similarity}
    val (q, corpus, centroids) = KQueries.ivfFixture(spark, sfDir)
    val idxDir = StreamInput.lakeDir("s23_ivfpq_index", sfDir)
    val seeds = centroids.select(
      (col("list_id") - 1).cast("int").as("code"), col("centroid"))
    val even = corpus.filter(col("vec_id") % 2 === 0)
      .select("vec_id", "embedding")
    Similarity.saveIvfPqIndex(
      Similarity.ivfBuildFixed(even, "vec_id", "embedding", centroids),
      Similarity.pqBuild(even, "vec_id", "embedding", seeds),
      idxDir)
    val in = StreamInput.readEventsStream(
      spark, StreamInput.ivfBatchDir(spark, sfDir))
    val query = in.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        Similarity.appendToIvfPqIndex(
          batch.select("vec_id", "embedding"), "vec_id", "embedding",
          idxDir, tag = s"b$id")
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", StreamInput.freshCheckpoint("s23", sfDir))
      .start()
    query.awaitTermination()
    recordReplay(query)
    KQueries.ivfPqPersistedAuditFacts(spark, idxDir, q)
  }

  /** s24: the CDC feed consumed through the DATASOURCE V2 STREAMING
    * source (VERDICT r12 #2) — `readStream.format("graft-cdc")` replaces
    * s22's driver-side poll loop. Upstream: s22's ingest, but every
    * micro-batch merge commits with `cdf = true`, staging its write-time
    * change sidecar. Downstream: the DSv2 source whose offsets are
    * manifest epochs drains the feed in BOUNDED micro-batches
    * (maxEpochsPerBatch=2 exercises admission control under
    * AvailableNow), each sidecar file read on an executor by the
    * standalone parquet reader — no snapshot diffing, no driver collect.
    * The accumulated feed must aggregate to p20's oracle VERBATIM, same
    * as s22: the write-time images of each commit equal that commit's
    * snapshot diff (LakeDeltaSpec), and commits' windows compose.
    * Checkpoint restart is GraftCdcSourceSpec's.
    */
  def s24(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.etl.LakeSnapshot
    val outDir = StreamInput.lakeDir("s24_cdc_source", sfDir)
    LakeSnapshot.merge(spark, outDir,
      graft.Tables.load(spark, sfDir, "events"), "event_id", "ts")
    val e0 = LakeSnapshot.currentEpoch(spark, outDir)
    val in = StreamInput.readEventsStream(
      spark, StreamInput.mergeBatchDir(spark, sfDir))
    val up = in.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        LakeSnapshot.merge(spark, outDir, b, "event_id", "ts", cdf = true)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", StreamInput.freshCheckpoint("s24up", sfDir))
      .start()
    up.awaitTermination()
    val feed = spark.readStream.format("graft-cdc")
      .option("path", outDir)
      .option("startingEpoch", e0.toString)
      .option("maxEpochsPerBatch", "2")
      .load()
    val table = s"s24_feed_${runSeq.incrementAndGet()}"
    val down = feed.writeStream
      .format("memory").queryName(table)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", StreamInput.freshCheckpoint("s24", sfDir))
      .start()
    down.awaitTermination()
    recordReplay(down)
    spark.table(table)
      .groupBy(col("day").cast("date").as("day"),
        col("_change_type").as("change_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("day", "change_type")
  }

  /** s25: the lake as a NATIVE streaming sink (VERDICT r13 #3) —
    * `writeStream.format("graft-lake")` replaces s19/s21's foreachBatch
    * idiom with the DSv2 [[graft.sources.LakeStreamingWrite]]: executors
    * stream each micro-batch into per-day delta files under a staging
    * area, the driver claims a generation, moves exactly the committed
    * files and publishes ONE tag-idempotent merge-on-read delta commit
    * (`sw-<queryId>-<batchId>` — a restart's replayed batch no-ops).
    * Micro-batches are key-disjoint, so the final folded view equals the
    * one-shot p13 merge — s25 shares p13's oracle VERBATIM; the history
    * gate pins that every batch landed as a delta, never a rewrite.
    * Restart/redelivery is LakeStreamSinkSpec's.
    */
  def s25(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.etl.LakeSnapshot
    val outDir = StreamInput.lakeDir("s25_lake_sink", sfDir)
    LakeSnapshot.merge(spark, outDir,
      graft.Tables.load(spark, sfDir, "events"), "event_id", "ts")
    val in = StreamInput.readEventsStream(
      spark, StreamInput.mergeBatchDir(spark, sfDir))
    val query = in.writeStream
      .format("graft-lake")
      .option("path", outDir)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", StreamInput.freshCheckpoint("s25", sfDir))
      .start()
    query.awaitTermination()
    recordReplay(query)
    val ops = LakeSnapshot.describeHistory(spark, outDir)
      .select("operation").collect().map(_.getString(0)).toSeq
    require(ops.head == "write" && ops.tail.forall(_ == "delta") &&
      ops.tail.nonEmpty,
      s"the native sink must land every batch as a delta commit, got $ops")
    LakeSnapshot.read(spark, outDir)
      .groupBy("day")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("day")
  }

  /** s26: the FULL-TABLE streaming source (VERDICT r14 #4) —
    * `readStream.format("graft-lake").option("changes", "true")`: a
    * pinned initial snapshot (every current row as an `insert` at the
    * pin epoch, admitted `maxDaysPerBatch` days per micro-batch), then
    * the write-time CDC tail (`maxEpochsPerBatch`). The entry runs the
    * stream, ingests the p13 correction batches with cdf=true, RESUMES
    * the stream from its checkpoint (the tail picks up exactly the new
    * epochs), and folds the accumulated change images youngest-per-key
    * — the end-of-stream state must hash-equal the batch merge, so s26
    * shares p13's oracle VERBATIM. Mid-snapshot/mid-tail restarts are
    * LakeStreamSourceSpec's.
    */
  def s26(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.etl.LakeSnapshot
    val outDir = StreamInput.lakeDir("s26_lake_stream", sfDir)
    LakeSnapshot.merge(spark, outDir,
      graft.Tables.load(spark, sfDir, "events"), "event_id", "ts")
    val e0 = LakeSnapshot.currentEpoch(spark, outDir)
    val nRows = LakeSnapshot.read(spark, outDir).count()
    val accDir = StreamInput.lakeDir("s26_acc", sfDir)
    val ckpt = StreamInput.freshCheckpoint("s26", sfDir)
    def drain(): org.apache.spark.sql.streaming.StreamingQuery = {
      val q = spark.readStream.format("graft-lake")
        .option("path", outDir)
        .option("changes", "true")
        .option("maxDaysPerBatch", "3")
        .option("maxEpochsPerBatch", "2")
        .load()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(accDir); ()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
      q
    }
    // phase 1: the pinned snapshot drains in bounded day batches
    val q1 = drain()
    require(q1.recentProgress.count(_.numInputRows > 0) > 1,
      "the snapshot must drain across multiple day-bounded micro-batches")
    val snap = spark.read.parquet(accDir)
    require(snap.count() == nRows &&
      snap.select("_commit_epoch").distinct().collect()
        .map(_.getInt(0)).toSeq == Seq(e0),
      s"the snapshot phase must emit exactly the pinned view at epoch $e0")
    // the tail: ingest the p13 correction as cdf=true micro-batches...
    val up = StreamInput.readEventsStream(
      spark, StreamInput.mergeBatchDir(spark, sfDir))
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        LakeSnapshot.merge(spark, outDir, b, "event_id", "ts", cdf = true)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", StreamInput.freshCheckpoint("s26up", sfDir))
      .start()
    up.awaitTermination()
    // ...and RESUME the table stream from its checkpoint: only the new
    // epochs' change images arrive (no snapshot re-emit)
    drain()
    // throughput accounting (StreamBench): the SNAPSHOT drain is the
    // dominant phase at scale — its batches/rows are the replay record
    recordReplay(q1)
    val acc = spark.read.parquet(accDir)
    require(acc.filter(col("_commit_epoch") > e0).count() > 0,
      "the resumed stream must deliver the post-snapshot change tail")
    require(acc.filter(col("_commit_epoch") === e0).count() == nRows,
      "a checkpoint resume must never re-emit the drained snapshot")
    // fold youngest-per-key (preimages are audit rows; a youngest
    // delete kills the key) — the downstream consumer's contract
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id").orderBy(col("_commit_epoch").desc)
    acc.filter(col("_change_type") =!= "update_preimage")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("_change_type") =!= "delete")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("day")
  }

  val declared: Seq[(String, QFn, Option[String])] = Seq(
    ("s1_ingest_replay", s1 _, Some(s1Sql)),
    ("s2_tumbling_window", s2 _, Some(s2Sql)),
    ("s3_sliding_static_join", s3 _, Some(s3Sql)),
    ("s4_session_window", s4 _, Some(s4Sql)),
    ("s5_stream_dedup", s5 _, Some(s5Sql)),
    ("s6_stateful_agg", s6 _, Some(s6Sql)),
    // s6b re-implements s6's exact semantics on transformWithState/RocksDB,
    // so it shares s6's oracle by design (VERDICT r7 wrong #4).
    ("s6b_transform_with_state", s6b _, Some(s6Sql)),
    ("s7_mapstate_counts", s7 _, Some(s7Sql)),
    ("s8_stream_stream_join", s8 _, Some(graft.Queries.q8Sql)),
    ("s9_ss_left_outer_join", s9 _, Some(s9Sql)),
    ("s10_ss_full_outer_join", s10 _, Some(s10Sql)),
    ("s11_lake_dynamic_overwrite", s11 _, Some(s11Sql)),
    ("s12_lake_compaction", s12 _, Some(s12Sql)),
    ("s13_stream_heavy_hitters", s13 _, Some(s13Sql)),
    // s14 streams the k19 batch through the same probe, so the per-batch
    // union equals the one-shot k19 result and shares its oracle verbatim
    // (the s6b oracle-sharing precedent).
    ("s14_stream_incremental_dedup", s14 _, Some(graft.ops.KQueries.k19Sql)),
    // s15 streams the k21 vector batch through the cosine-index probe; the
    // per-batch union equals the one-shot k21 result (same argument as
    // s14/k19) and shares k21's oracle verbatim.
    ("s15_stream_incremental_vec_dedup", s15 _, Some(graft.ops.KQueries.k21Sql)),
    // s16 streams the k26 batch through the composed prep chain; the
    // per-micro-batch union equals the one-shot k26 result (id-ordered
    // arrival + out-of-band benchmark registration) and shares its
    // oracle verbatim.
    ("s16_stream_incremental_corpus_prep", s16 _,
      Some(graft.ops.KQueries.k26Sql)),
    // s17 streams the IVF ingest; the final persisted state equals the
    // one-shot k3d build, so it shares k3IvfSql verbatim.
    ("s17_stream_ivf_ingest", s17 _, Some(graft.ops.KQueries.k3IvfSql)),
    // s18 streams the k34 corpus into the span-hash index; existence
    // semantics make ingest order-free, so the closing probe equals the
    // one-shot k34 build and shares its oracle verbatim.
    ("s18_stream_span_ingest", s18 _, Some(graft.ops.KQueries.k34Sql)),
    // s19 streams the p13 upsert batch into the lake; key-disjoint
    // micro-batches make sequential merges equal the one-shot merge, so
    // it shares p13's oracle verbatim.
    ("s19_stream_lake_merge", s19 _, Some(graft.etl.PipelineQueries.p13Sql)),
    // s20 streams the p15 erasure keys; key-disjoint micro-batches make
    // sequential deletes equal the one-shot erasure — shares p15's oracle.
    ("s20_stream_lake_delete", s20 _, Some(graft.etl.PipelineQueries.p15Sql)),
    ("s21_stream_snapshot_merge", s21 _, Some(graft.etl.PipelineQueries.p13Sql)),
    // s22 shares p20's oracle verbatim: the union of per-window CDC reads
    // must aggregate to the whole ingest's change census
    ("s22_cdc_consumer", s22 _, Some(graft.etl.PipelineQueries.p20Sql)),
    // s24 shares p20's oracle verbatim: the DSv2 feed's accumulated
    // write-time images == the whole ingest's change set (see s24 doc)
    ("s24_cdc_source", s24 _, Some(graft.etl.PipelineQueries.p20Sql)),
    // s23 shares k3i's oracle verbatim: streamed IVFPQ ingest must equal
    // the single-build in-memory composition
    ("s23_ivfpq_ingest", s23 _, Some(graft.ops.KQueries.k3iSql)),
    // s25 shares p13's oracle verbatim: the native DSv2 streaming sink's
    // folded end-state == the one-shot merge (see s25 doc)
    ("s25_stream_lake_sink", s25 _, Some(graft.etl.PipelineQueries.p13Sql)),
    // s26 shares p13's oracle VERBATIM: the full-table stream's folded
    // change images must equal the batch merge (see the s26 doc)
    ("s26_lake_stream_source", s26 _, Some(graft.etl.PipelineQueries.p13Sql))
  )
}
