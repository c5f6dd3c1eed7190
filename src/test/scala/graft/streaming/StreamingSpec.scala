package graft.streaming

import graft.{Queries, Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Batch-equivalence lock for the streaming suite (SURVEY.md §2.2-S), all
  * inside Spark: stream replay output must equal the batch formulation over
  * the same events. The DuckDB side of the same contract is checked by the
  * driver's oracle gate.
  */
class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def batchEvents: DataFrame = Tables.load(spark, sf, "events")

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"stream and batch results differ")
  }

  test("S1: replay count+checksum equals batch") {
    val stream = StreamQueries.s1(spark, sf)
    val batch = batchEvents.agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
    assertSameRows(stream, batch)
  }

  test("S2: tumbling window counts equal batch window() aggregation") {
    val stream = StreamQueries.s2(spark, sf)
    val batch = batchEvents
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      // s2 dumps the window start as µs BIGINT (§2.3 rule 8)
      .select(unix_micros(col("window.start")).as("h"),
        col("event_type"), col("n"), col("v"))
    assertSameRows(stream, batch)
  }

  test("S4: session windows equal batch session_window aggregation") {
    val stream = StreamQueries.s4(spark, sf)
    val batch = batchEvents
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      // s4 dumps the session start as µs BIGINT (§2.3 rule 8)
      .select(unix_micros(col("session_window.start")).as("s_start"),
        col("user_id"), col("n"), col("v"))
    assertSameRows(stream, batch)
  }

  test("S5: dedup of duplicated replay restores the original table") {
    val stream = StreamQueries.s5(spark, sf)
    val batch = batchEvents.agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
    assertSameRows(stream, batch)
  }

  test("S6: mapGroupsWithState final state equals batch GROUP BY") {
    val stream = StreamQueries.s6(spark, sf)
    val batch = batchEvents.groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("user_id")
    assertSameRows(stream, batch)
  }

  test("S6b: transformWithState (TTL'd ValueState, RocksDB) equals batch GROUP BY") {
    val stream = StreamQueries.s6b(spark, sf)
    val batch = batchEvents.groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("user_id")
    assertSameRows(stream, batch)
  }

  test("S7: MapState per-type counts equal batch GROUP BY user_id, event_type") {
    val stream = StreamQueries.s7(spark, sf)
    val batch = batchEvents.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("user_id", "event_type")
    assertSameRows(stream, batch)
  }

  test("I7: flatMapGroupsWithState running totals equal batch GROUP BY") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val in = StreamInput.readEventsStream(spark, StreamInput.eventsDir(spark, sf))
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
    val updates = in.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (user: Long, rows: Iterator[(Long, Double)],
            state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var v = v0
          rows.foreach { r => n += 1; v += r._2 }
          state.update((n, v))
          Iterator.single((user, n, v))
      }
      .toDF("user_id", "n", "v")
    val sink = StreamQueries.runToTableUntilDrained(
      spark, updates, "spec_fmgws", sf)
    val finalRows = sink.groupBy("user_id")
      .agg(max("n").as("n"))
    val batch = batchEvents.groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(finalRows.join(batch, Seq("user_id"))
      .filter(finalRows("n") =!= batch("n")).count() == 0)
    assert(finalRows.count() == batch.count())
  }

  test("I7: ListState appends per-key values across micro-batches") {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = StreamInput.readEventsStream(spark, StreamInput.eventsDir(spark, sf))
        .select(col("user_id"), col("value"))
        .as[(Long, Double)]
      val sizes = in.groupByKey(_._1)
        .transformWithState(new ValueListProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
        .toDF("user_id", "n_appended")
      val sink = StreamQueries.runToTableUntilDrained(
        spark, sizes, "spec_liststate", sf)
      // final (max) appended-count per user == batch row count per user
      val finalCounts = sink.groupBy("user_id")
        .agg(max("n_appended").as("n"))
      val batch = batchEvents.groupBy("user_id").agg(count(lit(1)).as("n"))
      assert(finalCounts.join(batch, Seq("user_id"))
        .filter(finalCounts("n") =!= batch("n")).count() == 0)
    } finally prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None    => spark.conf.unset(providerKey)
    }
  }

  test("I8: a row later than the watermark is dropped in append mode") {
    import java.nio.file.{Files, Paths}
    import java.sql.Timestamp
    import spark.implicits._

    val dir = "target/stream/latetest/in"
    StreamInput.deleteRecursively(Paths.get("target/stream/latetest"))
    Files.createDirectories(Paths.get(dir))

    def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
    // batch 1: on-time rows up to 10:50 → watermark advances to 10:40
    Seq((1L, ts(0), 1.0), (2L, ts(30), 1.0), (3L, ts(50), 1.0))
      .toDF("id", "ts", "v").coalesce(1).write.parquet(s"$dir/f1")
    // batch 2: on-time row (lets the batch-1 watermark take effect)
    Seq((5L, ts(55), 1.0))
      .toDF("id", "ts", "v").coalesce(1).write.parquet(s"$dir/f2")
    // batch 3: one LATE row at 10:05, far behind the 10:40+ watermark
    Seq((4L, ts(5), 100.0))
      .toDF("id", "ts", "v").coalesce(1).write.parquet(s"$dir/f3")
    // stage the three files as an ordered stream input
    val streamDir = "target/stream/latetest/stream"
    Files.createDirectories(Paths.get(streamDir))
    Seq("f1", "f2", "f3").zipWithIndex.foreach { case (f, i) =>
      val part = Files.list(Paths.get(s"$dir/$f")).toArray.map(_.toString)
        .filter(p => p.contains("part-") && p.endsWith(".parquet")).head
      val dst = Paths.get(f"$streamDir/000$i.parquet")
      Files.copy(Paths.get(part), dst)
      Files.setLastModifiedTime(dst, java.nio.file.attribute.FileTime
        .fromMillis(System.currentTimeMillis() - (3 - i) * 2000L))
    }

    val schema = spark.read.parquet(streamDir).schema
    val agg = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(sum("v").as("v"), count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("v"), col("n"))

    val q = agg.writeStream.format("memory").queryName("latetest")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        StreamInput.freshCheckpoint("latetest", "unit"))
      .start()
    q.awaitTermination()
    info(s"micro-batches: ${q.recentProgress.map(p => p.numInputRows).mkString(",")}")

    val out = spark.table("latetest").collect()
      .map(r => (r.getTimestamp(0).toString, r.getDouble(1), r.getLong(2)))
      .toSet
    // the late id=4 row (v=100 at 10:05) must NOT appear in any emitted
    // window: its window [10:00,10:10) was finalized by the batch-1
    // watermark before the row arrived
    assert(!out.exists(_._2 >= 100.0), s"late row leaked into: $out")
    // and the on-time 10:00 window WAS emitted with only the on-time row
    assert(out.contains(("2024-01-01 10:00:00.0", 1.0, 1L)), s"got: $out")
  }

  test("A7: rate source produces rows (dev/test source)") {
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "100").load()
      .writeStream.format("memory").queryName("rate_smoke")
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      q.processAllAvailable()
      Thread.sleep(300)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("rate_smoke").count() >= 0) // source ran without error
  }

  test("S11: lake load equals batch per-day aggregate; re-delivery is idempotent") {
    val fromStream = StreamQueries.s11(spark, sf).collect()
    val lake = StreamInput.lakePath("s11_lake", sf)
    // day-aligned replay contract: every input file carries whole days
    val split = spark.read.parquet(StreamInput.eventsByDayAlignedDir(spark, sf))
      .select(to_date(col("ts")).as("day"), input_file_name().as("f"))
      .groupBy("day").agg(countDistinct("f").as("nf"))
      .filter(col("nf") > 1).count()
    assert(split == 0, "a day spans more than one replay file")
    // simulate at-least-once re-delivery: re-land one day's batch again
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try Tables.load(spark, sf, "events")
      .withColumn("day", to_date(col("ts")))
      .filter(col("day") === lit("2024-01-03"))
      .write.mode("overwrite").partitionBy("day").parquet(lake)
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
    val after = spark.read.parquet(lake)
      .groupBy("day")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("day").collect()
    assert(after.toSeq == fromStream.toSeq,
      "re-delivered batch changed the lake (overwrite not idempotent)")
  }

  test("replay input is time-ordered across files (watermark safety)") {
    val dir = StreamInput.eventsDir(spark, sf)
    val withFile = spark.read.parquet(dir)
      .select(col("ts"), input_file_name().as("f"))
      .groupBy("f").agg(min("ts").as("lo"), max("ts").as("hi"))
      .orderBy("f").collect()
    assert(withFile.length == 4)
    withFile.sliding(2).foreach { w =>
      assert(!w(1).getTimestamp(1).before(w(0).getTimestamp(2)),
        "file ranges overlap more than a boundary")
    }
  }
}

/** ListState probe: append every value for the key, emit the running count
  * of appended elements (top-level class — Spark serializes the processor).
  */
class ValueListProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Double), (Long, Long)] {
  @transient private var vals: org.apache.spark.sql.streaming.ListState[Double] = _

  override def init(
      outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    vals = getHandle.getListState[Double]("vals",
      org.apache.spark.sql.Encoders.scalaDouble,
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      user: Long,
      rows: Iterator[(Long, Double)],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long)] = {
    rows.foreach(r => vals.appendValue(r._2))
    Iterator.single((user, vals.get().size.toLong))
  }
}
