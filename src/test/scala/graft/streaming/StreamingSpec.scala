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
      .select(col("window.start").as("h"), col("event_type"), col("n"), col("v"))
    assertSameRows(stream, batch)
  }

  test("S4: session windows equal batch session_window aggregation") {
    val stream = StreamQueries.s4(spark, sf)
    val batch = batchEvents
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .select(col("session_window.start").as("s_start"),
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
