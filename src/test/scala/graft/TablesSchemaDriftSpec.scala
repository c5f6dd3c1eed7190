package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2.3 rule 6: `Tables.loadEvents` canonicalizes whatever
  * timestamp physical type the parquet footer carries to a session-UTC
  * TimestampType column. The r9 testdata regen (TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS)) silently darkened 36 correctness entries because the
  * old code assumed exactly one shape; this spec locks every shape a future
  * fixture regen could plausibly ship, so drift degrades LOUDLY (a red test
  * naming the shape) instead of silently.
  *
  * Shapes: µs-NTZ (what pandas/pyarrow writes today), µs-LTZ (tz-tagged,
  * Spark's own default), ms-LTZ (outputTimestampType=TIMESTAMP_MILLIS),
  * and raw int64 nanos-since-epoch — the surface the legacy
  * TIMESTAMP(NANOS) path presents after `nanosAsLong=true` maps it to
  * LongType (parquet-mr can't WRITE a NANOS annotation, so the branch is
  * exercised via its observable input type; the real-file behavior was
  * hash-verified against DuckDB through rounds 1-8).
  */
class TablesSchemaDriftSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/schema_drift/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  // two instants, µs precision, minute-scale apart (the fixture contract)
  private val micros = Seq(1700000000000000L, 1700000060000000L)

  private def baseDf(tsCol: org.apache.spark.sql.Column) =
    Seq((1L, micros(0), 10L, "click", 1.5, "{}"),
      (2L, micros(1), 11L, "view", 2.5, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")

  private def loadAndCheck(dir: String, shape: String): Unit = {
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType == TimestampType,
      s"[$shape] loadEvents must canonicalize ts to TimestampType, got " +
        got.schema("ts").dataType)
    val vals = got.orderBy("event_id")
      .select(unix_micros(col("ts"))).as[Long].collect().toSeq
    assert(vals == micros,
      s"[$shape] canonicalized instants drifted: $vals != $micros")
  }

  test("µs TIMESTAMP_NTZ (pandas-written, current testdata) canonicalizes") {
    val dir = freshDir("ntz")
    baseDf(timestamp_micros(col("us")).cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    loadAndCheck(dir, "us-ntz")
  }

  test("µs TIMESTAMP LTZ (tz-tagged, Spark default) passes through") {
    val dir = freshDir("ltz")
    baseDf(timestamp_micros(col("us")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    loadAndCheck(dir, "us-ltz")
  }

  test("ms TIMESTAMP (outputTimestampType=TIMESTAMP_MILLIS) passes through") {
    val dir = freshDir("ms")
    val key = "spark.sql.parquet.outputTimestampType"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "TIMESTAMP_MILLIS")
      baseDf(timestamp_micros(col("us")))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    } finally spark.conf.set(key, old)
    loadAndCheck(dir, "ms-ltz")
  }

  test("int64 nanos-since-epoch (the nanosAsLong surface) truncates to µs") {
    val dir = freshDir("ns")
    baseDf((col("us") * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    loadAndCheck(dir, "ns-long")
  }

  test("the real fixture under this session loads as TimestampType") {
    val got = Tables.load(spark, TestSpark.sf, "events")
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.limit(1).count() == 1)
  }

  test("the session-wide inferTimestampNTZ flip is value-neutral for every " +
      "other fixture table under the pinned UTC session (ADVICE r10)") {
    // loadEvents flips spark.sql.parquet.inferTimestampNTZ.enabled=false
    // SESSION-WIDE, and orders/lineitem also carry µs-NTZ timestamp
    // columns — so their post-flip reads surface LTZ instead of NTZ. That
    // is only safe while the session timezone is UTC, where the two types
    // hold bit-identical µs-since-epoch values. Lock the value identity
    // directly: read each other timestamp column with the conf in BOTH
    // states and assert identical instants, so a non-UTC drift or a
    // semantics change in a Spark upgrade fails loudly here.
    val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val old = spark.conf.get(key, "true")
    def instants(table: String, c: String, conf: String): Seq[Long] = {
      spark.conf.set(key, conf)
      // fresh path string per read defeats the FileIndex/schema cache
      val path = s"${TestSpark.sf}/$table.parquet"
      val df = spark.read.parquet(path)
      val typed = df.schema(c).dataType match {
        case TimestampNTZType => df.withColumn(c, col(c).cast(TimestampType))
        case _ => df
      }
      typed.orderBy(c).limit(50).select(unix_micros(col(c)))
        .as[Long].collect().toSeq
    }
    try {
      for ((table, c) <- Seq("orders" -> "o_orderdate",
          "lineitem" -> "l_shipdate")) {
        val asNtz = instants(table, c, "true")
        val asLtz = instants(table, c, "false")
        assert(asNtz == asLtz,
          s"$table.$c reads different instants under the NTZ conf flip — " +
            "the loadEvents session-wide conf change is no longer benign")
      }
    } finally spark.conf.set(key, old)
  }
}
