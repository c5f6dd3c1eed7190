package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Testdata table access (TESTDATA.md:13-15, FIXTURES.md §A).
  *
  * Fixed schemas come from the parquet footers; no inference in production
  * paths (SURVEY.md §1.2). Dimension tables small enough to broadcast at any
  * scale factor are listed in [[broadcastable]] — query builders wrap them in
  * `broadcast()` so the plan stays a broadcast hash join at 100 TB fact-table
  * scale as long as dims stay dim-sized.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dims bounded by the data model, not the scale factor. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as nanos-since-epoch LONG and truncate to a µs
    * timestamp. DuckDB 1.0 reads the same file at full ns resolution
    * (TIMESTAMP_NS); the fixture's ts gaps are minute-scale, so no declared
    * query's comparison lands within 1 µs of a boundary — oracle parity holds
    * (verified: all ts-comparing queries hash-matched in round 1).
    *
    * The legacy conf is the only switch for nanos reads (no per-read
    * option), so it is set here — guarded, once per session.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Register every table as a temp view for SQL-formulated queries. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
