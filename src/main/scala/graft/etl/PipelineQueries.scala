package graft.etl

import java.nio.file.Paths
import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline suite P1/P2 (SURVEY.md §2.2-P): the silvia ETL surface as
  * declared queries over the checked-in raw-event fixtures.
  *
  * p1 entries are golden-file checked in scalatest and rows-only at the
  * driver (positional TSV + bad-row routing isn't reasonably expressible in
  * one DuckDB query); p2 re-implements the Adjust coercion rules in DuckDB
  * over the same jsonl file, so it is a full value oracle.
  */
object PipelineQueries {

  type QFn = (SparkSession, String) => DataFrame

  // --- P1: Snowplow enriched TSV → typed events + dead letters -------------

  def p1Good(spark: SparkSession, sfDir: String): DataFrame = {
    val res = SnowplowParser.read(spark, EtlFixtures.snowplowTsv())
    res.good.select(
        col("event_id"), col("event"), col("user_id"),
        col("domain_sessionidx"), col("geo_latitude"),
        col("se_value"), col("tr_total"), col("ti_price"),
        col("br_features_pdf"), col("dvce_ismobile"),
        col("derived_tstamp"))
      .orderBy("event_id")
  }

  def p1BadRows(spark: SparkSession, sfDir: String): DataFrame = {
    val res = SnowplowParser.read(spark, EtlFixtures.snowplowTsv())
    res.bad
      .select(explode(col("errors")).as("error"))
      .groupBy("error").agg(count(lit(1)).as("n"))
      .orderBy("error")
  }

  def p1Shred(spark: SparkSession, sfDir: String): DataFrame = {
    val res = SnowplowParser.read(spark, EtlFixtures.snowplowTsv())
    SnowplowShred.explodeContexts(res.good)
      .select(
        col("event_id"), col("context_schema"),
        // scalar, not array: the driver's checker sorts pandas frames and
        // chokes on ndarray-valued cells (VERDICT.md round-2 wrong #1)
        array_join(map_keys(col("context_data")), ",").as("keys"),
        element_at(col("context_data"), "tier").as("tier"))
      .orderBy("event_id", "context_schema")
  }

  // --- P2: Adjust postbacks → typed events ---------------------------------

  def p2(spark: SparkSession, sfDir: String): DataFrame = {
    val res = AdjustParser.read(spark, EtlFixtures.adjustJsonl())
    res.good
      .groupBy("activity_kind")
      .agg(
        count(lit(1)).as("n"),
        round(coalesce(sum("revenue"), lit(0.0)), 2).as("rev"),
        count(col("is_organic")).as("n_organic_known"))
      .orderBy("activity_kind")
  }

  /** Independent DuckDB re-implementation of the Adjust good-row rules. */
  def p2Sql: String = {
    val path = Paths.get(EtlFixtures.adjustJsonl()).toAbsolutePath
    val cols = AdjustParser.RAW_SCHEMA.fieldNames
      .map(n => s"$n: 'VARCHAR'").mkString(", ")
    // ignore_errors: the malformed-JSON fixture line surfaces as an all-NULL
    // row here and is excluded by the created_at filter — mirroring the
    // Spark side, which dead-letters it as bad_json
    s"""SELECT activity_kind, count(*) AS n,
       |       round(coalesce(sum(TRY_CAST(revenue_float AS DOUBLE)),0),2) AS rev,
       |       count(CASE WHEN is_organic IN ('0','1') THEN 1 END) AS n_organic_known
       |FROM read_json('$path', format='newline_delimited', columns={$cols},
       |               ignore_errors=true)
       |WHERE created_at IS NOT NULL
       |  AND TRY_CAST(created_at AS BIGINT) IS NOT NULL
       |  AND (revenue_float IS NULL OR TRY_CAST(revenue_float AS DOUBLE) IS NOT NULL)
       |  AND activity_kind IN ('install','event','session')
       |GROUP BY activity_kind ORDER BY activity_kind""".stripMargin
  }

  // --- P3/P4: JDBC upsert sink + read-back on embedded Derby ---------------

  private def sfKey(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9.]+", "_").dropWhile(_ == '_')

  /** Shut down + delete an embedded Derby db for a deterministic re-run. */
  private def freshDerby(dbDir: String): String = {
    // before first engine boot: Derby logs into target/, not the repo root
    System.setProperty("derby.stream.error.file", "target/derby.log")
    try DriverManager.getConnection(s"jdbc:derby:$dbDir;shutdown=true")
    catch { case _: java.sql.SQLException => () } // 08006 = shutdown OK
    graft.streaming.StreamInput.deleteRecursively(Paths.get(dbDir))
    s"jdbc:derby:$dbDir;create=true"
  }

  /** P3 (A5, A6, I6, I9): stream the duplicated events replay into Derby
    * through the checkpointed upsert sink, then REPLAY IT AGAIN from a fresh
    * checkpoint. Key-idempotent upsert ⇒ the second full replay must leave
    * the table at exactly the batch answer — which is what the oracle
    * checks (duplicates collapse onto the event_id primary key).
    */
  def p3(spark: SparkSession, sfDir: String): DataFrame = {
    val url = freshDerby(s"target/derby/p3_${sfKey(sfDir)}")
    val table = "events_sink"
    val inDir = graft.streaming.StreamInput.eventsDupDir(spark, sfDir)
    val schema = spark.read.parquet(inDir).drop("props").schema
    JdbcUpsert.ensureTable(url, table, schema, Seq("event_id"))

    (1 to 2).foreach { replay =>
      val stream = graft.streaming.StreamInput.readEventsStream(spark, inDir)
        .drop("props")
      JdbcUpsert.sink(stream, url, table, Seq("event_id"),
          graft.streaming.StreamInput.freshCheckpoint(s"p3_replay$replay", sfDir))
        .start().awaitTermination()
    }

    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("event_id")).as("d"),
        round(sum("value"), 2).as("v"))
  }

  val p3Sql: String =
    """SELECT count(*) AS n, count(DISTINCT event_id) AS d,
      |       round(sum(value),2) AS v FROM events""".stripMargin

  /** P4 (A4, A5): batch upsert path — write customer twice (second pass
    * exercises the UPDATE branch on every row), read back via the JDBC
    * source, aggregate. Oracle = same aggregate over the parquet table.
    */
  def p4(spark: SparkSession, sfDir: String): DataFrame = {
    val url = freshDerby(s"target/derby/p4_${sfKey(sfDir)}")
    val table = "customer_sink"
    val customer = graft.Tables.load(spark, sfDir, "customer")
    JdbcUpsert.ensureTable(url, table, customer.schema, Seq("c_custkey"))
    JdbcUpsert.upsertBatch(customer, url, table, Seq("c_custkey"))
    JdbcUpsert.upsertBatch(customer, url, table, Seq("c_custkey")) // all-UPDATE pass

    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"))
      .orderBy("c_nationkey")
  }

  val p4Sql: String =
    """SELECT c_nationkey, count(*) AS n, round(sum(c_acctbal),2) AS bal
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** P5 (J6): the full silvia load path end-to-end — parse the Snowplow
    * fixture, map to atomic + child target tables, upsert each into Derby
    * TWICE (idempotency), read back per-table row counts. Rows-only at the
    * driver; exact counts are golden-checked in TargetMappingSpec.
    */
  def p5(spark: SparkSession, sfDir: String): DataFrame = {
    val url = freshDerby(s"target/derby/p5_${sfKey(sfDir)}")
    val good = SnowplowParser.read(spark, EtlFixtures.snowplowTsv()).good
    TargetMapping.loadAll(good, url)
    TargetMapping.loadAll(good, url) // replay: counts must not change
    val counts = TargetMapping.allTargets(good).map { case (table, _, _) =>
      spark.read.format("jdbc")
        .option("url", url).option("dbtable", table).load()
        .agg(count(lit(1)).as("n"))
        .select(lit(table).as("target_table"), col("n"))
    }
    counts.reduce(_.unionByName(_)).orderBy("target_table")
  }

  val declared: Seq[(String, QFn, Option[String])] = Seq(
    ("p1_snowplow_good", p1Good _, None),
    ("p1_snowplow_badrows", p1BadRows _, None),
    ("p1_snowplow_shred", p1Shred _, None),
    ("p2_adjust_parse", p2 _, Some(p2Sql)),
    ("p3_jdbc_upsert_stream", p3 _, Some(p3Sql)),
    ("p4_jdbc_readback", p4 _, Some(p4Sql)),
    ("p5_target_mapping", p5 _, None)
  )
}
