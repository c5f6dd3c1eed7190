package graft.etl

import java.nio.file.Paths

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
        map_keys(col("context_data")).as("keys"),
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
    s"""SELECT activity_kind, count(*) AS n,
       |       round(coalesce(sum(TRY_CAST(revenue_float AS DOUBLE)),0),2) AS rev,
       |       count(CASE WHEN is_organic IN ('0','1') THEN 1 END) AS n_organic_known
       |FROM read_json('$path', format='newline_delimited', columns={$cols})
       |WHERE created_at IS NOT NULL
       |  AND TRY_CAST(created_at AS BIGINT) IS NOT NULL
       |  AND (revenue_float IS NULL OR TRY_CAST(revenue_float AS DOUBLE) IS NOT NULL)
       |  AND activity_kind IN ('install','event','session')
       |GROUP BY activity_kind ORDER BY activity_kind""".stripMargin
  }

  val declared: Seq[(String, QFn, Option[String])] = Seq(
    ("p1_snowplow_good", p1Good _, None),
    ("p1_snowplow_badrows", p1BadRows _, None),
    ("p1_snowplow_shred", p1Shred _, None),
    ("p2_adjust_parse", p2 _, Some(p2Sql))
  )
}
