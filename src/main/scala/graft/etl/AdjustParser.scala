package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adjust server-callback (postback) parser (SURVEY.md §2.1 J2/A3).
  *
  * Input is one JSON object per line with string-typed values (HTTP query
  * params `[pub:adjust]`). Parsed with an explicit schema — no inference in
  * production paths (SURVEY.md §1.2) — then coerced: `created_at` unix
  * seconds → TIMESTAMP, `revenue_float` → DOUBLE, `is_organic` `0/1` →
  * BOOLEAN. Rows with a missing/bad `created_at`, a bad `revenue_float`, an
  * unknown `activity_kind`, or unparseable JSON dead-letter to `bad` (A9).
  */
object AdjustParser {

  val ACTIVITY_KINDS: Seq[String] = Seq("install", "event", "session")

  /** Raw postback schema: every value arrives as a string. */
  val RAW_SCHEMA: StructType = StructType(Seq(
    "activity_kind", "event_token", "app_token", "adid", "idfa", "gps_adid",
    "created_at", "tracker", "tracker_name", "network_name", "campaign_name",
    "adgroup_name", "creative_name", "country", "os_name", "os_version",
    "device_name", "is_organic", "revenue_float", "currency"
  ).map(StructField(_, StringType, nullable = true)))

  /** Parse schema = RAW_SCHEMA + a corrupt-record column: Spark 3+'s
    * PERMISSIVE from_json never returns a NULL struct for malformed JSON
    * (all fields come back null instead — ADVICE r2), so malformed lines
    * are detected explicitly via columnNameOfCorruptRecord.
    */
  private val PARSE_SCHEMA: StructType =
    RAW_SCHEMA.add(StructField("_corrupt", StringType, nullable = true))

  def parseLines(raw: DataFrame): ParseResult = {
    val parsed = raw.withColumn(
      "_r", from_json(col("value"), PARSE_SCHEMA,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")))

    val typed = parsed
      .withColumn("created_at_ts",
        expr("timestamp_seconds(try_cast(_r.created_at AS BIGINT))"))
      .withColumn("revenue", expr("try_cast(_r.revenue_float AS DOUBLE)"))
      .withColumn("is_organic_b",
        expr("CASE WHEN _r.is_organic = '1' THEN true " +
          "WHEN _r.is_organic = '0' THEN false END"))
      .withColumn("_errors", expr(
        // bad_json is the SOLE error for a malformed line — the per-field
        // labels below would all fire spuriously on its null-struct fields
        s"""CASE WHEN _r IS NULL OR _r._corrupt IS NOT NULL
           |     THEN array('bad_json')
           |ELSE filter(array(
           |  CASE WHEN _r.created_at IS NULL
           |       THEN 'missing:created_at' END,
           |  CASE WHEN _r.created_at IS NOT NULL
           |        AND try_cast(_r.created_at AS BIGINT) IS NULL
           |       THEN 'bad_bigint:created_at' END,
           |  CASE WHEN _r.revenue_float IS NOT NULL
           |        AND try_cast(_r.revenue_float AS DOUBLE) IS NULL
           |       THEN 'bad_double:revenue_float' END,
           |  CASE WHEN _r.activity_kind IS NULL
           |        OR _r.activity_kind NOT IN (${ACTIVITY_KINDS.map("'" + _ + "'").mkString(",")})
           |       THEN 'bad_activity_kind' END
           |), x -> x IS NOT NULL)
           |END""".stripMargin))

    val good = typed
      .filter(size(col("_errors")) === 0)
      .select(
        col("_r.activity_kind").as("activity_kind"),
        col("_r.event_token").as("event_token"),
        col("_r.app_token").as("app_token"),
        col("_r.adid").as("adid"),
        col("_r.idfa").as("idfa"),
        col("_r.gps_adid").as("gps_adid"),
        col("created_at_ts").as("created_at"),
        col("_r.tracker").as("tracker"),
        col("_r.tracker_name").as("tracker_name"),
        col("_r.network_name").as("network_name"),
        col("_r.campaign_name").as("campaign_name"),
        col("_r.adgroup_name").as("adgroup_name"),
        col("_r.creative_name").as("creative_name"),
        col("_r.country").as("country"),
        col("_r.os_name").as("os_name"),
        col("_r.os_version").as("os_version"),
        col("_r.device_name").as("device_name"),
        col("is_organic_b").as("is_organic"),
        col("revenue"),
        col("_r.currency").as("currency"))

    val bad = typed
      .filter(size(col("_errors")) > 0)
      .select(
        col("value").as("line"),
        col("_errors").as("errors"),
        current_timestamp().as("failure_tstamp"))

    ParseResult(good, bad)
  }

  def read(spark: SparkSession, path: String): ParseResult =
    parseLines(spark.read.text(path))
}
