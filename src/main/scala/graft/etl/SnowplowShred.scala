package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Self-describing-JSON shredding (SURVEY.md §2.1 J4).
  *
  * Snowplow wraps payloads as `{"schema": "iglu:...", "data": ...}`;
  * `unstruct_event` carries one wrapped payload, `contexts` /
  * `derived_contexts` carry an array of them. Shredded with explicit
  * `from_json` schemas (H4) into a schema key + a string map (H6) per
  * payload; context arrays explode one row per context (L5).
  */
object SnowplowShred {

  /** `{"schema": ..., "data": {k: v}}` with scalar-ish data values. */
  val SELF_DESCRIBING: StructType = StructType(Seq(
    StructField("schema", StringType),
    StructField("data", MapType(StringType, StringType))))

  /** Outer envelope for `unstruct_event`: data is itself self-describing. */
  val UNSTRUCT_ENVELOPE: StructType = StructType(Seq(
    StructField("schema", StringType),
    StructField("data", SELF_DESCRIBING)))

  /** Envelope for `contexts`: data is an array of self-describing payloads. */
  val CONTEXTS_ENVELOPE: StructType = StructType(Seq(
    StructField("schema", StringType),
    StructField("data", ArrayType(SELF_DESCRIBING))))

  /** Adds `event_schema` + `event_data` (map) columns from `unstruct_event`. */
  def shredUnstruct(good: DataFrame): DataFrame =
    good
      .withColumn("_ue", from_json(col("unstruct_event"), UNSTRUCT_ENVELOPE))
      .withColumn("event_schema", col("_ue.data.schema"))
      .withColumn("event_data", col("_ue.data.data"))
      .drop("_ue")

  /** One row per attached context: (event_id, context_schema, context_data). */
  def explodeContexts(good: DataFrame): DataFrame =
    good
      .select(
        col("event_id"),
        explode(from_json(col("contexts"), CONTEXTS_ENVELOPE).getField("data"))
          .as("_ctx"))
      .select(
        col("event_id"),
        col("_ctx.schema").as("context_schema"),
        col("_ctx.data").as("context_data"))
}
