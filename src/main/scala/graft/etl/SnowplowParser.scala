package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parsed feed split into loadable rows and dead-lettered bad rows (A9).
  * Bad rows are never dropped: they carry the raw line plus the reasons.
  */
case class ParseResult(good: DataFrame, bad: DataFrame)

/** Snowplow enriched-event TSV parser (SURVEY.md §2.1 J1/J3/A2/A9).
  *
  * Pure column expressions over one `split()` pass — no UDFs, stays inside
  * whole-stage codegen, and (being a narrow projection) pushes down through
  * to the text scan at any scale. Strictness:
  *
  *   - field count must be exactly 131 (line-shift protection);
  *   - empty string → NULL (TSV convention);
  *   - typed fields coerce via try_cast semantics — a non-NULL raw value
  *     that fails coercion marks the row bad (never silently nulled);
  *   - booleans accept the Snowplow `0`/`1` encoding only;
  *   - `event_id` must be a UUID; REQUIRED fields must be non-NULL.
  */
object SnowplowParser {
  import SnowplowSchema._

  private def rawField(i: Int): String = s"nullif(_f[$i], '')"

  /** SQL expression string producing the typed value of field `i`. */
  private def typedExpr(name: String, dt: DataType, i: Int): String = {
    val raw = rawField(i)
    dt match {
      case StringType    => raw
      case IntegerType   => s"try_cast($raw AS INT)"
      case DoubleType    => s"try_cast($raw AS DOUBLE)"
      case TimestampType => s"try_cast($raw AS TIMESTAMP)"
      case BooleanType =>
        s"CASE WHEN $raw = '1' THEN true WHEN $raw = '0' THEN false END"
      case other => sys.error(s"unsupported snowplow field type $other")
    }
  }

  /** Per-field error message, NULL when the field is fine. */
  private def errExpr(name: String, dt: DataType, i: Int): String = {
    val raw = rawField(i)
    val typed = typedExpr(name, dt, i)
    val coercion =
      if (dt == StringType) None
      else Some(s"WHEN $raw IS NOT NULL AND ($typed) IS NULL " +
        s"THEN 'bad_${dt.simpleString}:$name'")
    val uuid =
      if (name == "event_id")
        Some(s"WHEN $raw IS NOT NULL AND NOT $raw RLIKE '$UUID_RE' " +
          s"THEN 'bad_uuid:$name'")
      else None
    val required =
      if (REQUIRED.contains(name)) Some(s"WHEN $raw IS NULL THEN 'missing:$name'")
      else None
    val whens = (required ++ uuid ++ coercion).mkString(" ")
    if (whens.isEmpty) "CAST(NULL AS STRING)" else s"CASE $whens END"
  }

  /** Parse a DataFrame of raw lines (single `value` string column). */
  def parseLines(raw: DataFrame): ParseResult = {
    val withFields = raw
      .withColumn("_f", split(col("value"), "\t", -1))
      .withColumn("_n", size(col("_f")))

    val errList = FIELDS.zipWithIndex.map { case ((n, t), i) => errExpr(n, t, i) }
    val errorsCol =
      s"""filter(
         |  CASE WHEN _n <> $NUM_FIELDS
         |       THEN array(concat('field_count:', CAST(_n AS STRING)))
         |       ELSE array(${errList.mkString(",\n    ")})
         |  END,
         |  x -> x IS NOT NULL)""".stripMargin

    val typed = withFields.withColumn("_errors", expr(errorsCol))

    val goodCols: Seq[Column] = FIELDS.zipWithIndex.map { case ((n, t), i) =>
      expr(typedExpr(n, t, i)).as(n)
    }
    val good = typed
      .filter(size(col("_errors")) === 0)
      .select(goodCols: _*)

    val bad = typed
      .filter(size(col("_errors")) > 0)
      .select(
        col("value").as("line"),
        col("_errors").as("errors"),
        current_timestamp().as("failure_tstamp"))

    ParseResult(good, bad)
  }

  /** Read + parse a TSV path (A2). */
  def read(spark: org.apache.spark.sql.SparkSession, path: String): ParseResult =
    parseLines(spark.read.text(path))
}
