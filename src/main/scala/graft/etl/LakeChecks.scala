package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.QueryPlanningTracker
import org.apache.spark.sql.catalyst.expressions.{BindReferences, Coalesce, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CHECK CONSTRAINTS (r17 wave 3) — declared as table properties, the
  * Delta `delta.constraints.*` shape:
  *
  * {{{
  *   CREATE TABLE graft.ev (...) TBLPROPERTIES (
  *     'key' = 'event_id',
  *     'check.positive_value' = 'value >= 0')
  *   ALTER TABLE graft.ev SET TBLPROPERTIES      -- add later: existing
  *     ('check.known_type' = 'event_type IN (...)') -- data must pass
  *   ALTER TABLE graft.ev UNSET TBLPROPERTIES ('check.known_type')
  * }}}
  *
  * Semantics are SQL-standard CHECK: a row violates only when the
  * condition evaluates FALSE — NULL/UNKNOWN passes (`value >= 0` admits
  * NULL values; add `value IS NOT NULL` to refuse them). Enforcement
  * covers every write verb through TWO seams:
  *   - the DataFrame staging entry ([[LakeSnapshot.merge]] /
  *     [[LakeSnapshot.mergeDelta]]): SQL INSERT, DataFrameWriter
  *     appends, CTAS/RTAS, and the Scala API — the predicate fuses into
  *     the staging plan as a per-row filter that raises on violation
  *     (zero extra passes);
  *   - the delta row writer ([[graft.sources]]' LakeDeltaTaskWriter):
  *     SQL MERGE INTO, SQL UPDATE, and the native streaming sink — a
  *     codegen'd predicate per open writer, evaluated as rows stream
  *     (deletes carry no data row and are exempt by construction).
  * OPTIMIZE/ZORDER rewrites re-shuffle already-validated rows and
  * deliberately skip re-validation.
  *
  * Declarations are validated (parse + resolve against the declared
  * schema) at CREATE/CTAS; adding one through ALTER additionally
  * validates the EXISTING data (one filtered scan, refused on any
  * violating row) — a constraint that is immediately false would
  * otherwise poison every later write. Renaming or dropping a column a
  * check references refuses until the constraint is dropped.
  */
object LakeChecks {

  val Prefix = "check."

  /** The declared checks of the lake at `dir`: (name, condition SQL). */
  def checksOf(spark: SparkSession, dir: String): Seq[(String, String)] =
    graft.sources.GraftCatalog.readCreateProps(spark, dir).toSeq
      .collect { case (k, v) if k.startsWith(Prefix) =>
        k.stripPrefix(Prefix) -> v }
      .sortBy(_._1)

  /** Parse + analyze `cond` against `schema`; the resolved boolean
    * expression (unbound — references are Attributes of `schema`).
    * Loud on syntax errors, unknown columns, or a non-boolean type.
    */
  private def resolved(
      spark: SparkSession, schema: StructType, name: String,
      cond: String): Expression =
    resolvedAgainst(spark,
      DataTypeUtils.toAttributes(schema), name, cond)

  private def resolvedAgainst(
      spark: SparkSession,
      attrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      name: String, cond: String): Expression = {
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(cond)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"CHECK constraint '$name' does not parse: $cond", e) }
    val plan = Filter(parsed, LocalRelation(attrs))
    val analyzed =
      try spark.sessionState.analyzer
        .executeAndCheck(plan, new QueryPlanningTracker)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"CHECK constraint '$name' does not resolve against columns " +
          s"${attrs.map(_.name)}: $cond", e) }
    analyzed.collectFirst { case Filter(c, _) => c }.getOrElse(
      throw new IllegalStateException(
        s"CHECK constraint '$name' analysis lost its condition: $cond"))
  }

  /** CREATE-time declaration gate: the condition must parse and resolve
    * against the declared schema (data-free — nothing to scan yet).
    */
  def validateDeclaration(
      spark: SparkSession, schema: StructType, name: String,
      cond: String): Unit = {
    require(name.nonEmpty, "CHECK constraint needs a name: " +
      s"TBLPROPERTIES ('check.<name>' = '<condition>')")
    resolved(spark, schema, name, cond)
    ()
  }

  /** The columns `cond` references — rename/drop refusal reads this. */
  def referencedColumns(
      spark: SparkSession, schema: StructType, name: String,
      cond: String): Set[String] =
    resolved(spark, schema, name, cond).references.map(_.name).toSet

  /** `cond` bound against `schema` as a null-tolerant row predicate:
    * eval() == false EXACTLY on a genuine FALSE (the writer seam's
    * shape; serializable, codegen-compiled executor-side).
    */
  def boundCheck(
      spark: SparkSession, schema: StructType, name: String,
      cond: String): Expression = {
    // resolve and bind against the SAME attribute instances — two
    // toAttributes calls mint different exprIds and binding would miss
    val attrs = DataTypeUtils.toAttributes(schema)
    BindReferences.bindReference(
      Coalesce(Seq(
        resolvedAgainst(spark, attrs, name, cond), Literal(true))),
      attrs)
  }

  /** Fuse every declared check of `dir` into `df` as raising per-row
    * filters — the DataFrame staging seam. No declared checks: `df`
    * unchanged (one small properties read).
    */
  def applyTo(spark: SparkSession, dir: String, df: DataFrame): DataFrame = {
    val checks = checksOf(spark, dir)
    if (checks.isEmpty) return df
    // an evolution-tolerant batch may omit nullable columns the checks
    // reference (they null-fill at stage) — evaluate against the same
    // null-filled view, so `value IS NOT NULL`-style checks fire exactly
    // as they would on the stored rows; the original projection returns
    // after the filters
    val declared = graft.sources.GraftCatalog.readCreateProps(spark, dir)
      .get("schema").map(StructType.fromDDL)
    val have = df.columns.toSet
    val widened = declared.map(_.fields.filterNot(f => have(f.name))
      .foldLeft(df)((acc, f) =>
        acc.withColumn(f.name, lit(null).cast(f.dataType))))
      .getOrElse(df)
    val checked = checks.foldLeft(widened) { case (d, (name, cond)) =>
      d.filter(
        when(coalesce(expr(cond), lit(true)), lit(true))
          .otherwise(raise_error(concat(
            lit(s"graft-lake: CHECK constraint '$name' ($cond) " +
              "violated by row "),
            to_json(struct(df.columns.map(col).toIndexedSeq: _*))))))
    }
    checked.select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** ALTER-time gate for ADDING a check: declaration-valid AND the
    * existing data passes (one filtered scan, first violation refuses).
    * Empty/never-written lakes validate declaration-only.
    */
  def validateExisting(
      spark: SparkSession, dir: String, schema: StructType, name: String,
      cond: String): Unit = {
    validateDeclaration(spark, schema, name, cond)
    if (LakeSnapshot.currentEpoch(spark, dir) < 0) return
    val live = LakeSnapshot.read(spark, dir)
    val bad = live.filter(!coalesce(expr(cond), lit(true))).limit(1)
    require(bad.isEmpty,
      s"cannot add CHECK constraint '$name' ($cond): existing rows " +
        s"violate it, e.g. ${bad.collect().headOption.orNull}")
  }
}
