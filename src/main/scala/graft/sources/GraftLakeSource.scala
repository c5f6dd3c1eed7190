package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, PrimitiveType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, InsertableRelation}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.LakeSnapshot
import graft.etl.LakeSnapshot.LakeState

/** DataSource V2 BATCH relation over the snapshot lake (round-14 ring):
  * `spark.read.format("graft-lake").option("path", dir)` — so external
  * tools (SQL-only clients, other engines' Spark jobs) compose over the
  * lake without calling the Scala API. `option("epoch", e)` pins a
  * time-travel snapshot; both surfaces fold the SAME manifest state
  * ([[LakeSnapshot.tableState]]), so a DSv2 read and a
  * [[LakeSnapshot.read]] can never disagree on what is committed.
  *
  * Plan shape, built for the 100 TB case:
  *   - planning is driver-side METADATA only: one manifest fold + one
  *     file listing per live generation directory of the SELECTED days;
  *   - `day` filters push down into that selection
  *     ([[SupportsPushDownFilters]]) — an untouched day's files are
  *     never listed, let alone opened — and
  *     [[SupportsRuntimeFiltering]] re-prunes the day set at execution
  *     time, so a join against a small dimension of days dynamically
  *     prunes partitions the static plan could not;
  *   - column pruning ([[SupportsPushDownRequiredColumns]]) reaches the
  *     record conversion: unprojected columns are never materialized;
  *   - one [[InputPartition]] PER BASE FILE, so scan parallelism follows
  *     the data. MERGE-ON-READ folding is executor-side and
  *     shuffle-free: each base-file reader consults its day's row-delta
  *     key-state (O(batch) by design — OPTIMIZE absorbs deltas) and
  *     drops superseded keys while streaming, the equality-delete shape
  *     Iceberg uses — the state folds ONCE PER EXECUTOR per day
  *     ([[LakeDeltaStateCache]], r14: delta-file opens are bounded by
  *     deltas-per-day × executors, never baseFiles × deltas); one extra
  *     partition per delta-carrying day emits the youngest-wins upsert
  *     rows. Delta-free days (the steady state after OPTIMIZE) pay zero
  *     fold cost;
  *   - the column MAPPING (rename/drop as manifest-only commits) is
  *     applied at conversion: files keep physical names forever, the
  *     reader surfaces the logical names of the pinned epoch.
  *
  * Readers are the same standalone parquet-example shape as
  * [[CdcPartitionReader]], extended with INT96 (legacy Spark timestamp)
  * and MILLIS/NANOS unit normalization so any generation a Spark writer
  * ever produced stays readable.
  */
class GraftLakeSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-lake"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val opts =
      GraftLakeSource.resolveAsOf(spark, options.asScala.toMap)
    val dir = GraftLakeSource.dirOf(opts)
    // `changes=true` (the Delta readChangeFeed precedent): the FULL-TABLE
    // STREAM's schema — data columns + change stamps (r15, VERDICT #4)
    if (opts.get("changes").exists(_.toBoolean))
      return LakeFullTableStream.streamSchema(spark, dir)
    // a FIRST write targets a lake with no committed snapshot yet — no
    // schema to infer; the table accepts any schema and the write path
    // records it (reads of an empty lake still fail loudly in the scan)
    if (LakeSnapshot.currentEpoch(spark, dir) < 0) return new StructType()
    opts.get("epoch").map(_.toInt) match {
      case Some(e) => LakeSnapshot.readAt(spark, dir, e).schema
      case None => LakeSnapshot.read(spark, dir).schema
    }
  }

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LakeTable(schema, GraftLakeSource.resolveAsOf(
      SparkSession.active, properties.asScala.toMap))
}

object GraftLakeSource {
  private[sources] def dirOf(props: Map[String, String]): String =
    props.getOrElse("path",
      sys.error("graft-lake: the 'path' option (lake directory) is required"))

  /** Diagnostics (spec-gated, like [[LakeAggPushdown.pushedAggs]]):
    * LIMIT/TopN pushes accepted by the builder, and plans where the cap
    * actually stopped the listing early (proven coverage reached k).
    */
  val pushedLimits = new java.util.concurrent.atomic.AtomicLong(0L)
  val limitCappedPlans = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Instant parsing shared by `timestampAsOf` (batch) and
    * `startingTimestamp` (stream): epoch millis, `yyyy-MM-dd[ HH:mm:ss]`,
    * or an ISO instant. Local-datetime forms resolve in the SESSION
    * zone, not the JVM default (ADVICE r18): the session-timezone
    * contract every other timestamp seam standardizes on — two drivers
    * with different OS zones must pin the same epoch.
    */
  private[sources] def parseInstantMs(raw: String): Long =
    raw.toLongOption.getOrElse {
      val zone = java.time.ZoneId.of(SparkSession.active
        .sessionState.conf.sessionLocalTimeZone)
      try {
        val ldt =
          if (raw.length == 10)
            java.time.LocalDate.parse(raw).atStartOfDay()
          else java.time.LocalDateTime.parse(raw,
            java.time.format.DateTimeFormatter
              .ofPattern("yyyy-MM-dd HH:mm:ss"))
        ldt.atZone(zone).toInstant.toEpochMilli
      } catch { case _: java.time.format.DateTimeParseException =>
        java.time.Instant.parse(raw).toEpochMilli }
    }

  /** `option("timestampAsOf", ...)` on the path-based read (r17 wave 3,
    * the Delta option's shape): resolves to the youngest epoch committed
    * at or before the instant and rides the SAME epoch-pinned read as
    * `option("epoch", ...)`. Accepts epoch millis, `yyyy-MM-dd[ HH:mm:ss]`,
    * or an ISO instant; loud when it predates every commit or when both
    * pins are given.
    */
  private[sources] def resolveAsOf(
      spark: SparkSession, props: Map[String, String]): Map[String, String] =
    props.keys.find(_.equalsIgnoreCase("timestampAsOf")) match {
      case None => props
      case Some(k) =>
        require(!props.contains("epoch"),
          "graft-lake: give option 'epoch' OR 'timestampAsOf', not both")
        val raw = props(k)
        val tMs: Long = parseInstantMs(raw)
        val dir = dirOf(props)
        val epoch = LakeSnapshot.epochAtOrBefore(spark, dir, tMs)
          .getOrElse(sys.error(
            s"graft-lake: timestampAsOf $raw predates every commit of " +
              dir))
        props - k + ("epoch" -> epoch.toString)
    }

  /** Render a pushed filter value for the STRING day-partition compare.
    * ISO dates order lexically, so range filters stay exact.
    */
  private[sources] def dayStr(v: Any): String = v match {
    case d: java.sql.Date => d.toString
    case d: java.time.LocalDate => d.toString
    case s: String => s
    case u: UTF8String => u.toString
    case other => other.toString
  }

  /** DAY pruning DERIVED from event-time predicates (r17 wave 6 — the
    * Delta generated-column partition-filter shape): `day` IS the
    * session-zone date of `ts` by the lake's write contract
    * (`to_date(tsCol)` at write uses the session timezone), so
    *   ts >/>= v  ⇒ day >= date(v),   ts </<= v ⇒ day <= date(v),
    *   ts = v     ⇒ day = date(v),    ts IN (..) ⇒ day IN (dates).
    * `zone` must be the SAME zone `to_date` used at write — the caller
    * passes the session zone (ADVICE r17: a hard-coded UTC here under a
    * non-UTC session derived UTC dates against local-labeled partitions
    * and silently dropped rows near day boundaries).
    * Users filter on event time, not on the derived partition column —
    * without this, `WHERE ts >= now() - INTERVAL 1 DAY` on a 100 TB
    * event table lists (and stat-probes) every day ever written.
    * Derived filters only SHRINK the day listing; the ts predicates
    * stay pushed as stat hints AND residual, so row-level results are
    * untouched even if the derivation were too wide.
    */
  private[sources] def derivedDayFilters(
      tsCol: String, filters: Seq[sources.Filter],
      zone: java.time.ZoneId = java.time.ZoneOffset.UTC): Seq[sources.Filter] = {
    def dayOf(v: Any): Option[String] = v match {
      case t: java.sql.Timestamp => Some(t.toInstant
        .atZone(zone).toLocalDate.toString)
      case t: java.time.Instant =>
        Some(t.atZone(zone).toLocalDate.toString)
      case _ => None
    }
    filters.flatMap {
      case sources.EqualTo(`tsCol`, v) =>
        dayOf(v).map(sources.EqualTo("day", _))
      case sources.GreaterThan(`tsCol`, v) =>
        dayOf(v).map(sources.GreaterThanOrEqual("day", _))
      case sources.GreaterThanOrEqual(`tsCol`, v) =>
        dayOf(v).map(sources.GreaterThanOrEqual("day", _))
      case sources.LessThan(`tsCol`, v) =>
        dayOf(v).map(sources.LessThanOrEqual("day", _))
      case sources.LessThanOrEqual(`tsCol`, v) =>
        dayOf(v).map(sources.LessThanOrEqual("day", _))
      case sources.In(`tsCol`, vs) if vs.nonEmpty && vs.length <= 32 =>
        val ds = vs.toSeq.map(dayOf)
        if (ds.forall(_.isDefined))
          Some(sources.In("day", ds.flatten.distinct.toArray[Any]))
        else None
      case _ => None
    }
  }

  /** Is this a filter the planner can turn into exact day pruning? */
  private[sources] def isDayFilter(f: sources.Filter): Boolean = f match {
    case sources.EqualTo("day", _) | sources.In("day", _) |
         sources.GreaterThan("day", _) | sources.GreaterThanOrEqual("day", _) |
         sources.LessThan("day", _) | sources.LessThanOrEqual("day", _) |
         sources.IsNotNull("day") => true
    case _ => false
  }

  private[sources] def dayOk(day: String, fs: Seq[sources.Filter]): Boolean =
    fs.forall {
      case sources.EqualTo("day", v) => day == dayStr(v)
      case sources.In("day", vs) => vs.exists(v => day == dayStr(v))
      case sources.GreaterThan("day", v) => day > dayStr(v)
      case sources.GreaterThanOrEqual("day", v) => day >= dayStr(v)
      case sources.LessThan("day", v) => day < dayStr(v)
      case sources.LessThanOrEqual("day", v) => day <= dayStr(v)
      case _ => true // IsNotNull (partition values are never null), residual
    }

  /** A pushed filter as a Column over the folded view — how DELETE WHERE
    * selects its victims. None when the shape is untranslatable
    * (canDeleteWhere then refuses loudly at analysis).
    */
  private[sources] def filterColumn(
      f: sources.Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit, not}
    f match {
      case sources.EqualTo(a, v) => Some(col(a) === lit(v))
      case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
      case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
      case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case sources.LessThan(a, v) => Some(col(a) < lit(v))
      case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
      case sources.IsNull(a) => Some(col(a).isNull)
      case sources.IsNotNull(a) => Some(col(a).isNotNull)
      case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
      case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
      case sources.StringContains(a, v) => Some(col(a).contains(v))
      case sources.And(l, r) =>
        for (lc <- filterColumn(l); rc <- filterColumn(r)) yield lc && rc
      case sources.Or(l, r) =>
        for (lc <- filterColumn(l); rc <- filterColumn(r)) yield lc || rc
      case sources.Not(c) => filterColumn(c).map(not)
      case sources.AlwaysTrue() => Some(lit(true))
      case sources.AlwaysFalse() => Some(lit(false))
      case _ => None
    }
  }
}

private[sources] class LakeTable(
    tableSchema: StructType, props: Map[String, String])
  extends Table with SupportsRead with SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsDelete
  with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  override def name(): String = s"graft-lake:${props.getOrElse("path", "?")}"

  /** The table's CHECK constraints as Spark-native [[Constraint]]s —
    * what `ALTER TABLE ... ADD/DROP CONSTRAINT` resolves against and
    * DESCRIBE surfaces (r18). Derived live from the same `check.<name>`
    * declarations [[graft.etl.LakeChecks]] enforces at every write.
    */
  override def constraints()
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] = {
    val spark = SparkSession.active
    val dir = props.getOrElse("path", return Array.empty)
    GraftCatalog.readCreateProps(spark, dir).toSeq
      .filter(_._1.startsWith(graft.etl.LakeChecks.Prefix))
      .sortBy(_._1)
      .map { case (k, v) =>
        org.apache.spark.sql.connector.catalog.constraints.Constraint
          .check(k.stripPrefix(graft.etl.LakeChecks.Prefix))
          .predicateSql(v)
          .build(): org.apache.spark.sql.connector.catalog.constraints.Constraint
      }.toArray
  }

  /** key/ts surface NON-NULLABLE: they are the table's row identity
    * (every committed row derived its day partition from ts, and key is
    * the merge key — neither is ever null by construction), and Spark's
    * row-level-command planner refuses nullable row-ID attributes, so
    * without this MERGE INTO could never plan.
    */
  override def schema(): StructType = {
    val id: Set[String] = props.get("key")
      .map(LakeSnapshot.keyParts).getOrElse(Nil).toSet ++
      props.get("ts").toSet
    if (id.isEmpty) tableSchema
    else StructType(tableSchema.map(f =>
      if (id.contains(f.name)) f.copy(nullable = false) else f))
  }

  /** SQL MERGE INTO / UPDATE — delta-based row-level operations landing
    * as ONE merge-on-read delta commit (see [[LakeRowLevelOperation]]).
    * DELETE keeps the [[deleteWhere]] fast paths (manifest-only day
    * drops) via [[org.apache.spark.sql.connector.catalog.SupportsDelete]].
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    new org.apache.spark.sql.connector.write.RowLevelOperationBuilder {
      override def build()
          : org.apache.spark.sql.connector.write.RowLevelOperation =
        new LakeRowLevelOperation(schema(), props, info.command())
    }

  /** Surfaces the merge key / event-time declaration, the path, the
    * COMMENT, and any user TBLPROPERTIES to DESCRIBE TABLE EXTENDED /
    * SHOW CREATE TABLE and every other properties reader. The schema
    * DDL snapshot and a pinned epoch stay internal.
    */
  override def properties(): util.Map[String, String] =
    props.view.filterKeys(k => k != "schema" && k != "epoch")
      .toMap.asJava

  override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
    filters.forall(f => GraftLakeSource.filterColumn(f).isDefined)

  /** `DELETE FROM graft.t WHERE ...` — two tiers:
    *   - day-only predicates drop whole days as a MANIFEST-ONLY commit
    *     (zero data read at any size);
    *   - anything else reads the folded view once, selects the matching
    *     (key, ts) pairs, and commits them as a merge-on-read row-delta
    *     DELETE — O(matching rows), never a table rewrite.
    */
  override def deleteWhere(filters: Array[sources.Filter]): Unit = {
    val spark = SparkSession.active
    val dir = GraftLakeSource.dirOf(props)
    if (filters.nonEmpty && filters.forall(GraftLakeSource.isDayFilter)) {
      val live = LakeSnapshot.tableState(spark, dir).days.keys.toSeq
      val victims = live.filter(d => GraftLakeSource.dayOk(d, filters.toSeq))
      // empty victims must be a no-op — dropDays(Nil) means TRUNCATE
      if (victims.nonEmpty) LakeSnapshot.dropDays(spark, dir, victims)
      return
    }
    val cond = filters.toSeq.flatMap(GraftLakeSource.filterColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    require(filters.forall(f => GraftLakeSource.filterColumn(f).isDefined),
      s"graft-lake: untranslatable DELETE predicate(s) " +
        s"${filters.mkString(", ")}")
    val state = LakeSnapshot.tableState(spark, dir)
    val key = state.key
      .orElse(GraftCatalog.readCreateProps(spark, dir).get("key"))
      .getOrElse(sys.error(
        s"graft-lake: no recorded key at $dir — nothing was ever merged"))
    val tsPhysical =
      GraftCatalog.readCreateProps(spark, dir).getOrElse("ts", "ts")
    val tsLogical = state.logicalFor(tsPhysical).getOrElse(sys.error(
      s"graft-lake: event-time column '$tsPhysical' was dropped — " +
        "row-level DELETE needs it to derive the day"))
    val victims = LakeSnapshot.read(spark, dir).filter(cond)
      .select(org.apache.spark.sql.functions.col(key),
        org.apache.spark.sql.functions.col(tsLogical))
    LakeSnapshot.deleteKeysDelta(spark, dir, victims, key, tsLogical)
    ()
  }

  /** `TRUNCATE TABLE graft.t`: drop every live day, manifest-only. */
  override def truncateTable(): Boolean = {
    val spark = SparkSession.active
    LakeSnapshot.dropDays(spark, GraftLakeSource.dirOf(props))
    true
  }

  override def capabilities(): util.Set[TableCapability] =
    // BATCH_WRITE + V1_BATCH_WRITE: BATCH_WRITE is what
    // DataFrameWriter.save() checks to route mode("append") through V2
    // at all, V1_BATCH_WRITE marks the write as a V1 bridge — it hands
    // the whole DataFrame to the one transactional staging/commit
    // implementation (claim → stage → conditional manifest row) instead
    // of reimplementing it as per-partition writers (the Delta-style
    // V2-table/V1-write bridge). No TRUNCATE/OVERWRITE_BY_FILTER:
    // mode("overwrite") fails loudly at analysis; replacing committed
    // data is [[graft.etl.LakeSnapshot.merge]]/OPTIMIZE territory.
    // Deliberately NOT ACCEPT_ANY_SCHEMA (round 14): the analyzer skips
    // MergeIntoTable resolution entirely for accept-any-schema targets
    // (`skipSchemaResolution` — connectors like Delta ship their own
    // analyzer extension instead), which would leave SQL MERGE INTO
    // permanently unresolvable against foreign sessions graft cannot
    // inject rules into. With the real schema declared, Spark's own
    // resolution + store assignment handle INSERT/writeTo/MERGE (missing
    // nullable columns null-fill, literals coerce); the one trade is
    // that ADDING a column now goes through the Scala API
    // ([[graft.etl.LakeSnapshot.merge]] unions by name) rather than a
    // widened DSv2 append — schema evolution stays a table feature, the
    // writer surface just stops being the door for it.
    // STREAMING_WRITE: writeStream.format("graft-lake") — the native
    // streaming sink ([[LakeStreamingWrite]]), tag-idempotent MoR delta
    // commits per micro-batch. MICRO_BATCH_READ: the full-table stream
    // ([[LakeFullTableStream]], r15) — readStream.format("graft-lake")
    // .option("changes", "true"): pinned initial snapshot then the CDC
    // tail. AUTOMATIC_SCHEMA_EVOLUTION (r15, VERDICT r14 #8): `MERGE
    // WITH SCHEMA EVOLUTION INTO` — Spark's own
    // ResolveMergeIntoSchemaEvolution computes the missing source
    // columns and routes them through GraftCatalog.alterTable's
    // AddColumn (the same manifest binding as explicit ALTER), then the
    // merge proceeds against the widened table. Syntax-gated by Spark
    // (the native analog of Delta's autoMerge conf): a plain MERGE with
    // an unknown column stays today's loud analysis error.
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeScanBuilder(tableSchema, props)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new LakeWriteBuilder(props ++ info.options.asScala.toMap, info)
}

/** `df.write.format("graft-lake").mode("append")` — external tools
  * MUTATE the lake without the Scala API. Semantics are upsert-by-key,
  * not blind append: the default lands the batch as a MERGE-ON-READ
  * row-delta commit (O(batch), never aborts, concurrent writers both
  * commit); `option("writeMode", "cow")` takes the whole-day
  * copy-on-write path instead (OCC abort + auto-rebase via
  * `option("retries", n)`); `option("cdf", "true")` stages write-time
  * change sidecars on either path. `option("key", …)` is required on
  * first write and validated against the recorded table key afterwards;
  * `option("ts", …)` names the event-time column (default `ts`).
  * `writeStream.format("graft-lake")` rides [[LakeStreamingWrite]]
  * instead (same options, tag-idempotent per-batch delta commits).
  */
private[sources] class LakeWriteBuilder(
    props: Map[String, String], info: LogicalWriteInfo)
  extends WriteBuilder {

  override def build(): Write = new V1Write {
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new LakeStreamingWrite(props, info)
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: org.apache.spark.sql.DataFrame,
            overwrite: Boolean): Unit = {
          require(!overwrite,
            "graft-lake: overwrite is not a lake operation — append " +
              "merges by key; use OPTIMIZE/deleteKeys for rewrites")
          val spark = data.sparkSession
          val dir = GraftLakeSource.dirOf(props)
          // key resolution: explicit option > the recorded table key >
          // the catalog CREATE's declaration (so a first INSERT into a
          // freshly created table knows its merge key)
          lazy val created = GraftCatalog.readCreateProps(spark, dir)
          val key = props.get("key")
            .orElse(LakeSnapshot.tableState(spark, dir).key)
            .orElse(created.get("key"))
            .getOrElse(sys.error(
              "graft-lake: option 'key' is required on the first write " +
                "(no recorded table key yet)"))
          val ts = props.get("ts")
            .orElse(created.get("ts")).getOrElse("ts")
          // belt-and-suspenders type alignment: Spark's store assignment
          // coerces against the TABLE's declared schema, but a first
          // write resolves against the empty inferred schema and arrives
          // raw (DECIMAL(4,1) literals, …) — align every column the lake
          // already KNOWS to its declared type; unknown columns pass
          // through untouched
          val target: Option[StructType] =
            if (LakeSnapshot.currentEpoch(spark, dir) >= 0)
              Some(StructType(LakeSnapshot.read(spark, dir)
                .schema.filterNot(_.name == "day")))
            else created.get("schema").map(StructType.fromDDL)
          val aligned = target match {
            case None => data
            case Some(t) =>
              val types = t.map(f => f.name -> f.dataType).toMap
              import org.apache.spark.sql.functions.col
              data.select(data.columns.toSeq.map { c =>
                types.get(c).map(dt => col(c).cast(dt).as(c))
                  .getOrElse(col(c))
              }: _*)
          }
          // `option("bloom", "col1,col2")` (r17 wave 7): persist the
          // bloom declaration for PATH-BASED lakes — the same
          // properties entry a catalog CREATE records, so the sidecar
          // stage and the planner probes work without a catalog. Only
          // ever ADDS/updates the one key; recorded BEFORE the merge so
          // this very write's generation already stages blooms.
          props.get("bloom").filter(_.trim.nonEmpty).foreach { cols =>
            if (!created.get("bloom").contains(cols))
              GraftCatalog.upsertProps(spark, dir, Map("bloom" -> cols))
          }
          val cdf = props.get("cdf").exists(_.toBoolean)
          val retries = props.get("retries").map(_.toInt).getOrElse(0)
          props.getOrElse("writeMode", "delta") match {
            case "delta" =>
              LakeSnapshot.mergeDelta(spark, dir, aligned, key, ts,
                cdf = cdf, retries = retries)
            case "cow" =>
              LakeSnapshot.merge(spark, dir, aligned, key, ts,
                retries = retries, cdf = cdf)
            case other => sys.error(
              s"graft-lake: unknown writeMode '$other' (delta | cow)")
          }
          ()
        }
      }
  }
}

private[sources] class LakeScanBuilder(
    fullSchema: StructType, props: Map[String, String])
  extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
  with org.apache.spark.sql.connector.read.SupportsPushDownLimit
  with org.apache.spark.sql.connector.read.SupportsPushDownTopN {

  private var required: StructType = fullSchema
  private var dayFilters: Array[sources.Filter] = Array.empty
  private var statFilters: Array[sources.Filter] = Array.empty
  private var aggPush: Option[(StructType, Seq[Array[Any]])] = None
  private var limitK: Option[Int] = None
  private var limitReverse: Boolean = false
  private var limitWholeDay: Boolean = false

  /** LIMIT/TopN eligibility (r18, VERDICT r17 #3): the plan-time cap on
    * emitted InputPartitions is safe ONLY when the file row counts we
    * stop on are EXACT post-read counts — pure-base surviving days (a
    * COW base file's rows are all live; deltas/DVs remove rows at fold)
    * and no residual filters (a residual could empty a file we counted).
    * Same partial-push discipline as [[LakeAggPushdown]]: any refusal
    * falls back to the full listing, never a wrong answer — Spark keeps
    * its own LIMIT/Sort on top either way (isPartiallyPushed).
    */
  private def limitSafe(): Boolean = {
    if (statFilters.nonEmpty) return false
    val spark = SparkSession.active
    val dir = GraftLakeSource.dirOf(props)
    val state = LakeSnapshot.tableState(
      spark, dir, props.get("epoch").map(_.toInt))
    state.nonEmpty && state.days.toSeq
      .filter { case (d, _) => GraftLakeSource.dayOk(d, dayFilters.toSeq) }
      .forall { case (_, ds) => ds.deltas.isEmpty && ds.dvs.isEmpty }
  }

  override def pushLimit(limit: Int): Boolean =
    limit > 0 && limitSafe() && {
      limitK = Some(limit)
      GraftLakeSource.pushedLimits.incrementAndGet()
      true
    }

  /** `ORDER BY day [DESC] LIMIT k` — and the user-common
    * `ORDER BY ts [DESC] LIMIT k`: `to_date(ts)` is monotone in ts, so
    * every global top-k-by-ts row lives inside the extreme days that
    * cover ≥ k exact rows (a row in an excluded earlier day is strictly
    * smaller than every row of an included later day, and vice versa
    * for ASC). Whole-day granularity: within-day order is unknown at
    * planning, so the cap only ever drops ENTIRE days beyond coverage.
    */
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    if (limit <= 0 || orders.length != 1) return false
    val o = orders(0)
    val colName = o.expression() match {
      case c: NamedReference if c.fieldNames.length == 1 => c.fieldNames()(0)
      case _ => return false
    }
    val spark = SparkSession.active
    val dir = GraftLakeSource.dirOf(props)
    val sortsLikeDay = colName == "day" || {
      // the declared event-time column (current logical name): its order
      // agrees with day order by the write contract day = to_date(ts) —
      // which is monotone in ts only under ONE fixed write zone, so a
      // table whose writes spanned zones (ts.zone=mixed) or whose zone
      // was never recorded refuses the push (ADVICE r18); the read
      // OPTION remains the user's explicit single-zone assertion
      val state = LakeSnapshot.tableState(
        spark, dir, props.get("epoch").map(_.toInt))
      val cp = GraftCatalog.readCreateProps(spark, dir)
      val declared = for {
        t <- cp.get("ts")
        z <- cp.get("ts.zone") if z != GraftCatalog.TsZoneMixed
      } yield t
      declared.orElse(props.get("ts").filter(_ => cp.get("ts").isEmpty))
        .flatMap(state.logicalFor).contains(colName)
    }
    sortsLikeDay && limitSafe() && {
      limitK = Some(limit)
      limitReverse = o.direction() ==
        org.apache.spark.sql.connector.expressions.SortDirection.DESCENDING
      limitWholeDay = true
      GraftLakeSource.pushedLimits.incrementAndGet()
      true
    }
  }

  // partial push, both shapes: Spark keeps the real LIMIT (and the Sort
  // for TopN) above the scan — the push only SHRINKS the listing
  override def isPartiallyPushed(): Boolean = true

  // METADATA-ONLY COUNT/MIN/MAX (r17, see [[LakeAggPushdown]]): PARTIAL
  // pushdown — Spark's final aggregate merges the one partial row, and
  // a refused push falls back to the normal scan, never a wrong answer.
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = false

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    // residual non-day filters change the row population; Spark only
    // attempts the push when no Filter node remains, but guard anyway
    if (statFilters.nonEmpty) return false
    val spark = SparkSession.active
    val dir = GraftLakeSource.dirOf(props)
    val state = LakeSnapshot.tableState(
      spark, dir, props.get("epoch").map(_.toInt))
    if (!state.nonEmpty) return false
    (for {
      gbSpecs <- LakeAggPushdown.specsOf(agg, fullSchema)
      (groupByDay, specs) = gbSpecs
      rows <- LakeAggPushdown.compute(
        spark, dir, state, dayFilters.toSeq, groupByDay, specs)
    } yield {
      aggPush = Some((LakeAggPushdown.schemaOf(groupByDay, specs), rows))
      LakeAggPushdown.pushedAggs.incrementAndGet()
      true
    }).getOrElse(false)
  }

  override def pushFilters(
      filters: Array[sources.Filter]): Array[sources.Filter] = {
    val (day, rest) = filters.partition(GraftLakeSource.isDayFilter)
    dayFilters = day
    // comparison filters on data columns become ROW-GROUP SKIP hints:
    // the reader checks footer min/max stats per row group (parquet's
    // native skipping granularity, executor-side, zero driver cost) —
    // they stay RESIDUAL too, so Spark re-evaluates them row-by-row and
    // a stats miss can never change results
    statFilters = rest.filter(f => RowGroupFilter.of(f).isDefined)
    rest // residual: Spark evaluates everything else above the scan
  }

  override def pushedFilters(): Array[sources.Filter] =
    dayFilters ++ statFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark hands the projection it needs; an empty prune (count(*))
    // still reads day-partition row counts correctly via empty rows
    required = requiredSchema

  override def build(): Scan = aggPush match {
    case Some((out, values)) =>
      new LakeAggScan(out, values, GraftLakeSource.dirOf(props))
    case None =>
      new LakeScan(required, props, dayFilters.toSeq, statFilters.toSeq,
        limitK, limitReverse, limitWholeDay)
  }
}

/** Per-query scan observability (r18, VERDICT r17 #6): the skip tiers
  * counted their wins only in spec-gated globals — a user could not ask
  * "did my filter prune?". DSv2 custom metrics are Spark's own surface
  * for exactly this (they render per-query in the SQL UI node and
  * aggregate executor-side values automatically): the planner-side
  * tiers ride [[LakeScan.reportDriverMetrics]], the row-group tier
  * rides each reader's `currentMetricsValues`.
  */
// Spark re-instantiates CustomMetric classes REFLECTIVELY on the
// listener side (SQLAppStatusListener), so each one must be a top-level
// class with a zero-argument constructor — a parameterized factory class
// throws "did not have a zero-argument constructor" on every query.
private[sources] class GraftDaysSelectedMetric
  extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "graftDaysSelected"
  override def description(): String = "day partitions surviving pruning"
}
private[sources] class GraftDaysPrunedMetric
  extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "graftDaysPruned"
  override def description(): String =
    "day partitions pruned (filters + derived ts bounds)"
}
private[sources] class GraftFilesPlannedMetric
  extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "graftFilesPlanned"
  override def description(): String =
    "base files planned after all skip tiers"
}
private[sources] class GraftFilesSkippedByStatsMetric
  extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "graftFilesSkippedByStats"
  override def description(): String =
    "base files skipped by the stats sidecar"
}
private[sources] class GraftFilesSkippedByBloomMetric
  extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "graftFilesSkippedByBloom"
  override def description(): String =
    "base files skipped by the bloom sidecar"
}
private[sources] class GraftDaysDroppedByLimitMetric
  extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "graftDaysDroppedByLimit"
  override def description(): String =
    "day partitions never listed thanks to the pushed LIMIT/TopN cap"
}
private[sources] class GraftRowGroupsSkippedMetric
  extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "graftRowGroupsSkipped"
  override def description(): String =
    "row groups skipped executor-side (footer stats + native blooms)"
}

private[sources] object GraftScanMetrics {
  import org.apache.spark.sql.connector.metric.{CustomMetric, CustomTaskMetric}
  final case class Task(n: String, v: Long) extends CustomTaskMetric {
    override def name(): String = n
    override def value(): Long = v
  }
  val supported: Array[CustomMetric] = Array(
    new GraftDaysSelectedMetric,
    new GraftDaysPrunedMetric,
    new GraftFilesPlannedMetric,
    new GraftFilesSkippedByStatsMetric,
    new GraftFilesSkippedByBloomMetric,
    new GraftDaysDroppedByLimitMetric,
    new GraftRowGroupsSkippedMetric)
}

private[sources] class LakeScan(
    prunedSchema: StructType, props: Map[String, String],
    staticDayFilters: Seq[sources.Filter],
    statFilters: Seq[sources.Filter] = Nil,
    limit: Option[Int] = None,
    limitReverse: Boolean = false,
    limitWholeDay: Boolean = false)
  extends Scan with Batch with SupportsRuntimeFiltering
  with SupportsReportStatistics with SupportsReportPartitioning {

  // planner-side skip telemetry, written by planInputPartitions and
  // reported through reportDriverMetrics (Spark calls it after planning)
  @volatile private var mDaysSelected = 0L
  @volatile private var mDaysPruned = 0L
  @volatile private var mFilesPlanned = 0L
  @volatile private var mFilesSkippedStats = 0L
  @volatile private var mFilesSkippedBloom = 0L
  @volatile private var mDaysDroppedByLimit = 0L

  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    GraftScanMetrics.supported

  override def reportDriverMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(
      GraftScanMetrics.Task("graftDaysSelected", mDaysSelected),
      GraftScanMetrics.Task("graftDaysPruned", mDaysPruned),
      GraftScanMetrics.Task("graftFilesPlanned", mFilesPlanned),
      GraftScanMetrics.Task("graftFilesSkippedByStats", mFilesSkippedStats),
      GraftScanMetrics.Task("graftFilesSkippedByBloom", mFilesSkippedBloom),
      GraftScanMetrics.Task("graftDaysDroppedByLimit", mDaysDroppedByLimit))

  private val dir = GraftLakeSource.dirOf(props)
  private val asOf = props.get("epoch").map(_.toInt)

  // runtime (DPP-style) filters arrive after planning starts; they only
  // ever SHRINK the day set, so late arrival is safe
  @volatile private var runtimeDayFilters: Seq[sources.Filter] = Nil

  // ONE manifest fold per scan, shared by partition planning and the
  // reader factory — folding twice would let a commit racing the read
  // pair a new column mapping with the old generation set (the staging
  // TOCTOU shape ADVICE r12 closed in LakeSnapshot)
  private lazy val state: LakeState =
    LakeSnapshot.tableState(SparkSession.active, dir, asOf)

  // event-time → day derivation (r17 wave 6): the recorded ts column
  // (a PHYSICAL name from CREATE/first-write — LakeSnapshot's write
  // funnels record it since r18) resolves to its CURRENT logical name —
  // the name pushed filters carry. Derivation happens ONLY when the ts
  // column is explicitly known (declared prop or read option): the old
  // bare "ts" default guess could alias an unrelated data column
  // physically named ts and prune days containing matching rows
  // (ADVICE r17). The day date is derived in the zone to_date used AT
  // WRITE — recorded as `ts.zone` alongside `ts` at the table's first
  // write (ADVICE r18: the reader's session zone is an unverifiable
  // stand-in; wrong-zone bounds silently prune live day partitions near
  // day boundaries). No recorded zone, or a mixed-zone write history →
  // derivation is skipped (it is only an optimization). The read-OPTION
  // ts path keeps the reader's session zone: an explicit per-read user
  // assertion that this session's zone is the write zone.
  private lazy val tsDayFilters: Seq[sources.Filter] = {
    val spark = SparkSession.active
    val cp = GraftCatalog.readCreateProps(spark, dir)
    val declared = for {
      t <- cp.get("ts")
      z <- cp.get("ts.zone") if z != GraftCatalog.TsZoneMixed
    } yield (t, java.time.ZoneId.of(z))
    declared
      .orElse(props.get("ts").filter(_ => cp.get("ts").isEmpty).map(t =>
        (t, java.time.ZoneId.of(
          spark.sessionState.conf.sessionLocalTimeZone))))
      .flatMap { case (t, zone) => state.logicalFor(t)
        .map(l => GraftLakeSource.derivedDayFilters(l, statFilters, zone)) }
      .getOrElse(Nil)
  }

  override def readSchema(): StructType = prunedSchema

  override def description(): String = {
    val eff = staticDayFilters ++ runtimeDayFilters ++ tsDayFilters
    s"graft-lake $dir${asOf.map(e => s" epoch=$e").getOrElse("")}" +
      (if (eff.nonEmpty) s" dayFilters=${eff.mkString(",")}" else "") +
      limit.map(k => s" pushedLimit=$k" +
        (if (limitWholeDay)
          s" topN(${if (limitReverse) "DESC" else "ASC"})" else ""))
        .getOrElse("")
  }

  override def filterAttributes(): Array[NamedReference] =
    // only when the projection still carries `day`: Spark resolves these
    // against the scan OUTPUT, so advertising a pruned-away column makes
    // DPP's PartitionPruning throw on any join over a day-less
    // projection (found by the statistics spec's broadcast join)
    if (prunedSchema.fieldNames.contains("day"))
      Array(Expressions.column("day"))
    else Array.empty

  override def filter(filters: Array[sources.Filter]): Unit =
    runtimeDayFilters = filters.toSeq.filter(GraftLakeSource.isDayFilter)

  override def toBatch: Batch = this

  /** `readStream.format("graft-lake")` — the full-table stream (r15):
    * pinned initial snapshot, then the CDC tail. Requires
    * `option("changes", "true")` so the schema carries the change
    * stamps (a stream that silently dropped deletes would be wrong).
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(props.get("changes").exists(_.toBoolean),
      "graft-lake streaming read needs .option(\"changes\", \"true\") — " +
        "the stream emits change images (the pinned snapshot as inserts " +
        "+ the write-time CDC tail); fold youngest-per-key downstream")
    new LakeFullTableStream(prunedSchema, props)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    if (!state.nonEmpty) {
      // committed-but-EMPTY (every day dropped/TRUNCATEd) scans as zero
      // rows, and so does a catalog table CREATEd but never written
      // (its declared schema lives in _table.properties — the standard
      // CREATE TABLE → SELECT flow, ADVICE r13); only a path-based read
      // of a lake that never existed stays a loud error
      require(LakeSnapshot.currentEpoch(spark, dir) >= 0 ||
        GraftCatalog.readCreateProps(spark, dir).nonEmpty,
        s"no committed snapshot at $dir")
      return Array.empty
    }
    val p = LakeSnapshot.LakePaths(dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val eff = staticDayFilters ++ runtimeDayFilters ++ tsDayFilters
    def files(d: String): Seq[String] = {
      val dp = new Path(d)
      if (!fs.exists(dp)) sys.error(
        s"graft-lake: committed generation directory $d is missing — " +
          "vacuumed past this reader's epoch? (raise the retention)")
      fs.listStatus(dp).toSeq
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .map(_.getPath.toString)
    }
    // MANIFEST-CARRIED FILE STATS: pushed comparison filters, resolved
    // through the column mapping to PHYSICAL names, prune whole base
    // files from the stats sidecar each generation staged with itself —
    // zero footer opens at planning (the sidecar is ONE small read per
    // touched generation). Base-only, like the row-group layer: a
    // skipped file's rows are either residual-filtered out anyway or
    // superseded/tombstoned (both only REMOVE rows), so the skip can
    // never change results; deltas stay exhaustive for the winner maps.
    val skipPhys = statFilters.flatMap(RowGroupFilter.of).flatMap { f =>
      state.physicalFor(f.col).map(ph => f.copy(col = ph))
    }
    val statsByGen = scala.collection.mutable.Map.empty[
      Int, Option[Map[String, graft.etl.FileStats.FileStat]]]
    // PER-FILE BLOOM probes (r17 wave 3): equality/IN hints on declared
    // bloom columns consult the day's `_bloom.tsv` sidecar — the
    // point-lookup tier range stats can't serve (a high-cardinality id's
    // [min,max] straddles everything). Loaded lazily PER (gen, day) that
    // actually reaches probing, only while eq/in hints exist — probe
    // cost follows the pruned listing, never the table.
    val eqPhys = skipPhys.filter(f => f.op == "eq" || f.op == "in")
    val bloomByGenDay = scala.collection.mutable.Map.empty[
      (Int, String), Option[Map[(String, String),
        (String, org.apache.spark.util.sketch.BloomFilter)]]]
    def bloomDead(baseGen: Int, day: String, name: String): Boolean = {
      if (eqPhys.isEmpty) return false
      bloomByGenDay.getOrElseUpdate((baseGen, day),
        graft.etl.BloomStats.read(
          spark, s"${p.data}/gen=$baseGen", day)) match {
        case None => false // no sidecar: no claim
        case Some(blooms) =>
          def absent(f: RowGroupFilter): Boolean =
            blooms.get((name, f.col)) match {
              case None => false // column not bloomed in this gen
              case Some((fam, filt)) =>
                if (f.op == "eq")
                  graft.etl.BloomStats.provablyAbsent(
                    fam, filt, f.isFloat, f.lv, f.decScale, f.sv)
                else f.inSet.nonEmpty && f.inSet.forall(m =>
                  graft.etl.BloomStats.provablyAbsent(
                    fam, filt, m.isFloat, m.lv, m.decScale, m.sv))
            }
          val dead = eqPhys.exists(absent)
          if (dead) {
            graft.etl.BloomStats.skippedFiles.incrementAndGet()
            mFilesSkippedBloom += 1
          }
          dead
      }
    }
    def fileOk(baseGen: Int, day: String, file: String): Boolean = {
      if (skipPhys.isEmpty) return true
      val name = new Path(file).getName
      val stats = statsByGen.getOrElseUpdate(baseGen,
        graft.etl.FileStats.read(spark, s"${p.data}/gen=$baseGen"))
      val statsDead =
        stats.flatMap(_.get(s"day=$day/$name")) match {
          case None => false // no sidecar / unknown file: never skip blind
          case Some(st) =>
            // an IN conjunct proves the file empty only when EVERY member
            // does (members compare under the remapped physical name)
            def empty(f: RowGroupFilter): Boolean =
              if (f.op == "in") f.inSet.nonEmpty && f.inSet.forall(m =>
                graft.etl.FileStats.provablyEmpty(st, f.col, "eq",
                  m.isFloat, m.lv, m.dv, m.decScale, m.sv))
              else graft.etl.FileStats.provablyEmpty(st, f.col, f.op,
                f.isFloat, f.lv, f.dv, f.decScale, f.sv)
            val dead = skipPhys.exists(empty)
            if (dead) {
              graft.etl.FileStats.skippedFiles.incrementAndGet()
              mFilesSkippedStats += 1
            }
            dead
        }
      !statsDead && !bloomDead(baseGen, day, name)
    }
    val sel = state.days.toSeq.sortBy(_._1)
      .filter { case (d, _) => GraftLakeSource.dayOk(d, eff) }
    mDaysSelected = sel.size.toLong
    mDaysPruned = (state.days.size - sel.size).toLong
    val anyDeltas = sel.exists(_._2.deltas.nonEmpty)
    val key = state.key.orNull
    if (anyDeltas) require(key != null,
      s"delta generations exist at $dir but no table key is recorded")
    // LIMIT/TopN partition cap (r18, VERDICT r17 #3): a pushed limit
    // stops emitting base-file partitions once the sidecar-proven row
    // coverage reaches k — `SELECT * FROM lake LIMIT 10` on a 365-day
    // table plans a handful of files instead of one InputPartition per
    // base file table-wide. Guarded to the provably-exact cases: the
    // builder only pushed on pure-base survivors with no residual
    // filters, re-checked here (plus no runtime DPP filters — they
    // arrive later and shrink the DAY set, which could orphan the cap's
    // choice). Files with no sidecar row count never advance coverage,
    // so a stats-less lake degrades to the full listing, never to a
    // short answer. TopN walks WHOLE days in sort direction (within-day
    // order is unknown at planning); plain LIMIT caps at file grain.
    val capped: Option[Array[InputPartition]] = limit.flatMap { k =>
      if (runtimeDayFilters.nonEmpty || statFilters.nonEmpty ||
          !sel.forall { case (_, ds) => ds.deltas.isEmpty && ds.dvs.isEmpty })
        None
      else {
        val ordered = if (limitReverse) sel.reverse else sel
        val statsCache = scala.collection.mutable.Map.empty[
          Int, Option[Map[String, graft.etl.FileStats.FileStat]]]
        var proven = 0L
        var covered = false
        val keep = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
        val dayIt = ordered.iterator
        while (dayIt.hasNext && !covered) {
          val (day, ds) = dayIt.next()
          if (ds.base >= 0) {
            val fls = files(s"${p.data}/gen=${ds.base}/day=$day")
            val stats = statsCache.getOrElseUpdate(ds.base,
              graft.etl.FileStats.read(spark, s"${p.data}/gen=${ds.base}"))
            def rowsOf(f: String): Option[Long] =
              stats.flatMap(_.get(s"day=$day/${new Path(f).getName}"))
                .map(_.rows)
            if (limitWholeDay) {
              fls.foreach(f => keep +=
                (LakeBaseFilePartition(day, f, Nil, Nil, key): InputPartition))
              val dayRows = fls.map(rowsOf)
              if (dayRows.forall(_.isDefined))
                proven += dayRows.flatten.sum
              covered = proven >= k
            } else {
              val fIt = fls.iterator
              while (fIt.hasNext && !covered) {
                val f = fIt.next()
                keep +=
                  (LakeBaseFilePartition(day, f, Nil, Nil, key): InputPartition)
                rowsOf(f).foreach { r => proven += r; covered = proven >= k }
              }
            }
          }
        }
        if (covered) GraftLakeSource.limitCappedPlans.incrementAndGet()
        val walked = ordered.size - dayIt.size
        mDaysDroppedByLimit = (ordered.size - walked).toLong
        mFilesPlanned = keep.size.toLong
        // !covered means the walk kept everything — same as the full plan
        Some(keep.toArray)
      }
    }
    val out = capped.getOrElse(sel.flatMap { case (day, ds) =>
      // commit-order fold positions: generation numbers are claim-ordered,
      // not commit-ordered, so seq comes from the manifest fold
      val deltas = ds.deltas.zipWithIndex.flatMap { case (g, i) =>
        files(s"${p.delta}/gen=$g/day=$day").map(LakeDeltaFileRef(_, i + 1))
      }
      // deletion vectors: flat positional tombstones over the day's base
      val dvFiles = ds.dvs.flatMap(g => files(s"${p.dv}/gen=$g/day=$day"))
      val base =
        if (ds.base < 0) Nil
        else files(s"${p.data}/gen=${ds.base}/day=$day")
          .filter(f => fileOk(ds.base, day, f))
          .map(f =>
            LakeBaseFilePartition(day, f, deltas, dvFiles, key): InputPartition)
      base ++ (if (deltas.nonEmpty)
        Seq(LakeDeltaFoldPartition(day, deltas, key): InputPartition)
      else Nil)
    }.toArray)
    mFilesPlanned = out.count(_.isInstanceOf[LakeBaseFilePartition]).toLong
    out
  }

  /** Planner statistics off METADATA only: file sizes from the day-dir
    * listings, row counts from the `_filestats.tsv` sidecars — so
    * Catalyst's join planning sees a filtered lake read for what it is.
    * Without this a DSv2 relation reports `defaultSizeInBytes`
    * (practically infinite) and a dimension-sized lake read NEVER
    * broadcasts — at 100 TB that one missing interface turns every
    * lake-dimension join into a full shuffle. Day filters are applied
    * (they pruned the listing); rows are the pre-fold upper bound, which
    * is the conservative direction for a broadcast decision.
    */
  override def estimateStatistics(): Statistics = {
    val spark = SparkSession.active
    val p = LakeSnapshot.LakePaths(dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val eff = staticDayFilters ++ runtimeDayFilters ++ tsDayFilters
    var bytes = 0L
    var rows = 0L
    var rowsKnown = true
    val statsCache = scala.collection.mutable.Map.empty[
      Int, Option[Map[String, graft.etl.FileStats.FileStat]]]
    state.days.toSeq
      .filter { case (d, _) => GraftLakeSource.dayOk(d, eff) }
      .foreach { case (day, ds) =>
        def addDir(root: String, g: Int, counted: Boolean): Unit = {
          val dp = new Path(s"$root/gen=$g/day=$day")
          if (fs.exists(dp)) fs.listStatus(dp).foreach { st =>
            if (st.isFile && st.getPath.getName.startsWith("part-")) {
              bytes += st.getLen
              if (counted) {
                val side = statsCache.getOrElseUpdate(g,
                  graft.etl.FileStats.read(spark, s"$root/gen=$g"))
                side.flatMap(
                  _.get(s"day=$day/${st.getPath.getName}")) match {
                  case Some(f) => rows += f.rows
                  case None => rowsKnown = false
                }
              } else rowsKnown = false // fold output size: no exact claim
            }
          }
        }
        if (ds.base >= 0) addDir(p.data, ds.base, counted = true)
        // deltas have no sidecar (always read whole) and both upsert and
        // delete rows; count their bytes, leave rows an upper-bound gap
        ds.deltas.foreach(g => addDir(p.delta, g, counted = false))
        ds.dvs.foreach(g => addDir(p.dv, g, counted = false))
      }
    val nRows = rows
    val nBytes = bytes
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(nBytes)
      override def numRows(): java.util.OptionalLong =
        if (rowsKnown) java.util.OptionalLong.of(nRows)
        else java.util.OptionalLong.empty()
    }
  }

  /** The layout IS day-partitioned — say so ([[KeyGroupedPartitioning]]
    * on `day`, the storage-partitioned-join/aggregate interface). Under
    * `spark.sql.sources.v2.bucketing.enabled`, Spark groups this scan's
    * per-file partitions by their [[HasPartitionKey]] day and a
    * day-grouped aggregation (the commonest rollup shape) runs with
    * ZERO exchange below the final agg — at 100 TB that is a whole
    * avoided pass over the data (VERDICT r13 #3/#4 candidate, task 4).
    * The trade is one task per day on the grouped path, which is why it
    * rides Spark's opt-in conf rather than firing always. Only reported
    * while `day` survives projection (like [[filterAttributes]]: the
    * keys resolve against the scan OUTPUT).
    */
  override def outputPartitioning(): Partitioning = {
    val eff = staticDayFilters ++ runtimeDayFilters ++ tsDayFilters
    val nDays = state.days.keysIterator
      .count(d => GraftLakeSource.dayOk(d, eff))
    if (prunedSchema.fieldNames.contains("day") && nDays > 0)
      new KeyGroupedPartitioning(
        Array(Expressions.identity("day")), nDays)
    else new UnknownPartitioning(0)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    // physical file column behind each projected logical column; `day`
    // is the partition value (never stored in files)
    val physical = prunedSchema.fields.map { f =>
      if (f.name == "day") null
      else state.physicalFor(f.name).getOrElse(sys.error(
        s"graft-lake: projected column '${f.name}' has no physical " +
          s"binding at $dir — not a live column of this epoch"))
    }
    // skip hints resolve through the same column mapping as the
    // projection: a filter on a renamed logical column checks the
    // PHYSICAL chunk's stats; one on a non-live column is dropped
    val skip = statFilters.flatMap(RowGroupFilter.of).flatMap { f =>
      state.physicalFor(f.col).map(p => f.copy(col = p))
    }
    new LakeReaderFactory(prunedSchema, physical, skip,
      spark.sparkContext.hadoopConfiguration.asScala
        .map(e => e.getKey -> e.getValue).toMap)
  }
}

/** A comparison filter normalized for footer-stats evaluation: `col` is
  * the attribute (logical at capture, PHYSICAL once resolved), `op` one
  * of eq/gt/ge/lt/le, and the value carried in the matching family
  * (integral `lv` — longs, ints, dates as epoch days, timestamps as
  * micros — or floating `dv`).
  */
final case class RowGroupFilter(
    col: String, op: String, isFloat: Boolean, lv: Long, dv: Double,
    // decimal family (r17): when >= 0, `lv` is the predicate's UNSCALED
    // value at this scale — comparable against same-scale decimal stats
    decScale: Int = -1,
    // string family (r17): the predicate value's UTF-8 bytes — compared
    // unsigned-lexicographically, parquet's own string stat order
    sv: Array[Byte] = null,
    // op == "in": the member equality hints — the IN conjunct proves a
    // file/group empty only when EVERY member does
    inSet: Seq[RowGroupFilter] = Nil)

object RowGroupFilter {
  private def decNorm(
      col: String, op: String, d: java.math.BigDecimal): Option[RowGroupFilter] = {
    val u = d.unscaledValue
    if (u.bitLength < 64)
      Some(RowGroupFilter(col, op, isFloat = false, u.longValue, 0d,
        decScale = d.scale))
    else None // >63-bit unscaled: residual-only
  }

  private def norm(col: String, op: String, v: Any): Option[RowGroupFilter] =
    // a NESTED-field predicate (struct columns, r15) arrives as a dotted
    // name — the stats layers key on TOP-LEVEL columns, and the
    // absent-column=all-null=skippable rule would mis-fire on
    // "media.width"; nested filters stay residual-only, no claim
    if (col.contains(".")) None
    else v match {
      case l: Long => Some(RowGroupFilter(col, op, isFloat = false, l, 0d))
      case i: Int => Some(RowGroupFilter(col, op, isFloat = false, i.toLong, 0d))
      case s: Short => Some(RowGroupFilter(col, op, isFloat = false, s.toLong, 0d))
      case b: Byte => Some(RowGroupFilter(col, op, isFloat = false, b.toLong, 0d))
      case d: Double => Some(RowGroupFilter(col, op, isFloat = true, 0L, d))
      case f: Float => Some(RowGroupFilter(col, op, isFloat = true, 0L, f.toDouble))
      case d: java.sql.Date =>
        Some(RowGroupFilter(col, op, isFloat = false, d.toLocalDate.toEpochDay, 0d))
      case d: java.time.LocalDate =>
        Some(RowGroupFilter(col, op, isFloat = false, d.toEpochDay, 0d))
      case t: java.sql.Timestamp =>
        // getTime carries whole millis (incl. the nanos' millis part);
        // add the sub-milli micros
        Some(RowGroupFilter(col, op, isFloat = false,
          t.getTime * 1000L + (t.getNanos / 1000L) % 1000L, 0d))
      case t: java.time.Instant =>
        Some(RowGroupFilter(col, op, isFloat = false,
          t.getEpochSecond * 1000000L + t.getNano / 1000L, 0d))
      // DECIMAL predicates (r17, VERDICT r16 #4): order-preserving as
      // unscaled longs within one scale — both stats layers compare
      // same-scale only, so a money filter finally prunes
      case d: java.math.BigDecimal => decNorm(col, op, d)
      case d: scala.math.BigDecimal => decNorm(col, op, d.bigDecimal)
      // STRING predicates (r17): the dimension-column case —
      // `event_type = 'purchase'`, `lang = 'en'` — compares the value's
      // UTF-8 bytes against the footer min/max unsigned, the exact
      // total order parquet's string comparator recorded them under
      case s: String => Some(RowGroupFilter(col, op, isFloat = false,
        0L, 0d, sv = s.getBytes("UTF-8")))
      case _ => None
    }

  /** The skip hint for a pushed filter, if its shape and value family
    * are stats-comparable.
    */
  def of(f: sources.Filter): Option[RowGroupFilter] = f match {
    case sources.EqualTo(a, v) => norm(a, "eq", v)
    case sources.GreaterThan(a, v) => norm(a, "gt", v)
    case sources.GreaterThanOrEqual(a, v) => norm(a, "ge", v)
    case sources.LessThan(a, v) => norm(a, "lt", v)
    case sources.LessThanOrEqual(a, v) => norm(a, "le", v)
    // IN (r17): one conjunct — skippable only when EVERY member is;
    // any non-convertible member (or an over-wide list) forfeits the
    // hint, never the correctness (filters stay residual)
    case sources.In(a, vs) if vs.nonEmpty && vs.length <= 32 =>
      val members = vs.toSeq.map(v => norm(a, "eq", v))
      if (members.forall(_.isDefined))
        Some(RowGroupFilter(a, "in", isFloat = false, 0L, 0d,
          inSet = members.flatten))
      else None
    // IS NOT NULL (r17): skips all-null / column-absent files and
    // groups — the schema-evolution gap reads, common under
    // `WHERE new_col IS NOT NULL` backfills
    case sources.IsNotNull(a) if !a.contains(".") =>
      Some(RowGroupFilter(a, "notnull", isFloat = false, 0L, 0d))
    // IS NULL (r19): the inverse claim — a file/group whose EXACT null
    // count is recorded as zero can hold no matching row. The
    // `WHERE enrich_col IS NULL` gap-audit scan then skips every fully-
    // backfilled file. NOTE the inverted null semantics vs every other
    // op: absent/all-null columns MATCH (never skip), unknown null
    // counts make no claim
    case sources.IsNull(a) if !a.contains(".") =>
      Some(RowGroupFilter(a, "isnull", isFloat = false, 0L, 0d))
    // LIKE 'prefix%' (r17): matches live in [prefix, successor(prefix))
    // under the same unsigned byte order the stats were recorded in —
    // URL/path/tenant prefixes are the everyday selective string filter
    case sources.StringStartsWith(a, p) if !a.contains(".") && p.nonEmpty =>
      Some(RowGroupFilter(a, "sw", isFloat = false, 0L, 0d,
        sv = p.getBytes("UTF-8")))
    case _ => None
  }
}

/** One row-delta parquet file + its commit-order fold position. */
final case class LakeDeltaFileRef(path: String, seq: Int)

/** One base-generation file of `day`, with the day's full delta list so
  * the reader can drop superseded keys while streaming, and the day's
  * deletion-vector files so tombstoned positions skip.
  */
final case class LakeBaseFilePartition(
    day: String, file: String, deltas: Seq[LakeDeltaFileRef],
    dvFiles: Seq[String], key: String)
  extends InputPartition with HasPartitionKey {
  // the day as a DateType value — what identity("day") groups on
  override def partitionKey(): InternalRow = new GenericInternalRow(
    Array[Any](java.time.LocalDate.parse(day).toEpochDay.toInt))
}

/** The per-day delta fold: emits the youngest-wins upsert image of the
  * day's delta generations (rows whose youngest op is `u`).
  */
final case class LakeDeltaFoldPartition(
    day: String, deltas: Seq[LakeDeltaFileRef], key: String)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = new GenericInternalRow(
    Array[Any](java.time.LocalDate.parse(day).toEpochDay.toInt))
}

private[sources] class LakeReaderFactory(
    schema: StructType, physical: Array[String],
    skip: Seq[RowGroupFilter], hadoopConf: Map[String, String])
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case b: LakeBaseFilePartition =>
        // group skipping applies to the BASE stream only: the delta
        // passes must see every key (winner maps), and they are
        // O(batch)-small by design
        new LakeBaseReader(b, schema, physical, skip, hadoopConf)
      case d: LakeDeltaFoldPartition =>
        new LakeDeltaFoldReader(d, schema, physical, hadoopConf)
      case other => sys.error(s"graft-lake: unexpected partition $other")
    }
}

/** Standalone parquet-example record access shared by the lake readers:
  * Group → typed value with the full timestamp story (INT96 legacy,
  * MILLIS/MICROS/NANOS int64 annotations → micros) so every generation
  * a Spark writer ever produced reads identically.
  */
private[sources] object LakeGroupRead {

  def confOf(hadoopConf: Map[String, String]): Configuration = {
    val c = new Configuration(false)
    hadoopConf.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Diagnostic only (specs assert skipping actually fires in local
    * mode); never read on a correctness path.
    */
  val skippedGroups = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Diagnostic only: total parquet LEAF columns requested across file
    * opens — specs assert projections (incl. nested-struct field
    * pruning) reach the page reads, not just the logical plan.
    */
  val leafColumnsRead = new java.util.concurrent.atomic.AtomicLong(0L)

  /** The footer schema narrowed to what the scan actually needs (r18):
    * the PHYSICAL column behind each projected logical column, plus the
    * key columns the winner-map lookup reads on delta-carrying days.
    * Plain STRUCT columns narrow recursively to the requested subfields
    * — on a multimodal table, `SELECT media.mime` stops fetching the
    * sibling binary payload's pages (VERDICT r17 missing #4). LIST/MAP
    * annotated groups pass whole (their repeated-group shapes don't
    * narrow safely by name); a requested field missing from the file is
    * simply omitted (the converter already yields null for evolution
    * gaps). An empty projection (count(*)) keeps the narrowest single
    * leaf so row iteration still works.
    */
  def projectionOf(
      file: MessageType, schema: StructType,
      physical: Array[String], keyCols: Seq[String]): MessageType = {
    def pruneType(
        ft: org.apache.parquet.schema.Type,
        dt: DataType): org.apache.parquet.schema.Type = dt match {
      case st: StructType if !ft.isPrimitive &&
          ft.getLogicalTypeAnnotation == null =>
        val g = ft.asGroupType
        val kids = st.fields.toSeq
          .filter(f => g.containsField(f.name))
          .map(f => pruneType(g.getType(f.name), f.dataType))
        // parquet groups cannot be empty — an all-missing struct keeps
        // the whole group (its rows convert to all-null subfields)
        if (kids.isEmpty) ft else g.withNewFields(kids.asJava)
      // LIST-annotated groups narrow through the element (r18): Spark's
      // nested pruning hands array<struct<mime>> for a
      // `SELECT frames.mime` over array<struct<mime,…,payload>> — the
      // element group narrows exactly like a plain struct, so frame
      // arrays on multimodal tables stop fetching sibling payload
      // chunks. 2-level legacy lists (repeated primitive) pass whole.
      case at: ArrayType if !ft.isPrimitive &&
          ft.getLogicalTypeAnnotation
            .isInstanceOf[LogicalTypeAnnotation.ListLogicalTypeAnnotation] =>
        val g = ft.asGroupType
        val inner = g.getType(0)
        if (inner.isPrimitive) ft
        else {
          val innerG = inner.asGroupType
          val elemT = innerG.getType(0)
          val narrowed = pruneType(elemT, at.elementType)
          if (narrowed eq elemT) ft
          else g.withNewFields(innerG.withNewFields(narrowed))
        }
      case _ => ft
    }
    def fieldOf(name: String): org.apache.parquet.schema.Type =
      file.getType(file.getFieldIndex(name))
    val projected = schema.fields.toSeq.zip(physical.toSeq).flatMap {
      case (f, phys) =>
        if (phys == null || !file.containsField(phys)) None
        else Some(pruneType(fieldOf(phys), f.dataType))
    }
    val have = projected.map(_.getName).toSet
    val keys = keyCols
      .filter(k => !have(k) && file.containsField(k))
      .map(fieldOf)
    val all = projected ++ keys
    val fields =
      if (all.nonEmpty) all
      else {
        // count(*): one narrowest leaf keeps the record reader alive
        val leaf = file.getFields.asScala
          .find(_.isPrimitive).getOrElse(file.getFields.get(0))
        Seq(leaf)
      }
    new MessageType(file.getName, fields.asJava)
  }

  /** Streaming iterator over one parquet file's Groups. With `skip`
    * filters, row groups whose footer min/max stats prove no row can
    * match are skipped WITHOUT reading their pages — parquet's native
    * skipping granularity, executor-side. NOTE: callers that skip must
    * not also track running row positions (deletion vectors); the base
    * reader separates the two (positions only advance on read groups it
    * accounts for).
    */
  final class GroupIterator(
      path: String, conf: Configuration,
      skip: Seq[RowGroupFilter] = Nil,
      onSkip: Long => Unit = _ => (),
      project: MessageType => MessageType = identity)
    extends Iterator[Group] with AutoCloseable {
    private val reader =
      ParquetFileReader.open(HadoopInputFile.fromPath(new Path(path), conf))
    /** the file's FULL footer schema — stats/bloom claims resolve here
      * (a filter column outside the projection must read "present",
      * never "evolution gap")
      */
    val fullSchema: MessageType = reader.getFooter.getFileMetaData.getSchema
    /** the schema the emitted Groups CARRY: the caller's projection of
      * the footer schema (r18 — before this, every read materialized
      * EVERY column's pages: a 2-column projection over a wide
      * multimodal table still decoded the sibling binary payloads;
      * `setRequestedSchema` makes parquet fetch only the projected
      * column chunks, which is the entire point of columnar storage)
      */
    val fileSchema: MessageType = project(fullSchema)
    if (!(fileSchema eq fullSchema)) reader.setRequestedSchema(fileSchema)
    LakeGroupRead.leafColumnsRead.addAndGet(fileSchema.getPaths.size.toLong)
    private val blocks = reader.getFooter.getBlocks
    private var blockIdx = 0
    private val io = new ColumnIOFactory().getColumnIO(fileSchema)
    private var rr: org.apache.parquet.io.RecordReader[Group] = _
    private var remaining = 0L
    // parquet-NATIVE bloom probes (r17 wave 5): within a file the
    // planner could not skip, an equality/IN hint probes each block's
    // own bloom ([[graft.etl.BloomStats.writeOptions]] wrote them) —
    // the row-group granularity twin of the file-level sidecar. One
    // bloom read per (block, probed column); a file without blooms
    // costs one null lookup.
    private val eqSkips = skip.filter(f => f.op == "eq" || f.op == "in")
    private def bloomEmpty(
        block: org.apache.parquet.hadoop.metadata.BlockMetaData): Boolean = {
      if (eqSkips.isEmpty) return false
      val bfr =
        try reader.getBloomFilterDataReader(block)
        catch { case _: Exception => null }
      if (bfr == null) return false
      def absentOne(
          cc: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData,
          bf: org.apache.parquet.column.values.bloomfilter.BloomFilter,
          m: RowGroupFilter): Boolean = {
        import PrimitiveType.PrimitiveTypeName._
        cc.getPrimitiveType.getPrimitiveTypeName match {
          case INT64 if !m.isFloat && m.decScale < 0 && m.sv == null =>
            !bf.findHash(bf.hash(m.lv))
          case INT32 if !m.isFloat && m.decScale < 0 && m.sv == null =>
            // a post-widen long predicate beyond int32 cannot exist in
            // an int32 chunk at all
            m.lv > Int.MaxValue || m.lv < Int.MinValue ||
              !bf.findHash(bf.hash(m.lv.toInt))
          case BINARY if m.sv != null &&
              cc.getPrimitiveType.getLogicalTypeAnnotation
                .isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
            !bf.findHash(bf.hash(
              org.apache.parquet.io.api.Binary.fromConstantByteArray(m.sv)))
          case _ => false // family mismatch / decimal / float: no claim
        }
      }
      def absent(f: RowGroupFilter): Boolean =
        block.getColumns.asScala.find(_.getPath.toDotString == f.col) match {
          case None => false // absent chunk: the stats layer's claim
          case Some(cc) =>
            val bf =
              try bfr.readBloomFilter(cc)
              catch { case _: Exception => null }
            if (bf == null) false
            else if (f.op == "eq") absentOne(cc, bf, f)
            else f.inSet.nonEmpty && f.inSet.forall(absentOne(cc, bf, _))
        }
      val dead = eqSkips.exists(absent)
      if (dead) graft.etl.BloomStats.skippedGroups.incrementAndGet()
      dead
    }
    override def hasNext: Boolean = {
      while (remaining == 0L) {
        while (skip.nonEmpty && blockIdx < blocks.size() &&
            (groupProvablyEmpty(blocks.get(blockIdx), skip, fullSchema) ||
              bloomEmpty(blocks.get(blockIdx)))) {
          onSkip(blocks.get(blockIdx).getRowCount)
          skippedGroups.incrementAndGet()
          reader.skipNextRowGroup()
          blockIdx += 1
        }
        val pages = reader.readNextRowGroup()
        if (pages == null) return false
        blockIdx += 1
        rr = io.getRecordReader(pages, new GroupRecordConverter(fileSchema))
        remaining = pages.getRowCount
      }
      true
    }
    override def next(): Group = { remaining -= 1; rr.read() }
    override def close(): Unit = reader.close()
  }

  /** True when `block`'s footer stats PROVE no row can satisfy some
    * filter (comparison semantics: null rows never match, so an all-null
    * or absent column chunk is skippable; missing/unknown stats are
    * never skippable; INT96 stats are unusable).
    */
  def groupProvablyEmpty(
      block: org.apache.parquet.hadoop.metadata.BlockMetaData,
      filters: Seq[RowGroupFilter], fileSchema: MessageType): Boolean =
    filters.exists(f => filterProvablyEmpty(block, f, fileSchema))

  private def filterProvablyEmpty(
      block: org.apache.parquet.hadoop.metadata.BlockMetaData,
      f: RowGroupFilter, fileSchema: MessageType): Boolean = {
      // an IN conjunct: empty only when every member equality is
      if (f.op == "in")
        return f.inSet.nonEmpty && f.inSet.forall(m =>
          filterProvablyEmpty(block, m.copy(col = f.col), fileSchema))
      // `isnull` inverts the null rule every comparison shares: an
      // absent or all-null column MATCHES `IS NULL` (never skip), and
      // the skip claim is "exact null count recorded as zero"
      if (!fileSchema.containsField(f.col))
        return f.op != "isnull" // all-null evolution gap
      block.getColumns.asScala
        .find(_.getPath.toDotString == f.col) match {
        case None => f.op != "isnull" // chunk absent: all null in this group
        case Some(cc) =>
          val st = cc.getStatistics
          if (st == null || st.isEmpty) false
          else if (!st.hasNonNullValue) f.op != "isnull" // every value null
          else if (f.op == "isnull") st.isNumNullsSet && st.getNumNulls == 0L
          else if (f.op == "notnull") false // non-nulls exist: no claim
          else {
            val fileScale =
              cc.getPrimitiveType.getLogicalTypeAnnotation match {
                case a: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
                  a.getScale
                case _ => -1
              }
            val pt = cc.getPrimitiveType.getPrimitiveTypeName
            import PrimitiveType.PrimitiveTypeName._
            if (fileScale >= 0) {
              // DECIMAL chunk (r17): unscaled stats compare against a
              // same-scale decimal predicate's unscaled value; any
              // mismatch (scale, non-decimal filter, >63-bit) = no claim
              def unscaled(v: Any): Option[Long] = v match {
                case n: Number => Some(n.longValue())
                case b: org.apache.parquet.io.api.Binary =>
                  val bi = new java.math.BigInteger(b.getBytes)
                  if (bi.bitLength < 64) Some(bi.longValue) else None
                case _ => None
              }
              if (f.decScale != fileScale) false
              else (unscaled(st.genericGetMin), unscaled(st.genericGetMax)) match {
                case (Some(mn), Some(mx)) => provablyEmptyLong(f.op, f.lv, mn, mx)
                case _ => false
              }
            } else (pt, f.isFloat) match {
              case _ if f.decScale >= 0 => false // decimal filter, plain col
              // STRING chunk vs string predicate (r17): unsigned byte
              // order, parquet's own string comparator
              case (BINARY, false) if f.sv != null &&
                  cc.getPrimitiveType.getLogicalTypeAnnotation
                    .isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
                val mn = st.genericGetMin
                  .asInstanceOf[org.apache.parquet.io.api.Binary].getBytes
                val mx = st.genericGetMax
                  .asInstanceOf[org.apache.parquet.io.api.Binary].getBytes
                provablyEmptyBytes(f.op, f.sv, mn, mx)
              case _ if f.sv != null => false // string filter, other family
              case (INT64, false) | (INT32, false) =>
                val (mn, mx) = (
                  st.genericGetMin.asInstanceOf[Number].longValue(),
                  st.genericGetMax.asInstanceOf[Number].longValue())
                provablyEmptyLong(f.op, f.lv, mn, mx)
              case (DOUBLE, true) | (FLOAT, true) =>
                val (mn, mx) = (
                  st.genericGetMin.asInstanceOf[Number].doubleValue(),
                  st.genericGetMax.asInstanceOf[Number].doubleValue())
                provablyEmptyDouble(f.op, f.dv, mn, mx)
              case _ => false // family mismatch or INT96: no claim
            }
          }
      }
    }

  private def provablyEmptyLong(
      op: String, v: Long, mn: Long, mx: Long): Boolean = op match {
    case "eq" => v < mn || v > mx
    case "gt" => mx <= v
    case "ge" => mx < v
    case "lt" => mn >= v
    case "le" => mn > v
    case _ => false
  }

  private def provablyEmptyDouble(
      op: String, v: Double, mn: Double, mx: Double): Boolean = op match {
    case "eq" => v < mn || v > mx
    case "gt" => mx <= v
    case "ge" => mx < v
    case "lt" => mn >= v
    case "le" => mn > v
    case _ => false
  }

  private def provablyEmptyBytes(
      op: String, v: Array[Byte], mn: Array[Byte], mx: Array[Byte]): Boolean = {
    import graft.etl.FileStats.{cmpUtf8, prefixSuccessor}
    op match {
      case "eq" => cmpUtf8(v, mn) < 0 || cmpUtf8(v, mx) > 0
      case "gt" => cmpUtf8(mx, v) <= 0
      case "ge" => cmpUtf8(mx, v) < 0
      case "lt" => cmpUtf8(mn, v) >= 0
      case "le" => cmpUtf8(mn, v) > 0
      case "sw" =>
        cmpUtf8(mx, v) < 0 ||
          prefixSuccessor(v).exists(up => cmpUtf8(mn, up) >= 0)
      case _ => false
    }
  }

  private val JulianEpochDay = 2440588L // 1970-01-01 as a julian day

  private def int96Micros(b: org.apache.parquet.io.api.Binary): Long = {
    val bytes = b.getBytes // little-endian: 8B nanos-of-day, 4B julian day
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanos = buf.getLong
    val julian = buf.getInt
    (julian - JulianEpochDay) * 86400L * 1000000L + nanos / 1000L
  }

  private def timestampMicros(
      g: Group, fs: GroupType, name: String): Long = {
    val pt = fs.getType(fs.getFieldIndex(name)).asPrimitiveType()
    if (pt.getPrimitiveTypeName == PrimitiveType.PrimitiveTypeName.INT96)
      return int96Micros(g.getInt96(name, 0))
    val raw = g.getLong(name, 0)
    pt.getLogicalTypeAnnotation match {
      case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
        t.getUnit match {
          case LogicalTypeAnnotation.TimeUnit.MILLIS => raw * 1000L
          case LogicalTypeAnnotation.TimeUnit.NANOS => Math.floorDiv(raw, 1000L)
          case _ => raw
        }
      case _ => raw
    }
  }

  /** The Catalyst-internal value of `name` under the declared Spark type
    * — null when the column is absent from this file (schema evolution)
    * or null in this row. Round-15 widening mirrors [[LakeGroupWrite]]:
    * DECIMAL reads whatever physical width the writing engine chose
    * (int32/int64/binary/fixed — Spark's V1 bases and the Group-API
    * deltas agree on the standard encodings, and the FILE's annotation
    * scale is authoritative, rescaled into the declared type), BINARY,
    * and ARRAY as the standard 3-level LIST group.
    */
  def internalValue(
      g: Group, fs: GroupType, name: String, dt: DataType): Any =
    if (!fs.containsField(name)) null
    else if (g.getFieldRepetitionCount(name) == 0) null
    else dt match {
      case TimestampType => timestampMicros(g, fs, name)
      // TYPE WIDENING (r17): a LONG/DOUBLE-declared column may sit in a
      // file written before the widen commit with the narrow physical
      // type — upcast. The NARROWING direction (int-declared reading an
      // int64 file) means the column widened after this consumer bound
      // its schema: fail with the real story, not a ClassCastException.
      case LongType =>
        primName(fs, name) match {
          case PrimitiveType.PrimitiveTypeName.INT32 =>
            g.getInteger(name, 0).toLong
          case _ => g.getLong(name, 0)
        }
      case IntegerType =>
        require(primName(fs, name) != PrimitiveType.PrimitiveTypeName.INT64,
          s"graft-lake reader: column '$name' was WIDENED to BIGINT " +
            "after this reader bound its schema — restart the stream/" +
            "query to pick up the widened type")
        g.getInteger(name, 0)
      case DateType => g.getInteger(name, 0)
      case DoubleType =>
        primName(fs, name) match {
          case PrimitiveType.PrimitiveTypeName.FLOAT =>
            g.getFloat(name, 0).toDouble
          case _ => g.getDouble(name, 0)
        }
      case FloatType =>
        require(primName(fs, name) != PrimitiveType.PrimitiveTypeName.DOUBLE,
          s"graft-lake reader: column '$name' was WIDENED to DOUBLE " +
            "after this reader bound its schema — restart the stream/" +
            "query to pick up the widened type")
        g.getFloat(name, 0)
      case BooleanType => g.getBoolean(name, 0)
      case StringType => UTF8String.fromString(g.getString(name, 0))
      case BinaryType => g.getBinary(name, 0).getBytes
      case d: DecimalType => decimalValue(g, fs, name, d)
      case ArrayType(elem, _) => arrayValue(g, fs, name, elem)
      case st: StructType =>
        structValue(g.getGroup(name, 0),
          fs.getType(fs.getFieldIndex(name)).asGroupType(), st)
      case MapType(kt, vt, _) => mapValue(g, fs, name, kt, vt)
      case other => throw new UnsupportedOperationException(
        s"graft-lake reader: unsupported column type $other for '$name'")
    }

  /** A MAP column under the declared key/value types — the standard
    * `repeated group key_value { key; value }` shape (Spark's `key_value
    * /key/value` and the legacy `map/key/value` naming both read: access
    * is positional on the entry group). Null values are entries with no
    * `value`; map keys are required by the format.
    */
  private def mapValue(
      g: Group, fs: GroupType, name: String,
      kt: DataType, vt: DataType): Any = {
    val mapGroup = g.getGroup(name, 0)
    val entryType = fs.getType(fs.getFieldIndex(name)).asGroupType()
      .getType(0).asGroupType()
    val n = mapGroup.getFieldRepetitionCount(0)
    val keys = new Array[Any](n)
    val values = new Array[Any](n)
    val keyName = entryType.getType(0).getName
    val valName = entryType.getType(1).getName
    var j = 0
    while (j < n) {
      val entry = mapGroup.getGroup(0, j)
      keys(j) = elementValue(entry, keyName, 0, kt)
      values(j) =
        if (entry.getFieldRepetitionCount(1) == 0) null
        else vt match {
          case st: StructType =>
            structValue(entry.getGroup(1, 0),
              entryType.getType(1).asGroupType(), st)
          case dd: DecimalType =>
            decimalAt(entry, valName, 0,
              entryType.getType(1).asPrimitiveType(), dd)
          // arrays-in-maps / maps-in-maps (r17 wave 3): the value is
          // itself a LIST / MAP group — recurse against the entry group
          case at: ArrayType =>
            arrayValue(entry, entryType, valName, at.elementType)
          case mt: MapType =>
            mapValue(entry, entryType, valName, mt.keyType, mt.valueType)
          case _ => elementValue(entry, valName, 0, vt)
        }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(values))
  }

  /** A struct group under the declared struct type — fields recurse
    * through [[internalValue]] (nested structs/arrays/decimals), absent
    * fields null-fill like any evolved column.
    */
  private def structValue(
      sub: Group, gt: GroupType, st: StructType): Any =
    new GenericInternalRow(st.fields.map(f =>
      internalValue(sub, gt, f.name, f.dataType)))

  private def primName(
      fs: GroupType, name: String): PrimitiveType.PrimitiveTypeName = {
    val t = fs.getType(fs.getFieldIndex(name))
    if (t.isPrimitive) t.asPrimitiveType().getPrimitiveTypeName else null
  }

  private def decimalValue(
      g: Group, fs: GroupType, name: String, d: DecimalType): Any =
    decimalAt(g, name, 0,
      fs.getType(fs.getFieldIndex(name)).asPrimitiveType(), d)

  /** One decimal under any of the writer's physical widths, at a field
    * repetition index — shared by top-level columns (index 0) and
    * array/map elements, mirroring [[LakeGroupWrite.addDecimal]]
    * (ADVICE r15: elements and columns must read symmetrically).
    */
  private def decimalAt(
      g: Group, name: String, j: Int,
      pt: PrimitiveType, d: DecimalType): Any = {
    val fileScale = pt.getLogicalTypeAnnotation match {
      case a: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => a.getScale
      case _ => d.scale // unannotated physical: trust the declared type
    }
    val unscaled: java.math.BigInteger =
      pt.getPrimitiveTypeName match {
        case PrimitiveType.PrimitiveTypeName.INT32 =>
          java.math.BigInteger.valueOf(g.getInteger(name, j).toLong)
        case PrimitiveType.PrimitiveTypeName.INT64 =>
          java.math.BigInteger.valueOf(g.getLong(name, j))
        case _ => // BINARY / FIXED_LEN_BYTE_ARRAY: big-endian two's complement
          new java.math.BigInteger(g.getBinary(name, j).getBytes)
      }
    val dec = org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal(unscaled, fileScale))
    require(dec.changePrecision(d.precision, d.scale),
      s"graft-lake reader: decimal value of '$name' (scale $fileScale) " +
        s"does not fit the declared ${d.simpleString}")
    dec
  }

  /** A LIST column under the declared element type. Handles the
    * standard 3-level layout (`repeated group list { element }` — any
    * repeated-group/field naming, so Spark-written `list/element` and
    * legacy `bag/array` files both read) and the 2-level legacy
    * `repeated <primitive>` form.
    */
  private def arrayValue(
      g: Group, fs: GroupType, name: String, elem: DataType): Any = {
    val field = fs.getType(fs.getFieldIndex(name))
    if (field.isPrimitive) // 2-level legacy: repeated primitive
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        (0 until g.getFieldRepetitionCount(name))
          .map(j => elementValue(g, name, j, elem)).toArray)
    val listGroup = g.getGroup(name, 0)
    val inner = field.asGroupType().getType(0)
    val n = listGroup.getFieldRepetitionCount(0)
    val vals = new Array[Any](n)
    var j = 0
    if (inner.isPrimitive) {
      // 2-level inside an annotated group: repeated primitive elements
      while (j < n) {
        vals(j) = elementValue(listGroup, inner.getName, j, elem)
        j += 1
      }
    } else {
      // standard 3-level: one entry group per element, null = no value
      val elemType = inner.asGroupType().getType(0)
      val elemName = elemType.getName
      while (j < n) {
        val entry = listGroup.getGroup(0, j)
        vals(j) =
          if (entry.getFieldRepetitionCount(0) == 0) null
          else elem match {
            case st: StructType =>
              structValue(entry.getGroup(0, 0), elemType.asGroupType(), st)
            // arrays-of-arrays: the element is itself a LIST group (r16)
            case at: ArrayType =>
              arrayValue(entry, inner.asGroupType(), elemName, at.elementType)
            // maps-in-arrays (r17 wave 3): the element is a MAP group
            case mt: MapType =>
              mapValue(entry, inner.asGroupType(), elemName,
                mt.keyType, mt.valueType)
            case dd: DecimalType =>
              decimalAt(entry, elemName, 0, elemType.asPrimitiveType(), dd)
            case _ => elementValue(entry, elemName, 0, elem)
          }
        j += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(vals)
  }

  private def elementValue(
      g: Group, name: String, j: Int, elem: DataType): Any = elem match {
    case LongType | TimestampType => g.getLong(name, j)
    case IntegerType | DateType => g.getInteger(name, j)
    case DoubleType => g.getDouble(name, j)
    case FloatType => g.getFloat(name, j)
    case BooleanType => g.getBoolean(name, j)
    case StringType => UTF8String.fromString(g.getString(name, j))
    case BinaryType => g.getBinary(name, j).getBytes
    case other => throw new UnsupportedOperationException(
      s"graft-lake reader: unsupported array element type $other")
  }

  /** The fold-map key of this record: numerics normalize (int → long,
    * float → double) so a key column whose physical width differs across
    * generations still collides correctly; strings compare as String.
    * A COMPOSITE key (`'a,b'`, r15) folds as the List of its parts'
    * normalized values — List equality makes tuple keys collide exactly.
    */
  def keyValue(g: Group, fs: GroupType, name: String): Any = {
    if (name.indexOf(',') >= 0)
      return LakeSnapshot.keyParts(name).map(partValue(g, fs, _)).toList
    partValue(g, fs, name)
  }

  private def partValue(g: Group, fs: GroupType, name: String): Any = {
    if (!fs.containsField(name) || g.getFieldRepetitionCount(name) == 0)
      return null
    val pt =
      fs.getType(fs.getFieldIndex(name)).asPrimitiveType().getPrimitiveTypeName
    pt match {
      case PrimitiveType.PrimitiveTypeName.INT64 => g.getLong(name, 0)
      case PrimitiveType.PrimitiveTypeName.INT32 => g.getInteger(name, 0).toLong
      case PrimitiveType.PrimitiveTypeName.DOUBLE => g.getDouble(name, 0)
      case PrimitiveType.PrimitiveTypeName.FLOAT => g.getFloat(name, 0).toDouble
      case PrimitiveType.PrimitiveTypeName.BOOLEAN => g.getBoolean(name, 0)
      case _ => g.getString(name, 0)
    }
  }

  /** Diagnostic only: delta files opened by [[deltaState]] — specs
    * assert the per-executor fold cache bounds this at
    * deltas-per-day, not baseFiles × deltas (VERDICT r13 missing #4).
    */
  val deltaFileOpens = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Fold a day's delta files into key → (youngest seq, youngest op).
    * O(delta rows) time, O(distinct delta keys) memory — the deltas are
    * O(batch) by design (OPTIMIZE absorbs them into bases).
    */
  def deltaState(
      deltas: Seq[LakeDeltaFileRef], key: String,
      conf: Configuration): java.util.HashMap[Any, (Int, String)] = {
    val m = new java.util.HashMap[Any, (Int, String)]()
    deltas.foreach { ref =>
      deltaFileOpens.incrementAndGet()
      val it = new GroupIterator(ref.path, conf)
      try it.foreach { g =>
        val k = keyValue(g, it.fileSchema, key)
        val prev = m.get(k)
        if (prev == null || ref.seq >= prev._1)
          m.put(k, (ref.seq, g.getString("__op", 0)))
      } finally it.close()
    }
    m
  }
}

/** PER-EXECUTOR delta key-state cache (VERDICT r13 missing #4): every
  * base-file partition of a day needs the day's folded delta state, and
  * re-folding it per task is F× read amplification on the delta tier
  * (F base files per day). The fix Iceberg ships for its delete files:
  * fold ONCE PER EXECUTOR and share — tasks of the same day running in
  * the same JVM hit the memo (on local[n], exactly one fold per day;
  * on a cluster, one per executor that touches the day, E ≪ F). The
  * key is the day's exact (path, seq) delta list + the fold key, so a
  * new delta commit (different list) can never read a stale map, and
  * epoch-pinned readers of different views key apart naturally. LRU by
  * day-state; each entry is O(batch keys) — the same memory one task's
  * fold already paid.
  */
private[sources] object LakeDeltaStateCache {
  private val MaxEntries = 64

  private final class Memo(load: () => java.util.HashMap[Any, (Int, String)]) {
    // lazy val: per-entry lock — concurrent tasks of the SAME day wait
    // for one fold; different days fold in parallel
    lazy val value: java.util.HashMap[Any, (Int, String)] = load()
  }

  private val cache =
    new java.util.LinkedHashMap[String, Memo](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Memo]): Boolean =
        size() > MaxEntries
    }

  def get(deltas: Seq[LakeDeltaFileRef], key: String, conf: Configuration)
      : java.util.HashMap[Any, (Int, String)] = {
    val k = deltas.iterator.map(r => s"${r.path}#${r.seq}")
      .mkString("", "|", s"@$key")
    val memo = cache.synchronized {
      var m = cache.get(k)
      if (m == null) {
        m = new Memo(() => LakeGroupRead.deltaState(deltas, key, conf))
        cache.put(k, m)
      }
      m
    }
    memo.value // folds OUTSIDE the cache lock
  }

  /** Test hook: drop every memo (open-count determinism). */
  private[sources] def clear(): Unit =
    cache.synchronized { cache.clear() }
}

private[sources] abstract class LakeRowReader(
    day: String, schema: StructType, physical: Array[String])
  extends PartitionReader[InternalRow] {

  private val epochDay: Int =
    java.time.LocalDate.parse(day).toEpochDay.toInt

  protected def convert(g: Group, fs: MessageType): InternalRow = {
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      vals(i) =
        if (physical(i) == null) epochDay // the day partition value
        else LakeGroupRead.internalValue(
          g, fs, physical(i), schema.fields(i).dataType)
      i += 1
    }
    new GenericInternalRow(vals)
  }
}

/** Streams one base file, dropping every key a younger delta superseded
  * (upsert rewrites it, delete marker removes it — either way the base
  * row is dead) and every position a deletion vector tombstoned. The
  * position is the running record index in file order — exactly what
  * the writer recorded from `_metadata.row_index`.
  */
private[sources] class LakeBaseReader(
    part: LakeBaseFilePartition, schema: StructType,
    physical: Array[String], skip: Seq[RowGroupFilter],
    hadoopConf: Map[String, String])
  extends LakeRowReader(part.day, schema, physical) {

  private val conf = LakeGroupRead.confOf(hadoopConf)
  private val superseded =
    if (part.deltas.isEmpty) null
    else LakeDeltaStateCache.get(part.deltas, part.key, conf)
  private val tombstoned: java.util.HashSet[Long] =
    if (part.dvFiles.isEmpty) null
    else {
      // `file` was recorded from _metadata.file_path (file:///…) while
      // part.file comes from a listing (file:/…) — compare scheme-free
      def norm(s: String): String = new Path(s).toUri.getPath
      val mine = norm(part.file)
      val s = new java.util.HashSet[Long]()
      part.dvFiles.foreach { f =>
        val dvIt = new LakeGroupRead.GroupIterator(f, conf)
        try dvIt.foreach { g =>
          // flat positional tombstones: only OUR file's rows apply
          if (norm(g.getString("file", 0)) == mine)
            s.add(g.getLong("pos", 0))
        } finally dvIt.close()
      }
      s
    }
  private var pos = -1L
  private var groupsSkipped = 0L
  // a skipped group's rows still occupy POSITIONS in the file — advance
  // the running index so deletion-vector matching stays aligned (a
  // tombstoned row inside a skipped group is dead either way)
  private val it = new LakeGroupRead.GroupIterator(
    part.file, conf, skip, n => { pos += n; groupsSkipped += 1 },
    // page-read projection (r18): only the projected physical columns'
    // chunks are fetched — plus the key columns when a winner-map
    // lookup needs them on this delta-carrying day
    project = full => LakeGroupRead.projectionOf(
      full, schema, physical,
      if (superseded == null || part.key == null) Nil
      else LakeSnapshot.keyParts(part.key)))

  // the row-group tier's per-query surface (r18): Spark aggregates these
  // across tasks into the scan node's "graftRowGroupsSkipped" SQL metric
  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(GraftScanMetrics.Task("graftRowGroupsSkipped", groupsSkipped))
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (it.hasNext) {
      val g = it.next()
      pos += 1
      val dead =
        (tombstoned != null && tombstoned.contains(pos)) ||
          (superseded != null &&
            superseded.containsKey(
              LakeGroupRead.keyValue(g, it.fileSchema, part.key)))
      if (!dead) {
        current = convert(g, it.fileSchema)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current

  override def close(): Unit = it.close()
}

/** Emits the day's youngest-wins delta image: one pass builds the winner
  * map, a second emits exactly the rows whose (key, seq) won with op `u`
  * — delete markers and superseded upserts vanish. Per-(gen, day) keys
  * are unique (the stager collapses its batch), so (key, seq) identifies
  * one row.
  */
private[sources] class LakeDeltaFoldReader(
    part: LakeDeltaFoldPartition, schema: StructType,
    physical: Array[String], hadoopConf: Map[String, String])
  extends LakeRowReader(part.day, schema, physical) {

  private val conf = LakeGroupRead.confOf(hadoopConf)
  private val winners =
    LakeDeltaStateCache.get(part.deltas, part.key, conf)
  private val files = part.deltas.iterator
  private var it: LakeGroupRead.GroupIterator = _
  private var seq = 0
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (true) {
      if (it == null || !it.hasNext) {
        if (it != null) { it.close(); it = null }
        if (!files.hasNext) return false
        val ref = files.next()
        it = new LakeGroupRead.GroupIterator(ref.path, conf)
        seq = ref.seq
      }
      while (it.hasNext) {
        val g = it.next()
        val w = winners.get(LakeGroupRead.keyValue(g, it.fileSchema, part.key))
        if (w != null && w._1 == seq && w._2 == "u") {
          current = convert(g, it.fileSchema)
          return true
        }
      }
    }
    false // unreachable
  }

  override def get(): InternalRow = current

  override def close(): Unit = if (it != null) it.close()
}
