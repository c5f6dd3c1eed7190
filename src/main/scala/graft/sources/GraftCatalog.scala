package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.etl.LakeSnapshot

/** A DataSource V2 TableCatalog over a warehouse of snapshot lakes — the
  * pure-SQL surface:
  *
  * {{{
  *   SET spark.sql.catalog.graft = graft.sources.GraftCatalog
  *   SET spark.sql.catalog.graft.warehouse = /data/lakes
  *   CREATE TABLE graft.events (event_id BIGINT, ts TIMESTAMP, value DOUBLE)
  *     TBLPROPERTIES ('key' = 'event_id', 'ts' = 'ts')
  *   INSERT INTO graft.events SELECT ...    -- upsert-by-key (MoR delta)
  *   SELECT * FROM graft.events             -- the folded live view
  *   SELECT * FROM graft.events VERSION AS OF 2   -- time travel
  *   ALTER TABLE graft.events RENAME COLUMN value TO amount
  *   ALTER TABLE graft.events DROP COLUMN note    -- manifest-only commits
  *   DROP TABLE graft.events
  * }}}
  *
  * An identifier `ns1.ns2.tbl` maps to `<warehouse>/ns1/ns2/tbl`; a table
  * IS its lake directory, so SQL clients, `spark.read.format("graft-lake")`
  * readers, and the Scala API all see the one manifest (the catalog adds
  * NO state beyond `manifest/_table.properties`, the declared key/ts/
  * schema a CREATE records so the FIRST insert knows its merge key).
  * INSERT INTO is upsert-by-key — the lake's append semantics, same as
  * the DataFrameWriter path. The warehouse is re-read from the session
  * conf on every call, so tests and multi-warehouse sessions can repoint
  * it without a new catalog instance.
  */
class GraftCatalog extends TableCatalog
  with org.apache.spark.sql.connector.catalog.StagingTableCatalog
  with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  // lets the analyzer route ALTER TABLE ADD/DROP CONSTRAINT here (r18)
  override def capabilities(): util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    Set(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT).asJava

  private var catalogName: String = _
  private var initOptions: Map[String, String] = Map.empty

  override def initialize(
      name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    initOptions = options.asScala.toMap
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def warehouse: String =
    spark.conf.getOption(s"spark.sql.catalog.$catalogName.warehouse")
      .orElse(initOptions.get("warehouse"))
      .getOrElse(sys.error(
        s"graft catalog '$catalogName' needs spark.sql.catalog." +
          s"$catalogName.warehouse"))

  private def dirOf(ident: Identifier): String =
    (warehouse +: ident.namespace().toSeq :+ ident.name()).mkString("/")

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(ident: Identifier): Boolean = {
    val d = dirOf(ident)
    fs(d).exists(new Path(s"$d/manifest"))
  }

  // --- create-time properties (manifest/_table.properties) -----------------

  private def propsPath(dir: String) =
    new Path(s"$dir/manifest/_table.properties")

  private def writeCreateProps(
      dir: String, fields: Seq[(String, String)]): Unit = {
    val f = fs(dir)
    f.mkdirs(new Path(s"$dir/manifest"))
    val out = f.create(propsPath(dir), false) // CREATE races fail loudly
    try out.write(fields.map { case (k, v) => s"$k=${GraftCatalog.esc(v)}" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private[sources] def readCreateProps(dir: String): Map[String, String] =
    GraftCatalog.readCreateProps(spark, dir)

  // --- TableCatalog -------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val root = new Path((warehouse +: namespace.toSeq).mkString("/"))
    val f = fs(root.toString)
    if (!f.exists(root)) return Array.empty
    f.listStatus(root).filter(_.isDirectory)
      // dot-prefixed dirs are in-flight CTAS stagings / replace trash —
      // never visible tables
      .filter(st => !st.getPath.getName.startsWith("."))
      .filter(st => f.exists(new Path(st.getPath, "manifest")))
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    // Iceberg-style METADATA TABLE: `SELECT * FROM graft.tbl.history`
    // resolves here with name "history" under the table's namespace —
    // the commit log as SQL (epoch, operation, gen, n_days, n_dropped,
    // commit_time), no Scala call, no custom parser.
    if (!exists(ident) &&
        (ident.name() == "history" || ident.name() == "files" ||
          ident.name() == "detail") &&
        ident.namespace().nonEmpty) {
      val parent = Identifier.of(
        ident.namespace().dropRight(1), ident.namespace().last)
      if (exists(parent))
        return ident.name() match {
          case "history" => new LakeHistoryTable(dirOf(parent))
          // `.files` (r17 wave 6): the live storage layout as SQL —
          // day/kind/gen/file/bytes/rows per committed file
          case "files" => new LakeFilesTable(dirOf(parent))
          // `.detail` (r19 continuation): the one-row table summary —
          // the DESCRIBE DETAIL shape (declaration, epochs, censuses,
          // maintenance signals)
          case _ => new LakeDetailTable(dirOf(parent))
        }
    }
    loadAt(ident, epoch = None)
  }

  /** `SELECT ... FROM graft.tbl VERSION AS OF e` — the lake's time
    * travel through SQL; `e` is the manifest epoch [[LakeSnapshot
    * .describeHistory]] lists.
    */
  override def loadTable(ident: Identifier, version: String): Table =
    loadAt(ident, epoch = Some(version.toInt))

  /** `SELECT ... FROM graft.tbl TIMESTAMP AS OF '...'` — resolves to
    * the youngest epoch whose commit wall-clock is at or before the
    * requested instant (Spark hands MICROSECONDS since epoch), then
    * rides the same epoch-pinned read as VERSION AS OF. Loud when the
    * instant predates every commit.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!exists(ident)) throw new NoSuchTableException(ident)
    val dir = dirOf(ident)
    val tMs = timestampMicros / 1000L
    // shared resolution with the path-based option("timestampAsOf")
    val at = LakeSnapshot.epochAtOrBefore(spark, dir, tMs)
    require(at.nonEmpty,
      s"TIMESTAMP AS OF ${java.time.Instant.ofEpochMilli(tMs)} predates " +
        s"every commit of ${ident}")
    loadAt(ident, epoch = at)
  }

  private def loadAt(ident: Identifier, epoch: Option[Int]): Table = {
    if (!exists(ident)) throw new NoSuchTableException(ident)
    val dir = dirOf(ident)
    val created = readCreateProps(dir)
    val committed = LakeSnapshot.currentEpoch(spark, dir) >= 0
    val state =
      if (committed)
        Some(LakeSnapshot.tableState(spark, dir, epoch.map(e => e: Int)))
      else None
    val emptyView = state.exists(_.days.isEmpty)
    // the merge key: the CREATE declaration, else the key the first
    // delta commit recorded — so MERGE INTO works on lakes built by the
    // Scala API and only later attached to the catalog
    val keyProp = created.get("key").orElse(state.flatMap(_.key))
      .map("key" -> _).toMap
    val schema: StructType =
      if (!committed || emptyView)
        // never written, or TRUNCATEd empty: the CREATE's declaration
        // (scans of the empty view return zero rows of it)
        created.get("schema").map(StructType.fromDDL)
          .getOrElse(new StructType())
      else epoch match {
        case Some(e) => LakeSnapshot.readAt(spark, dir, e).schema
        case None =>
          // CURRENT view: union DECLARED-but-dataless columns (ALTER
          // TABLE ADD COLUMN before any write carries them) so SQL sees
          // the column immediately — its values read null until data
          // arrives (absent-from-file = null). Time travel (epoch set)
          // deliberately skips the union: pre-ADD views have no column.
          val live = LakeSnapshot.read(spark, dir).schema
          val declaredOnly = created.get("schema")
            .map(StructType.fromDDL).map(_.fields.toSeq).getOrElse(Nil)
            .filter(f => !live.fieldNames.contains(f.name) &&
              f.name != "day")
            .map(_.copy(nullable = true))
          StructType(live.fields ++ declaredOnly)
      }
    new LakeTable(schema,
      created ++ keyProp ++
        Map("path" -> dir, "ts" -> created.getOrElse("ts", "ts")) ++
        epoch.map(e => "epoch" -> e.toString).toMap)
  }

  /** The CREATE-time contract, shared by [[createTable]] and the staged
    * CTAS/RTAS paths: no PARTITIONED BY (tables are always
    * day-partitioned on ts), a declared merge key over real columns, a
    * real event-time column, and only lake-bridgeable column types.
    * Returns the property lines a CREATE records.
    */
  private def validateDeclaration(
      schema: StructType, partitions: Array[Transform],
      props: Map[String, String]): Seq[(String, String)] = {
    require(partitions.isEmpty,
      "graft tables are always day-partitioned on the 'ts' column — " +
        "PARTITIONED BY is not a choice to make")
    val key = props.getOrElse("key", sys.error(
      "CREATE TABLE needs TBLPROPERTIES ('key' = '<merge key column>')" +
        " — INSERT INTO is upsert-by-key"))
    require(LakeSnapshot.keyParts(key).nonEmpty &&
      LakeSnapshot.keyParts(key).forall(schema.fieldNames.contains),
      s"declared key '$key' is not a column (list) of " +
        s"${schema.fieldNames.toSeq}")
    val ts = props.getOrElse("ts", "ts")
    require(schema.fieldNames.contains(ts),
      s"event-time column '$ts' is not a column of " +
        s"${schema.fieldNames.toSeq} (set TBLPROPERTIES ts)")
    // Reject column types the lake bridges can't round-trip AT CREATE
    // time: an insert-only MERGE plans as an append (never reaching the
    // Group writer's own checks), so without this gate an unreadable
    // array-of-maps could COMMIT and only fail at first read (r16).
    schema.fields.foreach(f =>
      GraftCatalog.validateLakeType(f.name, f.dataType))
    // CHECK constraints (r17 wave 3): every `check.<name>` condition
    // must parse and resolve against the declared columns NOW — an
    // unparseable constraint discovered at first write would strand the
    // table
    props.foreach { case (k, v) =>
      if (k.startsWith(graft.etl.LakeChecks.Prefix))
        graft.etl.LakeChecks.validateDeclaration(
          spark, schema, k.stripPrefix(graft.etl.LakeChecks.Prefix), v)
    }
    // COMMENT 'x' arrives as the "comment" property; any other
    // non-reserved TBLPROPERTIES persist alongside the declarations
    val extra = props.view
      .filterKeys(k => !GraftCatalog.ReservedProps(k) &&
        !k.startsWith("option.") && k != "provider" && k != "owner" &&
        k != "location" && k != "external")
      .toSeq
    Seq("key" -> key, "ts" -> ts, "schema" -> schema.toDDL) ++ extra
  }

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (exists(ident)) throw new TableAlreadyExistsException(ident)
    val fields = validateDeclaration(
      schema, partitions, properties.asScala.toMap)
    val dir = dirOf(ident)
    writeCreateProps(dir, fields)
    new LakeTable(schema,
      Map("path" -> dir) ++ fields.filterNot(_._1 == "schema"))
  }

  /** CREATE TABLE with INLINE constraints (r18): Spark 4.1 routes
    * `CREATE TABLE (..., CONSTRAINT c CHECK (...))` through the
    * TableInfo overload, whose DEFAULT delegates to the columns
    * overload and silently DROPS `info.constraints()` — a user's
    * declared check would vanish. Map each CHECK onto the same
    * `check.<name>` property the ALTER verbs and TBLPROPERTIES route
    * write, refusing the constraint kinds the lake doesn't enforce.
    */
  override def createTable(
      ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): Table = {
    val checkProps = info.constraints().map {
      case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
        require(c.predicateSql() != null && c.predicateSql().nonEmpty,
          s"CHECK constraint '${c.name()}' needs a SQL predicate")
        (graft.etl.LakeChecks.Prefix + c.name()) -> c.predicateSql()
      case other => sys.error("only CHECK constraints are supported " +
        s"(got ${other.getClass.getSimpleName} '${other.name()}')")
    }.toMap
    val props = new util.HashMap[String, String](info.properties())
    checkProps.foreach { case (k, v) => props.put(k, v) }
    // v2 Column -> StructField by hand (CatalogV2Util is private[sql]);
    // defaults/generated columns aren't lake features, so name/type/
    // nullability is the whole declaration
    val schema = StructType(info.columns().map { c =>
      StructField(c.name(), c.dataType(), c.nullable())
    })
    createTable(ident, schema, info.partitions(), props)
  }

  // --- StagingTableCatalog: atomic CTAS / RTAS ------------------------------
  // `CREATE TABLE ... AS SELECT` / `REPLACE TABLE ... AS SELECT` /
  // `CREATE OR REPLACE TABLE ... AS SELECT`. The staged table is a real
  // lake in a dot-hidden sibling directory (`.stage-<name>-<uuid>`):
  // the SELECT's rows land there through the ordinary V1-bridge upsert
  // write (claim → stage → manifest commit), and the table only becomes
  // VISIBLE — `exists()` is `<dir>/manifest` — at commitStagedChanges:
  //   - CREATE publishes with ONE atomic rename (the declaration was
  //     written into the staged dir before any data, so there is no
  //     window where the table exists undeclared);
  //   - REPLACE swaps via rename-out → rename-in (two renames; on an
  //     in-between crash the old table is recoverable from the
  //     `.replaced-*` trash dir and the new one from `.stage-*` — no
  //     state is ever deleted before its successor is in place).
  // A failed/aborted CTAS leaves NOTHING visible: abortStagedChanges
  // deletes the staged dir, and dot-prefixed dirs are excluded from
  // listTables/exists by construction. Manifests hold paths RELATIVE to
  // the lake dir (the renameTable contract), so the rename publish is
  // sound.

  override def stageCreate(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stage(ident, schema, partitions, properties.asScala.toMap,
      replace = false, orCreate = false)

  override def stageReplace(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stage(ident, schema, partitions, properties.asScala.toMap,
      replace = true, orCreate = false)

  override def stageCreateOrReplace(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stage(ident, schema, partitions, properties.asScala.toMap,
      replace = true, orCreate = true)

  private def stage(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      props: Map[String, String], replace: Boolean, orCreate: Boolean)
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    if (!replace && exists(ident)) throw new TableAlreadyExistsException(ident)
    if (replace && !orCreate && !exists(ident))
      throw new NoSuchTableException(ident)
    val fields = validateDeclaration(schema, partitions, props)
    val destDir = dirOf(ident)
    val stagedDir = (warehouse +: ident.namespace().toSeq :+
      s".stage-${ident.name()}-${java.util.UUID.randomUUID()}")
      .mkString("/")
    // the declaration goes into the STAGED dir first: the CTAS write
    // resolves its merge key from it, and the publish rename carries it
    writeCreateProps(stagedDir, fields)
    new StagedLakeTable(ident, stagedDir, destDir, schema,
      Map("path" -> stagedDir) ++ fields.filterNot(_._1 == "schema"),
      replace, orCreate)
  }

  /** RENAME/DROP COLUMN land as the lake's manifest-only column-mapping
    * commits — zero data rewrite, old epochs keep the old names (p24's
    * machinery behind ALTER TABLE). Everything else is not a lake
    * operation and fails loudly.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!exists(ident)) throw new NoSuchTableException(ident)
    val dir = dirOf(ident)
    changes.foreach {
      // ADD COLUMN (r15, VERDICT r14 #3): a manifest-only column-mapping
      // commit binding the logical name to a physical parquet column
      // (fresh `name__k` when a rename/drop retired the name — dropped
      // values can never resurface), plus the declared-schema update so
      // the catalog surfaces the column before any data carries it. Old
      // rows null-fill (absent-from-file = null); time travel pre-ADD
      // does not see the column.
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1,
          "nested column add is not supported")
        require(a.isNullable,
          "ADD COLUMN must be nullable — existing rows null-fill")
        require(a.position() == null,
          "ADD COLUMN ... FIRST/AFTER is not supported (columns append)")
        val name = a.fieldNames()(0)
        GraftCatalog.validateLakeType(name, a.dataType())
        val declared = readCreateProps(dir)
        val declaredSchema = declared.get("schema")
          .map(StructType.fromDDL).getOrElse(new StructType())
        require(!declaredSchema.fieldNames.contains(name),
          s"column '$name' already declared")
        // bind the physical name through the manifest when the lake has
        // commits (so writers resolve it); a CREATEd-but-never-written
        // table needs only the declaration (first write binds identity)
        if (LakeSnapshot.currentEpoch(spark, dir) >= 0)
          LakeSnapshot.addColumnBinding(spark, dir, name)
        val withCol = StructType(declaredSchema.fields :+
          StructField(name, a.dataType(), nullable = true))
        rewriteCreateProps(dir, declared + ("schema" -> withCol.toDDL))
      case r: TableChange.RenameColumn =>
        require(r.fieldNames().length == 1,
          "nested column rename is not supported")
        refuseCheckedColumn(dir, r.fieldNames()(0), "RENAME")
        LakeSnapshot.renameColumn(spark, dir, r.fieldNames()(0), r.newName())
        renameDeclared(dir, r.fieldNames()(0), r.newName())
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames().length == 1,
          "nested column drop is not supported")
        refuseCheckedColumn(dir, d.fieldNames()(0), "DROP")
        LakeSnapshot.dropColumn(spark, dir, d.fieldNames()(0))
        dropDeclared(dir, d.fieldNames()(0))
      // COMMENT ON TABLE / ALTER TABLE SET-UNSET TBLPROPERTIES: plain
      // metadata on _table.properties; the table's structural
      // declarations stay immutable (reserved keys fail loudly)
      case s: TableChange.SetProperty =>
        require(!GraftCatalog.ReservedProps(s.property()),
          s"'${s.property()}' is a structural table declaration — " +
            "immutable after CREATE")
        // ADDING a CHECK constraint (r17 wave 3) gates on the declared
        // schema AND the existing data — a constraint that is already
        // false would poison every later write
        if (s.property().startsWith(graft.etl.LakeChecks.Prefix)) {
          val declared = readCreateProps(dir).get("schema")
            .map(StructType.fromDDL).getOrElse(sys.error(
              "CHECK constraints need a declared schema — CREATE the " +
                "table through the catalog first"))
          graft.etl.LakeChecks.validateExisting(spark, dir, declared,
            s.property().stripPrefix(graft.etl.LakeChecks.Prefix),
            s.value())
        }
        rewriteCreateProps(dir,
          readCreateProps(dir) + (s.property() -> s.value()))
      case rm: TableChange.RemoveProperty =>
        require(!GraftCatalog.ReservedProps(rm.property()),
          s"'${rm.property()}' is a structural table declaration — " +
            "immutable after CREATE")
        rewriteCreateProps(dir, readCreateProps(dir) - rm.property())
      // ALTER TABLE ... ADD CONSTRAINT name CHECK (cond) /
      // DROP CONSTRAINT name (r18, VERDICT r17 #8): plain-SQL verbs over
      // the same `check.<name>` declarations the TBLPROPERTIES route and
      // [[graft.etl.LakeChecks]] enforce at every write — one mechanism,
      // two spellings. ADD validates EXISTING data first, exactly like
      // the SET TBLPROPERTIES path (a constraint that is already false
      // would poison every later write).
      case ac: TableChange.AddConstraint =>
        val chk = ac.constraint() match {
          case c: org.apache.spark.sql.connector.catalog.constraints.Check => c
          case other => sys.error("only CHECK constraints are supported " +
            s"(got ${other.getClass.getSimpleName})")
        }
        require(chk.predicateSql() != null && chk.predicateSql().nonEmpty,
          "CHECK constraint needs a SQL predicate")
        val key = graft.etl.LakeChecks.Prefix + chk.name()
        val declared = readCreateProps(dir)
        require(!declared.contains(key),
          s"CHECK constraint '${chk.name()}' already exists")
        val declaredSchema = declared.get("schema")
          .map(StructType.fromDDL).getOrElse(sys.error(
            "CHECK constraints need a declared schema — CREATE the " +
              "table through the catalog first"))
        graft.etl.LakeChecks.validateExisting(spark, dir, declaredSchema,
          chk.name(), chk.predicateSql())
        rewriteCreateProps(dir, declared + (key -> chk.predicateSql()))
      case dc: TableChange.DropConstraint =>
        val key = graft.etl.LakeChecks.Prefix + dc.name()
        val declared = readCreateProps(dir)
        require(declared.contains(key) || dc.ifExists(),
          s"no CHECK constraint named '${dc.name()}' on this table")
        if (declared.contains(key))
          rewriteCreateProps(dir, declared - key)
      // ALTER COLUMN ... TYPE (r17, VERDICT r16 #3): WIDENING only —
      // int→bigint, float→double, decimal(p,s)→decimal(p+k,s) — as a
      // manifest-only `widen` binding commit: zero data rewrite, old
      // files upcast at read, new files carry the wide type, time travel
      // pre-widen reads the old type. Anything else still refuses.
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames().length == 1,
          "nested column type change is not supported")
        val name = u.fieldNames()(0)
        val nt = u.newDataType()
        GraftCatalog.validateLakeType(name, nt)
        val declared = readCreateProps(dir)
        val declaredSchema = declared.get("schema").map(StructType.fromDDL)
        if (LakeSnapshot.currentEpoch(spark, dir) >= 0 &&
            LakeSnapshot.tableState(spark, dir).days.nonEmpty)
          LakeSnapshot.widenColumn(spark, dir, name, nt) // validates
        else {
          // CREATEd-but-never-written (or truncated-empty): the
          // declaration is the only record — validate against it; the
          // first write then simply carries the wide type
          val cur = declaredSchema
            .flatMap(_.fields.find(_.name == name))
            .getOrElse(sys.error(s"no declared column '$name' to alter"))
            .dataType
          require(LakeSnapshot.isWidening(cur, nt),
            s"ALTER COLUMN '$name' TYPE only WIDENS: ${cur.simpleString}" +
              s" -> ${nt.simpleString} is not a supported widening " +
              "(int->bigint, float->double, decimal(p,s)->decimal(p+k,s))")
        }
        declaredSchema.foreach { ds =>
          val s2 = StructType(ds.fields.map(f =>
            if (f.name == name) f.copy(dataType = nt) else f))
          rewriteCreateProps(dir, declared + ("schema" -> s2.toDDL))
        }
      case other => sys.error(
        s"graft catalog: unsupported ALTER ${other.getClass.getSimpleName}" +
          " — renames/drops are manifest commits, properties/comments " +
          "are metadata, anything else is a merge or OPTIMIZE")
    }
    loadTable(ident)
  }

  /** A column a CHECK constraint references refuses RENAME/DROP until
    * the constraint is dropped (UNSET TBLPROPERTIES) — the stored
    * condition text would silently stop resolving otherwise.
    */
  private def refuseCheckedColumn(
      dir: String, column: String, verb: String): Unit = {
    val declared = readCreateProps(dir)
    val schema = declared.get("schema").map(StructType.fromDDL)
    schema.foreach { sc =>
      declared.foreach { case (k, v) =>
        if (k.startsWith(graft.etl.LakeChecks.Prefix)) {
          val name = k.stripPrefix(graft.etl.LakeChecks.Prefix)
          require(!graft.etl.LakeChecks
            .referencedColumns(spark, sc, name, v).contains(column),
            s"cannot $verb column '$column': CHECK constraint '$name' " +
              s"($v) references it — drop the constraint first " +
              s"(ALTER TABLE ... UNSET TBLPROPERTIES ('check.$name'))")
        }
      }
    }
  }

  /** Keep the CREATE declaration's schema DDL in sync with a column
    * rename/drop — without this, a later ADD COLUMN (which unions the
    * declaration into the surfaced schema) would resurrect stale names.
    * No-ops when the table was attached (no declared schema).
    */
  private def renameDeclared(dir: String, from: String, to: String): Unit = {
    val declared = readCreateProps(dir)
    declared.get("schema").foreach { ddl =>
      val s = StructType(StructType.fromDDL(ddl).fields.map(f =>
        if (f.name == from) f.copy(name = to) else f))
      rewriteCreateProps(dir, declared + ("schema" -> s.toDDL))
    }
  }

  private def dropDeclared(dir: String, name: String): Unit = {
    val declared = readCreateProps(dir)
    declared.get("schema").foreach { ddl =>
      val s = StructType(
        StructType.fromDDL(ddl).fields.filterNot(_.name == name))
      rewriteCreateProps(dir, declared + ("schema" -> s.toDDL))
    }
  }

  private def rewriteCreateProps(
      dir: String, props: Map[String, String]): Unit = {
    val f = fs(dir)
    val tmp = new Path(s"$dir/manifest/" +
      s".tmp-props-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(props.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=${GraftCatalog.esc(v)}" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    f.delete(propsPath(dir), false)
    require(f.rename(tmp, propsPath(dir)),
      s"property update rename failed at $dir")
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (!exists(ident)) return false
    GraftCatalog.forgetDeclaredTs(dirOf(ident))
    fs(dirOf(ident)).delete(new Path(dirOf(ident)), true)
  }

  // --- SQL CALL maintenance (Spark 4 ProcedureCatalog) ---------------------
  // `CALL graft.system.optimize(table => 'ns.tbl')` and friends — thin
  // SQL bindings over compactDays / optimizeZOrderN / vacuum /
  // checkpointManifest ([[GraftProcedures]]). The `table` argument is a
  // dot-separated identifier under THIS catalog.
  private def tableDir(name: String): String = {
    val parts = name.split('.').toSeq
    val ident = Identifier.of(parts.dropRight(1).toArray, parts.last)
    if (!exists(ident)) throw new NoSuchTableException(ident)
    dirOf(ident)
  }

  // resolution WITHOUT the existence gate — `convert_parquet` names a
  // table it is about to create (the procedure itself refuses an
  // existing declaration)
  private def tableDirNew(name: String): String = {
    val parts = name.split('.').toSeq
    dirOf(Identifier.of(parts.dropRight(1).toArray, parts.last))
  }

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().toSeq == Seq("system"),
      s"graft procedures live under the 'system' namespace, got $ident")
    GraftProcedures.all(tableDir, tableDirNew, () => warehouse)
      .getOrElse(ident.name(), sys.error(
        s"unknown procedure '${ident.name()}' — available: " +
          GraftProcedures.all(tableDir, tableDirNew, () => warehouse)
            .keys.toSeq.sorted.mkString(", ")))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.toSeq == Seq("system"))
      GraftProcedures.all(tableDir, tableDirNew, () => warehouse).keys.toSeq.sorted
        .map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!exists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (exists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    GraftCatalog.forgetDeclaredTs(dirOf(oldIdent))
    GraftCatalog.forgetDeclaredTs(dirOf(newIdent))
    val f = fs(dirOf(oldIdent))
    f.mkdirs(new Path(dirOf(newIdent)).getParent)
    require(f.rename(new Path(dirOf(oldIdent)), new Path(dirOf(newIdent))),
      s"rename ${oldIdent} -> ${newIdent} failed")
  }
}

/** The in-flight table of an atomic CTAS/RTAS ([[GraftCatalog.stageCreate]]
  * family): a full [[LakeTable]] rooted at the dot-hidden staging dir —
  * the SELECT's write rides the ordinary V1-bridge upsert path against
  * it — plus the publish/abort pair. Publish for CREATE is one atomic
  * rename; REPLACE is rename-out → rename-in with the displaced table
  * parked in a `.replaced-*` trash dir until the new one is in place.
  */
private[sources] class StagedLakeTable(
    ident: Identifier, stagedDir: String, destDir: String,
    tableSchema: StructType, tableProps: Map[String, String],
    replace: Boolean, orCreate: Boolean)
  extends org.apache.spark.sql.connector.catalog.StagedTable
  with org.apache.spark.sql.connector.catalog.SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite {

  private val inner = new LakeTable(tableSchema, tableProps)

  override def name(): String = ident.toString
  override def schema(): StructType = inner.schema()
  override def capabilities(): util.Set[
    org.apache.spark.sql.connector.catalog.TableCapability] = {
    // + TRUNCATE: Spark plans RTAS as OverwriteByExpression(true) over
    // the staged table; truncating a just-staged (empty-by-construction)
    // lake is a no-op, so the capability is honest HERE even though a
    // live LakeTable deliberately refuses overwrite
    val caps = new util.HashSet(inner.capabilities())
    caps.add(org.apache.spark.sql.connector.catalog.TableCapability.TRUNCATE)
    caps
  }
  override def properties(): util.Map[String, String] = inner.properties()
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    inner.newScanBuilder(options)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val base = inner.newWriteBuilder(info)
    new org.apache.spark.sql.connector.write.WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsTruncate {
      override def build(): org.apache.spark.sql.connector.write.Write =
        base.build()
      // RTAS's truncate against the EMPTY staged lake: nothing to erase
      override def truncate()
          : org.apache.spark.sql.connector.write.WriteBuilder = {
        require(LakeSnapshot.currentEpoch(
          SparkSession.active, stagedDir) < 0,
          s"staged CTAS lake at $stagedDir has commits before its " +
            "truncating write — not a fresh staging")
        this
      }
    }
  }

  private def fs = new Path(destDir)
    .getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)

  // a bare MANIFEST-LESS dest dir (crashed DROP, stray user dir) would
  // swallow the publish: FileSystem.rename moves the staged dir INTO an
  // existing destination, nesting the table invisibly at dest/.stage-*
  // while exists() stays false (ADVICE r17). Park it aside in the same
  // `.replaced-*` trash pattern a displaced table uses — the leftover
  // may be LIVE non-graft data (raw parquet dropped into the warehouse
  // path), so it is never deleted (ADVICE r18); clean_staging sweeps
  // the trash age-gated.
  private def parkLeftoverAside(f: FileSystem, dest: Path): Unit =
    if (f.exists(dest)) {
      val aside = new Path(dest.getParent,
        s".replaced-${ident.name()}-${java.util.UUID.randomUUID()}")
      require(f.rename(dest, aside),
        s"CTAS publish: could not move non-table leftover $dest aside")
    }

  override def commitStagedChanges(): Unit = {
    val f = fs
    val staged = new Path(stagedDir)
    val dest = new Path(destDir)
    GraftCatalog.forgetDeclaredTs(destDir)
    f.mkdirs(dest.getParent)
    val existed = f.exists(new Path(dest, "manifest"))
    if (!replace) {
      // CREATE: losing a publish race fails loudly — rename onto an
      // existing dir fails, nothing is overwritten
      if (existed) {
        f.delete(staged, true)
        throw new TableAlreadyExistsException(ident)
      }
      parkLeftoverAside(f, dest)
      require(f.rename(staged, dest),
        s"CTAS publish rename failed: $stagedDir -> $destDir")
    } else if (!existed) {
      // REPLACE of a table dropped since staging: only OR CREATE may
      // publish (re-checked here — the stage-time check was a fast
      // fail, this one is the decision)
      if (!orCreate) {
        f.delete(staged, true)
        throw new NoSuchTableException(ident)
      }
      parkLeftoverAside(f, dest)
      require(f.rename(staged, dest),
        s"RTAS publish rename failed: $stagedDir -> $destDir")
    } else {
      val trash = new Path(dest.getParent,
        s".replaced-${ident.name()}-${java.util.UUID.randomUUID()}")
      require(f.rename(dest, trash),
        s"RTAS swap-out rename failed: $destDir -> $trash")
      if (!f.rename(staged, dest)) {
        // restore the displaced table before failing — REPLACE must
        // never leave LESS state than it started with
        f.rename(trash, dest)
        sys.error(s"RTAS swap-in rename failed: $stagedDir -> $destDir " +
          "(original table restored)")
      }
      f.delete(trash, true)
    }
  }

  override def abortStagedChanges(): Unit = {
    fs.delete(new Path(stagedDir), true)
    ()
  }
}

object GraftCatalog {

  /** Structural declarations: immutable after CREATE (SET/UNSET
    * TBLPROPERTIES refuses them; everything else is plain metadata).
    */
  val ReservedProps: Set[String] = Set("key", "ts", "schema", "path")

  /** The lake's type contract, enforced where a table is born, exactly
    * mirroring what the Group bridges round-trip: scalars/decimal/binary
    * anywhere; structs anywhere (fields recurse); arrays of anything
    * (nested lists since r16, maps-in-arrays since r17 wave 3); maps
    * with scalar string/long/int keys whose values are ANY bridged type
    * — scalars/structs since r15, arrays and maps (maps-in-maps) since
    * r17 wave 3. The one remaining rule is the KEY type. Checked at
    * CREATE because an insert-only MERGE plans as an append (never
    * reaching the Group writer's own checks), so an unreadable shape
    * could otherwise COMMIT and only fail at first read (r16).
    */
  private[sources] def validateLakeType(
      name: String, dt: org.apache.spark.sql.types.DataType): Unit = {
    import org.apache.spark.sql.types._
    dt match {
      case MapType(kt, vt, _) =>
        require(kt == StringType || kt == LongType || kt == IntegerType,
          s"graft-lake: column '$name' has map key type $kt — " +
            "string/long/int keys only")
        validateLakeType(s"$name[value]", vt)
      case ArrayType(elem, _) => validateLakeType(s"$name[]", elem)
      case st: StructType =>
        st.fields.foreach(f =>
          validateLakeType(s"$name.${f.name}", f.dataType))
      case _ => () // scalars/decimal/binary: always bridged
    }
  }

  /** One-line value encoding for the properties file (a COMMENT may
    * carry newlines; the file is line-oriented).
    */
  private[sources] def esc(v: String): String =
    v.replace("\\", "\\\\").replace("\n", "\\n")
  private[sources] def unesc(v: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < v.length) {
      if (v.charAt(i) == '\\' && i + 1 < v.length) {
        v.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case c => sb.append(c); i += 2
        }
      } else { sb.append(v.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Merge `kv` into the lake's properties file (creating it when the
    * lake was never CREATEd through the catalog) — how the path-based
    * write surface persists declarations like `bloom` (r17 wave 7)
    * without a catalog. Reserved structural keys refuse here exactly as
    * through ALTER TABLE.
    */
  def upsertProps(
      spark: SparkSession, dir: String, kv: Map[String, String]): Unit = {
    kv.keys.foreach(k => require(!ReservedProps(k),
      s"'$k' is a structural table declaration — immutable after CREATE"))
    writeMergedProps(spark, dir, kv)
  }

  /** `ts.zone` value meaning the table's writes spanned session zones:
    * day = to_date(ts) is no longer a single-zone function of ts, so the
    * read side must not derive day bounds or ts-ordered TopN admission
    * from it (ADVICE r18). Sticky — zones cannot un-mix.
    */
  private[graft] val TsZoneMixed = "mixed"
  // memo sentinel: ts present but its write zone is unverifiable
  // (legacy table, or zone-recording refused) — nothing left to record
  private val TsZoneNone = " none"

  /** Record the event-time column a path-based write was given, once —
    * first write wins, a declared (catalog-CREATE) value is never
    * touched. This is what lets the read side derive ts→day pruning
    * WITHOUT the bare `"ts"` default guess ADVICE r17 flagged (an
    * unrelated data column physically named `ts` would have derived
    * wrong day bounds and silently pruned matching rows).
    *
    * Alongside it, record the SESSION ZONE the write's `to_date(ts)`
    * runs under (ADVICE r18): the reader derives day bounds with the
    * RECORDED zone, never its own session's. First data-free write wins;
    * a later write under a different zone flips `ts.zone` to
    * [[TsZoneMixed]] permanently, and a table that already has commits
    * before any zone was recorded stays zone-less (its history is
    * unverifiable) — both states disable the derivation, which is only
    * an optimization.
    */
  private[graft] def recordDeclaredTs(
      spark: SparkSession, dir: String, tsCol: String): Unit = {
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    // the JVM-local memo spares a streaming sink one props-file read per
    // micro-batch; keyed by the CONFIRMED zone state so a write under a
    // new session zone re-checks and records the mix
    val seen = tsRecordedDirs.get(dir)
    if (seen == zone || seen == TsZoneMixed || seen == TsZoneNone) return
    dirLock(dir).synchronized {
      val props = readCreateProps(spark, dir)
      (props.get("ts"), props.get("ts.zone")) match {
        case (None, _) => // fresh path-based table: called at STAGE time
          // of the first write, so the zone claim covers all of its data
          writeMergedProps(spark, dir,
            Map("ts" -> tsCol, "ts.zone" -> zone))
          tsRecordedDirs.put(dir, zone)
        case (Some(_), Some(z)) if z == zone || z == TsZoneMixed =>
          tsRecordedDirs.put(dir, if (z == zone) zone else TsZoneMixed)
        case (Some(_), Some(_)) => // writes spanned zones — sticky
          writeMergedProps(spark, dir, Map("ts.zone" -> TsZoneMixed))
          tsRecordedDirs.put(dir, TsZoneMixed)
        case (Some(_), None) =>
          // catalog-declared ts: safe to claim the zone only while the
          // table has no committed data (this stage is its first write)
          if (graft.etl.LakeSnapshot.currentEpoch(spark, dir) < 0) {
            writeMergedProps(spark, dir, Map("ts.zone" -> zone))
            tsRecordedDirs.put(dir, zone)
          } else tsRecordedDirs.put(dir, TsZoneNone)
      }
    }
  }
  // DROP/recreate at the same path must re-record (ADVICE r18): the
  // catalog's drop/replace paths call this, so a long-lived driver never
  // serves a stale early-return for a NEW table at an old dir
  private[graft] def forgetDeclaredTs(dir: String): Unit =
    tsRecordedDirs.remove(dir)
  private val tsRecordedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // one lock per table dir (JVM-wide): upsertProps was an unlocked
  // read-merge-write, so two same-JVM writers (ALTER TBLPROPERTIES racing
  // a path-based bloom declaration) could lose updates (ADVICE r17).
  // Cross-JVM writers still race the read-merge; the atomic overwrite
  // rename below at least guarantees a full file is always present.
  private val propsLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def dirLock(dir: String): Object =
    propsLocks.computeIfAbsent(dir, _ => new Object)

  private[sources] def writeMergedProps(
      spark: SparkSession, dir: String, kv: Map[String, String]): Unit =
    dirLock(dir).synchronized {
      val merged = readCreateProps(spark, dir) ++ kv
      val p = new Path(s"$dir/manifest/_table.properties")
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.mkdirs(p.getParent)
      val bytes = merged.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=${esc(v)}" }
        .mkString("", "\n", "\n").getBytes("UTF-8")
      val tmp = new Path(s"$dir/manifest/" +
        s".tmp-props-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(bytes) finally out.close()
      // Publish WITHOUT a no-file window (ADVICE r17: delete-then-rename
      // left a crash slot where a catalog-created table lost its key/ts/
      // schema declarations): FileContext.rename(OVERWRITE) is one
      // metadata op where the FS supports it; the fallback restores the
      // destination from the merged bytes if the classic rename fails
      // after the delete, so this call can never end with no file.
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          p.toUri, spark.sparkContext.hadoopConfiguration)
        fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch { case _: Throwable =>
        f.delete(p, false)
        if (!f.rename(tmp, p)) {
          val direct = f.create(p, true)
          try direct.write(bytes) finally direct.close()
          f.delete(tmp, false)
        }
      }
    }

  /** The CREATE-time declarations of `dir` (key/ts/schema + metadata
    * like comment), empty for a lake never created through the catalog.
    */
  def readCreateProps(
      spark: SparkSession, dir: String): Map[String, String] = {
    val p = new Path(s"$dir/manifest/_table.properties")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return Map.empty
    val in = f.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.filter(_.contains('=')).map { l =>
      val i = l.indexOf('=')
      l.substring(0, i) -> unesc(l.substring(i + 1))
    }.toMap
  }
}
