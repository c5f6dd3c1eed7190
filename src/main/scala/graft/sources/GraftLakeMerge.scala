package graft.sources

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetFileWriter
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.etl.LakeSnapshot
import graft.etl.LakeSnapshot.LakeState

/** SQL `MERGE INTO` (and row-level `UPDATE`) over the lake — the
  * DSv2 row-level-operation surface (VERDICT r13 #2):
  *
  * {{{
  *   MERGE INTO graft.events t USING updates s ON t.event_id = s.event_id
  *   WHEN MATCHED AND s.op = 'd' THEN DELETE
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * The operation is DELTA-BASED ([[SupportsDelta]], the Iceberg
  * merge-on-read shape): Spark joins the target scan with the source and
  * hands each output row to a [[DeltaWriter]] as an INSERT / UPDATE /
  * DELETE — it never rewrites untouched rows, so the write cost is
  * O(merge output), not O(touched partitions). Each writer task streams
  * its rows into per-day delta parquet files under the generation
  * [[LakeSnapshot.stageExternalDelta]] claimed (upserts as `__op = "u"`
  * full rows, deletes as `__op = "d"` key markers — exactly the files
  * `mergeDelta`/`deleteKeysDelta` stage), and the driver publishes ONE
  * manifest row via [[LakeSnapshot.commitExternalDelta]]: a whole
  * MATCHED-UPDATE/MATCHED-DELETE/NOT-MATCHED-INSERT mix lands as one
  * atomic MoR delta commit, never a rewrite, with row-delta concurrency
  * (no overlap abort). Writers write task-private dot-temp files and
  * rename on task commit, so a retried task never leaks half a file
  * into the committed generation.
  *
  * Row identity: `rowId = (key, ts)` — key is the lake's merge key; ts
  * rides along so a DELETE (which only receives the row ID) can derive
  * the day its marker files under, the same (key, ts) → day contract as
  * [[LakeSnapshot.deleteKeysDelta]]. An UPDATE that MOVES the row's day
  * (`SET ts` across a date boundary) also emits a delete marker in the
  * old day — a move, never a duplication. `UPDATE SET * / INSERT *`
  * star syntax expands over every target column including the derived
  * `day`, so the source must carry a `day` column to use it; the writer
  * re-derives day from ts regardless of the supplied value. The 100 TB
  * shape: the target scan is the day-pruned DSv2 relation, the join is
  * Catalyst's to plan, and the write moves only the merge output — no
  * driver collect anywhere.
  */
private[sources] class LakeRowLevelOperation(
    tableSchema: StructType, props: Map[String, String],
    cmd: RowLevelOperation.Command)
  extends RowLevelOperation with SupportsDelta {

  private val key = props.getOrElse("key", sys.error(
    "graft-lake: MERGE/UPDATE needs the table's merge key — CREATE the " +
      "table through the graft catalog (TBLPROPERTIES 'key') or write " +
      "to it once so the key is recorded"))
  private val ts = props.getOrElse("ts", "ts")
  require(tableSchema.fieldNames.contains(ts),
    s"graft-lake: event-time column '$ts' is not in the table schema " +
      s"${tableSchema.fieldNames.toSeq} — row-level ops derive each " +
      "row's day from it")

  override def command: RowLevelOperation.Command = cmd

  override def description(): String =
    s"graft-lake $cmd rowId=($key, $ts)"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeScanBuilder(tableSchema, props)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new LakeDeltaWrite(props, key, ts, info)
    }

  /** (key…, ts): the key — every part of a composite `'a,b'` key — IS
    * row identity in an upsert lake; ts rides along so deletes can
    * place their day marker (see class doc).
    */
  override def rowId(): Array[NamedReference] =
    (LakeSnapshot.keyParts(key).map(Expressions.column) :+
      Expressions.column(ts)).toArray
}

/** Task-level commit: the (day, published file) pairs this task wrote —
  * file paths so a driver-side mover (the streaming sink) relocates
  * EXACTLY the committed attempt's files, never a failed attempt's
  * leftovers.
  */
private[sources] final case class LakeMergeTaskCommit(
    files: Seq[(String, String)])
  extends WriterCommitMessage {
  def days: Seq[String] = files.map(_._1).distinct
}

private[sources] class LakeDeltaWrite(
    props: Map[String, String], key: String, ts: String,
    info: LogicalWriteInfo)
  extends DeltaWrite with DeltaBatchWrite {

  private val dir = GraftLakeSource.dirOf(props)

  // ONE claim, driver-side, shared by factory/commit/abort — the
  // staging snapshot also fixes the column mapping the writers bind
  // physical names against (same state the generation was claimed under)
  private lazy val staged: (Int, Int, LakeState) =
    LakeSnapshot.stageExternalDelta(SparkSession.active, dir, key)

  override def toBatch: DeltaBatchWrite = this

  override def description(): String = s"graft-lake delta write $dir"

  override def createBatchWriterFactory(
      pi: PhysicalWriteInfo): DeltaWriterFactory = {
    val spark = SparkSession.active
    val (gen, _, state) = staged
    val dataSchema = info.schema()
    val rowIdSchema = info.rowIdSchema().orElseGet(() => sys.error(
      "graft-lake: delta write without a row ID schema"))
    // physical parquet name behind each logical data column; `day` is
    // the partition value (derived from ts, never stored in files)
    val physical = dataSchema.fields.map { f =>
      if (f.name == "day") null
      else state.physicalFor(f.name).getOrElse(sys.error(
        s"graft-lake: merge column '${f.name}' has no physical binding " +
          s"at $dir — not a live column of this table"))
    }
    // a DELETE-only row-level plan (e.g. DELETE WHERE id IN (subquery),
    // r17 wave 6) carries NO data columns — rows arrive as rowId-only
    // deletes and the day derives from the rowId ts; only data-carrying
    // plans need the event-time column in the write schema
    require(dataSchema.isEmpty || dataSchema.fieldNames.contains(ts),
      s"graft-lake: merge row schema ${dataSchema.fieldNames.toSeq} is " +
        s"missing the event-time column '$ts'")
    val parts = LakeSnapshot.keyParts(key)
    // CHECK constraints bind against the merge-output schema driver-side
    // and ship to the writers as serialized bound expressions (deletes
    // carry no data row — exempt by construction)
    val checks =
      if (dataSchema.isEmpty) Nil
      else graft.etl.LakeChecks.checksOf(spark, dir).map {
        case (n, c) =>
          (n, c, graft.etl.LakeChecks.boundCheck(spark, dataSchema, n, c))
      }
    new LakeDeltaWriterFactory(
      dir, s"${LakeSnapshot.LakePaths(dir).delta}/gen=$gen",
      dataSchema, physical,
      if (dataSchema.fieldNames.contains(ts)) dataSchema.fieldIndex(ts)
      else -1,
      rowIdSchema, parts.map(rowIdSchema.fieldIndex).toArray,
      rowIdSchema.fieldIndex(ts),
      parts.map(k => state.physicalFor(k).getOrElse(k)).toArray,
      spark.sparkContext.hadoopConfiguration.asScala
        .map(e => e.getKey -> e.getValue).toMap,
      checks)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val (gen, base, _) = staged
    val days = messages.toSeq
      .collect { case m: LakeMergeTaskCommit => m.days }.flatten.distinct
    // an empty merge output commits nothing — the claimed gen is
    // unreferenced and vacuum reclaims it
    if (days.nonEmpty)
      LakeSnapshot.commitExternalDelta(
        SparkSession.active, dir, gen, base, days, key)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val (gen, _, _) = staged
    val p = new Path(s"${LakeSnapshot.LakePaths(dir).delta}/gen=$gen")
    val fs = p.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }
}

private[sources] class LakeDeltaWriterFactory(
    dir: String, root: String,
    dataSchema: StructType, physical: Array[String], tsIdxData: Int,
    rowIdSchema: StructType, keyIdxId: Array[Int], tsIdxId: Int,
    keyPhysical: Array[String], hadoopConf: Map[String, String],
    checks: Seq[(String, String,
      org.apache.spark.sql.catalyst.expressions.Expression)] = Nil)
  extends DeltaWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new LakeDeltaTaskWriter(dir, root, dataSchema, physical, tsIdxData,
      rowIdSchema, keyIdxId, tsIdxId, keyPhysical, hadoopConf,
      partitionId, taskId, checks)
}

/** One task's delta writer: streams merge output rows into per-day
  * parquet files (`__op`-tagged, physical column names) under
  * `root/day=D/`, dot-temp until task commit. `root` is the claimed
  * generation directory on the batch MERGE path, or the streaming
  * sink's per-epoch staging area (the driver moves files into the
  * generation at batch commit). Memory is O(open day writers), not
  * O(rows).
  */
private[sources] class LakeDeltaTaskWriter(
    dir: String, root: String,
    dataSchema: StructType, physical: Array[String], tsIdxData: Int,
    rowIdSchema: StructType, keyIdxId: Array[Int], tsIdxId: Int,
    keyPhysical: Array[String], hadoopConf: Map[String, String],
    partitionId: Int, taskId: Long,
    // CHECK constraints (r17 wave 3): (name, condition SQL, expression
    // bound against dataSchema, null-tolerant) — evaluated per upsert
    // row as it streams (deletes carry no data row, exempt)
    checks: Seq[(String, String,
      org.apache.spark.sql.catalyst.expressions.Expression)] = Nil)
  extends DeltaWriter[InternalRow] {

  private val conf = LakeGroupRead.confOf(hadoopConf)

  private lazy val checkPreds = checks.map { case (name, cond, e) =>
    val p = org.apache.spark.sql.catalyst.expressions.Predicate.create(e)
    p.initialize(partitionId)
    (name, cond, p)
  }

  private val fileSchema: MessageType = {
    val b = Types.buildMessage()
    dataSchema.fields.zipWithIndex.foreach { case (f, i) =>
      if (physical(i) != null)
        LakeGroupWrite.addField(b, physical(i), f.dataType)
    }
    // a DELETE-only plan (subquery DELETE, r17 wave 6) carries no data
    // columns, but its markers still write every key part — those
    // fields come from the rowId schema
    val present = physical.filter(_ != null).toSet
    keyPhysical.zipWithIndex.foreach { case (kp, k) =>
      if (!present.contains(kp))
        LakeGroupWrite.addField(
          b, kp, rowIdSchema.fields(keyIdxId(k)).dataType)
    }
    b.optional(PrimitiveType.PrimitiveTypeName.BINARY)
      .as(LogicalTypeAnnotation.stringType()).named("__op")
    b.named("spark_schema")
  }
  private val groups = new SimpleGroupFactory(fileSchema)

  private final case class DayOut(
    writer: ParquetWriter[Group], tmp: Path, fin: Path)
  private val open = mutable.LinkedHashMap.empty[String, DayOut]
  private var done = false

  private def outFor(day: String): DayOut = open.getOrElseUpdate(day, {
    val dayDir = s"$root/day=$day"
    // dot-temp: invisible to every reader (Spark and the DSv2 listings
    // both skip dot-files); renamed to part-* only on task commit, so a
    // failed/straggler attempt never leaks rows into the generation
    val tmp = new Path(dayDir, s".inprog-$partitionId-$taskId.parquet")
    val fin = new Path(dayDir, f"part-$partitionId%05d-$taskId-merge.parquet")
    val w = ExampleParquetWriter.builder(tmp)
      .withType(fileSchema)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE) // retry reuses name
      .build()
    DayOut(w, tmp, fin)
  })

  private def dayOf(micros: Long): String =
    java.time.LocalDate.ofEpochDay(
      Math.floorDiv(micros, 86400000000L)).toString

  /** The full upsert image of `row` as a `__op = "u"` delta row. */
  private def upsert(row: InternalRow): Unit = {
    require(tsIdxData >= 0,
      "graft-lake: a delete-only delta write received a DATA row — " +
        "the plan carried no event-time column to derive its day")
    require(!row.isNullAt(tsIdxData),
      s"graft-lake MERGE: NULL event-time — every written row needs " +
        s"'${dataSchema.fields(tsIdxData).name}' to derive its day")
    checkPreds.foreach { case (name, cond, p) =>
      if (!p.eval(row)) throw new IllegalArgumentException(
        s"graft-lake: CHECK constraint '$name' ($cond) violated by a " +
          "written row — the whole operation aborts, nothing commits")
    }
    val g = groups.newGroup()
    var i = 0
    while (i < physical.length) {
      if (physical(i) != null && !row.isNullAt(i))
        LakeGroupWrite.addValue(
          g, physical(i), dataSchema.fields(i).dataType, row, i)
      i += 1
    }
    g.add("__op", "u")
    outFor(dayOf(row.getLong(tsIdxData))).writer.write(g)
  }

  override def insert(row: InternalRow): Unit = upsert(row)

  override def reinsert(meta: InternalRow, row: InternalRow): Unit =
    upsert(row)

  override def update(
      meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    // the new image supersedes the old row by key at fold time — the
    // same one-row semantics as mergeDelta's upsert. When the update
    // MOVES the row's day (SET ts = ... across a date boundary), the
    // fold is per-day and the new-day image alone cannot kill the
    // old-day base row — emit a delete marker in the OLD day too, so a
    // day-moving update is a move, never a duplication (the one place
    // the DSv2 surface is STRICTER than mergeDelta, which documents
    // day-stable upserts)
    if (!id.isNullAt(tsIdxId) && !row.isNullAt(tsIdxData) &&
        dayOf(id.getLong(tsIdxId)) != dayOf(row.getLong(tsIdxData)))
      deleteMarker(id)
    upsert(row)
  }

  private def deleteMarker(id: InternalRow): Unit = {
    // id = (key…, ts) of the EXISTING row: the marker lands in that
    // row's day, the deleteKeysDelta contract — every part of a
    // composite key writes, so the fold's tuple key collides exactly
    val g = groups.newGroup()
    var k = 0
    while (k < keyIdxId.length) {
      LakeGroupWrite.addValue(g, keyPhysical(k),
        rowIdSchema.fields(keyIdxId(k)).dataType, id, keyIdxId(k))
      k += 1
    }
    g.add("__op", "d")
    outFor(dayOf(id.getLong(tsIdxId))).writer.write(g)
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    deleteMarker(id)

  override def write(row: InternalRow): Unit = upsert(row)

  override def commit(): WriterCommitMessage = {
    done = true
    val fs = new Path(dir).getFileSystem(conf)
    open.values.foreach { o =>
      o.writer.close()
      if (fs.exists(o.fin)) fs.delete(o.fin, false) // retried task's prior
      require(fs.rename(o.tmp, o.fin),
        s"graft-lake MERGE: publish rename ${o.tmp} -> ${o.fin} failed")
    }
    LakeMergeTaskCommit(
      open.toSeq.map { case (day, o) => day -> o.fin.toString })
  }

  override def abort(): Unit = {
    done = true
    val fs = new Path(dir).getFileSystem(conf)
    open.values.foreach { o =>
      try o.writer.close() catch { case _: Throwable => () }
      if (fs.exists(o.tmp)) fs.delete(o.tmp, false)
    }
  }

  override def close(): Unit =
    // lifecycle: commit() or abort() already ran; close leftover writers
    // defensively if neither did (driver-side kill)
    if (!done) abort()
}

/** Spark type → parquet schema/value bridging for the merge delta
  * writer — the WRITE mirror of [[LakeGroupRead.internalValue]], same
  * type family (the lake's supported column types), MICROS timestamps.
  *
  * Round-15 widening (VERDICT r14 #1/#2): DECIMAL (int32/int64/
  * fixed-len-bytes physical by precision — the standard parquet
  * encoding Spark itself writes, so DSv2-written deltas and V1-written
  * bases stay footer-compatible), BINARY (multimodal payloads), and
  * ARRAY of any supported scalar as a standard 3-level LIST group
  * (`name (LIST) { repeated group list { optional element } }` — the
  * layout Spark writes with writeLegacyFormat=false, so embeddings
  * columns round-trip between the SQL lake and the vector tiers).
  */
private[sources] object LakeGroupWrite {

  /** Smallest fixed-len-byte width whose two's-complement range covers
    * `precision` decimal digits — parquet's DECIMAL(FIXED) sizing rule
    * (the same table Spark's parquet writer uses).
    */
  private[sources] def minBytesForPrecision(precision: Int): Int = {
    var n = 1
    while (math.floor(math.log10(2) * (8 * n - 1)) < precision) n += 1
    n
  }

  def addField(
      b: Types.GroupBuilder[_], name: String,
      dt: DataType): Unit = {
    import PrimitiveType.PrimitiveTypeName._
    dt match {
      case LongType => b.optional(INT64).named(name)
      case IntegerType => b.optional(INT32).named(name)
      case TimestampType => b.optional(INT64)
        .as(LogicalTypeAnnotation.timestampType(
          true, LogicalTypeAnnotation.TimeUnit.MICROS)).named(name)
      case DateType => b.optional(INT32)
        .as(LogicalTypeAnnotation.dateType()).named(name)
      case DoubleType => b.optional(DOUBLE).named(name)
      case FloatType => b.optional(FLOAT).named(name)
      case BooleanType => b.optional(BOOLEAN).named(name)
      case StringType => b.optional(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named(name)
      case BinaryType => b.optional(BINARY).named(name)
      case d: DecimalType =>
        val ann = LogicalTypeAnnotation.decimalType(d.scale, d.precision)
        if (d.precision <= 9) b.optional(INT32).as(ann).named(name)
        else if (d.precision <= 18) b.optional(INT64).as(ann).named(name)
        else b.optional(FIXED_LEN_BYTE_ARRAY)
          .length(minBytesForPrecision(d.precision)).as(ann).named(name)
      case ArrayType(elem, _) =>
        val lb = b.optionalGroup().as(LogicalTypeAnnotation.listType())
          .repeatedGroup()
        // ArrayType recurses: nested LIST groups to any depth (r16);
        // maps-in-arrays recurse through the MapType case (r17 wave 3)
        addField(lb, "element", elem)
        lb.named("list").named(name)
      case MapType(kt, vt, _) =>
        // the standard parquet MAP shape: `name (MAP) { repeated group
        // key_value { required key; optional value } }` — what Spark
        // writes, so V1 bases and Group-API deltas stay footer-compatible
        val kv = b.optionalGroup().as(LogicalTypeAnnotation.mapType())
          .repeatedGroup()
        kt match {
          case StringType => kv.required(PrimitiveType.PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.stringType()).named("key")
          case LongType =>
            kv.required(PrimitiveType.PrimitiveTypeName.INT64).named("key")
          case IntegerType =>
            kv.required(PrimitiveType.PrimitiveTypeName.INT32).named("key")
          case other => throw new UnsupportedOperationException(
            s"graft-lake merge writer: unsupported map key type $other " +
              s"for '$name' (string/long/int keys)")
        }
        // values recurse: scalars/structs since r15, arrays and maps
        // since r17 wave 3 (maps-in-maps are standard nested MAP groups)
        addField(kv, "value", vt)
        kv.named("key_value").named(name)
      case st: StructType =>
        // a (possibly nested) struct column — the multimodal media
        // shape: typed metadata + binary payload as ONE parquet group
        val gb = b.optionalGroup()
        st.fields.foreach(f => addField(gb, f.name, f.dataType))
        gb.named(name)
      case other => throw new UnsupportedOperationException(
        s"graft-lake merge writer: unsupported column type $other " +
          s"for '$name'")
    }
    ()
  }

  def addValue(
      g: Group, name: String, dt: DataType,
      row: InternalRow, i: Int): Unit = dt match {
    case LongType | TimestampType => g.add(name, row.getLong(i))
    case IntegerType | DateType => g.add(name, row.getInt(i))
    case DoubleType => g.add(name, row.getDouble(i))
    case FloatType => g.add(name, row.getFloat(i))
    case BooleanType => g.add(name, row.getBoolean(i))
    case StringType => g.add(name, row.getUTF8String(i).toString)
    case BinaryType => g.add(name,
      org.apache.parquet.io.api.Binary.fromConstantByteArray(row.getBinary(i)))
    case d: DecimalType =>
      addDecimal(g, name, d, row.getDecimal(i, d.precision, d.scale))
    case ArrayType(elem, _) =>
      addArray(g, name, elem, row.getArray(i))
    case st: StructType =>
      addStruct(g.addGroup(name), st, row.getStruct(i, st.length))
    case MapType(kt, vt, _) =>
      addMap(g, name, kt, vt, row.getMap(i))
    case other => throw new UnsupportedOperationException(
      s"graft-lake merge writer: unsupported column type $other for '$name'")
  }

  /** A MAP value as the standard key_value group — shared by top-level
    * map columns and nested map elements/values (maps-in-maps and
    * maps-in-arrays recurse, r17 wave 3).
    */
  private def addMap(
      g: Group, name: String, kt: DataType, vt: DataType,
      m: org.apache.spark.sql.catalyst.util.MapData): Unit = {
    val mg = g.addGroup(name)
    val keys = m.keyArray()
    val values = m.valueArray()
    var j = 0
    while (j < m.numElements()) {
      val e = mg.addGroup("key_value")
      addElement(e, "key", kt, keys, j) // map keys are never null
      if (!values.isNullAt(j)) addElement(e, "value", vt, values, j)
      j += 1
    }
  }

  /** A decimal value under the writer's physical sizing rule —
    * int32/int64 for ≤9/≤18 digits, fixed-len big-endian two's
    * complement above — shared by top-level columns and array/map
    * elements so the encodings never diverge (ADVICE r15).
    */
  private def addDecimal(
      g: Group, name: String, d: DecimalType,
      dec: org.apache.spark.sql.types.Decimal): Unit =
    if (d.precision <= 9) g.add(name, dec.toUnscaledLong.toInt)
    else if (d.precision <= 18) g.add(name, dec.toUnscaledLong)
    else {
      // big-endian two's complement, sign-extended to the fixed width
      val width = minBytesForPrecision(d.precision)
      val raw = dec.toJavaBigDecimal.unscaledValue().toByteArray
      require(raw.length <= width,
        s"decimal overflow for '$name': needs ${raw.length}B > $width")
      val out = new Array[Byte](width)
      if (raw.head < 0) java.util.Arrays.fill(out, 0xFF.toByte)
      System.arraycopy(raw, 0, out, width - raw.length, raw.length)
      g.add(name, org.apache.parquet.io.api.Binary.fromConstantByteArray(out))
    }

  /** A LIST value as the standard 3-level group — one `list` entry per
    * element, null = entry with no `element`. Shared by top-level array
    * columns and nested array elements (arrays-of-arrays recurse, r16).
    */
  private def addArray(
      g: Group, name: String, elem: DataType,
      arr: org.apache.spark.sql.catalyst.util.ArrayData): Unit = {
    val listGroup = g.addGroup(name)
    var j = 0
    while (j < arr.numElements()) {
      val e = listGroup.addGroup("list") // one entry per element
      if (!arr.isNullAt(j)) addElement(e, "element", elem, arr, j)
      j += 1
    }
  }

  /** One array/map element into its entry group under `into` (the
    * standard field names: `element` for lists, `key`/`value` for maps).
    */
  private def addElement(
      e: Group, into: String, elem: DataType,
      arr: org.apache.spark.sql.catalyst.util.ArrayData, j: Int): Unit =
    elem match {
      case LongType | TimestampType => e.add(into, arr.getLong(j))
      case IntegerType | DateType => e.add(into, arr.getInt(j))
      case DoubleType => e.add(into, arr.getDouble(j))
      case FloatType => e.add(into, arr.getFloat(j))
      case BooleanType => e.add(into, arr.getBoolean(j))
      case StringType => e.add(into, arr.getUTF8String(j).toString)
      case BinaryType => e.add(into,
        org.apache.parquet.io.api.Binary.fromConstantByteArray(arr.getBinary(j)))
      case d: DecimalType =>
        addDecimal(e, into, d, arr.getDecimal(j, d.precision, d.scale))
      case ArrayType(inner, _) =>
        addArray(e, into, inner, arr.getArray(j))
      case MapType(kt, vt, _) =>
        addMap(e, into, kt, vt, arr.getMap(j))
      case st: StructType =>
        addStruct(e.addGroup(into), st, arr.getStruct(j, st.length))
      case other => throw new UnsupportedOperationException(
        s"graft-lake merge writer: unsupported element type $other")
    }

  /** A struct value into its group — fields recurse through
    * [[addValue]], so nested structs/arrays/decimals all land in the
    * standard encodings.
    */
  private def addStruct(
      sub: Group, st: StructType, row: InternalRow): Unit = {
    var j = 0
    while (j < st.length) {
      if (!row.isNullAt(j)) addValue(sub, st.fields(j).name,
        st.fields(j).dataType, row, j)
      j += 1
    }
  }
}
