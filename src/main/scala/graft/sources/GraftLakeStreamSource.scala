package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.LakeSnapshot

/** FULL-TABLE streaming source (VERDICT r14 #4 — "the table,
  * continuously"): `spark.readStream.format("graft-lake")
  * .option("path", dir).option("changes", "true")` emits
  *
  *   1. an INITIAL SNAPSHOT — the table's folded state pinned to the
  *      epoch current at stream start, every row stamped
  *      `_change_type = 'insert'`, `_commit_epoch = <pin>`, admitted
  *      day-by-day (`maxDaysPerBatch`) so a 100 TB backfill drains in
  *      bounded micro-batches instead of one giant batch; then
  *   2. the CDC TAIL — the write-time change sidecars from the pinned
  *      epoch onward, exactly the `graft-cdc` feed (same partitions,
  *      same reader, same `maxEpochsPerBatch` admission and loud
  *      sidecar-less-commit contract).
  *
  * This is the Delta "starting snapshot + changes" shape: a downstream
  * that folds youngest-per-key (dropping deletes/preimages) holds the
  * table's live image at every point — the s26 entry hash-equals the
  * batch read at end of stream. The `changes` option is REQUIRED (the
  * Delta `readChangeFeed` precedent): the stream's schema carries the
  * change metadata columns, and a stream that silently dropped deletes
  * would be wrong, not lenient.
  *
  * Offsets encode the phase: `s:<pinEpoch>:<daysEmitted>` during the
  * snapshot (day list is the pinned view's sorted days — immutable, so
  * a checkpoint restart mid-snapshot resumes deterministically), then
  * `t:<epoch>` for the tail. Snapshot partitions are the batch scan's
  * own (base files + per-day delta folds) wrapped with the change
  * stamp, so the fold semantics are byte-identical to a batch read of
  * the pinned epoch.
  */
private[sources] class LakeFullTableStream(
    streamSchema: StructType, props: Map[String, String])
  extends MicroBatchStream
  with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val dir = GraftLakeSource.dirOf(props)
  private val maxDaysPerBatch =
    props.get("maxDaysPerBatch").map(_.toInt).getOrElse(Int.MaxValue)
  private val maxEpochsPerBatch =
    props.get("maxEpochsPerBatch").map(_.toInt).getOrElse(Int.MaxValue)
  // byte-based admission (VERDICT r15 #5, the Delta maxBytesPerTrigger
  // shape): a skewed hot day no longer makes one micro-batch arbitrarily
  // large — the snapshot admits file-at-a-time within a day, splitting
  // at file boundaries (a day's delta FOLD is one atomic unit: its files
  // fold together). At least one unit is always admitted (progress).
  private val maxBytesPerBatch =
    props.get("maxBytesPerBatch").map(_.toLong).getOrElse(Long.MaxValue)
  // row-based admission (r17, VERDICT r16 #9): rows are what downstream
  // state sizing actually bounds. Base-file units carry EXACT row counts
  // from the generation's stats sidecar; a unit with no recorded count
  // (pre-stats generation, or a delta fold whose exact fold size is
  // unknowable pre-read) conservatively fills the whole row budget —
  // it is admitted alone, never alongside counted units.
  private val maxRowsPerBatch =
    props.get("maxRowsPerBatch").map(_.toLong).getOrElse(Long.MaxValue)
  require(maxDaysPerBatch > 0, "maxDaysPerBatch must be positive")
  require(maxEpochsPerBatch > 0, "maxEpochsPerBatch must be positive")
  require(maxBytesPerBatch > 0, "maxBytesPerBatch must be positive")
  require(maxRowsPerBatch > 0, "maxRowsPerBatch must be positive")

  private def spark = SparkSession.active

  // the data columns (everything but the change stamps) — what the
  // snapshot's inner readers produce before the wrapper appends the stamp
  private val dataSchema = StructType(streamSchema.fields.filterNot(f =>
    f.name == "_change_type" || f.name == "_commit_epoch"))

  // one snapshot plan per pinned epoch, cached: the sorted day list and
  // the column state the readers bind physical names against. viewAt is
  // a pure manifest fold — identical on every restart.
  @volatile private var snapCache: (Int, LakeSnapshot.LakeState) = _
  private def snapState(e0: Int): LakeSnapshot.LakeState = {
    val c = snapCache
    if (c != null && c._1 == e0) c._2
    else {
      val st = LakeSnapshot.tableState(spark, dir, Some(e0))
      snapCache = (e0, st)
      st
    }
  }
  private def snapDays(e0: Int): Seq[String] =
    snapState(e0).days.keys.toSeq.sorted

  /** One pinned day's admission plan: its base files (with sizes — each
    * is one admission unit) and the delta fold (one atomic unit sized as
    * the sum of its files). Built driver-side once per pin from one
    * listing per generation directory — metadata-sized, cached: the
    * pinned view is immutable, so the plan is identical on every restart.
    */
  private final case class DayPlan(
      day: String, baseFiles: Seq[(String, Long)],
      deltas: Seq[LakeDeltaFileRef], dvFiles: Seq[String],
      foldBytes: Long,
      baseRows: Seq[Long] = Nil) { // aligned with baseFiles; -1 unknown
    def unitCount: Int = baseFiles.size + (if (deltas.nonEmpty) 1 else 0)
    def unitBytes(u: Int): Long =
      if (u < baseFiles.size) baseFiles(u)._2 else foldBytes
    /** Exact rows for counted base files; -1 = unknown (fills the whole
      * row budget under `maxRowsPerBatch`). */
    def unitRows(u: Int): Long =
      if (u < baseRows.size) baseRows(u) else -1L
  }

  @volatile private var planCache: (Int, Vector[DayPlan]) = _
  private def snapPlan(e0: Int): Vector[DayPlan] = {
    val c = planCache
    if (c != null && c._1 == e0) return c._2
    val state = snapState(e0)
    val p = LakeSnapshot.LakePaths(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(d: String): Seq[(String, Long)] = {
      val dp = new org.apache.hadoop.fs.Path(d)
      if (!fs.exists(dp)) sys.error(
        s"graft-lake stream: pinned generation directory $d is missing " +
          "— vacuumed past the stream's snapshot epoch? (raise the " +
          "retention)")
      // listStatus order is NOT specified across filesystems/processes;
      // the checkpointed (dayIdx, unitIdx) offset is reinterpreted against
      // a plan rebuilt after restart, so unit indices must bind to a
      // canonical file order (ADVICE r16) — sort by path.
      fs.listStatus(dp).toSeq
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .map(st => st.getPath.toString -> st.getLen)
        .sortBy(_._1)
    }
    val key = state.key.orNull
    // per-generation stats sidecars (one tiny read per base gen, cached
    // for the plan build) — exact per-file row counts for row admission;
    // only read when the row budget is actually set
    val statsByGen = scala.collection.mutable.Map
      .empty[Int, Option[Map[String, graft.etl.FileStats.FileStat]]]
    def rowsOf(gen: Int, day: String, path: String): Long =
      if (maxRowsPerBatch == Long.MaxValue) -1L
      else statsByGen.getOrElseUpdate(gen,
        graft.etl.FileStats.read(spark, s"${p.data}/gen=$gen"))
        .flatMap(_.get(s"day=$day/" +
          new org.apache.hadoop.fs.Path(path).getName))
        .map(_.rows).getOrElse(-1L)
    val plan = snapDays(e0).map { day =>
      val ds = state.days(day)
      if (ds.deltas.nonEmpty) require(key != null,
        s"delta generations exist at $dir but no table key is recorded")
      val deltaFiles = ds.deltas.zipWithIndex.flatMap { case (g, k) =>
        files(s"${p.delta}/gen=$g/day=$day")
          .map { case (f, len) => (LakeDeltaFileRef(f, k + 1), len) }
      }
      val dvFiles = ds.dvs.flatMap(g =>
        files(s"${p.dv}/gen=$g/day=$day").map(_._1))
      val base =
        if (ds.base < 0) Nil
        else files(s"${p.data}/gen=${ds.base}/day=$day")
      DayPlan(day, base, deltaFiles.map(_._1), dvFiles,
        deltaFiles.map(_._2).sum,
        base.map { case (f, _) => rowsOf(ds.base, day, f) })
    }.toVector
    planCache = (e0, plan)
    plan
  }

  /** (dayIdx, unitIdx) normalized so a position at a day's end carries
    * over to (day + 1, 0) — one canonical encoding per position.
    */
  private def normalized(e0: Int, d0: Int, u0: Int): (Int, Int) = {
    val plan = snapPlan(e0)
    var d = d0
    var u = u0
    while (d < plan.size && u >= plan(d).unitCount) { u -= plan(d).unitCount; d += 1 }
    (d, if (d < plan.size) u else 0)
  }

  @volatile private var availableNowTarget: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(LakeSnapshot.currentEpoch(spark, dir))

  // tail-only subscribe (r17, the Delta `startingVersion` shape): a
  // consumer that already bootstrapped skips the snapshot phase and
  // starts the CDC tail at epochs AFTER `startingEpoch` (the graft-cdc
  // option's exact semantics, so switching formats never shifts a
  // window). `startingTimestamp` (r18, the Delta option's sibling —
  // VERDICT r17 #3: users think in time, not epoch numbers) resolves
  // T → "every commit at or after T": the manifest already records
  // commit wall-clocks for `.history`, so the resolution is the
  // youngest epoch committed strictly BEFORE T (tail emits AFTER it);
  // an instant predating every commit tails from -1 (everything), one
  // after every commit tails from the current epoch (future only).
  private val startingEpoch: Option[Int] = {
    val byEpoch = props.get("startingEpoch").map(_.toInt)
    val byTs = props.get("startingTimestamp").map { raw =>
      require(byEpoch.isEmpty,
        "graft-lake stream: give option 'startingEpoch' OR " +
          "'startingTimestamp', not both")
      val tMs = GraftLakeSource.parseInstantMs(raw)
      LakeSnapshot.epochAtOrBefore(spark, dir, tMs - 1).getOrElse(-1)
    }
    byEpoch.orElse(byTs)
  }

  override def initialOffset(): Offset = startingEpoch match {
    case Some(e) => LakeStreamOffset.tail(e)
    case None =>
      val e0 = LakeSnapshot.currentEpoch(spark, dir)
      if (e0 < 0) LakeStreamOffset.tail(e0) // empty lake: straight to tail
      else LakeStreamOffset.snapshot(e0, 0)
  }

  override def deserializeOffset(json: String): Offset =
    LakeStreamOffset.parse(json)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[LakeStreamOffset]
    if (!s.tailPhase) {
      val plan = snapPlan(s.epoch)
      val (d0, u0) = normalized(s.epoch, s.dayIdx, s.unitIdx)
      if (d0 >= plan.size) return tailTarget(s.epoch) // drained: hand over
      // admit units (base file / whole delta fold) until the byte or
      // row budget or the day cap closes the batch; always at least one
      // unit (progress). An unknown-row unit fills the whole row budget.
      var d = d0
      var u = u0
      var bytes = 0L
      var rows = 0L
      var admitted = 0
      var open = true
      while (open && d < plan.size && (d - d0) < maxDaysPerBatch) {
        val dp = plan(d)
        if (u >= dp.unitCount) { d += 1; u = 0 }
        else {
          val b = dp.unitBytes(u)
          val ur = dp.unitRows(u)
          val r = if (ur < 0) maxRowsPerBatch else ur
          if (admitted > 0 && (bytes + b > maxBytesPerBatch ||
              rows + r > maxRowsPerBatch)) open = false
          else {
            bytes += b; rows += r; admitted += 1; u += 1
            if (u >= dp.unitCount) { d += 1; u = 0 }
          }
        }
      }
      LakeStreamOffset.snapshot(s.epoch, d, u)
    } else tailTarget(s.epoch)
  }

  private def tailTarget(from: Int): LakeStreamOffset = {
    val current = availableNowTarget
      .getOrElse(LakeSnapshot.currentEpoch(spark, dir))
    val capped = math.min(current.toLong, from.toLong + maxEpochsPerBatch)
    LakeStreamOffset.tail(math.max(from.toLong, capped).toInt)
  }

  override def reportLatestOffset(): Offset =
    LakeStreamOffset.tail(LakeSnapshot.currentEpoch(spark, dir))

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LakeStreamOffset]
    val e = end.asInstanceOf[LakeStreamOffset]
    if (!e.tailPhase) {
      // a snapshot window: admission units [s, e) of the pinned view
      snapshotPartitions(s.epoch, (s.dayIdx, s.unitIdx),
        (e.dayIdx, e.unitIdx))
    } else if (!s.tailPhase) {
      // the handover batch: any snapshot remainder + the first tail window
      val rest = snapshotPartitions(s.epoch, (s.dayIdx, s.unitIdx),
        (snapPlan(s.epoch).size, 0))
      rest ++ tailPartitions(s.epoch, e.epoch)
    } else tailPartitions(s.epoch, e.epoch)
  }

  /** The pinned view's partitions for admission units [from, to) — the
    * batch scan's own shapes (base file + per-day delta fold), wrapped
    * with the snapshot change stamp.
    */
  private def snapshotPartitions(
      e0: Int, from: (Int, Int), to: (Int, Int)): Array[InputPartition] = {
    val plan = snapPlan(e0)
    val state = snapState(e0)
    val key = state.key.orNull
    // physical parquet names bind against the PINNED state, resolved
    // DRIVER-side once and shipped inside the partitions — executors
    // never touch the manifest. A column with NO physical binding at
    // the pin (added after it — including a re-add of a name the pin
    // knew as DROPPED) reads null via a sentinel that exists in no
    // file; an identity fallback here would RESURRECT the dropped
    // column's pre-drop values from pinned files.
    val physical = dataSchema.fields.map { f =>
      if (f.name == "day") null
      else state.physicalFor(f.name).getOrElse("\u0000absent")
    }
    val (d0, u0) = normalized(e0, from._1, from._2)
    val (d1, u1) = normalized(e0, to._1, to._2)
    val out = Vector.newBuilder[InputPartition]
    var d = d0
    while (d < plan.size && (d < d1 || (d == d1 && u1 > 0))) {
      val dp = plan(d)
      val lo = if (d == d0) u0 else 0
      val hi = if (d == d1) u1 else dp.unitCount
      var u = lo
      while (u < hi) {
        out += (if (u < dp.baseFiles.size)
          LakeSnapshotChangePartition(
            LakeBaseFilePartition(dp.day, dp.baseFiles(u)._1, dp.deltas,
              dp.dvFiles, key), e0, physical)
        else
          LakeSnapshotChangePartition(
            LakeDeltaFoldPartition(dp.day, dp.deltas, key), e0, physical))
        u += 1
      }
      d += 1
    }
    out.result().toArray
  }

  private def tailPartitions(from: Int, to: Int): Array[InputPartition] = {
    if (to <= from) return Array.empty
    val p = new org.apache.hadoop.fs.Path(s"$dir/cdf")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    LakeSnapshot.cdfGens(spark, dir, from, to).flatMap { case (e, g) =>
      val genDir = new org.apache.hadoop.fs.Path(p, s"gen=$g")
      if (!f.exists(genDir)) sys.error(
        s"graft-lake stream: epoch $e's change sidecar $genDir is " +
          "missing — vacuumed past the consumer's offset? (raise the " +
          "retention)")
      f.listStatus(genDir)
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .map(st => CdcFilePartition(st.getPath.toString, e): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration.asScala
      .map(e => e.getKey -> e.getValue).toMap
    new LakeStreamReaderFactory(streamSchema, dataSchema, hadoopConf)
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Phase-carrying offset: `s:<pinEpoch>:<daysEmitted>[:<unitsInDay>]`
  * mid-snapshot (the unit index is omitted at a day boundary, so
  * pre-r16 checkpoints — day granularity only — parse unchanged),
  * `t:<epoch>` on the tail.
  */
final case class LakeStreamOffset(
    tailPhase: Boolean, epoch: Int, dayIdx: Int, unitIdx: Int = 0)
  extends Offset {
  override def json(): String =
    if (tailPhase) s"t:$epoch"
    else if (unitIdx == 0) s"s:$epoch:$dayIdx"
    else s"s:$epoch:$dayIdx:$unitIdx"
}

object LakeStreamOffset {
  def snapshot(e0: Int, dayIdx: Int, unitIdx: Int = 0): LakeStreamOffset =
    LakeStreamOffset(tailPhase = false, e0, dayIdx, unitIdx)
  def tail(epoch: Int): LakeStreamOffset =
    LakeStreamOffset(tailPhase = true, epoch, -1)
  def parse(json: String): LakeStreamOffset = json.trim.split(':') match {
    case Array("t", e) => tail(e.toInt)
    case Array("s", e, i) => snapshot(e.toInt, i.toInt)
    case Array("s", e, i, u) => snapshot(e.toInt, i.toInt, u.toInt)
    case _ => sys.error(s"graft-lake stream: unparseable offset '$json'")
  }
}

/** A batch-scan snapshot partition (base file or delta fold) wrapped
  * with the pinned epoch its rows are stamped with and the
  * driver-resolved physical column bindings.
  */
final case class LakeSnapshotChangePartition(
    inner: InputPartition, epoch: Int, physical: Array[String])
  extends InputPartition

private[sources] class LakeStreamReaderFactory(
    streamSchema: StructType, dataSchema: StructType,
    hadoopConf: Map[String, String])
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case c: CdcFilePartition =>
        // the tail IS the cdc feed — same reader, stream schema (it maps
        // by name; `_commit_epoch` stamps from the partition)
        new CdcPartitionReader(c, streamSchema, hadoopConf)
      case s: LakeSnapshotChangePartition =>
        val inner = s.inner match {
          case b: LakeBaseFilePartition =>
            new LakeBaseReader(b, dataSchema, s.physical, Nil, hadoopConf)
          case d: LakeDeltaFoldPartition =>
            new LakeDeltaFoldReader(d, dataSchema, s.physical, hadoopConf)
          case other => sys.error(s"graft-lake stream: unexpected $other")
        }
        new SnapshotChangeReader(inner, dataSchema, s.epoch)
      case other => sys.error(s"graft-lake stream: unexpected $other")
    }
}

/** Wraps a batch snapshot reader's rows with the change stamp: every
  * pinned-view row is an `insert` at the pin epoch.
  */
private[sources] class SnapshotChangeReader(
    inner: PartitionReader[InternalRow], dataSchema: StructType,
    epoch: Int)
  extends PartitionReader[InternalRow] {

  private val n = dataSchema.length

  override def next(): Boolean = inner.next()

  override def get(): InternalRow = {
    val row = inner.get()
    val vals = new Array[Any](n + 2)
    var i = 0
    while (i < n) {
      vals(i) = row.get(i, dataSchema.fields(i).dataType)
      i += 1
    }
    vals(n) = UTF8String.fromString("insert")
    vals(n + 1) = epoch
    new GenericInternalRow(vals)
  }

  override def close(): Unit = inner.close()
}

private[sources] object LakeFullTableStream {
  /** The stream's schema: the change-sidecar union when sidecars exist
    * (so tail-side evolution surfaces) ∪ the current table's data
    * columns (so a table with no sidecars yet still streams its
    * snapshot), minus the derived `day`, plus the change stamps.
    */
  def streamSchema(spark: SparkSession, dir: String): StructType = {
    // per-gen-dir footers, never partition discovery: the gen= key must
    // not surface as a data column (ADVICE r15; shared with graft-cdc)
    val sidecar: Seq[StructField] =
      GraftCdcSource.sidecarFields(spark, s"$dir/cdf")
    val table: Seq[StructField] =
      if (LakeSnapshot.currentEpoch(spark, dir) >= 0 &&
          LakeSnapshot.tableState(spark, dir).days.nonEmpty)
        LakeSnapshot.read(spark, dir).schema.fields.toSeq
      else Nil
    val dataCols = (table ++ sidecar)
      .filterNot(f => f.name == "day" || f.name == "_change_type")
      .foldLeft(Vector.empty[StructField])((acc, f) =>
        if (acc.exists(_.name == f.name)) acc else acc :+ f)
    require(dataCols.nonEmpty,
      s"graft-lake stream: nothing to stream at $dir — the lake has no " +
        "committed data and no change sidecars")
    StructType(dataCols :+
      StructField("_change_type", StringType) :+
      StructField("_commit_epoch", IntegerType))
  }
}
