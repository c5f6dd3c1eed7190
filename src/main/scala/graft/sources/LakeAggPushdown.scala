package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.{FileStats, LakeSnapshot}
import graft.etl.LakeSnapshot.{DayState, LakeState}

/** METADATA-ONLY aggregate pushdown (r17): `SELECT count(*) / min(c) /
  * max(c) FROM lake [WHERE day-only]` answered from the manifest fold +
  * the per-generation stats sidecars — ZERO data files opened, zero
  * tasks over table bytes. At 100 TB this is the difference between a
  * row-count in milliseconds and a cluster-wide scan (the Iceberg/Delta
  * "stats as query input" shape).
  *
  * The push is PARTIAL (`supportCompletePushDown = false`): the scan
  * emits ONE partial row and Spark's final aggregate merges it — a
  * refused push (any condition below) falls back to the normal scan,
  * never to a wrong answer. Pushdown is accepted ONLY when every
  * selected day is a pure base (no row deltas to fold, no deletion
  * vectors to subtract), every base file has a sidecar row, and — for
  * min/max — every file's stat family is usable for the column's type.
  * That is exactly the regime where sidecar stats are EXACT, not bounds:
  * footers record true min/max, and staging wrote the sidecar from the
  * same footers the files ship with.
  */
private[graft] object LakeAggPushdown {

  sealed trait Spec
  case object CountStarSpec extends Spec
  /** count(col) = rows - nulls: answerable from the r17 sidecar null
    * counts (pre-r17 sidecars lack them → the push refuses). */
  final case class CountColSpec(logical: String) extends Spec
  final case class MinSpec(logical: String, dt: DataType) extends Spec
  final case class MaxSpec(logical: String, dt: DataType) extends Spec

  private def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case nr: NamedReference if nr.fieldNames().length == 1 =>
      Some(nr.fieldNames()(0))
    case _ => None
  }

  /** Translate the pushed aggregation — None when any function/column
    * is outside the supported set (CountStar, Min/Max on stat-usable
    * scalar types; no GROUP BY).
    */
  /** (groupByDay, specs) — group-by is supported for exactly the `day`
    * partition column (the everyday reporting shape: per-day counts).
    */
  def specsOf(agg: Aggregation, schema: StructType)
      : Option[(Boolean, Seq[Spec])] = {
    val gb = agg.groupByExpressions()
    val groupByDay = gb.length == 1 && colOf(gb(0)).contains("day")
    if (gb.nonEmpty && !groupByDay) return None
    def typed(name: String): Option[DataType] =
      schema.fields.find(_.name == name).map(_.dataType).filter {
        case LongType | IntegerType | DateType | TimestampType |
             DoubleType | FloatType | StringType => true
        case _: DecimalType => true
        case _ => false
      }
    val specs = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(CountStarSpec)
      // count(col): rows - nulls from the r17 sidecar null counts;
      // count(DISTINCT col) is not stats-answerable
      case c: Count if !c.isDistinct() =>
        colOf(c.column()).map(CountColSpec)
      // min/max(day): the partition column — answered from the manifest
      // day SET itself, no stats needed
      case m: Min => colOf(m.column()).flatMap(c =>
        if (c == "day") Some(MinSpec("day", DateType))
        else typed(c).map(MinSpec(c, _)))
      case m: Max => colOf(m.column()).flatMap(c =>
        if (c == "day") Some(MaxSpec("day", DateType))
        else typed(c).map(MaxSpec(c, _)))
      case _: AggregateFunc => None
    }
    if (specs.forall(_.isDefined)) Some((groupByDay, specs.flatten))
    else None
  }

  /** The scan-output schema for the partial rows: group-by columns
    * FIRST, then the agg columns in order (the JDBC convention Spark's
    * rewrite expects).
    */
  def schemaOf(groupByDay: Boolean, specs: Seq[Spec]): StructType =
    StructType(
      (if (groupByDay) Seq(StructField("day", DateType, false)) else Nil) ++
      specs.zipWithIndex.map {
        case (CountStarSpec, i) => StructField(s"agg_$i", LongType, false)
        case (CountColSpec(_), i) => StructField(s"agg_$i", LongType, false)
        case (MinSpec(_, dt), i) => StructField(s"agg_$i", dt, true)
        case (MaxSpec(_, dt), i) => StructField(s"agg_$i", dt, true)
      })

  /** Compute the partial values from the sidecars, or None when any
    * condition fails (→ the caller refuses the push and the normal scan
    * answers). Driver-side: one listing per selected day + one sidecar
    * read per touched generation.
    */
  def compute(
      spark: SparkSession, dir: String, state: LakeState,
      dayFilters: Seq[org.apache.spark.sql.sources.Filter],
      groupByDay: Boolean, specs: Seq[Spec]): Option[Seq[Array[Any]]] = {
    val p = LakeSnapshot.LakePaths(dir)
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sel: Seq[(String, DayState)] = state.days.toSeq.sortBy(_._1)
      .filter { case (d, _) => GraftLakeSource.dayOk(d, dayFilters) }
    // pure-base days only: a delta fold or a DV subtraction changes the
    // row population in ways stats cannot see
    if (!sel.forall { case (_, ds) =>
      ds.base >= 0 && ds.deltas.isEmpty && ds.dvs.isEmpty }) return None
    val statsByGen = scala.collection.mutable.Map
      .empty[Int, Option[Map[String, FileStats.FileStat]]]
    // resolve min/max columns to PHYSICAL names once; a column with no
    // physical binding was never written → all null
    val phys: Map[String, Option[String]] = specs.collect {
      case MinSpec(l, _) if l != "day" => l
      case MaxSpec(l, _) if l != "day" => l
      case CountColSpec(l) if l != "day" => l
    }.distinct.map(l => l -> state.physicalFor(l)).toMap
    val countCols: Set[String] = specs.collect {
      case CountColSpec(l) if l != "day" => l }.toSet

    // per-GROUP accumulators (one group per day when grouped, a single
    // "" group otherwise): row count + running (min, max) ColStat-space
    // values per logical column
    final case class Acc(
        var count: Long = 0L,
        mins: scala.collection.mutable.Map[String, FileStats.ColStat] =
          scala.collection.mutable.Map.empty,
        maxs: scala.collection.mutable.Map[String, FileStats.ColStat] =
          scala.collection.mutable.Map.empty,
        nonNull: scala.collection.mutable.Map[String, Long] =
          scala.collection.mutable.Map.empty.withDefaultValue(0L))
    val accs = scala.collection.mutable.LinkedHashMap.empty[String, Acc]
    def fold(into: scala.collection.mutable.Map[String, FileStats.ColStat],
        l: String, c: FileStats.ColStat, takeMin: Boolean): Boolean = {
      import FileStats.cmpUtf8
      into.get(l) match {
        case None => into(l) = c; true
        case Some(prev) if prev.family != c.family => false
        case Some(prev) if prev.family == "c" && prev.scale != c.scale =>
          false
        case Some(prev) =>
          val pick = (prev.family, takeMin) match {
            case ("l" | "c", true) => if (c.lmn < prev.lmn) c else prev
            case ("l" | "c", false) => if (c.lmx > prev.lmx) c else prev
            case ("d", true) => if (c.dmn < prev.dmn) c else prev
            case ("d", false) => if (c.dmx > prev.dmx) c else prev
            case ("s", true) => if (cmpUtf8(c.smn, prev.smn) < 0) c else prev
            case ("s", false) => if (cmpUtf8(c.smx, prev.smx) > 0) c else prev
            case _ => return false
          }
          into(l) = pick
          true
      }
    }
    for ((day, ds) <- sel) {
      val acc = accs.getOrElseUpdate(if (groupByDay) day else "", Acc())
      val dp = new Path(s"${p.data}/gen=${ds.base}/day=$day")
      if (!fs.exists(dp)) return None
      val files = fs.listStatus(dp)
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .map(_.getPath.getName).toSeq
      val stats = statsByGen.getOrElseUpdate(ds.base,
        FileStats.read(spark, s"${p.data}/gen=${ds.base}"))
        .getOrElse(return None) // pre-stats generation: no claim
      for (f <- files) {
        val st = stats.getOrElse(s"day=$day/$f", return None)
        acc.count += st.rows
        for ((l, ph) <- phys) {
          // absent column / no binding / all-null: contributes nothing;
          // an unusable min/max family forfeits the push only when a
          // min/max actually needs it (count(col) reads null counts,
          // which any family carries)
          val cs = ph.flatMap(st.cols.get)
          if (countCols(l)) cs match {
            case None => () // absent / never written: all null, +0
            case Some(c) if c.family == "n" => ()
            case Some(c) =>
              if (c.nulls < 0) return None // pre-r17 sidecar: unknown
              acc.nonNull(l) = acc.nonNull(l) + (st.rows - c.nulls)
          }
          val needMinMax = specs.exists {
            case MinSpec(`l`, _) | MaxSpec(`l`, _) => true
            case _ => false
          }
          if (needMinMax) cs match {
            case None => ()
            case Some(c) if c.family == "n" => ()
            case Some(c) if c.family == "x" => return None
            case Some(c) =>
              if (!fold(acc.mins, l, c, takeMin = true)) return None
              if (!fold(acc.maxs, l, c, takeMin = false)) return None
          }
        }
      }
    }
    if (!groupByDay && accs.isEmpty) accs("") = Acc() // global: one row
    // render each agg value in the column's INTERNAL representation;
    // a family/type mismatch (e.g. decimal scale drift) refuses
    def render(c: FileStats.ColStat, dt: DataType, takeMin: Boolean)
        : Option[Any] = {
      val lv = if (takeMin) c.lmn else c.lmx
      val dv = if (takeMin) c.dmn else c.dmx
      val sv = if (takeMin) c.smn else c.smx
      (c.family, dt) match {
        case ("l", LongType) => Some(lv)
        case ("l", IntegerType) => Some(lv.toInt)
        case ("l", DateType) => Some(lv.toInt)
        case ("l", TimestampType) => Some(lv)
        case ("d", DoubleType) => Some(dv)
        case ("d", FloatType) => Some(dv.toFloat)
        case ("s", StringType) => Some(UTF8String.fromBytes(sv))
        case ("c", d: DecimalType) if c.scale == d.scale =>
          Some(Decimal(BigDecimal(java.math.BigInteger.valueOf(lv), d.scale),
            d.precision, d.scale))
        case _ => None
      }
    }
    def dayEpoch(d: String): Int =
      java.time.LocalDate.parse(d).toEpochDay.toInt
    val rows = accs.toSeq.map { case (g, acc) =>
      val gcol = if (groupByDay) Seq[Any](dayEpoch(g)) else Nil
      // within a day group, min/max(day) IS the group; globally it is
      // the day-set bounds
      def dayLo = if (groupByDay) dayEpoch(g)
        else if (sel.isEmpty) null else dayEpoch(sel.map(_._1).min)
      def dayHi = if (groupByDay) dayEpoch(g)
        else if (sel.isEmpty) null else dayEpoch(sel.map(_._1).max)
      val vals = specs.map {
        case CountStarSpec => acc.count
        case CountColSpec("day") => acc.count // the partition col: no nulls
        case CountColSpec(l) => acc.nonNull(l)
        case MinSpec("day", _) => dayLo
        case MaxSpec("day", _) => dayHi
        case MinSpec(l, dt) => acc.mins.get(l) match {
          case None => null // no non-null value anywhere
          case Some(c) => render(c, dt, takeMin = true).getOrElse(return None)
        }
        case MaxSpec(l, dt) => acc.maxs.get(l) match {
          case None => null
          case Some(c) => render(c, dt, takeMin = false).getOrElse(return None)
        }
      }
      (gcol ++ vals).toArray[Any]
    }
    Some(rows)
  }

  /** Diagnostic only: pushes answered from metadata (specs assert). */
  val pushedAggs = new java.util.concurrent.atomic.AtomicLong(0L)
}

/** The agg-pushed scan: ONE partition carrying the precomputed partial
  * row — no file is ever opened.
  */
private[sources] class LakeAggScan(
    out: StructType, rows: Seq[Array[Any]], label: String)
  extends Scan with Batch {
  override def readSchema(): StructType = out
  override def description(): String = s"graft-lake agg-pushdown $label"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(LakeAggResultPartition(rows))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          p: InputPartition): PartitionReader[InternalRow] = {
        val vs = p.asInstanceOf[LakeAggResultPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < vs.length }
          override def get(): InternalRow = new GenericInternalRow(vs(i))
          override def close(): Unit = ()
        }
      }
    }
}

private[sources] final case class LakeAggResultPartition(
    rows: Seq[Array[Any]])
  extends InputPartition
