package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.{FileStats, LakeSnapshot}

/** `SELECT * FROM graft.tbl.files` — the LIVE snapshot's storage layout
  * as a METADATA TABLE (the Iceberg `db.table.files` idea): one row per
  * committed file of the current view — day, kind (base / delta / dv),
  * generation, file name, bytes, and exact row count where the stats
  * sidecar carries one (-1 for delta/dv files and pre-stats
  * generations). The operator questions this answers without any Scala:
  * which days are delta-heavy (OPTIMIZE targets), how skewed are file
  * sizes (compaction audit), what does a day physically hold.
  *
  * Planning cost = ONE manifest fold + one listing per live (day, gen)
  * dir + one sidecar read per touched generation — exactly the metadata
  * work a batch scan's planner already does, never a data read.
  */
private[sources] class LakeFilesTable(dir: String)
  extends Table with SupportsRead {

  override def name(): String = s"graft-lake-files:$dir"

  override def schema(): StructType = LakeFilesTable.Schema

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = LakeFilesTable.Schema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] = {
          val spark = SparkSession.active
          val state = LakeSnapshot.tableState(spark, dir)
          val p = LakeSnapshot.LakePaths(dir)
          val fs = new org.apache.hadoop.fs.Path(dir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val statsByGen = scala.collection.mutable.Map
            .empty[Int, Option[Map[String, FileStats.FileStat]]]
          // bloom-declaration coverage per (gen, day) — names only, the
          // filter bits are never decoded (r18 observability: "is my
          // point-lookup column actually bloomed here?")
          val bloomByGenDay = scala.collection.mutable.Map
            .empty[(Int, String), Map[String, Seq[String]]]
          def ls(root: String, g: Int, day: String, kind: String)
              : Seq[LakeFileRow] = {
            val dp = new org.apache.hadoop.fs.Path(s"$root/gen=$g/day=$day")
            if (!fs.exists(dp)) return Nil
            fs.listStatus(dp).toSeq
              .filter(st => st.isFile &&
                st.getPath.getName.startsWith("part-"))
              .map { st =>
                val rows =
                  if (kind != "base") -1L
                  else statsByGen.getOrElseUpdate(g,
                    FileStats.read(spark, s"$root/gen=$g"))
                    .flatMap(_.get(s"day=$day/${st.getPath.getName}"))
                    .map(_.rows).getOrElse(-1L)
                val bloom =
                  if (kind != "base") ""
                  else bloomByGenDay.getOrElseUpdate((g, day),
                    graft.etl.BloomStats.coverage(spark, s"$root/gen=$g", day))
                    .getOrElse(st.getPath.getName, Nil).mkString(",")
                LakeFileRow(day, kind, g, st.getPath.getName,
                  st.getLen, rows, bloom)
              }
          }
          val rows = state.days.toSeq.sortBy(_._1).flatMap {
            case (day, ds) =>
              (if (ds.base >= 0) ls(p.data, ds.base, day, "base") else Nil) ++
                ds.deltas.flatMap(g => ls(p.delta, g, day, "delta")) ++
                ds.dvs.flatMap(g => ls(p.dv, g, day, "dv"))
          }
          Array(LakeFilesPartition(rows))
        }
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(
                part: InputPartition): PartitionReader[InternalRow] = {
              val rows = part.asInstanceOf[LakeFilesPartition].rows.iterator
              new PartitionReader[InternalRow] {
                private var current: InternalRow = _
                override def next(): Boolean =
                  if (!rows.hasNext) false
                  else {
                    val r = rows.next()
                    current = new GenericInternalRow(Array[Any](
                      UTF8String.fromString(r.day),
                      UTF8String.fromString(r.kind), r.gen,
                      UTF8String.fromString(r.file), r.bytes, r.rows,
                      UTF8String.fromString(r.bloom)))
                    true
                  }
                override def get(): InternalRow = current
                override def close(): Unit = ()
              }
            }
          }
      }
    }
}

private[sources] final case class LakeFileRow(
    day: String, kind: String, gen: Int, file: String,
    bytes: Long, rows: Long, bloom: String = "")

private[sources] final case class LakeFilesPartition(
    rows: Seq[LakeFileRow]) extends InputPartition

private[sources] object LakeFilesTable {
  val Schema: StructType = StructType(Seq(
    StructField("day", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("gen", IntegerType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("rows", LongType, nullable = false),
    // comma-joined PHYSICAL columns a bloom sidecar covers for this
    // file ("" = none): the observability half of the bloom tier (r18)
    StructField("bloom", StringType, nullable = false)))
}
