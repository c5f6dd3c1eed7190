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

import graft.ops.IncrementalDedup

/** `SELECT * FROM graft.tbl.history` — the commit log as a METADATA
  * TABLE (the Iceberg `db.table.history` idea): epoch, operation, gen,
  * n_days, n_dropped, commit_time for every manifest row, SQL-only, no
  * custom parser. Planning reads the manifest ONCE driver-side (it is
  * manifest-sized metadata — the same read [[LakeSnapshot
  * .describeHistory]] does) and ships the rendered rows in one
  * partition; a commit log is thousands of rows, never data-sized.
  */
private[sources] class LakeHistoryTable(dir: String)
  extends Table with SupportsRead {

  override def name(): String = s"graft-lake-history:$dir"

  override def schema(): StructType = LakeHistoryTable.Schema

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = LakeHistoryTable.Schema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] = {
          val spark = SparkSession.active
          val manifest = s"$dir/manifest"
          // the rows FIRST, then ONE listing for every commit mtime (the
          // .properties rename instant IS the commit time) — not a
          // getFileStatus per epoch, which made .history O(n²)
          // filesystem calls (ADVICE r14). Order matters: rows derive
          // from the same files, so a commit racing this scan can only
          // add mtimes the row set doesn't ask for — never the reverse.
          val rowKvs = IncrementalDedup.Manifest.read(spark, manifest)
          val fs = new org.apache.hadoop.fs.Path(manifest)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val EpochName = "epoch-(\\d+)\\.properties".r
          val mtimeByEpoch: Map[Int, Long] =
            fs.listStatus(new org.apache.hadoop.fs.Path(manifest))
              .flatMap { st =>
                st.getPath.getName match {
                  case EpochName(e) => Some(e.toInt -> st.getModificationTime)
                  case _ => None
                }
              }.toMap
          val rows = rowKvs
            .map { case (e, kv) =>
              val op =
                if (kv.contains("restore")) "restore"
                else if (kv.contains("snapshot")) "checkpoint"
                else if (kv.contains("deltagen")) "delta"
                else if (kv.contains("dvgen")) "delete-vector"
                else if (kv.contains("rename") || kv.contains("dropcol") ||
                  kv.contains("widen"))
                  "alter-column"
                else if (kv.getOrElse("dropped", "").nonEmpty) "delete"
                else if (kv.contains("convert")) "convert"
                else "write"
              val gen = kv.getOrElse("deltagen",
                kv.getOrElse("dvgen", kv.getOrElse("gen", "-1"))).toInt
              val nDays = kv.get("days")
                .map(_.split(",").count(_.nonEmpty)).getOrElse(0)
              val nDropped = kv.get("dropped")
                .map(_.split(",").count(_.nonEmpty)).getOrElse(0)
              val tMicros = mtimeByEpoch(e) * 1000L
              LakeHistoryRow(e, op, gen, nDays, nDropped, tMicros)
            }
          Array(LakeHistoryPartition(rows))
        }
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(
                p: InputPartition): PartitionReader[InternalRow] = {
              val rows = p.asInstanceOf[LakeHistoryPartition].rows.iterator
              new PartitionReader[InternalRow] {
                private var current: InternalRow = _
                override def next(): Boolean =
                  if (!rows.hasNext) false
                  else {
                    val r = rows.next()
                    current = new GenericInternalRow(Array[Any](
                      r.epoch, UTF8String.fromString(r.operation), r.gen,
                      r.nDays, r.nDropped, r.commitTimeMicros))
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

private[sources] final case class LakeHistoryRow(
    epoch: Int, operation: String, gen: Int,
    nDays: Int, nDropped: Int, commitTimeMicros: Long)

private[sources] final case class LakeHistoryPartition(
    rows: Seq[LakeHistoryRow]) extends InputPartition

private[sources] object LakeHistoryTable {
  val Schema: StructType = StructType(Seq(
    StructField("epoch", IntegerType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("gen", IntegerType, nullable = false),
    StructField("n_days", IntegerType, nullable = false),
    StructField("n_dropped", IntegerType, nullable = false),
    StructField("commit_time", TimestampType, nullable = false)))
}
