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

import graft.etl.LakeSnapshot

/** `SELECT * FROM graft.tbl.detail` — the table-level summary as a
  * ONE-ROW metadata table (the Delta `DESCRIBE DETAIL` idea),
  * completing the observability trio with `.history` (commits) and
  * `.files` (storage): location, declared key/ts (+ recorded write
  * zone), current and checkpoint epochs, live day count, base-file
  * census (count + bytes, from one listing per live base (day, gen) —
  * the same metadata work a scan's planner does), merge-on-read layer
  * counts (the OPTIMIZE min_layers signal, manifest-only), column-
  * mapping summary (renames / dropped / widened), and the declared
  * CHECK-constraint and bloom columns. The operator question this
  * answers without Scala: "what IS this table, and does it need
  * maintenance?"
  */
private[sources] class LakeDetailTable(dir: String)
  extends Table with SupportsRead {

  override def name(): String = s"graft-lake-detail:$dir"

  override def schema(): StructType = LakeDetailTable.Schema

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = LakeDetailTable.Schema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] = {
          val spark = SparkSession.active
          val state = LakeSnapshot.tableState(spark, dir)
          val props = GraftCatalog.readCreateProps(spark, dir)
          val p = LakeSnapshot.LakePaths(dir)
          val fs = new org.apache.hadoop.fs.Path(dir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          // file/byte census across every live storage kind (a pure-MoR
          // table — e.g. born from insert-only appends — has ZERO base
          // files; bytes must still tell the truth)
          var nBaseFiles = 0L
          var bytes = 0L
          def census(root: String, g: Int, day: String, base: Boolean): Unit = {
            val dp = new org.apache.hadoop.fs.Path(s"$root/gen=$g/day=$day")
            if (fs.exists(dp))
              fs.listStatus(dp).foreach { st =>
                if (st.isFile && st.getPath.getName.startsWith("part-")) {
                  if (base) nBaseFiles += 1
                  bytes += st.getLen
                }
              }
          }
          state.days.foreach { case (day, ds) =>
            if (ds.base >= 0) census(p.data, ds.base, day, base = true)
            ds.deltas.foreach(g => census(p.delta, g, day, base = false))
            ds.dvs.foreach(g => census(p.dv, g, day, base = false))
          }
          val checkpoint = {
            val cp = new org.apache.hadoop.fs.Path(
              s"${p.manifest}/_last_checkpoint")
            if (!fs.exists(cp)) 0
            else {
              val in = fs.open(cp)
              try scala.io.Source.fromInputStream(in, "UTF-8")
                .mkString.trim.toInt
              finally in.close()
            }
          }
          val checks = props.keys
            .filter(_.startsWith(graft.etl.LakeChecks.Prefix))
            .map(_.stripPrefix(graft.etl.LakeChecks.Prefix))
            .toSeq.sorted.mkString(",")
          val row = LakeDetailRow(
            location = dir,
            key = props.getOrElse("key",
              state.key.getOrElse("")),
            ts = props.getOrElse("ts", ""),
            tsZone = props.getOrElse("ts.zone", ""),
            epoch = LakeSnapshot.currentEpoch(spark, dir),
            checkpointEpoch = checkpoint,
            nDays = state.days.size,
            nBaseFiles = nBaseFiles,
            bytes = bytes,
            nDeltaLayers = state.days.valuesIterator
              .map(_.deltas.size.toLong).sum,
            nDvLayers = state.days.valuesIterator
              .map(_.dvs.size.toLong).sum,
            nRenamed = state.colmap.count { case (ph, l) =>
              l.exists(_ != ph) },
            nDropped = state.colmap.count(_._2.isEmpty),
            nWidened = state.widened.size,
            constraints = checks,
            bloom = props.getOrElse("bloom", ""))
          Array(LakeDetailPartition(row))
        }
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(
                part: InputPartition): PartitionReader[InternalRow] = {
              val r = part.asInstanceOf[LakeDetailPartition].row
              new PartitionReader[InternalRow] {
                private var emitted = false
                override def next(): Boolean =
                  if (emitted) false else { emitted = true; true }
                override def get(): InternalRow =
                  new GenericInternalRow(Array[Any](
                    UTF8String.fromString(r.location),
                    UTF8String.fromString(r.key),
                    UTF8String.fromString(r.ts),
                    UTF8String.fromString(r.tsZone),
                    r.epoch, r.checkpointEpoch, r.nDays,
                    r.nBaseFiles, r.bytes, r.nDeltaLayers, r.nDvLayers,
                    r.nRenamed, r.nDropped, r.nWidened,
                    UTF8String.fromString(r.constraints),
                    UTF8String.fromString(r.bloom)))
                override def close(): Unit = ()
              }
            }
          }
      }
    }
}

private[sources] final case class LakeDetailRow(
    location: String, key: String, ts: String, tsZone: String,
    epoch: Int, checkpointEpoch: Int, nDays: Int,
    nBaseFiles: Long, bytes: Long, nDeltaLayers: Long, nDvLayers: Long,
    nRenamed: Int, nDropped: Int, nWidened: Int,
    constraints: String, bloom: String)

private[sources] final case class LakeDetailPartition(
    row: LakeDetailRow) extends InputPartition

private[sources] object LakeDetailTable {
  val Schema: StructType = StructType(Seq(
    StructField("location", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("ts", StringType, nullable = false),
    StructField("ts_zone", StringType, nullable = false),
    StructField("epoch", IntegerType, nullable = false),
    StructField("checkpoint_epoch", IntegerType, nullable = false),
    StructField("n_days", IntegerType, nullable = false),
    StructField("n_base_files", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("n_delta_layers", LongType, nullable = false),
    StructField("n_dv_layers", LongType, nullable = false),
    StructField("n_renamed", IntegerType, nullable = false),
    StructField("n_dropped", IntegerType, nullable = false),
    StructField("n_widened", IntegerType, nullable = false),
    StructField("constraints", StringType, nullable = false),
    StructField("bloom", StringType, nullable = false)))
}
