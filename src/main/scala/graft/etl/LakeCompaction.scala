package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-files compaction for a day-partitioned parquet lake (SURVEY §2 A8
  * follow-through; VERDICT r7 next-round #2).
  *
  * Streaming ingest with per-batch dynamic partition overwrite (s11) lands
  * one file-set per micro-batch per day — at 100 TB the classic small-files
  * problem: scan latency becomes file-open-bound and the name-node/manifest
  * balloons. This pass rewrites each oversized day partition to
  * target-size files and provably touches nothing else:
  *
  *  - The inventory is a driver-side FS listing of partition DIRECTORIES —
  *    catalog-scale metadata (file names + sizes), never data. At cluster
  *    scale this is the manifest/catalog scan every table format does.
  *  - Only partitions whose file count exceeds their size-derived target
  *    (ceil(bytes / targetFileBytes)) are READ — selection happens by
  *    constructing the read over exactly those sub-directories (with
  *    `basePath` preserving the partition column), so untouched days cost
  *    zero I/O, not just a pruned scan.
  *  - One Spark job for ALL compacted days: rows get a per-day file bucket
  *    (round-robin via monotonically_increasing_id modulo the day's target
  *    count, broadcast-joined — the target map is partition-count-sized),
  *    one shuffle on (day, bucket), and a single dynamic-partition-
  *    overwrite write rewrites only the days present in the job. No
  *    per-partition driver loop over data.
  *  - Idempotent: a second run finds every day at target and returns
  *    without launching a job (LakeCompactionSpec asserts byte-identical
  *    listings after the no-op run).
  */
object LakeCompaction {

  /** Per-partition inventory entry: (partition dir name, file count, bytes). */
  final case class PartitionInfo(dir: String, files: Int, bytes: Long) {
    def targetFiles(targetFileBytes: Long): Int =
      math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    def needsCompaction(targetFileBytes: Long): Boolean =
      files > targetFiles(targetFileBytes)
  }

  /** List the root's `<col>=...` partition dirs with their data-file stats. */
  def inventory(spark: SparkSession, root: String, col: String): Seq[PartitionInfo] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootPath)) return Seq.empty
    fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(col + "="))
      .map { d =>
        val files = fs.listStatus(d.getPath).toSeq
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        PartitionInfo(d.getPath.getName, files.size, files.map(_.getLen).sum)
      }
      .sortBy(_.dir)
  }

  /** Compact oversized `partitionCol` partitions of `root` to
    * ~`targetFileBytes` files. Returns (before, after) inventories.
    */
  def compactDayPartitions(
      spark: SparkSession,
      root: String,
      partitionCol: String,
      targetFileBytes: Long): (Seq[PartitionInfo], Seq[PartitionInfo]) = {
    val before = inventory(spark, root, partitionCol)
    val needy = before.filter(_.needsCompaction(targetFileBytes))
    if (needy.nonEmpty) {
      // Read EXACTLY the oversized partition dirs; basePath keeps the
      // partition column in the schema so the write re-partitions by it.
      val paths = needy.map(p => s"$root/${p.dir}")
      val rows = spark.read.option("basePath", root).parquet(paths: _*)
      // Partition-count-sized target map -> broadcast join, never a shuffle.
      val targets = spark.createDataFrame(
        needy.map(p => (p.dir.substring(partitionCol.length + 1),
          p.targetFiles(targetFileBytes)))
      ).toDF("_part_key", "_n_files")
      val bucketed = rows
        .withColumn("_part_key", col(partitionCol).cast("string"))
        .join(broadcast(targets), "_part_key")
        // Round-robin within each input split: consecutive ids cycle the
        // buckets, so every bucket fills evenly regardless of data values.
        .withColumn("_bucket", pmod(monotonically_increasing_id(), col("_n_files")))
        .repartition(col(partitionCol), col("_bucket"))
        .drop("_part_key", "_n_files", "_bucket")
      LakeSnapshot.microsWrite(bucketed,
        "spark.sql.sources.partitionOverwriteMode" -> "dynamic")(_
        .write.mode("overwrite").partitionBy(partitionCol).parquet(root))
    }
    (before, inventory(spark, root, partitionCol))
  }
}
