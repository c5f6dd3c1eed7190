package graft.etl

import java.nio.file.{Files, Path => JPath, Paths}
import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-file bloom sidecars (r17 wave 3): equality point-lookups on
  * declared high-cardinality columns skip files whose [min,max] straddles
  * everything — the tier range stats cannot serve. Blooms are an
  * optimization, never a correctness input: every probe value's rows
  * must be exactly right whether the skip fires or not.
  */
class BloomStatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val wh = {
    val p = Paths.get("target/bloom_stats_spec/wh")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    Files.createDirectories(p)
    p.toString
  }
  spark.conf.set("spark.sql.catalog.graft",
    classOf[graft.sources.GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.graft.warehouse", wh)

  /** Seed with AQE partition-coalescing disabled so the staged write
    * genuinely lands multiple files per day (the r16 byte-admission
    * fixture lesson).
    */
  private def seed(dir: String, df: DataFrame): Unit = {
    val c = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(c, "false")
    try LakeSnapshot.merge(spark, dir, df, "event_id", "ts")
    finally spark.conf.set(c, "true")
  }

  private def mkRows(n: Int): DataFrame =
    (0 until n).map { i =>
      // uids/vals are EVEN only — odd probes are absent but inside
      // [min,max], exactly the case range stats cannot prune
      (i.toLong, Timestamp.valueOf(
        s"2024-02-0${i % 2 + 1} 0${i % 8}:00:00"),
        s"u${i * 2}", i.toLong * 2)
    }.toDF("event_id", "ts", "uid", "val")

  test("equality and IN on declared bloom columns skip files min/max " +
    "cannot; probed values stay exactly right") {
    spark.sql("CREATE TABLE graft.be (event_id BIGINT, ts TIMESTAMP, " +
      "uid STRING, val BIGINT) TBLPROPERTIES ('key' = 'event_id', " +
      "'bloom' = 'uid,val')")
    val dir = s"$wh/be"
    seed(dir, mkRows(400).repartition(4))
    // the sidecars staged with the generation, one per day
    val days = Seq("2024-02-01", "2024-02-02")
    days.foreach { d =>
      val side = BloomStats.read(spark, s"$dir/data/gen=0", d)
      assert(side.isDefined, s"no bloom sidecar for day=$d")
      assert(side.get.keys.map(_._2).toSet === Set("uid", "val"),
        side.get.keys.toSeq)
    }
    def lake = spark.read.format("graft-lake").option("path", dir).load()
    // string equality, absent-but-in-range: zero rows AND files skipped
    val b0 = BloomStats.skippedFiles.get()
    assert(lake.filter(col("uid") === "u201").count() === 0L)
    assert(BloomStats.skippedFiles.get() > b0,
      "bloom skip never fired for an absent string probe")
    // present value: exactly its row
    assert(lake.filter(col("uid") === "u4")
      .select("event_id", "val").as[(Long, Long)].collect().toSeq ===
      Seq((2L, 4L)))
    // long equality through the same sidecar
    val b1 = BloomStats.skippedFiles.get()
    assert(lake.filter(col("val") === 333L).count() === 0L)
    assert(BloomStats.skippedFiles.get() > b1,
      "bloom skip never fired for an absent long probe")
    assert(lake.filter(col("val") === 6L)
      .select("uid").as[String].collect().toSeq === Seq("u6"))
    // IN: all-absent members skip; a present member still finds its row
    val b2 = BloomStats.skippedFiles.get()
    assert(lake.filter(col("uid").isin("u201", "u305")).count() === 0L)
    assert(BloomStats.skippedFiles.get() > b2,
      "bloom skip never fired for an all-absent IN")
    assert(lake.filter(col("uid").isin("u201", "u4"))
      .select("event_id").as[Long].collect().toSeq === Seq(2L))
    // the SQL surface probes identically
    assert(spark.sql(
      "SELECT count(*) FROM graft.be WHERE uid = 'u12345'")
      .as[Long].head() === 0L)
  }

  test("a table without a bloom declaration stages no sidecar and " +
    "makes no claims") {
    spark.sql("CREATE TABLE graft.bn (event_id BIGINT, ts TIMESTAMP, " +
      "uid STRING) TBLPROPERTIES ('key' = 'event_id')")
    val dir = s"$wh/bn"
    seed(dir, mkRows(50).drop("val").repartition(2))
    assert(BloomStats.read(spark, s"$dir/data/gen=0", "2024-02-01").isEmpty)
    val b0 = BloomStats.skippedFiles.get()
    assert(spark.read.format("graft-lake").option("path", dir).load()
      .filter(col("uid") === "u201").count() === 0L)
    assert(BloomStats.skippedFiles.get() === b0)
  }

  test("int -> bigint widening keeps old-generation blooms " +
    "probe-compatible (integrals hash widened to long)") {
    spark.sql("CREATE TABLE graft.bw (event_id BIGINT, ts TIMESTAMP, " +
      "small INT) TBLPROPERTIES ('key' = 'event_id', 'bloom' = 'small')")
    val dir = s"$wh/bw"
    seed(dir, mkRows(100).withColumn("small",
      (col("val") % 1000).cast("int")).drop("uid", "val").repartition(2))
    spark.sql("ALTER TABLE graft.bw ALTER COLUMN small TYPE BIGINT")
    def lake = spark.read.format("graft-lake").option("path", dir).load()
    assert(lake.schema("small").dataType.typeName === "long")
    // the predicate now arrives as a LONG literal; the pre-widen
    // generation hashed ints widened to long, so the probe still claims
    val b0 = BloomStats.skippedFiles.get()
    assert(lake.filter(col("small") === 33L).count() === 0L)
    assert(BloomStats.skippedFiles.get() > b0,
      "bloom skip lost across the widen")
    assert(lake.filter(col("small") === 4L).count() === 1L)
  }

  test("ROW-GROUP tier: parquet-native blooms written with the staged " +
    "generation prune blocks INSIDE a surviving file") {
    spark.sql("CREATE TABLE graft.brg (event_id BIGINT, ts TIMESTAMP, " +
      "uid STRING) TBLPROPERTIES ('key' = 'event_id', 'bloom' = 'uid')")
    val dir = s"$wh/brg"
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    val oldPage = hc.get("parquet.page.size")
    hc.setInt("parquet.block.size", 32 * 1024)
    hc.setInt("parquet.page.size", 8 * 1024)
    try {
      // ONE file, many tiny row groups; uids even-only, i-ordered — the
      // groups' STRING min/max ranges overlap lexicographically, so
      // stats cannot prune and only the bloom can
      val rows = (0 until 12000).map(i =>
        (i.toLong, Timestamp.valueOf("2024-02-01 10:00:00"), s"u${i * 2}"))
        .toDF("event_id", "ts", "uid").coalesce(1)
      LakeSnapshot.merge(spark, dir, rows, "event_id", "ts")
    } finally {
      if (oldBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", oldBlock)
      if (oldPage == null) hc.unset("parquet.page.size")
      else hc.set("parquet.page.size", oldPage)
    }
    // the staged file genuinely has several row groups
    val p = new org.apache.hadoop.fs.Path(s"$dir/data/gen=0/day=2024-02-01")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.startsWith("part-")).head
    val nGroups = {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          file, spark.sparkContext.hadoopConfiguration))
      try r.getFooter.getBlocks.size() finally r.close()
    }
    assert(nGroups >= 3, s"fixture needs multiple row groups, got $nGroups")
    // probe a PRESENT value: the file survives the planner (its sidecar
    // bloom says maybe), and every row group EXCEPT the value's own
    // bloom-skips executor-side
    val g0 = BloomStats.skippedGroups.get()
    val hit = spark.read.format("graft-lake").option("path", dir).load()
      .filter(col("uid") === "u4").select("event_id")
      .as[Long].collect().toSeq
    assert(hit === Seq(2L))
    assert(BloomStats.skippedGroups.get() > g0,
      "the row-group bloom probe never skipped a block")
  }

  test("path-based lakes declare blooms via option(\"bloom\") on the " +
    "write (r17 wave 7): no catalog needed, same sidecars, same probes") {
    val dir = "target/bloom_stats_spec/pathlake"
    val dp = Paths.get(dir)
    if (Files.exists(dp))
      Files.walk(dp).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    val c = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(c, "false")
    try mkRows(200).repartition(2)
      .write.format("graft-lake")
      .option("path", dir).option("key", "event_id")
      .option("bloom", "uid").option("writeMode", "cow")
      .mode("append").save()
    finally spark.conf.set(c, "true")
    // the declaration persisted (the catalog-properties shape) and the
    // very first generation staged its sidecars
    assert(BloomStats.declaredColumns(spark, dir) === Seq("uid"))
    assert(BloomStats.read(spark, s"$dir/data/gen=0", "2024-02-01")
      .isDefined)
    val b0 = BloomStats.skippedFiles.get()
    assert(spark.read.format("graft-lake").option("path", dir).load()
      .filter(col("uid") === "u201").count() === 0L)
    assert(BloomStats.skippedFiles.get() > b0)
  }

  test("OPTIMIZE re-stages blooms for the compacted generation") {
    spark.sql("CREATE TABLE graft.bo (event_id BIGINT, ts TIMESTAMP, " +
      "uid STRING) TBLPROPERTIES ('key' = 'event_id', 'bloom' = 'uid')")
    val dir = s"$wh/bo"
    seed(dir, mkRows(60).drop("val").repartition(2))
    // a MoR delta (no sidecar of its own) ...
    spark.sql("INSERT INTO graft.bo (event_id, ts, uid) VALUES " +
      "(1000, TIMESTAMP '2024-02-01 09:00:00', 'u9999')")
    // ... then OPTIMIZE folds it into a fresh base generation with blooms
    LakeSnapshot.compactDays(spark, dir)
    val st = LakeSnapshot.tableState(spark, dir)
    val gen = st.days("2024-02-01").base
    val side = BloomStats.read(spark, s"$dir/data/gen=$gen", "2024-02-01")
    assert(side.isDefined, "no bloom sidecar after OPTIMIZE")
    def lake = spark.read.format("graft-lake").option("path", dir).load()
    // the delta row folded in IS found through the new generation's bloom
    assert(lake.filter(col("uid") === "u9999")
      .select("event_id").as[Long].collect().toSeq === Seq(1000L))
    val b0 = BloomStats.skippedFiles.get()
    assert(lake.filter(col("uid") === "u31337").count() === 0L)
    assert(BloomStats.skippedFiles.get() > b0)
  }
}
