package graft.sources

import java.nio.file.{Files, Path => JPath, Paths}

import graft.TestSpark
import graft.etl.LakeSnapshot
import org.scalatest.funsuite.AnyFunSuite

/** Atomic CTAS / RTAS through [[GraftCatalog]]'s StagingTableCatalog
  * surface (r17 wave 3): the SELECT's rows land in a dot-hidden staging
  * lake and the table only becomes visible at commit — a failed CTAS
  * leaves NOTHING (no table, no staged dir), and REPLACE swaps the old
  * table out only after the new one is fully written.
  */
class LakeCtasSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val wh = {
    val p = Paths.get("target/lake_ctas_spec/wh")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    Files.createDirectories(p)
    p.toString
  }
  spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.graft.warehouse", wh)

  private def srcView(): Unit =
    Seq(
      (1L, "2024-01-01 10:00:00", 1.0),
      (2L, "2024-01-01 11:00:00", 2.0),
      (3L, "2024-01-02 10:00:00", 3.0),
      (4L, "2024-01-02 11:00:00", 4.0))
      .toDF("id", "ts_s", "v")
      .selectExpr("id", "CAST(ts_s AS TIMESTAMP) AS ts", "v")
      .createOrReplaceTempView("ctas_src")

  private def noStagingLeftovers(): Unit = {
    val dirs = Files.list(Paths.get(wh)).iterator()
    val stray = new scala.collection.mutable.ArrayBuffer[String]
    while (dirs.hasNext) {
      val d = dirs.next().getFileName.toString
      if (d.startsWith(".stage-") || d.startsWith(".replaced-")) stray += d
    }
    assert(stray.isEmpty, s"staging leftovers in warehouse: $stray")
  }

  test("CREATE TABLE AS SELECT: one atomic publish, upsert semantics, " +
    "declaration recorded") {
    srcView()
    spark.sql("CREATE TABLE graft.ctas1 TBLPROPERTIES ('key' = 'id') " +
      "AS SELECT id, ts, v FROM ctas_src")
    assert(spark.sql("SELECT id, v FROM graft.ctas1 ORDER BY id")
      .as[(Long, Double)].collect().toSeq ===
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)))
    // the CTAS recorded the full CREATE declaration: a follow-up INSERT
    // resolves the merge key from it (upsert, not blind append)
    spark.sql("INSERT INTO graft.ctas1 (id, ts, v) VALUES " +
      "(1, TIMESTAMP '2024-01-01 10:00:00', 100.0)")
    assert(spark.sql("SELECT v FROM graft.ctas1 WHERE id = 1")
      .as[Double].head() === 100.0)
    assert(spark.sql("SELECT count(*) FROM graft.ctas1")
      .as[Long].head() === 4L)
    // SHOW CREATE TABLE round-trips the key declaration
    val show = spark.sql("SHOW CREATE TABLE graft.ctas1")
      .as[String].head()
    assert(show.contains("'key' = 'id'"), show)
    noStagingLeftovers()
  }

  test("CTAS into an existing table name fails loudly and changes nothing") {
    srcView()
    val before = spark.sql("SELECT count(*) FROM graft.ctas1").as[Long].head()
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.ctas1 TBLPROPERTIES ('key' = 'id') " +
        "AS SELECT id, ts, v FROM ctas_src WHERE id = 1")
    }
    assert(spark.sql("SELECT count(*) FROM graft.ctas1")
      .as[Long].head() === before)
    noStagingLeftovers()
  }

  test("a mid-write CTAS failure aborts invisibly: no table, no staged dir") {
    srcView()
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.ctas_boom TBLPROPERTIES ('key' = 'id') " +
        "AS SELECT id, ts, " +
        "CASE WHEN id = 3 THEN CAST(raise_error('boom') AS DOUBLE) " +
        "ELSE v END AS v FROM ctas_src")
    }
    assert(!spark.sql("SHOW TABLES IN graft").collect()
      .map(_.getString(1)).contains("ctas_boom"))
    intercept[Exception] { spark.sql("SELECT * FROM graft.ctas_boom") }
    noStagingLeftovers()
  }

  test("CTAS declaration gates still fire at stage time (key required, " +
    "bridgeable types only) — nothing staged") {
    srcView()
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE graft.ctas_nokey AS SELECT id, ts, v " +
        "FROM ctas_src")
    }
    assert(e1.getMessage.contains("key"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE graft.ctas_badtype " +
        "TBLPROPERTIES ('key' = 'id') AS SELECT id, ts, " +
        "map(array(1L), 2L) AS m FROM ctas_src")
    }
    assert(e2.getMessage.contains("map key type"), e2.getMessage)
    noStagingLeftovers()
  }

  test("REPLACE TABLE AS SELECT: the swap is whole — new rows, new " +
    "schema, old table gone; REPLACE of a missing table refuses; " +
    "CREATE OR REPLACE creates") {
    srcView()
    spark.sql("REPLACE TABLE graft.ctas1 TBLPROPERTIES ('key' = 'id') " +
      "AS SELECT id, ts, CAST(v * 10 AS DOUBLE) AS v10 FROM ctas_src " +
      "WHERE id <= 2")
    assert(spark.sql("SELECT id, v10 FROM graft.ctas1 ORDER BY id")
      .as[(Long, Double)].collect().toSeq ===
      Seq((1L, 10.0), (2L, 20.0)))
    assert(!spark.sql("SELECT * FROM graft.ctas1").columns.contains("v"))
    // REPLACE of a table that does not exist refuses (no OR CREATE)
    intercept[Exception] {
      spark.sql("REPLACE TABLE graft.ctas_missing " +
        "TBLPROPERTIES ('key' = 'id') AS SELECT id, ts, v FROM ctas_src")
    }
    assert(!spark.sql("SHOW TABLES IN graft").collect()
      .map(_.getString(1)).contains("ctas_missing"))
    // CREATE OR REPLACE on a missing table creates it
    spark.sql("CREATE OR REPLACE TABLE graft.ctas2 " +
      "TBLPROPERTIES ('key' = 'id') AS SELECT id, ts, v FROM ctas_src " +
      "WHERE id = 4")
    assert(spark.sql("SELECT id, v FROM graft.ctas2")
      .as[(Long, Double)].head() === ((4L, 4.0)))
    // ... and on an existing one replaces it
    spark.sql("CREATE OR REPLACE TABLE graft.ctas2 " +
      "TBLPROPERTIES ('key' = 'id') AS SELECT id, ts, v FROM ctas_src " +
      "WHERE id = 1")
    assert(spark.sql("SELECT id, v FROM graft.ctas2")
      .as[(Long, Double)].head() === ((1L, 1.0)))
    noStagingLeftovers()
  }

  test("a mid-write RTAS failure leaves the ORIGINAL table untouched") {
    srcView()
    val before = spark.sql("SELECT id, v FROM graft.ctas2")
      .as[(Long, Double)].collect().toSeq
    intercept[Exception] {
      spark.sql("REPLACE TABLE graft.ctas2 TBLPROPERTIES ('key' = 'id') " +
        "AS SELECT id, ts, " +
        "CASE WHEN id = 2 THEN CAST(raise_error('rtas boom') AS DOUBLE) " +
        "ELSE v END AS v FROM ctas_src")
    }
    assert(spark.sql("SELECT id, v FROM graft.ctas2")
      .as[(Long, Double)].collect().toSeq === before)
    noStagingLeftovers()
  }

  test("the published CTAS lake is an ordinary lake: path-based DSv2 " +
    "read, Scala API, and history all see it") {
    assert(spark.read.format("graft-lake").option("path", s"$wh/ctas2")
      .load().count() === 1L)
    assert(LakeSnapshot.read(spark, s"$wh/ctas2").count() === 1L)
    assert(LakeSnapshot.describeHistory(spark, s"$wh/ctas2").count() >= 1L)
  }

  test("CALL graft.system.clean_staging reclaims crashed-CTAS leftovers " +
    "age-gated; a fresh (possibly live) staging survives the default gate") {
    // a crashed CTAS: staged dir that never published, never aborted
    val stale = Paths.get(wh, ".stage-dead-12345")
    Files.createDirectories(stale.resolve("manifest"))
    val fresh = Paths.get(wh, ".stage-live-67890")
    Files.createDirectories(fresh.resolve("manifest"))
    // default 72 h gate: both are younger — NOTHING reclaimed
    val kept = spark.sql(
      s"CALL graft.system.clean_staging(path => '$wh')").head()
    assert(kept.getInt(1) === 0, kept.toString)
    assert(Files.exists(stale) && Files.exists(fresh))
    // age the stale one past an explicit gate and sweep again — the
    // WHOLE tree must read old: the r18 gate is the newest mtime
    // anywhere in the tree (ADVICE r17: most filesystems bump a dir's
    // mtime only on direct-child creation, so a live CTAS writing deep
    // under data/ looked idle at the root and was deleted mid-flight)
    def ageTree(p: JPath, ageMs: Long): Unit =
      Files.walk(p).forEach(f => Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - ageMs)))
    ageTree(stale, 10000)
    val swept = spark.sql(
      s"CALL graft.system.clean_staging(path => '$wh', " +
        "older_than_ms => 5000)").head()
    assert(swept.getInt(1) === 1, swept.toString)
    assert(swept.getString(2) === ".stage-dead-12345")
    assert(!Files.exists(stale) && Files.exists(fresh))
    // the live-CTAS shape: root + shallow dirs old, but a DEEP data file
    // is fresh (the SELECT is still writing) — must survive the sweep
    val live = Paths.get(wh, ".stage-long-select-111")
    Files.createDirectories(live.resolve("data/gen=0/day=2024-01-01"))
    ageTree(live, 10000)
    Files.write(live.resolve("data/gen=0/day=2024-01-01/part-0.parquet"),
      Array[Byte](1, 2, 3))
    val spared = spark.sql(
      s"CALL graft.system.clean_staging(path => '$wh', " +
        "older_than_ms => 5000)").head()
    assert(spared.getInt(1) === 0, spared.toString)
    assert(Files.exists(live), "a live deep-writing CTAS staging must survive")
    Seq(live, fresh).foreach(d =>
      Files.walk(d).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f)))
  }

  test("CTAS publish over a bare manifest-less dest dir (crashed DROP " +
    "leftover) lands the table AT the dest, not nested inside it (r18)") {
    srcView()
    // the leftover: a stray dir with junk but no manifest
    val leftover = Paths.get(wh, "ctas_leftover")
    Files.createDirectories(leftover.resolve("junk"))
    Files.write(leftover.resolve("junk/file.txt"), "stray".getBytes)
    spark.sql("CREATE TABLE graft.ctas_leftover TBLPROPERTIES " +
      "('key' = 'id') AS SELECT id, ts, v FROM ctas_src")
    // visible through the catalog AND at the expected path — the old
    // FileSystem.rename-into-existing-dir bug nested the table at
    // dest/.stage-* with exists() false (ADVICE r17)
    assert(spark.sql("SELECT count(*) FROM graft.ctas_leftover")
      .head().getLong(0) === 4L)
    assert(Files.exists(leftover.resolve("manifest")),
      "the table must land AT the dest path")
    assert(!Files.exists(leftover.resolve("junk")),
      "the manifest-less leftover must not remain under the table")
    val nested = Files.list(leftover).iterator()
    while (nested.hasNext) {
      val n = nested.next().getFileName.toString
      assert(!n.startsWith(".stage-"), s"table nested at dest/$n")
    }
    // the leftover may have been LIVE non-graft data (raw parquet
    // dropped into the warehouse path): it is PARKED in a .replaced-*
    // trash dir, never deleted (ADVICE r18) — clean_staging sweeps it
    // age-gated like any displaced table
    val parked = Files.list(Paths.get(wh)).iterator()
    var strayFound = false
    while (parked.hasNext) {
      val d = parked.next()
      if (d.getFileName.toString.startsWith(".replaced-ctas_leftover-") &&
        Files.exists(d.resolve("junk/file.txt"))) strayFound = true
    }
    assert(strayFound,
      "the displaced manifest-less dir's contents must survive in trash")
  }
}
