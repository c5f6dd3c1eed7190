package graft.sources

import java.nio.file.{Files, Path => JPath, Paths}

import graft.TestSpark
import graft.etl.LakeSnapshot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL MERGE INTO / UPDATE over the lake (SupportsRowLevelOperations +
  * SupportsDelta — VERDICT r13 #2): a conditional upsert/delete mix in
  * ONE statement, landing as ONE merge-on-read delta commit, never a
  * rewrite. The writers are distributed (per-task parquet into the
  * claimed generation, dot-temp → rename on task commit); the driver
  * publishes one manifest row.
  */
class LakeMergeSqlSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val wh = {
    val p = Paths.get("target/lake_merge_sql_spec/wh")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    Files.createDirectories(p)
    p.toString
  }
  spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.graft.warehouse", wh)

  private def ts(day: Int, h: Int = 10): String =
    f"2024-01-$day%02d $h%02d:00:00"

  private def seed(table: String): Unit = {
    spark.sql(s"CREATE TABLE graft.$table (event_id BIGINT, ts TIMESTAMP, " +
      "value DOUBLE) TBLPROPERTIES ('key' = 'event_id')")
    spark.sql(s"INSERT INTO graft.$table (event_id, ts, value) VALUES " +
      s"(1, TIMESTAMP '${ts(1)}', 1.0), (2, TIMESTAMP '${ts(1, 11)}', 2.0), " +
      s"(3, TIMESTAMP '${ts(2)}', 3.0), (4, TIMESTAMP '${ts(2, 12)}', 4.0)")
  }

  test("three-verb MERGE INTO: MATCHED-DELETE + MATCHED-UPDATE + " +
    "NOT-MATCHED-INSERT land as ONE delta commit, values exact") {
    seed("m1")
    val dir = s"$wh/m1"
    val pre = LakeSnapshot.currentEpoch(spark, dir)
    spark.sql(
      s"""MERGE INTO graft.m1 t
         |USING (
         |  SELECT 2L AS event_id, TIMESTAMP '${ts(1, 11)}' AS ts,
         |         0.0 AS value, 'd' AS op
         |  UNION ALL
         |  SELECT 3L, TIMESTAMP '${ts(2)}', 33.0, 'u'
         |  UNION ALL
         |  SELECT 9L, TIMESTAMP '${ts(3)}', 9.0, 'i'
         |) s
         |ON t.event_id = s.event_id
         |WHEN MATCHED AND s.op = 'd' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET value = s.value, ts = s.ts
         |WHEN NOT MATCHED THEN
         |  INSERT (event_id, ts, value) VALUES (s.event_id, s.ts, s.value)
         |""".stripMargin)
    // exactly ONE new epoch, and it is a DELTA commit (merge-on-read)
    val ops = LakeSnapshot.describeHistory(spark, dir)
      .filter(col("epoch") > pre)
      .select("operation").as[String].collect().toSeq
    assert(ops === Seq("delta"), s"expected one delta commit, got $ops")
    // SQL view, Scala read, and the path-based DSv2 relation all agree
    val want = Set((1L, 1.0), (3L, 33.0), (4L, 4.0), (9L, 9.0))
    assert(spark.sql("SELECT event_id, value FROM graft.m1")
      .as[(Long, Double)].collect().toSet === want)
    assert(LakeSnapshot.read(spark, dir).select("event_id", "value")
      .as[(Long, Double)].collect().toSet === want)
    assert(spark.read.format("graft-lake").option("path", dir).load()
      .select("event_id", "value")
      .as[(Long, Double)].collect().toSet === want)
    // time travel: the pre-merge epoch still reads whole
    assert(LakeSnapshot.readAt(spark, dir, pre).count() === 4L)
  }

  test("MERGE matching zero rows commits nothing; insert-only MERGE " +
    "into a CREATEd-but-never-written table is the first commit") {
    spark.sql("CREATE TABLE graft.m2 (event_id BIGINT, ts TIMESTAMP, " +
      "value DOUBLE) TBLPROPERTIES ('key' = 'event_id')")
    val dir = s"$wh/m2"
    // a merge whose output is empty publishes NO manifest row
    spark.sql(
      """MERGE INTO graft.m2 t
        |USING (SELECT 1L AS event_id, TIMESTAMP '2024-01-01 10:00:00' AS ts,
        |       1.0 AS value WHERE 1 = 0) s
        |ON t.event_id = s.event_id
        |WHEN MATCHED THEN UPDATE SET value = s.value
        |WHEN NOT MATCHED THEN
        |  INSERT (event_id, ts, value) VALUES (s.event_id, s.ts, s.value)
        |""".stripMargin)
    assert(LakeSnapshot.currentEpoch(spark, dir) === -1)
    // insert-only merge = first write: records the key, creates the lake
    spark.sql(
      s"""MERGE INTO graft.m2 t
         |USING (SELECT 1L AS event_id, TIMESTAMP '${ts(1)}' AS ts,
         |       1.5 AS value) s
         |ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET value = s.value
         |WHEN NOT MATCHED THEN
         |  INSERT (event_id, ts, value) VALUES (s.event_id, s.ts, s.value)
         |""".stripMargin)
    assert(spark.sql("SELECT event_id, value FROM graft.m2")
      .as[(Long, Double)].collect().toSeq === Seq((1L, 1.5)))
    // the recorded key now guards mismatched writers
    assert(graft.etl.LakeSnapshot.tableState(spark, dir).key
      === Some("event_id"))
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE DELETE prunes rows the source " +
    "lost; a second identical MERGE is idempotent") {
    seed("m3")
    val dir = s"$wh/m3"
    def mergeKeep(): Unit = spark.sql(
      s"""MERGE INTO graft.m3 t
         |USING (
         |  SELECT 1L AS event_id, TIMESTAMP '${ts(1)}' AS ts, 10.0 AS value
         |  UNION ALL SELECT 3L, TIMESTAMP '${ts(2)}', 30.0
         |) s
         |ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET value = s.value
         |WHEN NOT MATCHED THEN
         |  INSERT (event_id, ts, value) VALUES (s.event_id, s.ts, s.value)
         |WHEN NOT MATCHED BY SOURCE THEN DELETE
         |""".stripMargin)
    mergeKeep()
    val want = Set((1L, 10.0), (3L, 30.0))
    assert(spark.sql("SELECT event_id, value FROM graft.m3")
      .as[(Long, Double)].collect().toSet === want)
    mergeKeep() // idempotent re-merge: same final state
    assert(spark.sql("SELECT event_id, value FROM graft.m3")
      .as[(Long, Double)].collect().toSet === want)
  }

  test("SQL UPDATE rides the same row-level delta path") {
    seed("m4")
    val dir = s"$wh/m4"
    val pre = LakeSnapshot.currentEpoch(spark, dir)
    spark.sql("UPDATE graft.m4 SET value = value + 100.0 WHERE event_id > 2")
    val ops = LakeSnapshot.describeHistory(spark, dir)
      .filter(col("epoch") > pre)
      .select("operation").as[String].collect().toSeq
    assert(ops === Seq("delta"), s"expected one delta commit, got $ops")
    assert(spark.sql("SELECT event_id, value FROM graft.m4")
      .as[(Long, Double)].collect().toSet ===
      Set((1L, 1.0), (2L, 2.0), (3L, 103.0), (4L, 104.0)))
  }

  test("a day-MOVING update (SET ts across a date boundary) is a move, " +
    "never a duplication: the old day gets a delete marker, the new " +
    "day the image — through UPDATE and MERGE both") {
    seed("m6")
    val dir = s"$wh/m6"
    spark.sql(s"UPDATE graft.m6 SET ts = TIMESTAMP '${ts(5)}' " +
      "WHERE event_id = 1")
    val afterUpdate = spark.sql(
      "SELECT event_id, CAST(day AS STRING) FROM graft.m6")
      .as[(Long, String)].collect().toSeq
    assert(afterUpdate.count(_._1 == 1L) === 1,
      s"key 1 must exist exactly once after the day move: $afterUpdate")
    assert(afterUpdate.find(_._1 == 1L).get._2 === "2024-01-05")
    spark.sql(
      s"""MERGE INTO graft.m6 t
         |USING (SELECT 2L AS event_id, TIMESTAMP '${ts(6)}' AS ts,
         |       222.0 AS value) s
         |ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET ts = s.ts, value = s.value
         |""".stripMargin)
    val got = spark.sql("SELECT event_id, CAST(day AS STRING), value " +
      "FROM graft.m6").as[(Long, String, Double)].collect().toSet
    assert(got.count(_._1 == 2L) === 1)
    assert(got.contains((2L, "2024-01-06", 222.0)))
    assert(got.size === 4) // 1 moved, 2 moved, 3 and 4 untouched
  }

  test("UPDATE SET * / INSERT * star syntax resolves when the source " +
    "carries every target column (incl. the derived day, which the " +
    "writer re-derives from ts regardless of the supplied value)") {
    seed("m7")
    spark.sql(
      s"""MERGE INTO graft.m7 t
         |USING (SELECT DATE '2099-12-31' AS day, 3L AS event_id,
         |       TIMESTAMP '${ts(2)}' AS ts, 333.0 AS value
         |       UNION ALL
         |       SELECT DATE '2099-12-31', 8L, TIMESTAMP '${ts(3)}', 8.0) s
         |ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    val got = spark.sql(
      "SELECT event_id, value, CAST(day AS STRING) FROM graft.m7")
      .as[(Long, Double, String)].collect().toSet
    assert(got === Set(
      (1L, 1.0, "2024-01-01"), (2L, 2.0, "2024-01-01"),
      (3L, 333.0, "2024-01-02"), (4L, 4.0, "2024-01-02"),
      (8L, 8.0, "2024-01-03")),
      "day derives from ts — the bogus supplied 2099 value never lands")
  }

  test("CONCURRENT MERGEs on key-disjoint sources both commit " +
    "(row-delta concurrency carries to the SQL verb)") {
    seed("m8")
    val dir = s"$wh/m8"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val start = new java.util.concurrent.CountDownLatch(1)
      val fs = Seq(100L, 200L).map { base =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            start.await()
            spark.sql(
              s"""MERGE INTO graft.m8 t
                 |USING (SELECT ${base}L AS event_id,
                 |       TIMESTAMP '${ts(1)}' AS ts, $base.5 AS value) s
                 |ON t.event_id = s.event_id
                 |WHEN MATCHED THEN UPDATE SET value = s.value
                 |WHEN NOT MATCHED THEN
                 |  INSERT (event_id, ts, value) VALUES (s.event_id, s.ts, s.value)
                 |""".stripMargin)
            ()
          }
        })
      }
      start.countDown()
      fs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val got = spark.sql("SELECT event_id, value FROM graft.m8 " +
      "WHERE event_id >= 100").as[(Long, Double)].collect().toSet
    assert(got === Set((100L, 100.5), (200L, 200.5)),
      "both racing MERGEs must commit (never-abort delta path)")
  }

  test("merge deltas fold with later Scala-path mutations and survive " +
    "OPTIMIZE (one protocol, one manifest)") {
    seed("m5")
    val dir = s"$wh/m5"
    spark.sql(
      s"""MERGE INTO graft.m5 t
         |USING (SELECT 2L AS event_id, TIMESTAMP '${ts(1, 11)}' AS ts,
         |       22.0 AS value) s
         |ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET value = s.value
         |""".stripMargin)
    // a Scala-path delta over the SQL merge's delta
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((5L, java.sql.Timestamp.valueOf(ts(3)), 5.0))
        .toDF("event_id", "ts", "value"), "event_id", "ts")
    val want = Set((1L, 1.0), (2L, 22.0), (3L, 3.0), (4L, 4.0), (5L, 5.0))
    assert(LakeSnapshot.read(spark, dir).select("event_id", "value")
      .as[(Long, Double)].collect().toSet === want)
    LakeSnapshot.compactDays(spark, dir) // OPTIMIZE absorbs both deltas
    assert(spark.sql("SELECT event_id, value FROM graft.m5")
      .as[(Long, Double)].collect().toSet === want)
  }

  test("MERGE WITH SCHEMA EVOLUTION (r15, VERDICT r14 #8): a source " +
    "carrying an unknown column widens the table through the same " +
    "AddColumn binding as explicit ALTER, old rows null-fill; a plain " +
    "MERGE with the same source stays a loud analysis error") {
    seed("m9")
    val dir = s"$wh/m9"
    // without the clause: the unknown column is an analysis error
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graft.m9 t
           |USING (SELECT 1L AS event_id, TIMESTAMP '${ts(1)}' AS ts,
           |       10.0D AS value, 'fix' AS src) s
           |ON t.event_id = s.event_id
           |WHEN MATCHED THEN UPDATE SET value = s.value, src = s.src
           |""".stripMargin)
    }
    assert(e.getMessage != null)
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft.m9 t
         |USING (SELECT 1L AS event_id, TIMESTAMP '${ts(1)}' AS ts,
         |       10.0D AS value, 'fix' AS src
         |       UNION ALL
         |       SELECT 9L, TIMESTAMP '${ts(3)}', 9.0D, 'new') s
         |ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    assert(spark.sql("SELECT event_id, value, src FROM graft.m9 ORDER BY " +
      "event_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq ===
      Seq((1L, 10.0, "fix"), (2L, 2.0, null), (3L, 3.0, null),
        (4L, 4.0, null), (9L, 9.0, "new")),
      "evolved column: merged rows carry it, untouched rows null-fill")
    // the widening is the SAME declaration ALTER writes: a follow-up
    // plain MERGE against the evolved column now resolves
    spark.sql(
      s"""MERGE INTO graft.m9 t
         |USING (SELECT 2L AS event_id, 'late' AS src) s
         |ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET src = s.src
         |""".stripMargin)
    assert(spark.sql("SELECT src FROM graft.m9 WHERE event_id = 2")
      .head().getString(0) === "late")
  }

  test("DELETE with a SUBQUERY predicate rides the row-level delta " +
    "path (r17 wave 6): canDeleteWhere refuses, WriteDelta commits " +
    "markers, never a rewrite") {
    seed("dsub")
    Seq(1L, 3L).toDF("victim_id").createOrReplaceTempView("dsub_victims")
    val pre = LakeSnapshot.currentEpoch(spark, s"$wh/dsub")
    spark.sql("DELETE FROM graft.dsub WHERE event_id IN " +
      "(SELECT victim_id FROM dsub_victims)")
    assert(spark.sql("SELECT event_id FROM graft.dsub ORDER BY event_id")
      .as[Long].collect().toSeq === Seq(2L, 4L))
    // one DELTA commit (marker files), not a rewrite
    val ops = LakeSnapshot.describeHistory(spark, s"$wh/dsub")
      .filter(col("epoch") > pre)
      .select("operation").as[String].collect().toSeq
    assert(ops === Seq("delta"), s"subquery DELETE must land as one " +
      s"delta commit, got $ops")
  }
}
