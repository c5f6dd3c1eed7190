package graft.etl

import java.nio.file.{Files, Path => JPath, Paths}
import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CHECK constraints (r17 wave 3): `TBLPROPERTIES ('check.<name>' =
  * '<condition>')`, SQL-standard semantics (NULL passes), enforced at
  * every write verb — INSERT/CTAS/DataFrame appends through the staging
  * seam, MERGE INTO / UPDATE / the streaming sink through the delta
  * writer. A violating batch aborts whole; nothing commits.
  */
class LakeChecksSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val wh = {
    val p = Paths.get("target/lake_checks_spec/wh")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    Files.createDirectories(p)
    p.toString
  }
  spark.conf.set("spark.sql.catalog.graft",
    classOf[graft.sources.GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.graft.warehouse", wh)

  private def rootOf(e: Throwable): String = {
    var c: Throwable = e
    val sb = new StringBuilder(String.valueOf(e.getMessage))
    while (c.getCause != null) { c = c.getCause; sb.append(c.getMessage) }
    sb.toString
  }

  test("INSERT enforces declared checks: a violating batch aborts whole " +
    "and commits nothing; NULL passes (SQL CHECK semantics)") {
    spark.sql("CREATE TABLE graft.ck (event_id BIGINT, ts TIMESTAMP, " +
      "value DOUBLE) TBLPROPERTIES ('key' = 'event_id', " +
      "'check.positive_value' = 'value >= 0')")
    spark.sql("INSERT INTO graft.ck (event_id, ts, value) VALUES " +
      "(1, TIMESTAMP '2024-01-01 10:00:00', 1.5), " +
      "(2, TIMESTAMP '2024-01-01 11:00:00', NULL)") // NULL passes
    assert(spark.sql("SELECT count(*) FROM graft.ck").as[Long].head() === 2L)
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.ck (event_id, ts, value) VALUES " +
        "(3, TIMESTAMP '2024-01-01 12:00:00', 7.0), " +
        "(4, TIMESTAMP '2024-01-01 13:00:00', -1.0)")
    }
    assert(rootOf(e).contains("positive_value"), rootOf(e))
    // the whole batch aborted — row 3 did not sneak in
    assert(spark.sql("SELECT count(*) FROM graft.ck").as[Long].head() === 2L)
  }

  test("MERGE INTO and UPDATE enforce checks through the delta writer") {
    Seq((10L, Timestamp.valueOf("2024-01-02 10:00:00"), 5.0))
      .toDF("event_id", "ts", "value").createOrReplaceTempView("ck_src")
    spark.sql("MERGE INTO graft.ck t USING ck_src s " +
      "ON t.event_id = s.event_id " +
      "WHEN NOT MATCHED THEN INSERT (event_id, ts, value) " +
      "VALUES (s.event_id, s.ts, s.value)")
    assert(spark.sql("SELECT value FROM graft.ck WHERE event_id = 10")
      .as[Double].head() === 5.0)
    val e1 = intercept[Exception] {
      spark.sql("MERGE INTO graft.ck t USING ck_src s " +
        "ON t.event_id = s.event_id " +
        "WHEN MATCHED THEN UPDATE SET value = -9.0")
    }
    assert(rootOf(e1).contains("positive_value"), rootOf(e1))
    val e2 = intercept[Exception] {
      spark.sql("UPDATE graft.ck SET value = -1.0 WHERE event_id = 1")
    }
    assert(rootOf(e2).contains("positive_value"), rootOf(e2))
    // nothing moved
    assert(spark.sql(
      "SELECT round(sum(value), 2) FROM graft.ck").as[Double].head() === 6.5)
  }

  test("the streaming sink enforces checks per micro-batch: a violating " +
    "batch fails the query, nothing from it commits") {
    spark.sql("CREATE TABLE graft.ck_stream (event_id BIGINT, " +
      "ts TIMESTAMP, value DOUBLE) TBLPROPERTIES ('key' = 'event_id', " +
      "'check.positive_value' = 'value >= 0')")
    val dir = s"$wh/ck_stream"
    val root = "target/lake_checks_spec/stream"
    val rp = Paths.get(root)
    if (Files.exists(rp))
      Files.walk(rp).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts TIMESTAMP, value DOUBLE")
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(s"$root/in/*")
        .writeStream.format("graft-lake")
        .option("path", dir).option("key", "event_id")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.awaitTermination()
    }
    Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0))
      .toDF("event_id", "ts", "value").coalesce(1)
      .write.mode("append").parquet(s"$root/in/b1")
    run()
    assert(LakeSnapshot.read(spark, dir).count() === 1L)
    Seq((2L, Timestamp.valueOf("2024-01-01 11:00:00"), -5.0))
      .toDF("event_id", "ts", "value").coalesce(1)
      .write.mode("append").parquet(s"$root/in/b2")
    val e = intercept[Exception] { run() }
    assert(rootOf(e).contains("positive_value"), rootOf(e))
    // the violating micro-batch aborted whole — the lake still holds
    // exactly the first batch's row
    assert(LakeSnapshot.read(spark, dir)
      .select("event_id").as[Long].collect().toSeq === Seq(1L))
  }

  test("ALTER adding a check validates EXISTING data; dropping one " +
    "re-opens the verb; rename/drop of a referenced column refuses") {
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.ck SET TBLPROPERTIES " +
        "('check.big_ids' = 'event_id >= 5')") // ids 1,2 violate
    }
    assert(rootOf(e).contains("big_ids"), rootOf(e))
    // a satisfiable one lands and enforces immediately
    spark.sql("ALTER TABLE graft.ck SET TBLPROPERTIES " +
      "('check.sane_ids' = 'event_id < 1000000')")
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO graft.ck (event_id, ts, value) VALUES " +
        "(2000000, TIMESTAMP '2024-01-01 10:00:00', 1.0)")
    }
    assert(rootOf(e2).contains("sane_ids"), rootOf(e2))
    // referenced columns refuse RENAME/DROP until the check drops
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.ck RENAME COLUMN value TO amount")
    }
    assert(rootOf(e3).contains("positive_value"), rootOf(e3))
    spark.sql("ALTER TABLE graft.ck UNSET TBLPROPERTIES " +
      "('check.positive_value')")
    spark.sql("ALTER TABLE graft.ck RENAME COLUMN value TO amount")
    // the dropped check no longer enforces
    spark.sql("INSERT INTO graft.ck (event_id, ts, amount) VALUES " +
      "(5, TIMESTAMP '2024-01-01 14:00:00', -2.0)")
    assert(spark.sql("SELECT amount FROM graft.ck WHERE event_id = 5")
      .as[Double].head() === -2.0)
  }

  test("a batch missing a checked nullable column null-fills for the " +
    "evaluation: range checks pass (NULL passes), IS NOT NULL fires") {
    spark.sql("CREATE TABLE graft.ck_evo (event_id BIGINT, ts TIMESTAMP, " +
      "v DOUBLE) TBLPROPERTIES ('key' = 'event_id', " +
      "'check.v_range' = 'v >= 0')")
    // the batch omits v entirely — it null-fills at stage, and NULL
    // passes a range CHECK (SQL semantics), so this must succeed
    LakeSnapshot.merge(spark, s"$wh/ck_evo",
      Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00")))
        .toDF("event_id", "ts"), "event_id", "ts")
    assert(spark.sql("SELECT v FROM graft.ck_evo WHERE event_id = 1")
      .collect().head.isNullAt(0))
    // an IS NOT NULL check refuses the same missing-column shape
    spark.sql("CREATE TABLE graft.ck_evo2 (event_id BIGINT, " +
      "ts TIMESTAMP, v DOUBLE) TBLPROPERTIES ('key' = 'event_id', " +
      "'check.v_req' = 'v IS NOT NULL')")
    val e = intercept[Exception] {
      LakeSnapshot.merge(spark, s"$wh/ck_evo2",
        Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00")))
          .toDF("event_id", "ts"), "event_id", "ts")
    }
    assert(rootOf(e).contains("v_req"), rootOf(e))
    assert(spark.sql("SELECT count(*) FROM graft.ck_evo2")
      .as[Long].head() === 0L)
  }

  test("an unparseable / unresolvable / misnamed check refuses at CREATE") {
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE graft.ck_bad1 (event_id BIGINT, " +
        "ts TIMESTAMP, v DOUBLE) TBLPROPERTIES ('key' = 'event_id', " +
        "'check.syntax' = 'v >= )')")
    }
    assert(rootOf(e1).contains("syntax"), rootOf(e1))
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE graft.ck_bad2 (event_id BIGINT, " +
        "ts TIMESTAMP, v DOUBLE) TBLPROPERTIES ('key' = 'event_id', " +
        "'check.ghost' = 'no_such_col > 0')")
    }
    assert(rootOf(e2).contains("ghost"), rootOf(e2))
    assert(!spark.sql("SHOW TABLES IN graft").collect()
      .map(_.getString(1)).contains("ck_bad1"))
  }

  test("CREATE TABLE with an inline CONSTRAINT ... CHECK (r18): the " +
    "clause is recorded — not silently dropped by the TableInfo default " +
    "delegation — and enforces at the first write") {
    spark.sql("CREATE TABLE graft.ck_inline (event_id BIGINT, " +
      "ts TIMESTAMP, value DOUBLE, CONSTRAINT pos_v CHECK (value >= 0)) " +
      "TBLPROPERTIES ('key' = 'event_id')")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.ck_inline (event_id, ts, value) " +
        "VALUES (1, TIMESTAMP '2024-01-01 10:00:00', -1.0)")
    }
    assert(rootOf(e).contains("pos_v"), rootOf(e))
    // the inline declaration is the SAME mechanism as the other routes
    spark.sql("ALTER TABLE graft.ck_inline DROP CONSTRAINT pos_v")
    spark.sql("INSERT INTO graft.ck_inline (event_id, ts, value) " +
      "VALUES (1, TIMESTAMP '2024-01-01 10:00:00', -1.0)")
    assert(spark.sql("SELECT count(*) FROM graft.ck_inline")
      .head().getLong(0) === 1L)
    spark.sql("DROP TABLE graft.ck_inline")
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT (r18): the plain-SQL constraint " +
    "verbs ride the same check.<name> declarations — ADD validates " +
    "existing data, enforcement fires at the next write, DROP re-opens") {
    spark.sql("CREATE TABLE graft.ck_ddl (event_id BIGINT, " +
      "ts TIMESTAMP, value DOUBLE) TBLPROPERTIES ('key' = 'event_id')")
    spark.sql("INSERT INTO graft.ck_ddl (event_id, ts, value) VALUES " +
      "(1, TIMESTAMP '2024-01-01 10:00:00', 1.0), " +
      "(2, TIMESTAMP '2024-01-02 10:00:00', 2.0)")
    // post-hoc constraint over existing data: violating data refuses —
    // Spark's own analyzer plans the validation scan here (it throws
    // NEW_CHECK_CONSTRAINT_VIOLATION before alterTable), and our
    // alterTable's validateExisting backstops the non-SQL routes
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.ck_ddl ADD CONSTRAINT big_ids " +
        "CHECK (event_id >= 5)")
    }
    assert(rootOf(e).contains("event_id >= 5"), rootOf(e))
    // a satisfiable one lands, surfaces as a constraint, and enforces
    spark.sql("ALTER TABLE graft.ck_ddl ADD CONSTRAINT sane_value " +
      "CHECK (value > -1e9)")
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO graft.ck_ddl (event_id, ts, value) VALUES " +
        "(3, TIMESTAMP '2024-01-03 10:00:00', -2e9)")
    }
    assert(rootOf(e2).contains("sane_value"), rootOf(e2))
    // duplicate names refuse; DROP of a missing name refuses without
    // IF EXISTS and passes with it
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.ck_ddl ADD CONSTRAINT sane_value " +
        "CHECK (value > 0)")
    }
    assert(rootOf(e3).contains("sane_value"), rootOf(e3))
    val e4 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.ck_ddl DROP CONSTRAINT no_such")
    }
    assert(rootOf(e4).contains("no_such"), rootOf(e4))
    spark.sql("ALTER TABLE graft.ck_ddl DROP CONSTRAINT IF EXISTS no_such")
    // DROP re-opens the verb
    spark.sql("ALTER TABLE graft.ck_ddl DROP CONSTRAINT sane_value")
    spark.sql("INSERT INTO graft.ck_ddl (event_id, ts, value) VALUES " +
      "(3, TIMESTAMP '2024-01-03 10:00:00', -2e9)")
    assert(spark.sql("SELECT count(*) FROM graft.ck_ddl")
      .head().getLong(0) === 3L)
    // the TBLPROPERTIES route and the DDL route are ONE mechanism: a
    // DDL-added constraint unsets via TBLPROPERTIES and vice versa
    spark.sql("ALTER TABLE graft.ck_ddl ADD CONSTRAINT via_ddl " +
      "CHECK (event_id < 1000)")
    spark.sql("ALTER TABLE graft.ck_ddl UNSET TBLPROPERTIES " +
      "('check.via_ddl')")
    spark.sql("ALTER TABLE graft.ck_ddl SET TBLPROPERTIES " +
      "('check.via_props' = 'event_id < 1000')")
    spark.sql("ALTER TABLE graft.ck_ddl DROP CONSTRAINT via_props")
    spark.sql("INSERT INTO graft.ck_ddl (event_id, ts, value) VALUES " +
      "(5000, TIMESTAMP '2024-01-03 12:00:00', 1.0)")
    assert(spark.sql("SELECT count(*) FROM graft.ck_ddl")
      .head().getLong(0) === 4L)
    spark.sql("DROP TABLE graft.ck_ddl")
  }
}
