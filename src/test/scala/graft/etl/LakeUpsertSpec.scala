package graft.etl

import java.nio.file.{Files, Path, Paths}

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** p13: MERGE INTO the date-partitioned lake. The oracle hash-checks the
  * merged VALUES; this spec pins the physical claims — untouched
  * partitions are never rewritten, new-day inserts create their
  * partition, re-applying a batch is idempotent — and row-level merge
  * semantics on hand data.
  */
class LakeUpsertSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/lake_upsert_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def fileState(dir: String): Map[String, Long] = {
    val root = Paths.get(dir)
    import scala.jdk.CollectionConverters._
    Files.walk(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .map(p => root.relativize(p).toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap
  }

  private def content(dir: String): Set[(Long, Double, String)] =
    spark.read.parquet(dir)
      .select(col("event_id"), col("value"), col("day").cast("string"))
      .as[(Long, Double, String)].collect().toSet

  test("merge updates, inserts, creates new days, leaves other days' " +
    "files untouched, and is idempotent") {
    val dir = freshDir("merge")
    Seq(
      (1L, ts(1), 1.0), (2L, ts(1), 2.0), // day 01
      (3L, ts(2), 3.0), (4L, ts(2), 4.0)) // day 02
      .toDF("event_id", "ts", "value")
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").parquet(dir)
    val untouchedBefore = fileState(s"$dir/day=2024-01-02")

    // batch: update key 1 (day 01), insert key 10 (day 01), key 11 (NEW day 03)
    val batch = Seq(
      (1L, ts(1), 100.0), (10L, ts(1), 10.0), (11L, ts(3), 11.0))
      .toDF("event_id", "ts", "value")
    val days = LakeUpsert.merge(spark, dir, batch, "event_id", "ts")
    assert(days.map(_.toString) == Seq("2024-01-01", "2024-01-03"))

    val expected = Set(
      (1L, 100.0, "2024-01-01"), (2L, 2.0, "2024-01-01"),
      (10L, 10.0, "2024-01-01"),
      (3L, 3.0, "2024-01-02"), (4L, 4.0, "2024-01-02"),
      (11L, 11.0, "2024-01-03"))
    assert(content(dir) === expected)
    // copy-on-write is PARTITION-scoped: day 02 was not in the batch, so
    // its files are bit-for-bit the ones the initial load wrote
    assert(fileState(s"$dir/day=2024-01-02") === untouchedBefore,
      "untouched partition must never be rewritten")

    // re-applying the same batch converges (the anti-join removes the
    // previous application, the union re-adds it)
    LakeUpsert.merge(spark, dir, batch, "event_id", "ts")
    assert(content(dir) === expected)
  }

  test("crash recovery: re-applying the batch converges from a PARTIAL " +
    "application") {
    // the dynamic-overwrite crash window: only day 01's partition landed
    // before the crash (simulated by merging the day-01 slice alone),
    // leaving the lake half-updated. Recovery is re-running the SAME
    // merge — idempotent, so it converges regardless of which days the
    // crashed attempt managed to commit.
    val dir = freshDir("crash")
    Seq((1L, ts(1), 1.0), (3L, ts(2), 3.0))
      .toDF("event_id", "ts", "value")
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").parquet(dir)
    val batch = Seq((1L, ts(1), 100.0), (3L, ts(2), 300.0))
      .toDF("event_id", "ts", "value")
    LakeUpsert.merge(spark, dir,
      batch.filter(to_date(col("ts")) === lit("2024-01-01")),
      "event_id", "ts") // the partial (crashed) application
    assert(content(dir) === Set(
      (1L, 100.0, "2024-01-01"), (3L, 3.0, "2024-01-02")),
      "staged state must be half-updated")
    LakeUpsert.merge(spark, dir, batch, "event_id", "ts") // recovery re-run
    assert(content(dir) === Set(
      (1L, 100.0, "2024-01-01"), (3L, 300.0, "2024-01-02")))
  }

  test("deleteKeys: removes exactly the keys, drops emptied day dirs, " +
    "leaves untouched days' files alone, idempotent") {
    val dir = freshDir("delete")
    Seq(
      (1L, ts(1), 1.0), (2L, ts(1), 2.0), // day 01
      (3L, ts(2), 3.0),                   // day 02 (fully deleted below)
      (4L, ts(3), 4.0))                   // day 03 (untouched)
      .toDF("event_id", "ts", "value")
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").parquet(dir)
    val untouchedBefore = fileState(s"$dir/day=2024-01-03")

    val keys = Seq((1L, ts(1)), (3L, ts(2))).toDF("event_id", "ts")
    LakeUpsert.deleteKeys(spark, dir, keys, "event_id", "ts")
    assert(content(dir) === Set(
      (2L, 2.0, "2024-01-01"), (4L, 4.0, "2024-01-03")))
    // day 02 lost its every row: the partition DIRECTORY must be gone
    // (dynamic overwrite alone would silently leave it)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/day=2024-01-02")))
    assert(fileState(s"$dir/day=2024-01-03") === untouchedBefore)
    // re-deleting the same keys converges (erasure replay is harmless)
    LakeUpsert.deleteKeys(spark, dir, keys, "event_id", "ts")
    assert(content(dir) === Set(
      (2L, 2.0, "2024-01-01"), (4L, 4.0, "2024-01-03")))
  }

  test("a batch carrying the same key twice collapses to ONE deterministic " +
    "row (greatest-struct wins), never duplicate lake rows (ADVICE r11)") {
    val dir = freshDir("dup_batch")
    Seq((1L, ts(1), 1.0)).toDF("event_id", "ts", "value")
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").parquet(dir)
    // key 1 appears twice with different values; key 5 twice identically
    val batch = Seq(
      (1L, ts(1), 7.0), (1L, ts(1), 9.0),
      (5L, ts(1), 5.0), (5L, ts(1), 5.0))
      .toDF("event_id", "ts", "value")
    LakeUpsert.merge(spark, dir, batch, "event_id", "ts")
    assert(content(dir) === Set(
      (1L, 9.0, "2024-01-01"), // greatest (ts, value) struct survives
      (5L, 5.0, "2024-01-01")))
    // shuffled batch order converges to the same survivor
    LakeUpsert.merge(spark, dir, batch.orderBy(col("value").desc),
      "event_id", "ts")
    assert(content(dir) === Set(
      (1L, 9.0, "2024-01-01"), (5L, 5.0, "2024-01-01")))
  }

  test("semantically equal MAPS compare equal regardless of entry order " +
    "(ADVICE r15): no spurious CDC update rows, and the duplicate-key " +
    "winner is decided by the ORDERABLE columns, not map build order") {
    val dir = freshDir("map_order")
    def row(m: Seq[(String, Long)], v: Double) =
      spark.sql(s"SELECT 1L AS event_id, " +
        s"TIMESTAMP '2024-01-01 10:00:00' AS ts, map(" +
        m.map { case (k, x) => s"'$k', ${x}L" }.mkString(", ") +
        s") AS attrs, ${v}D AS value")
    val e0 = LakeSnapshot.mergeDelta(spark, dir,
      row(Seq("a" -> 1L, "b" -> 2L), 1.0), "event_id", "ts", cdf = true)
    // the SAME map built in the opposite entry order, same value: the
    // old to_json comparison rendered them unequal → phantom
    // update_preimage/postimage pairs in the feed
    val e1 = LakeSnapshot.mergeDelta(spark, dir,
      row(Seq("b" -> 2L, "a" -> 1L), 1.0), "event_id", "ts", cdf = true)
    val feed = LakeSnapshot.readChangesCdf(spark, dir, e0, e1)
    assert(feed.filter(col("_change_type").startsWith("update")).count() === 0,
      "equal maps in different entry order must not produce update rows")
    // a REAL change still feeds
    val e2 = LakeSnapshot.mergeDelta(spark, dir,
      row(Seq("b" -> 9L, "a" -> 1L), 1.0), "event_id", "ts", cdf = true)
    assert(LakeSnapshot.readChangesCdf(spark, dir, e1, e2)
      .filter(col("_change_type") === "update_postimage").count() === 1)
    // duplicate-key collapse: both rows carry EQUAL maps (reordered), so
    // the orderable 'value' column alone decides the winner
    val dir2 = freshDir("map_order_dedup")
    val batch = row(Seq("a" -> 1L, "b" -> 2L), 3.0)
      .unionByName(row(Seq("b" -> 2L, "a" -> 1L), 8.0))
    LakeUpsert.merge(spark, dir2, batch, "event_id", "ts")
    assert(spark.read.parquet(dir2).select("value")
      .as[Double].collect().toSeq === Seq(8.0),
      "the greatest orderable tuple wins when the maps are equal")
  }

  test("merge into an empty lake is a pure insert") {
    val dir = freshDir("insert_only")
    Files.createDirectories(Paths.get(dir))
    val batch = Seq((1L, ts(1), 1.0)).toDF("event_id", "ts", "value")
    LakeUpsert.merge(spark, dir, batch, "event_id", "ts")
    assert(content(dir) === Set((1L, 1.0, "2024-01-01")))
  }
}
