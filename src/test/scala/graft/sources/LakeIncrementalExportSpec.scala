package graft.sources

import java.nio.file.{Files, Path => JPath, Paths}

import graft.TestSpark
import graft.etl.LakeSnapshot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** p58: incremental snapshot export. The oracle hash-gates the
  * rsync-style composition; this spec pins the manifest-derived diff
  * seams the entry's fixed mutation pattern can't reach:
  *
  *  - `changedDays` day-grain semantics: untouched days skip, touched /
  *    newborn days ship, dropped days report removed;
  *  - a manifest-only COLUMN op (rename) flips EVERY day changed — the
  *    storage states are identical but the logical surface is not, so a
  *    day-state diff alone would ship stale column names;
  *  - a changed day folding to ZERO rows (all keys delta-deleted, day
  *    still in the view) writes no day dir — the procedure must move it
  *    to `_removed_days.txt` or a composing consumer keeps stale rows;
  *  - an empty window yields an artifact (dest + empty removed list),
  *    never an error.
  */
class LakeIncrementalExportSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val wh = {
    val p = Paths.get("target/lake_incexport_spec/wh")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    Files.createDirectories(p)
    p.toString
  }
  spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.graft.warehouse", wh)

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  private def removedList(dest: String): Seq[String] = {
    val p = Paths.get(dest, "_removed_days.txt")
    assert(Files.exists(p), s"no _removed_days.txt at $dest")
    Files.readAllLines(p).toArray.map(_.toString).filter(_.nonEmpty).toSeq
  }

  private def dayDirs(dest: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(dest)).iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("day="))
      .map(_.getFileName.toString.stripPrefix("day=")).toSet
  }

  test("changedDays: untouched days skip, touched/newborn ship, " +
    "dropped report removed; a column op flips every day changed") {
    val dir = s"$wh/cd"
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.0), (2L, ts(2), 2.0), (3L, ts(3), 3.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    // touch day 2, birth day 4, drop day 3
    LakeSnapshot.merge(spark, dir,
      Seq((2L, ts(2), 22.0), (4L, ts(4), 4.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.dropDays(spark, dir, Seq("2024-01-03"))
    val e1 = LakeSnapshot.currentEpoch(spark, dir)
    val (changed, removed) = LakeSnapshot.changedDays(spark, dir, e0, e1)
    assert(changed === Seq("2024-01-02", "2024-01-04"),
      "day 1 is untouched — its identical DayState must NOT ship")
    assert(removed === Seq("2024-01-03"))
    // a rename is manifest-only, but every day's logical surface moved
    LakeSnapshot.renameColumn(spark, dir, "value", "amount")
    val e2 = LakeSnapshot.currentEpoch(spark, dir)
    val (changed2, _) = LakeSnapshot.changedDays(spark, dir, e1, e2)
    assert(changed2 === Seq("2024-01-01", "2024-01-02", "2024-01-04"),
      "a column op must flip EVERY live day changed")
    // and the empty window really is empty
    assert(LakeSnapshot.changedDays(spark, dir, e2, e2) === ((Nil, Nil)))
  }

  test("a changed day folding to zero rows joins the removed list; an " +
    "empty window yields an artifact") {
    spark.sql("CREATE TABLE graft.z (event_id BIGINT, ts TIMESTAMP, " +
      "value DOUBLE) TBLPROPERTIES ('key' = 'event_id')")
    try {
      spark.sql("INSERT INTO graft.z (event_id, ts, value) VALUES " +
        "(1, TIMESTAMP '2024-01-01 10:00:00', 1.0), " +
        "(2, TIMESTAMP '2024-01-02 10:00:00', 2.0)")
      val e0 = LakeSnapshot.currentEpoch(spark, s"$wh/z")
      // delta-delete day 1's only key: the day stays in the view (its
      // state changed — base + delete marker) but folds to zero rows
      LakeSnapshot.deleteKeysDelta(spark, s"$wh/z",
        Seq((1L, ts(1))).toDF("event_id", "ts"), "event_id", "ts")
      val d1 = s"$wh/.exp/zero"
      val res = spark.sql("CALL graft.system.export_snapshot(" +
        s"`table` => 'z', dest => '$d1', since_epoch => $e0)").head()
      assert(res.getInt(2) === 0, s"no day dir must ship, got $res")
      assert(removedList(d1) === Seq("2024-01-01"),
        "the zero-folding day must land in the removed list")
      assert(dayDirs(d1) === Set.empty)
      // empty window: artifact exists, nothing in it
      val eNow = LakeSnapshot.currentEpoch(spark, s"$wh/z")
      val d2 = s"$wh/.exp/empty"
      val res2 = spark.sql("CALL graft.system.export_snapshot(" +
        s"`table` => 'z', dest => '$d2', since_epoch => $eNow)").head()
      assert(res2.getInt(2) === 0 && res2.getInt(3) === 0)
      assert(removedList(d2) === Nil)
    } finally spark.sql("DROP TABLE IF EXISTS graft.z")
  }
}
