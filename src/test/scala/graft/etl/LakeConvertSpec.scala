package graft.etl

import java.nio.file.{Files, Path => JPath, Paths}

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** p57: CONVERT plain day-partitioned parquet in place. The oracle
  * hash-checks the adopted VALUES (+ a post-convert merge); this spec
  * pins what it can't see:
  *
  *  - adoption is a MOVE: the adopted generation holds the identical
  *    part-files (same names, same mtimes — zero rewrite), the source
  *    path is gone, and the stats sidecar rides the generation;
  *  - the adopted table folds like any other: a MoR delta layered over
  *    adopted files reads correctly;
  *  - the validation scan refuses duplicate keys, keys spanning days,
  *    and day dirs that contradict to_date(ts) — leaving the source
  *    untouched; `validate = false` is an explicit caller promise;
  *  - malformed sources (stray files, non-part- data files, an existing
  *    lake, a non-empty destination) refuse loudly before anything
  *    moves.
  */
class LakeConvertSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/lake_convert_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  /** Plain Spark partitionBy("day") output — the convertible shape. */
  private def writePlain(dir: String,
      rows: Seq[(Long, java.sql.Timestamp, Double)]): Unit =
    rows.toDF("event_id", "ts", "value")
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").parquet(dir)

  private def partFiles(dir: String): Map[String, Long] = {
    val root = Paths.get(dir)
    import scala.jdk.CollectionConverters._
    Files.walk(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .map(p => p.getFileName.toString ->
        Files.getLastModifiedTime(p).toMillis)
      .toMap
  }

  private def content(dir: String): Set[(Long, Double, String)] =
    LakeSnapshot.read(spark, dir)
      .select(col("event_id"), col("value"), col("day").cast("string"))
      .as[(Long, Double, String)].collect().toSet

  test("adoption is a zero-rewrite move: same files, stats sidecar, " +
    "readable view, source gone") {
    val root = freshDir("move")
    val src = s"$root/plain"
    writePlain(src, Seq((1L, ts(1), 1.0), (2L, ts(1), 2.0), (3L, ts(2), 3.0)))
    val before = partFiles(src)
    val (e, days) = LakeSnapshot.adoptParquet(
      spark, s"$root/tbl", src, "event_id", "ts")
    assert(e === 0 && days === Seq("2024-01-01", "2024-01-02"))
    assert(!Files.exists(Paths.get(src)), "conversion is a MOVE")
    assert(partFiles(s"$root/tbl") === before,
      "the adopted generation must hold the identical untouched files")
    assert(Files.exists(
      Paths.get(s"$root/tbl/data/gen=0/_filestats.tsv")),
      "the adopted generation must carry its stats sidecar")
    assert(content(s"$root/tbl") === Set(
      (1L, 1.0, "2024-01-01"), (2L, 2.0, "2024-01-01"),
      (3L, 3.0, "2024-01-02")))
  }

  test("the adopted table folds MoR deltas over adopted files") {
    val root = freshDir("fold")
    val src = s"$root/plain"
    writePlain(src, Seq((1L, ts(1), 1.0), (3L, ts(2), 3.0)))
    LakeSnapshot.adoptParquet(spark, s"$root/tbl", src, "event_id", "ts")
    LakeSnapshot.mergeDelta(spark, s"$root/tbl",
      Seq((1L, ts(1), 100.0), (4L, ts(2), 4.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts")
    assert(content(s"$root/tbl") === Set(
      (1L, 100.0, "2024-01-01"), (3L, 3.0, "2024-01-02"),
      (4L, 4.0, "2024-01-02")))
  }

  test("validation refuses duplicate keys and leaves the source intact") {
    val root = freshDir("dupkeys")
    val src = s"$root/plain"
    writePlain(src, Seq((1L, ts(1), 1.0), (1L, ts(1), 9.0)))
    val err = intercept[IllegalArgumentException] {
      LakeSnapshot.adoptParquet(spark, s"$root/tbl", src, "event_id", "ts")
    }
    assert(err.getMessage.contains("validation failed"))
    assert(Files.exists(Paths.get(src)),
      "a failed validation must leave the source where it was")
    // the explicit promise path still adopts
    val (e, _) = LakeSnapshot.adoptParquet(
      spark, s"$root/tbl", src, "event_id", "ts", validate = false)
    assert(e === 0)
  }

  test("validation refuses day dirs contradicting to_date(ts)") {
    val root = freshDir("misrouted")
    val src = s"$root/plain"
    // the row says Jan 1 but lands in the Jan 2 partition
    Seq((1L, ts(1), 1.0)).toDF("event_id", "ts", "value")
      .withColumn("day", lit("2024-01-02").cast("date"))
      .write.partitionBy("day").parquet(src)
    val err = intercept[IllegalArgumentException] {
      LakeSnapshot.adoptParquet(spark, s"$root/tbl", src, "event_id", "ts")
    }
    assert(err.getMessage.contains("validation failed"))
  }

  test("malformed sources refuse loudly before anything moves") {
    val root = freshDir("malformed")
    // 1) stray non-day dir
    val s1 = s"$root/stray"
    writePlain(s1, Seq((1L, ts(1), 1.0)))
    Files.createDirectories(Paths.get(s"$s1/not_a_day"))
    assert(intercept[IllegalArgumentException] {
      LakeSnapshot.adoptParquet(spark, s"$root/t1", s1, "event_id", "ts")
    }.getMessage.contains("day=YYYY-MM-DD"))
    // 2) a data file outside the part-* convention would vanish from
    // reads — refused with the offender named
    val s2 = s"$root/badname"
    writePlain(s2, Seq((1L, ts(1), 1.0)))
    val day = {
      import scala.jdk.CollectionConverters._
      Files.list(Paths.get(s2)).iterator().asScala
        .find(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("day=")).get
    }
    Files.writeString(day.resolve("data.parquet"), "x")
    assert(intercept[IllegalArgumentException] {
      LakeSnapshot.adoptParquet(spark, s"$root/t2", s2, "event_id", "ts")
    }.getMessage.contains("data.parquet"))
    // 3) an existing lake as source
    val s3 = s"$root/lake"
    LakeSnapshot.merge(spark, s3,
      Seq((1L, ts(1), 1.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    assert(intercept[IllegalArgumentException] {
      LakeSnapshot.adoptParquet(spark, s"$root/t3", s3, "event_id", "ts")
    }.getMessage.contains("already looks like a graft lake"))
    // 4) a destination that already has commits
    val s4 = s"$root/plain2"
    writePlain(s4, Seq((2L, ts(1), 2.0)))
    assert(intercept[IllegalArgumentException] {
      LakeSnapshot.adoptParquet(spark, s3, s4, "event_id", "ts")
    }.getMessage.contains("already has committed epochs"))
  }
}
