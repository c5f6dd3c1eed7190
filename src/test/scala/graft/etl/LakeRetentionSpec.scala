package graft.etl

import java.nio.file.{Files, Path => JPath, Paths}

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-surface retention policy + DESCRIBE RETENTION (round-14 ring d):
  *
  *  - the audit and the vacuum consume the SAME plan: what
  *    describeRetention reports reclaimable is exactly what
  *    vacuumPolicy deletes;
  *  - per-surface asymmetry holds: historyMs=0 reclaims superseded
  *    generations immediately while cdf sidecars and orphans survive
  *    (their `<= 0` means "keep");
  *  - LakeTxn pins protect: a pinned epoch's generations survive any
  *    history retention, time travel to the pin keeps working, and the
  *    audit counts them pin_protected;
  *  - orphan retention is claim-age-gated; force still takes them.
  */
class LakeRetentionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/lake_retention_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def content(dir: String): Set[(Long, Double)] =
    LakeSnapshot.read(spark, dir)
      .select(col("event_id"), col("value"))
      .as[(Long, Double)].collect().toSet

  private def audit(
      dir: String, policy: LakeSnapshot.RetentionPolicy,
      pins: Seq[Int] = Nil): Map[String, (Long, Long, Long)] =
    LakeSnapshot.describeRetention(spark, dir, policy, pins)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  /** seed + cdf merge + optimize → superseded history, one cdf gen. */
  private def build(dir: String): Int = {
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.0), (2L, ts(1), 2.0), (3L, ts(2), 3.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 10.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts", cdf = true)
    val pre = LakeSnapshot.currentEpoch(spark, dir)
    LakeSnapshot.compactDays(spark, dir)
    pre
  }

  test("describeRetention reports exactly what vacuumPolicy takes; " +
    "history/cdf/orphan asymmetry at retention 0") {
    val dir = freshDir("asym")
    build(dir)
    // an orphan: claimed generation that never committed
    val gOrphan = 90
    Files.createDirectories(Paths.get(s"$dir/data/gen=$gOrphan/day=2024-01-01"))
    Files.write(Paths.get(s"$dir/data/gen=$gOrphan/day=2024-01-01/part-0.parquet"),
      Array[Byte](1))
    Files.write(Paths.get(s"$dir/manifest/gen-$gOrphan.claim"), Array[Byte](1))
    val policy = LakeSnapshot.RetentionPolicy(
      historyMs = 0L, cdfMs = 0L, orphanMs = 0L)
    val before = audit(dir, policy)
    assert(before("history")._2 > 0, "superseded gens must be reclaimable")
    assert(before("orphan") === ((1L, 0L, 0L)),
      "orphanMs=0 keeps the possibly-live staging")
    assert(before("cdf")._1 === 1L && before("cdf")._2 === 0L,
      "cdfMs=0 keeps the sidecar")
    val want = content(dir)
    LakeSnapshot.vacuumPolicy(spark, dir, policy)
    assert(content(dir) === want, "vacuum must never change the view")
    val after = audit(dir, policy)
    assert(after("history")._2 === 0L, "nothing reclaimable remains")
    assert(after("history")._1 === before("history")._1 - before("history")._2,
      "exactly the reported reclaimable objects were taken")
    assert(Files.exists(Paths.get(s"$dir/data/gen=$gOrphan")),
      "orphan survives retention 0")
    assert(after("cdf")._1 === 1L, "cdf sidecar survives retention 0")
    // a long cdf retention still reports the sidecar unreclaimable; a
    // 1ms retention ages it out
    assert(audit(dir, policy.copy(cdfMs = 1L))("cdf")._2 === 1L)
    LakeSnapshot.vacuumPolicy(spark, dir, policy.copy(cdfMs = 1L))
    assert(audit(dir, policy)("cdf")._1 === 0L)
    // orphan: a 1ms claim age reclaims; the audit agreed first
    assert(audit(dir, policy.copy(orphanMs = 1L))("orphan")._2 === 1L)
    LakeSnapshot.vacuumPolicy(spark, dir, policy.copy(orphanMs = 1L))
    assert(!Files.exists(Paths.get(s"$dir/data/gen=$gOrphan")))
    assert(content(dir) === want)
  }

  test("a LakeTxn pin protects its epoch's generations from any history " +
    "retention; time travel to the pin survives the vacuum") {
    val dir = freshDir("pinned")
    val txn = freshDir("pinned_txn")
    val pre = build(dir)
    LakeTxn.commit(spark, txn, Map("events" -> pre))
    val pins = LakeTxn.pinsFor(spark, txn, "events")
    assert(pins === Seq(pre))
    val policy = LakeSnapshot.RetentionPolicy(historyMs = 0L)
    val a = audit(dir, policy, pins)
    assert(a("history")._3 > 0, "the pinned epoch's gens must be counted")
    // the ONLY reclaimable generation is day 1's original base — it was
    // superseded BEFORE the pinned epoch, so the pin rightly doesn't
    // protect it; everything the pinned view reaches is kept
    assert(a("history")._2 === 1L,
      "with the pin, only the pre-pin superseded gen is reclaimable")
    val unprotected = audit(dir, policy)
    assert(unprotected("history")._2 > a("history")._2,
      "without the pin, the pinned view's gens become reclaimable too")
    val pinnedView = LakeSnapshot.readAt(spark, dir, pre)
      .select(col("event_id"), col("value"))
      .as[(Long, Double)].collect().toSet
    LakeSnapshot.vacuumPolicy(spark, dir, policy, pins)
    assert(LakeSnapshot.readAt(spark, dir, pre)
      .select(col("event_id"), col("value"))
      .as[(Long, Double)].collect().toSet === pinnedView,
      "time travel to the pinned epoch must survive the vacuum")
    // drop the pin: the same policy now reclaims, and the old epoch dies
    LakeSnapshot.vacuumPolicy(spark, dir, policy)
    val ex = intercept[Exception] {
      LakeSnapshot.readAt(spark, dir, pre)
        .select(col("event_id")).collect()
    }
    assert(ex.getMessage != null)
    assert(content(dir) === Set((1L, 10.0), (2L, 2.0), (3L, 3.0)))
  }

  test("legacy vacuum(retainMs, force) semantics are unchanged through " +
    "the policy path: force takes orphans, retention 0 keeps them") {
    val dir = freshDir("legacy")
    build(dir)
    val gOrphan = 91
    Files.createDirectories(Paths.get(s"$dir/data/gen=$gOrphan/day=2024-01-01"))
    Files.write(Paths.get(s"$dir/data/gen=$gOrphan/day=2024-01-01/part-0.parquet"),
      Array[Byte](1))
    Files.write(Paths.get(s"$dir/manifest/gen-$gOrphan.claim"), Array[Byte](1))
    LakeSnapshot.vacuum(spark, dir) // retainMs = 0
    assert(Files.exists(Paths.get(s"$dir/data/gen=$gOrphan")),
      "un-forced vacuum must preserve a possibly-live staging")
    LakeSnapshot.vacuum(spark, dir, force = true)
    assert(!Files.exists(Paths.get(s"$dir/data/gen=$gOrphan")),
      "forced vacuum must reclaim orphaned generations")
  }

  test("streaming-sink staging dirs under delta/.sw never crash the " +
    "vacuum (ADVICE r14 high) and reclaim on the orphan retention, " +
    "parents included") {
    val dir = freshDir("sw_staging")
    build(dir)
    // a crashed micro-batch's leftover staging: delta/.sw/<query>/<epoch>
    val ep = Paths.get(s"$dir/delta/.sw/q-123/7/day=2024-01-01")
    Files.createDirectories(ep)
    Files.write(ep.resolve("part-0.parquet"), Array[Byte](1))
    Files.createDirectories(Paths.get(s"$dir/delta/.sw/q-456")) // empty parent
    val keep = LakeSnapshot.RetentionPolicy(orphanMs = 0L)
    // the r14 bug: these threw NumberFormatException on '.sw'
    val a = audit(dir, keep)
    assert(a("staging") === ((1L, 0L, 0L)),
      "orphanMs=0 keeps the possibly-live staging epoch dir")
    LakeSnapshot.vacuumPolicy(spark, dir, keep)
    assert(Files.exists(ep), "unaged staging survives")
    assert(!Files.exists(Paths.get(s"$dir/delta/.sw/q-456")),
      "an EMPTY queryId parent is dead weight and goes on any pass")
    // aged out (1ms): the epoch dir goes, then its parent, then .sw
    val takeAll = LakeSnapshot.RetentionPolicy(orphanMs = 1L)
    assert(audit(dir, takeAll)("staging")._2 === 1L,
      "the audit must report the aged staging reclaimable")
    LakeSnapshot.vacuumPolicy(spark, dir, takeAll)
    assert(!Files.exists(Paths.get(s"$dir/delta/.sw")),
      "aged staging, its queryId parent, and the empty .sw root all go")
    assert(content(dir) === Set((1L, 10.0), (2L, 2.0), (3L, 3.0)))
  }

  test("claim-file cleanup is age-gated (ADVICE r14 medium): a young " +
    "file-less claim is an in-flight merge's, not garbage — vacuum " +
    "mid-stage keeps it and the merge commits intact") {
    val dir = freshDir("claim_race")
    build(dir)
    // a MERGE claims its generation BEFORE Spark runs the join: the
    // claim legitimately has zero files on disk right now
    val (gen, base, _) = LakeSnapshot.stageExternalDelta(spark, dir, "event_id")
    val claim = Paths.get(s"$dir/manifest/gen-$gen.claim")
    assert(Files.exists(claim))
    // vacuum DURING the in-flight window (default orphan retention 24h)
    LakeSnapshot.vacuumPolicy(spark, dir, LakeSnapshot.RetentionPolicy())
    assert(Files.exists(claim),
      "a claim younger than the orphan retention must survive the vacuum")
    // the merge now fills its generation and commits — had the claim
    // died, a second vacuum would have read delta/gen=G as a 'claimless
    // stray' and reclaimed the in-flight files (broken reads)
    val day = "2024-01-02"
    Seq((3L, ts(2), 33.0, "u"))
      .toDF("event_id", "ts", "value", "__op")
      .withColumn("day", lit(day))
      .write.mode("append").partitionBy("day")
      .parquet(s"$dir/delta/gen=$gen")
    LakeSnapshot.vacuumPolicy(spark, dir, LakeSnapshot.RetentionPolicy())
    LakeSnapshot.commitExternalDelta(
      spark, dir, gen, base, Seq(day), "event_id")
    assert(content(dir) === Set((1L, 10.0), (2L, 2.0), (3L, 33.0)),
      "the merge staged across two vacuums must commit intact")
    // an AGED file-less claim is true garbage: 1ms retention takes it
    val g2 = LakeSnapshot.stageExternalDelta(spark, dir, "event_id")._1
    val c2 = Paths.get(s"$dir/manifest/gen-$g2.claim")
    Thread.sleep(5)
    LakeSnapshot.vacuumPolicy(spark, dir,
      LakeSnapshot.RetentionPolicy(orphanMs = 1L))
    assert(!Files.exists(c2),
      "a claim past the orphan retention with no data is reclaimed")
  }
}
