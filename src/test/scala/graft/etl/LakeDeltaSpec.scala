package graft.etl

import java.nio.file.{Files, Path => JPath, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** p23/p25: MERGE-ON-READ row deltas (VERDICT r12 #1) + write-time CDF
  * sidecars. The oracles hash-lock the folded VALUES (p23 shares p13's
  * oracle, p25 shares p15's); this spec pins the protocol claims:
  *
  *  - two CONCURRENT key-disjoint same-day delta writers BOTH commit —
  *    no abort, no whole-day re-stage (the r12 gap: day-granular OCC
  *    aborted them);
  *  - key-overlapping deltas serialize by epoch: youngest commit wins;
  *  - delete markers fold rows out; markers for absent keys are no-ops;
  *  - a COW merge layered over pending deltas absorbs them (staging
  *    reads the FOLDED image, not the raw base);
  *  - OPTIMIZE absorbs deltas back into one-file bases, restores the
  *    shuffle-free read plan, drops delta-emptied days, and vacuum then
  *    reclaims the delta directories;
  *  - time travel and CDC fold deltas exactly like the current view;
  *  - cdf=true commits stage write-time change sidecars readChangesCdf
  *    serves without snapshot diffing, and the feed fails LOUDLY on a
  *    window containing a sidecar-less mutation.
  */
class LakeDeltaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/lake_delta_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def content(dir: String): Set[(Long, Double, String)] =
    LakeSnapshot.read(spark, dir)
      .select(col("event_id"), col("value"), col("day").cast("string"))
      .as[(Long, Double, String)].collect().toSet

  private def seedLake(dir: String): Unit =
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 1.0), (2L, ts(1), 2.0), (3L, ts(2), 3.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts")

  test("ROW-LEVEL CONCURRENCY: two key-disjoint SAME-DAY delta writers " +
    "both commit — no abort, result is the serial union") {
    val dir = freshDir("concurrent")
    seedLake(dir)
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    def writer(rows: Seq[(Long, java.sql.Timestamp, Double)]) =
      pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = {
          start.await()
          LakeSnapshot.mergeDelta(spark, dir,
            rows.toDF("event_id", "ts", "value"), "event_id", "ts")
        }
      })
    // both touch day 1: key 1 update + key 10 insert vs key 2 update +
    // key 11 insert — disjoint keys, maximally overlapping days
    val f1 = writer(Seq((1L, ts(1), 100.0), (10L, ts(1), 10.0)))
    val f2 = writer(Seq((2L, ts(1), 200.0), (11L, ts(1), 11.0)))
    start.countDown()
    val e1 = f1.get(120, TimeUnit.SECONDS)
    val e2 = f2.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    assert(e1 !== e2, "the two delta commits must take distinct epochs")
    assert(content(dir) === Set(
      (1L, 100.0, "2024-01-01"), (2L, 200.0, "2024-01-01"),
      (10L, 10.0, "2024-01-01"), (11L, 11.0, "2024-01-01"),
      (3L, 3.0, "2024-01-02")))
  }

  test("key-overlapping deltas serialize by epoch order: the younger " +
    "commit wins per key (generation numbers do NOT decide)") {
    val dir = freshDir("overlap")
    seedLake(dir)
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((1L, ts(1), 50.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((1L, ts(1), 60.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    assert(content(dir).contains((1L, 60.0, "2024-01-01")))
  }

  test("delete markers fold rows out; markers for absent keys/days are " +
    "safe no-ops; a delta-only new day appears without any base") {
    val dir = freshDir("deletes")
    seedLake(dir)
    // new day 3 exists only as a delta (base = -1)
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((7L, ts(3), 7.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.deleteKeysDelta(spark, dir,
      Seq((2L, ts(1)), (99L, ts(1)), (42L, ts(9))).toDF("event_id", "ts"),
      "event_id", "ts")
    assert(content(dir) === Set(
      (1L, 1.0, "2024-01-01"), (3L, 3.0, "2024-01-02"),
      (7L, 7.0, "2024-01-03")))
  }

  test("a COW merge staged over pending deltas ABSORBS them: its new " +
    "base carries the folded image, deltas cleared") {
    val dir = freshDir("absorb")
    seedLake(dir)
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((1L, ts(1), 100.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    // COW merge touching day 1 must see the delta'd value of key 1
    LakeSnapshot.merge(spark, dir,
      Seq((2L, ts(1), 200.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val st = LakeSnapshot.liveView(spark, dir).days("2024-01-01")
    assert(st.deltas.isEmpty, "the rewrite must clear the day's deltas")
    assert(content(dir) === Set(
      (1L, 100.0, "2024-01-01"), (2L, 200.0, "2024-01-01"),
      (3L, 3.0, "2024-01-02")))
  }

  test("OPTIMIZE absorbs deltas, restores the shuffle-free plan, and " +
    "vacuum reclaims the delta directories") {
    val dir = freshDir("optimize")
    seedLake(dir)
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((1L, ts(1), 100.0), (5L, ts(2), 5.0))
        .toDF("event_id", "ts", "value"), "event_id", "ts")
    val expected = Set(
      (1L, 100.0, "2024-01-01"), (2L, 2.0, "2024-01-01"),
      (3L, 3.0, "2024-01-02"), (5L, 5.0, "2024-01-02"))
    assert(content(dir) === expected)
    // pre-optimize: the plan folds (a window shuffle is present)
    val preView = LakeSnapshot.liveView(spark, dir)
    assert(preView.days.values.exists(_.deltas.nonEmpty))
    LakeSnapshot.compactDays(spark, dir)
    val postView = LakeSnapshot.liveView(spark, dir)
    assert(postView.days.values.forall(_.deltas.isEmpty),
      "OPTIMIZE must absorb every delta")
    assert(content(dir) === expected, "OPTIMIZE must be value-invisible")
    val plan = LakeSnapshot.read(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "post-OPTIMIZE reads must be shuffle-free (no fold window)")
    LakeSnapshot.vacuum(spark, dir)
    assert(!Files.exists(Paths.get(s"$dir/delta")) ||
      Files.list(Paths.get(s"$dir/delta")).count() === 0L,
      "vacuum must reclaim absorbed delta generations")
  }

  test("a day fully emptied BY DELTAS leaves the view when OPTIMIZE " +
    "folds it (written-layout census)") {
    val dir = freshDir("emptied")
    seedLake(dir)
    LakeSnapshot.deleteKeysDelta(spark, dir,
      Seq((3L, ts(2))).toDF("event_id", "ts"), "event_id", "ts")
    assert(content(dir) === Set(
      (1L, 1.0, "2024-01-01"), (2L, 2.0, "2024-01-01")))
    LakeSnapshot.compactDays(spark, dir)
    val view = LakeSnapshot.liveView(spark, dir)
    assert(!view.days.contains("2024-01-02"),
      "the folded-empty day must drop out in the compaction commit")
    assert(content(dir) === Set(
      (1L, 1.0, "2024-01-01"), (2L, 2.0, "2024-01-01")))
  }

  test("TIME TRAVEL and CDC fold deltas exactly like the current view") {
    val dir = freshDir("travel")
    seedLake(dir)
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((1L, ts(1), 100.0), (9L, ts(1), 9.0))
        .toDF("event_id", "ts", "value"), "event_id", "ts")
    val e1 = LakeSnapshot.currentEpoch(spark, dir)
    LakeSnapshot.deleteKeysDelta(spark, dir,
      Seq((2L, ts(1))).toDF("event_id", "ts"), "event_id", "ts")
    val e2 = LakeSnapshot.currentEpoch(spark, dir)
    // travel to e1: first delta applied, delete not yet
    val at1 = LakeSnapshot.readAt(spark, dir, e1)
      .select(col("event_id"), col("value"), col("day").cast("string"))
      .as[(Long, Double, String)].collect().toSet
    assert(at1 === Set(
      (1L, 100.0, "2024-01-01"), (2L, 2.0, "2024-01-01"),
      (9L, 9.0, "2024-01-01"), (3L, 3.0, "2024-01-02")))
    // CDC over the delta window
    val got = LakeSnapshot.readChanges(spark, dir, e0, e2, "event_id")
      .select(col("event_id"), col("value"), col("_change_type"))
      .as[(Long, Double, String)].collect().toSet
    assert(got === Set(
      (1L, 1.0, "update_preimage"), (1L, 100.0, "update_postimage"),
      (9L, 9.0, "insert"), (2L, 2.0, "delete")))
  }

  test("CDF sidecars: write-time feed == snapshot-diff feed for cdf " +
    "merges and deletes; the feed is LOUD about sidecar-less mutations") {
    val dir = freshDir("cdf")
    seedLake(dir)
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 100.0), (8L, ts(2), 8.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts", cdf = true)
    LakeSnapshot.deleteKeys(spark, dir,
      Seq((2L, ts(1))).toDF("event_id", "ts"),
      "event_id", "ts", cdf = true)
    // OPTIMIZE inside the window: legitimately sidecar-less (maint)
    LakeSnapshot.compactDays(spark, dir)
    val e1 = LakeSnapshot.currentEpoch(spark, dir)
    def census(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("value"), col("_change_type"))
      .as[(Long, Double, String)].collect().toSet
    val diff = census(LakeSnapshot.readChanges(spark, dir, e0, e1, "event_id"))
    val feed = census(LakeSnapshot.readChangesCdf(spark, dir, e0, e1))
    assert(feed === diff)
    assert(feed === Set(
      (1L, 1.0, "update_preimage"), (1L, 100.0, "update_postimage"),
      (8L, 8.0, "insert"), (2L, 2.0, "delete")))
    // epochs attach to each sidecar row for offset-based consumption
    val epochs = LakeSnapshot.readChangesCdf(spark, dir, e0, e1)
      .select("_commit_epoch").distinct().as[Int].collect().toSet
    assert(epochs.size === 2)
    // a cdf=false mutation inside a queried window must throw
    LakeSnapshot.merge(spark, dir,
      Seq((4L, ts(1), 4.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val e2 = LakeSnapshot.currentEpoch(spark, dir)
    val ex = intercept[RuntimeException] {
      LakeSnapshot.readChangesCdf(spark, dir, e1, e2).collect()
    }
    assert(ex.getMessage.contains("cdf=false"))
  }

  test("DELTA CDF: write-time feed == snapshot-diff feed for cdf delta " +
    "merges/deletes; identical rows suppress; delete preimages carry " +
    "the younger correction") {
    val dir = freshDir("delta_cdf")
    seedLake(dir)
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    // update key 1, insert key 10, re-write key 3 IDENTICALLY (suppressed)
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((1L, ts(1), 100.0), (10L, ts(1), 10.0), (3L, ts(2), 3.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts", cdf = true)
    val eA = LakeSnapshot.currentEpoch(spark, dir)
    // delete key 1 — its preimage must be the YOUNGER delta value
    // (100.0), not the base row — plus an absent-key no-op marker
    LakeSnapshot.deleteKeysDelta(spark, dir,
      Seq((1L, ts(1)), (99L, ts(1))).toDF("event_id", "ts"),
      "event_id", "ts", cdf = true)
    val e1 = LakeSnapshot.currentEpoch(spark, dir)
    def census(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("value"), col("_change_type"))
      .as[(Long, Double, String)].collect().toSet
    // the write-time feed is PER-COMMIT granular (Delta CDF semantics);
    // a two-snapshot diff TELESCOPES a key's multi-commit history, so
    // the equivalence holds per commit window, not across one
    val diff = census(LakeSnapshot.readChanges(spark, dir, e0, eA, "event_id")) ++
      census(LakeSnapshot.readChanges(spark, dir, eA, e1, "event_id"))
    val feed = census(LakeSnapshot.readChangesCdf(spark, dir, e0, e1))
    assert(feed === diff)
    assert(feed === Set(
      (1L, 1.0, "update_preimage"), (1L, 100.0, "update_postimage"),
      (10L, 10.0, "insert"), (1L, 100.0, "delete")))
    // the streaming-source gen map resolves deltagen commits too
    assert(LakeSnapshot.cdfGens(spark, dir, e0, e1).size === 2)
  }

  test("a cdf delta ABORTS when an overlapping commit invalidates its " +
    "preimages; maintenance and disjoint-day commits are exempt") {
    val dir = freshDir("delta_cdf_abort")
    seedLake(dir)
    import graft.ops.FsClaimStore
    // stage a cdf delta against the current snapshot, then land an
    // overlapping same-day mutation before the commit: the staged
    // preimages are stale and the commit must abort
    val staged = LakeSnapshot.stageMergeDelta(spark, dir,
      Seq((1L, ts(1), 50.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts", FsClaimStore, cdf = true)
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((2L, ts(1), 20.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    intercept[LakeSnapshot.ConcurrentLakeMutationException] {
      LakeSnapshot.commitDelta(spark, dir, staged, "event_id")
    }
    // a maintenance commit (content-identical) does NOT abort it
    val staged2 = LakeSnapshot.stageMergeDelta(spark, dir,
      Seq((1L, ts(1), 60.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts", FsClaimStore, cdf = true)
    LakeSnapshot.compactDays(spark, dir)
    val e = LakeSnapshot.commitDelta(spark, dir, staged2, "event_id")
    assert(e > 0)
    // nor does a DISJOINT-day commit
    val staged3 = LakeSnapshot.stageMergeDelta(spark, dir,
      Seq((1L, ts(1), 70.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts", FsClaimStore, cdf = true)
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((8L, ts(2), 8.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.commitDelta(spark, dir, staged3, "event_id")
    assert(content(dir).contains((1L, 70.0, "2024-01-01")))
    // retries re-stage through the same public path as COW rebase
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((1L, ts(1), 80.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts", cdf = true, retries = 2)
    assert(content(dir).contains((1L, 80.0, "2024-01-01")))
  }

  test("the fold read plan stays O(touched days): a day filter prunes " +
    "fast-path AND delta scans to that day's directories") {
    val dir = freshDir("prune")
    seedLake(dir)
    LakeSnapshot.mergeDelta(spark, dir,
      Seq((1L, ts(1), 100.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val plan = LakeSnapshot.read(spark, dir)
      .filter(col("day") === lit("2024-01-02").cast("date"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      "day filters must reach the scans as partition filters")
  }
}
