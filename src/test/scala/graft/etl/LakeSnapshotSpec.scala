package graft.etl

import java.nio.file.{Files, Path => JPath, Paths}

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** p16/p17/p18: the snapshot-atomic lake. The oracles hash-check the
  * merged/deleted/evolved VALUES; this spec pins the protocol claims the
  * oracles can't see:
  *
  *  - a crash between staging and commit leaves readers on the intact
  *    pre-mutation snapshot — the whole touched-day set flips at once
  *    (the gap LakeUpsert documents as its open crash window);
  *  - untouched days' files are never rewritten;
  *  - overlapping concurrent mutations: exactly one commits, the loser
  *    aborts loudly (OCC) and its staged data stays invisible;
  *  - disjoint-day concurrent mutations both commit;
  *  - schema evolution: a batch with a new column merges, old rows
  *    null-fill, mixed-schema days coexist under one read;
  *  - vacuum removes superseded + orphaned generations (retention-gated)
  *    and never touches live ones.
  */
class LakeSnapshotSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/lake_snapshot_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def content(dir: String): Set[(Long, Double, String)] =
    LakeSnapshot.read(spark, dir)
      .select(col("event_id"), col("value"), col("day").cast("string"))
      .as[(Long, Double, String)].collect().toSet

  private def fileState(dir: String): Map[String, Long] = {
    val root = Paths.get(dir)
    import scala.jdk.CollectionConverters._
    Files.walk(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .map(p => root.relativize(p).toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap
  }

  private def seedLake(dir: String): Unit =
    LakeSnapshot.merge(spark,
      dir,
      Seq((1L, ts(1), 1.0), (2L, ts(1), 2.0), (3L, ts(2), 3.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts")

  private val initial = Set(
    (1L, 1.0, "2024-01-01"), (2L, 2.0, "2024-01-01"), (3L, 3.0, "2024-01-02"))

  test("CRASH WINDOW CLOSED: a mutation staged but not committed is " +
    "invisible; the commit flips the whole touched-day set at once") {
    val dir = freshDir("crash")
    seedLake(dir)
    // batch touches BOTH days: update key 1 (day 01) and key 3 (day 02)
    val batch = Seq((1L, ts(1), 100.0), (3L, ts(2), 300.0))
      .toDF("event_id", "ts", "value")
    val staged = LakeSnapshot.stageMerge(spark, dir, batch, "event_id", "ts")
    // "crash" here: data for both days is fully on disk, no manifest row.
    // Readers must see the EXACT pre-merge snapshot — never day 01 new +
    // day 02 old (the half-applied state dynamic overwrite could expose).
    assert(content(dir) === initial,
      "staged-but-uncommitted generations must be invisible")
    LakeSnapshot.commit(spark, dir, staged)
    assert(content(dir) === Set(
      (1L, 100.0, "2024-01-01"), (2L, 2.0, "2024-01-01"),
      (3L, 300.0, "2024-01-02")),
      "the commit must expose every touched day together")
  }

  test("recovery from a crashed (staged-only) mutation is re-running it; " +
    "the orphan generation stays invisible and vacuum reclaims it") {
    val dir = freshDir("recover")
    seedLake(dir)
    val batch = Seq((1L, ts(1), 100.0), (3L, ts(2), 300.0))
      .toDF("event_id", "ts", "value")
    val orphan = LakeSnapshot.stageMerge(spark, dir, batch, "event_id", "ts")
    // re-run the WHOLE mutation (stage+commit) — the recovery contract
    LakeSnapshot.merge(spark, dir, batch, "event_id", "ts")
    val expected = Set(
      (1L, 100.0, "2024-01-01"), (2L, 2.0, "2024-01-01"),
      (3L, 300.0, "2024-01-02"))
    assert(content(dir) === expected)
    // the orphan's directories exist on disk but no reader reaches them
    assert(Files.exists(
      Paths.get(s"$dir/data/gen=${orphan.gen}/day=2024-01-01")))
    // ADVICE r12: retainMs=0 alone must NOT touch an orphan — it is
    // indistinguishable from a live staging; reclaiming needs force
    LakeSnapshot.vacuum(spark, dir)
    assert(Files.exists(
      Paths.get(s"$dir/data/gen=${orphan.gen}/day=2024-01-01")),
      "un-forced vacuum must preserve a possibly-live staging")
    LakeSnapshot.vacuum(spark, dir, force = true)
    assert(!Files.exists(
      Paths.get(s"$dir/data/gen=${orphan.gen}/day=2024-01-01")),
      "forced vacuum must reclaim orphaned generations")
    assert(content(dir) === expected, "vacuum must never change the view")
  }

  test("untouched days' files are never rewritten; merge is idempotent") {
    val dir = freshDir("untouched")
    seedLake(dir)
    val live = LakeSnapshot.liveView(spark, dir)
    val day2Dir = s"$dir/data/gen=${live.days("2024-01-02").base}/day=2024-01-02"
    val before = fileState(day2Dir)
    val batch = Seq((2L, ts(1), 200.0)).toDF("event_id", "ts", "value")
    LakeSnapshot.merge(spark, dir, batch, "event_id", "ts")
    assert(fileState(day2Dir) === before,
      "a day outside the batch must keep its exact files")
    LakeSnapshot.merge(spark, dir, batch, "event_id", "ts")
    assert(content(dir) === Set(
      (1L, 1.0, "2024-01-01"), (2L, 200.0, "2024-01-01"),
      (3L, 3.0, "2024-01-02")))
  }

  test("OCC: of two OVERLAPPING mutations staged from the same snapshot, " +
    "exactly one commits; the loser aborts loudly and stays invisible") {
    val dir = freshDir("occ")
    seedLake(dir)
    val a = LakeSnapshot.stageMerge(spark, dir,
      Seq((1L, ts(1), 111.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val b = LakeSnapshot.stageMerge(spark, dir,
      Seq((2L, ts(1), 222.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.commit(spark, dir, a)
    val ex = intercept[LakeSnapshot.ConcurrentLakeMutationException] {
      LakeSnapshot.commit(spark, dir, b)
    }
    assert(ex.getMessage.contains("re-run the mutation"))
    // the winner's state, unpolluted by the loser's staged generation —
    // including key 2, which ONLY the loser modified
    assert(content(dir) === Set(
      (1L, 111.0, "2024-01-01"), (2L, 2.0, "2024-01-01"),
      (3L, 3.0, "2024-01-02")))
    // the loser's re-run (the documented recovery) lands both updates
    LakeSnapshot.merge(spark, dir,
      Seq((2L, ts(1), 222.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    assert(content(dir) === Set(
      (1L, 111.0, "2024-01-01"), (2L, 222.0, "2024-01-01"),
      (3L, 3.0, "2024-01-02")))
  }

  test("disjoint-day mutations staged concurrently BOTH commit (the " +
    "epoch-race retry, not the conflict abort)") {
    val dir = freshDir("disjoint")
    seedLake(dir)
    val a = LakeSnapshot.stageMerge(spark, dir,
      Seq((10L, ts(1), 10.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val b = LakeSnapshot.stageMerge(spark, dir,
      Seq((20L, ts(2), 20.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val ea = LakeSnapshot.commit(spark, dir, a)
    val eb = LakeSnapshot.commit(spark, dir, b) // must retry past ea, not abort
    assert(ea != eb)
    assert(content(dir) === initial ++ Set(
      (10L, 10.0, "2024-01-01"), (20L, 20.0, "2024-01-02")))
  }

  test("deleteKeys: snapshot-atomic, emptied day leaves the view in the " +
    "same commit, idempotent; vacuum retires its directories") {
    val dir = freshDir("delete")
    seedLake(dir)
    // delete key 2 (day 01 keeps key 1) and key 3 (day 02 empties)
    val keys = Seq((2L, ts(1)), (3L, ts(2))).toDF("event_id", "ts")
    val staged = LakeSnapshot.stageDelete(spark, dir, keys, "event_id", "ts")
    assert(content(dir) === initial, "staged delete must be invisible")
    LakeSnapshot.commit(spark, dir, staged)
    assert(content(dir) === Set((1L, 1.0, "2024-01-01")))
    assert(staged.dropped === Seq("2024-01-02"))
    // replayed erasure converges
    LakeSnapshot.deleteKeys(spark, dir, keys, "event_id", "ts")
    assert(content(dir) === Set((1L, 1.0, "2024-01-01")))
    LakeSnapshot.vacuum(spark, dir)
    // no generation anywhere still holds the erased day's directory
    import scala.jdk.CollectionConverters._
    val leftover = Files.walk(Paths.get(s"$dir/data")).iterator().asScala
      .exists(_.getFileName.toString == "day=2024-01-02")
    assert(!leftover, "vacuum must remove the emptied day's directories")
    assert(content(dir) === Set((1L, 1.0, "2024-01-01")))
  }

  test("retention gate: a superseded generation survives vacuum inside " +
    "the retention window, dies outside it") {
    val dir = freshDir("retain")
    seedLake(dir)
    val oldGen = LakeSnapshot.liveView(spark, dir).days("2024-01-01").base
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 99.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val oldDir = Paths.get(s"$dir/data/gen=$oldGen/day=2024-01-01")
    LakeSnapshot.vacuum(spark, dir, retainMs = 60 * 60 * 1000L)
    assert(Files.exists(oldDir),
      "inside the retention window a reader may still be on the old gen")
    LakeSnapshot.vacuum(spark, dir, retainMs = 0L)
    assert(!Files.exists(oldDir))
  }

  test("SCHEMA EVOLUTION: a batch with a new column merges; old rows " +
    "null-fill; an untouched old-schema day still reads") {
    val dir = freshDir("evolve")
    seedLake(dir)
    val batch = Seq((1L, ts(1), 100.0, "fix"), (4L, ts(1), 4.0, "new"))
      .toDF("event_id", "ts", "value", "src")
    LakeSnapshot.merge(spark, dir, batch, "event_id", "ts")
    val got = LakeSnapshot.read(spark, dir)
      .select(col("event_id"), col("value"), col("day").cast("string"),
        col("src"))
      .as[(Long, Double, String, Option[String])].collect().toSet
    assert(got === Set(
      (1L, 100.0, "2024-01-01", Some("fix")),
      (2L, 2.0, "2024-01-01", None),          // same-day old row: null src
      (4L, 4.0, "2024-01-01", Some("new")),
      (3L, 3.0, "2024-01-02", None)))         // untouched old-schema day
    // and a LATER batch without the column still merges (missing columns
    // null-fill in the other direction)
    LakeSnapshot.merge(spark, dir,
      Seq((3L, ts(2), 333.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val after = LakeSnapshot.read(spark, dir)
      .filter(col("event_id") === 3L)
      .select(col("value"), col("src")).as[(Double, Option[String])]
      .collect().toSeq
    assert(after === Seq((333.0, None)))
  }

  test("TIME TRAVEL: readAt pins a historical epoch; generations are " +
    "immutable so the old snapshot reads exactly as it committed") {
    val dir = freshDir("travel")
    seedLake(dir)
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 100.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.deleteKeys(spark, dir,
      Seq((3L, ts(2))).toDF("event_id", "ts"), "event_id", "ts")
    // current view: merged + day-02 gone
    assert(content(dir) === Set(
      (1L, 100.0, "2024-01-01"), (2L, 2.0, "2024-01-01")))
    // as-of the initial commit: the pristine lake, deleted day included
    val at0 = LakeSnapshot.readAt(spark, dir, e0)
      .select(col("event_id"), col("value"), col("day").cast("string"))
      .as[(Long, Double, String)].collect().toSet
    assert(at0 === initial)
  }

  test("CHECKPOINT: collapses the fold, changes no values, keeps time " +
    "travel, and never blinds a staged mutation's conflict check") {
    val dir = freshDir("checkpoint")
    seedLake(dir)
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 100.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    val before = content(dir)
    val cp = LakeSnapshot.checkpointManifest(spark, dir)
    assert(content(dir) === before, "a checkpoint must not change the view")
    // current-view readers now fold from the checkpoint row alone
    assert(LakeSnapshot.committedRows(spark, dir).map(_._1).min === cp)
    // mutations continue on top of it
    LakeSnapshot.merge(spark, dir,
      Seq((4L, ts(3), 4.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    assert(content(dir) === before + ((4L, 4.0, "2024-01-03")))
    // time travel to BEFORE the checkpoint still works (history retained)
    val at0 = LakeSnapshot.readAt(spark, dir, e0)
      .select(col("event_id"), col("value"), col("day").cast("string"))
      .as[(Long, Double, String)].collect().toSet
    assert(at0 === initial)
    // the lost-update guard: stage against the PRE-checkpoint base, let a
    // conflicting mutation + a checkpoint land, then try to commit — the
    // overlap must still be detected even though the checkpoint pointer
    // advanced past the conflicting row
    val stale = LakeSnapshot.stageMerge(spark, dir,
      Seq((1L, ts(1), 555.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 777.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.checkpointManifest(spark, dir)
    intercept[LakeSnapshot.ConcurrentLakeMutationException] {
      LakeSnapshot.commit(spark, dir, stale)
    }
    assert(content(dir).contains((1L, 777.0, "2024-01-01")),
      "the committed mutation must win; the stale stager must abort")
  }

  test("CHANGE DATA FEED: inserts, deletes, update pre/post images; " +
    "identical rows and untouched keys emit NOTHING") {
    val dir = freshDir("cdf")
    seedLake(dir)
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    // update key 1 (changed value), re-merge key 2 IDENTICALLY (same-day
    // rewrite, no change), insert key 10
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 100.0), (2L, ts(1), 2.0), (10L, ts(3), 10.0))
        .toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.deleteKeys(spark, dir,
      Seq((3L, ts(2))).toDF("event_id", "ts"), "event_id", "ts")
    val e1 = LakeSnapshot.currentEpoch(spark, dir)
    val ch = LakeSnapshot.readChanges(spark, dir, e0, e1, "event_id")
      .select(col("event_id"), col("value"), col("_change_type"))
      .as[(Long, Double, String)].collect().toSet
    assert(ch === Set(
      (1L, 1.0, "update_preimage"),
      (1L, 100.0, "update_postimage"),
      (10L, 10.0, "insert"),
      (3L, 3.0, "delete")),
      "key 2 (identical re-merge) must be silent despite the day rewrite")
  }

  test("OPTIMIZE: one file per day after compaction, values identical, " +
    "CDC-silent; the later OCC committer aborts and re-runs") {
    val dir = freshDir("optimize")
    seedLake(dir)
    // several small generations on day 01
    (1 to 3).foreach { i =>
      LakeSnapshot.merge(spark, dir,
        Seq((100L + i, ts(1), i.toDouble)).toDF("event_id", "ts", "value"),
        "event_id", "ts")
    }
    val before = content(dir)
    val e0 = LakeSnapshot.currentEpoch(spark, dir)
    LakeSnapshot.compactDays(spark, dir)
    val e1 = LakeSnapshot.currentEpoch(spark, dir)
    assert(content(dir) === before, "compaction must not move values")
    // CDC-silence: the compacted-only window carries no row changes
    assert(LakeSnapshot.readChanges(spark, dir, e0, e1, "event_id")
      .count() === 0L)
    // post-compaction + vacuum: each live day directory holds ONE file
    LakeSnapshot.vacuum(spark, dir)
    val live = LakeSnapshot.liveView(spark, dir)
    live.days.foreach { case (d, st) =>
      val g = st.base
      val files = Files.list(Paths.get(s"$dir/data/gen=$g/day=$d"))
        .iterator()
      import scala.jdk.CollectionConverters._
      val parts = files.asScala.count(_.getFileName.toString.startsWith("part-"))
      assert(parts === 1, s"day $d gen $g must hold one file, got $parts")
    }
    assert(content(dir) === before)
    // symmetric OCC: a merge staged before the compaction commits aborts...
    val stale = LakeSnapshot.stageMerge(spark, dir,
      Seq((1L, ts(1), 500.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    LakeSnapshot.compactDays(spark, dir)
    intercept[LakeSnapshot.ConcurrentLakeMutationException] {
      LakeSnapshot.commit(spark, dir, stale)
    }
    // ...and its standard recovery (re-run) lands the update
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 500.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    assert(content(dir).contains((1L, 500.0, "2024-01-01")))
  }

  test("TWO-WRITER RACE: concurrent overlapping merges with the " +
    "documented retry-on-abort recovery both land; the result is a " +
    "serial order of the two") {
    val dir = freshDir("two_writers")
    seedLake(dir)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val go = new java.util.concurrent.CountDownLatch(1)
    def writer(key: Long, v: Double): java.util.concurrent.Future[Unit] =
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          go.await()
          // the built-in auto-rebase: re-stage against the winner's
          // snapshot on each OCC abort
          LakeSnapshot.merge(spark, dir,
            Seq((key, ts(1), v)).toDF("event_id", "ts", "value"),
            "event_id", "ts", retries = 10)
          ()
        }
      })
    try {
      val a = writer(7L, 70.0)
      val b = writer(8L, 80.0)
      go.countDown()
      a.get(120, java.util.concurrent.TimeUnit.SECONDS)
      b.get(120, java.util.concurrent.TimeUnit.SECONDS)
    } finally pool.shutdown()
    // both updates landed (each retried past the other's commit), the
    // seed rows are intact, and nothing tore
    assert(content(dir) === initial ++ Set(
      (7L, 70.0, "2024-01-01"), (8L, 80.0, "2024-01-01")))
    // r19 (VERDICT r18 #8): EVERY staged generation of the race carries
    // TIMESTAMP_MICROS footers — the old shared-conf mutate-restore
    // window let writer B's restore land mid-flight of writer A's write
    // action and silently stage an INT96 generation
    val hconf = spark.sparkContext.hadoopConfiguration
    val dataRoot = new org.apache.hadoop.fs.Path(s"$dir/data")
    val hfs = dataRoot.getFileSystem(hconf)
    val it = hfs.listFiles(dataRoot, true)
    var checked = 0
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.startsWith("part-") && f.getName.endsWith(".parquet")) {
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, hconf))
        try {
          val schema = r.getFooter.getFileMetaData.getSchema
          val t = schema.getType(schema.getFieldIndex("ts"))
            .asPrimitiveType().getPrimitiveTypeName.toString
          assert(t === "INT64", s"$f: ts stored as $t — INT96 regression")
          checked += 1
        } finally r.close()
      }
    }
    assert(checked >= 3, s"expected seed + both writers' files, got $checked")
  }

  test("describeHistory: one row per commit with operation kind, day " +
    "counts, and epochs an operator can time-travel to") {
    val dir = freshDir("history")
    seedLake(dir)
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 9.0)).toDF("event_id", "ts", "value"), "event_id", "ts")
    LakeSnapshot.deleteKeys(spark, dir,
      Seq((3L, ts(2))).toDF("event_id", "ts"), "event_id", "ts")
    LakeSnapshot.checkpointManifest(spark, dir)
    val h = LakeSnapshot.describeHistory(spark, dir)
      .select(col("epoch"), col("operation"), col("n_days"), col("n_dropped"))
      .as[(Int, String, Int, Int)].collect().toSeq
    assert(h === Seq(
      (0, "write", 2, 0),      // seed: days 01+02
      (1, "write", 1, 0),      // merge touching day 01
      (2, "delete", 0, 1),     // delete emptying day 02
      (3, "checkpoint", 0, 0)))
    // every listed epoch is a valid time-travel target
    h.map(_._1).foreach(e => LakeSnapshot.readAt(spark, dir, e).count())
  }

  test("a day filter over the snapshot read lands in PartitionFilters " +
    "(pruning survives the generation indirection)") {
    val dir = freshDir("pruned_read")
    seedLake(dir)
    val plan = LakeSnapshot.read(spark, dir)
      .filter(col("day") === lit("2024-01-01").cast("date"))
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator
      .filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf.contains("day"), s"day must prune at the scan:\n$plan")
  }

  test("duplicate batch keys collapse greatest-struct-wins (shared " +
    "LakeUpsert rule)") {
    val dir = freshDir("dup")
    seedLake(dir)
    LakeSnapshot.merge(spark, dir,
      Seq((1L, ts(1), 7.0), (1L, ts(1), 9.0)).toDF("event_id", "ts", "value"),
      "event_id", "ts")
    assert(content(dir).contains((1L, 9.0, "2024-01-01")))
  }
}
