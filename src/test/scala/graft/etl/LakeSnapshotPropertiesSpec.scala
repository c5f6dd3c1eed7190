package graft.etl

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import java.util.concurrent.atomic.AtomicLong

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Model-based property lock on the snapshot lake: a random sequence of
  * MERGE / DELETE / MERGE-DELTA / DELETE-DELTA / OPTIMIZE / CHECKPOINT
  * operations over a small key/day
  * space is applied both to [[LakeSnapshot]] and to a driver-side model
  * `Map[key -> (day, value)]`; after every sequence the lake's committed
  * view must equal the model, EVERY historical epoch must time-travel to
  * its recorded model snapshot (generations immutable; checkpoint and
  * optimize value-invisible), and each mutation window's change feed must
  * equal the model diff. Random interleavings are where protocol bugs
  * live (a fold that misorders epochs, a checkpoint that rewrites
  * history, a delete that resurrects under optimize) — the single-path
  * specs can't reach them.
  *
  * Spark jobs + manifest round-trips per op, so case counts are modest.
  */
object LakeSnapshotPropertiesSpec extends Properties("LakeSnapshot") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = graft.TestSpark.spark

  private val caseId = new AtomicLong()

  private def freshDir(): String = {
    val p = Paths.get(s"target/lake_snapshot_prop/${caseId.incrementAndGet()}")
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  sealed trait Op
  final case class Merge(rows: List[(Long, Int, Double)]) extends Op
  final case class Delete(keys: List[Long]) extends Op
  // merge-on-read variants: same model semantics, delta storage (r13)
  final case class MergeDelta(rows: List[(Long, Int, Double)]) extends Op
  final case class DeleteDelta(keys: List[Long]) extends Op
  case object Optimize extends Op
  case object Checkpoint extends Op

  // keys 1..6 over days 1..3: collisions, updates, cross-day traffic and
  // full-day erasure all arise by chance
  private val mergeGen: Gen[Op] = for {
    n <- Gen.chooseNum(1, 4)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(1L, 6L)
      d <- Gen.chooseNum(1, 3)
      v <- Gen.chooseNum(1, 99)
    } yield (k, d, v.toDouble))
  } yield Merge(rows)

  private val deleteGen: Gen[Op] =
    Gen.nonEmptyListOf(Gen.chooseNum(1L, 6L)).map(ks => Delete(ks.distinct))

  private val opsGen: Gen[List[Op]] =
    Gen.chooseNum(2, 6).flatMap(n => Gen.listOfN(n,
      Gen.frequency(4 -> mergeGen, 2 -> deleteGen,
        3 -> mergeGen.map { case Merge(r) => MergeDelta(r) },
        2 -> deleteGen.map { case Delete(k) => DeleteDelta(k) },
        1 -> Gen.const(Optimize), 1 -> Gen.const(Checkpoint))))

  private def lakeContent(dir: String): Map[Long, (String, Double)] = {
    import org.apache.spark.sql.functions._
    LakeSnapshot.read(spark, dir)
      .select(col("event_id"), col("day").cast("string"), col("value"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
  }

  private def lakeContentAt(dir: String, epoch: Int): Map[Long, (String, Double)] = {
    import org.apache.spark.sql.functions._
    LakeSnapshot.readAt(spark, dir, epoch)
      .select(col("event_id"), col("day").cast("string"), col("value"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
  }

  property("random op sequences: committed view == model, every epoch " +
    "time-travels to its model snapshot, CDC windows == model diffs") =
    forAll(opsGen) { ops =>
      import spark.implicits._
      val dir = freshDir()
      // seed: keys 1..3 on days 1..3 (key k on day k)
      val seedRows = (1 to 3).map(k => (k.toLong, ts(k), 100.0 + k))
      LakeSnapshot.merge(spark, dir,
        seedRows.toDF("event_id", "ts", "value"), "event_id", "ts")
      var model: Map[Long, (String, Double)] =
        seedRows.map { case (k, t, v) =>
          k -> ((t.toLocalDateTime.toLocalDate.toString, v)) }.toMap
      // history: epoch → model snapshot at that commit
      val history = scala.collection.mutable.ArrayBuffer(
        (LakeSnapshot.currentEpoch(spark, dir), model))

      ops.foreach { op =>
        op match {
          case Merge(rows) =>
            // key→day immutability is the lake's documented contract (an
            // update must carry its key's original day — a key that MOVED
            // days is undefined behavior, same as Hive dynamic-partition
            // upserts), so the generator remaps existing keys to their
            // model day BEFORE calling the lake; new keys take the
            // generated day.
            val placed = rows.map { case (k, d, v) =>
              val day = model.get(k).map(_._1).getOrElse(f"2024-01-$d%02d")
              (k, day, v)
            }
            LakeSnapshot.merge(spark, dir,
              placed.map { case (k, day, v) =>
                (k, java.sql.Timestamp.valueOf(s"$day 10:00:00"), v) }
                .toDF("event_id", "ts", "value"), "event_id", "ts")
            // model applies the documented batch-dedup rule: greatest
            // (ts, value) struct per key — within a key the remapped day
            // (hence ts) is constant, so the max value survives
            placed.groupBy(_._1).foreach { case (k, rs) =>
              val (_, day, v) = rs.maxBy { case (_, day, v) => (day, v) }
              model = model.updated(k, (day, v))
            }
          case Delete(keys) =>
            val withTs = keys.flatMap(k => model.get(k).map(k -> _))
              .map { case (k, (day, _)) =>
                (k, java.sql.Timestamp.valueOf(s"$day 10:00:00")) }
            if (withTs.nonEmpty) {
              LakeSnapshot.deleteKeys(spark, dir,
                withTs.toDF("event_id", "ts"), "event_id", "ts")
              model = model -- withTs.map(_._1)
            }
          case MergeDelta(rows) =>
            val placed = rows.map { case (k, d, v) =>
              val day = model.get(k).map(_._1).getOrElse(f"2024-01-$d%02d")
              (k, day, v)
            }
            LakeSnapshot.mergeDelta(spark, dir,
              placed.map { case (k, day, v) =>
                (k, java.sql.Timestamp.valueOf(s"$day 10:00:00"), v) }
                .toDF("event_id", "ts", "value"), "event_id", "ts")
            placed.groupBy(_._1).foreach { case (k, rs) =>
              val (_, day, v) = rs.maxBy { case (_, day, v) => (day, v) }
              model = model.updated(k, (day, v))
            }
          case DeleteDelta(keys) =>
            val withTs = keys.flatMap(k => model.get(k).map(k -> _))
              .map { case (k, (day, _)) =>
                (k, java.sql.Timestamp.valueOf(s"$day 10:00:00")) }
            if (withTs.nonEmpty) {
              LakeSnapshot.deleteKeysDelta(spark, dir,
                withTs.toDF("event_id", "ts"), "event_id", "ts")
              model = model -- withTs.map(_._1)
            }
          case Optimize   => LakeSnapshot.compactDays(spark, dir)
          case Checkpoint => LakeSnapshot.checkpointManifest(spark, dir)
        }
        // every committed epoch must later time-travel to THIS state
        // (optimize/checkpoint record the unchanged model)
        history += ((LakeSnapshot.currentEpoch(spark, dir), model))
      }

      val current = model.isEmpty || lakeContent(dir) == model
      val travel = history.forall { case (e, m) =>
        m.isEmpty || lakeContentAt(dir, e) == m
      }
      // every adjacent commit window's change feed == the model diff —
      // including OPTIMIZE/CHECKPOINT windows, which must be CDC-silent
      val cdc = history.toSeq.sliding(2).forall {
        case Seq((e0, m0), (e1, m1)) =>
          import org.apache.spark.sql.functions._
          val got = LakeSnapshot.readChanges(spark, dir, e0, e1, "event_id")
            .select(col("event_id"), col("day").cast("string"),
              col("value"), col("_change_type"))
            .collect()
            .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
              r.getString(3))).toSet
          val ins = (m1.keySet -- m0.keySet)
            .map(k => (k, m1(k)._1, m1(k)._2, "insert"))
          val del = (m0.keySet -- m1.keySet)
            .map(k => (k, m0(k)._1, m0(k)._2, "delete"))
          val upd = (m0.keySet & m1.keySet).filter(k => m0(k) != m1(k))
          val want = ins ++ del ++
            upd.map(k => (k, m0(k)._1, m0(k)._2, "update_preimage")) ++
            upd.map(k => (k, m1(k)._1, m1(k)._2, "update_postimage"))
          got == want
        case _ => true
      }
      current && travel && cdc
    }
}
