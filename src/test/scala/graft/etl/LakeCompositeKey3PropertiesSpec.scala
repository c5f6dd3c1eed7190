package graft.etl

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import java.util.concurrent.atomic.AtomicLong

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** THREE-part composite keys with MIXED types (r17, VERDICT r16 #7):
  * `key = 'site,uid,reg'` — STRING + BIGINT + DATE — through random
  * MERGE / MERGE-DELTA / DELETE / DELETE-DELTA / DV-DELETE / OPTIMIZE /
  * CHECKPOINT sequences against a driver-side model. The tuple space is
  * tiny (2×3×2) so every PART collides massively alone: a fold seam
  * comparing fewer than all three parts, or comparing the DATE part
  * under the wrong encoding, diverges from the model immediately.
  * Deterministic 2-part coverage lives in LakeCompositeKeySpec; this is
  * the arbitrary-arity + mixed-type lock.
  */
object LakeCompositeKey3PropertiesSpec
  extends Properties("LakeCompositeKey3") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = graft.TestSpark.spark

  private val caseId = new AtomicLong()
  private val K = "site,uid,reg"

  private def freshDir(): String = {
    val p = Paths.get(s"target/lake_ck3_prop/${caseId.incrementAndGet()}")
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
  private def date(i: Int): java.sql.Date =
    java.sql.Date.valueOf(f"2023-06-$i%02d")

  // the tuple: (site, uid, regIdx) — regIdx ∈ {1, 2} materializes as a
  // DATE key part; day is pinned per uid (key→day immutability contract)
  private type Key = (String, Long, Int)

  sealed trait Op
  final case class Merge(rows: List[(Key, Double)], delta: Boolean) extends Op
  final case class Delete(keys: List[Key], mode: Int) extends Op // 0 cow 1 delta 2 dv
  case object Optimize extends Op
  case object Checkpoint extends Op

  private val keyGen: Gen[Key] = for {
    s <- Gen.oneOf("a", "b")
    u <- Gen.chooseNum(1L, 3L)
    r <- Gen.chooseNum(1, 2)
  } yield (s, u, r)

  private val opsGen: Gen[List[Op]] =
    Gen.chooseNum(2, 5).flatMap(n => Gen.listOfN(n, Gen.frequency(
      4 -> (for {
        m <- Gen.chooseNum(1, 4)
        rows <- Gen.listOfN(m, for {
          k <- keyGen; v <- Gen.chooseNum(1, 99)
        } yield (k, v.toDouble))
        d <- Gen.oneOf(true, false)
      } yield Merge(rows, d)),
      3 -> (for {
        ks <- Gen.nonEmptyListOf(keyGen)
        m <- Gen.chooseNum(0, 2)
      } yield Delete(ks.distinct, m)),
      1 -> Gen.const(Optimize),
      1 -> Gen.const(Checkpoint))))

  private def toDf(rows: Seq[(Key, Double)]) = {
    import spark.implicits._
    rows.map { case ((s, u, r), v) => (s, u, date(r), ts(u.toInt), v) }
      .toDF("site", "uid", "reg", "ts", "value")
  }

  private def keysDf(keys: Seq[Key]) = {
    import spark.implicits._
    keys.map { case (s, u, r) => (s, u, date(r), ts(u.toInt)) }
      .toDF("site", "uid", "reg", "ts")
  }

  private def lakeContent(dir: String): Map[Key, Double] = {
    import org.apache.spark.sql.functions._
    LakeSnapshot.read(spark, dir)
      .select(col("site"), col("uid"),
        dayofmonth(col("reg")), col("value"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getInt(2)), r.getDouble(3)))
      .toMap
  }

  private def lakeContentAt(dir: String, epoch: Int): Map[Key, Double] = {
    import org.apache.spark.sql.functions._
    LakeSnapshot.readAt(spark, dir, epoch)
      .select(col("site"), col("uid"),
        dayofmonth(col("reg")), col("value"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getInt(2)), r.getDouble(3)))
      .toMap
  }

  property("random op sequences over key='site,uid,reg' (STRING+BIGINT+" +
    "DATE): committed view == model, every epoch time-travels, DV " +
    "deletes kill exact tuples") = forAll(opsGen) { ops =>
    val dir = freshDir()
    val seed: List[(Key, Double)] =
      List((("a", 1L, 1), 11.0), (("a", 2L, 2), 12.0), (("b", 3L, 1), 13.0))
    LakeSnapshot.merge(spark, dir, toDf(seed), K, "ts")
    var model: Map[Key, Double] = seed.toMap
    val history = scala.collection.mutable.ArrayBuffer(
      (LakeSnapshot.currentEpoch(spark, dir), model))

    ops.foreach { op =>
      op match {
        case Merge(rows, delta) =>
          if (delta) LakeSnapshot.mergeDelta(spark, dir, toDf(rows), K, "ts")
          else LakeSnapshot.merge(spark, dir, toDf(rows), K, "ts")
          // batch-dedup rule: greatest remaining-cols struct per TUPLE —
          // ts is pinned per tuple, so the max value survives
          rows.groupBy(_._1).foreach { case (k, rs) =>
            model = model.updated(k, rs.map(_._2).max)
          }
        case Delete(keys, mode) =>
          val present = keys.filter(model.contains)
          if (present.nonEmpty) {
            val st = LakeSnapshot.tableState(spark, dir)
            val daysDeltaFree = present.forall { case (_, u, _) =>
              st.days.get(f"2024-01-${u.toInt}%02d")
                .forall(_.deltas.isEmpty)
            }
            mode match {
              case 2 if daysDeltaFree =>
                LakeSnapshot.deleteKeysPositional(
                  spark, dir, keysDf(present), K, "ts")
              case 1 =>
                LakeSnapshot.deleteKeysDelta(
                  spark, dir, keysDf(present), K, "ts")
              case _ =>
                LakeSnapshot.deleteKeys(spark, dir, keysDf(present), K, "ts")
            }
            model = model -- present
          }
        case Optimize   => LakeSnapshot.compactDays(spark, dir)
        case Checkpoint => LakeSnapshot.checkpointManifest(spark, dir)
      }
      history += ((LakeSnapshot.currentEpoch(spark, dir), model))
    }

    val current = model.isEmpty || lakeContent(dir) == model
    val travel = history.forall { case (e, m) =>
      m.isEmpty || lakeContentAt(dir, e) == m
    }
    current && travel
  }
}
