package graft.etl

import java.nio.file.{Files, Path => JPath, Paths}

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** p26: multi-table atomic commits. The oracle locks the consistent-pair
  * VALUES; this spec pins the transaction protocol:
  *
  *  - CRASH WINDOW: after the raw table committed but before (a) the
  *    derived table's commit or (b) the txn row, pinned readers see the
  *    intact PREVIOUS pair on BOTH tables — even though the raw table's
  *    own manifest already advanced;
  *  - recovery = re-run the whole transaction; the txn row flips both
  *    tables at once;
  *  - pin layering: a transaction over {a} leaves table b's pin alone.
  */
class LakeTxnSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/lake_txn_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def rawContent(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.select(col("event_id"), col("value"))
      .as[(Long, Double)].collect().toMap

  // raw rows -> per-day rollup rows keyed by day
  private def rollupOf(raw: org.apache.spark.sql.DataFrame) = raw
    .groupBy(to_date(col("ts")).as("rday"))
    .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
    .select(col("rday").cast("string").as("rollup_key"),
      col("rday").cast("timestamp").as("ts"), col("n"), col("v"))

  private def seedPair(root: String): (String, String, String) = {
    val (rawDir, rollDir, txnDir) = (s"$root/raw", s"$root/rollup", s"$root/txn")
    val raw = Seq((1L, ts(1), 1.0), (2L, ts(1), 2.0), (3L, ts(2), 3.0))
      .toDF("event_id", "ts", "value")
    LakeSnapshot.merge(spark, rawDir, raw, "event_id", "ts")
    LakeSnapshot.merge(spark, rollDir, rollupOf(raw), "rollup_key", "ts")
    LakeTxn.commit(spark, txnDir, Map(
      "raw" -> LakeSnapshot.currentEpoch(spark, rawDir),
      "rollup" -> LakeSnapshot.currentEpoch(spark, rollDir)))
    (rawDir, rollDir, txnDir)
  }

  test("CRASH between the raw commit and the rollup/txn commits: pinned " +
    "readers stay on the consistent OLD pair; recovery re-runs the txn " +
    "and flips both at once") {
    val (rawDir, rollDir, txnDir) = seedPair(freshDir("crash"))
    def pinnedRaw() = LakeTxn.readPinned(spark, txnDir, "raw", rawDir)
    def pinnedRoll() = LakeTxn.readPinned(spark, txnDir, "rollup", rollDir)
    val rawBefore = rawContent(pinnedRaw())
    val rollBefore = pinnedRoll().select("rollup_key", "n")
      .as[(String, Long)].collect().toMap

    // the transaction: correct key 1, which changes day 1's rollup too —
    // CRASH after the raw commit, before the rollup merge and txn row
    val batch = Seq((1L, ts(1), 100.0)).toDF("event_id", "ts", "value")
    LakeSnapshot.merge(spark, rawDir, batch, "event_id", "ts")
    // (crash here)
    assert(rawContent(LakeSnapshot.read(spark, rawDir))(1L) === 100.0,
      "the raw table's own manifest HAS advanced")
    assert(rawContent(pinnedRaw()) === rawBefore,
      "pinned raw reader must stay on the pre-txn snapshot")
    assert(pinnedRoll().select("rollup_key", "n")
      .as[(String, Long)].collect().toMap === rollBefore)

    // recovery: re-run the WHOLE transaction (idempotent raw merge, fresh
    // rollup recompute of the touched day, then the txn row)
    LakeSnapshot.merge(spark, rawDir, batch, "event_id", "ts")
    val newRaw = LakeSnapshot.read(spark, rawDir)
    val day1 = rollupOf(newRaw.filter(to_date(col("ts")) === "2024-01-01")
      .select("event_id", "ts", "value"))
    LakeSnapshot.merge(spark, rollDir, day1, "rollup_key", "ts")
    LakeTxn.commit(spark, txnDir, Map(
      "raw" -> LakeSnapshot.currentEpoch(spark, rawDir),
      "rollup" -> LakeSnapshot.currentEpoch(spark, rollDir)))
    assert(rawContent(pinnedRaw())(1L) === 100.0)
    val rollAfter = pinnedRoll()
      .select(col("rollup_key"), col("v")).as[(String, Double)].collect().toMap
    assert(rollAfter("2024-01-01") === 102.0,
      s"the flipped pair must agree with the raw correction: $rollAfter")
  }

  test("pin layering: a txn over one table leaves other pins untouched; " +
    "unpinned tables fail loudly") {
    val (rawDir, rollDir, txnDir) = seedPair(freshDir("layering"))
    val rollPin = LakeTxn.currentPins(spark, txnDir)("rollup")
    LakeSnapshot.merge(spark, rawDir,
      Seq((9L, ts(2), 9.0)).toDF("event_id", "ts", "value"), "event_id", "ts")
    LakeTxn.commit(spark, txnDir,
      Map("raw" -> LakeSnapshot.currentEpoch(spark, rawDir)))
    val pins = LakeTxn.currentPins(spark, txnDir)
    assert(pins("rollup") === rollPin, "unrelated pins must survive layering")
    assert(rawContent(
      LakeTxn.readPinned(spark, txnDir, "raw", rawDir)).contains(9L))
    val ex = intercept[RuntimeException] {
      LakeTxn.readPinned(spark, txnDir, "nope", rollDir)
    }
    assert(ex.getMessage.contains("no pin"))
  }

  test("a DERIVED INDEX joins the transaction: the pinned probe sees " +
    "exactly the pinned index epochs, a crash between index append and " +
    "txn row leaves the pinned pair consistent, and a vacuumed pin " +
    "fails loudly") {
    import graft.ops.SpanIndex
    val root = freshDir("index_pin")
    val (lakeDir, idxDir, txnDir) = (s"$root/docs", s"$root/spans", s"$root/txn")
    val mkDoc = (id: Long, text: String) => (id, ts(1), text)
    val eight = "a b c d e f g h"
    val docs = Seq(mkDoc(1L, eight), mkDoc(2L, "w x y z p q r s"))
      .toDF("doc_id", "ts", "text")
    LakeSnapshot.merge(spark, lakeDir, docs, "doc_id", "ts")
    SpanIndex.buildSpanIndex(docs, "doc_id", "text", idxDir)
    LakeTxn.commit(spark, txnDir, Map(
      "docs" -> LakeSnapshot.currentEpoch(spark, lakeDir), "spans" -> 0))
    def pinnedDup(): Seq[(Long, Long, Long)] = {
      val lake = LakeTxn.readPinned(spark, txnDir, "docs", lakeDir)
        .select("doc_id", "text")
      SpanIndex.probeSpanStats(spark, idxDir, lake, "doc_id", "text",
          asOf = LakeTxn.pinnedEpoch(spark, txnDir, "spans"))
        .select(col("id").cast("long"), col("n_spans"), col("n_dup"))
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    }
    assert(pinnedDup() === Seq((1L, 1L, 1L), (2L, 1L, 1L)),
      "every pinned-lake doc hits the pinned index")
    // mid-flight transaction: lake delta + index append land, txn row
    // does NOT — the pinned consumer must stay on the old consistent pair
    val corrected = Seq(mkDoc(1L, s"$eight $eight"))
      .toDF("doc_id", "ts", "text")
    LakeSnapshot.mergeDelta(spark, lakeDir, corrected, "doc_id", "ts")
    val eIdx = SpanIndex.appendToSpanIndex(
      corrected, "doc_id", "text", idxDir, tag = "fix")
    assert(pinnedDup() === Seq((1L, 1L, 1L), (2L, 1L, 1L)),
      "the pinned pair must not move before the txn row")
    // recovery publishes the txn row: both surfaces flip at once — and
    // the doubled doc's 9 spans (incl. the bridge windows) ALL hit
    LakeTxn.commit(spark, txnDir, Map(
      "docs" -> LakeSnapshot.currentEpoch(spark, lakeDir),
      "spans" -> eIdx))
    assert(pinnedDup() === Seq((1L, 9L, 9L), (2L, 1L, 1L)))
    // a tagged redelivery returns the SAME epoch — idempotent pins
    assert(SpanIndex.appendToSpanIndex(
      corrected, "doc_id", "text", idxDir, tag = "fix") === eIdx)
    // as-of excludes YOUNGER epochs: the old pin must not see the append
    val oldProbe = SpanIndex.probeSpanStats(spark, idxDir,
        corrected.select("doc_id", "text"), "doc_id", "text", asOf = 0)
      .select("n_spans", "n_dup").as[(Long, Long)].head()
    assert(oldProbe._1 === 9L)
    assert(oldProbe._2 < 9L,
      "the pre-append pin must miss the bridge spans")
    // compaction + vacuum past the pin: the pinned probe fails LOUDLY
    SpanIndex.compactSpanIndex(spark, idxDir)
    SpanIndex.vacuumSpanIndex(spark, idxDir)
    val ex = intercept[IllegalArgumentException] {
      SpanIndex.probeSpanStats(spark, idxDir,
        corrected.select("doc_id", "text"), "doc_id", "text",
        asOf = eIdx).collect()
    }
    assert(ex.getMessage.contains("vacuumed"))
  }
}
