package graft.etl

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** P12: Morton-curve lake layout. The oracle hash-locks the key arithmetic
  * and the written audit; this spec pins the bit-level key definition and
  * the property the layout exists FOR — narrow per-file spans on BOTH
  * dimensions — including the negative a value oracle can't express: a
  * single-column sort passes one dimension's gate and fails the other's.
  */
class ZOrderSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("morton key interleaves bits exactly (a even, b odd)") {
    // a=0b101 → bits 0,4 set → 0b00010001 = 17
    // b=0b011 → bits 1,3 set → 0b00001010 = 10  ⇒ key = 27
    val got = Seq((5L, 3L)).toDF("a", "b")
      .select(ZOrder.mortonKey(col("a"), col("b"), bits = 16).as("z"))
      .head().getLong(0)
    assert(got === 27L)
    // locality sanity: adjacent cells differ in low key bits only
    val z2 = Seq((5L, 2L)).toDF("a", "b")
      .select(ZOrder.mortonKey(col("a"), col("b")).as("z")).head().getLong(0)
    assert((got ^ z2) < 4L, s"$got vs $z2")
  }

  private def spanRatios(dir: String): (Double, Double) = {
    val back = spark.read.parquet(dir)
    val g = back.agg(
      (max("user_id") - min("user_id")).as("gu"),
      (max("us") - min("us")).as("gt")).head()
    val s = ZOrder.fileSpans(back, Seq("user_id", "us"))
      .agg(count(lit(1)).as("nf"),
        sum("span_user_id").as("su"), sum("span_us").as("st")).head()
    (s.getLong(1).toDouble / (s.getLong(0) * g.getLong(0)),
      s.getLong(2).toDouble / (s.getLong(0) * g.getLong(1)))
  }

  test("z-order clusters BOTH dimensions; single-column sort only one") {
    val ev = Tables.load(spark, TestSpark.sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val b = ev.agg(min("user_id"), max("user_id"), min("us"), max("us")).head()
    val (mnU, mxU, mnT, mxT) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val keyed = ev
      .withColumn("ub",
        expr(s"((user_id - $mnU) * 65535) DIV ${math.max(1L, mxU - mnU)}"))
      .withColumn("tb",
        expr(s"((us - $mnT) * 65535) DIV ${math.max(1L, mxT - mnT)}"))
      .withColumn("zkey", ZOrder.mortonKey(col("ub"), col("tb")))

    val zDir = "target/etl/zorder_spec_z"
    ZOrder.writeZOrdered(keyed, "zkey", zDir, files = 8)
    val (zu, zt) = spanRatios(zDir)
    assert(zu <= 0.75 && zt <= 0.75, s"z-order ratios: $zu, $zt")

    // same data, sorted by time only: time clusters hard, user stays at
    // ~full span per file — exactly the layout z-order replaces
    val tDir = "target/etl/zorder_spec_t"
    ZOrder.writeZOrdered(keyed, "us", tDir, files = 8)
    val (tu, tt) = spanRatios(tDir)
    assert(tt <= 0.25, s"time-sort should cluster time tightly: $tt")
    assert(tu > 0.75, s"time-sort should NOT cluster user: $tu")
  }

  test("N-dim morton key: round-robin bit placement, exact") {
    // k=3, a=1 (bit 0 → pos 0), b=1 (bit 0 → pos 1), c=1 (bit 0 → pos 2)
    // ⇒ key = 0b111 = 7; (a=2,b=0,c=1) ⇒ a bit1→pos3, c bit0→pos2 ⇒ 12
    val k1 = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(ZOrder.mortonKeyN(Seq(col("a"), col("b"), col("c")), 16).as("z"))
      .head().getLong(0)
    assert(k1 === 7L)
    val k2 = Seq((2L, 0L, 1L)).toDF("a", "b", "c")
      .select(ZOrder.mortonKeyN(Seq(col("a"), col("b"), col("c")), 16).as("z"))
      .head().getLong(0)
    assert(k2 === 12L)
    // 2-dim N-key must equal the original pairwise key bit-for-bit
    val (p2, pN) = Seq((5L, 3L)).toDF("a", "b")
      .select(ZOrder.mortonKey(col("a"), col("b")).as("z2"),
        ZOrder.mortonKeyN(Seq(col("a"), col("b"))).as("zn"))
      .as[(Long, Long)].head()
    assert(p2 === pN)
    // bit-budget guard: 4 dims × 16 bits would overflow a long
    intercept[IllegalArgumentException] {
      ZOrder.mortonKeyN(Seq(col("a"), col("b"), col("a"), col("b")), 16)
    }
  }

  test("3-dim lake z-order clusters ALL THREE dimensions; the 2-dim " +
    "layout leaves the third wide") {
    import java.nio.file.{Files, Paths, Path => JPath}
    def fresh(n: String): String = {
      val p = Paths.get(s"target/etl/zorder3_spec/$n")
      if (Files.exists(p))
        Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
          .forEach(f => Files.deleteIfExists(f))
      p.toString
    }
    val ev = Tables.load(spark, TestSpark.sf, "events")
      .select("event_id", "user_id", "ts", "value")
    def ratios(dir: String): (Double, Double, Double) = {
      val back = LakeSnapshot.read(spark, dir)
        .withColumn("us", unix_micros(col("ts")))
      val g = back.agg(
        (max("user_id") - min("user_id")).as("gu"),
        (max("us") - min("us")).as("gt"),
        (max("event_id") - min("event_id")).as("ge")).head()
      val s = ZOrder.fileSpans(back, Seq("user_id", "us", "event_id"))
        .agg(count(lit(1)).as("nf"), sum("span_user_id").as("su"),
          sum("span_us").as("st"), sum("span_event_id").as("se")).head()
      (s.getLong(1).toDouble / (s.getLong(0) * g.getLong(0)),
        s.getLong(2).toDouble / (s.getLong(0) * g.getLong(1)),
        s.getLong(3).toDouble / (s.getLong(0) * g.getLong(2)))
    }
    val d3 = fresh("z3")
    LakeSnapshot.merge(spark, d3, ev, "event_id", "ts")
    LakeSnapshot.optimizeZOrderN(spark, d3,
      Seq(col("user_id"), unix_micros(col("ts")), col("event_id")),
      files = 16)
    val (u3, t3, e3) = ratios(d3)
    assert(u3 <= 0.85 && t3 <= 0.85 && e3 <= 0.85,
      s"3-dim z-order ratios: $u3, $t3, $e3")
    // the 2-dim layout over (user, time) leaves event_id unclustered —
    // the gap the third dimension exists to close (event_id at sf0.001
    // correlates only weakly with (user, time) cells)
    val d2 = fresh("z2")
    LakeSnapshot.merge(spark, d2, ev, "event_id", "ts")
    LakeSnapshot.optimizeZOrder(spark, d2,
      col("user_id"), unix_micros(col("ts")), files = 16)
    val (u2, t2, e2) = ratios(d2)
    assert(u2 <= 0.85 && t2 <= 0.85, s"2-dim baseline ratios: $u2, $t2")
    assert(e2 > e3, s"third dimension must tighten: 2-dim $e2 vs 3-dim $e3")
  }
}
