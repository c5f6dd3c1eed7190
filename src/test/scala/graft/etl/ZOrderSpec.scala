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
}
