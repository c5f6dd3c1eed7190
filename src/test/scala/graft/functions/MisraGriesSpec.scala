package graft.functions

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries sketch: exactness when k covers the vocabulary, the
  * presence + underestimate guarantees on skewed streams regardless of
  * partitioning, bounded size, and serde round-trip through a real
  * shuffle (partial aggregation forces serialize/deserialize/merge).
  */
class MisraGriesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def sketch(terms: Seq[String], k: Int, parts: Int): Seq[(String, Long)] =
    terms.toDF("t").repartition(parts)
      .agg(GraftFunctions.mg_topk(col("t"), k).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.est"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("k >= vocabulary: counts are exact in any partitioning") {
    val data = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c")
    for (parts <- Seq(1, 3, 7)) {
      val s = sketch(scala.util.Random.shuffle(data), 8, parts).toMap
      assert(s == Map("a" -> 30L, "b" -> 20L, "c" -> 10L), s"parts=$parts: $s")
    }
  }

  test("guarantees hold on a skewed stream under any partitioning") {
    // 2 heavy terms + 200 distinct light terms; n = 1000, k = 10 → n/k = 100
    val heavy = Seq.fill(400)("hh1") ++ Seq.fill(300)("hh2")
    val light = (1 to 300).map(i => s"t${i % 200}")
    val data = scala.util.Random.shuffle(heavy ++ light)
    val n = data.size
    val k = 10
    for (parts <- Seq(1, 4, 13)) {
      val s = sketch(data, k, parts)
      assert(s.size <= k)
      val m = s.toMap
      // presence: true count > n/k ⇒ in sketch
      assert(m.contains("hh1") && m.contains("hh2"), s"parts=$parts: $m")
      // underestimate by at most n/k, never overestimate
      assert(m("hh1") <= 400 && m("hh1") >= 400 - n / k)
      assert(m("hh2") <= 300 && m("hh2") >= 300 - n / k)
    }
  }

  test("eval output is sorted by est desc then term asc") {
    val s = sketch(Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(9)("z"), 8, 2)
    assert(s == s.sortBy { case (t, c) => (-c, t) })
  }

  test("nulls are skipped") {
    val df = Seq(Some("x"), None, Some("x"), None).toDF("t")
      .agg(GraftFunctions.mg_topk(col("t"), 4).as("sk"))
      .select(explode(col("sk")).as("e")).select(col("e.term"), col("e.est"))
    assert(df.collect().toSeq == Seq(Row("x", 2L)))
  }
}
