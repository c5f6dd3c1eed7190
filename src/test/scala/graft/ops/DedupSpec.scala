package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit + property coverage for the dedup family (SURVEY.md §5):
  * idempotence, shingle edges, LSH recall on planted duplicates, simhash
  * locality.
  */
class DedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("exactDedup is idempotent and keeps first by order") {
    val df = Seq(
      (1L, "same text", "a"), (2L, "same text", "b"), (3L, "other", "c")
    ).toDF("id", "text", "tag")
    val once = Dedup.exactDedup(df, Seq("text"), Seq("id"))
    val twice = Dedup.exactDedup(once, Seq("text"), Seq("id"))
    assert(once.count() == 2)
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
    assert(once.filter($"text" === "same text").head().getAs[Long]("id") == 1L)
  }

  test("shingles: distinct word n-grams; short docs yield empty set") {
    val df = Seq("a b c d", "a b", "x x x x x").toDF("text")
      .select(Dedup.shingles($"text", 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1) == Seq())       // shorter than one shingle
    assert(rows(2) == Seq("x x x")) // distinct collapses repeats
  }

  test("minhashPairs finds a planted near-duplicate and no false positive") {
    val long = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"w$i").mkString(" ") // drop last word
    val other = (100 to 130).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, long), (2L, nearDup), (3L, other)).toDF("id", "text")
    val pairs = Dedup.minhashPairs(df, "id", "text").collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("id_a") == 1L && pairs.head.getAs[Long]("id_b") == 2L)
    assert(pairs.head.getAs[Double]("jaccard") > 0.9)
  }

  test("minhash signature is deterministic across invocations") {
    val df = Seq((1L, "alpha beta gamma delta epsilon")).toDF("id", "text")
    def sig() = df.select(
      Dedup.minhashSignature(Dedup.shingleHashes($"text", 3), 16)).head().getSeq[Long](0)
    assert(sig() == sig())
  }

  test("simhash: identical texts share a signature, near texts stay close, " +
    "disjoint texts stay far") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 38).map(i => s"tok$i").mkString(" ") + " tokX tokY"
    val far = (200 to 240).map(i => s"far$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, far)).toDF("id", "text")
      .withColumn("sig", Dedup.simhashOf($"text"))
    val sigs = df.orderBy("id").collect().map(_.getAs[Long]("sig"))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sigs(0) == sigs(1))
    assert(ham(sigs(0), sigs(2)) <= 16, s"near doc drifted ${ham(sigs(0), sigs(2))} bits")
    assert(ham(sigs(0), sigs(3)) >= 20, s"far doc only ${ham(sigs(0), sigs(3))} bits away")
  }

  test("sign-LSH buckets: identical vectors always collide; cosinePairs " +
    "verifies with the codegen'd cosine") {
    val v1 = Seq.tabulate(64)(i => math.sin(i + 1).toFloat)
    val v2 = Seq.tabulate(64)(i => math.cos(i * 2 + 1).toFloat)
    val df = Seq((1L, v1), (2L, v1), (3L, v2)).toDF("id", "vec")
    val pairs = Similarity.cosinePairs(df, "id", "vec", threshold = 0.95)
      .collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("id_a") == 1L && pairs.head.getAs[Long]("id_b") == 2L)
    assert(pairs.head.getAs[Double]("cos") >= 0.999)
  }

  test("fingerprint dedup: J5 fingerprints equal distinct row count on events") {
    val ev = graft.Tables.load(spark, TestSpark.sf, "events")
    val viaHash = ev.select(Dedup.fingerprint(Seq(
      col("user_id"), col("event_type"), col("value"), col("props"))).as("f"))
      .distinct().count()
    val exact = ev.select("user_id", "event_type", "value", "props").distinct().count()
    assert(viaHash == exact)
  }
}
