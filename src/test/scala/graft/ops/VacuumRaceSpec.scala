package graft.ops

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reader-vs-vacuum race closure (VERDICT r10 #2), all three persisted
  * indexes. The race: a probe reads the manifest's live epoch set and
  * lists files at PLAN time; a concurrent compact+vacuum that deletes
  * absorbed epoch data mid-scan would crash the probe on missing files.
  * The fix is a vacuum retention gate ([[IncrementalDedup.Manifest
  * .vacuumEligible]]): absorbed data is only deleted once the
  * base-raising commit is at least `retainMs` old. Each test stages the
  * exact race — probe planned, THEN compact, THEN vacuum — and proves:
  *   (a) under retention, vacuum is a no-op and the pre-compaction probe
  *       COMPLETES on the intact view with the expected result;
  *   (b) with retention elapsed (retainMs = 0), data is deleted, a fresh
  *       probe over the compacted view is correct, and the stale
  *       pre-compaction plan fails LOUDLY — never a silent wrong answer.
  */
class VacuumRaceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val Retain = 3600L * 1000L // "one hour": no test outlives this

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/vacuum_race/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def exists(path: String): Boolean = Files.exists(Paths.get(path))

  // --- text (MinHash) index ------------------------------------------------

  private val base = "the quick brown fox jumps over the lazy dog tonight"

  test("text index: probe planned before compact survives a retained vacuum") {
    val dir = freshDir("text")
    IncrementalDedup.buildIndex(Seq(
      (1L, base),
      (2L, base + " again"),
      (3L, "completely different words about spark query planning engines")
    ).toDF("doc_id", "text"), "doc_id", "text", dir)
    IncrementalDedup.appendToIndex(Seq(
      (101L, base + " maybe")
    ).toDF("doc_id", "text"), "doc_id", "text", dir)
    val batch = Seq((201L, base + " again")).toDF("doc_id", "text")
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // plan the probe against the PRE-compaction manifest + file listing
    val staleProbe = IncrementalDedup.incrementalPairs(
      spark, dir, batch, "doc_id", "text", threshold = 0.5)
    val expected = pairs(IncrementalDedup.incrementalPairs(
      spark, dir, batch, "doc_id", "text", threshold = 0.5))
    assert(expected.nonEmpty)

    IncrementalDedup.compactIndex(spark, dir)
    IncrementalDedup.vacuumIndex(spark, dir, retainMs = Retain)
    assert(exists(s"$dir/shingles/epoch=0"),
      "retained vacuum must not delete freshly absorbed epoch data")
    assert(pairs(staleProbe) == expected,
      "pre-compaction probe must complete on the intact view under retention")

    IncrementalDedup.vacuumIndex(spark, dir) // retention elapsed (0)
    assert(!exists(s"$dir/shingles/epoch=0"), "vacuum deletes after retention")
    assert(pairs(IncrementalDedup.incrementalPairs(
      spark, dir, batch, "doc_id", "text", threshold = 0.5)) == expected,
      "fresh probe over the compacted view unchanged")
    // the stale plan now references deleted files: loud failure, not a
    // silent partial result
    assertThrows[Exception] { staleProbe.collect() }
  }

  // --- sign-LSH cosine (vector) index --------------------------------------

  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(8)(r.nextGaussian().toFloat)
  }

  test("cosine index: probe planned before compact survives a retained vacuum") {
    val dir = freshDir("cosine")
    val corpus = (1 to 20).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    Similarity.buildCosineIndex(
      corpus, "vec_id", "embedding", dir, bits = 4, dim = 8)
    Similarity.appendToCosineIndex(
      Seq((101L, vec(1))).toDF("vec_id", "embedding"), "vec_id", "embedding",
      dir, bits = 4, dim = 8)
    val batch = Seq((201L, vec(1))).toDF("vec_id", "embedding")
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    def probe() = Similarity.incrementalCosinePairs(
      spark, dir, batch, "vec_id", "embedding", threshold = 0.95,
      bits = 4, dim = 8)
    val staleProbe = probe()
    val expected = pairs(probe())
    assert(expected.contains((1L, 201L)) && expected.contains((101L, 201L)),
      "planted exact dups must pair before staging the race")

    Similarity.compactCosineIndex(spark, dir)
    Similarity.vacuumCosineIndex(spark, dir, retainMs = Retain)
    assert(exists(s"$dir/vectors/epoch=0"),
      "retained vacuum must not delete freshly absorbed epoch data")
    assert(pairs(staleProbe) == expected,
      "pre-compaction probe must complete on the intact view under retention")

    Similarity.vacuumCosineIndex(spark, dir)
    assert(!exists(s"$dir/vectors/epoch=0"), "vacuum deletes after retention")
    assert(pairs(probe()) == expected)
    assertThrows[Exception] { staleProbe.collect() }
  }

  // --- persisted IVF index -------------------------------------------------

  test("IVF index: probe planned before compact survives a retained vacuum") {
    val dir = freshDir("ivf")
    val corpus = (1 to 20).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val centroids = Seq(
      (1, vec(1).map(_.toDouble).toSeq),
      (2, vec(2).map(_.toDouble).toSeq)).toDF("list_id", "centroid")
    Similarity.saveIvfIndex(
      Similarity.ivfBuildFixed(corpus, "vec_id", "embedding", centroids), dir)
    Similarity.appendToIvfIndex(
      Seq((101L, vec(1))).toDF("vec_id", "embedding"), "vec_id", "embedding", dir)
    val q = Seq(Tuple1(vec(1))).toDF("qvec")
    def top(df: DataFrame): Seq[(Long, Double)] =
      df.select("id", "cos").as[(Long, Double)].collect().toSeq
    val staleProbe = Similarity.ivfProbePersisted(spark, dir, q, k = 5, nProbe = 2)
    val expected = top(Similarity.ivfProbePersisted(spark, dir, q, k = 5, nProbe = 2))
    assert(expected.nonEmpty && expected.head._1 == 1L,
      "the probe's own vector must rank first before staging the race")

    Similarity.compactIvfIndex(spark, dir)
    Similarity.vacuumIvfIndex(spark, dir, retainMs = Retain)
    assert(exists(s"$dir/assigned/epoch=0"),
      "retained vacuum must not delete freshly absorbed epoch data")
    assert(top(staleProbe) == expected,
      "pre-compaction probe must complete on the intact view under retention")

    Similarity.vacuumIvfIndex(spark, dir)
    assert(!exists(s"$dir/assigned/epoch=0"), "vacuum deletes after retention")
    assert(top(Similarity.ivfProbePersisted(
      spark, dir, q, k = 5, nProbe = 2)) == expected)
    assertThrows[Exception] { staleProbe.collect() }
  }

  // --- IVFPQ sidecar (r12: the composed tier's codes ride the same race) ---

  test("IVFPQ: probe planned before compact survives a retained vacuum " +
    "on BOTH the vector and code tiers") {
    val dir = freshDir("ivfpq")
    val corpus = (1 to 20).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val centroids = Seq(
      (1, vec(1).map(_.toDouble).toSeq),
      (2, vec(2).map(_.toDouble).toSeq)).toDF("list_id", "centroid")
    val seeds = centroids.select(
      (col("list_id") - 1).cast("int").as("code"), col("centroid"))
    Similarity.saveIvfPqIndex(
      Similarity.ivfBuildFixed(corpus, "vec_id", "embedding", centroids),
      Similarity.pqBuild(corpus, "vec_id", "embedding", seeds,
        nSub = 4, dim = 8),
      dir)
    Similarity.appendToIvfPqIndex(
      Seq((101L, vec(1))).toDF("vec_id", "embedding"), "vec_id", "embedding",
      dir, tag = "b1")
    val q = Seq(Tuple1(vec(1))).toDF("qvec")
    def top(df: DataFrame): Seq[(Long, Double)] =
      df.select("id", "cos").as[(Long, Double)].collect().toSeq
    val staleProbe = Similarity.ivfPqTopKPersisted(
      spark, dir, q, k = 5, nProbe = 2, rerank = 10)
    val expected = top(Similarity.ivfPqTopKPersisted(
      spark, dir, q, k = 5, nProbe = 2, rerank = 10))
    assert(expected.nonEmpty && expected.head._1 == 1L,
      "the probe's own vector must rank first before staging the race")

    Similarity.compactIvfIndex(spark, dir)
    Similarity.vacuumIvfIndex(spark, dir, retainMs = Retain)
    assert(exists(s"$dir/codes/epoch=0"),
      "retained vacuum must keep freshly absorbed sidecar data")
    assert(top(staleProbe) == expected,
      "pre-compaction probe must complete on the intact view under retention")

    Similarity.vacuumIvfIndex(spark, dir)
    assert(!exists(s"$dir/codes/epoch=0") && !exists(s"$dir/assigned/epoch=0"),
      "vacuum deletes both tiers after retention")
    assert(top(Similarity.ivfPqTopKPersisted(
      spark, dir, q, k = 5, nProbe = 2, rerank = 10)) == expected)
    assertThrows[Exception] { staleProbe.collect() }
  }

  // --- span-hash index (the fourth kind, r11) ------------------------------

  test("span index: probe planned before compact survives a retained vacuum") {
    val dir = freshDir("span")
    def doc(pfx: String, n: Int) = (1 to n).map(i => s"$pfx$i").mkString(" ")
    SpanIndex.buildSpanIndex(
      Seq((1L, doc("w", 10))).toDF("doc_id", "text"), "doc_id", "text", dir)
    SpanIndex.appendToSpanIndex(
      Seq((2L, doc("z", 10))).toDF("doc_id", "text"), "doc_id", "text", dir)
    val batch = Seq((11L, doc("w", 8)), (12L, doc("u", 8)))
      .toDF("doc_id", "text")
    def stats(df: DataFrame): Map[Long, Long] =
      df.select("id", "n_dup").as[(Long, Long)].collect().toMap
    val staleProbe = SpanIndex.probeSpanStats(
      spark, dir, batch, "doc_id", "text")
    val expected = stats(SpanIndex.probeSpanStats(
      spark, dir, batch, "doc_id", "text"))
    assert(expected === Map(11L -> 1L, 12L -> 0L))

    SpanIndex.compactSpanIndex(spark, dir)
    SpanIndex.vacuumSpanIndex(spark, dir, retainMs = Retain)
    assert(exists(s"$dir/spans/epoch=0"),
      "retained vacuum must not delete freshly absorbed epoch data")
    assert(stats(staleProbe) === expected,
      "pre-compaction probe must complete on the intact view under retention")

    SpanIndex.vacuumSpanIndex(spark, dir)
    assert(!exists(s"$dir/spans/epoch=0"), "vacuum deletes after retention")
    assert(stats(SpanIndex.probeSpanStats(
      spark, dir, batch, "doc_id", "text")) === expected)
    assertThrows[Exception] { staleProbe.collect() }
  }
}
