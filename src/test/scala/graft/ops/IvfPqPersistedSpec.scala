package graft.ops

import java.nio.file.{Files, Path => JPath, Paths}

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k3l: the persisted IVFPQ index. The oracle (k3i's, shared verbatim)
  * hash-locks the VALUES; this spec pins the storage claims — the code
  * tier's partition-pruned read, the sidecar-before-manifest crash
  * ordering, and tagged redelivery.
  */
class IvfPqPersistedSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def unitVec(i: Int): Seq[Float] =
    (0 until 64).map(j => if (j == i % 64) 1.0f else 0.0f)

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/ivfpq_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def fixture(dir: String): org.apache.spark.sql.DataFrame = {
    val corpus = (1L to 8L).map(i => (i, unitVec(i.toInt))).toDF("id", "v")
    val centroids = Seq(
      (0, unitVec(1).map(_.toDouble)), (1, unitVec(5).map(_.toDouble)))
      .toDF("list_id", "centroid")
    val seeds = centroids.select(col("list_id").as("code"), col("centroid"))
    Similarity.saveIvfPqIndex(
      Similarity.ivfBuildFixed(corpus, "id", "v", centroids),
      Similarity.pqBuild(corpus, "id", "v", seeds, nSub = 8, dim = 64),
      dir)
    (0 until 64).map(j => if (j == 1) 1.0f else 0.0f)
      .toList.pipe(v => Seq(Tuple1(v)).toDF("qvec"))
  }

  private implicit class PipeOps[A](a: A) {
    def pipe[B](f: A => B): B = f(a)
  }

  test("the code-tier read is partition-pruned to the probed lists " +
    "(PartitionFilters on list_id, not scaladoc)") {
    val dir = freshDir("pruned")
    val q = fixture(dir)
    val plan = Similarity
      .ivfPqTopKPersisted(spark, dir, q, k = 3, nProbe = 1, rerank = 5)
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator
      .filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf.contains("list_id"), s"code scan must prune lists:\n$plan")
    assert(pf.contains("epoch"), s"epoch filter must prune too:\n$pf")
  }

  test("tagged redelivery: a re-appended batch is a no-op on BOTH the " +
    "vector and code tiers") {
    val dir = freshDir("redeliver")
    fixture(dir)
    val batch = Seq((99L, unitVec(2))).toDF("id", "v")
    Similarity.appendToIvfPqIndex(batch, "id", "v", dir, tag = "b1")
    Similarity.appendToIvfPqIndex(batch, "id", "v", dir, tag = "b1")
    assert(spark.read.parquet(s"$dir/assigned")
      .filter(col("id") === 99L).count() === 1L)
    assert(spark.read.parquet(s"$dir/codes")
      .filter(col("id") === 99L).count() === 1L)
  }

  test("compaction absorbs the PQ sidecar in the same base-raising " +
    "commit; post-vacuum probes still serve (the stranded-codes hazard)") {
    val dir = freshDir("lifecycle")
    val q = fixture(dir)
    Similarity.appendToIvfPqIndex(
      Seq((99L, unitVec(1))).toDF("id", "v"), "id", "v", dir, tag = "b1")
    val before = Similarity
      .ivfPqTopKPersisted(spark, dir, q, k = 8, nProbe = 2, rerank = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(before.exists(_._1 == 99L), "the appended row must serve")
    Similarity.compactIvfIndex(spark, dir)
    Similarity.vacuumIvfIndex(spark, dir)
    val after = Similarity
      .ivfPqTopKPersisted(spark, dir, q, k = 8, nProbe = 2, rerank = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(after === before,
      "compact+vacuum must not change what the IVFPQ probe serves")
    // the absorbed epochs' sidecar data is actually gone
    assert(!Files.exists(Paths.get(s"$dir/codes/epoch=0")))
    assert(!Files.exists(Paths.get(s"$dir/codebooks/epoch=0")))
  }

  test("a crashed append (codes written, manifest missing) stays " +
    "invisible to the probe") {
    val dir = freshDir("crash")
    val q = fixture(dir)
    val before = Similarity
      .ivfPqTopKPersisted(spark, dir, q, k = 8, nProbe = 2, rerank = 8)
      .collect().map(_.getLong(0)).toSet
    // simulate the crash: fabricate orphan epoch-1 data dirs with NO
    // manifest row (claim only) — exactly what a death between the data
    // writes and the commit leaves
    val batch = Seq((99L, unitVec(1))).toDF("id", "v")
    val p = Similarity.IvfIndexPaths(dir)
    val centroids = spark.read.parquet(s"${p.centroids}/epoch=0")
    val codebooks = spark.read.parquet(s"${p.codebooks}/epoch=0")
    batch.select(col("id"), col("v"), lit(0).as("list_id"))
      .write.parquet(s"${p.assigned}/epoch=1/list_id=0")
    batch.select(col("id"), lit(Array(0, 0, 0, 0, 0, 0, 0, 0)).as("codes"))
      .write.parquet(s"${p.codes}/epoch=1/list_id=0")
    val after = Similarity
      .ivfPqTopKPersisted(spark, dir, q, k = 8, nProbe = 2, rerank = 8)
      .collect().map(_.getLong(0)).toSet
    assert(after === before, "orphan epoch data must be invisible")
    assert(!after.contains(99L))
  }
}
