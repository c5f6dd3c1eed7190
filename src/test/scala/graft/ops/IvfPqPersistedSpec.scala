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

  test("RETRAIN-IN-PLACE (k3o): one base-raising commit swaps the " +
    "(codebooks, codes) pair; appends after encode with the new pair") {
    val dir = freshDir("retrain")
    val q = fixture(dir)
    val p = Similarity.IvfIndexPaths(dir)
    val goodBooks = spark.read.parquet(s"${p.codebooks}/epoch=0")
      .orderBy("m", "code").collect().toSeq
    // degrade: retrain to REVERSED seed slices, then retrain back
    val centroids = Seq(
      (0, unitVec(1).map(_.toDouble)), (1, unitVec(5).map(_.toDouble)))
      .toDF("list_id", "centroid")
    val seeds = centroids.select(col("list_id").as("code"), col("centroid"))
    val badSeeds = seeds.select(col("code"),
      reverse(col("centroid")).as("centroid"))
    Similarity.retrainIvfPqIndex(spark, dir)(df =>
      Similarity.pqBuild(df, "id", "v", badSeeds))
    val (e1, badRows) = {
      val rows = IncrementalDedup.Manifest.read(spark, p.params)
      val e = rows.map(_._1).max
      (e, spark.read.parquet(s"${p.codebooks}/epoch=$e")
        .orderBy("m", "code").collect().toSeq)
    }
    assert(badRows !== goodBooks, "the retrain must land NEW codebooks")
    // base raised: the old pair is unreachable in the same commit
    val base = IncrementalDedup.Manifest.read(spark, p.params)
      .map(_._2.getOrElse("base", "0").toInt).max
    assert(base === e1, "retrain must raise the base to its own epoch")
    // an append now encodes with the retrained codebooks
    Similarity.appendToIvfPqIndex(
      Seq((99L, unitVec(1))).toDF("id", "v"), "id", "v", dir, tag = "b1")
    // retrain BACK to the true seeds: probe results return to the
    // original pair's semantics over corpus+append
    Similarity.retrainIvfPqIndex(spark, dir)(df =>
      Similarity.pqBuild(df, "id", "v", seeds))
    Similarity.vacuumIvfIndex(spark, dir)
    val top = Similarity
      .ivfPqTopKPersisted(spark, dir, q, k = 3, nProbe = 2, rerank = 8)
      .collect().map(_.getLong(0))
    assert(top.contains(99L) || top.contains(1L),
      s"the e1-axis vectors must rank on an e1-axis query, got " +
        top.mkString(","))
    val booksNow = spark.read.parquet(p.codebooks)
      .where(col("epoch") === IncrementalDedup.Manifest
        .read(spark, p.params).map(_._1).max)
      .orderBy("m", "code").drop("epoch").collect().toSeq
    assert(booksNow === goodBooks,
      "retraining back to the true seeds must restore the exact books")
  }

  test("fused save (kernel provenance) == id-join save, surface by " +
    "surface (r20 — the saveIvfPqIndex id-join fusion)") {
    val corpus = (1L to 16L).map(i => (i, unitVec(i.toInt))).toDF("id", "v")
    val centroids = Seq(
      (0, unitVec(1).map(_.toDouble)), (1, unitVec(5).map(_.toDouble)))
      .toDF("list_id", "centroid")
    val seeds = centroids.select(col("list_id").as("code"), col("centroid"))
    val ivf = Similarity.ivfBuildFixed(corpus, "id", "v", centroids)
    val pq = Similarity.pqBuild(corpus, "id", "v", seeds, nSub = 8, dim = 64)
    assert(ivf.kernelFrom.isDefined && pq.kernelFrom.isDefined,
      "kernel builders must carry provenance markers")
    val fusedDir = freshDir("fused_save")
    val joinDir = freshDir("join_save")
    Similarity.saveIvfPqIndex(ivf, pq, fusedDir)
    // stripping the markers forces the pre-r20 id-join formulation
    Similarity.saveIvfPqIndex(
      ivf.copy(kernelFrom = None), pq.copy(kernelFrom = None), joinDir)
    for (surface <- Seq("assigned", "codes", "centroids", "codebooks")) {
      val a = spark.read.parquet(s"$fusedDir/$surface")
        .collect().map(_.toString).toSeq.sorted
      val b = spark.read.parquet(s"$joinDir/$surface")
        .collect().map(_.toString).toSeq.sorted
      assert(a === b, s"surface '$surface' must be identical")
    }
  }

  test("RETRAIN crash window: codebooks + codes written but NO manifest " +
    "row leaves every reader on the intact OLD pair") {
    val dir = freshDir("retrain_crash")
    val q = fixture(dir)
    val before = Similarity
      .ivfPqTopKPersisted(spark, dir, q, k = 8, nProbe = 2, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val p = Similarity.IvfIndexPaths(dir)
    // simulate the crash: epoch-1 vector/code/codebook dirs exist (with
    // GARBAGE codebooks) but no manifest row
    val centroids = Seq(
      (0, unitVec(1).map(_.toDouble)), (1, unitVec(5).map(_.toDouble)))
      .toDF("list_id", "centroid")
    val badSeeds = centroids.select(col("list_id").as("code"),
      reverse(col("centroid")).as("centroid"))
    val vectors = spark.read.parquet(s"${p.assigned}/epoch=0")
    vectors.write.parquet(s"${p.assigned}/epoch=1/list_id=0")
    Similarity.pqBuild(
      vectors.select("id", "v"), "id", "v", badSeeds).codebooks
      .write.parquet(s"${p.codebooks}/epoch=1")
    val after = Similarity
      .ivfPqTopKPersisted(spark, dir, q, k = 8, nProbe = 2, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(after === before,
      "a crashed retrain must be invisible: the old (codebooks, codes) " +
        "pair keeps serving byte-identically")
  }
}
