package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** K3 scale path: ANN multi-probe recall measured against brute force. */
class SimilaritySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val emb = Tables.load(spark, TestSpark.sf, "embeddings")
  private lazy val corpus = emb.filter(col("vec_id") =!= 0)
  private lazy val query = emb.filter(col("vec_id") === 0)
    .select(col("embedding").as("qvec"))

  private def bruteTopK(k: Int): Seq[Long] =
    corpus.crossJoin(broadcast(query))
      .select(col("vec_id"),
        graft.functions.GraftFunctions.cosine_sim(col("embedding"), col("qvec"))
          .as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k).collect().map(_.getAs[Long]("vec_id")).toSeq

  private def freshDir(name: String): String = {
    import java.nio.file.{Files, Path, Paths}
    val p = Paths.get(s"target/cosine_idx/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  test("incremental cosine pairs == full-run restriction; append == rebuild; drifted params refused") {
    import org.apache.spark.sql.DataFrame
    def pairs(df: DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val vecs = emb.select(col("vec_id"), col("embedding"))
    val corpusV = vecs.filter(col("vec_id") % 5 =!= 0)
    val batch = vecs.filter(col("vec_id") % 5 === 0).unionAll(
      corpusV.select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
    val inBatch = (id: Long) => id % 5 == 0 || id >= 100000

    val dir = freshDir("equiv")
    Similarity.buildCosineIndex(corpusV, "vec_id", "embedding", dir)
    val inc = pairs(Similarity.incrementalCosinePairs(
      spark, dir, batch, "vec_id", "embedding", threshold = 0.95))
    val full = pairs(Similarity.cosinePairs(
      corpusV.unionAll(batch), "vec_id", "embedding", threshold = 0.95))
      .filter(p => inBatch(p._1) || inBatch(p._2))
    assert(inc == full)
    assert(inc.nonEmpty, "planted exact copies must pair")
    assert(inc.forall { case (a, b, _) => inBatch(a) || inBatch(b) })

    // append the batch, probe a third wave against the grown index, and
    // compare with a fresh rebuild over corpus+batch
    Similarity.appendToCosineIndex(batch, "vec_id", "embedding", dir)
    val batch3 = corpusV.limit(3)
      .select((col("vec_id") + 200000).as("vec_id"), col("embedding"))
    val viaAppend = pairs(Similarity.incrementalCosinePairs(
      spark, dir, batch3, "vec_id", "embedding", threshold = 0.95))
    val rebuilt = freshDir("rebuilt")
    Similarity.buildCosineIndex(
      corpusV.unionAll(batch), "vec_id", "embedding", rebuilt)
    val viaRebuild = pairs(Similarity.incrementalCosinePairs(
      spark, rebuilt, batch3, "vec_id", "embedding", threshold = 0.95))
    assert(viaAppend == viaRebuild)
    assert(viaAppend.nonEmpty, "third-wave copies must pair against the index")

    val e = intercept[IllegalArgumentException] {
      Similarity.incrementalCosinePairs(
        spark, dir, batch3, "vec_id", "embedding", threshold = 0.95, seed = 7L)
    }
    assert(e.getMessage.contains("mismatched hyperplanes"))
  }

  test("ANN finds a planted exact duplicate with recall 1") {
    val planted = corpus.select("vec_id", "embedding").union(
      query.select(lit(999999L).as("vec_id"), col("qvec").as("embedding")))
    val got = Similarity.annTopK(planted, "vec_id", "embedding", query, k = 1)
      .head()
    assert(got.getAs[Long]("id") == 999999L)
    assert(got.getAs[Double]("cos") >= 0.999)
  }

  test("ANN recall vs brute force on random data is nonzero and documented") {
    val k = 10
    val brute = bruteTopK(k).toSet
    val ann = Similarity.annTopK(corpus, "vec_id", "embedding", query, k)
      .collect().map(_.getAs[Long]("id")).toSet
    val recall = (brute & ann).size.toDouble / k
    info(s"ANN multi-probe recall@10 on random unit vectors: $recall")
    assert(recall >= 0.2,
      "multi-probe should recover at least the easy fraction of true neighbors")
  }

  test("IVF finds a planted exact duplicate with recall 1") {
    val planted = corpus.select("vec_id", "embedding").union(
      query.select(lit(999999L).as("vec_id"), col("qvec").as("embedding")))
    val got = Similarity.ivfTopK(planted, "vec_id", "embedding", query, k = 1)
      .head()
    assert(got.getAs[Long]("id") == 999999L)
    assert(got.getAs[Double]("cos") >= 0.999)
  }

  test("IVF recall vs brute force beats blind chance and is reported") {
    val k = 10
    val brute = bruteTopK(k).toSet
    val ivf = Similarity.ivfTopK(corpus, "vec_id", "embedding", query, k)
      .collect().map(_.getAs[Long]("id")).toSet
    val recall = (brute & ivf).size.toDouble / k
    info(s"IVF recall@10 (nProbe=4/16 lists) on random unit vectors: $recall")
    assert(recall >= 0.3)
  }

  test("ivfAdd assigns like the fitted quantizer and makes inserts findable") {
    val index = Similarity.ivfBuild(corpus, "vec_id", "embedding")
    // re-adding copies of existing vectors must land on their original lists
    val sample = corpus.limit(20)
      .select((col("vec_id") + 500000).as("vec_id"), col("embedding"))
    val grown = Similarity.ivfAdd(index, sample, "vec_id", "embedding")
    val lists = grown.assigned
      .select(col("id"), col("list_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    sample.collect().map(_.getLong(0)).foreach { id =>
      assert(lists(id) == lists(id - 500000),
        s"copy $id assigned list ${lists(id)} != original ${lists(id - 500000)}")
    }
    // a freshly-inserted exact duplicate of the query is findable at rank 1
    val planted = Similarity.ivfAdd(index,
      query.select(lit(999999L).as("vec_id"), col("qvec").as("embedding")),
      "vec_id", "embedding")
    val top = Similarity.ivfProbe(planted, query, k = 1).head()
    assert(top.getAs[Long]("id") == 999999L)
    assert(top.getAs[Double]("cos") >= 0.999)
  }

  test("ANN is deterministic across runs (seeded planes)") {
    def run() = Similarity.annTopK(corpus, "vec_id", "embedding", query, 10)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(run() == run())
  }
}
