package graft.ops

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import java.util.concurrent.atomic.AtomicLong

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property lock on the round-8 incremental near-dedup: on random small
  * corpora drawn from a tiny vocabulary — so exact duplicates, cross-batch
  * duplicates, and natural near-duplicates all arise by chance — a probe
  * against the built index must emit EXACTLY the pairs a full corpus+batch
  * [[Dedup.minhashPairs]] run emits for pairs with ≥ 1 batch endpoint.
  * This is the equivalence k19's oracle checks once on real data, here
  * stress-tested across generated corpora (the side-local expansion and
  * exact-dup-straddling-the-boundary logic is where the bugs would live).
  * Spark jobs + parquet round-trips per case, so the case count is modest.
  */
object IncrementalDedupPropertiesSpec extends Properties("IncrementalDedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.TestSpark.spark

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta")

  // docs of 0–8 words over an 8-word vocab: short docs (no shingles),
  // repeated texts, and high-Jaccard neighbours all occur naturally
  private val corpusGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(4, 16)
    docs <- Gen.listOfN(n, for {
      len <- Gen.chooseNum(0, 8)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
  } yield docs

  private val caseId = new AtomicLong()

  private def freshDir(): String = {
    val p = Paths.get(s"target/inc_dedup_prop/${caseId.incrementAndGet()}")
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  property("incremental probe == full-run restriction on random corpora") =
    forAll(corpusGen, Gen.chooseNum(1, 3)) { (texts, batchMod) =>
      import spark.implicits._
      val all = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // deterministic split: every (batchMod+1)-th doc is the new batch
      val isBatch = (id: Long) => id % (batchMod + 1) == 0
      val corpus = all.filter($"doc_id" % (batchMod + 1) =!= 0)
      val batch = all.filter($"doc_id" % (batchMod + 1) === 0)

      val dir = freshDir()
      IncrementalDedup.buildIndex(corpus, "doc_id", "text", dir,
        shingleSize = 2, numHashes = 16, bands = 8)
      val inc = IncrementalDedup.incrementalPairs(
          spark, dir, batch, "doc_id", "text",
          shingleSize = 2, numHashes = 16, bands = 8, threshold = 0.5)
        .as[(Long, Long, Double)].collect().toSet
      val full = Dedup.minhashPairs(all, "doc_id", "text",
          shingleSize = 2, numHashes = 16, bands = 8, threshold = 0.5)
        .as[(Long, Long, Double)].collect().toSet
        .filter(p => isBatch(p._1) || isBatch(p._2))
      inc == full
    }
}
