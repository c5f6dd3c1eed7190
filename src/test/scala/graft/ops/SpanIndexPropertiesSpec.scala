package graft.ops

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property lock on the span-hash index: on random small corpora over a
  * tiny vocabulary (so repeated windows arise by chance within docs,
  * across docs, and across the corpus/batch boundary), the per-doc probe
  * stats against the built index must EQUAL the one-shot k33 computation
  * over corpus ∪ batch restricted to batch docs — a position is
  * duplicated iff its window recurs anywhere. This is the equivalence
  * k34's oracle checks once on real data, stress-tested here; window
  * length 3 keeps spans frequent at generator sizes. Also folds in a
  * random corpus SPLIT so build+append (any partition of the corpus)
  * equals the single build.
  */
object SpanIndexPropertiesSpec extends Properties("SpanIndex") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.TestSpark.spark

  private val vocab = Vector("a", "b", "c", "d")

  private val corpusGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(4, 12)
    docs <- Gen.listOfN(n, for {
      len <- Gen.chooseNum(0, 7)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
  } yield docs

  private val caseId = new AtomicLong()

  private def freshDir(): String = {
    val p = Paths.get(s"target/span_idx_prop/${caseId.incrementAndGet()}")
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  property("probe == one-shot restriction; build+append == build") =
    forAll(corpusGen, Gen.chooseNum(1, 3), Gen.chooseNum(0, 2)) {
      (texts, batchMod, splitMod) =>
        import spark.implicits._
        val n = 3
        val all = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val corpus = all.filter($"doc_id" % (batchMod + 1) =!= 0)
        val batch = all.filter($"doc_id" % (batchMod + 1) === 0)

        // reference: one-shot duplicated-position accounting over ALL docs
        val spans = SpanIndex.spanRows(all, "doc_id", "text", n)
        val cnt = spans.groupBy("h").agg(count(lit(1)).as("c"))
        val batchIds = batch.select($"doc_id".as("id"))
        val expected = spans.join(cnt, Seq("h"))
          .withColumnRenamed("id", "id")
          .join(batchIds, Seq("id"), "left_semi")
          .groupBy("id")
          .agg(count(lit(1)).as("n_spans"),
            sum(when($"c" > 1, 1L).otherwise(0L)).as("n_dup"))
          .as[(Long, Long, Long)].collect().toSet

        // incremental: corpus split into build + append halves
        val dir = freshDir()
        val buildHalf = corpus.filter($"doc_id" % 3 =!= splitMod)
        val appendHalf = corpus.filter($"doc_id" % 3 === splitMod)
        SpanIndex.buildSpanIndex(buildHalf, "doc_id", "text", dir, n = n)
        SpanIndex.appendToSpanIndex(appendHalf, "doc_id", "text", dir, n = n)
        val got = SpanIndex
          .probeSpanStats(spark, dir, batch, "doc_id", "text")
          .as[(Long, Long, Long)].collect().toSet
        got == expected
    }
}
