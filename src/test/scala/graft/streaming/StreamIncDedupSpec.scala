package graft.streaming

import java.nio.file.{Files, Paths}

import graft.TestSpark
import graft.ops.{Dedup, IncrementalDedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Gates for s14 (VERDICT r8 next-round #3): the streaming probe+append
  * loop over micro-batches must equal the one-shot batch probe — including
  * across a RESTART from checkpoint mid-sequence, the scenario the batch
  * k19 gate cannot see — and a redelivered micro-batch must be a no-op on
  * both the pair output and the index (the crash window between the index
  * commit and the stream's checkpoint commit).
  */
class StreamIncDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog tonight"
  private def corpusDf: DataFrame = Seq(
    (1L, base),
    (2L, base + " again"),
    (3L, "completely different words about spark query planning engines"),
    (4L, "benchmark rows for the held out decontamination suite check")
  ).toDF("doc_id", "text")

  // six streamed docs landed as three 2-doc files: near/exact dups of the
  // corpus, a cross-FILE exact dup (103 in file 2, 105 in file 3 — only
  // found if earlier batches were folded into the index), and novel text
  private val streamedFiles: Seq[Seq[(Long, String)]] = Seq(
    Seq((101L, base), (102L, base + " again tonight")),
    Seq((103L, "some entirely new document text landing mid stream"),
        (104L, "benchmark rows for the held out decontamination suite check")),
    Seq((105L, "some entirely new document text landing mid stream"),
        (106L, "novel final text matching nothing else at all anywhere"))
  )
  private def allStreamed: DataFrame =
    streamedFiles.flatten.toDF("doc_id", "text")

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/stream_inc/$name")
    StreamInput.deleteRecursively(p)
    p.toString
  }

  private def writeFile(dir: String, docs: Seq[(Long, String)], i: Int): Unit = {
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/f$i")
    // one flat file per arrival, ordered mtimes (the StreamInput contract)
    val part = Files.list(Paths.get(s"$dir/f$i")).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.startsWith("part-")).get
    val dst = Paths.get(s"$dir/arrival_$i.parquet")
    Files.move(part, dst)
    Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 1000L))
    StreamInput.deleteRecursively(Paths.get(s"$dir/f$i"))
  }

  private def runStream(inDir: String, idxDir: String, pairsDir: String,
      cpDir: String): Unit = {
    val in = spark.readStream
      .schema("doc_id long, text string")
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    val q = in.writeStream
      .foreachBatch(StreamQueries.dedupMicroBatch(idxDir, pairsDir) _)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", cpDir)
      .start()
    q.awaitTermination()
  }

  private def collectPairs(df: DataFrame): Set[(Long, Long, Double)] =
    df.select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet

  private def expected(threshold: Double): Set[(Long, Long, Double)] = {
    val streamedIds = streamedFiles.flatten.map(_._1).toSet
    collectPairs(Dedup.minhashPairs(
      corpusDf.unionAll(allStreamed), "doc_id", "text", threshold = threshold))
      .filter(p => streamedIds(p._1) || streamedIds(p._2))
  }

  test("restart from checkpoint mid-sequence: union of probes == one-shot batch probe") {
    val inDir = freshDir("restart_in")
    val idxDir = freshDir("restart_idx")
    val pairsDir = freshDir("restart_pairs")
    val cpDir = freshDir("restart_cp")
    Files.createDirectories(Paths.get(inDir))
    IncrementalDedup.buildIndex(corpusDf, "doc_id", "text", idxDir)

    // run 1: only the first two arrivals exist; the query drains and stops
    writeFile(inDir, streamedFiles(0), 0)
    writeFile(inDir, streamedFiles(1), 1)
    runStream(inDir, idxDir, pairsDir, cpDir)
    val mid = collectPairs(spark.read.parquet(pairsDir))
    assert(mid.contains((1L, 101L, 1.0)), "run 1 must probe its own files")
    assert(!mid.exists(p => p._1 == 105L || p._2 == 105L),
      "file 3 not yet arrived")

    // the third arrival lands while the stream is DOWN; a new query on the
    // SAME checkpoint resumes mid-sequence and processes ONLY file 3
    writeFile(inDir, streamedFiles(2), 2)
    runStream(inDir, idxDir, pairsDir, cpDir)
    val fin = collectPairs(spark.read.parquet(pairsDir))
    assert(fin == expected(0.8), s"restart result diverged: $fin")
    // the cross-restart pair: 105 (run 2) == 103 (run 1) exactly — only
    // found because run 1's append survived in the index across the restart
    assert(fin.contains((103L, 105L, 1.0)),
      "pair spanning the restart boundary must be found")
    assert(fin.contains((4L, 104L, 1.0)), "corpus pair from run 1")
    assert(!fin.exists(p => p._1 == 106L || p._2 == 106L), "novel text pairs nothing")
  }

  test("redelivered micro-batch is a no-op: tagged append + overwrite-by-batch-id") {
    val idxDir = freshDir("redeliver_idx")
    val pairsDir = freshDir("redeliver_pairs")
    IncrementalDedup.buildIndex(corpusDf, "doc_id", "text", idxDir)
    val b0 = streamedFiles(0).toDF("doc_id", "text")
    StreamQueries.dedupMicroBatch(idxDir, pairsDir)(b0, 0L)
    val members1 = spark.read.parquet(s"$idxDir/members").count()
    val rows1 = spark.read.parquet(pairsDir).count()
    val pairs1 = collectPairs(spark.read.parquet(pairsDir))
    // the crash window: the batch is delivered AGAIN with the same id
    StreamQueries.dedupMicroBatch(idxDir, pairsDir)(b0, 0L)
    assert(spark.read.parquet(s"$idxDir/members").count() == members1,
      "redelivered append must not fold members in twice")
    assert(spark.read.parquet(pairsDir).count() == rows1 &&
      collectPairs(spark.read.parquet(pairsDir)) == pairs1,
      "redelivered batch must overwrite, not append, its pair output")
    // and a LATER batch still sees exactly one copy of batch 0's docs:
    // 102 (batch 0, appended once) pairs 101... via the corpus; the row-level
    // read catches a double-emission that the Set view would collapse
    val b1 = streamedFiles(1).toDF("doc_id", "text")
    StreamQueries.dedupMicroBatch(idxDir, pairsDir)(b1, 1L)
    val rows = spark.read.parquet(pairsDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(rows.count(_ == ((4L, 104L))) == 1,
      "a pair must be emitted exactly once across the whole run")
  }

  test("s15 vector loop: redelivered micro-batch is a no-op; cross-batch pair via index") {
    import graft.ops.Similarity
    val idxDir = freshDir("vec_redeliver_idx")
    val pairsDir = freshDir("vec_redeliver_pairs")
    def unit(k: Int): Seq[Float] =
      Seq.tabulate(64)(i => if (i == k) 1.0f else 0.0f)
    val corpus = Seq((1L, unit(0)), (2L, unit(1)), (3L, unit(2)))
      .toDF("vec_id", "embedding")
    Similarity.buildCosineIndex(corpus, "vec_id", "embedding", idxDir)
    val b0 = Seq((101L, unit(0)), (102L, unit(7))).toDF("vec_id", "embedding")
    StreamQueries.vecDedupMicroBatch(idxDir, pairsDir)(b0, 0L)
    def pairRows() = spark.read.parquet(pairsDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    val first = pairRows()
    assert(first.contains((1L, 101L)), "exact copy vs corpus found")
    val vecs1 = spark.read.parquet(s"$idxDir/vectors").count()
    // the crash window: same batch id delivered again
    StreamQueries.vecDedupMicroBatch(idxDir, pairsDir)(b0, 0L)
    assert(spark.read.parquet(s"$idxDir/vectors").count() == vecs1,
      "redelivered append must not fold vectors in twice")
    assert(pairRows() == first,
      "redelivered batch must overwrite, not append, its pair output")
    // a later batch pairs against batch 0's vectors THROUGH the index —
    // only possible because the append survived, and exactly once
    val b1 = Seq((201L, unit(7))).toDF("vec_id", "embedding")
    StreamQueries.vecDedupMicroBatch(idxDir, pairsDir)(b1, 1L)
    val rows = pairRows()
    assert(rows.count(_ == ((102L, 201L))) == 1,
      "cross-micro-batch vector pair found exactly once")
  }

  test("s18 span loop: restart resumes ingest; streamed index == one-shot") {
    import graft.ops.SpanIndex
    def doc(pfx: String, n: Int) = (1 to n).map(i => s"$pfx$i").mkString(" ")
    val corpusDocs = Seq((1L, doc("w", 10)), (2L, doc("z", 10)))
    val inDir = freshDir("span_in")
    val idxDir = freshDir("span_idx")
    val cpDir = freshDir("span_cp")
    Files.createDirectories(Paths.get(inDir))
    SpanIndex.buildSpanIndex(
      corpusDocs.take(0).toDF("doc_id", "text"), "doc_id", "text", idxDir)

    def runIngest(): Unit = {
      val in = spark.readStream
        .schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir)
      val q = in.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          SpanIndex.appendToSpanIndex(
            b, "doc_id", "text", idxDir, tag = s"b$id")
          ()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", cpDir)
        .start()
      q.awaitTermination()
    }

    val batch = Seq((11L, doc("w", 8)), (12L, doc("z", 8)))
      .toDF("doc_id", "text")
    def dups(): Map[Long, Long] =
      SpanIndex.probeSpanStats(spark, idxDir, batch, "doc_id", "text")
        .select("id", "n_dup").as[(Long, Long)].collect().toMap

    // run 1: only doc 1 has arrived — the probe sees w-spans, not z-spans
    writeFile(inDir, corpusDocs.take(1), 0)
    runIngest()
    assert(dups() === Map(11L -> 1L, 12L -> 0L))
    // doc 2 lands while the stream is DOWN; resume on the SAME checkpoint
    writeFile(inDir, corpusDocs.drop(1), 1)
    runIngest()
    assert(dups() === Map(11L -> 1L, 12L -> 1L))
    // streamed index == one-shot build over the full corpus
    val oneShot = freshDir("span_oneshot")
    SpanIndex.buildSpanIndex(
      corpusDocs.toDF("doc_id", "text"), "doc_id", "text", oneShot)
    assert(dups() === SpanIndex
      .probeSpanStats(spark, oneShot, batch, "doc_id", "text")
      .select("id", "n_dup").as[(Long, Long)].collect().toMap)
  }
}
