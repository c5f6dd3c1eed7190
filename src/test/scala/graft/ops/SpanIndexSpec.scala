package graft.ops

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k34/k35: the persisted span-hash index. The oracle pins incremental ==
  * one-shot on the fixture; this spec pins the protocol pieces on hand
  * data — probe arms, physical pruning, tag redelivery, append==rebuild,
  * orphan invisibility, drift refusal.
  */
class SpanIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  private val corpus = Seq(
    (1L, toks("w", 10)), // windows [w1..w8] [w2..w9] [w3..w10]
    (2L, toks("z", 10)))
    .toDF("doc_id", "text")
  private val batch = Seq(
    (11L, toks("w", 8) + " x1 x2"), // first window == c1's first → cross dup
    (12L, toks("u", 9)),            // all fresh
    (13L, toks("d", 9)),            // byte-identical pair with 14:
    (14L, toks("d", 9)),            //   every window dups within-batch
    (15L, "s1 s2 s3"))              // < 8 tokens: no spans, no stats row
    .toDF("doc_id", "text")

  private def freshDir(name: String): String = {
    import java.nio.file.{Files, Path, Paths}
    val p = Paths.get(s"target/span_idx_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    p.toString
  }

  private def stats(dir: String, excludeTag: String = ""): Map[Long, (Long, Long)] =
    SpanIndex.probeSpanStats(spark, dir, batch, "doc_id", "text", excludeTag)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("probe arms: index existence, within-batch recurrence, short docs absent") {
    val dir = freshDir("arms")
    SpanIndex.buildSpanIndex(corpus, "doc_id", "text", dir)
    assert(stats(dir) === Map(
      11L -> ((3L, 1L)), 12L -> ((2L, 0L)),
      13L -> ((2L, 2L)), 14L -> ((2L, 2L))))
  }

  test("probe scan is pb-pruned and epoch-bounded (PartitionFilters)") {
    val dir = freshDir("pruned")
    SpanIndex.buildSpanIndex(corpus, "doc_id", "text", dir)
    val plan = SpanIndex.probeSpanStats(spark, dir, batch, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    val pf = plan.substring(plan.indexOf("PartitionFilters"))
    assert(pf.contains("pb#") && (pf.contains(" IN ") || pf.contains("INSET")),
      s"pb IN (...) not under PartitionFilters:\n$pf")
    assert(pf.contains("epoch#"), s"epoch bound not in PartitionFilters:\n$pf")
  }

  test("epoch write: dedup and pb file layout share ONE Exchange " +
    "(r20 — the distinct's hash(h) shuffle is fused into the pb one)") {
    val rows = SpanIndex.epochRows(
      SpanIndex.spanRows(corpus, "doc_id", "text", 8).select("h"),
      pbuckets = 64)
    val plan = rows.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1,
      s"span epoch write must carry exactly one Exchange:\n$plan")
    // and the fused form is still DISTINCT on h
    val hs = rows.select("h").collect().map(_.getLong(0)).toSeq
    assert(hs.distinct.size === hs.size)
    assert(hs.toSet === SpanIndex
      .spanRows(corpus, "doc_id", "text", 8)
      .select("h").distinct().collect().map(_.getLong(0)).toSet)
  }

  test("append == rebuild; tagged redelivery no-ops; absorbed tag fails loud") {
    val all = freshDir("all"); val inc = freshDir("inc")
    SpanIndex.buildSpanIndex(corpus, "doc_id", "text", all)
    SpanIndex.buildSpanIndex(
      corpus.filter(col("doc_id") === 1L), "doc_id", "text", inc)
    SpanIndex.appendToSpanIndex(
      corpus.filter(col("doc_id") === 2L), "doc_id", "text", inc, tag = "b1")
    assert(stats(all) === stats(inc))
    // excludeTag reproduces the pre-append (first-delivery) view
    val pre = freshDir("pre")
    SpanIndex.buildSpanIndex(
      corpus.filter(col("doc_id") === 1L), "doc_id", "text", pre)
    assert(stats(inc, excludeTag = "b1") === stats(pre))
    // redelivered append with the same tag is a committed no-op
    val before = new java.io.File(s"$inc/params").list().toSet
    SpanIndex.appendToSpanIndex(
      corpus.filter(col("doc_id") === 2L), "doc_id", "text", inc, tag = "b1")
    assert(new java.io.File(s"$inc/params").list().toSet === before)
    // compaction absorbs the tagged epoch: post-compaction probe equals the
    // full view, and the excluded-tag first-delivery view fails LOUDLY
    SpanIndex.compactSpanIndex(spark, inc)
    SpanIndex.vacuumSpanIndex(spark, inc)
    assert(stats(inc) === stats(all))
    intercept[IllegalArgumentException](stats(inc, excludeTag = "b1"))
  }

  test("uncommitted (orphan) epoch data is invisible to probes") {
    val dir = freshDir("orphan")
    SpanIndex.buildSpanIndex(corpus, "doc_id", "text", dir)
    val clean = stats(dir)
    // land data under an epoch with NO manifest row — a crashed appender.
    // Poison it with the batch's own fresh hashes: if the probe read it,
    // doc 12's spans would flip to duplicated.
    SpanIndex.spanRows(batch, "doc_id", "text", 8).select("h").distinct()
      .withColumn("pb", pmod(col("h"), lit(64)).cast("int"))
      .write.partitionBy("pb").mode("overwrite")
      .parquet(s"$dir/spans/epoch=7")
    assert(stats(dir) === clean)
  }

  test("drifted window length refused") {
    val dir = freshDir("drift")
    SpanIndex.buildSpanIndex(corpus, "doc_id", "text", dir, n = 8)
    intercept[IllegalArgumentException](
      SpanIndex.appendToSpanIndex(batch, "doc_id", "text", dir, n = 5))
  }
}
