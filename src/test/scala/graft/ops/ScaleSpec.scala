package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB design rules, demonstrated instead of asserted (SURVEY.md §4):
  * salted aggregation for skewed keys, partition pruning on a date-laid-out
  * table, and shuffle-free co-located joins on bucketed tables.
  */
class ScaleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("salted aggregation equals plain aggregation (skew mitigation)") {
    val ev = Tables.load(spark, sf, "events")
    val salted = Skew.saltedStats(ev, Seq("user_id"), "value", saltBuckets = 8)
      .orderBy("user_id").collect()
    val plain = ev.groupBy("user_id")
      .agg(sum("value").as("sum"), count(lit(1)).as("count"),
        min("value").as("min"), max("value").as("max"))
      .orderBy("user_id").collect()
    assert(salted.length == plain.length)
    salted.zip(plain).foreach { case (s, p) =>
      assert(s.getAs[Long]("user_id") == p.getAs[Long]("user_id"))
      assert(s.getAs[Long]("count") == p.getAs[Long]("count"))
      assert(math.abs(s.getAs[Double]("sum") - p.getAs[Double]("sum")) < 1e-6)
      assert(s.getAs[Double]("min") == p.getAs[Double]("min"))
      assert(s.getAs[Double]("max") == p.getAs[Double]("max"))
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    import spark.implicits._
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of the left side lands on key 0 → one shuffle partition dwarfs
      // the 2KB advisory/threshold sizes; AQE must split it at runtime
      val left = spark.range(60000)
        .select(
          when($"id" < 54000, 0L).otherwise($"id").as("k"),
          $"id".as("v"), lit("x" * 200).as("pad"))
      val right = spark.range(100).select($"id".as("k"), lit(1).as("w"))
      // global agg, NOT groupBy("k"): a downstream stage that reuses the
      // join's hash partitioning forbids the skew split (Spark refuses to
      // break the partitioning guarantee); a partial-aggregable global
      // count leaves AQE free to split
      val j = left.join(right, "k").agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("salted aggregation plans two keyed aggregate phases") {
    val ev = Tables.load(spark, sf, "events")
    val p = Skew.saltedStats(ev, Seq("user_id"), "value", 8)
      .queryExecution.sparkPlan.toString
    assert(p.contains("_salt"))
    // partial on (key, salt), final on key — both hash aggregates present
    assert("HashAggregate".r.findAllIn(p).length >= 2)
  }

  test("date-partitioned layout prunes partitions at the scan") {
    val dir = "target/scale/events_by_day"
    val ev = Tables.load(spark, sf, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("day").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("day") === "2024-01-01")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"))
    // and the pruned read returns exactly that day's rows
    val expected = ev.filter(col("day") === "2024-01-01").count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    // §4: Spark injects a bloom filter built from the selective build side
    // into the probe side's scan — rows that cannot join die at the scan
    // instead of crossing the shuffle. Default thresholds target real
    // clusters (10 GB probe scans); lower them to demonstrate at sf.
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val hot = Tables.load(spark, sf, "orders")
        .filter(col("o_totalprice") > 400000) // selective build side
      val li = Tables.load(spark, sf, "lineitem")
      val j = li.join(hot, col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      assert(j.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("k31 bloom decon: build is order-independent, corpus pass is " +
    "join-and-shuffle-free, membership is one-sided") {
    import graft.functions.GraftFunctions
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), Dedup.shingleHashes(col("text"), 3).as("s"))
      .filter(size(col("s")) > 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)
      .select(explode(col("s")).as("h")).distinct()
    def build(df: org.apache.spark.sql.DataFrame): Array[Byte] = df
      .agg(GraftFunctions.bloom_filter_agg(col("h"), 65536L, 1L << 21).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    // commutative OR-merge ⇒ the bytes can't depend on partitioning
    val bf = build(bench)
    assert(java.util.Arrays.equals(bf, build(bench.repartition(13))))
    // the corpus flag pass must be map-only: no join, no exchange — this is
    // the entire point of the bloom tier vs k17's exploded-shingle shuffle
    val flagged = docs.filter(col("doc_id") % 50 =!= 0).select(
      col("doc_id"),
      exists(col("s"),
        h => GraftFunctions.bloom_might_contain(lit(bf), h)).as("bl"))
    val plan = flagged.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
    // one-sided error: every doc sharing a shingle with the held-out set
    // must be flagged (false positives allowed, false negatives never)
    val exact = docs.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), explode(col("s")).as("h"))
      .join(bench, Seq("h"), "left_semi").select("doc_id").distinct()
    val missed = exact.join(flagged.filter(!col("bl")), Seq("doc_id"), "left_semi")
    assert(missed.count() === 0)
    assert(exact.count() > 0, "fixture must have at least one true overlap")
  }

  test("parquet aggregate pushdown: min/max/count answered from footer " +
    "stats, no row scan") {
    // §4: a bare MIN/MAX/COUNT over a parquet table needs no row data —
    // every footer already carries the answer. Spark's DSv2 parquet reader
    // pushes the aggregate into the scan (PushedAggregation) when the
    // query has no row-level filter; at 100 TB that turns a full-table
    // audit query into a metadata read. Parquet rides the V1 path by
    // default, so the demonstration opts this read into V2.
    val keys = Seq(
      "spark.sql.parquet.aggregatePushdown" -> "true",
      "spark.sql.sources.useV1SourceList" -> "")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val agg = spark.read.parquet(s"$sf/lineitem.parquet")
        .agg(min("l_orderkey").as("mn"), max("l_orderkey").as("mx"),
          count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [MIN(l_orderkey), " +
        "MAX(l_orderkey), COUNT(*)]"), plan)
      // and the footer answer equals the row-scan answer
      val viaRows = Tables.load(spark, sf, "lineitem")
        .agg(min("l_orderkey"), max("l_orderkey"), count(lit(1))).head()
      assert(agg.head() === viaRows)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("p14 range enrichment plans WITHOUT a non-equi join: predecessor " +
    "kernel + broadcast equi-join, never BNLJ") {
    // the naive ip-BETWEEN-range formulation plans a BroadcastNestedLoop
    // join (rows × ranges comparisons); the predecessor-kernel shape must
    // keep the search inside a codegen'd map stage
    val plan = graft.etl.PipelineQueries.p14(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("array_predecessor"), plan)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog forgets tables between JVMs but their files
    // persist in the warehouse dir — clear them or the re-create fails
    Seq("b_orders", "b_lineitem").foreach(t =>
      graft.streaming.StreamInput.deleteRecursively(
        java.nio.file.Paths.get(s"target/warehouse/$t")))
    Tables.load(spark, sf, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("b_orders")
    Tables.load(spark, sf, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("b_lineitem")

    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
    val plan = joined.queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == Tables.load(spark, sf, "lineitem").count())
  }
}
