package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression lock (SURVEY.md §5 "plan" tier).
  *
  * Asserts the physical shapes the 100 TB design depends on: explicit
  * broadcasts stay broadcast, top-k plans as TakeOrderedAndProject (no global
  * sort), EXISTS/NOT EXISTS plan as semi/anti joins, and filters reach the
  * parquet scan as pushed filters.
  */
class PlanSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  /** Pre-AQE physical plan — shapes chosen by the planner, not runtime. */
  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.sparkPlan.toString
  }

  /** Run `body` with session confs set, restoring prior values after. */
  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    val prior = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed sort-merge join (OptimizeSkewedJoin fires)") {
    // SURVEY §4 keeps AQE's skew-join split as the built-in answer to
    // skewed JOINS (q35's manual salting covers skewed AGGREGATIONS, where
    // AQE has no rewrite — see ops/Skew.scala). This locks that the rewrite
    // actually fires on our session settings: a planted hot key (70% of
    // fact rows on user 0 — the mirrored-page/bot-user shape), thresholds
    // scaled to the toy partition sizes exactly the way production scales
    // them to real ones, and the executed adaptive plan must show the SMJ
    // with skew=true.
    import org.apache.spark.sql.functions._
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "512k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // payload must survive into the aggregate (else column pruning strips
      // it and the shuffled rows are too slim to trip the byte thresholds);
      // md5 hex keeps it incompressible enough that shuffle-write bytes —
      // what skew detection measures — reflect the planted imbalance.
      val fact = spark.range(300000).select(
        when(col("id") % 10 < 7, 0L).otherwise(col("id") % 997).as("user_id"),
        md5(col("id").cast("string")).as("payload"))
      val dim = spark.range(997).select(
        col("id").as("user_id"), (col("id") * 2).as("attr"))
      val joined = fact.join(dim, "user_id")
        .agg(count(lit(1)).as("n"), sum("attr").as("s"),
          sum(length(col("payload"))).as("plen"))
      val row = joined.collect()(0)
      assert(row.getLong(0) == 300000L, "every fact row has a dim match")
      val expected = fact
        .select(sum(col("user_id") * 2), sum(length(col("payload"))))
        .collect()(0)
      assert(row.getLong(1) == expected.getLong(0) &&
        row.getLong(2) == expected.getLong(1),
        "skew split must not change the result")
      val executed = joined.queryExecution.executedPlan.toString
      assert(executed.contains("skew=true"),
        s"expected OptimizeSkewedJoin's skew=true in the executed plan:\n$executed")
    }
  }

  test("q7 dims join as BroadcastHashJoin") {
    assert(plan("q7_broadcast_dims").contains("BroadcastHashJoin"))
  }

  test("q14 top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q14_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q5 EXISTS plans as LeftSemi") {
    assert(plan("q5_semi_join").contains("LeftSemi"))
  }

  test("q6 NOT EXISTS plans as LeftAnti, with the quantity filter pushed to the scan") {
    val p = plan("q6_anti_join")
    assert(p.contains("LeftAnti"))
    assert(p.contains("PushedFilters") && p.contains("l_quantity"))
  }

  test("q2 filter predicates reach the parquet scan") {
    val p = plan("q2_filter")
    assert(p.contains("PushedFilters"))
    assert(p.contains("o_totalprice"))
  }

  test("q20 cosine scan stays in whole-stage codegen") {
    val df = SparkEntry.queries("q20_cosine_topk")(spark, sf)
    df.collect() // finalize the AQE plan so codegen stages are visible
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("cosine_sim"))
    // whole-stage-codegen spans render as "*(n) " prefixes in toString
    assert(executed.contains("*(2) Project") || executed.contains("*(1) Project"),
      s"cosine Project not inside a codegen span:\n$executed")
  }

  test("q8 band join rides the user_id equi-key (sort-merge/hash, not nested loop)") {
    val p = plan("q8_band_self_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q1 aggregate is partial+final hash agg") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"))
  }

  test("q13b banded variant has NO single-partition window operator") {
    val p = plan("q13b_banded_window")
    assert(!p.contains("Window"), s"q13b must not plan a Window:\n$p")
    assert(p.contains("HashAggregate"))
  }

  test("q21 collect_set plans via ObjectHashAggregate (D2 sort-agg family)") {
    val p = plan("q21_asof_agg")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"))
  }

  test("q28 offset+limit plans without a full global sort materialization") {
    val p = plan("q28_offset")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q39 pure non-equi band join plans as BroadcastNestedLoopJoin (C6)") {
    val p = plan("q39_bnlj_bands")
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected BNLJ:\n$p")
  }

  test("q38 plans a FULL OUTER join (C3)") {
    assert(plan("q38_full_outer").contains("FullOuter"))
  }

  test("q37 preserves the outer side (right/left-after-swap) (C3)") {
    val p = plan("q37_right_outer")
    assert(p.contains("RightOuter") || p.contains("LeftOuter"), s"no outer join:\n$p")
  }

  test("q50 LATERAL decorrelates to an aggregate join, never a per-row re-scan") {
    val p = plan("q50_lateral_join")
    assert(p.contains("HashAggregate(keys=[l_orderkey"),
      s"lateral subquery not decorrelated into a keyed aggregate:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"lateral planned as a per-row loop:\n$p")
  }

  test("q51 recursive CTE executes as UnionLoop with a keyed join") {
    val p = plan("q51_recursive_cte")
    assert(p.contains("UnionLoop"), s"no UnionLoop in plan:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"calendar join is not keyed:\n$p")
  }

  test("q13 under the rewrite conf plans WITHOUT a Window operator (§4)") {
    graft.functions.GraftFunctions.register(spark)
    withConf("spark.graft.rewriteGlobalTrailingWindow" -> "true") {
      val p = SparkEntry.queries("q13_range_frame")(spark, sf)
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("Window"),
        s"rewrite did not fire on the declared q13:\n$p")
    }
  }

  test("p7 bucketed join runs with ZERO exchanges below the join (§4 layout)") {
    val (ot, lt) = graft.etl.PipelineQueries.p7BucketTables(spark, sf)
    // force the sort-merge path: a broadcast side would trivially have no
    // exchange and prove nothing about bucketing
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p = graft.etl.PipelineQueries.p7Join(spark, ot, lt)
        .queryExecution.sparkPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$p")
      assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
        s"scan not bucket-aware:\n$p")
    }
  }

  test("p8 star join prunes fact partitions DYNAMICALLY via the dim filter (§4 DPP)") {
    // write the layout once via the declared query, then lock the plan:
    // the fact scan's PartitionFilters must carry a dynamicpruning
    // subquery (the Monday set is only computable from the dim at runtime)
    graft.etl.PipelineQueries.p8(spark, sf).collect()
    val df = graft.etl.PipelineQueries.p8Join(
      spark, graft.etl.PipelineQueries.p8OutDir(sf))
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("dynamicpruning"),
      s"no dynamic partition pruning on the fact scan:\n$p")
    val pf = p.substring(p.indexOf("PartitionFilters"))
    assert(pf.contains("dynamicpruning"),
      s"dynamicpruning not inside PartitionFilters:\n$pf")
  }

  test("p6 read-back prunes partitions on the day filter (A8, §4 layout)") {
    // write once via the declared query, then lock the read plan shape
    graft.etl.PipelineQueries.p6(spark, sf).collect()
    val p = graft.etl.PipelineQueries.p6Read(spark, graft.etl.PipelineQueries.p6OutDir(sf))
      .queryExecution.sparkPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("day"),
      s"no partition pruning:\n$p")
    // the day bounds must appear inside PartitionFilters, not as a data filter
    val pf = p.substring(p.indexOf("PartitionFilters"))
    assert(pf.contains("2024-01-10") || pf.contains("19732"),
      s"day bound not in PartitionFilters:\n$pf")
  }
}
