package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark harness (BASELINE.md protocol).
  *
  * Fixes over round 1 (VERDICT.md "What's wrong" #2): each query is fully
  * materialized through the `noop` sink — a bare `.count()` let Catalyst
  * prune projections, window sums, and trailing sorts, so the old numbers
  * measured row-count scans. Protocol: 1 warm-up + 3 timed runs, median
  * reported. Query failures are printed to stderr and reported as -1, never
  * silently swallowed.
  *
  * Only batch queries (q*, k*) are benchmarked; streaming (s*) and pipeline
  * (p*) entries manage their own sinks/checkpoints and are correctness-only.
  */
object Bench {

  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    // Derby (pipeline suite) writes its log wherever the JVM starts; pin it
    // into target/ so the repo root stays clean (VERDICT.md r2 wrong #4).
    System.setProperty("derby.stream.error.file", "target/derby.log")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // bench the scale-safe plan, not the single-task window (q13)
      .config("spark.graft.rewriteGlobalTrailingWindow", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    // Exclude by SUITE MEMBERSHIP, not name prefix (ADVICE r2: a future
    // `simhash_*` query would silently vanish under startsWith("s")):
    // streaming + pipeline entries manage their own sinks/state and are
    // correctness-only. Excluded names are logged, never silent.
    val excluded = (graft.streaming.StreamQueries.declared ++
      graft.etl.PipelineQueries.declared).map(_._1).toSet
    // Optional args tail = local-iteration name filter (driver passes none);
    // unknown names fail loudly (same rationale as Verify — ADVICE r4).
    val only = args.toSet
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown query name(s) in filter: ${unknown.toSeq.sorted.mkString(", ")}")
    // Validate against the POST-exclusion set too (ADVICE r5): a filter of
    // only streaming/pipeline names passed the keyset check but benched
    // nothing — the exact silent no-op the unknown-name check exists to stop.
    val unbenchable = only.intersect(excluded)
    require(unbenchable.isEmpty,
      s"filter name(s) are streaming/pipeline entries, which are " +
        s"correctness-only and never benched: ${unbenchable.toSeq.sorted.mkString(", ")}")
    val benchable = SparkEntry.queries.toSeq
      .filter { case (name, _) => !excluded(name) && (only.isEmpty || only(name)) }
      .sortBy(_._1)
    System.err.println(
      s"[bench] excluded (streaming/pipeline suites): ${excluded.toSeq.sorted.mkString(", ")}")

    val results = benchable.map { case (name, fn) =>
      val timings =
        try {
          materialize(fn(spark, sfDir)) // warm-up (JIT + codegen cache)
          (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            materialize(fn(spark, sfDir))
            (System.nanoTime() - t0) / 1e9
          }.sorted
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            Seq.empty[Double]
        }
      val median = if (timings.isEmpty) -1.0 else timings(timings.size / 2)
      name -> median
    }

    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
