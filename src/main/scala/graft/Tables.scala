package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Testdata table access (TESTDATA.md:13-15, FIXTURES.md §A).
  *
  * Fixed schemas come from the parquet footers; no inference in production
  * paths (SURVEY.md §1.2). Dimension tables small enough to broadcast at any
  * scale factor are listed in [[broadcastable]] — query builders wrap them in
  * `broadcast()` so the plan stays a broadcast hash join at 100 TB fact-table
  * scale as long as dims stay dim-sized.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dims bounded by the data model, not the scale factor. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) (rounds 1-8)
    * and TIMESTAMP(MICROS) (round 9+ fixture regen). Spark's vectorized
    * reader rejects NANOS unless `nanosAsLong` maps it to LONG, so the conf
    * is set unconditionally (it only affects NANOS-annotated columns; µs
    * columns still read as TIMESTAMP) and the post-read dtype decides
    * whether a nanos→µs truncation is needed. The fixture's ts gaps are
    * minute-scale, so truncation never lands within 1 µs of a comparison
    * boundary — oracle parity holds either way (verified round 1).
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Read non-adjusted (NTZ-annotated) µs/ms timestamps as TimestampType
    // AT THE SCAN rather than casting after: under the pinned UTC session
    // the values are identical, but a post-scan cast would sit between ts
    // predicates and the parquet reader and block pushdown — at 100 TB the
    // difference between pruning row groups on a time filter and reading
    // them all.
    // BLAST RADIUS (ADVICE r10): this conf is SESSION-WIDE — every later
    // parquet read in the same session also reads NTZ-annotated columns as
    // LTZ (orders.o_orderdate and lineitem.l_shipdate are µs-NTZ too).
    // That is safe here only because the session timezone is pinned to
    // UTC, where NTZ and LTZ carry bit-identical µs-since-epoch values;
    // TablesSchemaDriftSpec locks that value-identity for both affected
    // tables under each conf state. A caller embedding graft in a session
    // that reads its own NTZ parquet under a non-UTC timezone should scope
    // events reads to a dedicated session (`spark.newSession()`).
    if (spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true") != "false")
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val df = raw.schema("ts").dataType match {
      case LongType => // ns-annotated data surfaced as nanos-since-epoch
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case _ => // NTZ fallback (a scan cached before the conf flip):
        // value-identical LTZ cast under the pinned UTC session
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Register every table as a temp view for SQL-formulated queries. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Exact max of an integral column served from the parquet FOOTERS —
    * zero Spark jobs, driver-side metadata reads only (guide §6: verify
    * pushdown/stats instead of scanning). The fixture-guard `require`s
    * (14 sites: "planted ids must not collide with real ones") each ran a
    * full-column `agg(max(id))` scan job per query build; at sf0.1 that
    * was ~0.2 s per entry per bench run for the documents table. Footer
    * min/max for INT64/INT32 columns is exact, so the guard's semantics
    * are unchanged; returns None (callers fall back to the scan) when any
    * file's stats are missing/unusable or the column is absent — stats
    * remain an optimization, never a correctness input.
    */
  def footerMaxLong(
      spark: SparkSession, dir: String, name: String,
      column: String): Option[Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val dataFiles =
      (if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
       else Seq(fs.getFileStatus(p)))
        .map(_.getPath)
        .filter { f =>
          val n = f.getName
          !n.startsWith("_") && !n.startsWith(".")
        }
    // a non-hidden data file WITHOUT a .parquet name (extension-less part
    // files a Spark scan would still read) means the footer max could
    // under-report — force the exact scan fallback instead of weakening
    // the guard exactly in the drift case it exists for (ADVICE r19)
    if (dataFiles.exists(!_.getName.endsWith(".parquet"))) return None
    val files = dataFiles
    if (files.isEmpty) return None
    val maxes = files.map { f =>
      graft.etl.FileStats.footerStat(f.toString, conf).cols.get(column) match {
        case Some(st) if st.family == "l" => Some(st.lmx)
        case Some(st) if st.family == "n" => None // all-null: no max
        case _ => return None // absent/unusable in some file: fall back
      }
    }
    maxes.flatten.maxOption
  }
}
