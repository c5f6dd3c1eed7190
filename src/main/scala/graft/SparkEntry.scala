package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries/oracles are assembled from [[Queries]] (declared inventory Q1–Q24,
  * SURVEY.md §2.2); extension operators register additional entries here.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q3(spark, "/root/testdata/sf0.001")

  private def allDeclared =
    Queries.declared ++ CoverageQueries.declared ++
      graft.streaming.StreamQueries.declared ++
      graft.etl.PipelineQueries.declared ++ graft.ops.KQueries.declared ++
      graft.ops.EventQueries.declared

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDeclared.map { case (name, fn, _) => name -> fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDeclared.collect { case (name, _, Some(sql)) => name -> sql }.toMap
}
