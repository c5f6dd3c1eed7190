package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession per test JVM (Test/fork := true → one per `sbt test`). */
object TestSpark {
  lazy val spark: SparkSession = {
    System.setProperty("derby.stream.error.file", "target/derby.log")
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/warehouse")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Smoke-tier scale factor (SURVEY.md §5 t1). */
  val sf: String = "/root/testdata/sf0.001"
}
