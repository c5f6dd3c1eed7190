package graft

import org.apache.spark.sql.functions._

/** Ad-hoc: time q22's component aggregates at a given SF dir. */
object Q22Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = TestSpark.spark
    val li = Tables.load(spark, dir, "lineitem")
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("acd only") {
      li.agg(approx_count_distinct(col("l_orderkey"))).collect()
    }
    time("countDistinct only") {
      li.agg(countDistinct(col("l_orderkey"))).collect()
    }
    time("percentile_approx 10000") {
      li.agg(percentile_approx(col("l_quantity"), lit(0.5), lit(10000))).collect()
    }
    time("percentile_approx 1000") {
      li.agg(percentile_approx(col("l_quantity"), lit(0.5), lit(1000))).collect()
    }
    time("all three together") {
      li.agg(
        approx_count_distinct(col("l_orderkey")),
        countDistinct(col("l_orderkey")),
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000))).collect()
    }
  }
}
