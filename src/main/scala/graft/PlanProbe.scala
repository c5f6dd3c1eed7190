import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p52 = graft.ops.EventQueries.q52(spark, "/root/testdata/sf0.001").queryExecution.sparkPlan.toString
    println("q52 exchanges: " + "Exchange".r.findAllIn(p52).length)
    println(p52.take(1800))
    spark.stop()
  }
}
