package graft

/** Ad-hoc plan inspection helper: `sbt "Test/runMain graft.PlanDump <name>"`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q20_cosine_topk")
    val df = SparkEntry.queries(name)(TestSpark.spark, TestSpark.sf)
    df.collect()
    println("==== executedPlan ====")
    println(df.queryExecution.executedPlan.toString)
  }
}
