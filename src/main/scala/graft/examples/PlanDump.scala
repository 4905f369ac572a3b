package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of one registered query.
  * Usage: runMain graft.examples.PlanDump <name> [sfDir] [exec]
  * With `exec`, runs the query first so the printed AdaptiveSparkPlan
  * is the FINAL one (shows runtime decisions: ReusedExchange, AQE
  * join demotions) instead of the initial plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val exec = args.contains("exec")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    if (exec) df.collect() // same queryExecution → final adaptive plan
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
