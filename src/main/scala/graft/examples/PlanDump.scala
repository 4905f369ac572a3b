package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of one registered query.
  * Usage: runMain graft.examples.PlanDump <name> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
