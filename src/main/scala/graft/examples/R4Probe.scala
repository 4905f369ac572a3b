package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev probe (round 4): dump llm_pii result + oracle SQL. */
object R4Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("llm_pii")(spark, sfDir)
    df.write.mode("overwrite").parquet("/tmp/probe_llm_pii")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/probe_llm_pii.sql"),
      graft.SparkEntry.oracleSql("llm_pii").getBytes("UTF-8"))
    println("rows = " + spark.read.parquet("/tmp/probe_llm_pii").count())
    spark.stop()
  }
}
