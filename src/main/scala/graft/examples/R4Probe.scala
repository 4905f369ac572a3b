package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev probe (round 4): dump new-query results + oracle SQL. */
object R4Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("llm_decontaminate", "llm_sample_mix")) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.write.mode("overwrite").parquet(s"/tmp/probe_$q")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"/tmp/probe_$q.sql"),
        graft.SparkEntry.oracleSql(q).getBytes("UTF-8"))
      println(s"$q rows = " + spark.read.parquet(s"/tmp/probe_$q").count())
    }
    spark.stop()
  }
}
