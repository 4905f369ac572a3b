package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev probe (round 4): dump llm_minhash_md5 result for oracle check. */
object R4Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/mh_md5_out")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.LlmQueries.minhashMd5(spark, sfDir)
    df.write.mode("overwrite").parquet(out)
    println("rows = " + spark.read.parquet(out).count())
    spark.stop()
  }
}

/** Prints the md5-minhash oracle SQL for manual DuckDB runs. */
object R4OracleDump {
  def main(args: Array[String]): Unit = {
    val p = java.nio.file.Paths.get(args.headOption
      .getOrElse("/tmp/mh_md5_oracle.sql"))
    java.nio.file.Files.write(p,
      graft.queries.LlmQueries.minhashMd5Sql.getBytes("UTF-8"))
    println("wrote " + p)
  }
}
