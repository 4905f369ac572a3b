package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev tool: dump one registered query's result parquet + oracle SQL
  * for manual DuckDB comparison. Usage: R4Probe <query> [sfDir] [out] */
object R4Probe {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("llm_chunk")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val out = args.lift(2).getOrElse(s"/tmp/probe_$q")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(q)(spark, sfDir)
    df.write.mode("overwrite").parquet(out)
    graft.SparkEntry.oracleSql.get(q).foreach { sql =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$out.sql"), sql.getBytes("UTF-8"))
    }
    println("rows = " + spark.read.parquet(out).count())
    spark.stop()
  }
}
