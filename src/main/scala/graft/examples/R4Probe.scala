package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev probe (round 4): warm timings for the native-expression wins. */
object R4Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (q <- Seq("llm_minhash_md5", "llm_ann_lsh", "llm_embed_dup_lsh",
        "llm_winnow")) {
      val fn = graft.SparkEntry.queries(q)
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mat(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$q min-of-2 = $t%.2f s")
    }
    spark.stop()
  }
}
