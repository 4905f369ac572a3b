package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev probe for the r8-verdict `llm_embed_dup_lsh` regression: times
  * registered queries EXACTLY the way Bench does (noop-sink
  * materialization of every output column, cache cleared between
  * passes, 4 MB splits, loadavg recorded) — QueryTime's count() prunes
  * the exact-cosine `sim` column, so it under-measures this family.
  * Usage: runMain graft.examples.EmbedLshProbe [sfDir] [reps] [name...]
  */
object EmbedLshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("llm_embed_dup_lsh", "llm_embed_dup_lsh_md5")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def loadavg(): String =
      scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)
    // same warmup Bench runs: flagship entry through the noop sink
    graft.SparkEntry.entry(spark)
      .write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      (1 to reps).foreach { i =>
        val la = loadavg()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        println(f"[$i] $name: $dt%.2f s (loadavg_start=$la)")
      }
    }
    spark.stop()
  }
}
