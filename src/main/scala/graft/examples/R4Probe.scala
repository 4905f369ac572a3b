package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev probe (round 4): pair counts + runtime plan shape for the two
  * LSH dedup queries after the shuffle-join verify rework. */
object R4Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def shape(name: String, mk: => org.apache.spark.sql.DataFrame): Unit = {
      val df = mk
      println(name + " pairs = " + timed(name + " cold")(df.count()))
      println(name + " warm = " + timed(name + " warm")(mk.count()))
      val p = df.queryExecution.executedPlan.toString
      val stages = "ShuffleQueryStage [0-9]+".r.findAllIn(p).toSeq
      println(s"$name stages: total=${stages.length} " +
        s"distinct=${stages.distinct.length} ids=${stages.mkString(",")}")
    }
    shape("minhash_lsh", graft.queries.LlmQueries.minhashLsh(spark, sfDir))
    shape("embed_dup_lsh", graft.queries.LlmQueries.embedDupLsh(spark, sfDir))
    spark.stop()
  }
}
