package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-iteration timing of the connected-components loop. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val pairs = timed("pairs")(
      graft.llm.Dedup.ngramJaccardPairs(
        graft.queries.LlmQueries.docsWithNearDups(spark, sfDir),
        threshold = 0.5, maxDf = 1000000).localCheckpoint(true))
    println("n pairs = " + pairs.count())
    // mirror dedupClusters' loop with per-iteration timing
    val edges = timed("edges ckpt")(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .localCheckpoint(true))
    def repSum(df: org.apache.spark.sql.DataFrame) = Option(
      df.agg(sum(col("rep").cast("decimal(38,0)"))).head().getDecimal(0))
      .getOrElse(java.math.BigDecimal.ZERO)
    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), first(col("src"))).as("rep"))
      .localCheckpoint(false)
    var prev = timed("init+sum")(repSum(labels))
    var converged = false
    var iter = 0
    while (!converged && iter < 20) {
      val candidate = edges.join(labels, edges("src") === labels("id"))
        .groupBy(col("dst").as("cid")).agg(min(col("rep")).as("nrep"))
      val jump = labels.select(col("id").as("jid"), col("rep").as("jrep"))
      labels = labels
        .join(candidate, labels("id") === candidate("cid"), "left")
        .join(jump, labels("rep") === col("jid"), "left")
        .select(col("id"), least(col("rep"),
          coalesce(col("nrep"), col("rep")),
          coalesce(col("jrep"), col("rep"))).as("rep"))
        .localCheckpoint(false)
      val cur = timed(s"iter $iter")(repSum(labels))
      converged = cur.compareTo(prev) == 0
      prev = cur
      iter += 1
    }
    println(s"iterations = $iter")
    spark.stop()
  }
}
