package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: 10× scale-up of the corpus-composition operators
  * (capPerKey, tokenBudget) with the Scale10Probe replica scheme.
  * Replicas keep their source value, so the 10× corpus has the SAME
  * 20 sources with 10× the docs each — the per-key cap's reducer-side
  * work is what's being probed (WindowGroupLimit must bound it), and
  * the token-budget windows see 10× rows per (stratum, shard). */
object MixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llm.{Sampling, TextAnalysis}

    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($r)")
    }
    def docsX(k: Int) = {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text", "lang", "source", "n_chars")
      (0 until k).map { i =>
        base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          translate(col("text"), "aeiou", s"$i$i$i$i$i").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionAll _)
        .repartition(spark.sparkContext.defaultParallelism)
    }
    def run(d: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      timed(s"$tag capPerKey(source, 10)")(
        Sampling.capPerKey(d.select("doc_id", "source", "n_chars"),
          "source", 10, Seq(col("n_chars").desc, col("doc_id").asc))
          .count())
      timed(s"$tag tokenBudget")(
        Sampling.tokenBudget(
          d.select(col("doc_id"), col("lang"),
            TextAnalysis.tokenCount(col("text")).as("n_tokens")),
          "lang", Map("en" -> 5000L, "de" -> 2000L, "fr" -> 2000L),
          defaultBudget = 1000L).count())
    }
    val d1 = docsX(1).localCheckpoint(true)
    println(s"--- base: ${d1.count()} docs")
    run(d1, "warmup"); run(d1, "sf0.1")
    val d10 = docsX(10).localCheckpoint(true)
    println(s"--- scale 10x: ${d10.count()} docs")
    run(d10, "10x")
    spark.stop()
  }
}
