package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Dev probe: stage-by-stage timing of the MinHash LSH pipeline. */
object MinhashProbe {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
    val corpus = docs.unionByName(docs.where(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000)
      .withColumn("text", concat(col("text"), lit(" graft dup probe tail"))))

    timed("full minhashLshPairs")(
      Dedup.minhashLshPairs(corpus, threshold = 0.5).count())

    // stage decomposition (mirrors the operator internals)
    import graft.llm.TextAnalysis
    val toks = corpus.select(col("doc_id").as("id"),
      TextAnalysis.tokens(col("text")).as("toks"))
    timed("tokens only")(toks.agg(sum(size(col("toks")))).head())
    println("candidate pairs = " + timed("pairs only")(
      Dedup.minhashLshPairs(corpus, threshold = -1.0).count()))
    spark.stop()
  }
}
