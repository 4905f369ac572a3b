package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: 10× scale-up behavior of the LSH dedup operators at
  * CONSTANT duplicate density (perturbed replicas — naive replication
  * measures duplicate-group explosion, not scaling). */
object Scale10Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llm.Similarity

    def embsX(k: Int) = {
      val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>")
          .as("embedding"))
      (0 until k).map { i =>
        base.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
          .withColumn("embedding",
            zip_with(col("embedding"),
              sequence(lit(0), size(col("embedding")) - 1),
              (x, d) => x + lit(0.4) *
                (pmod(xxhash64(d, col("vec_id"), lit(i)), lit(200))
                  / 100.0 - 1.0)))
      }.reduce(_ unionAll _)
        .repartition(spark.sparkContext.defaultParallelism)
    }
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    // sf0.1 registered-query corpus: pair count must stay 400
    timed("sf0.1 embedDupLsh")(
      graft.queries.LlmQueries.embedDupLsh(spark, sfDir).count())
    val e = embsX(10).localCheckpoint(true)
    println(s"--- scale 10x: ${e.count()} vectors")
    timed("10x embed_dup_lsh (prefilter)")(
      Similarity.cosineDupPairsLsh(e, threshold = 0.999).count())
    timed("10x embed prefilter + maxBucket=2000")(
      Similarity.cosineDupPairsLsh(e, threshold = 0.999,
        maxBucket = 2000).count())
    spark.stop()
  }
}
