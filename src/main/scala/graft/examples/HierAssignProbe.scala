package graft.examples

import org.apache.spark.sql.{SparkSession, functions => F}
import graft.llm.Similarity

/** Measurement probe for the two-level quantizer assignment: flat vs
  * hierarchical agreement rate at the fixture SFs and centroid counts,
  * backing the LlmSuite floor. */
object HierAssignProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.1")) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
        .select(F.col("vec_id"), F.col("embedding").cast("array<double>").as("v"))
      val n = e.count()
      for (k <- Seq(16, 64, 160) if n >= k) {
        val cents = Similarity.lowestIdCentroids(e, k, vecCol = "v")
        val nc = math.max(1, math.round(math.sqrt(k.toDouble)).toInt)
        for (p <- Seq(1, 2, 3, 4) if p <= nc) {
          val agg = e.select(
              Similarity.flatAssignFn(cents)(F.col("v")).as("f"),
              Similarity.hierarchicalAssignFn(cents, nc, p)(F.col("v")).as("h"))
            .select(F.sum(F.when(F.col("f") === F.col("h"), 1L).otherwise(0L)),
              F.count(F.lit(1)))
            .head()
          println(s"[hier] $sf k=$k nCoarse=$nc P=$p agree=${agg.getLong(0)}/" +
            s"${agg.getLong(1)} (${agg.getLong(0).toDouble / agg.getLong(1)})")
        }
      }
    }
    spark.stop()
  }
}
