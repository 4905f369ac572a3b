package graft.examples

import org.apache.spark.sql.{SparkSession, functions => F}
import graft.llm.Similarity
import graft.queries.LlmQueries

/** Measurement probe backing the llm_ann_pq suite floor and SCALE.md
  * record: PQ-ADC recall@5 against brute-force ground truth for the
  * registered query's exact parameters, at both fixture SFs. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val brute = Similarity.bruteForceTopK(
          e.where(F.col("vec_id") < 10), e, k = 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val pq = LlmQueries.annPq(spark, dir)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val recall = (pq intersect brute).size.toDouble / brute.size
      println(s"[pq] $sf recall@5 = $recall " +
        s"(${(pq intersect brute).size}/${brute.size})")
      val ivfpq = LlmQueries.annIvfPq(spark, dir)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val r2 = (ivfpq intersect brute).size.toDouble / brute.size
      println(s"[pq] $sf ivfpq recall@5 = $r2 " +
        s"(${(ivfpq intersect brute).size}/${brute.size})")
      val res = LlmQueries.annIvfPqRes(spark, dir)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val r3 = (res intersect brute).size.toDouble / brute.size
      println(s"[pq] $sf ivfadc(residual) recall@5 = $r3 " +
        s"(${(res intersect brute).size}/${brute.size})")
      // the codebook-size lever for the residual underfit: ks=64
      // sample residuals (production uses 256 k-means centroids)
      val cents = Similarity.lowestIdCentroids(e, nCentroids = 16)
      val res64 = Similarity.ivfPqTopKFrom(
        e.where(F.col("vec_id") < 10), e, k = 5, cents,
        Similarity.pqResidualCodebooks(e, m = 8, ks = 64, cents),
        nProbe = 4, rerank = 50, residuals = true)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val r4 = (res64 intersect brute).size.toDouble / brute.size
      println(s"[pq] $sf ivfadc ks=64 recall@5 = $r4 " +
        s"(${(res64 intersect brute).size}/${brute.size})")
    }
    spark.stop()
  }
}
