package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Dev probe: recall@5 of the PQ family with SAMPLE-SLICED vs
  * LLOYD-TRAINED codebooks, both SFs — the evidence behind
  * `llm_ann_ivfpq_res_t`'s registered parameters and suite floor
  * (SCALE.md round-12 record). */
object PqTrainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val (m, k, rerank, nProbe, nCent) = (8, 5, 50, 4, 16)
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1").foreach { dir =>
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = e.where(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(q, e, k)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      def recall(df: DataFrame): Double = {
        val hits = df.select("query_id", "neighbor_id")
          .as[(Long, Long)].collect().toSet
        (hits intersect brute).size.toDouble / brute.size
      }
      val cents = Similarity.lowestIdCentroids(e, nCent)
      Seq(16, 64).foreach { ks =>
        val sampRaw = Similarity.pqCodebooks(e, m, ks)
        val trainRaw = Similarity.pqTrainedCodebooks(e, m, ks)
        val sampRes = Similarity.pqResidualCodebooks(e, m, ks, cents)
        val trainRes = Similarity.pqTrainedResidualCodebooks(e, m, ks, cents)
        val rPqS = recall(Similarity.pqTopKFrom(q, e, k, sampRaw, rerank))
        val rPqT = recall(Similarity.pqTopKFrom(q, e, k, trainRaw, rerank))
        val rResS = recall(Similarity.ivfPqTopKFrom(q, e, k, cents,
          sampRes, nProbe, rerank, residuals = true))
        val rResT = recall(Similarity.ivfPqTopKFrom(q, e, k, cents,
          trainRes, nProbe, rerank, residuals = true))
        println(f"$dir ks=$ks%2d  pq: sample=$rPqS%.3f trained=$rPqT%.3f" +
          f"  ivfadc: sample=$rResS%.3f trained=$rResT%.3f")
      }
    }
    spark.stop()
  }
}
