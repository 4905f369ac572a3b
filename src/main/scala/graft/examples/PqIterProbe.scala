package graft.examples
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Similarity
object PqIterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val (m, k, rerank, nProbe, nCent) = (8, 5, 50, 4, 16)
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = e.where(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(q, e, k)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      def recall(df: DataFrame): Double = {
        val hits = df.select("query_id", "neighbor_id")
          .as[(Long, Long)].collect().toSet
        (hits intersect brute).size.toDouble / brute.size
      }
      val t0 = System.nanoTime()
      val cents = Similarity.lowestIdCentroids(e, nCent)
      val tr = Similarity.pqTrainedResidualCodebooks(e, m, 64, cents, nIter = 16)
      val r = recall(Similarity.ivfPqTopKFrom(q, e, k, cents, tr, nProbe, rerank, residuals = true))
      println(f"$dir ks=64 nIter=16 trained recall=$r%.3f  wall=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
