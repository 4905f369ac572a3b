package graft.examples

import org.apache.spark.sql.{SparkSession, functions => F}
import graft.llm.QualityModel

/** Cost decomposition of llm_quality_model_lm (the round-10 bench's
  * most expensive query): fit fill vs scoring vs LM feature lineage. */
object FuseCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[cost] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    t("warmup base fit")(QualityModel.fit(corpus))
    val m = t("fitFused")(QualityModel.fitFused(corpus))
    t("scoreWithFused")(QualityModel.scoreWithFused(corpus, corpus, m)
      .write.format("noop").mode("overwrite").save())
    t("lmFeatures only")(QualityModel.lmFeatures(corpus, corpus)
      .write.format("noop").mode("overwrite").save())
    t("base featurize only")(QualityModel.featurize(corpus)
      .write.format("noop").mode("overwrite").save())
    t("full trainScoreFused")(QualityModel.trainScoreFused(corpus)
      .write.format("noop").mode("overwrite").save())
    t("full trainScore (base)")(QualityModel.trainScore(corpus)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
