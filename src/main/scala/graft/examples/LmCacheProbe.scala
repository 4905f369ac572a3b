package graft.examples

import org.apache.spark.sql.SparkSession
import graft.llm.QualityModel

/** Round-13 record: materializing the single tagged-term LM count
  * table (eager localCheckpoint in lmCounts(materialize = true)) vs
  * recomputing it per consumer. Historical arms (same session,
  * sequential, sf0.1): trainScoreFused none ~9.7 s / persist ~7.9 s /
  * ckpt ~6.9 s; lmFeatures none 1.7 s / ckpt 2.2 s — so the fused
  * paths materialize and the single-evaluation paths stay lazy. This
  * probe re-measures the FINAL code's two shapes. */
object LmCacheProbe {
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
    t("warmup")(QualityModel.fit(corpus))
    (1 to 2).foreach { i =>
      t(s"lmFeatures lazy $i")(QualityModel.lmFeatures(corpus, corpus)
        .write.format("noop").mode("overwrite").save())
      t(s"trainScoreFused ckpt $i")(QualityModel.trainScoreFused(corpus)
        .write.format("noop").mode("overwrite").save())
      t(s"trainScore base $i")(QualityModel.trainScore(corpus)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
