package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: StreamingLineDedup per-batch cost as the fingerprint
  * store grows — the sf0.1 boilerplate corpus in N doc-ordered
  * batches. The question at scale: does the per-batch anti-join stay
  * bounded by the BATCH (probe side) while the store only contributes
  * a scan? Usage: runMain graft.examples.StreamLineDedupProbe
  * [sfDir] [nBatches]
  */
object StreamLineDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files
      .createTempDirectory("graft-sldp").toString
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        concat(lit("begin shared preamble for source "),
          pmod(col("doc_id"), lit(20L)).cast("string"), lit(" end\n"),
          col("text"),
          lit("\nglobal footer boilerplate shared by every document"))
          .as("text"))
      .withColumn("b", pmod(col("doc_id"), lit(nBatches.toLong)))
      .localCheckpoint(true)
    val sld = graft.streaming.StreamingLineDedup(s"$root/store")
    var totalDocs = 0L
    (0 until nBatches).foreach { i =>
      val t0 = System.nanoTime()
      val out = sld.processBatch(
        d.where(col("b") === i).drop("b"), batchId = i.toLong)
      val n = out.count()
      totalDocs += n
      val storeRows = spark.read.parquet(s"$root/store").count()
      println(f"batch $i: ${(System.nanoTime() - t0) / 1e9}%5.2f s  " +
        f"$n%5d docs out, store=$storeRows%7d fps")
    }
    println(s"total docs: $totalDocs")
    spark.stop()
  }
}
