package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: StreamingNearDup per-batch cost as the store grows —
  * the 10× discipline for the one O(history) term a cross-batch
  * near-dup stream cannot avoid: every batch's candidate join probes
  * the WHOLE band store (an LSH index lookup is selective in ROWS
  * returned, but without physical indexing the scan is O(store)).
  *
  * The probe folds fixed-size batches (fixture docs re-id'd per
  * epoch so every id is unique) and reports wall per batch at store
  * sizes 0..N, then compacts (snapshot SORTED by the probe keys) and
  * folds more — the question is the growth SLOPE, and how much the
  * sorted snapshot + Spark's runtime join filters claw back. At
  * cluster scale the store becomes a table bucketed by
  * (band, band_key) — the join then co-locates without shuffling
  * the store; this probe records the single-node baseline that
  * motivates it.
  *
  * Usage: runMain graft.examples.NearDupStreamProbe [nBatches] [sfDir]
  */
object NearDupStreamProbe {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").localCheckpoint(true)
    val perBatch = docs.count()
    val root = java.nio.file.Files
      .createTempDirectory("graft-sndprobe").toString
    val snd = graft.streaming.StreamingNearDup(s"$root/store",
      threshold = 0.5)

    def batchOf(epoch: Int) = docs
      .withColumn("doc_id", col("doc_id") + lit(epoch.toLong * 10000000L))

    def fold(epoch: Int, label: String): Unit = {
      val t0 = System.nanoTime()
      val n = snd.processBatch(batchOf(epoch)).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[$label] batch $epoch%2d store=${epoch * perBatch}%8d " +
        f"docs wall=$dt%6.2fs pairs=$n")
    }

    (0 until nBatches).foreach(i => fold(i, "grow"))
    val t0 = System.nanoTime()
    snd.compact(spark)
    println(f"[compact] wall=${(System.nanoTime() - t0) / 1e9}%6.2fs")
    (nBatches until nBatches + 3).foreach(i => fold(i, "post"))
    spark.stop()
  }
}
