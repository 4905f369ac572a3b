package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** r9 decomposition of the spans-capstone cost (VERDICT r8 item 3):
  * noop-sink materialization (Bench's exact measurement — QueryTime's
  * count() and SpansBarrierProbe's count-aggregates let Catalyst prune
  * differently), fresh cache per arm, with executor stage-time sums
  * from a SparkListener so wall-clock splits into (scheduled work) vs
  * (driver/codegen/idle). Arms:
  *   survivors — fill the persist barrier only
  *   spans     — duplicateSpans over a fresh barrier
  *   full      — the whole registered capstone
  * Usage: runMain graft.examples.SpansCostProbe [sfDir] [reps]
  */
object SpansCostProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").appName("spans-cost-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stageMs = new java.util.concurrent.atomic.AtomicLong
    val stageN = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stageMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
        stageN.incrementAndGet()
      }
    })
    def loadavg(): String =
      scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Bench's warmup
    mat(graft.SparkEntry.entry(spark))

    def survivors(): DataFrame = graft.queries.LlmQueries.fuzzySurvivorsOf(
      graft.queries.LlmQueries.keptDeduped(
        graft.queries.LlmQueries.docsWithSpliceDups(spark, sf)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "survivors" -> (() => survivors()),
      "spans" -> (() => graft.llm.Dedup.duplicateSpans(survivors())),
      "full" -> (() =>
        graft.SparkEntry.queries("llm_e2e_prepare_spans")(spark, sf)))
    (1 to reps).foreach { pass =>
      arms.foreach { case (name, build) =>
        val la = loadavg()
        stageMs.set(0); stageN.set(0)
        val t0 = System.nanoTime()
        mat(build())
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        println(f"[$pass] $name%-9s wall=$dt%6.2f s  stageSum=${stageMs.get / 1000.0}%7.1f core-s over ${stageN.get}%3d stages  (loadavg_start=$la)")
      }
    }
    spark.stop()
  }
}
