package graft.examples

import org.apache.spark.sql.SparkSession
import graft.llm.Bpe

/** Measurement probe backing the SCALE.md batched-BPE record: a
  * 256-merge vocabulary on the sf0.1 corpus, batched at B=32, against
  * the sequential trainer's per-round cost — the round-9 verdict's
  * "32k merges = 32k serial jobs" remedy, measured.
  *
  * Also counts ROUNDS (Spark jobs) directly via a listener: the claim
  * is rounds ≈ V/B, and the wall-clock claim is that a 32k-merge
  * production vocabulary extrapolates to minutes of scheduler latency,
  * not hours. `args(0)` optionally overrides the merge count.
  */
object BpeBatchProbe {
  def main(args: Array[String]): Unit = {
    val nMerges = if (args.nonEmpty) args(0).toInt else 256
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("text")

    var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })

    // Warm the dictionary lineage + codegen once so neither arm is
    // charged session startup.
    Bpe.trainBpeBatched(d, nMerges = 4, batch = 4).collect()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // minFreq=1: the fixture corpus exhausts freq>=2 pairs after ~111
    // merges (frequent words merge into single symbols) — counting
    // singletons lets the probe exercise the full 256-merge depth.
    jobs = 0
    val (batched, tb) = time(
      Bpe.trainBpeBatched(d, nMerges, batch = 32, minFreq = 1L).collect())
    val jb = jobs
    val nb = batched.length
    println(f"[bpe] batched  B=32: $nb%d/$nMerges%d merges in $tb%.1f s, " +
      f"$jb%d jobs (${tb / nb * 1000}%.0f ms/merge)")

    // Sequential arm at a REDUCED merge count (the whole point is that
    // the full count is impractically serial); per-round cost then
    // extrapolates linearly — each round is the same pair-stats job
    // over a dictionary whose size only shrinks as merges proceed.
    val seqMerges = 32
    jobs = 0
    val (_, ts) = time(Bpe.trainBpe(d, seqMerges, minFreq = 1L).collect())
    val js = jobs
    val perRound = ts / seqMerges
    println(f"[bpe] sequential: $seqMerges%d merges in $ts%.1f s, $js%d jobs " +
      f"($perRound%.3f s/round = s/merge)")
    println(f"[bpe] extrapolation to a 32k vocab: sequential ≈ " +
      f"${perRound * 32768 / 3600}%.1f h; batched B=32 ≈ " +
      f"${tb / nb * 32768 / 60}%.1f min " +
      f"(jobs per merge ${js.toDouble / seqMerges}%.1f → ${jb.toDouble / nb}%.1f)")
    spark.stop()
  }
}
