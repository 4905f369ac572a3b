package graft.examples

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the heavy-hitters two-pass sketch vs the plain
  * groupBy-HAVING on a synthetic heavy-tailed corpus ~75× the sf0.1
  * token count (SCALE.md round-13 record). The interesting number at
  * cluster scale is SHUFFLED ROWS, not local wall clock: the plain
  * aggregate ships one row per distinct key per map partition; the
  * sketch ships one k-counter summary per partition in pass 1 and
  * ≤ k candidate keys per partition in pass 2. Items are log-uniform
  * (count(rank x) ≈ n/(x·ln V)) — a genuine heavy tail with a long
  * singleton tail, the regime the fixture's 31-token vocabulary
  * cannot exercise. Both arms read the same localCheckpointed input,
  * and the outputs are asserted identical.
  */
object HeavyHittersProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val v = 1 << 21
    val m = 1000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleRecs = new AtomicLong(0)
    val shuffleBytes = new AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val w = sc.stageInfo.taskMetrics.shuffleWriteMetrics
          shuffleRecs.addAndGet(w.recordsWritten)
          shuffleBytes.addAndGet(w.bytesWritten)
          ()
        }
      })

    // log-uniform ranks over [1, V): rank x appears ~ n/(x ln V) times
    val items = spark.range(n).select(
      concat(lit("w"), floor(pow(lit(v.toDouble), rand(42L)))
        .cast("long")).as("item"))
      .repartition(32).localCheckpoint(true)

    def run(label: String)(thunk: => Array[(String, Long)])
        : Array[(String, Long)] = {
      Thread.sleep(3000); shuffleRecs.set(0); shuffleBytes.set(0)
      val t0 = System.nanoTime()
      val out = thunk
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(3000)
      println(f"$label%-8s rows=${out.length}%4d wall=$sec%7.2fs " +
        f"shuffle_records=${shuffleRecs.get}%,12d " +
        f"shuffle_bytes=${shuffleBytes.get}%,14d")
      out
    }

    // n passed as a literal (the sketch arm derives it internally, so
    // this is conservative in the exact arm's favor)
    val exact = run("exact") {
      items.groupBy(col("item").as("term"))
        .agg(count(lit(1)).as("cnt"))
        .where(col("cnt") * lit(m.toLong) >= lit(n))
        .collect().map(r => (r.getString(0), r.getLong(1)))
    }
    val sketch = run("mg2pass") {
      graft.operators.HeavyHitters
        .frequentItems(items, "item", m = m, k = 2000)
        .collect().map(r => (r.getString(0), r.getLong(1)))
    }
    assert(exact.toSet == sketch.toSet,
      s"outputs diverge: ${exact.length} vs ${sketch.length}")
    println(s"outputs identical: ${exact.length} heavy hitters")
    spark.stop()
  }
}
