package graft.examples

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sources.BinaryQueue

/** Round-13 10× evidence for the sidecar frame index: latestOffset's
  * per-trigger cost must stay FLAT as the log grows (walk only the
  * appended suffix), where the unindexed walk grows linearly — the
  * difference between a queue that can run for a week and one whose
  * trigger latency degrades with history. Also times the reader-seek
  * path: reading the LAST 1k frames of a deep log. */
object BinQueueIndexProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft-idxprobe")
      .toString
    val payload = Array.fill[Byte](1024)(7) // 1 KB frames
    val log = new Path(s"$root/p0.log")
    val fs = log.getFileSystem(spark.sessionState.newHadoopConf())
    def timeMs[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e6)
    }
    // grow the log 20 rounds × 10k frames (~10 MB/round); per round,
    // time the INDEXED count (what latestOffset does) and a fresh
    // UNINDEXED full walk (sidecar suppressed via a huge refresh on a
    // copy-less read: delete the .idx first on a probe pass? no — we
    // time the indexed path, then time a walk with entries ignored by
    // pointing countFrames at a refresh that never existed: simplest
    // honest arm is deleting the sidecar, timing, then restoring by
    // re-walking with the real refresh)
    var indexed = List.empty[Double]
    var full = List.empty[Double]
    (1 to 20).foreach { r =>
      BinaryQueue.append(root, 0,
        (1 to 10000).map(_ => (payload, 1700000000000L)))
      val len = fs.getFileStatus(log).getLen
      val (_, tIdx) = timeMs(BinaryQueue.countFrames(fs, log, len))
      val idx = new Path(s"$root/p0.idx")
      val saved = BinaryQueue.readIndexEntries(fs, log, len)
      fs.delete(idx, false)
      val (_, tFull) = timeMs(
        BinaryQueue.countFrames(fs, log, len, Long.MaxValue))
      BinaryQueue.writeIndex(fs, log, saved)
      indexed ::= tIdx; full ::= tFull
      if (r % 5 == 0)
        println(f"[probe] frames=${r * 10000}%7d indexed=$tIdx%7.1f ms " +
          f"full-walk=$tFull%7.1f ms")
    }
    println(f"[probe] last-5 mean: indexed=${indexed.take(5).sum / 5}%.1f ms" +
      f" full=${full.take(5).sum / 5}%.1f ms " +
      f"(${full.take(5).sum / math.max(indexed.take(5).sum, 1e-9)}%.0fx)")
    // reader-seek: last 1k frames of the 200k-frame log
    import graft.sources.{BinQueuePartition, BinQueueReaderFactory}
    val factory = new BinQueueReaderFactory(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    def readTail(): Double = {
      val (_, t) = timeMs {
        val rd = factory.createReader(
          BinQueuePartition(s"$root/p0.log", 199000L, 200000L))
        var n = 0
        while (rd.next()) n += 1
        rd.close()
        require(n == 1000)
      }
      t
    }
    val warm = readTail(); val t2 = readTail()
    println(f"[probe] tail-1k read with ladder: ${math.min(warm, t2)}%.1f ms")
    fs.delete(new Path(s"$root/p0.idx"), false)
    val (_, tNoIdx) = timeMs {
      val rd = factory.createReader(
        BinQueuePartition(s"$root/p0.log", 199000L, 200000L))
      var n = 0
      while (rd.next()) n += 1
      rd.close()
      require(n == 1000)
    }
    println(f"[probe] tail-1k read without index: $tNoIdx%.1f ms")
    spark.stop()
  }
}
