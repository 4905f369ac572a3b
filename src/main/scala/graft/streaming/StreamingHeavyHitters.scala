package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{MgEntry, MgSummary, MisraGriesAgg, MisraGriesSketch}

/** Streaming heavy hitters — the continuous twin of
  * [[graft.operators.HeavyHitters]]: each micro-batch folds through
  * the distributed Misra–Gries UDAF into ONE batch summary, which
  * merges into a persistent sketch (the mergeable-summaries property
  * that makes MG a real streaming aggregate: the bound survives any
  * merge ORDER, so chunking into micro-batches costs nothing).
  *
  * Unlike the batch operator there is no second exact pass — the
  * stream cannot be re-scanned — so answers are the sketch's native
  * sandwich, with `maxErr = n/(k+1)` over the TOTAL folded count n:
  *
  *  - [[guaranteed]]: items with `est · m ≥ n` — their true count is
  *    ≥ est, so they PROVABLY clear the 1/m threshold (no false
  *    positives);
  *  - [[candidates]]: items with `(est + maxErr) · m ≥ n` — every
  *    item truly ≥ n/m has est ≥ true − maxErr, so it appears here
  *    (no false negatives). guaranteed ⊆ truth ⊆ candidates,
  *    suite-pinned against offline exact counts.
  *
  * State is the sketch itself — ≤ k counters + n, a few KB — written
  * per batch as ONE java-serialized file via write-tmp-then-rename
  * with checked filesystem booleans (the CompactSwap discipline at
  * single-file scale). That driver-side state is the DESIGN, not a
  * shortcut: a frequency summary over an unbounded stream is exactly
  * the thing that must stay sub-linear in the data. Replay caveat: a
  * crash between the store write and the checkpoint commit re-merges
  * the last batch (counts ≤ one batch over-weighted, the bound's n
  * grows with it — the summary stays a valid sketch of a stream with
  * that batch repeated); exactly-once state needs the batchId guard
  * ([[processBatch]]'s `lastBatchId` check) which [[attach]] wires. */
final case class StreamingHeavyHitters(storeDir: String, k: Int) {
  require(k >= 1, s"k=$k must be >= 1")

  private def sketchPath = new Path(s"$storeDir/sketch.bin")
  private def tmpPath = new Path(s"$storeDir/_sketch.tmp")

  private def fs(spark: SparkSession) =
    sketchPath.getFileSystem(spark.sessionState.newHadoopConf())

  /** (sketch, lastBatchId) — a fresh store reads as an empty sketch.
    * Crash recovery (review finding): writeState's delete-then-rename
    * has a window where sketch.bin is gone but the COMPLETE new state
    * sits in the tmp file (the tmp write always finishes before the
    * delete starts) — without completing that rename here, a restart
    * would silently zero all folded state AND reset the batchId
    * guard. */
  private def readState(spark: SparkSession): (MisraGriesSketch, Long) = {
    val f = fs(spark)
    if (!f.exists(sketchPath) && f.exists(tmpPath) &&
        !f.rename(tmpPath, sketchPath))
      throw new java.io.IOException(
        s"graft heavy-hitters store: cannot complete interrupted " +
          s"swap $tmpPath -> $sketchPath")
    if (!f.exists(sketchPath)) (new MisraGriesSketch(k), -1L)
    else {
      val in = new java.io.ObjectInputStream(f.open(sketchPath))
      try {
        val id = in.readLong()
        val sk = in.readObject().asInstanceOf[MisraGriesSketch]
        // a store folded at one width must not silently continue at
        // another: the stored sketch's k would win and the caller's
        // error-bound reasoning (n/(k+1)) would be wrong
        require(sk.k == k,
          s"heavy-hitters store $storeDir was folded with k=${sk.k}, " +
            s"reopened with k=$k — widths must match (rebuild the store)")
        (sk, id)
      } finally in.close()
    }
  }

  private def writeState(spark: SparkSession, sk: MisraGriesSketch,
      batchId: Long): Unit = {
    val f = fs(spark)
    val out = new java.io.ObjectOutputStream(f.create(tmpPath, true))
    try { out.writeLong(batchId); out.writeObject(sk) } finally out.close()
    if (f.exists(sketchPath) && !f.delete(sketchPath, false))
      throw new java.io.IOException(
        s"graft heavy-hitters store: cannot clear $sketchPath")
    if (!f.rename(tmpPath, sketchPath))
      throw new java.io.IOException(
        s"graft heavy-hitters store: rename $tmpPath -> $sketchPath " +
          "returned false")
  }

  /** Fold ONE micro-batch of `itemCol` into the store. `batchId`
    * deduplicates foreachBatch crash-replays (a re-delivered id is a
    * no-op — exactly-once state). */
  def processBatch(batch: DataFrame, itemCol: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val (cur, lastId) = readState(spark)
    if (batchId <= lastId) return // replayed batch already folded
    val s = batch.select(col(itemCol).cast("string").as("item"))
      .select(MisraGriesAgg.mg_sketch(col("item"), k).as("s"))
      .selectExpr("s.n AS n", "s.entries AS entries")
      .as[MgSummary](org.apache.spark.sql.Encoders.product[MgSummary])
      .head()
    val inc = new MisraGriesSketch(k)
    inc.n = s.n
    s.entries.foreach(e => inc.counters.update(e.item, e.est))
    cur.mergeIn(inc)
    writeState(spark, cur, batchId)
  }

  /** The folded summary: total n and counters sorted (est desc,
    * item asc). */
  def summary(spark: SparkSession): MgSummary = {
    val (sk, _) = readState(spark)
    MgSummary(sk.n, sk.counters.toSeq.map { case (i, c) => MgEntry(i, c) }
      .sortBy(e => (-e.est, e.item)))
  }

  /** Items PROVABLY ≥ 1/m of the folded stream (no false positives). */
  def guaranteed(spark: SparkSession, m: Int): Seq[MgEntry] = {
    val s = summary(spark)
    s.entries.filter(e => e.est * m >= s.n)
  }

  /** All items possibly ≥ 1/m (contains every true heavy hitter —
    * no false negatives; requires k ≥ m for a nonvacuous bound). */
  def candidates(spark: SparkSession, m: Int): Seq[MgEntry] = {
    val s = summary(spark)
    val maxErr = s.n.toDouble / (k + 1)
    s.entries.filter(e => (e.est + maxErr) * m >= s.n)
  }

  /** Wire onto a stream: each micro-batch folds into the sketch
    * store, batchId-guarded for exactly-once state. */
  def attach(stream: DataFrame, itemCol: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, itemCol, id); ()
      }
      .start()
}
