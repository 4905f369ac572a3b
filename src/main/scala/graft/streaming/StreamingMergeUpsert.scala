package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MergeUpsert

/** Streaming CDC apply — [[graft.operators.MergeUpsert]] as a
  * continuous pipeline: a change stream (upserts + optional deletes,
  * optionally versioned) folds micro-batch by micro-batch into a
  * persistent keyed SNAPSHOT, the Delta/Hudi/Iceberg "streaming MERGE
  * INTO" shape on plain parquet.
  *
  * Per batch: (1) last-writer-wins pre-dedup of the batch on the key —
  * `versionCol` orders writers (ties break on the remaining change
  * columns, lexicographic struct max — deterministic, and a real
  * version column makes ties impossible); without a version column the
  * MERGE unique-key precondition applies to each batch as-is; (2) one
  * [[MergeUpsert.merge]] of the batch into the current snapshot —
  * copy-on-write, exactly the batch operator, so all its semantics
  * (presence-flag matching so NULL-valued updates override,
  * delete-for-absent-key no-op) hold verbatim; (3) a staged snapshot
  * swap through [[CompactSwap]] (manifest + checked filesystem
  * booleans + self-healing recovery — the stores' crash contract).
  *
  * Replay safety: foreachBatch can re-deliver the last batch after a
  * crash-before-checkpoint-commit. Applying the same deduped change
  * set twice is IDEMPOTENT (matched keys overwrite with the same
  * values, inserts collapse into matches, deletes stay deleted), so
  * replay converges to the same snapshot — suite-pinned. Cross-batch
  * ordering is the stream's job: batches must arrive in version order
  * for last-writer-wins to hold ACROSS batches (within the fixture
  * suites, time-ordered file replay — the StreamJoinSuite argument).
  *
  * At 100 TB the copy-on-write rewrite is the format's own cost; the
  * change side stays ≪ the snapshot so AQE broadcasts it, and a real
  * deployment buckets the snapshot by key (the batch operator's note)
  * — per-batch work is then one broadcast join + a snapshot rewrite,
  * nothing corpus-sized shuffles. */
final case class StreamingMergeUpsert(storeDir: String,
    keys: Seq[String], deleteCol: Option[String] = None,
    versionCol: Option[String] = None) {

  private def snapshotPath = new Path(s"$storeDir/snapshot")
  private def stagingPath = new Path(s"$storeDir/_staging")

  /** Current snapshot; an untouched store yields an EMPTY frame with
    * the snapshot schema derived from `changeSchema` (keys + values,
    * change-side-only columns dropped). Runs staging recovery first
    * (review finding): after a crash mid-swap the only full copy sits
    * in `_staging`, and reading without recovering would silently
    * return an empty snapshot. Readers share the single-writer
    * contract — calling this concurrently with an ACTIVE processBatch
    * is the usual external-reader caveat, not supported. */
  def snapshot(spark: SparkSession,
      changeSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    val fs = snapshotPath.getFileSystem(spark.sessionState.newHadoopConf())
    CompactSwap.recoverStaleStaging(fs, stagingPath)
    if (fs.exists(snapshotPath) && fs.listStatus(snapshotPath).nonEmpty)
      spark.read.parquet(snapshotPath.toString)
    else {
      val dropped = deleteCol.toSeq ++ versionCol.toSeq
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(
          changeSchema.filterNot(f => dropped.contains(f.name))))
    }
  }

  /** Last-writer-wins pre-dedup on the key (struct-max argmax — the
    * dedupBest pattern, no window). */
  private def lastWins(changes: DataFrame): DataFrame =
    versionCol match {
      case None => changes
      case Some(v) =>
        val others = changes.columns.filterNot(c =>
          keys.contains(c) || c == v).toIndexedSeq
        changes.groupBy(keys.map(col): _*)
          .agg(max(struct((col(v) +: others.map(col)): _*)).as("__w"))
          .select(keys.map(col).toIndexedSeq ++
            ((v +: others).map(c => col(s"__w.$c").as(c))): _*)
    }

  /** Apply ONE micro-batch of changes to the snapshot. */
  def processBatch(changes: DataFrame): Unit = {
    val spark = changes.sparkSession
    val fs = snapshotPath.getFileSystem(spark.sessionState.newHadoopConf())
    // recovery FIRST: it may complete an interrupted swap and thereby
    // change which snapshot this batch reads
    CompactSwap.recoverStaleStaging(fs, stagingPath)
    val cur = snapshot(spark, changes.schema)
    val merged = MergeUpsert.merge(cur, lastWins(changes), keys, deleteCol)
    // staging write materializes the merge (reading the OLD snapshot)
    // before swap deletes it
    merged.write.mode("overwrite").parquet(stagingPath.toString)
    val folded = if (fs.exists(snapshotPath)) Seq(snapshotPath) else Nil
    CompactSwap.swap(fs, folded, stagingPath, snapshotPath)
  }

  /** Wire onto a change stream: each micro-batch merges into the
    * snapshot store. */
  def attach(stream: DataFrame, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch); ()
      }
      .start()
}
