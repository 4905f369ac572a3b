package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Streaming line-level dedup — the C4 boilerplate pass
  * ([[graft.llm.Dedup.dedupLines]]) as a continuous pipeline: docs
  * arrive in micro-batches, a line is kept iff its normalized
  * fingerprint was never seen in ANY earlier batch (first ARRIVAL
  * wins; within a batch, the batch-local (doc, pos) minimum — so
  * under doc-id-ordered replay the kept set equals the batch
  * operator's global first-occurrence, the StreamingPrepareSuite
  * parity argument applied to lines).
  *
  * State lives in a persistent fingerprint STORE (a parquet
  * directory), not in executor memory: corpus-wide seen-line state at
  * 100 TB is far beyond what `dropDuplicates` keyed state can hold,
  * and — unlike a doc fingerprint — a line fingerprint has no
  * watermark horizon (the global footer repeats forever). The
  * per-batch step is: anti-join batch lines against the store
  * (probe side = ONE batch, bounded; store side a bare-fp scan),
  * batch-local first-occurrence groupBy, store append of the new
  * fingerprints, per-doc reassembly. At cluster scale the store
  * becomes a bucketed table on `fp` so the anti-join co-locates
  * against each batch without a full store shuffle; the empty-line
  * exemption fingerprint is never stored (blank lines are structure).
  *
  * Drive it either through [[attach]] (foreachBatch on a streaming
  * DataFrame) or by calling [[processBatch]] directly from an
  * existing foreachBatch (the [[graft.pipeline.Pipeline]] pattern).
  */
final case class StreamingLineDedup(storeDir: String,
    idCol: String = "doc_id", textCol: String = "text",
    sep: String = "\n") {

  private def storeFps(spark: SparkSession): DataFrame = {
    // Hadoop FS probe, not java.io.File: a File probe is ALWAYS false
    // for hdfs://-/s3a://-qualified store paths — the store would
    // silently read as empty and EVERY line would be kept as a first
    // occurrence (the StreamingSeriesStore round-11 ADVICE defect;
    // caught here in the round-14 self-review sweep).
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
    if (hasData) spark.read.parquet(storeDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("fp",
          org.apache.spark.sql.types.StringType))))
  }

  /** Dedup ONE micro-batch against the store and update the store.
    * Returns the batch's surviving docs in [[Dedup.dedupLines]]'s
    * output shape (idCol, text_dedup, n_removed). */
  def processBatch(batch: DataFrame): DataFrame = {
    val spark = batch.sparkSession
    val lines = Dedup.lineTable(batch, idCol, textCol, sep)
      // one batch is re-consumed three times below (firsts, keep
      // join, store append) — materialize the bounded batch once
      .localCheckpoint(true)
    val seen = storeFps(spark)
    // a line survives iff non-exempt AND unseen AND the batch-local
    // (doc, pos) minimum for its fingerprint
    val candidates = lines.where(col("fp") =!= Dedup.EmptyLineFp)
      .join(seen, Seq("fp"), "left_anti")
    val firsts = candidates.groupBy("fp")
      .agg(min(struct(col(idCol), col("pos"))).as("first"))
      .localCheckpoint(true) // consumed by keep-join AND store append
    // out's whole lineage hangs off the two checkpoints, NOT the
    // store scan — safe to evaluate after the store grows below
    val out = Dedup.reassembleLines(
      lines.join(firsts, Seq("fp"), "left")
        .withColumn("keep", col("fp") === Dedup.EmptyLineFp ||
          (col("first").isNotNull &&
            struct(col(idCol), col("pos")) === col("first"))),
      idCol, sep)
    firsts.select("fp").write.mode("append").parquet(storeDir)
    out
  }

  /** Compact the fingerprint store into one snapshot file-set — the
    * [[StreamingNearDup.compact]] hygiene applied to the fp log:
    * every batch appends a file-set, so a long-lived stream pays
    * ever-growing listStatus + footer costs per anti-join. (Unlike
    * the near-dup stores there is no replay residue to clear: the
    * anti-join keeps a replayed batch from re-appending fps the
    * store already holds — the dropDuplicates here is belt and
    * braces.) Pure re-layout via [[CompactSwap]] (manifest recovery,
    * checked booleans); maintenance-step contract — no concurrent
    * readers mid-swap. */
  def compact(spark: SparkSession): Unit = {
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(
      p.getParent, s".compact_${p.getName}_tmp")
    CompactSwap.recoverStaleStaging(fs, tmp)
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
    if (!hasData) return
    spark.read.parquet(storeDir).dropDuplicates()
      .write.mode("overwrite").parquet(tmp.toString)
    CompactSwap.swap(fs, Seq(p), tmp, p)
  }

  /** Wire onto a streaming DataFrame: each micro-batch is deduped
    * against the store and appended to `outDir` as parquet. */
  def attach(stream: DataFrame, outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch).write.mode("append").parquet(outDir); ()
      }
      .start()
}
