package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Streaming MinHash near-dup detection — the fuzzy-dedup stage
  * ([[graft.llm.Dedup.minhashLshPairsMd5]]) as a continuous pipeline,
  * completing the streaming-twin family (exact, line, decontaminate,
  * prepare all had twins; fuzzy did not): docs arrive in
  * micro-batches, and each batch emits every near-dup pair it forms
  * with ANY doc seen so far (its own batch included). Banding is the
  * batch operator's verbatim — the SAME [[Dedup.sigSets]] /
  * [[Dedup.bandRowsFromSigs]] derivation, so the CANDIDATE set over
  * any replay equals the batch operator's candidate set exactly, under
  * ANY chunking of the corpus (a pair agrees on a band key regardless
  * of which batches its two docs landed in; the pair surfaces when its
  * later doc arrives). Suite-pinned at sf0.001 and sf0.1.
  *
  * == The documented divergence: estimate verify, not exact verify ==
  * The batch operator verifies candidates with EXACT Jaccard over the
  * hashed shingle sets. A stream cannot: keeping every past doc's full
  * shingle set is corpus-sized state (hundreds of hashes per doc —
  * the thing the signature exists to avoid). The store keeps only the
  * k-long MinHash SIGNATURE per doc, and verification is the standard
  * signature estimate — `est_jaccard` = fraction of agreeing signature
  * components, an unbiased estimator of true Jaccard with
  * std ≈ sqrt(J(1−J)/k) (~0.087 at J = 0.6, k = 32). Pairs near the
  * threshold can therefore flip versus the batch exact verify in
  * EITHER direction; the suite pins the output EXACTLY against a
  * batch-side reference running the same banding with estimate verify,
  * and pins measured recall/precision floors against the exact-verify
  * batch operator (the [[StreamingDecontaminate]] pin-the-divergence
  * discipline). Raising k tightens the estimate at k longs/doc of
  * state.
  *
  * == State ==
  * Two persistent parquet stores under `storeDir` (the
  * [[StreamingLineDedup]] fp-store pattern — near-dup identity has no
  * watermark horizon, so keyed state cannot hold it):
  *  - `bands/` (band int, band_key string, id): the LSH index the
  *    per-batch candidate join probes — `bands` rows per doc;
  *  - `sigs/`  (id, sig array<long>): k longs per doc for the
  *    estimate verify.
  * Per batch: batch band rows self-join (in-batch pairs) and join the
  * band store (cross-batch pairs) — both bucket-local; the probe side
  * is ONE batch, bounded. At cluster scale the stores become tables
  * bucketed by (band, band_key) and id respectively, so neither join
  * reshuffles the store. Doc ids must be UNIQUE across batches
  * (append-only contract, as [[StreamingVectorIndex]]); replaying a
  * batch re-appends its band/sig rows — harmless: candidates AND the
  * verify output are pair-level deduplicated (a replayed batch
  * re-emits its pairs exactly once each — at-least-once across
  * batches, the foreachBatch norm, never multiplied within one), and
  * [[compact]] clears the duplicate store rows. Empty docs (NULL
  * signature) never band, never verify, and are not stored.
  */
final case class StreamingNearDup(storeDir: String,
    idCol: String = "doc_id", textCol: String = "text",
    n: Int = 3, k: Int = 32, bands: Int = 8,
    threshold: Double = 0.6, seed: Long = 42L) {

  require(bands >= 1 && bands <= k && k % bands == 0,
    s"bands=$bands must divide the signature width k=$k")

  private def bandsDir = s"$storeDir/bands"
  private def sigsDir = s"$storeDir/sigs"

  // Existence probe through the Hadoop FileSystem API — a
  // java.io.File probe is ALWAYS false for hdfs://-/s3a://-qualified
  // store paths and would silently report an empty store, losing
  // every cross-batch pair (the StreamingSeriesStore round-11 ADVICE
  // defect; round-14 self-review caught the same class here).
  private def hasData(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  private[streaming] def storeBands(spark: SparkSession): DataFrame =
    if (hasData(spark, bandsDir)) spark.read.parquet(bandsDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("band",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("band_key",
          org.apache.spark.sql.types.StringType))))

  private[streaming] def storeSigs(spark: SparkSession): DataFrame =
    if (hasData(spark, sigsDir)) spark.read.parquet(sigsDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sig",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false)))))

  /** Process ONE micro-batch: emit the batch's new near-dup pairs
    * (id_a < id_b, est_jaccard ≥ threshold — in-batch AND
    * against-store), then append the batch's band/sig rows to the
    * store. */
  def processBatch(batch: DataFrame): DataFrame = {
    val spark = batch.sparkSession
    // heal a crashed compact() before the store reads (tmps live
    // under the store ROOT here, one per folded subdir)
    CompactSwap.recoverDir(spark, storeDir, ".compact_bands_tmp")
    CompactSwap.recoverDir(spark, storeDir, ".compact_sigs_tmp")
    // signature pass: the ONE shared derivation (md5-long shingles +
    // exact band keys — the oracle-reproducible batch variant this
    // twin is pinned against). The batch is re-consumed four times
    // (self-join twice via bandRows, verify, store append) —
    // materialize the bounded batch once.
    val sigs = Dedup.sigSets(
        Dedup.shingleSetsMd5(batch, idCol, textCol, n), k, seed)
      .where(col("sig").isNotNull)
      .select(col("id"), col("sig"))
      .localCheckpoint(true)
    val bandRows = Dedup.bandRowsFromSigs(sigs, k, bands,
        exactBandKey = true)
      .localCheckpoint(true)
    val stBands = storeBands(spark)
    // in-batch pairs: the batch operator's self-join shape
    val inBatch = bandRows.as("l")
      .join(bandRows.as("r"),
        col("l.band") === col("r.band") &&
          col("l.band_key") === col("r.band_key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
    // cross-batch pairs: batch probes the store's LSH index; pair
    // order normalizes by id so output ids are (lo, hi) like the
    // batch op regardless of arrival order
    val cross = bandRows.as("b")
      .join(stBands.as("s"),
        col("b.band") === col("s.band") &&
          col("b.band_key") === col("s.band_key"))
      .select(least(col("b.id"), col("s.id")).as("id_a"),
        greatest(col("b.id"), col("s.id")).as("id_b"))
    val cand = inBatch.unionByName(cross)
      .where(col("id_a") =!= col("id_b")) // a replayed batch vs its own store rows
      .dropDuplicates("id_a", "id_b")
    // estimate verify: signature agreement fraction. Sig lookup joins
    // the bounded candidate side against batch ∪ store signatures —
    // the same build-the-pairs-side discipline as the batch verify.
    val allSigs = sigs.unionByName(storeSigs(spark))
    val out = cand.hint("shuffle_hash")
      .join(allSigs.as("sa"), col("id_a") === col("sa.id"))
      .hint("shuffle_hash")
      .join(allSigs.as("sb"), col("id_b") === col("sb.id"))
      .withColumn("est_jaccard",
        Dedup.sigEstimate(col("sa.sig"), col("sb.sig"), k))
      .where(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
      // pairs-sized dedup: after a REPLAY the batch's ids sit in the
      // store too, so allSigs carries each of them twice and the two
      // verify joins would multiply every pair row ×4 (round-14
      // self-review catch — the rows are identical, so one survives)
      .dropDuplicates("id_a", "id_b")
      // out must survive the store growing below: pin it before the
      // appends so a post-append evaluation cannot see the batch's
      // own rows through the store scans
      .localCheckpoint(true)
    bandRows.write.mode("append").parquet(bandsDir)
    sigs.write.mode("append").parquet(sigsDir)
    out
  }

  /** Compact both stores into one coalesced, DEDUPLICATED snapshot
    * each. Two reasons to run it: (1) file-count hygiene — every
    * batch appends a file-set to `bands/` and `sigs/`, so a
    * long-lived stream pays ever-growing listStatus + parquet-footer
    * costs per probe; (2) replay residue — a replayed batch re-appends
    * its rows, and while the pair-level output dedup makes that
    * harmless, the duplicate rows still occupy store bytes until
    * compacted away. Content is append-only (no merge math — unlike
    * the SeriesStore's partial sums), so compaction is a pure
    * re-layout: read → dropDuplicates → staged write →
    * [[CompactSwap]] delete-then-rename with manifest recovery. NOT
    * crash-atomic; run as a maintenance step with no concurrent
    * readers mid-swap (the StreamingSeriesStore.compact contract). */
  def compact(spark: SparkSession): Unit = {
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def one(dir: String, tmpName: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val tmp = new org.apache.hadoop.fs.Path(root, tmpName)
      CompactSwap.recoverStaleStaging(fs, tmp)
      if (!hasData(spark, dir)) return
      // snapshot SORTED by its probe key: clustered row groups give
      // parquet min/max stats real selectivity, so the per-batch
      // candidate join's runtime filters can skip store row groups
      // instead of scanning the whole history (NearDupStreamProbe)
      val sortCols =
        if (dir == bandsDir) Seq("band", "band_key") else Seq("id")
      spark.read.parquet(dir).dropDuplicates()
        .sort(sortCols.map(col): _*)
        .write.mode("overwrite").parquet(tmp.toString)
      CompactSwap.swap(fs, Seq(p), tmp, p)
    }
    one(bandsDir, ".compact_bands_tmp")
    one(sigsDir, ".compact_sigs_tmp")
  }

  /** Wire onto a streaming DataFrame: each micro-batch's new pairs
    * append to `outDir` as parquet. */
  def attach(stream: DataFrame, outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch).write.mode("append").parquet(outDir); ()
      }
      .start()
}
