package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.{Decontaminate, Dedup, Sampling, TextAnalysis}
import graft.queries.LlmQueries

/** The round-13 verdict's motivating gap, closed end to end: the
  * FUZZY e2e prepare pipeline (quality → lang → exact dedup → minhash
  * near-dup drop → decontaminate → mix — `llm_e2e_prepare_fuzzy`
  * minus the packing tail, whose streaming twin StreamingPrepareSuite
  * already pins) running as ONE continuous ingestion over
  * doc-id-ORDERED batches, equal to the batch capstone's frame.
  *
  * Parity preconditions (asserted, so a failure self-diagnoses):
  *  - estimate-verify pairs ≡ exact-verify pairs on this corpus (the
  *    StreamingNearDup divergence — absent at sf0.001, measured);
  *  - ordered arrival: id-ascending chunks make first-arrival = min
  *    id for the exact stage (the StreamingPrepare argument) and
  *    cluster-min-first for the fuzzy stage. Transitive chains would
  *    still diverge (the StreamingFuzzyDedup hand-pinned case); on
  *    this corpus the planted families form triangles, not chains,
  *    so parity is exact — and the equality assert would catch a
  *    corpus that stops satisfying that. */
class StreamingFuzzyPrepareSuite extends SparkSpec {

  test("continuous fuzzy prepare over ordered batches equals the " +
      "batch capstone's pre-pack frame (sf0.001)") {
    val sfDir = sf0001
    val corpus = LlmQueries.docsWithMixedDups(spark, sfDir)
      .localCheckpoint(true)
    val bench = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") % 13 === 0).select("doc_id", "text")
      .localCheckpoint(true)
    val rates = Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.25)

    // batch expectation: the capstone's own stages up to the mix
    val batchMixed = Sampling.sampleMix(
        Decontaminate.clean(LlmQueries.fuzzySurvivors(spark, sfDir),
          bench, flagFrom = Some(corpus)),
        "lang", rates, defaultRate = 0.1)
      .select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(batchMixed.nonEmpty)

    // precondition: est pairs ≡ exact pairs on the exact-dedup
    // survivors (the corpus the fuzzy stage actually sees)
    val deduped = LlmQueries.keptDeduped(corpus).localCheckpoint(true)
    val exactPairs = Dedup.minhashLshPairsMd5(deduped, threshold = 0.5)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = Dedup.sigSets(
        Dedup.shingleSetsMd5(deduped, "doc_id", "text", 3), 32, 42L)
      .where(col("sig").isNotNull).select(col("id"), col("sig"))
    val bandRows = Dedup.bandRowsFromSigs(sigs, 32, 8,
      exactBandKey = true)
    val estPairs = bandRows.as("l")
      .join(bandRows.as("r"),
        col("l.band") === col("r.band") &&
          col("l.band_key") === col("r.band_key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(sigs.as("sa"), col("id_a") === col("sa.id"))
      .join(sigs.as("sb"), col("id_b") === col("sb.id"))
      .where(Dedup.sigEstimate(col("sa.sig"), col("sb.sig"), 32) >= 0.5)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(estPairs == exactPairs,
      "estimate-verify pairs diverge from exact on this corpus — the " +
        "parity claim below does not apply (StreamingNearDup scaladoc)")

    // the continuous pipeline: id-ascending chunks (originals, exact
    // copies, near copies arrive in id order — copies always after
    // their originals, so both dedup stages' first-arrival = min id)
    val root = Files.createTempDirectory("graft-sfp").toString
    val sfd = StreamingFuzzyDedup(s"$root/fuzzy", threshold = 0.5)
    val fpStore = s"$root/fps"
    def seenFps(): DataFrame = {
      val d = new java.io.File(fpStore)
      if (d.isDirectory &&
          d.listFiles().exists(_.getName.endsWith(".parquet")))
        spark.read.parquet(fpStore)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("fingerprint",
            org.apache.spark.sql.types.StringType))))
    }
    def processChunk(b: DataFrame, batchId: Long): DataFrame = {
      val sig = TextAnalysis.qualitySignals(b)
        .withColumn("lang", TextAnalysis.langId(col("text")))
        .withColumn("fingerprint",
          TextAnalysis.fingerprint(col("text")))
        .where(col("verdict") === "keep")
      // exact stage: first-arrival per fingerprint via the fp store;
      // in-batch the min id wins (keptDeduped's own aggregate)
      val fresh = sig.join(seenFps(), Seq("fingerprint"), "left_anti")
        .groupBy("fingerprint")
        .agg(min("doc_id").as("doc_id"),
          min_by(col("text"), col("doc_id")).as("text"),
          min_by(col("lang"), col("doc_id")).as("lang"))
        .localCheckpoint(true)
      fresh.select("fingerprint").write.mode("append").parquet(fpStore)
      val fuzzySurv = sfd.processBatch(fresh.drop("fingerprint"),
        batchId)
      Sampling.sampleMix(
        Decontaminate.cleanStreaming(fuzzySurv, bench),
        "lang", rates, defaultRate = 0.1)
    }
    val cuts = Seq(
      col("doc_id") < 250,
      col("doc_id") >= 250 && col("doc_id") < 1500000,
      col("doc_id") >= 1500000)
    val streamed = cuts.zipWithIndex.flatMap { case (p, i) =>
      processChunk(corpus.where(p), i.toLong)
        .select("doc_id", "lang")
        .collect().map(r => (r.getLong(0), r.getString(1)))
    }.toSet
    assert(streamed == batchMixed,
      s"missing=${(batchMixed -- streamed).take(5)} " +
        s"extra=${(streamed -- batchMixed).take(5)}")
    // the cross-batch fuzzy path fired: near copies (+2000000) arrive
    // in the last chunk and must have been dropped against kept
    // originals from earlier chunks
    assert(!streamed.exists(_._1 >= 2000000L),
      "a near copy survived the cross-batch fuzzy stage")
  }
}
