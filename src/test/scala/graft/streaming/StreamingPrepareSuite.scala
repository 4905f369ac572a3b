package graft.streaming

// Spark 4 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.{Decontaminate, Packing, Sampling, TextAnalysis}

/** The composed e2e prepare pipeline (quality → lang → exact dedup →
  * decontaminate → mix → pack) as ONE continuous streaming query —
  * the "documents arrive, training sequences leave" deployment mode
  * the reference's streaming heritage implies. Stage-by-stage
  * streaming translation:
  *  - quality/lang/fingerprint: map-only expressions, unchanged;
  *  - exact dedup: `dropDuplicates(fingerprint)` keyed state (first
  *    arrival wins — equals the batch min-id representative under
  *    id-ordered replay);
  *  - decontaminate: [[Decontaminate.cleanStreaming]] — the per-row
  *    broadcast-set predicate, no stream-side join state;
  *  - mix: stateless deterministic md5 buckets, unchanged;
  *  - pack: `flatMapGroupsWithState` per-shard offsets.
  */
class StreamingPrepareSuite extends SparkSpec {
  import spark.implicits._

  test("cleanStreaming is row-identical to the batch clean — " +
      "including null-text docs") {
    // the null-text row pins the coalesce-to-empty fix: a NULL winnow
    // array made the per-row WHERE three-valued and silently dropped
    // the doc where batch clean's anti-join kept it (ADVICE r6)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
      .unionByName(Seq((99999999L, Option.empty[String]))
        .toDF("doc_id", "text"))
    val bench = docs.where(col("doc_id") % 13 === 0)
    val batch = Decontaminate.clean(docs, bench)
      .select("doc_id").as[Long].collect().toSet
    val perRow = Decontaminate.cleanStreaming(docs, bench)
      .select("doc_id").as[Long].collect().toSet
    assert(perRow == batch)
    assert(batch.contains(99999999L),
      "batch clean must keep the null-text doc (nothing to share)")
    assert(batch.nonEmpty && batch.size < docs.count())
  }

  /** Replays the planted-dup corpus through the streaming pipeline and
    * asserts manifest parity with the registered batch capstone.
    *
    * Replay chunking — micro-batch k carries every fingerprint group's
    * rank-k row (rank = row_number by doc_id within the group). This
    * makes the min-id parity argument hold at ANY scale factor:
    * within ONE micro-batch streaming dropDuplicates keeps an
    * ARBITRARY row per key, so batch 0 must be collision-free — and
    * rank-0 rows are one-per-fingerprint BY CONSTRUCTION, while every
    * rank ≥ 1 row arrives strictly after its group's min-id row and is
    * dropped by state. (The previous originals-then-planted chunking
    * relied on the ORIGINALS being collision-free — true at sf0.001,
    * false at sf0.1 where 8 originals collide.) Quality filtering
    * before dedup preserves the argument: colliding fingerprints ⇒
    * identical text ⇒ identical verdict, so a group is kept or
    * dropped whole. All survivors are rank-0, so packing sees one
    * id-ordered batch — matching the batch pipeline's ordering. */
  private def replayParity(sfDir: String, queryName: String): Unit = {
    // The registered batch capstone (its corpus: documents ∪ exact
    // copies of every 10th doc under ids +1000000).
    val batch = graft.SparkEntry.queries("llm_e2e_prepare")(spark, sfDir)
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSet

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val planted = docs.where(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000)
    val bench = docs.where(col("doc_id") % 13 === 0)
      .select("doc_id", "text").cache()

    val corpus = docs.unionByName(planted)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(TextAnalysis.fingerprint(col("text")))
      .orderBy(col("doc_id"))
    val ranked = corpus
      .withColumn("rk", row_number().over(w) - 1)
      .orderBy(col("rk"), col("doc_id"))
      .select(col("rk"), col("doc_id"), col("text"))
      .as[(Int, Long, String)].collect()
    assert(ranked.exists(_._1 > 0), "no duplicate fingerprints — the " +
      "cross-batch dedup state would go unexercised")

    def prepareStream(df: org.apache.spark.sql.DataFrame) = {
      val sig = TextAnalysis.qualitySignals(df)
        .withColumn("lang", TextAnalysis.langId(col("text")))
        .withColumn("fingerprint", TextAnalysis.fingerprint(col("text")))
        .where(col("verdict") === "keep")
      // first arrival wins; rank-k replay puts each group's min-id row
      // in the earliest batch, alone among its key — the survivor is
      // the batch pipeline's min-id representative
      val deduped = sig.dropDuplicates("fingerprint")
        .select("doc_id", "text", "lang")
      val clean = Decontaminate.cleanStreaming(deduped, bench)
      val mixed = Sampling.sampleMix(clean, "lang",
        Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.25), defaultRate = 0.1)
      Packing.packSequencesStream(mixed, ctxLen = 64, nShards = 8)
    }

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = prepareStream(in.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName).start()
    ranked.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, chunk) =>
      in.addData(chunk.sortBy(_._2).map(r => (r._2, r._3)).toSeq)
      q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table(queryName)
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
    bench.unpersist()
  }

  test("streaming e2e prepare replayed rank-chunked equals the batch " +
      "llm_e2e_prepare manifest (sf0.001)") {
    replayParity(sf0001, "prep_out_sf0001")
  }

  test("streaming e2e prepare replay parity holds at sf0.1 — where " +
      "8 original docs collide on fingerprint") {
    replayParity(sf01, "prep_out_sf01")
  }
}
