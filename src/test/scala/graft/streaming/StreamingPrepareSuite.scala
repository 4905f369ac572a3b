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

  test("cleanStreaming is row-identical to the batch clean") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    val bench = docs.where(col("doc_id") % 13 === 0)
    val batch = Decontaminate.clean(docs, bench)
      .select("doc_id").as[Long].collect().toSet
    val perRow = Decontaminate.cleanStreaming(docs, bench)
      .select("doc_id").as[Long].collect().toSet
    assert(perRow == batch)
    assert(batch.nonEmpty && batch.size < docs.count())
  }

  test("streaming e2e prepare replayed in id order equals the batch " +
      "llm_e2e_prepare manifest") {
    // The registered batch capstone (its corpus: documents ∪ exact
    // copies of every 10th doc under ids +1000000).
    val batch = graft.SparkEntry.queries("llm_e2e_prepare")(spark, sf0001)
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSet

    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    val planted = docs.where(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000)
    val bench = docs.where(col("doc_id") % 13 === 0)
      .select("doc_id", "text").cache()
    // PRECONDITION for the min-id parity argument: within ONE
    // micro-batch, streaming dropDuplicates keeps an ARBITRARY row per
    // key, not the min id — the first-arrival-equals-min-id reasoning
    // only covers collisions ACROSS batches. The originals batch must
    // therefore be fingerprint-collision-free (true at sf0.001; sf0.1
    // has 8 colliding originals — this guard turns a silent
    // nondeterministic failure into an explicit one if the fixture or
    // SF ever changes).
    val collisions = docs
      .groupBy(graft.llm.TextAnalysis.fingerprint(col("text")))
      .count().where(col("count") > 1).count()
    assert(collisions == 0,
      s"$collisions fingerprint collisions among originals — the " +
        "single-batch min-id parity precondition does not hold")

    def prepareStream(df: org.apache.spark.sql.DataFrame) = {
      val sig = TextAnalysis.qualitySignals(df)
        .withColumn("lang", TextAnalysis.langId(col("text")))
        .withColumn("fingerprint", TextAnalysis.fingerprint(col("text")))
        .where(col("verdict") === "keep")
      // first arrival wins; originals replay before planted copies, so
      // the survivor is the batch pipeline's min-id representative
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
      .format("memory").queryName("prep_out").start()
    // id-ordered replay: all originals (ascending), then the planted
    // copies — each chunk a micro-batch, dedup state carrying across
    Seq(docs, planted).foreach { chunk =>
      in.addData(chunk.orderBy("doc_id").as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table("prep_out")
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
    bench.unpersist()
  }
}
