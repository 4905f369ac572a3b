package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}
import graft.llm.TextAnalysis

/** The LLM curation signals are pure map-only Catalyst expressions, so
  * the SAME code runs on a stream with zero changes — quality/lang/
  * fingerprint fuse into each micro-batch's scan, and exact dedup
  * becomes streaming `dropDuplicates` keyed state. This suite pins
  * that batch/stream unification (the reference needs a separate
  * channel pipeline for streaming; Spark gets it from the one plan).
  */
class StreamingCurationSuite extends SparkSpec {
  import spark.implicits._

  test("streaming curation signals equal the batch result, dups dropped") {
    val dir = Files.createTempDirectory("graft-stream-cur").toString
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text")
    // at-least-once style input: every 10th doc delivered twice
    docs.unionAll(docs.where(col("doc_id") % 10 === 0))
      .repartition(4).write.parquet(s"$dir/in")

    def curate(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.qualitySignals(df)
        .withColumn("lang", TextAnalysis.langId(col("text")))
        .withColumn("fingerprint", TextAnalysis.fingerprint(col("text")))
        .where(col("verdict") === "keep")
        .select("doc_id", "fingerprint", "lang", "n_tokens")
        .dropDuplicates("fingerprint")

    val batch = curate(docs)
      .collect().map(r => (r.getString(1), r.getString(2), r.getInt(3)))
      .toSet

    val streamIn = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = curate(streamIn).writeStream.outputMode("append")
      .format("memory").queryName("cur_out")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("cur_out")
      .collect().map(r => (r.getString(1), r.getString(2), r.getInt(3)))
      .toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
    // the redelivered docs were deduped by the streaming state
    assert(spark.table("cur_out").count() == batch.size)
  }

  test("streaming sample-mix equals batch (stateless deterministic decision)") {
    // The md5-bucket keep/drop decision is a pure function of the row,
    // so the mixing pass runs unchanged in a streaming query — no
    // state store, no watermark, identical kept set in any delivery
    // order.
    val dir = Files.createTempDirectory("graft-stream-mix").toString
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text")
    docs.repartition(4).write.parquet(s"$dir/in")

    def mix(df: org.apache.spark.sql.DataFrame) =
      graft.llm.Sampling.sampleMix(
        df.withColumn("lang", TextAnalysis.langId(col("text"))),
        "lang", Map("en" -> 0.5, "de" -> 1.0), defaultRate = 0.1)
        .select("doc_id", "lang", "bucket")

    val batch = mix(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    val streamIn = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = mix(streamIn).writeStream.outputMode("append")
      .format("memory").queryName("mix_out")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("mix_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
