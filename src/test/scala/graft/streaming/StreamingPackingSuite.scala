package graft.streaming

// Spark 4 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Packing

/** Streaming packing: per-shard running offsets carried in
  * flatMapGroupsWithState — replaying the corpus in doc-id order must
  * reproduce the batch manifest exactly, and the running state must
  * continue sequence numbering across micro-batches. */
class StreamingPackingSuite extends SparkSpec {
  import spark.implicits._

  test("streaming packing over id-ordered batches equals the batch manifest") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id")
      .as[(Long, String)].collect()

    val batch = Packing.packSequences(
      spark.read.parquet(s"$sf0001/documents.parquet"), ctxLen = 64,
      nShards = 8)
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = Packing.packSequencesStream(
        in.toDF().toDF("doc_id", "text"), ctxLen = 64, nShards = 8)
      .writeStream.outputMode("append")
      .format("memory").queryName("pack_out").start()
    // three id-ordered chunks → three micro-batches; the shard offset
    // state must carry across them
    docs.grouped((docs.length + 2) / 3).foreach { chunk =>
      in.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table("pack_out")
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("checkpointed restart recovers the shard offsets: resumed stream " +
      "completes the exact batch manifest") {
    // The durability contract of the stateful operator: stop the query
    // after half the corpus, land the rest while it is down, restart
    // from the checkpoint — the recovered per-shard offsets must
    // continue sequence numbering exactly where they left off, so the
    // accumulated file-sink output equals the batch manifest over the
    // whole corpus. (Without state recovery the second half would
    // restart every shard at offset 0 and collide with the first.)
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-pack-ckpt").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    // split at the median id; each half lands as ONE file so arrival
    // order (file order × within-batch doc-id sort) is global id order
    val mid = docs.select("doc_id").as[Long].collect().sorted
      .apply((docs.count() / 2).toInt)
    docs.where(col("doc_id") < mid).coalesce(1).write.parquet(s"$root/in")

    def runOnce(): Unit = {
      val in = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
      val q = Packing.packSequencesStream(in, ctxLen = 64, nShards = 8)
        .writeStream.outputMode("append").format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt").start()
      q.processAllAvailable()
      q.stop()
    }
    runOnce()
    // second half lands while the query is down
    docs.where(col("doc_id") >= mid).coalesce(1)
      .write.mode("append").parquet(s"$root/in")
    runOnce()

    val streamed = spark.read.parquet(s"$root/out")
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSet
    val batch = Packing.packSequences(
      spark.read.parquet(s"$sf0001/documents.parquet"), ctxLen = 64,
      nShards = 8)
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("non-integral doc ids fail fast with a clear error") {
    // The typed state machine requires integral ids; a silent null
    // cast would crash the encoder mid-stream instead. Batch
    // execution of the streaming operator exercises the same guard.
    val df = Seq(("doc-42", "some words here for tokens"))
      .toDF("doc_id", "text")
    val e = intercept[Throwable] {
      Packing.packSequencesStream(df, ctxLen = 8, nShards = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("integral")),
      s"unexpected error: $e")
  }

  test("arbitrary arrival order still yields full sequences and exact reassembly") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").orderBy(col("doc_id").desc) // reversed
      .as[(Long, String)].collect()

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = Packing.packSequencesStream(
        in.toDF().toDF("doc_id", "text"), ctxLen = 64, nShards = 8)
      .writeStream.outputMode("append")
      .format("memory").queryName("pack_out2").start()
    docs.grouped((docs.length + 1) / 2).foreach { chunk =>
      in.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()

    // materialize locally: two scans of the SAME MemoryPlan cannot be
    // joined (conflicting-reference resolution fails on MemorySink)
    val sp = spark.table("pack_out2")
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq
      .toDF("shard", "seq_no", "doc_id", "tok_start", "tok_end", "seq_off")
      .cache()
    // every sequence except each shard's last is exactly full
    val bySeq = sp.groupBy("shard", "seq_no")
      .agg(sum(col("tok_end") - col("tok_start")).as("fill"))
    val lastSeq = sp.groupBy("shard").agg(max("seq_no").as("last"))
    assert(bySeq.join(lastSeq, Seq("shard"))
      .where(col("fill") =!= 64 && col("seq_no") =!= col("last"))
      .count() == 0)
    // every doc reassembles exactly
    val docN = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        graft.llm.TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .where(col("n") > 0)
    val agg = sp.groupBy("doc_id").agg(min("tok_start").as("mn"),
      max("tok_end").as("mx"),
      sum(col("tok_end") - col("tok_start")).as("covered"))
    assert(docN.join(agg, Seq("doc_id"), "left")
      .where(col("covered").isNull || col("mn") =!= 0 ||
        col("mx") =!= col("n") || col("covered") =!= col("n"))
      .count() == 0)
    sp.unpersist()
  }
}
