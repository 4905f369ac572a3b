package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.LlmQueries

/** Streaming twin of the span-cut decontamination: chunked replay must
  * equal the batch `llm_decontaminate_cut` ROW-FOR-ROW — and because
  * the operator is a per-document transformation against a fixed
  * benchmark (no cross-doc state anywhere in flag → locate → cut),
  * parity needs no replay-order discipline at all, unlike the dedup
  * stages. Pinned at sf0.001 AND sf0.1 per the CLAUDE.md invariant. */
class StreamingDecontaminateSuite extends SparkSpec {
  import spark.implicits._

  private def replayParity(sfDir: String, tag: String): Unit = {
    // the registered query's corpus (benchmark docs %13 + partial-
    // overlap twins +4000000) and its exact batch output
    val batch = LlmQueries.decontaminateCut(spark, sfDir)
      .as[(Long, String, Long)].collect().toSet
    val bench = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") % 13 === 0).select("doc_id", "text").cache()
    bench.count()

    val corpus = LlmQueries.docsWithContamTwins(spark, sfDir)
      .as[(Long, String)].collect()
    val root = Files.createTempDirectory(s"graft-sdc-$tag").toString
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingDecontaminate(bench).attach(
      in.toDF().toDF("doc_id", "text"), s"$root/out", s"$root/ckpt")
    // arbitrary 3-way chunking — a twin and its benchmark source land
    // in different micro-batches, which must not matter (stateless)
    (0 until 3).foreach { c =>
      in.addData(corpus.filter(_._1 % 3 == c).toSeq)
      q.processAllAvailable()
    }
    q.stop()

    val out = spark.read.parquet(s"$root/out")
    assert(out.select("batch_id").distinct().count() == 3)
    val streamed = out.select("doc_id", "text_cut", "n_removed")
      .as[(Long, String, Long)].collect().toSet
    assert(streamed == batch, s"$tag: streamed cut differs from batch")
    // the parity is not vacuous: real cuts happened in-stream
    assert(streamed.exists(_._3 > 0), s"$tag: no spans were cut")
    bench.unpersist()
  }

  test("chunked replay equals batch cutContaminated row-for-row (sf0.001)") {
    replayParity(sf0001, "sf0001")
  }

  test("chunked replay parity holds at sf0.1") {
    replayParity(sf01, "sf01")
  }
}
