package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.TextAnalysis

class StreamingDriftSuite extends SparkSpec {
  import spark.implicits._

  private def corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    .select("doc_id", "lang", "text")

  test("zero drift on a batch distributed exactly like the reference") {
    val root = Files.createTempDirectory("graft-drift").toString
    val sd = StreamingDrift(s"$root/ref")
    sd.buildReference(corpus)
    // the reference corpus itself as one batch: p = q per term →
    // every JS term is exactly 0 → js_div == 0.0, not just small
    val out = sd.processBatch(corpus).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("js_div") == 0.0))
    // and reference/batch masses agree per language
    assert(out.forall(r =>
      r.getAs[Long]("n_tokens_a") == r.getAs[Long]("n_tokens_b")))
  }

  test("skewed batch reads positive bounded drift; missing langs absent") {
    val root = Files.createTempDirectory("graft-drift2").toString
    val sd = StreamingDrift(s"$root/ref")
    sd.buildReference(corpus)
    // a batch of gibberish tagged as one language: vocabulary almost
    // disjoint from the reference → JS near its ln 2 ceiling
    val bad = Seq((1L, "en", "zzqx vvnm qqpla wrrtk zzqx mmvnb")).
      toDF("doc_id", "lang", "text")
    val out = sd.processBatch(bad).collect()
    assert(out.length == 1) // only 'en' — reference-only langs absent
    val js = out.head.getAs[Double]("js_div")
    assert(js > 0.5 && js <= math.log(2.0) + 1e-9, s"js=$js")
  }

  test("foreachBatch wiring: per-batch rows, parity with direct compute") {
    val root = Files.createTempDirectory("graft-drift3").toString
    val sd = StreamingDrift(s"$root/ref")
    sd.buildReference(corpus)
    val d = corpus.limit(40).cache()
    d.repartition(2).write.parquet(s"$root/in")
    val stream = spark.readStream.schema(d.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
    val q = sd.attach(stream, s"$root/out", s"$root/ckpt")
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$root/out")
    assert(out.select("batch_id").distinct().count() == 2)
    assert(out.where(col("js_div").isNull || col("js_div") < 0).count() == 0)
    // each monitored batch row is reproducible by processBatch on the
    // same rows — code-path identity, so just sanity-check one batch:
    // total batch token mass across langs equals the direct count
    val massPerBatch = out.groupBy("batch_id")
      .agg(sum("n_tokens_b").as("m")).as[(Long, Long)].collect().toMap
    val totalMass = massPerBatch.values.sum
    val direct = d.select(
      sum(size(TextAnalysis.tokens(col("text"))))).head().getLong(0)
    assert(totalMass == direct,
      s"streamed mass $totalMass != direct $direct")
  }
}
