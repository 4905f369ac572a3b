package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis

/** Dev probe: map-side selectivity of the decontamination Bloom
  * pre-filter at sf0.1 — corpus fingerprint rows total vs passing the
  * bloom vs true benchmark matches (SCALE.md round-12 record). */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val corpus = graft.queries.LlmQueries.docsWithNearDups(spark, sfDir)
    val bench = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") % 13 === 0).select("doc_id", "text")
    val benchFps = bench.select(explode_outer(
        TextAnalysis.winnowFingerprints(col("text"), 4, 4)).as("fp"))
      .where(col("fp").isNotNull).distinct().localCheckpoint(true)
    val n = benchFps.count()
    val bloomBytes = benchFps.agg(ColumnBridge.column(
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(
            ColumnBridge.expression(col("fp")), n)
          .toAggregateExpression()).as("b")).head().getAs[Array[Byte]]("b")
    val mc = ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal.create(bloomBytes,
          org.apache.spark.sql.types.BinaryType),
        ColumnBridge.expression(col("fp"))))
    val docFps = corpus.select(col("doc_id"),
        explode_outer(TextAnalysis.winnowFingerprints(col("text"), 4, 4))
          .as("fp"))
      .where(col("fp").isNotNull).localCheckpoint(true)
    val total = docFps.count()
    val pass = docFps.where(mc).count()
    val exact = docFps.join(broadcast(benchFps), Seq("fp")).count()
    println(f"bench_fps=$n bloom_bytes=${bloomBytes.length} " +
      f"corpus_fp_rows=$total bloom_pass=$pass exact_match=$exact " +
      f"pass_frac=${pass.toDouble / total}%.4f " +
      f"fpp_observed=${(pass - exact).toDouble / (total - exact)}%.4f")
    spark.stop()
  }
}
