package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.mock.MockGen
import graft.normalize.NormalizerSpec
import graft.ops.Stages
import graft.pipeline.{Decoders, Pipeline, PipelineConfig}
import graft.sink.RotationPolicy
import graft.sources.DataFrameSource

/** Ingest-throughput measurement comparable in character to the
  * reference's published run (BASELINE.md: 398k records/s decode,
  * 806k rows/s raw+norm sink on 60 CPUs): generate N wire messages
  * (6-byte prefix + JSON payload of a nested schema), run the full
  * pipeline batch (munge → decode → normalize → raw+norm parquet),
  * print the metrics report.
  *
  * Usage: runMain graft.examples.ThroughputBench [nMessages]
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft-tput").toString

    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("site", StructType(Seq(
        StructField("id", StringType), StructField("kind", StringType)))),
      StructField("score", DoubleType),
      StructField("flag", BooleanType)))

    // Materialize wire messages first so generation cost is excluded.
    val msgs = MockGen.asMessages(
      MockGen.batch(spark, schema, n, seed = 42), prefixBytes = 6)
    msgs.write.mode("overwrite").parquet(s"$root/msgs")
    // A real Kafka topic presents N partitions; the parquet staging
    // file is a single split — spread it like the source would.
    val wire = spark.read.parquet(s"$root/msgs")
      .repartition(spark.sparkContext.defaultParallelism)

    val pipe = Pipeline(spark, PipelineConfig(
      source = DataFrameSource(wire),
      outputDir = s"$root/out",
      destTable = "msgs",
      munger = Some(Stages.confluentStrip),
      decode = Decoders.json(schema),
      normalizer = Some(NormalizerSpec(
        Seq("id", "site.id", "site.kind", "score"),
        Seq("id", "site", "kind", "score"))),
      rotation = RotationPolicy(thresholdMB = 100000, durationSec = 100000,
        clamp = false)))

    val t0 = System.nanoTime()
    pipe.processBatch(wire)
    pipe.close()
    val secs = (System.nanoTime() - t0) / 1e9
    val m = pipe.metrics
    println(f"messages=$n, wall=${secs}%.1f s")
    println(f"decode+ingest records/s: ${m.recordsProcessed.get / secs}%.0f")
    println(f"total sink rows/s (raw+norm): ${
      (m.recordsInserted.get + m.normRecordsInserted.get) / secs}%.0f")
    println(s"conservation=${m.conservationHolds}")
    println(m.report())
    spark.stop()
  }
}
