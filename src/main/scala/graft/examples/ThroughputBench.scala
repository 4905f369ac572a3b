package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.mock.MockGen
import graft.normalize.NormalizerSpec
import graft.ops.Stages
import graft.pipeline.{Decoders, Pipeline, PipelineConfig, ProtoCodec,
  ProtoRecord, WireCodec, WireRecord, WireSite}
import graft.sink.RotationPolicy
import graft.sources.{BinaryQueueSource, DataFrameSource, FileBinarySource, MessageSource}

/** Ingest-throughput measurement comparable in character to the
  * reference's published run (BASELINE.md: 398k records/s decode,
  * 806k rows/s raw+norm sink on 60 CPUs): generate N wire messages
  * (6-byte prefix + payload), run the full pipeline batch
  * (munge → decode → normalize → raw+norm parquet), print metrics.
  *
  * Three decode modes over the SAME logical record
  * (id, site{id,kind}, score, flag):
  *  - `json`            — untyped from_json decode (round-1 path)
  *  - `binary`          — hand-rolled length-prefixed codec through the
  *                        typed `unmarshalFunc` boundary (the
  *                        reference's protobuf-parity path,
  *                        /root/reference/proto.go:106-172)
  *  - `binary-columnar` — same wire format decoded entirely with
  *                        codegen'd expressions (the Spark-first path)
  *  - `proto`           — REAL protobuf wire format (varint/zigzag/
  *                        fixed64/nested, graft.pipeline.ProtoCodec)
  *                        through the typed boundary — the closest
  *                        analogue to the reference's generated-proto
  *                        decode (/root/reference/proto.go:106-172)
  *  - `proto-columnar`  — protobuf decoded by the one-pass codegen'd
  *                        `ProtoParseExpr`
  *
  * Usage: runMain graft.examples.ThroughputBench [nMessages] [mode]
  *   mode ∈ json | binary | binary-columnar | proto | proto-columnar |
  *          all (default all)
  */
object ThroughputBench {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("site", StructType(Seq(
      StructField("id", StringType), StructField("kind", StringType)))),
    StructField("score", DoubleType),
    StructField("flag", BooleanType)))

  /** Stage wire messages to parquet so generation cost is excluded;
    * spread like a real N-partition topic would arrive. */
  private def stage(spark: SparkSession, dir: String,
      msgs: DataFrame): DataFrame = {
    msgs.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
      .repartition(spark.sparkContext.defaultParallelism)
  }

  private def runMode(spark: SparkSession, root: String, mode: String,
      wire: DataFrame, decode: DataFrame => DataFrame, n: Long): Double = {
    val pipe = Pipeline(spark, PipelineConfig(
      source = DataFrameSource(wire),
      outputDir = s"$root/out_$mode",
      destTable = "msgs",
      munger = Some(Stages.confluentStrip),
      decode = decode,
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
    val recsPerSec = m.recordsProcessed.get / secs
    println(f"[$mode] messages=$n wall=$secs%.1f s")
    println(f"[$mode] decode+ingest records/s: $recsPerSec%.0f")
    println(f"[$mode] total sink rows/s (raw+norm): ${
      (m.recordsInserted.get + m.normRecordsInserted.get) / secs}%.0f")
    println(s"[$mode] conservation=${m.conservationHolds}")
    recsPerSec
  }

  /** SOURCE-inclusive sustained throughput: the full STREAMING path
    * (trigger planning → source read → munge → decode → ingest) over
    * multiple micro-batches — the shape of the reference's published
    * 398k rec/s, which is a consume-from-source number
    * (/root/reference/kafka.go:90-167), where [[runMode]] starts from
    * an already-read DataFrame. `binqueue` exercises the DSv2
    * `graft-binqueue` source (admission control + per-trigger
    * latestOffset) vs `file-stream`'s FileStreamSource over the SAME
    * frames. */
  private def runStreamMode(spark: SparkSession, root: String,
      mode: String, source: MessageSource,
      decode: DataFrame => DataFrame, n: Long): Double = {
    val pipe = Pipeline(spark, PipelineConfig(
      source = source,
      outputDir = s"$root/out_$mode",
      destTable = "msgs",
      munger = Some(Stages.confluentStrip),
      decode = decode,
      normalizer = Some(NormalizerSpec(
        Seq("id", "site.id", "site.kind", "score"),
        Seq("id", "site", "kind", "score"))),
      rotation = RotationPolicy(thresholdMB = 100000, durationSec = 100000,
        clamp = false),
      checkpointDir = Some(s"$root/ckpt_$mode")))
    val t0 = System.nanoTime()
    val q = pipe.run()
    q.processAllAvailable()
    pipe.close()
    val secs = (System.nanoTime() - t0) / 1e9
    val m = pipe.metrics
    val recsPerSec = m.recordsProcessed.get / secs
    println(f"[$mode] messages=$n wall=$secs%.1f s " +
      s"maxBatchRows=${m.maxBatchRows.get}")
    println(f"[$mode] decode+ingest records/s: $recsPerSec%.0f")
    println(s"[$mode] conservation=${m.conservationHolds}")
    recsPerSec
  }

  /** Stage the binary wire frames as a partitioned BinaryQueue log —
    * executor-parallel, one task per queue partition file. */
  private def stageQueue(wire: DataFrame, dir: String, parts: Int): Unit = {
    new java.io.File(dir).mkdirs()
    wire.select("value").repartition(parts).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        // append=false: a retried/speculative task OVERWRITES its own
        // partition file instead of appending a second copy (review
        // finding — duplicated frames would inflate rec/s and break
        // conservation)
        val out = new java.io.DataOutputStream(
          new java.io.BufferedOutputStream(new java.io.FileOutputStream(
            new java.io.File(dir, s"p$pid.log"), false), 1 << 20))
        try it.foreach { r =>
          val b = r.getAs[Array[Byte]](0)
          out.writeInt(b.length)
          out.writeLong(1700000000000L)
          out.write(b)
        } finally out.close()
    }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val mode = args.drop(1).headOption.getOrElse("all")
    require(Set("all", "json", "binary", "binary-columnar", "proto",
      "proto-columnar", "proto-columnar-slim", "binqueue",
      "file-stream")(mode),
      s"unknown mode '$mode' (json | binary | binary-columnar | proto " +
        "| proto-columnar | proto-columnar-slim | binqueue | " +
        "file-stream | all)")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft-tput").toString

    val rows = MockGen.batch(spark, schema, n, seed = 42)

    lazy val jsonWire = stage(spark, s"$root/msgs_json",
      MockGen.asMessages(rows, prefixBytes = 6))
    lazy val binWire = {
      implicit val enc = ExpressionEncoder[WireRecord]()
      implicit val benc = ExpressionEncoder[Array[Byte]]()
      val prefix = Array.fill[Byte](6)(0)
      stage(spark, s"$root/msgs_bin",
        rows.as[WireRecord].map(r => prefix ++ WireCodec.encode(r))
          .toDF("value")
          .withColumn("timestamp", current_timestamp()))
    }
    lazy val protoWire = {
      implicit val enc = ExpressionEncoder[WireRecord]()
      implicit val benc = ExpressionEncoder[Array[Byte]]()
      val prefix = Array.fill[Byte](6)(0)
      stage(spark, s"$root/msgs_proto",
        rows.as[WireRecord].map { r =>
          prefix ++ ProtoCodec.encode(ProtoRecord(r.id,
            WireSite(r.site.id, r.site.kind), r.score, r.flag, r.id - 500L))
        }.toDF("value")
          .withColumn("timestamp", current_timestamp()))
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    if (mode == "all" || mode == "json")
      results("json") = runMode(spark, root, "json", jsonWire,
        Decoders.json(schema), n)
    if (mode == "all" || mode == "binary")
      results("binary") = runMode(spark, root, "binary", binWire,
        Decoders.typed(WireCodec.decode), n)
    if (mode == "all" || mode == "binary-columnar")
      results("binary-columnar") = runMode(spark, root, "binary-columnar",
        binWire, WireCodec.decodeColumnar, n)
    if (mode == "all" || mode == "proto")
      results("proto") = runMode(spark, root, "proto", protoWire,
        Decoders.typed(ProtoCodec.decode), n)
    if (mode == "all" || mode == "proto-columnar")
      results("proto-columnar") = runMode(spark, root, "proto-columnar",
        protoWire, ProtoCodec.decodeColumnar, n)
    // like-for-like vs binary-columnar: the full wire walk still runs
    // (ProtoParseExpr computes the whole struct; CSE collapses the
    // getFields) but the raw sink carries the SAME logical record —
    // isolates decode cost from the array/map sink-width cost the
    // round-7 repeated/map columns added
    if (mode == "all" || mode == "proto-columnar-slim")
      results("proto-columnar-slim") = runMode(spark, root,
        "proto-columnar-slim", protoWire,
        df => ProtoCodec.decodeColumnar(df)
          .select("id", "site", "score", "flag", "timestamp", "_corrupt"),
        n)
    // source-inclusive STREAMING arms over the same frames + the same
    // (fastest) columnar decode, ~8 triggers each, so the source layer
    // is the only variable between them
    if (mode == "all" || mode == "binqueue") {
      val qDir = s"$root/binqueue"
      stageQueue(binWire, qDir, parts = 8)
      results("binqueue") = runStreamMode(spark, root, "binqueue",
        BinaryQueueSource(qDir, maxOffsetsPerTrigger = Some(n / 8)),
        WireCodec.decodeColumnar, n)
    }
    if (mode == "all" || mode == "file-stream") {
      binWire.count() // force the lazy staging of msgs_bin
      results("file-stream") = runStreamMode(spark, root, "file-stream",
        FileBinarySource(s"$root/msgs_bin",
          maxFilesPerTrigger = Some(4)),
        WireCodec.decodeColumnar, n)
    }

    if (results.size > 1) {
      val base = results.getOrElse("json", results.values.head)
      results.foreach { case (m, v) =>
        println(f"[summary] $m%-16s ${v}%11.0f rec/s (${v / base}%.2fx json)")
      }
    }
    spark.stop()
  }
}
