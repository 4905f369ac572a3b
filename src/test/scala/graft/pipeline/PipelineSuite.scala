package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}
import graft.ops.{CustomTransform, Stages}
import graft.normalize.NormalizerSpec
import graft.runner.{QuerySink, SegmentQuery, SegmentRunner}
import graft.sink.RotationPolicy
import graft.sources.FileBinarySource

class PipelineSuite extends SparkSpec {
  import spark.implicits._

  private val payloadSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** events → Confluent-style wire messages (6 garbage prefix bytes +
    * JSON payload), parquet-backed so FileBinarySource streams them. */
  private def writeMessages(dir: String, corrupt: Int = 0): Long = {
    val ev = Tables.load(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    val msgs = ev.select(
      concat(unhex(lit("0" * 12)),
        to_json(struct(ev.columns.map(col).toIndexedSeq: _*)).cast("binary"))
        .as("value"),
      current_timestamp().as("timestamp"))
    val bad = spark.range(corrupt).select(
      concat(unhex(lit("0" * 12)), lit("not-json-%".getBytes).cast("binary"))
        .as("value"),
      current_timestamp().as("timestamp"))
    msgs.unionAll(bad).repartition(4)
      .write.mode("overwrite").parquet(dir)
    msgs.count() + corrupt
  }

  test("end-to-end: munge → decode → norm+raw+custom → rotate → runner → manifest") {
    val root = Files.createTempDirectory("graft-e2e").toString
    val msgDir = s"$root/messages"
    val outDir = s"$root/out"
    val nMsgs = writeMessages(msgDir, corrupt = 25)
    val nGood = nMsgs - 25

    @volatile var runnerSegments = 0
    @volatile var runnerRowsSeen = 0L
    val runner = SegmentRunner(exec = false,
      queryFunc = Some { (s, views) =>
        runnerSegments += 1
        views.get("events_raw").foreach(df => runnerRowsSeen += df.count())
      })

    val pipe = Pipeline(spark, PipelineConfig(
      source = FileBinarySource(msgDir, maxFilesPerTrigger = Some(2)),
      outputDir = outDir,
      destTable = "events_raw",
      pathPrefix = "duck",
      munger = Some(Stages.confluentStrip),
      decode = Decoders.json(payloadSchema),
      customFields = Seq(Stages.CustomField("ingest_day",
        org.apache.spark.sql.types.StringType,
        value = date_format(col("timestamp"), "yyyy-MM-dd"))),
      deadLetterTable = Some("dead_letters"),
      normalizer = Some(NormalizerSpec(
        Seq("event_id", "event_type", "value"),
        Seq("event_id", "kind", "v"))),
      customTransforms = Seq(CustomTransform("by_type",
        df => df.groupBy("event_type").agg(count(lit(1)).as("n")))),
      rotation = RotationPolicy(thresholdMB = 0, durationSec = 100000,
        clamp = false), // rotate after every batch
      runner = Some(runner)))

    val q = pipe.run()
    q.processAllAvailable()
    pipe.close()

    val m = pipe.metrics
    assert(m.messagesConsumed.get == nMsgs)
    assert(m.recordsProcessed.get == nGood)
    assert(m.decodeErrors.get == 25)
    assert(m.catchUpSkips.get == 0)
    assert(m.conservationHolds, "consumed = processed + errors + skips")
    assert(m.recordsInserted.get == nGood)
    assert(m.normRecordsInserted.get == nGood) // no list fan-out
    assert(m.filesClosed.get >= 2, "maxFilesPerTrigger=2 over 4 files → ≥2 segments")
    assert(pipe.error.isEmpty)

    // runner saw every segment and every raw row exactly once
    assert(runnerSegments.toLong == m.filesClosed.get)
    assert(runnerRowsSeen == nGood)

    // micro-batch lag telemetry (queue-depth parity): close() drains
    // recentProgress, so telemetry is deterministic by now
    assert(m.hasBatchTelemetry, "no StreamingQueryProgress recorded")
    assert(m.maxBatchRows.get > 0 && m.maxBatchRows.get <= nMsgs,
      s"max_batch_rows ${m.maxBatchRows.get} out of (0, $nMsgs]")
    val rep = m.report()
    Seq("max_batch_rows", "last_batch_duration_ms",
      "last_batch_input_rps", "last_batch_processed_rps")
      .foreach(k => assert(rep.contains("\"" + k + "\""), k))

    // segment dirs + manifest
    val segs = pipe.closedSegments()
    assert(segs.length.toLong == m.filesClosed.get)
    val manifest = spark.read.parquet(s"$outDir/_manifest")
    assert(manifest.count() == m.filesClosed.get)
    val manifestTables = manifest.select("tables").as[String].collect()
    assert(manifestTables.forall(_.contains("events_raw")))

    // data round-trip: union of all segments == decoded input
    val rawAll = spark.read.parquet(
      manifest.select("path").as[String].collect().map(_ + "/events_raw"): _*)
    assert(rawAll.count() == nGood)
    // N2 custom field present and populated on every ingested row
    assert(rawAll.where(col("ingest_day").rlike("\\d{4}-\\d{2}-\\d{2}"))
      .count() == nGood)
    val normAll = spark.read.parquet(
      manifest.select("path").as[String].collect().map(_ + "/events_raw_norm"): _*)
    assert(normAll.columns.toSeq == Seq("event_id", "kind", "v"))
    // dead letters landed
    val deadAll = spark.read.parquet(
      manifest.select("path").as[String].collect()
        .filter(p => new java.io.File(s"$p/dead_letters").exists())
        .map(_ + "/dead_letters"): _*)
    assert(deadAll.count() == 25)
    // by_type custom table aggregates to the same total
    val byType = spark.read.parquet(
      manifest.select("path").as[String].collect()
        .filter(p => new java.io.File(s"$p/by_type").exists())
        .map(_ + "/by_type"): _*)
    assert(byType.agg(sum("n")).head().getLong(0) == nGood)
  }

  test("runner export mode writes a per-segment artifact (COPY-TO parity)") {
    val root = Files.createTempDirectory("graft-export").toString
    val nMsgs = writeMessages(s"$root/messages")
    val runner = SegmentRunner(queries = Seq(
      // export: aggregate per segment → parquet under the segment dir
      SegmentQuery(
        "SELECT event_type, count(*) AS n FROM events_raw GROUP BY event_type",
        Some(QuerySink("${segment}/_export/by_type"))),
      // effect-only command: runs eagerly, nothing collected (temp
      // views are lazy plans, so it must not reference segment views
      // that are dropped when the runner finishes)
      SegmentQuery("CREATE OR REPLACE TEMP VIEW last_seg AS SELECT 42 AS n"),
      // result-bearing, no sink: must execute without driver collect
      SegmentQuery("SELECT * FROM events_raw")))
    val pipe = Pipeline(spark, PipelineConfig(
      source = FileBinarySource(s"$root/messages", maxFilesPerTrigger = Some(2)),
      outputDir = s"$root/out",
      destTable = "events_raw",
      munger = Some(Stages.confluentStrip),
      decode = Decoders.json(payloadSchema),
      rotation = RotationPolicy(thresholdMB = 0, durationSec = 100000,
        clamp = false),
      runner = Some(runner)))
    val q = pipe.run()
    q.processAllAvailable()
    pipe.close()
    assert(pipe.error.isEmpty)
    val segs = pipe.closedSegments()
    assert(segs.length >= 2)
    // every segment carries its export; union equals the full input
    val exported = segs.map(s =>
      spark.read.parquet(s"${s.path}/_export/by_type"))
    exported.foreach(df =>
      assert(df.columns.toSeq == Seq("event_type", "n")))
    val total = exported.reduce(_ unionAll _)
      .agg(sum("n")).head().getLong(0)
    assert(total == nMsgs)
    // the effect-only command ran (temp view left behind by last segment)
    assert(spark.sql("SELECT n FROM last_seg").head().getInt(0) == 42)
    spark.catalog.dropTempView("last_seg")
  }

  test("runner guards: deleteOnDone×segment-export and unresolved ${segment}") {
    // deleting the segment right after exporting into it is rejected
    intercept[IllegalArgumentException] {
      SegmentRunner(queries = Seq(SegmentQuery("SELECT 1",
        Some(QuerySink("${segment}/_export")))), deleteOnDone = true)
    }
    // ${segment} with no segmentDir is an accumulated error, not a
    // silent write into a literal '${segment}' directory
    // ...and the rejection happens BEFORE the statement executes, so
    // an eagerly-run command's side effect cannot land
    val r = SegmentRunner(queries = Seq(SegmentQuery(
      "CREATE OR REPLACE TEMP VIEW guard_probe AS SELECT 1 AS x",
      Some(QuerySink("${segment}/_export")))))
    val errs = r.run(spark, Map.empty)
    assert(errs.exists(_.getMessage.contains("segmentDir")))
    assert(!spark.catalog.tableExists("guard_probe"),
      "side effect committed before sink validation")
  }

  test("batch telemetry: last-batch fields track the latest batch id") {
    val m = new PipelineMetrics()
    m.recordBatch(0L, 500, 30000, 10.0, 20.0) // slow cold start
    m.recordBatch(1L, 900, 200, 1000.0, 2000.0)
    m.recordBatch(0L, 500, 30000, 10.0, 20.0) // close-time replay
    val r = m.report()
    assert(r.contains("\"last_batch_duration_ms\": 200"), r)
    assert(r.contains("\"max_batch_rows\": 900"), r)
    // restart without checkpoint restarts batch ids at 0 — clearEnd
    // re-arms the monotone guard so the new run's telemetry lands
    m.clearEnd()
    m.recordBatch(0L, 100, 350, 5.0, 6.0)
    assert(m.report().contains("\"last_batch_duration_ms\": 350"))
  }

  test("closedSegments drains exactly once (DuckPaths parity)") {
    val root = Files.createTempDirectory("graft-drain").toString
    writeMessages(s"$root/messages")
    val pipe = Pipeline(spark, PipelineConfig(
      source = FileBinarySource(s"$root/messages"),
      outputDir = s"$root/out",
      munger = Some(Stages.confluentStrip),
      decode = Decoders.json(payloadSchema)))
    val q = pipe.run()
    q.processAllAvailable()
    pipe.close()
    val first = pipe.closedSegments()
    assert(first.nonEmpty)
    assert(pipe.closedSegments().isEmpty)
  }

  test("typed decoder routes CatchUpSkip and Failed (proto.go:133-145 parity)") {
    val root = Files.createTempDirectory("graft-typed").toString
    // wire format: "id|name"; id%10==9 → catch-up; id%10==5 → bad
    val msgs = spark.range(100).select(
      concat(col("id").cast("string"), lit("|name"),
        col("id").cast("string")).cast("binary").as("value"),
      current_timestamp().as("timestamp"))
    msgs.write.mode("overwrite").parquet(s"$root/messages")

    val decode = Decoders.typed[KV] { bytes =>
      val s = new String(bytes)
      val Array(id, name) = s.split('|')
      if (id.toLong % 10 == 9) DecodeResult.CatchUpSkip
      else if (id.toLong % 10 == 5) DecodeResult.Failed("bad record")
      else DecodeResult.Ok(KV(id.toLong, name))
    }

    val pipe = Pipeline(spark, PipelineConfig(
      source = FileBinarySource(s"$root/messages"),
      outputDir = s"$root/out",
      destTable = "kv",
      decode = decode))
    val q = pipe.run()
    q.processAllAvailable()
    pipe.close()

    val m = pipe.metrics
    assert(m.messagesConsumed.get == 100)
    assert(m.recordsProcessed.get == 80)
    assert(m.decodeErrors.get == 10)
    assert(m.catchUpSkips.get == 10)
    assert(m.conservationHolds)
  }

  test("wire stats ride the decode scan: ONE source pass per micro-batch") {
    val root = Files.createTempDirectory("graft-onescan").toString
    val n = writeMessages(s"$root/messages")
    val recordsRead = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        recordsRead.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val pipe = Pipeline(spark, PipelineConfig(
        source = FileBinarySource(s"$root/messages"),
        outputDir = s"$root/out",
        destTable = "events_raw",
        munger = Some(Stages.confluentStrip),
        decode = Decoders.json(payloadSchema)))
      val q = pipe.run()
      q.processAllAvailable()
      pipe.close()
      assert(pipe.metrics.messagesConsumed.get == n)
      assert(pipe.metrics.bytesProcessed.get > 0)
      assert(pipe.metrics.recordsInserted.get == n)
      // listener events are async — wait for the count to go quiet
      var last = -1L
      var spins = 0
      while (recordsRead.get != last && spins < 50) {
        last = recordsRead.get; spins += 1; Thread.sleep(100)
      }
      // InputMetrics also counts persisted-block reads (a handful of
      // columnar-batch units per post-decode job), so allow slack well
      // under the 2n a second source scan would add.
      assert(recordsRead.get >= n && recordsRead.get < n * 3 / 2,
        s"source rows read ${recordsRead.get} vs $n — second scan regressed")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("restart reopens a closed pipeline and resumes offsets (RestartDuck parity)") {
    val root = Files.createTempDirectory("graft-restart").toString
    val n1 = writeMessages(s"$root/messages")
    val pipe = Pipeline(spark, PipelineConfig(
      source = FileBinarySource(s"$root/messages"),
      outputDir = s"$root/out",
      destTable = "events_raw",
      munger = Some(Stages.confluentStrip),
      decode = Decoders.json(payloadSchema),
      checkpointDir = Some(s"$root/ckpt")))
    intercept[IllegalArgumentException](pipe.restart()) // not closed yet
    pipe.run().processAllAvailable()
    pipe.close()
    assert(pipe.isClosed)
    assert(pipe.metrics.messagesConsumed.get == n1)
    val segsBefore = pipe.closedSegments().map(_.index)

    // more input lands while closed; restart resumes from the committed
    // offset (no re-read of the first batch) and keeps counting
    val extra = Tables.load(spark, sf0001, "events").limit(100)
      .select(concat(unhex(lit("0" * 12)),
        to_json(struct(col("event_id"), col("user_id"), col("event_type"),
          col("value"))).cast("binary")).as("value"),
        current_timestamp().as("timestamp"))
    extra.write.mode("append").parquet(s"$root/messages")
    pipe.restart().processAllAvailable()
    pipe.close()
    assert(pipe.metrics.messagesConsumed.get == n1 + 100,
      "restart must resume, not re-read")
    val segsAfter = pipe.closedSegments().map(_.index)
    assert(segsAfter.nonEmpty && segsBefore.intersect(segsAfter).isEmpty,
      "segment numbering continues across restart")
  }

  test("metrics report carries the reference field names") {
    val m = new PipelineMetrics(normalizerFields = Some(10))
    m.recordsProcessed.set(123686901L)
    val r = m.report()
    Seq("num_cpu", "runtime_os", "kafka_clients", "kafka_queue_cap",
      "processor_routines", "arrow_queue_cap", "duckdb_threshold_mb",
      "duckdb_connections", "normalizer_fields", "start_time",
      "records", "data_transferred", "duration", "records_per_second",
      "total_rows_per_second", "transfer_rate", "duckdb_files",
      "duckdb_files_MB").foreach(k => assert(r.contains("\"" + k + "\""), k))
    assert(r.contains("123_686_901.00")) // util.go grouping parity
    // batch telemetry fields only appear once progress is observed
    assert(!r.contains("max_batch_rows"))
  }

  test("extractAppendedMillis recovers the reference's LE byte-append (S6)") {
    val ts = 1708800383123L // known millis
    val payload = "hello".getBytes("UTF-8")
    val le = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(ts).array()
    val df = Seq((payload ++ le, "x")).toDF("value", "tag")
    val out = Stages.extractAppendedMillis(df)
    val row = out.select(col("msg_ts").cast("long"), col("value")).head()
    assert(row.getLong(0) == ts / 1000 * 1000 / 1000) // seconds via cast
    val got = out.select(unix_millis(col("msg_ts")), col("value")).head()
    assert(got.getLong(0) == ts)
    assert(new String(got.getAs[Array[Byte]](1), "UTF-8") == "hello")
  }
}

case class KV(id: Long, name: String)
