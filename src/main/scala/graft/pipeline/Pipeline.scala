package graft.pipeline

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.normalize.{Normalizer, NormalizerSpec}
import graft.ops.{CustomTransform, Stages}
import graft.runner.SegmentRunner
import graft.sink.{RotatingSegmentSink, RotationPolicy, SegmentInfo}
import graft.sources.MessageSource

/** Decode outcomes — parity with the reference's decode-error routing
  * (/root/reference/proto.go:133-145): "catch-up" errors skip the
  * message silently; other errors are recorded and the message routed
  * to the dead-letter frame; the pipeline continues either way. */
sealed trait DecodeResult[+T]
object DecodeResult {
  final case class Ok[T](value: T) extends DecodeResult[T]
  case object CatchUpSkip extends DecodeResult[Nothing]
  final case class Failed(message: String) extends DecodeResult[Nothing]
}

object Decoders {
  /** Untyped JSON decoder (PERMISSIVE; corrupt rows → `_corrupt`). */
  def json(schema: StructType, extra: Map[String, Column] = Map.empty)
      : DataFrame => DataFrame =
    Stages.decodeJson(schema, extra)

  /** Typed pluggable decoder — the reference's `unmarshalFunc`
    * boundary (/root/reference/proto.go:33, README.md:104-137): a user
    * `Array[Byte] => DecodeResult[T]`. Protobuf users plug their
    * generated parser here; the engine never assumes a wire format. */
  def typed[T <: Product : TypeTag](fn: Array[Byte] => DecodeResult[T])
      : DataFrame => DataFrame = { df =>
    implicit val enc: Encoder[(Option[T], java.sql.Timestamp, String)] =
      ExpressionEncoder()
    val ds = df.select(col("value"), col("timestamp"))
      .as[(Array[Byte], java.sql.Timestamp)](
        ExpressionEncoder[(Array[Byte], java.sql.Timestamp)]())
    ds.mapPartitions { it =>
      it.flatMap { case (bytes, ts) =>
        fn(bytes) match {
          case DecodeResult.Ok(v) =>
            Iterator((Some(v), ts, null.asInstanceOf[String]))
          case DecodeResult.CatchUpSkip => Iterator.empty
          case DecodeResult.Failed(m) =>
            Iterator((Option.empty[T], ts, m))
        }
      }
    }.toDF("rec", "timestamp", "_corrupt")
      .select(col("rec.*"), col("timestamp"), col("_corrupt"))
  }
}

/** Pipeline configuration — option-for-option parity with the
  * reference's `Orchestrator` options (/root/reference/quacfka.go:26-126). */
final case class PipelineConfig(
    source: MessageSource,
    outputDir: String,
    destTable: String = "msgs",
    pathPrefix: String = "seg",
    munger: Option[Column => Column] = None, // WithMsgMunger
    decode: DataFrame => DataFrame = identity, // unmarshalFunc boundary
    hasCorruptRouting: Boolean = false,
    deadLetterTable: Option[String] = None,
    normalizer: Option[NormalizerSpec] = None, // WithNormalizer
    customFields: Seq[Stages.CustomField] = Nil, // WithCustomFields
    customTransforms: Seq[CustomTransform] = Nil, // WithCustomArrows
    ingestRaw: Boolean = true, // !WithoutDuckIngestRaw (quacfka.go:122-126)
    rotation: RotationPolicy = RotationPolicy(),
    runner: Option[SegmentRunner] = None, // WithDuckRunner
    trigger: Option[Trigger] = None,
    checkpointDir: Option[String] = None)

/** O1 — the orchestrator/pipeline driver
  * (/root/reference/quacfka.go:218-257), Spark-native: one streaming
  * query source → munge → foreachBatch{decode once; append custom,
  * norm, raw; rotate; run segment SQL}. The reference's three
  * channel-decoupled thread pools collapse into Spark stages — a
  * map-only pipeline stays fused in a single whole-stage-codegen span
  * per micro-batch (no queue hand-offs), and sink parallelism is
  * partition parallelism.
  */
final class Pipeline(val spark: SparkSession, val config: PipelineConfig) {

  val metrics = new PipelineMetrics(
    processorRoutines = spark.sparkContext.defaultParallelism,
    thresholdMB = config.rotation.effectiveThresholdMB,
    normalizerFields = config.normalizer.map(_.fields.length),
    customArrows =
      if (config.customTransforms.isEmpty) None
      else Some(config.customTransforms.length))

  val sink = new RotatingSegmentSink(spark, config.outputDir,
    config.pathPrefix, config.rotation, config.runner, Some(metrics))

  @volatile private var query: Option[StreamingQuery] = None
  @volatile private var closed = false

  /** Live micro-batch telemetry (queue-depth parity — see
    * PipelineMetrics.recordProgress). Name-matched so concurrent
    * pipelines on one session don't cross-feed. */
  private val progressListener =
    new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.name == s"graft-${config.destTable}")
          metrics.recordProgress(e.progress)
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }

  /** Process one micro-batch (also callable on a batch DataFrame — the
    * reference's stage-skipping lets users feed channels directly,
    * quacfka.go:262-283; this is the Spark analog). */
  def processBatch(batch: DataFrame): Unit = try {
    // Wire-level stats (S7 byte counter + consumed count) ride the
    // decode scan as observe() named metrics — ONE source scan per
    // micro-batch. (Round 1-2 ran a separate agg().head() over the
    // wire bytes first: a 2× source-read amplification, the single
    // worst cost in the pipeline path at 100 TB.)
    val obs = org.apache.spark.sql.Observation()
    val observed = batch.observe(obs,
      count(lit(1)).as("consumed"),
      sum(length(col("value"))).as("bytes"))

    val munged = config.munger.fold(observed)(m => Stages.munge(m)(observed))
    // Decode ONCE: cache the decoded frame so good/dead routing and
    // every sink table read the parse result, not re-parse the wire
    // bytes (the reference likewise decodes once per message and fans
    // out the Record pair, proto.go:148-156).
    val decodedAll = Stages.customFields(config.customFields)(
      config.decode(munged)).persist()
    val (good, dead) =
      if (decodedAll.columns.contains("_corrupt"))
        Stages.routeErrors(decodedAll)
      else (decodedAll, null)

    try {
      // This count materializes the cache — the one pass over the
      // source — and thereby completes the observation.
      val goodN = good.count()
      val stats = obs.get
      val consumed = stats("consumed").asInstanceOf[Long]
      metrics.messagesConsumed.addAndGet(consumed)
      Option(stats("bytes")).foreach(b =>
        metrics.bytesProcessed.addAndGet(b.asInstanceOf[Long]))
      metrics.recordsProcessed.addAndGet(goodN)
      var deadN = 0L
      if (dead != null) {
        deadN = config.deadLetterTable
          .map(t => sink.append(t, dead))
          .getOrElse(dead.count())
        metrics.decodeErrors.addAndGet(deadN)
      }
      metrics.catchUpSkips.addAndGet(math.max(0L, consumed - goodN - deadN))

      // Ingest order parity: custom tables, then norm, then raw
      // (/root/reference/duck.go:353-371,473-518).
      config.customTransforms.foreach { ct =>
        metrics.customRecordsInserted.addAndGet(
          sink.append(ct.destinationTable, ct.fn(good)))
      }
      config.normalizer.foreach { spec =>
        metrics.normRecordsInserted.addAndGet(
          sink.append(s"${config.destTable}_norm",
            Normalizer.normalize(good.drop("_corrupt"), spec)))
      }
      if (config.ingestRaw) {
        metrics.recordsInserted.addAndGet(
          sink.append(config.destTable, good))
      }
      sink.maybeRotate()
    } finally decodedAll.unpersist()
  } catch {
    case t: Throwable => metrics.recordError(t); throw t
  }

  /** Start the streaming query (Run parity, quacfka.go:218-257). */
  def run(): StreamingQuery = synchronized {
    require(query.isEmpty, "pipeline already running")
    val src = config.source.stream(spark)
    var w = src.writeStream
      .queryName(s"graft-${config.destTable}")
      .foreachBatch { (batch: DataFrame, _: Long) => processBatch(batch) }
    config.trigger.foreach(t => w = w.trigger(t))
    config.checkpointDir.foreach(d => w = w.option("checkpointLocation", d))
    spark.streams.addListener(progressListener)
    val q = w.start()
    query = Some(q)
    q
  }

  /** Drain closed-segment announcements (DuckPaths parity). */
  def closedSegments(): Seq[SegmentInfo] = sink.closedSegments()

  def error: Option[Throwable] = metrics.error

  /** Stop + close final segment (Close parity, quacfka.go:202-216:
    * final partial flush and last path emit). */
  def close(): Unit = synchronized {
    if (!closed) {
      query.foreach { q =>
        // Deterministic lag-telemetry drain: listener events are
        // async and may still be in flight — recordProgress is
        // idempotent under this replay.
        q.recentProgress.foreach(metrics.recordProgress)
        q.stop()
      }
      spark.streams.removeListener(progressListener)
      if (sink.hasPendingWrites) sink.rotate() // emit final partial segment
      metrics.markEnd()
      closed = true
    }
  }
  def isClosed: Boolean = closed

  /** Reopen a closed pipeline — `RestartDuck` parity
    * (/root/reference/duck.go:209-220: requires a prior configuration
    * and a closed orchestrator). The same config and sink resume: the
    * segment index keeps counting, metrics keep accumulating (the
    * end-time freeze from close() is lifted). With a configured
    * `checkpointDir` the new streaming query resumes from the last
    * committed offset; without one it re-reads the source from
    * scratch (standard Structured Streaming semantics). */
  def restart(): StreamingQuery = synchronized {
    require(closed, "pipeline is not closed (RestartDuck parity)")
    closed = false
    query = None
    metrics.clearEnd()
    run()
  }
}

object Pipeline {
  def apply(spark: SparkSession, config: PipelineConfig): Pipeline =
    new Pipeline(spark, config)
}
