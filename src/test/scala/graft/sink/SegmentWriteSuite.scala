package graft.sink

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.{SparkSpec, Tables}
import graft.ops.Stages
import graft.sources.FileBinarySource

/** The DSv2 streaming segment sink (K1 through the real connector
  * write API): e2e parity with the library RotatingSegmentSink's
  * layout/manifest/rotation, epoch-marker exactly-once on replay, and
  * checked staging renames. */
class SegmentWriteSuite extends SparkSpec {
  import spark.implicits._

  private val payloadSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def writeMessages(dir: String): Long = {
    val ev = Tables.load(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    ev.select(
        concat(unhex(lit("0" * 12)),
          to_json(struct(ev.columns.map(col).toIndexedSeq: _*))
            .cast("binary")).as("value"),
        current_timestamp().as("timestamp"))
      .repartition(4)
      .write.mode("overwrite").parquet(dir)
    ev.count()
  }

  test("e2e: streaming write through graft-binsegment rotates per " +
      "batch with library-sink manifest/layout parity, no loss") {
    val root = Files.createTempDirectory("graft-dsv2sink").toString
    val msgDir = s"$root/messages"
    val out = s"$root/out"
    val n = writeMessages(msgDir)

    val src = FileBinarySource(msgDir, maxFilesPerTrigger = Some(2))
      .stream(spark)
    val decoded = Stages.decodeJson(payloadSchema)(
        Stages.munge(Stages.confluentStrip)(src))
      .where(col("_corrupt").isNull)
      .select("event_id", "user_id", "event_type", "value")
    val q = decoded.writeStream
      .format("graft-binsegment")
      .option("path", out)
      .option("table", "events_raw")
      .option("thresholdMB", "0") // rotate after every committing epoch
      .option("durationSec", "100000")
      .option("clamp", "false")
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    // manifest parity: same schema and content rules as the library
    // sink (shared RotatingSegmentSink code — pinned anyway)
    val manifest = spark.read.parquet(s"$out/_manifest")
    assert(manifest.columns.toSeq ==
      Seq("path", "seg_index", "closed_at", "size_mb", "tables"))
    val segs = manifest.select("path").as[String].collect().toSeq
    assert(segs.length >= 2,
      s"rotate-per-batch should close multiple segments: $segs")
    assert(manifest.select("tables").as[String].collect()
      .forall(_ == "events_raw"))
    // segment naming parity: prefix_ts_s<sinkId>_<index>
    assert(segs.forall(
      _.matches(""".*/seg_\d{4}-\d{2}-\d{2}_\d{2}-\d{2}-\d{2}_s\d+_\d+$""")),
      s"segment naming diverged: $segs")
    // no loss, no duplication — every event exactly once across parts
    val got = spark.read.parquet(segs.map(_ + "/events_raw"): _*)
    assert(got.count() == n)
    val expected = Tables.load(spark, sf0001, "events")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(got.select("event_id").as[Long].collect().sorted.toSeq ==
      expected, "DSv2 sink lost or duplicated rows")
    assert(got.schema.map(f => (f.name, f.dataType)) ==
      payloadSchema.map(f => (f.name, f.dataType)),
      "part files not schema-faithful")
    // staging fully cleaned
    val stg = new java.io.File(s"$out/.staging")
    assert(!stg.exists() || stg.listFiles().isEmpty,
      "staging dirs left behind")
  }

  test("finalRotate reaches the engine-constructed write: the tail " +
      "segment below threshold gets announced after query.stop()") {
    // review finding: Spark builds SegmentStreamingWrite internally,
    // so without the registry no caller could close the last open
    // segment — sub-threshold tail data existed on disk but never
    // reached the manifest (the documented read contract).
    val root = Files.createTempDirectory("graft-dsv2tail").toString
    val msgDir = s"$root/messages"
    val out = s"$root/out"
    val n = writeMessages(msgDir)
    val q = Stages.decodeJson(payloadSchema)(
        Stages.munge(Stages.confluentStrip)(
          FileBinarySource(msgDir).stream(spark)))
      .where(col("_corrupt").isNull)
      .select("event_id", "user_id", "event_type", "value")
      .writeStream
      .format("graft-binsegment")
      .option("path", out)
      .option("table", "events_raw")
      .option("thresholdMB", "100000") // never rotates on its own
      .option("durationSec", "100000")
      .option("clamp", "false")
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    // nothing announced yet — the data is invisible per the contract
    assert(!new java.io.File(s"$out/_manifest").exists(),
      "sub-threshold segment rotated prematurely")
    val info = SegmentWrites.finalRotate(out)
    assert(info.nonEmpty, "finalRotate found no registered write")
    val manifest = spark.read.parquet(s"$out/_manifest")
    val segs = manifest.select("path").as[String].collect().toSeq
    assert(segs.size == 1)
    val got = spark.read.parquet(s"${segs.head}/events_raw")
    assert(got.count() == n, "tail segment missing rows")
    // idempotent: nothing pending → no second announcement
    assert(SegmentWrites.finalRotate(out).isEmpty)
    // registry entry dropped with the rotate (ADVICE r13 leak): stale
    // instances from this stopped query cannot be reached again
    assert(SegmentWrites.registeredCount(out) == 0,
      "finalRotate left instances registered for the JVM lifetime")
  }

  test("epoch replay hits the marker and is discarded; rename failures " +
      "surface instead of losing the epoch") {
    val root = Files.createTempDirectory("graft-dsv2replay").toString
    val out = s"$root/out"
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType)))
    val write = new SegmentStreamingWrite(out, schema,
      table = "t", prefix = "seg",
      policy = RotationPolicy(thresholdMB = 1000000, durationSec = 1000000,
        clamp = false),
      writeManifest = true)
    val factory = write.createStreamingWriterFactory(null)

    def runEpoch(epochId: Long, ids: Seq[Long]): WriterCommitMessage = {
      val w = factory.createWriter(0, epochId * 10, epochId)
      ids.foreach(i =>
        w.write(InternalRow(i, UTF8String.fromString(s"n$i"))))
      w.commit()
    }
    def visibleIds(): Seq[Long] = {
      val dir = new java.io.File(out)
      val segDirs = dir.listFiles().filter(_.isDirectory)
        .filter(_.getName.startsWith("seg_"))
      val tdirs = segDirs.map(_.getPath + "/t").filter(p =>
        new java.io.File(p).exists())
      if (tdirs.isEmpty) Nil
      else spark.read.parquet(tdirs.toIndexedSeq: _*)
        .select("id").as[Long].collect().sorted.toSeq
    }

    write.commit(0L, Array(runEpoch(0L, Seq(1L, 2L))))
    assert(visibleIds() == Seq(1L, 2L))
    // replay of epoch 0 (its checkpoint commit was lost): marker makes
    // the re-run a no-op — rows NOT doubled, staging cleaned
    write.commit(0L, Array(runEpoch(0L, Seq(1L, 2L))))
    assert(visibleIds() == Seq(1L, 2L), "replayed epoch re-appended")
    assert(!new java.io.File(s"$out/.staging/e0").exists())
    // a fresh epoch still lands
    write.commit(1L, Array(runEpoch(1L, Seq(3L))))
    assert(visibleIds() == Seq(1L, 2L, 3L))
    // a commit message pointing at a missing staged file must throw
    // loudly (the local FS raises its own IOException; an HDFS-style
    // rename-returns-false hits our checked throw), never silently
    // drop the epoch
    val err = intercept[java.io.IOException](write.commit(2L,
      Array(SegmentCommitMessage(0, s"$out/.staging/e2/ghost.parquet", 5L))))
    assert(err.getMessage.contains("ghost.parquet"),
      s"unactionable message: ${err.getMessage}")
    assert(!new java.io.File(s"$out/_epochs/e2").exists(),
      "failed epoch must not be marked committed")
    // empty epochs write markers but never announce empty segments
    write.commit(3L, Array(SegmentCommitMessage(0, "unused", 0L)))
    assert(new java.io.File(s"$out/_epochs/e3").exists())
    val manifested = new java.io.File(s"$out/_manifest")
    assert(!manifested.exists(), "rotation fired before any threshold")
  }
}
