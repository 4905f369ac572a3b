package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}

class EventTimeOpsSuite extends SparkSpec {
  import spark.implicits._

  // Watermarks require TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
  // on TIMESTAMP_NTZ), so cast the NTZ fixture column; the session
  // pins UTC so the mapping is fixed. The batch-side oracled query
  // (op_event_window) has no watermark and stays NTZ end-to-end.
  private def eventsWithTs = Tables.load(spark, sf0001, "events")
    .select(col("ts").cast("timestamp").as("ets"),
      col("event_type"), col("value"), col("event_id"), col("user_id"))

  test("streaming windowed agg (watermark) equals the batch result") {
    val dir = Files.createTempDirectory("graft-stream").toString
    eventsWithTs.repartition(3).write.parquet(s"$dir/in")

    val batch = EventTimeOps.tumblingCounts(
      eventsWithTs, "ets", "event_type", "value", "1 hour")
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet

    val streamIn = spark.readStream
      .schema(eventsWithTs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val agg = EventTimeOps.tumblingCounts(
      streamIn, "ets", "event_type", "value", "1 hour",
      watermark = Some("1 hour"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_out")
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming dedup drops re-delivered events within the watermark") {
    val dir = Files.createTempDirectory("graft-dedup").toString
    val ev = eventsWithTs.limit(200)
    // simulate at-least-once redelivery: every event written twice
    ev.unionAll(ev).repartition(4).write.parquet(s"$dir/in")

    val streamIn = spark.readStream.schema(ev.schema)
      .parquet(s"$dir/in")
    val deduped = EventTimeOps.dedupByKey(streamIn, "ets",
      Seq("event_id"), watermark = "2 hours")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable()
    q.stop()

    assert(spark.table("dedup_out").count() == 200)
    assert(spark.table("dedup_out").select("event_id").distinct().count()
      == 200)
  }

  test("session windows group events by gap per user") {
    val out = EventTimeOps.sessionCounts(eventsWithTs, "ets", "user_id",
      gap = "30 minutes", watermark = "1 hour")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // session totals conserve events
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      eventsWithTs.count())
  }
}
