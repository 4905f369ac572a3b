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

  test("sessionStats: known gaps split exactly, boundary is CLOSED") {
    import java.sql.Timestamp
    def ts(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm:00")
    val ev = Seq(
      (1L, ts("10:00"), 1.0), // session A
      (1L, ts("10:20"), 2.0), // +20min < 30 → A
      (1L, ts("10:50"), 4.0), // +30min EXACTLY → still A (closed
                              // boundary — pins the oracle's strict >)
      (1L, ts("11:21"), 8.0), // +31min > 30 → new session B
      (2L, ts("10:00"), 16.0) // other user → own session
    ).toDF("user_id", "ts", "value")
    val out = EventTimeOps.sessionStats(ev, "ts", "user_id", "value",
      "30 minutes").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start"),
        r.getAs[Timestamp]("session_end"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
      .toSet
    assert(out == Set(
      (1L, ts("10:00"), ts("11:20"), 3L, 7.0), // end = 10:50 + 30
      (1L, ts("11:21"), ts("11:51"), 1L, 8.0),
      (2L, ts("10:00"), ts("10:30"), 1L, 16.0)))
  }
}
