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

  test("STREAMING session_window (append + watermark) ≡ batch sessionStats") {
    // Time-ordered replay (the StreamJoin mtime lesson: each chunk is
    // its own sequential append so FileStreamSource replays in event
    // order), plus a far-future sentinel chunk that pushes the
    // watermark past every real session's end so append mode flushes
    // them all.
    val root = java.nio.file.Files
      .createTempDirectory("graft-sess-stream").toString
    val ev = Tables.load(spark, sf0001, "events")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("value"))
    val Array(loMax, hiMax) = ev.agg(
      expr("percentile(CAST(ts AS DOUBLE), 0.5)"),
      expr("max(CAST(ts AS DOUBLE))")).head() match {
      case r => Array(r.getDouble(0), r.getDouble(1))
    }
    val mid = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(loMax.toLong))
    ev.where(col("ts") <= mid).repartition(1)
      .write.mode("append").parquet(s"$root/in")
    ev.where(col("ts") > mid).repartition(1)
      .write.mode("append").parquet(s"$root/in")
    val sentinel = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(hiMax.toLong + 30L * 24 * 3600))
    Seq((-999L, sentinel, 0.0)).toDF("user_id", "ts", "value")
      .repartition(1).write.mode("append").parquet(s"$root/in")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
    val agg = stream.withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))
    val q = agg.writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .format("memory").queryName("sess_stream").start()
    q.processAllAvailable()
    q.stop()
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .where(col("user_id") =!= -999L)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[java.sql.Timestamp]("session_end"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toSet
    val streamed = norm(spark.table("sess_stream"))
    val batch = norm(EventTimeOps.sessionStats(ev, "ts", "user_id",
      "value", "30 minutes"))
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
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
