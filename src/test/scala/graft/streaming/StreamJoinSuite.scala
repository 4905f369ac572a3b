package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class StreamJoinSuite extends SparkSpec {

  // Watermarks require TIMESTAMP (not the fixture's TIMESTAMP_NTZ) —
  // same cast as the other streaming twins; UTC session pins the map.
  private def sides = {
    val ev = Tables.load(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").as("ts"), col("event_type"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"))
    val views = ev.where(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
    (purchases, views)
  }

  test("stream-stream band join equals the batch operator and evicts " +
      "state as the watermark advances") {
    val (purchases, views) = sides
    val dir = Files.createTempDirectory("graft-sjoin").toString
    // Time-CHUNKED files written sequentially so the replay is in
    // event-time order — the same ordered-replay requirement as the
    // other streaming-parity suites: an out-of-order batch would
    // advance the watermark past earlier rows and the source would
    // (correctly) drop them as late. FileStreamSource orders files by
    // MODIFICATION TIME, so each chunk is a separate append with a
    // strictly later mtime; cross-boundary stragglers are covered by
    // the 10-minute watermark delay.
    def writeChunks(df: org.apache.spark.sql.DataFrame, tsCol: String,
        path: String): Unit = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(tsCol))
      val ranked = df.withColumn("__nt", ntile(3).over(w))
      (1 to 3).foreach { k =>
        ranked.where(col("__nt") === k).drop("__nt")
          .coalesce(1).write.mode("append").parquet(path)
        Thread.sleep(100)
      }
    }
    writeChunks(purchases, "p_ts", s"$dir/p")
    writeChunks(views, "v_ts", s"$dir/v")

    val batch = graft.operators.RangeJoin.joinBand(purchases, views,
        Seq("user_id" -> "v_user"), "p_ts", "v_ts",
        lowerMs = -24L * 3600 * 1000, upperMs = 0L)
      .select("p_id", "v_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty) // the fixture has same-user view→purchase runs

    def streamIn(path: String, schema: org.apache.spark.sql.types.StructType) =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(path)
    val joined = StreamJoin.intervalJoin(
      streamIn(s"$dir/p", purchases.schema),
      streamIn(s"$dir/v", views.schema),
      Seq("user_id" -> "v_user"), "p_ts", "v_ts",
      lowerMs = -24L * 3600 * 1000, upperMs = 0L,
      watermarkDelay = "10 minutes")
      .select("p_id", "v_id")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("sjoin_out").start()
    q.processAllAvailable()
    val progress = q.lastProgress
    q.stop()

    val streamed = spark.table("sjoin_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)

    // State must be bounded by (band width + watermark delay), never
    // the stream's history: after replaying 30 days of events, the
    // symmetric-hash-join state retains far fewer rows than arrived.
    val st = progress.stateOperators
    assert(st.nonEmpty, "no stateful operator in the join query")
    val input = purchases.count() + views.count()
    assert(st.head.numRowsTotal < input / 2,
      s"join state ${st.head.numRowsTotal} rows — not evicting " +
        s"(input $input)")
  }
}
