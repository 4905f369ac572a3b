package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StatefulOps.{Evt, Session}

class StatefulOpsSuite extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(3600000L + min * 60000L)

  test("flatMapGroupsWithState sessionization: gaps split, aggregates sum") {
    val dir = Files.createTempDirectory("graft-sess").toString
    // user 1: events at t=0,5,8 (one session), then t=40,42 (second)
    // user 2: single event at t=6
    // flush marker far in the future advances the watermark so open
    // sessions time out and emit
    val batch1 = Seq(
      Evt(1, ts(0), 1.0), Evt(1, ts(5), 2.0), Evt(1, ts(8), 3.0),
      Evt(2, ts(6), 10.0))
    val batch2 = Seq(Evt(1, ts(40), 4.0), Evt(1, ts(42), 5.0))
    val flush = Seq(Evt(99, ts(10000), 0.0))
    // one file per logical batch so maxFilesPerTrigger=1 replays them
    // in order (multiple part-files would interleave event times and
    // the watermark would drop the stragglers)
    batch1.toDS().coalesce(1).write.parquet(s"$dir/in/b1")
    Thread.sleep(1100) // distinct mtimes → deterministic file order
    batch2.toDS().coalesce(1).write.parquet(s"$dir/in/b2")
    Thread.sleep(1100)
    flush.toDS().coalesce(1).write.parquet(s"$dir/in/b3")

    val stream = spark.readStream.schema(batch1.toDS().schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in/*")
      .withWatermark("ets", "1 minute")
      .as[Evt]
    val q = StatefulOps.sessionize(stream, gapMs = 10 * 60000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sessions").as[Session].collect()
      .filter(_.user_id != 99)
      .map(s => (s.user_id, s.session_start.getTime, s.n_events,
        s.sum_value)).toSet
    // user 1 session A: 3 events sum 6.0; session B: 2 events sum 9.0
    // user 2: 1 event sum 10.0
    assert(out == Set(
      (1L, ts(0).getTime, 3L, 6.0),
      (1L, ts(40).getTime, 2L, 9.0),
      (2L, ts(6).getTime, 1L, 10.0)))
  }
}
