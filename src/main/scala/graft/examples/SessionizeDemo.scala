package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.Evt

/** Custom-state sessionization over the events fixture: stream the
  * table, sessionize per user with a 30-minute gap, report session
  * stats. Usage: runMain graft.examples.SessionizeDemo [sfDir]
  */
object SessionizeDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-sessd").toString

    val ev = Tables.load(spark, sfDir, "events").select(
      // ts is TIMESTAMP_NTZ; Evt.ets is java.sql.Timestamp, so cast to
      // session-tz TIMESTAMP (the session pins UTC) for the encoder
      col("user_id"), col("ts").cast("timestamp").as("ets"),
      col("value"))
    ev.coalesce(1).write.parquet(s"$root/in/data")
    // flush marker to advance the watermark past every open session
    Seq((999999L, new java.sql.Timestamp(4102444800000L), 0.0))
      .toDF("user_id", "ets", "value")
      .coalesce(1).write.parquet(s"$root/in/flush")

    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/in/*")
      .withWatermark("ets", "1 minute").as[Evt]
    val q = StatefulOps.sessionize(stream, gapMs = 30 * 60000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("demo_sessions").start()
    q.processAllAvailable()
    q.stop()

    val s = spark.table("demo_sessions").where(col("user_id") =!= 999999L)
    println(s"sessions=${s.count()}, events=${ev.count()}")
    s.agg(sum("n_events").as("events_in_sessions"),
      round(avg("n_events"), 2).as("avg_len"),
      max("n_events").as("max_len")).show()
    spark.stop()
  }
}
