package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time operators — watermarked tumbling/sliding windows and
  * streaming deduplication. The reference has NO event-time semantics
  * (arrival-ordered, count/size-batched, no late-data handling —
  * SURVEY.md §2.2 "Streaming"); these are the documented improvements
  * Structured Streaming gives the engine: deterministic event-time
  * aggregation with bounded state via watermarks, and exactly-once-ish
  * dedup over a key within the watermark horizon.
  *
  * Each works identically on a batch DataFrame (watermark is a no-op
  * there), which is what lets the DuckDB oracle check the same code
  * path the streaming query runs.
  */
object EventTimeOps {

  /** Tumbling event-time window aggregate:
    * (window_start, keyCol) → count + sum. On a streaming input, add
    * `watermark` (e.g. "10 minutes") to bound state and drop late
    * rows deterministically. */
  def tumblingCounts(df: DataFrame, timeCol: String, keyCol: String,
      valueCol: String, windowLen: String,
      watermark: Option[String] = None): DataFrame = {
    val wm = watermark.fold(df)(w => df.withWatermark(timeCol, w))
    wm.groupBy(window(col(timeCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n_events"), col("sum_value"))
  }

  /** Streaming dedup on a key within the watermark horizon —
    * `dropDuplicates` with event-time bound state. */
  def dedupByKey(df: DataFrame, timeCol: String, keyCols: Seq[String],
      watermark: String): DataFrame =
    df.withWatermark(timeCol, watermark)
      .dropDuplicates(keyCols :+ timeCol)

  /** Session windows: gap-based grouping per key (no reference
    * equivalent; Structured Streaming native). */
  def sessionCounts(df: DataFrame, timeCol: String, keyCol: String,
      gap: String, watermark: String): DataFrame =
    df.withWatermark(timeCol, watermark)
      .groupBy(session_window(col(timeCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col(keyCol),
        col("n_events"))
}
