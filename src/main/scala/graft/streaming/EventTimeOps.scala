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
  *
  * TIMESTAMP_NTZ caveat: Spark's watermark requires a TIMESTAMP
  * event-time column (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ, as
  * the fixtures' `ts: timestamp[us]` reads) — STREAMING callers must
  * `col.cast("timestamp")` first (session-tz dependent; pin the
  * session to UTC as every session builder here does). Batch callers
  * can stay NTZ end-to-end — `window()`/aggregation accept it, and
  * NTZ output parquet matches DuckDB's naive TIMESTAMP bit-for-bit,
  * which is why the oracled batch queries do NOT cast.
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

  /** Batch sessionization with full per-session stats — the same
    * native `session_window` (start = first event, end = last event +
    * gap; the boundary is CLOSED: an event landing exactly `gap` after
    * its predecessor still MERGES into the session — pinned in
    * EventTimeOpsSuite "boundary is CLOSED"), no watermark. The DuckDB
    * oracle rebuilds it as the classic gaps-and-islands with the
    * matching strict break (brk when diff > gap, running sum, group) —
    * which also documents the semantics equivalence.
    * Equal-timestamp ties are harmless: session membership depends
    * only on the sorted multiset of per-key timestamps, so every
    * ordering of ties yields identical sessions.
    *
    * Scale: one shuffle keyed by `keyCol`; per-key session building
    * is a sort within the partition. A pathologically hot key owns
    * its whole timeline in one task — inherent to sessionization
    * (same caveat as any per-entity ordered pass); cap or split such
    * keys upstream (dropHotKeys) if an adversarial entity dominates. */
  def sessionStats(df: DataFrame, timeCol: String, keyCol: String,
      valueCol: String, gap: String): DataFrame =
    df.groupBy(session_window(col(timeCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("total_value"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))
}
