package graft.streaming

import org.apache.spark.sql.DataFrame

/** Stream-stream band (interval) join — the continuous-ingestion twin
  * of `operators.RangeJoin.joinBand`: two live streams joined on equi
  * keys with a time-band residual, e.g. "views in the 24 h before
  * each purchase" over two Kafka topics.
  *
  * The watermark + time bound are what make this runnable forever:
  * Spark's StreamingSymmetricHashJoin buffers both sides keyed by the
  * equi keys, and the band condition lets it evict a buffered row as
  * soon as the OTHER side's watermark passes the row's time plus the
  * band width — state is bounded by (watermark delay + band width) of
  * data per side, never the stream's history. Without the band
  * condition a stream-stream join must keep every row forever; Spark
  * rejects outer variants outright in that case.
  *
  * Same relation as the batch operator on the same inputs (inner
  * join; outer types additionally emit null-extended rows once the
  * watermark proves no match can arrive) — StreamJoinSuite pins
  * batch parity and actual state eviction on a multi-batch replay.
  * Event-time columns must be TIMESTAMP (not NTZ) — watermarks
  * require it; cast upstream like the other streaming twins.
  */
object StreamJoin {

  /** @param watermarkDelay max expected out-of-orderness per side,
    *                       e.g. "10 minutes" — added to the band
    *                       width in the state-retention bound */
  def intervalJoin(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)], leftTime: String, rightTime: String,
      lowerMs: Long, upperMs: Long, watermarkDelay: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTime, watermarkDelay)
    val r = right.withWatermark(rightTime, watermarkDelay)
    graft.operators.RangeJoin.joinBand(
      l, r, keys, leftTime, rightTime, lowerMs, upperMs, joinType)
  }
}
