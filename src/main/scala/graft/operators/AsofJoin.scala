package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, the single right row with
  * the greatest `rightTime <= leftTime` among rows sharing the equi
  * keys — the standard time-series enrichment join (market data,
  * latest-dimension-state lookups). The reference delegates this to
  * DuckDB SQL (SURVEY.md §2.2 "as-of"); Spark SQL has no native ASOF,
  * so this operator fills the gap.
  *
  * Implementation is the union + ordered-window trick, NOT a range
  * join: tag both inputs, union them, and for every left row take
  * `last(right payload, ignoreNulls)` over
  * (keys ORDER BY time, side ROWS UNBOUNDED PRECEDING..CURRENT).
  * Cost = ONE shuffle by key + a per-partition sort — identical
  * movement to a sort-merge join, with none of the quadratic blowup a
  * `left.time >= right.time` range condition would trigger. At 100 TB
  * this scales exactly like any keyed sort-merge join (salt the keys
  * if one key dominates).
  *
  * Ties: multiple right rows with identical (key, time) are resolved
  * arbitrarily (same contract as DuckDB ASOF JOIN) — pre-deduplicate
  * the right side on (key, time) for full determinism.
  */
object AsofJoin {

  /** @param keys            (leftKeyCol, rightKeyCol) equi-key pairs
    * @param leftTime        event-time column on `left`
    * @param rightTime       event-time column on `right`
    * @param toleranceMillis match only if |leftTime - rightTime| ≤ this
    * @param direction       "backward" (latest right ≤ left, the
    *                        default), "forward" (earliest right ≥
    *                        left), or "nearest" (whichever of the two
    *                        is closer in integer milliseconds, ties →
    *                        backward). All three ride the SAME single
    *                        shuffle: forward is the backward window
    *                        over the reversed sort, nearest evaluates
    *                        both windows over one exchange (two
    *                        in-partition sorts, no second shuffle).
    */
  def joinAsof(
      left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String, rightTime: String,
      toleranceMillis: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown direction: $direction")

    val rightPayloadCols = right.columns
      .filterNot(keys.map(_._2).contains).toIndexedSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      rightPayloadCols.map(c =>
        right.schema(c).copy(nullable = true)))

    val keyNames = keys.indices.map(i => s"__k$i")
    val l = left.select(
      (keys.zipWithIndex.map { case ((lk, _), i) => col(lk).as(s"__k$i") } ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side"),
          struct(left.columns.map(col).toIndexedSeq: _*).as("__lpay"),
          lit(null).cast(payloadType).as("__rpay"))): _*)
    val r = right.select(
      (keys.zipWithIndex.map { case ((_, rk), i) => col(rk).as(s"__k$i") } ++
        Seq(col(rightTime).cast(left.schema(leftTime).dataType).as("__t"),
          lit(0).as("__side"),
          lit(null).cast(l.schema("__lpay").dataType).as("__lpay"),
          struct(rightPayloadCols.map(col): _*).as("__rpay"))): _*)

    // At equal time, side 0 (right) sorts first → inclusive match.
    // Backward: running last-right over the ascending sort. Forward:
    // the SAME construction over the descending sort (last right seen
    // while walking backward in time = earliest right ≥ this row).
    val wB = Window.partitionBy(keyNames.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keyNames.map(col): _*)
      .orderBy(col("__t").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def withMatch(df: DataFrame, w: org.apache.spark.sql.expressions
        .WindowSpec, m: String, mt: String): DataFrame =
      df.withColumn(m, last(col("__rpay"), ignoreNulls = true).over(w))
        .withColumn(mt, last(
          when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))
    val u = l.unionByName(r)
    val matched = (direction match {
      case "backward" => withMatch(u, wB, "__m", "__mt")
      case "forward" => withMatch(u, wF, "__m", "__mt")
      case "nearest" =>
        // Both windows share the one keyed exchange; the pick is by
        // integer-millisecond distance (truncated micros — identical
        // truncation in the DuckDB oracle), ties to backward.
        val both = withMatch(withMatch(u, wB, "__mb", "__mtb"),
          wF, "__mf", "__mtf")
        def ms(c: Column) = unix_millis(c.cast("timestamp"))
        val pickB = col("__mtf").isNull || (col("__mtb").isNotNull &&
          ms(col("__t")) - ms(col("__mtb")) <= ms(col("__mtf")) - ms(col("__t")))
        both
          .withColumn("__m", when(pickB, col("__mb")).otherwise(col("__mf")))
          .withColumn("__mt", when(pickB, col("__mtb")).otherwise(col("__mtf")))
          .drop("__mb", "__mtb", "__mf", "__mtf")
    }).where(col("__side") === 1)

    val withTol = toleranceMillis.fold(matched) { tol =>
      matched.withColumn("__m",
        when(abs(unix_millis(col("__t").cast("timestamp")) -
          unix_millis(col("__mt").cast("timestamp"))) <= tol, col("__m")))
    }

    withTol.select(
      (left.columns.map(c => col(s"__lpay.$c").as(c)) ++
        rightPayloadCols.map(c => col(s"__m.$c").as(c))).toIndexedSeq: _*)
  }
}
