package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF example — the `Aggregator[IN, BUF, OUT]` surface
  * (SURVEY.md §2.2 "UDF/UDAF/UDTF"): weighted mean with a mergeable
  * (sum, weight) buffer, so partial aggregation and AQE work exactly
  * like built-in aggregates.
  */
object WeightedMeanAgg
    extends Aggregator[(Double, Double), (Double, Double), Double] {

  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Double, Double), b: (Double, Double)) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) Double.NaN else b._1 / b._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.product[(Double, Double)]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: weighted_mean(value, weight). */
  def weighted_mean(value: Column, weight: Column): Column =
    udaf(WeightedMeanAgg).apply(value, weight)
}
