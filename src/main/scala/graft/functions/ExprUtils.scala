package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

object ExprUtils {

  /** Expression-level let-binding: evaluate `expr` ONCE and reference
    * it any number of times inside `body` via a lambda variable.
    *
    * Why this exists: Catalyst's CollapseProject inlines a projected
    * alias into every consumer expression, so `withColumn("x", heavy)`
    * followed by a projection that references `x` several times
    * re-evaluates `heavy` at each reference — and inside higher-order
    * -function lambdas that multiplies by the element count (measured:
    * the tokenizer regex re-ran ~165× per document in the shingle
    * pipeline, a 10× operator slowdown). Wrapping as
    * `element_at(transform(array(heavy), x => body(x)), 1)` pins
    * `heavy` as a function ARGUMENT — evaluated once per row no matter
    * how the optimizer rearranges projections.
    */
  def bindOnce(expr: Column)(body: Column => Column): Column =
    element_at(transform(array(expr), x => body(x)), 1)
}
