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

  /** Barrier a multi-consumer intermediate frame: materialize its
    * lineage once (lazily — the first consumer's action fills it) so
    * consumers whose pruned projections defeat exchange reuse stop
    * re-running the upstream lineage per consumer (the round-13/15
    * LM-table lesson; measured wins across the LM family, SCALE.md
    * round 15).
    *
    * Default implementation is `localCheckpoint(eager = false)`:
    * blocks live on EXECUTOR-LOCAL storage with lineage truncated, so
    * on a real cluster a lost executor makes the job UNRECOVERABLE
    * (nothing left to recompute from). That is acceptable in local
    * mode and for restartable batch jobs; for long jobs on flaky
    * clusters set `spark.graft.barrier.reliable=true` (plus
    * `sparkContext.setCheckpointDir`) and the same call sites become
    * reliable checkpoints — a staging write, the standing caveat's
    * production analogue. One switch for every barrier site instead
    * of 12+ scattered `localCheckpoint(false)` calls (round-15
    * verdict item 7). */
  def barrier(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    if (df.sparkSession.conf
        .getOption("spark.graft.barrier.reliable").contains("true"))
      df.checkpoint(eager = false)
    else df.localCheckpoint(eager = false)
}
