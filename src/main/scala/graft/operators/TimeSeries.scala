package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Time-series similarity search over an event stream (the retrieved
  * EDBT/ICDE distributed-TS-similarity line, reduced to its exact
  * deterministic core): bucket each entity's activity into a
  * fixed-length value series, CENTER it, and rank entity pairs by the
  * cosine of centered series — which is Pearson correlation of the
  * raw series, the standard shape-similarity score (level-invariant;
  * norm-clamped so constant series read similarity 0, never NaN — the
  * CLAUDE.md invariant).
  *
  * Scale shape: series construction is one partial-aggregated
  * groupBy((key, slot)) — a hot entity's events collapse map-side —
  * followed by a per-key fold into a FIXED-length array (nSlots
  * doubles per entity, the dense "embedding" of its activity); the
  * top-k search is [[Similarity.bruteForceTopK]] verbatim, so the
  * broadcast-queries / corpus-never-shuffles contract and every ANN
  * upgrade path (LSH / IVF / PQ over the same vectors — the centered
  * series IS an embedding column) apply unchanged.
  *
  * Cross-engine exactness: slot sums round to 4dp (double partial-sum
  * order is engine- and partition-dependent; the repo's rounding
  * convention absorbs it), mean/centering fold left-to-right over the
  * slot-ordered array in both engines, final cosine rounds to 6dp
  * with id-asc tie-break — the `op_ts_topk` DuckDB oracle rebuilds
  * the whole pipeline.
  */
object TimeSeries {

  /** RAW (unrounded) per-(key, day-slot) value sums — the additive
    * half of the series build, shared with
    * [[graft.streaming.StreamingSeriesStore]] whose store is a log of
    * exactly these partials (sums merge across batches; a ROUNDED
    * partial would not — round only at the final merge). */
  private[graft] def slotSums(events: DataFrame, startDate: String,
      nSlots: Int, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    require(nSlots >= 1, s"nSlots=$nSlots must be >= 1")
    events.select(col(keyCol),
        datediff(to_date(col(tsCol)), to_date(lit(startDate))).as("__d"),
        col(valCol))
      .where(col("__d") >= 0 && col("__d") < nSlots)
      .groupBy(col(keyCol), col("__d"))
      .agg(sum(col(valCol)).as("__v"))
  }

  /** Dense + centered series from a ROUNDED (key, __d, __v) slot
    * frame — the deterministic half of the build. */
  private[graft] def fromSlots(slots: DataFrame, nSlots: Int,
      keyCol: String): DataFrame = {
    val dense = slots.groupBy(col(keyCol))
      .agg(map_from_entries(collect_list(struct(col("__d"), col("__v"))))
        .as("__m"))
      .select(col(keyCol),
        // try_element_at: absent slots AND present-but-NULL sums (a
        // day whose every value is NULL) both land on 0.0 — matching
        // the oracle's coalesce(v, 0.0); a bare map lookup would
        // null-poison the whole centered series through the mean fold
        // (review catch), and ANSI element_at throws on absent keys.
        transform(sequence(lit(0), lit(nSlots - 1)), d =>
          coalesce(try_element_at(col("__m"), d), lit(0.0))).as("__vec"))
    // center: subtract the series mean (left-to-right fold — the
    // DuckDB list_reduce order); bindOnce pins vec and mean against
    // HOF re-evaluation
    dense.select(col(keyCol),
      graft.functions.ExprUtils.bindOnce(col("__vec")) { v =>
        graft.functions.ExprUtils.bindOnce(
            aggregate(v, lit(0.0d), (a, b) => a + b) / nSlots) { mean =>
          transform(v, x => x - mean)
        }
      }.as("vec"))
  }

  /** Fixed-length per-entity daily value series:
    * (keyCol, vec = array of nSlots CENTERED daily sums). Slots with
    * no events contribute 0.0 before centering; events outside
    * [startDate, startDate + nSlots) are ignored. */
  def dailySeries(events: DataFrame, startDate: String, nSlots: Int,
      keyCol: String = "user_id", tsCol: String = "ts",
      valCol: String = "value"): DataFrame =
    fromSlots(
      slotSums(events, startDate, nSlots, keyCol, tsCol, valCol)
        .withColumn("__v", round(col("__v"), 4)),
      nSlots, keyCol)

  /** Top-k most-correlated entities for each query entity: build the
    * centered daily series and run the brute-force cosine search —
    * `sim` IS the Pearson correlation of the two raw series. */
  def topKCorrelated(events: DataFrame, queryPred: Column,
      startDate: String, nSlots: Int, k: Int,
      keyCol: String = "user_id", tsCol: String = "ts",
      valCol: String = "value"): DataFrame = {
    val series = dailySeries(events, startDate, nSlots, keyCol, tsCol,
      valCol)
    Similarity.bruteForceTopK(series.where(queryPred), series, k,
      idCol = keyCol, vecCol = "vec")
  }

  /** Time-weighted average per entity over IRREGULAR samples — the
    * TSDB staple a plain avg() gets wrong (it over-weights bursts):
    * step interpolation holds each sample's value until the next
    * sample, so twa = Σ vᵢ·(tᵢ₊₁ − tᵢ) / (t_n − t₁) over the entity's
    * observed span. A single-sample entity has zero span and reads
    * its own value. Ties on the timestamp break by a deterministic
    * order on the value column (equal-ts samples have no defined
    * duration anyway — zero-width steps contribute nothing; the order
    * key only keeps the LAST-value choice stable cross-engine).
    *
    * Output: (keyCol, n_samples, span_sec, twa — 4dp).
    * Scale shape: one per-entity window (lead) + one partial-agg
    * groupBy — bounded by a single entity's history, the
    * sessionize/scd2 caveat for adversarially hot entities. */
  def timeWeightedAvg(events: DataFrame,
      keyCol: String = "user_id", tsCol: String = "ts",
      valCol: String = "value"): DataFrame = {
    // NULLS LAST explicitly on both order keys: Spark's asc default is
    // nulls-first, DuckDB's is nulls-last — left implicit, a NULL value
    // at a tied timestamp would attach dt to different rows per engine
    // (ADVICE r13; the oracle spells the same NULLS LAST)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol).asc_nulls_last, col(valCol).asc_nulls_last)
    // unix_micros rejects TIMESTAMP_NTZ; the cast to TIMESTAMP reads
    // the wall clock in the session zone, and dt is a DIFFERENCE, so
    // any fixed zone cancels (UTC sessions are the repo convention)
    val micros = unix_micros(col(tsCol).cast("timestamp"))
    val stepped = events
      .select(col(keyCol), col(tsCol), col(valCol))
      .withColumn("__dt",
        (unix_micros(lead(col(tsCol), 1).over(w).cast("timestamp")) -
          micros) / 1e6)
    stepped.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_samples"),
        round(sum(coalesce(col("__dt"), lit(0.0))), 4).as("span_sec"),
        round(
          when(sum(coalesce(col("__dt"), lit(0.0))) > 0,
            sum(col(valCol) * coalesce(col("__dt"), lit(0.0))) /
              sum(coalesce(col("__dt"), lit(0.0))))
            .otherwise(max(col(valCol))), 4).as("twa"))
  }

  /** Gap filling with last-observation-carried-forward — the TSDB
    * resample that turns an irregular event series into a regular
    * grid: per key, grid points `t0 + k·step ≤ t1` (t0/t1 = the key's
    * observed span; both engines' sequence/generate_series share the
    * inclusive-bound convention), each carrying the latest observation
    * AT OR BEFORE it plus its timestamp (`obs_ts` — the staleness a
    * monitoring consumer alerts on). The grid starts AT an
    * observation, so no grid point is ever unmatched.
    *
    * Concurrent observations (same key, same timestamp — the fixture
    * HAS ties) pre-collapse to their maximum value, making the fill
    * deterministic under any partitioning BEFORE the as-of join
    * ([[AsofJoin.joinAsof]]'s equal-sort-key window pick would
    * otherwise be partition-order-dependent). The LOCF itself IS the
    * backward as-of join — one operator composed from another, same
    * single keyed shuffle. Grid density is the caller's scale lever:
    * rows ≈ Σ spans/step; per-key state in the window is one entity's
    * history (the sessionize caveat). */
  def gapFill(events: DataFrame, stepSec: Long,
      keyCol: String = "user_id", tsCol: String = "ts",
      valCol: String = "value"): DataFrame = {
    require(stepSec >= 1, s"stepSec=$stepSec must be >= 1")
    val obs = events.groupBy(col(keyCol), col(tsCol))
      .agg(max(col(valCol)).as(valCol))
      .withColumnRenamed(tsCol, "obs_ts")
    // explode_outer + null test on the GENERATED column (the repo
    // re-inline rule): plain explode's implicit size>0 filter would
    // rebuild the per-key grid array — span/step elements — once more
    // per predicate term
    val grid = events.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__t0"), max(col(tsCol)).as("__t1"))
      .select(col(keyCol), explode_outer(sequence(col("__t0"),
        col("__t1"), expr(s"INTERVAL $stepSec SECONDS"))).as(tsCol))
      .where(col(tsCol).isNotNull)
    AsofJoin.joinAsof(grid, obs, Seq((keyCol, keyCol)), tsCol, "obs_ts",
      direction = "backward")
  }
}
