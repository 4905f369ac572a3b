package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus mixing — the domain/language re-weighting pass
  * of a pretraining data pipeline: each stratum (language, source,
  * quality band, ...) keeps a configured fraction of its documents.
  *
  * Sampling is a BERNOULLI decision on a stable per-document hash
  * bucket, not an RNG: bucket = md5-long(doc id) mod 10000, keep iff
  * bucket < rate·10000. That makes the sample reproducible across
  * runs, engines (the md5 chain is SQL-expressible — the oracle
  * rebuilds it), partitionings, and incremental reruns over grown
  * corpora (a kept doc stays kept), which RNG-based `sample()` cannot
  * offer. Map-only: no shuffle, runs at scan speed at 100 TB.
  */
object Sampling {

  final val Buckets = 10000

  /** Stable hash bucket in [0, buckets): first 8 md5 digest bytes of
    * the id's decimal string, big-endian, pmod buckets — the same
    * md5-long construction every cross-engine oracle here uses.
    * (Also the shard key of [[Packing.packSequences]].) */
  def hashBucket(id: Column, buckets: Int = Buckets): Column =
    // bindOnce: the md5 hex feeds both substring halves — unbound,
    // CollapseProject can inline the digest computation twice
    graft.functions.ExprUtils.bindOnce(md5(id.cast("string"))) { m =>
      val h = shiftleft(conv(substring(m, 1, 8), 16, 10).cast("long"), 32)
        .bitwiseOR(conv(substring(m, 9, 8), 16, 10).cast("long"))
      pmod(h, lit(buckets.toLong))
    }

  /** Keep a per-stratum fraction of rows: `rates` maps stratum value →
    * keep fraction [0, 1] (resolution 1/10000); strata not listed keep
    * `defaultRate`. Output keeps all input columns plus the decision
    * bucket. Fractions resolve to INTEGER bucket thresholds
    * driver-side, so the keep decision is pure integer compare — no
    * float-literal-vs-decimal divergence between engines. */
  def sampleMix(df: DataFrame, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      idCol: String = "doc_id"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be fractions in [0, 1]")
    def th(r: Double): Int = math.round(r * Buckets).toInt
    val threshold = rates.foldLeft(lit(th(defaultRate))) {
      case (acc, (k, r)) =>
        when(col(strataCol) === k, lit(th(r))).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(col(idCol)))
      .where(col("bucket") < threshold)
  }

  /** Per-key document cap — the anti-domain-dominance pass: keep at
    * most `maxRows` rows per `keyCol` value (domain, source, crawl
    * host, ...), chosen by `order` (e.g. longest first, or crawl
    * order). `order` must be a TOTAL order per key (tie-break on a
    * unique id) or the kept set is nondeterministic.
    *
    * Scale shape: written as the declarative rank-filter so Catalyst's
    * InferWindowGroupLimit plans a PARTIAL WindowGroupLimit below the
    * exchange — every map task forwards at most `maxRows` rows per
    * key, so a hot domain (Zipf-shaped at 100 TB: one host can be a
    * measurable fraction of a crawl) ships ≤ maxRows × nMapPartitions
    * rows to its reducer instead of its whole payload. The final sort
    * per key runs over that bounded set. Plan-guarded in
    * PlanQualitySuite — a hand-rolled mapPartitions top-N would hide
    * this from the optimizer and lose whole-stage codegen. */
  def capPerKey(df: DataFrame, keyCol: String, maxRows: Int,
      order: Seq[Column]): DataFrame = {
    require(maxRows > 0, "maxRows must be positive")
    require(order.nonEmpty, "order must be non-empty (total per key)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= maxRows)
      .drop("_rn")
  }
}
