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
}
