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

  /** Exact weighted sampling WITHOUT replacement, one pass, per
    * stratum — Efraimidis–Spirakis A-Res: every row draws a
    * deterministic uniform u from its id (first 32 md5 bits → (h +
    * 0.5) / 2³², never exactly 0 or 1) and the k rows with the
    * LARGEST u^(1/w) are the sample — provably distributed as
    * weight-proportional sampling without replacement. Ranking uses
    * the monotone-equivalent key ln(u)/w (u < 1 makes ln u negative;
    * dividing by a larger w moves it toward 0, so larger key ⇔
    * larger u^(1/w)) — avoiding pow() cross-engine wobble — ROUNDED
    * to 6 dp with id-asc ties so rank is engine-reproducible (the
    * tfidf precedent). Weights clamp to ≥ 1e-4: zero-weight rows
    * would divide by zero, and the clamp sends them to key ≈ −∞
    * (never sampled unless the stratum is nearly empty — the correct
    * limit).
    *
    * Scale shape: the key is map-only; the per-stratum top-k is the
    * declarative rank-filter, so Catalyst plans a PARTIAL
    * WindowGroupLimit below the exchange (the capPerKey skew
    * contract — a hot stratum ships ≤ k × nMapPartitions rows).
    * Deterministic across runs, partitionings, and corpus growth
    * (a sampled id's key never changes; only displacement by new
    * higher-key rows can evict it). */
  def weightedReservoir(df: DataFrame, k: Int, strataCol: String,
      weightCol: String, idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val h = conv(substring(md5(
      concat(lit("wr_"), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long")
    val u = (h.cast("double") + 0.5) / 4294967296.0
    val key = round(log(u) / greatest(col(weightCol), lit(1e-4)), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(col("res_key").desc, col(idCol).asc)
    df.withColumn("res_key", key)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
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

  /** Deterministic train/holdout split — the eval-set carve-out every
    * training run needs: every row is LABELED (`split` =
    * 'train'/'holdout'), nothing is dropped, and the assignment is
    * the same stable md5 bucket as [[sampleMix]], so it is
    * reproducible across runs/engines/partitionings and STICKY under
    * corpus growth (a doc keeps its side as the corpus grows — the
    * property that prevents silent eval-into-train leakage between
    * pipeline versions; an RNG split reshuffles every run). Fraction
    * resolves driver-side to 1/10000 units like every threshold here.
    * Map-only. */
  def holdoutSplit(df: DataFrame, holdoutFraction: Double,
      idCol: String = "doc_id"): DataFrame = {
    require(holdoutFraction >= 0 && holdoutFraction <= 1,
      s"holdoutFraction=$holdoutFraction out of [0, 1]")
    val th = math.round(holdoutFraction * Buckets).toInt
    df.withColumn("split",
      when(hashBucket(col(idCol)) < th, lit("holdout"))
        .otherwise(lit("train")))
  }

  /** Quality-WEIGHTED sampling — the per-document generalization of
    * [[sampleMix]]'s per-stratum constant: each row's keep
    * probability is its own score (CCNet/RefinedWeb-style importance
    * sampling, where a continuous quality signal softly downweights
    * low-quality text instead of a hard verdict cut). Keep iff
    * `hashBucket(id) < round(clamp(score, 0, 1) · 10000)` — the score
    * resolves to an integer bucket threshold PER ROW, so the decision
    * stays a pure integer compare and the whole op is map-only (no
    * shuffle, scan speed at 100 TB), reproducible across runs,
    * engines, partitionings, and corpus growth exactly like
    * sampleMix. Cross-engine note: both engines round the SAME double
    * product half-away-from-zero; a score already rounded to ≤4
    * decimals makes the product near-integer, nowhere near the
    * half-way rounding window. Output keeps all input columns plus
    * the decision `bucket`. */
  def sampleByScore(df: DataFrame, scoreCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val th = round(greatest(least(col(scoreCol), lit(1.0)), lit(0.0))
      * Buckets).cast("int")
    df.withColumn("bucket", hashBucket(col(idCol)))
      .where(col("bucket") < th)
  }

  /** Per-stratum UPSAMPLING — the other half of corpus re-weighting,
    * which [[sampleMix]]'s keep/drop decision cannot express: mix
    * specs routinely repeat high-quality sources (rate 2.5 = "2.5
    * epochs of this stratum per training pass"). Each row emits
    * `floor(rate)` whole copies plus one more iff its hash bucket
    * falls under the fractional remainder, tagged with an `epoch`
    * column (0-based copy index) so downstream packing/shuffling can
    * keep copies apart. The SAME integer-threshold construction as
    * [[sampleMix]] — rate resolves driver-side to 1/10000 units, the
    * fractional decision is a pure integer compare on the md5 bucket —
    * so for rates ≤ 1 this is EXACTLY sampleMix plus `epoch = 0`
    * (suite-pinned), and the emitted set is reproducible across runs,
    * engines, and corpus growth.
    *
    * Scale shape: map-only — a per-row `sequence` + generator, no
    * shuffle, no skew surface (each input row fans out at most
    * ceil(rate) times); rate-0 strata die in the generator (outer
    * explode of an empty/null sequence → null epoch → filtered on the
    * GENERATED column, the re-inline-safe explode form). */
  def upsample(df: DataFrame, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      idCol: String = "doc_id"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(_ >= 0),
      "rates must be >= 0")
    def units(r: Double): Long = math.round(r * Buckets)
    val rm = rates.foldLeft(lit(units(defaultRate))) {
      case (acc, (k, r)) =>
        when(col(strataCol) === k, lit(units(r))).otherwise(acc)
    }
    val b = df.withColumn("bucket", hashBucket(col(idCol)))
    val nCopies = (rm / Buckets).cast("long") +
      when(col("bucket") < pmod(rm, lit(Buckets.toLong)), 1L).otherwise(0L)
    b.select(b.columns.map(col) :+
        explode_outer(when(nCopies > 0,
          sequence(lit(0L), nCopies - 1))).as("epoch"): _*)
      .where(col("epoch").isNotNull)
  }

  /** Token-budget subsampling — the "give me B tokens of each
    * stratum" pass a pretraining mix is actually specified in: walk
    * each stratum's documents in a deterministic pseudo-random order
    * (md5 bucket of the id, id tiebreak) and keep the longest prefix
    * whose cumulative `tokensCol` stays within the stratum's budget
    * (the first doc that would cross the budget, and everything after
    * it, is dropped). Deterministic and engine-reproducible like
    * [[sampleMix]] — and unlike a rate, the budget holds EXACTLY even
    * when the corpus grows.
    *
    * Scale shape: a naive per-stratum running sum gives parallelism =
    * #strata (a handful of languages → 5 reducers at 100 TB). This is
    * the two-level prefix sum instead, the [[Packing]] shard trick
    * plus an offset chain: shards are RANGES of the bucket space
    * (shard = bucket × nShards div 10000), so shard-major order IS
    * the plain (bucket, id) order and `nShards` is pure parallelism —
    * the kept set is shard-count-invariant (suite-pinned).
    * Within-(stratum, shard) window prefix sums run strata × nShards
    * wide; per-shard token totals (a strata × nShards-row frame) get
    * a tiny exclusive prefix window; the base offsets broadcast-join
    * back, and global position = shard base + within-shard prefix
    * EXACTLY reproduces the single global window the oracle runs. */
  def tokenBudget(df: DataFrame, strataCol: String,
      budgets: Map[String, Long], defaultBudget: Long = 0L,
      nShards: Int = 8, idCol: String = "doc_id",
      tokensCol: String = "n_tokens"): DataFrame = {
    require((budgets.values ++ Seq(defaultBudget)).forall(_ >= 0L),
      "budgets must be non-negative")
    val budget = budgetExpr(strataCol, budgets, defaultBudget)
    prefixTokens(df, strataCol, nShards, idCol, tokensCol)
      .where(col("_base") + col("_cum") <= budget)
      .drop("_bucket", "_shard", "_cum", "_base", "_strata_b",
        "_shard_b")
  }

  /** The strata → budget literal when-chain shared by [[tokenBudget]]
    * and its streaming twin. */
  private[graft] def budgetExpr(strataCol: String,
      budgets: Map[String, Long], defaultBudget: Long): Column =
    budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (k, b)) =>
        when(col(strataCol) === k, lit(b)).otherwise(acc)
    }

  /** The two-level prefix sum under [[tokenBudget]], exposed so the
    * streaming twin ([[graft.streaming.StreamingTokenBudget]]) runs
    * the IDENTICAL within-batch order and cum derivation: returns
    * `df` plus `_cum` (within-shard running sum in (bucket, id)
    * order) and `_base` (the strata's preceding-shards offset) —
    * `_base + _cum` is the global (bucket, id)-ordered prefix sum per
    * stratum. Internals (`_bucket`, `_shard`, `_strata_b`,
    * `_shard_b`) ride along for the caller to drop. */
  private[graft] def prefixTokens(df: DataFrame, strataCol: String,
      nShards: Int, idCol: String, tokensCol: String): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    // coalesce: hashBucket is null only for a null id, but Catalyst
    // can't see that — a NULLABLE _shard riding the offset join makes
    // it infer isnotnull(pmod(md5 chain...)) and push the whole
    // bucket expression into a scan Filter (the round-6 join-key
    // re-inline mechanism, SCALE.md); the non-nullable literal arm
    // kills the inference
    // the outer coalesce must wrap the DIV: integral division is
    // always-nullable in Catalyst (divisor-zero rule), so wrapping
    // only the bucket still leaves a nullable join key and the
    // isnotnull inference fires (and its inferred Filter breaks the
    // canonical equality that lets the offsets branch REUSE the
    // spine's exchange instead of re-scanning the corpus)
    val sharded = df
      .withColumn("_bucket",
        coalesce(hashBucket(col(idCol)), lit(0L)))
      .withColumn("_shard",
        coalesce(expr(s"_bucket * ${nShards}L div ${Buckets}L"),
          lit(0L)))
    val wIn = Window.partitionBy(col(strataCol), col("_shard"))
      .orderBy(col("_bucket"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = sharded
      .withColumn("_cum", sum(col(tokensCol)).over(wIn))
    // shard totals = the LAST within-shard prefix (max of a running
    // sum of non-negative counts) — derived from the SAME windowed
    // frame, so both consumers share one canonical scan+exchange
    // subtree (exchange reuse: the corpus is scanned and tokenized
    // once, not once per branch); strata × nShards rows after the
    // aggregate — driver-scale, stays distributed
    val wOff = Window.partitionBy(col(strataCol)).orderBy(col("_shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = withCum.groupBy(col(strataCol), col("_shard"))
      .agg(max(col("_cum")).as("_shard_tokens"))
      .withColumn("_base",
        coalesce(sum(col("_shard_tokens")).over(wOff), lit(0L)))
      .drop("_shard_tokens")
      .withColumnRenamed(strataCol, "_strata_b")
      .withColumnRenamed("_shard", "_shard_b")
    // Null-safe stratum key (<=>): a NULL stratum is a real stratum —
    // the window/groupBy above already treat it as one group, and the
    // budget when-chain routes it to defaultBudget — but a plain
    // equi-join would never match the null key and silently DROP those
    // rows (vs sampleMix, which keeps null strata under defaultRate).
    // <=> also keeps Catalyst from inferring isnotnull on the key, so
    // the round-7 join-key re-inline/exchange-reuse hazards don't
    // apply to this arm.
    withCum.join(broadcast(base),
        col(strataCol) <=> col("_strata_b") &&
          col("_shard") === col("_shard_b"))
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
