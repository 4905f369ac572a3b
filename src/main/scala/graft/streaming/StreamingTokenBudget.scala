package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Sampling

/** Streaming token-budget quota — [[graft.llm.Sampling.tokenBudget]]
  * as a continuous admission gate: docs arrive in micro-batches and a
  * stratum admits its arrival-order PREFIX until the budget fills.
  *
  * Semantics and their consequences, both deliberate:
  *
  *  - **Within a batch** the admission order is the batch operator's
  *    own ((md5-bucket, id) via the SHARED
  *    [[graft.llm.Sampling.prefixTokens]] derivation), so a
  *    single-batch stream equals `tokenBudget` exactly (suite-pinned).
  *  - **Across batches** the prefix is ARRIVAL-ordered — the quota a
  *    production ingestion actually enforces (admit until full). That
  *    DIVERGES from the batch operator's corpus-wide pseudo-random
  *    order by design (an early-arriving doc is admitted even when
  *    the batch order would have placed it past the budget;
  *    suite-pinned by hand). Under a FIXED chunking the admitted set
  *    is still exactly the global prefix in (batch, bucket, id)
  *    order, which is what makes the registered twin
  *    (llm_token_budget_stream) fully DuckDB-oracled: one
  *    parameterized oracle text serves batch and stream
  *    (LlmQueries.tokenBudgetSqlFor — fix both or neither).
  *  - The prefix rule counts EVERY arriving doc's tokens, admitted or
  *    not (the batch operator's `cum <= budget` is a prefix cut, not
  *    a knapsack skip), so the store records each batch's TOTAL
  *    per-stratum tokens — a stratum closes once its cumulative
  *    arrivals bust the budget.
  *
  * Store discipline: additive per-stratum sums — the round-14 audit's
  * first pattern (a replay must NOT read state its first attempt
  * wrote, or the batch's own tokens would double against the budget
  * and the replay would emit a truncated prefix): `batch_id=N`
  * partitions, per-batch OVERWRITE, reads EXCLUDE the current batch
  * — crash-replay admits the identical set (suite-pinned). Store rows
  * per batch = |strata| — driver-scale, but kept distributed.
  *
  * Contracts: doc ids unique WITHIN a batch (a duplicate would count
  * its tokens twice — the at-least-once dedup belongs upstream, the
  * streaming norm) and the store is single-writer. */
final case class StreamingTokenBudget(storeDir: String,
    strataCol: String, budgets: Map[String, Long],
    defaultBudget: Long = 0L, nShards: Int = 8,
    idCol: String = "doc_id", tokensCol: String = "n_tokens") {
  require((budgets.values ++ Seq(defaultBudget)).forall(_ >= 0L),
    "budgets must be non-negative")

  private def hasData(spark: SparkSession): Boolean = {
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) && fs.listStatus(p).exists { d =>
      d.isDirectory && fs.listStatus(d.getPath)
        .exists(_.getPath.getName.endsWith(".parquet"))
    }
  }

  // per-stratum tokens already counted by EARLIER batches (the
  // current batch's own partition is excluded — replay discipline);
  // pre-data schema takes the stratum type from the live batch
  private def spent(spark: SparkSession, excludeBatch: Long,
      strataType: org.apache.spark.sql.types.DataType): DataFrame =
    if (hasData(spark))
      spark.read.parquet(storeDir)
        .where(col("batch_id") =!= excludeBatch)
        .groupBy(col(strataCol).as("_strata_s"))
        .agg(sum("tokens").as("_spent"))
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_strata_s", strataType),
        org.apache.spark.sql.types.StructField("_spent",
          org.apache.spark.sql.types.LongType))))

  /** Admit one micro-batch's prefix against the remaining budgets and
    * record the batch's total per-stratum tokens in its own store
    * partition. Returns the admitted rows (input columns only). */
  def processBatch(batch: DataFrame, batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    // heal a crashed compact() BEFORE reading spent() — in the
    // interrupted-swap window the store is missing every folded
    // partition and the batch would over-admit past the budget
    CompactSwap.recoverDir(spark, storeDir)
    val budget = Sampling.budgetExpr(strataCol, budgets, defaultBudget)
    val withCum = Sampling.prefixTokens(batch, strataCol, nShards,
      idCol, tokensCol)
    // ONE eager pass over the batch (round-16 job cut): every row
    // keeps an admission FLAG instead of being filtered, so the same
    // materialized frame serves both consumers — the admitted prefix
    // (the filter below) and the store's per-stratum TOTALS (which
    // count every arrival, admitted or not — the prefix rule), which
    // previously re-tokenized the batch in a second job. Null-safe
    // stratum join for the same reason as the batch op: a NULL
    // stratum is a real stratum under defaultBudget.
    val gated = withCum
      .join(broadcast(spent(spark, batchId,
          batch.schema(strataCol).dataType)),
        col(strataCol) <=> col("_strata_s"), "left")
      .withColumn("_admit", coalesce(col("_spent"), lit(0L)) +
        col("_base") + col("_cum") <= budget)
      .drop("_bucket", "_shard", "_cum", "_base", "_strata_b",
        "_shard_b", "_strata_s", "_spent")
      // the store write below grows the store the admission read
      // depends on — pin the gated rows first
      .localCheckpoint(true)
    gated.groupBy(col(strataCol))
      .agg(sum(col(tokensCol)).as("tokens"))
      .write.mode("overwrite")
      .parquet(s"$storeDir/batch_id=$batchId")
    gated.where(col("_admit")).drop("_admit")
  }

  /** Fold all-but-the-latest batch partitions into one summed
    * partition at the lowest folded id — the [[StreamingLineDedup]]
    * compaction shape (the max written id may still be rewritten by
    * a replay, every lower id has committed; sums are additive so a
    * per-stratum re-aggregate IS the fold). File-count hygiene for
    * long streams — [[processBatch]]'s spent() read otherwise lists
    * one partition per historical batch. Maintenance-step contract:
    * no concurrent writer mid-swap. */
  def compact(spark: SparkSession): Unit =
    // sums are additive, so a per-stratum re-aggregate IS the fold
    CompactSwap.foldBatchPartitions(spark, storeDir)(
      _.groupBy(col(strataCol)).agg(sum("tokens").as("tokens")))
}
