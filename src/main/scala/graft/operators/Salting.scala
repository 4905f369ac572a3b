package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for keyed joins (SCALE.md). AQE's runtime skew-join
  * splitting (`spark.sql.adaptive.skewJoin.enabled`, on by default) is
  * the FIRST lever — it handles skewed shuffle partitions without code
  * changes. Manual salting is for the residual case: a single join key
  * so hot that even a split partition overwhelms one task (the
  * power-law user_id, the null-key pile-up).
  */
object Salting {

  /** Join types where replicating the small side is correct: replicas
    * only ever MATCH big-side rows (each big row carries one salt, so
    * it meets exactly one replica). Right/full-outer would also EMIT
    * the `buckets-1` unmatched replicas of every unmatched small-side
    * row — silently wrong, so rejected. Normalized: lowercase, no
    * underscores, "outer" suffix dropped. */
  private val saltSafeJoinTypes =
    Set("inner", "cross", "left", "leftsemi", "semi", "leftanti", "anti")

  /** Salted equi-join: the skewed (big) side gets a deterministic salt
    * in [0, buckets); the small side is replicated `buckets` times so
    * every (key, salt) pair finds its match. Row movement: big side
    * unchanged (one shuffle, now uniform), small side × buckets —
    * choose `buckets` ≈ hottest-key rows / target-partition rows.
    *
    * `saltFrom`: columns feeding the deterministic salt hash
    * (rand() would break retry/replay determinism). They must vary
    * WITHIN a hot key or the salt won't spread it — a row id, an event
    * timestamp. Default: every big-side column (always correct, but
    * pays one xxhash64 input per column per row on wide fact tables —
    * pass one cheap varying column instead). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      buckets: Int, joinType: String = "inner",
      saltFrom: Seq[Column] = Nil): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val jt = joinType.toLowerCase.replace("_", "").stripSuffix("outer")
    require(saltSafeJoinTypes.contains(jt),
      s"saltedJoin does not support joinType=$joinType: replicating " +
        "the small side emits duplicate rows for right/full-outer joins")
    val saltSource =
      if (saltFrom.nonEmpty) saltFrom
      else big.columns.map(col).toIndexedSeq
    val saltCol = pmod(xxhash64(saltSource: _*), lit(buckets)).cast("int")
    val b = big.withColumn("__salt", saltCol)
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase distinct count for a skewed group key: per-(key, salt)
    * partial distinct, then exact merge — bounds any single task's
    * state to 1/buckets of the hot key's values. */
  def saltedDistinctCount(df: DataFrame, groupKey: String,
      distinctCol: String, buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(col(distinctCol)), lit(buckets)).cast("int"))
    salted
      .groupBy(col(groupKey), col("__salt"))
      .agg(countDistinct(col(distinctCol)).as("__partial"))
      .groupBy(col(groupKey))
      .agg(sum("__partial").as("n_distinct")) // salts partition values disjointly
  }
}
