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

  /** Salted equi-join: the skewed (big) side gets a deterministic salt
    * in [0, buckets); the small side is replicated `buckets` times so
    * every (key, salt) pair finds its match. Row movement: big side
    * unchanged (one shuffle, now uniform), small side × buckets —
    * choose `buckets` ≈ hottest-key rows / target-partition rows. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // Deterministic salt from the full row (uniform, reproducible) —
    // rand() would break retry/replay determinism.
    val saltCol = pmod(
      xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)),
      lit(buckets)).cast("int")
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
