package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout — the co-located-join lever for tables that
  * are joined or aggregated on the same key repeatedly (fact-to-fact
  * joins too big to broadcast). `bucketBy` pre-shuffles the data ON
  * DISK into a fixed number of hash buckets (optionally sorted), so
  * every later join/aggregation on the bucket key plans with ZERO
  * exchanges: at 100 TB that converts the dominant repeated shuffle
  * into a one-time write cost. The segment sink stays the streaming
  * path; this is the layout for curated/deduped OUTPUT tables that
  * downstream pipelines keep joining on doc/vec/entity id.
  */
object Bucketing {

  /** Write `df` as a bucketed (and bucket-sorted) managed table.
    * Both sides of a future equi-join must use the same bucket count
    * and key for the exchange-free plan. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Nil,
      format: String = "parquet"): Unit = {
    require(buckets >= 1, s"buckets=$buckets must be >= 1")
    val w = df.write.format(format).mode("overwrite")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }

  /** Equi-join two same-bucketed tables on their bucket key. The plan
    * must contain no Exchange on either side — callers can assert
    * that via `df.queryExecution.executedPlan` (see BucketingSuite).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable), Seq(key), joinType)
}
