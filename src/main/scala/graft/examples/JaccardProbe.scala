package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-pair verify cost in isolation — hash-set
  * (array_intersect/array_union) vs one-pass sorted merge
  * (SortedJaccardExpr) over N synthetic candidate pairs of ~`sz`
  * element sorted distinct long arrays. Usage:
  * runMain graft.examples.JaccardProbe [nPairs] [sz] [reps]
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val sz = args.lift(1).map(_.toInt).getOrElse(200)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // ~50% expected overlap: both sides draw sz values from a 2·sz-wide
    // window keyed to the row id.
    def arr(salt: Int) = sort_array(array_distinct(transform(
      sequence(lit(0), lit(sz - 1)),
      i => pmod(xxhash64(col("id"), i, lit(salt)), lit(sz * 2L))
        + col("id"))))
    val pairs = spark.range(n)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(arr(0).as("a"), arr(1).as("b"))
      .localCheckpoint(true)
    println(s"pairs: ${pairs.count()}")
    def timed(name: String)(df: org.apache.spark.sql.DataFrame): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[$i] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    timed("hash-set intersect/union")(pairs.select(
      (size(array_intersect(col("a"), col("b"))).cast("double") /
        size(array_union(col("a"), col("b")))).as("j")))
    timed("sorted merge")(pairs.select(
      graft.functions.SortedJaccardExpr.sorted_jaccard(
        col("a"), col("b")).as("j")))
    spark.stop()
  }
}
