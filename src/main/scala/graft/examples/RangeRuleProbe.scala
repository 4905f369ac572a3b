package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: ContainmentJoinRule at 10× — the naive BETWEEN join a
  * user writes, rule OFF (Spark's BroadcastNestedLoopJoin) vs rule ON
  * (the bucketed equi rewrite), plus the adversarial-width arm
  * proving the fan-out guard fails loudly with its actionable message
  * at runtime. Backs the SCALE.md round-12 record. */
object RangeRuleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    // 10× points with distinct keys; dates reused (density constant)
    val points = (0 until 10).map { i =>
      orders.select(
        (col("o_orderkey") + lit(i * 100000000L)).as("pkey"),
        unix_date(to_date(col("o_orderdate"))).as("p"))
    }.reduce(_ unionAll _).repartition(32).localCheckpoint(true)
    val windows = (0 until 10).map { i =>
      orders.where(col("o_orderkey") % 100 === 0)
        .select((col("o_orderkey") + lit(i * 100000000L)).as("wkey"),
          unix_date(to_date(col("o_orderdate"))).as("s"))
        .withColumn("e", col("s") + 6)
    }.reduce(_ unionAll _).localCheckpoint(true)
    println(s"points=${points.count()} windows=${windows.count()}")

    def naive = points.join(windows,
      col("p") >= col("s") && col("p") <= col("e"))
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    spark.conf.set("spark.graft.rangeJoin.bucketWidth", "7")
    val headOff = naive.queryExecution.executedPlan.toString()
      .linesIterator.find(_.contains("Join")).getOrElse("?")
    timed("rule OFF (BNLJ)")(naive.count())
    println(s"  plan: ${headOff.trim.take(90)}")
    spark.experimental.extraOptimizations =
      Seq(graft.plans.ContainmentJoinRule)
    try {
      val headOn = naive.queryExecution.executedPlan.toString()
        .linesIterator.find(_.contains("Join")).getOrElse("?")
      timed("rule ON (bucketed)")(naive.count())
      println(s"  plan: ${headOn.trim.take(90)}")
      // adversarial width: one open-ended sentinel interval — the
      // guard must surface the actionable graft message, not hang in
      // Sequence or die in an array-size error
      import spark.implicits._
      val sentinel = windows.unionByName(
        Seq((-1L, 0L, Long.MaxValue)).toDF("wkey", "s", "e"))
      try {
        points.join(sentinel,
          col("p") >= col("s") && col("p") <= col("e")).count()
        println("GUARD DID NOT FIRE (bad)")
      } catch { case t: Throwable =>
        def msgs(x: Throwable): Seq[String] =
          if (x == null) Nil
          else Option(x.getMessage).toSeq ++ msgs(x.getCause)
        val hit = msgs(t).exists(_.contains("ContainmentJoinRule"))
        println(s"guard fired, actionable=$hit: " +
          msgs(t).find(_.contains("ContainmentJoinRule"))
            .getOrElse(msgs(t).headOption.getOrElse("?")).take(140))
      }
    } finally spark.experimental.extraOptimizations = Nil
    spark.stop()
  }
}
