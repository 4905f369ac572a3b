package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BucketingSuite extends SparkSpec {

  test("same-bucketed tables join and aggregate with ZERO exchanges") {
    val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(bcastKey)
    try {
      // disable broadcast so the exchange-free claim is tested against
      // the shuffle-join planner, not hidden by a tiny-table broadcast
      spark.conf.set(bcastKey, "-1")
      val orders = Tables.load(spark, sf0001, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val lineitem = Tables.load(spark, sf0001, "lineitem")
        .select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey")
      Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4,
        sortCols = Seq("o_orderkey"))
      Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 4,
        sortCols = Seq("o_orderkey"))

      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(800)}")
      // correctness: equals the plain join
      val expected = orders.join(lineitem, Seq("o_orderkey")).count()
      assert(joined.count() == expected && expected > 0)

      // aggregation on the bucket key is exchange-free too
      val agg = spark.table("b_lineitem").groupBy("o_orderkey")
        .agg(sum("l_quantity").as("q"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucketed aggregation still shuffles")
    } finally {
      spark.conf.set(bcastKey, prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
