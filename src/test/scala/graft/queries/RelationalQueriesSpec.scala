package graft.queries

import graft.SparkSpec

class RelationalQueriesSpec extends SparkSpec {

  test("q1_agg returns grouped pricing summary with aliased columns") {
    val df = RelationalQueries.q1Agg(spark, sf0001)
    assert(df.columns.toSeq == Seq("l_returnflag", "l_linestatus",
      "sum_qty", "sum_base_price", "sum_disc_price", "avg_qty",
      "avg_disc", "count_order"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // conservation: group counts must sum to table count
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total == graft.Tables.load(spark, sf0001, "lineitem").count())
  }

  test("q16 sketch stays within the configured error of exact distinct") {
    // The registered query carries the SKETCH alone (its bench row
    // measures HLL cost); the correctness bound lives here: at rsd
    // 0.02 the estimate must sit within a conservative 10% of exact.
    import org.apache.spark.sql.functions._
    val li = graft.Tables.load(spark, sf0001, "lineitem")
    val both = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (a, e) = (r.getAs[Long]("approx"), r.getAs[Long]("exact"))
      assert(math.abs(a - e) <= math.max(1L, (0.1 * e).toLong),
        s"flag ${r.get(0)}: approx $a vs exact $e")
    }
  }

  test("q23 histogram conserves mass, buckets clamp to [0, 19], " +
      "aggregation partial") {
    import org.apache.spark.sql.functions._
    val q = RelationalQueries.q23Histogram(spark, sf0001)
    val out = q.collect()
    val total = graft.Tables.load(spark, sf0001, "events")
      .where(col("value").isNotNull).count()
    assert(out.map(_.getAs[Long]("cnt")).sum == total)
    out.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(b >= 0 && b <= 19, r.toString)
      assert(r.getAs[Double]("lo") == b * 50.0)
    }
    val plan = q.queryExecution.executedPlan.toString()
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(400))
    // NULL measurements are excluded, never clamp-bucketed into 19
    // (least() skips NULLs — the silent-inflation trap)
    import spark.implicits._
    val withNull = Seq(("a", Some(10.0)), ("a", None), ("a", Some(9999.0)))
      .toDF("event_type", "value")
      .withColumn("value", col("value").cast("double"))
    val bucket = least(floor(col("value") / lit(50.0)), lit(19L))
      .cast("int")
    val h = withNull.where(col("value").isNotNull)
      .groupBy(col("event_type"), bucket.as("bucket"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(h == Map(0 -> 1L, 19 -> 1L), h.toString)
  }

  test("every query has matching column names with its oracle intent") {
    // structural guard: all registered queries run on sf0.001
    RelationalQueries.all.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }
}
