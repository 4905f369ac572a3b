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

  test("every query has matching column names with its oracle intent") {
    // structural guard: all registered queries run on sf0.001
    RelationalQueries.all.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }
}
