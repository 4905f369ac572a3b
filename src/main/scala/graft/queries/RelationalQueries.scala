package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The delegated relational surface (SURVEY.md §2.2): the reference runs
  * arbitrary DuckDB SQL against ingested tables
  * (/root/reference/duck.go:38-134); here the same surface is the
  * DataFrame DSL / spark.sql over the same tables. Each entry pairs a
  * DataFrame program with DuckDB oracle SQL producing identical columns.
  *
  * Scale notes (100 TB stance):
  *  - dimension joins (region/nation/customer/supplier/part) are
  *    broadcast explicitly — no shuffle of the fact table;
  *  - aggregations are partial (map-side combine) by construction;
  *  - top-k uses orderBy+limit which Spark plans as
  *    TakeOrderedAndProject (no global sort materialization).
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  // --- q1_agg: TPC-H Q1-style pricing summary (flagship) -------------
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum("l_extendedprice").as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        avg("l_quantity").as("avg_qty"),
        avg("l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  sum(l_extendedprice) AS sum_base_price,
      |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
      |  avg(l_quantity) AS avg_qty,
      |  avg(l_discount) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // --------------------------------------------------------------

  val all: Map[String, Q] = Map(
    "q1_agg" -> (q1Agg _)
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql
  )
}
