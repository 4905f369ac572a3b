package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  *    broadcast explicitly — the fact table is never shuffled for them;
  *  - aggregations use partial (map-side) combine by construction;
  *  - top-k is orderBy+limit → Spark plans TakeOrderedAndProject
  *    (per-partition heaps + driver merge, no global sort);
  *  - ties in any ordered output are fully broken by integer keys so
  *    results are deterministic under any partitioning.
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

  // --- q2_filter_project: pushdown-friendly scan ----------------------
  // Filters + projection reach the parquet scan (PushedFilters/ReadSchema).
  def q2Filter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_shipdate") < lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_discount") >= 0.05 && col("l_quantity") < 10)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag")

  val q2FilterSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1996-01-01'
      |  AND l_discount >= 0.05 AND l_quantity < 10""".stripMargin

  // --- q3_join_agg: 3-way join, broadcast dimension -------------------
  def q3JoinAgg(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
    val ord = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum("l_quantity").as("sum_qty"))
  }

  val q3JoinAggSql: String =
    """SELECT o_orderpriority, count(*) AS n_lines, sum(l_quantity) AS sum_qty
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderpriority""".stripMargin

  // --- q4_semi_anti: EXISTS / NOT EXISTS as semi/anti joins ------------
  def q4SemiAnti(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val urgent = t(s, dir, "orders").where(col("o_orderpriority") === "1-URGENT")
    val withUrgent = cust.join(urgent, cust("c_custkey") === urgent("o_custkey"),
      "left_semi").select(col("c_custkey"), lit("has_urgent").as("status"))
    val noUrgent = cust.join(urgent, cust("c_custkey") === urgent("o_custkey"),
      "left_anti").select(col("c_custkey"), lit("no_urgent").as("status"))
    withUrgent.unionAll(noUrgent)
  }

  val q4SemiAntiSql: String =
    """SELECT c_custkey, 'has_urgent' AS status FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |UNION ALL
      |SELECT c_custkey, 'no_urgent' AS status FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin

  // --- q5_window: ranking / offset / running frames --------------------
  // Ordering fully determined by integer keys (no float-tie ambiguity).
  def q5Window(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      row_number().over(w).as("rn"),
      lag("o_orderkey", 1).over(w).as("prev_order"),
      count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .as("running_orders"))
  }

  val q5WindowSql: String =
    """SELECT o_custkey, o_orderkey,
      |  row_number() OVER w AS rn,
      |  lag(o_orderkey, 1) OVER w AS prev_order,
      |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_orders
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin

  // --- q6_topk: top-k via TakeOrderedAndProject ------------------------
  // sum of whole-number doubles is exact; ties broken by l_orderkey.
  def q6TopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_lines"))
      .orderBy(col("sum_qty").desc, col("l_orderkey").asc)
      .limit(10)

  val q6TopKSql: String =
    """SELECT l_orderkey, sum(l_quantity) AS sum_qty, count(*) AS n_lines
      |FROM lineitem GROUP BY l_orderkey
      |ORDER BY sum_qty DESC, l_orderkey ASC LIMIT 10""".stripMargin

  // --- q7_rollup: grouping sets / rollup -------------------------------
  def q7Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))

  val q7RollupSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin

  // --- q8_setops: intersect / except -----------------------------------
  def q8SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val buyersO = o.where(col("o_orderstatus") === "O").select(col("o_custkey"))
    val buyersF = o.where(col("o_orderstatus") === "F").select(col("o_custkey"))
    val both = buyersO.intersect(buyersF)
      .select(col("o_custkey"), lit("both").as("side"))
    val onlyO = buyersO.except(buyersF)
      .select(col("o_custkey"), lit("only_open").as("side"))
    both.unionAll(onlyO)
  }

  val q8SetOpsSql: String =
    """SELECT o_custkey, 'both' AS side FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |UNION ALL
      |SELECT o_custkey, 'only_open' AS side FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""".stripMargin

  // --- q9_distinct: exact distinct aggregation -------------------------
  def q9Distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_lines"))

  val q9DistinctSql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_lines
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // --- q10_scalar: string/date/math scalar functions -------------------
  def q10Scalar(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      upper(col("o_orderpriority")).as("prio_upper"),
      substring(col("o_orderstatus"), 1, 1).as("status_c"),
      length(col("o_orderpriority")).as("prio_len"),
      year(col("o_orderdate")).as("o_year"),
      month(col("o_orderdate")).as("o_month"),
      dayofmonth(col("o_orderdate")).as("o_day"),
      round(col("o_totalprice"), 1).as("price_r1"),
      (col("o_orderkey") % 7).as("key_mod"),
      concat(col("o_orderstatus"), lit("-"), col("o_orderpriority"))
        .as("status_prio"))

  val q10ScalarSql: String =
    """SELECT o_orderkey,
      |  upper(o_orderpriority) AS prio_upper,
      |  substring(o_orderstatus, 1, 1) AS status_c,
      |  length(o_orderpriority) AS prio_len,
      |  year(o_orderdate) AS o_year,
      |  month(o_orderdate) AS o_month,
      |  day(o_orderdate) AS o_day,
      |  round(o_totalprice, 1) AS price_r1,
      |  o_orderkey % 7 AS key_mod,
      |  o_orderstatus || '-' || o_orderpriority AS status_prio
      |FROM orders""".stripMargin

  // --- q11_sql_subquery: SQL surface with scalar + IN subqueries -------
  def q11Subquery(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders").foreach(n =>
      t(s, dir, n).createOrReplaceTempView(n))
    s.sql(
      """SELECT c_custkey, c_acctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |  AND c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_orderstatus = 'O')""".stripMargin)
  }

  val q11SubquerySql: String =
    """SELECT c_custkey, c_acctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      |  AND c_custkey IN (SELECT o_custkey FROM orders
      |                    WHERE o_orderstatus = 'O')""".stripMargin

  // --- q12_json: JSON extraction on the events payload -----------------
  def q12Json(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))

  // DuckDB sum(BIGINT) yields HUGEINT, which pandas-side canonicalization
  // turns into float64 ("123.0") while Spark's LongType sum stays int64
  // ("123") — CAST back to BIGINT so both engines emit identical types.
  val q12JsonSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
      |    AS BIGINT) AS sum_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type""".stripMargin

  // --- q13_star_join: snowflake join over all dimensions ---------------
  def q13Star(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val sup = t(s, dir, "supplier")
    val nat = t(s, dir, "nation")
    val reg = t(s, dir, "region")
    li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("sum_qty"))
  }

  val q13StarSql: String =
    """SELECT r_name, n_name, count(*) AS n_lines, sum(l_quantity) AS sum_qty
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  // --- q14_cube: full cube over two dimensions -------------------------
  def q14Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .cube("o_orderstatus", "o_year")
      .agg(count(lit(1)).as("n_orders"))

  val q14CubeSql: String =
    """SELECT o_orderstatus, year(o_orderdate) AS o_year,
      |  count(*) AS n_orders
      |FROM orders GROUP BY CUBE (o_orderstatus, year(o_orderdate))""".stripMargin

  // --- q15_grouping_sets: explicit GROUPING SETS (SQL surface) ---------
  def q15GroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  val q15GroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin

  // --- q16_approx_distinct: HLL sketch (rows-only — HLL++ vs DuckDB's
  // implementation differ by design). The query is the SKETCH alone so
  // its bench row measures HLL cost, not an exact distinct riding
  // along; the sketch-vs-exact error bound is pinned by the suite
  // (RelationalQueriesSpec "q16 sketch stays within ..."). --------------
  def q16ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))

  // --- q17_salted_join: skew-mitigated join (operators.Salting) -------
  def q17SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val part = t(s, dir, "part")
    graft.operators.Salting
      .saltedJoin(li.withColumnRenamed("l_partkey", "p_partkey"), part,
        Seq("p_partkey"), buckets = 8,
        // cheap salt: one narrow column that varies within a part key
        // (hashing all 16 lineitem columns measured as pure waste)
        saltFrom = Seq(col("l_orderkey")))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("sum_qty"))
  }

  val q17SaltedJoinSql: String =
    """SELECT p_brand, count(*) AS n_lines, sum(l_quantity) AS sum_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""".stripMargin

  // --- q18_pivot: pivot on order status --------------------------------
  // Spark `pivot` leaves absent combinations NULL while DuckDB's
  // FILTER-counts give 0 — na.fill aligns them.
  def q18Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .na.fill(0)

  val q18PivotSql: String =
    """SELECT o_orderpriority,
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  // --- q19_udaf: typed Aggregator (weighted mean) ----------------------
  def q19Udaf(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(graft.functions.WeightedMeanAgg.weighted_mean(
        col("l_extendedprice"), col("l_quantity")), 4).as("wmean_price"))

  val q19UdafSql: String =
    """SELECT l_returnflag,
      |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
      |    AS wmean_price
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // --- q20_recursive: recursive CTE (Spark 4's UnionLoop) — the
  // gap-filled month spine, a reporting shape that genuinely needs
  // recursion: months with zero orders must still appear. Bounds come
  // from the data (CTE cross-joined into the recursive step), so the
  // query holds at any SF. Spark supports UNION ALL recursion only
  // (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE) — the monotone increment
  // terminates without dedup. Recursion is YEAR-chunked: every
  // UnionLoop iteration is a full Spark job (~0.2 s of scheduler
  // latency at local scale), so a month-by-month spine paid 80
  // iterations ≈ 17 s; the anchor emits 12 months and each step
  // shifts the previous year by 12 → ~7 iterations, same rows
  // (measured 17.0 → ~1.5 s). DuckDB has no add_months; the oracle
  // advances with INTERVAL arithmetic and a range() table function
  // for the anchor year. -----------------------------------------------
  def q20Recursive(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders")
    // The recursion carries `hi` AS A COLUMN: a step that re-joined
    // `bounds` re-ran the full orders scan + min/max aggregate EVERY
    // iteration (each UnionLoop iteration is its own plan execution —
    // CTEs are inlined per reference). Round 15 measured the carry:
    // the per-iteration job drops to a local-table map (guide §1:
    // carry what you computed, don't recompute it). The month spine
    // is unchanged, so the oracle (and the output hash) is too.
    s.sql(
      """WITH RECURSIVE bounds AS (
        |  SELECT CAST(date_trunc('MONTH', min(o_orderdate)) AS DATE) AS lo,
        |         CAST(date_trunc('MONTH', max(o_orderdate)) AS DATE) AS hi
        |  FROM orders),
        |months(m, hi) AS (
        |  SELECT add_months(lo, i), hi
        |  FROM bounds LATERAL VIEW explode(sequence(0, 11)) t AS i
        |  WHERE add_months(lo, i) <= hi
        |  UNION ALL
        |  SELECT add_months(m, 12), hi FROM months
        |  WHERE add_months(m, 12) <= hi)
        |SELECT m AS month, count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS revenue
        |FROM months LEFT JOIN orders
        |  ON CAST(date_trunc('MONTH', o_orderdate) AS DATE) = m
        |GROUP BY m""".stripMargin)
  }

  val q20RecursiveSql: String =
    """WITH RECURSIVE bounds AS (
      |  SELECT CAST(date_trunc('MONTH', min(o_orderdate)) AS DATE) AS lo,
      |         CAST(date_trunc('MONTH', max(o_orderdate)) AS DATE) AS hi
      |  FROM orders),
      |months(m) AS (
      |  SELECT CAST(lo + INTERVAL (i) MONTH AS DATE)
      |  FROM bounds, range(0, 12) t(i)
      |  WHERE CAST(lo + INTERVAL (i) MONTH AS DATE) <= hi
      |  UNION ALL
      |  SELECT CAST(m + INTERVAL 12 MONTH AS DATE) FROM months, bounds
      |  WHERE CAST(m + INTERVAL 12 MONTH AS DATE) <= hi)
      |SELECT m AS month, count(o_orderkey) AS n_orders,
      |  round(coalesce(sum(o_totalprice), 0), 2) AS revenue
      |FROM months LEFT JOIN orders
      |  ON CAST(date_trunc('MONTH', o_orderdate) AS DATE) = m
      |GROUP BY m""".stripMargin

  // --- q21_unpivot: melt wide metric columns to long form (the
  // DataFrame unpivot API; DuckDB's SQL-standard UNPIVOT oracles the
  // same relation) -----------------------------------------------------
  def q21Unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_orderkey") % 10 === 0)
      .select("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax")
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        variableColumnName = "metric", valueColumnName = "value")

  val q21UnpivotSql: String =
    """WITH src AS (
      |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |    l_discount, l_tax
      |  FROM lineitem WHERE l_orderkey % 10 = 0)
      |UNPIVOT src
      |ON l_quantity, l_extendedprice, l_discount, l_tax
      |INTO NAME metric VALUE value""".stripMargin

  // --- q22_lateral: correlated LATERAL subquery with ORDER BY+LIMIT
  // (top-3 customers per nation by balance) — the SQL-standard
  // top-N-per-group form. Catalyst DECORRELATES it into the skew-safe
  // shape (plan-pinned in PlanQualitySuite): a PARTIAL
  // WindowGroupLimit below the exchange (a hot nation ships ≤ 3 ×
  // nMapPartitions rows, the llm_source_cap contract) joined to the
  // broadcast dimension — never a per-row subquery re-execution.
  // DuckDB runs the same LATERAL text verbatim. ------------------------
  def q22Lateral(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("nation")
    t(s, dir, "customer").createOrReplaceTempView("customer")
    s.sql(q22LateralSql)
  }

  val q22LateralSql: String =
    """SELECT n_name, t.c_custkey, t.c_name, t.c_acctbal
      |FROM nation,
      |LATERAL (SELECT c_custkey, c_name, c_acctbal FROM customer
      |         WHERE c_nationkey = n_nationkey
      |         ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t""".stripMargin

  // --------------------------------------------------------------

  // --- q23_histogram: per-group equi-width value histogram (the
  // numeric_histogram / width_bucket analytics shape) — bucket = pure
  // integer-floor arithmetic written identically in both engines
  // (Spark has width_bucket only as an expression in 4.x SQL; the
  // explicit floor keeps the oracle text trivially equivalent and the
  // DECIMAL-literal trap out via explicit DOUBLE casts). Map-side
  // bucketing + partial-aggregated count: one shuffle of ≤
  // |groups|×|buckets| rows whatever the event count. ------------------
  def q23Histogram(s: SparkSession, dir: String): DataFrame = {
    val bucket = least(floor(col("value") / lit(50.0)), lit(19L))
      .cast("int")
    // NULL measurements are EXCLUDED, not bucketed (review finding:
    // least() skips NULLs in both engines, so an unfiltered NULL
    // value would silently land in the clamp bucket 19)
    graft.Tables.load(s, dir, "events")
      .where(col("value").isNotNull)
      .select(col("event_type"), bucket.as("bucket"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("lo", col("bucket") * lit(50.0))
  }

  val q23HistogramSql: String =
    """SELECT event_type,
      |  CAST(least(floor(value / CAST(50.0 AS DOUBLE)),
      |    CAST(19 AS DOUBLE)) AS INT) AS bucket,
      |  count(*) AS cnt,
      |  CAST(least(floor(value / CAST(50.0 AS DOUBLE)),
      |    CAST(19 AS DOUBLE)) AS INT) * CAST(50.0 AS DOUBLE) AS lo
      |FROM events
      |WHERE value IS NOT NULL
      |GROUP BY 1, 2""".stripMargin

  val all: Map[String, Q] = Map(
    "q1_agg" -> (q1Agg _),
    "q23_histogram" -> (q23Histogram _),
    "q2_filter_project" -> (q2Filter _),
    "q3_join_agg" -> (q3JoinAgg _),
    "q4_semi_anti" -> (q4SemiAnti _),
    "q5_window" -> (q5Window _),
    "q6_topk" -> (q6TopK _),
    "q7_rollup" -> (q7Rollup _),
    "q8_setops" -> (q8SetOps _),
    "q9_distinct" -> (q9Distinct _),
    "q10_scalar" -> (q10Scalar _),
    "q11_subquery" -> (q11Subquery _),
    "q12_json" -> (q12Json _),
    "q13_star_join" -> (q13Star _),
    "q14_cube" -> (q14Cube _),
    "q15_grouping_sets" -> (q15GroupingSets _),
    "q16_approx_distinct" -> (q16ApproxDistinct _),
    "q17_salted_join" -> (q17SaltedJoin _),
    "q18_pivot" -> (q18Pivot _),
    "q19_udaf" -> (q19Udaf _),
    "q20_recursive" -> (q20Recursive _),
    "q21_unpivot" -> (q21Unpivot _),
    "q22_lateral" -> (q22Lateral _)
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "q23_histogram" -> q23HistogramSql,
    "q2_filter_project" -> q2FilterSql,
    "q3_join_agg" -> q3JoinAggSql,
    "q4_semi_anti" -> q4SemiAntiSql,
    "q5_window" -> q5WindowSql,
    "q6_topk" -> q6TopKSql,
    "q7_rollup" -> q7RollupSql,
    "q8_setops" -> q8SetOpsSql,
    "q9_distinct" -> q9DistinctSql,
    "q10_scalar" -> q10ScalarSql,
    "q11_subquery" -> q11SubquerySql,
    "q12_json" -> q12JsonSql,
    "q13_star_join" -> q13StarSql,
    "q14_cube" -> q14CubeSql,
    "q15_grouping_sets" -> q15GroupingSetsSql,
    "q17_salted_join" -> q17SaltedJoinSql,
    "q18_pivot" -> q18PivotSql,
    "q19_udaf" -> q19UdafSql,
    "q20_recursive" -> q20RecursiveSql,
    "q21_unpivot" -> q21UnpivotSql,
    "q22_lateral" -> q22LateralSql
  )
}
