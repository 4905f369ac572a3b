package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsofJoinSuite extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  val quotes = Seq( // (sym, time, px) — the right side
    ("A", ts("2024-01-01 00:00:01"), 1.0),
    ("A", ts("2024-01-01 00:00:10"), 2.0),
    ("A", ts("2024-01-01 00:00:20"), 3.0),
    ("B", ts("2024-01-01 00:00:07"), 9.0)
  ).toDF("sym", "qt", "px")

  val trades = Seq( // (sym, time, qty) — the left side
    ("A", ts("2024-01-01 00:00:05"), 10L),
    ("A", ts("2024-01-01 00:00:10"), 20L), // equal time → inclusive match
    ("A", ts("2024-01-01 00:00:15"), 30L),
    ("B", ts("2024-01-01 00:00:01"), 40L), // before any quote → null
    ("C", ts("2024-01-01 00:00:05"), 50L)  // key with no quotes → null
  ).toDF("sym", "tt", "qty")

  test("backward as-of join picks latest right row at or before left time") {
    val out = AsofJoin.joinAsof(trades, quotes,
      Seq("sym" -> "sym"), "tt", "qt")
      .select("sym", "qty", "px").as[(String, Long, Option[Double])]
      .collect().toSet
    assert(out == Set(
      ("A", 10L, Some(1.0)),
      ("A", 20L, Some(2.0)), // inclusive: equal timestamps match
      ("A", 30L, Some(2.0)),
      ("B", 40L, None),
      ("C", 50L, None)))
  }

  test("tolerance nulls out stale matches") {
    val out = AsofJoin.joinAsof(trades, quotes,
      Seq("sym" -> "sym"), "tt", "qt", toleranceMillis = Some(4000))
      .select("sym", "qty", "px").as[(String, Long, Option[Double])]
      .collect().toSet
    // A@05 matched quote@01 (4s old, within 4000ms); A@15 matched
    // quote@10 (5s old → nulled)
    assert(out == Set(
      ("A", 10L, Some(1.0)),
      ("A", 20L, Some(2.0)),
      ("A", 30L, None),
      ("B", 40L, None),
      ("C", 50L, None)))
  }

  test("forward as-of join picks earliest right row at or after left time") {
    val out = AsofJoin.joinAsof(trades, quotes,
      Seq("sym" -> "sym"), "tt", "qt", direction = "forward")
      .select("sym", "qty", "px").as[(String, Long, Option[Double])]
      .collect().toSet
    assert(out == Set(
      ("A", 10L, Some(2.0)),
      ("A", 20L, Some(2.0)), // inclusive: equal timestamps match
      ("A", 30L, Some(3.0)),
      ("B", 40L, Some(9.0)), // quote@07 is ahead of trade@01
      ("C", 50L, None)))
  }

  test("nearest as-of join picks the closer side, ties to backward") {
    val t2 = Seq(
      ("A", ts("2024-01-01 00:00:05"), 10L), // 4s back vs 5s fwd → back
      ("A", ts("2024-01-01 00:00:15"), 30L), // 5s back vs 5s fwd → tie → back
      ("A", ts("2024-01-01 00:00:19"), 60L), // 9s back vs 1s fwd → fwd
      ("B", ts("2024-01-01 00:00:01"), 40L), // only forward exists
      ("B", ts("2024-01-01 00:00:30"), 70L), // only backward exists
      ("C", ts("2024-01-01 00:00:05"), 50L)  // no quotes at all
    ).toDF("sym", "tt", "qty")
    val out = AsofJoin.joinAsof(t2, quotes,
      Seq("sym" -> "sym"), "tt", "qt", direction = "nearest")
      .select("sym", "qty", "px").as[(String, Long, Option[Double])]
      .collect().toSet
    assert(out == Set(
      ("A", 10L, Some(1.0)),
      ("A", 30L, Some(2.0)),
      ("A", 60L, Some(3.0)),
      ("B", 40L, Some(9.0)),
      ("B", 70L, Some(9.0)),
      ("C", 50L, None)))
  }

  test("nearest tolerance bounds the absolute distance") {
    val t2 = Seq(
      ("A", ts("2024-01-01 00:00:19"), 60L), // fwd match 1s away → kept
      ("B", ts("2024-01-01 00:00:30"), 70L)  // back match 23s away → nulled
    ).toDF("sym", "tt", "qty")
    val out = AsofJoin.joinAsof(t2, quotes,
      Seq("sym" -> "sym"), "tt", "qt", toleranceMillis = Some(2000),
      direction = "nearest")
      .select("sym", "qty", "px").as[(String, Long, Option[Double])]
      .collect().toSet
    assert(out == Set(("A", 60L, Some(3.0)), ("B", 70L, None)))
  }

  test("plan has exactly one shuffle (no range join blowup)") {
    val out = AsofJoin.joinAsof(trades, quotes, Seq("sym" -> "sym"),
      "tt", "qt")
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("nearest evaluates both directions over ONE keyed exchange") {
    val out = AsofJoin.joinAsof(trades, quotes, Seq("sym" -> "sym"),
      "tt", "qt", direction = "nearest")
    val plan = out.queryExecution.executedPlan.toString()
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      plan.take(800))
  }
}
