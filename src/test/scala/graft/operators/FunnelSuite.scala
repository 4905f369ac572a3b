package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Funnel semantics the fixture oracle can't isolate: EXISTS-chains
  * beat greedy-from-first-event, the horizon is anchored at the
  * CHAIN'S step 1 (not the user's first event), and ordering within
  * the horizon is strict. */
class FunnelSuite extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def run(rows: Seq[(Long, String, String)]) =
    Funnel.windowFunnel(
      rows.map { case (u, t, e) => (u, ts(t), e) }
        .toDF("user_id", "ts", "event_type"),
      steps = Seq("view", "click", "purchase"),
      horizon = expr("INTERVAL 24 HOURS"))
      .as[(Long, Timestamp, Int, Option[Timestamp])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("exists-chain depth: a later view converts even when the first " +
      "view's horizon expired; horizon anchors at the chain start") {
    val out = run(Seq(
      // user 1: first view's 24 h pass eventless; a view 3 days later
      // converts fully — greedy-from-first-view would report depth 1
      (1L, "2024-01-01 00:00:00", "view"),
      (1L, "2024-01-04 00:00:00", "view"),
      (1L, "2024-01-04 01:00:00", "click"),
      (1L, "2024-01-04 02:00:00", "purchase"),
      // user 2: click inside the horizon, purchase 25 h after the
      // chain's view — depth 2, no completion
      (2L, "2024-01-01 00:00:00", "view"),
      (2L, "2024-01-01 01:00:00", "click"),
      (2L, "2024-01-02 01:00:00", "purchase"),
      // user 3: purchase BEFORE the click — order is strict, depth 2
      (3L, "2024-01-01 00:00:00", "view"),
      (3L, "2024-01-01 00:30:00", "purchase"),
      (3L, "2024-01-01 01:00:00", "click"),
      // user 4: views only
      (4L, "2024-01-01 00:00:00", "view"),
      // user 5: no view at all — absent from the output
      (5L, "2024-01-01 00:00:00", "click")))
    assert(out(1L) == ((ts("2024-01-01 00:00:00"), 3,
      Some(ts("2024-01-04 02:00:00")))),
      s"later-chain conversion missed: ${out(1L)}")
    assert(out(2L) == ((ts("2024-01-01 00:00:00"), 2, None)))
    assert(out(3L) == ((ts("2024-01-01 00:00:00"), 2, None)))
    assert(out(4L) == ((ts("2024-01-01 00:00:00"), 1, None)))
    assert(!out.contains(5L), "entity without step 1 leaked in")
    // completed_at is the EARLIEST completion across chains
    val multi = run(Seq(
      (7L, "2024-01-01 00:00:00", "view"),
      (7L, "2024-01-01 01:00:00", "click"),
      (7L, "2024-01-01 05:00:00", "purchase"),
      (7L, "2024-01-01 02:00:00", "purchase")))
    assert(multi(7L)._3 == Some(ts("2024-01-01 02:00:00")))
  }
}
