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

  private def runSeq(rows: Seq[(Long, String, String)],
      gaps: Seq[Long]) =
    Funnel.sequenceMatch(
      rows.map { case (u, t, e) => (u, ts(t), e) }
        .toDF("user_id", "ts", "event_type"),
      steps = Seq("view", "click", "purchase"), gapsSec = gaps)
      .as[(Long, Timestamp, Int, Option[Timestamp])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("sequenceMatch: per-step gaps anchor at the PREVIOUS step; the " +
      "funnel min-reduction would be wrong here (hand counterexample)") {
    // user 1: views at 00:00 and 01:00, click at 01:30, 1 h gaps. The
    // chain through the LATER view matches (30 min leg); reducing to
    // the earliest view per entity (the funnel optimization) would
    // read the 90-min leg and miss it — exactly why sequenceMatch
    // carries full distinct stage sets.
    val out = runSeq(Seq(
      (1L, "2024-01-01 00:00:00", "view"),
      (1L, "2024-01-01 01:00:00", "view"),
      (1L, "2024-01-01 01:30:00", "click"),
      // user 2: every leg inside its gap — full depth, earliest
      // completion
      (2L, "2024-01-01 00:00:00", "view"),
      (2L, "2024-01-01 00:30:00", "click"),
      (2L, "2024-01-01 01:00:00", "purchase"),
      // user 3: purchase 5 h after the click — leg 2's 1 h gap fails
      // even though a 24 h chain-anchored funnel would accept it
      (3L, "2024-01-01 00:00:00", "view"),
      (3L, "2024-01-01 00:30:00", "click"),
      (3L, "2024-01-01 05:30:00", "purchase")),
      gaps = Seq(3600L, 3600L))
    assert(out(1L) == ((ts("2024-01-01 00:00:00"), 2, None)),
      s"later-view leg missed — reduction bug? ${out(1L)}")
    assert(out(2L) == ((ts("2024-01-01 00:00:00"), 3,
      Some(ts("2024-01-01 01:00:00")))))
    assert(out(3L) == ((ts("2024-01-01 00:00:00"), 2, None)),
      s"per-step gap not enforced: ${out(3L)}")
    // the chain-anchored funnel DOES accept user 3's slow chain — the
    // two operators are genuinely different semantics
    val funnel = run(Seq(
      (3L, "2024-01-01 00:00:00", "view"),
      (3L, "2024-01-01 00:30:00", "click"),
      (3L, "2024-01-01 05:30:00", "purchase")))
    assert(funnel(3L)._2 == 3)
  }

  test("sequenceMatch maxPerStep: capped ≡ uncapped on the fixture " +
      "and on entities under the cap; only the hot entity truncates") {
    // fixture: no entity approaches 50 events per step → identical
    val ev = graft.Tables.load(spark, sf0001, "events")
    val unc = Funnel.sequenceMatch(ev,
      steps = Seq("view", "click", "purchase"),
      gapsSec = Seq(14400L, 43200L))
      .collect().map(_.toSeq).toSet
    val cap = Funnel.sequenceMatch(ev,
      steps = Seq("view", "click", "purchase"),
      gapsSec = Seq(14400L, 43200L), maxPerStep = Some(50))
      .collect().map(_.toSeq).toSet
    assert(cap == unc, "capped output diverged on an uncapped fixture")
    // hand case: bot (user 0) has 40 events/step, normal user 1 has 3;
    // cap 5 keeps user 1 bit-identical while the bot still resolves
    // from its NEWEST 5 per step (here: still full depth — its newest
    // events chain within the gaps)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows =
      (0 until 40).flatMap { i =>
        Seq("view", "click", "purchase").zipWithIndex.map {
          case (tp, j) =>
            (0L, new Timestamp(t0 + i * 60000L + j * 15000L), tp)
        }
      } ++ Seq(
        (1L, new Timestamp(t0), "view"),
        (1L, new Timestamp(t0 + 60000L), "click"),
        (1L, new Timestamp(t0 + 120000L), "purchase"))
    val df = rows.toDF("user_id", "ts", "event_type")
    def byUser(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Timestamp, Int, Option[Timestamp])]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val full = byUser(Funnel.sequenceMatch(df,
      steps = Seq("view", "click", "purchase"),
      gapsSec = Seq(3600L, 3600L)))
    val capped = byUser(Funnel.sequenceMatch(df,
      steps = Seq("view", "click", "purchase"),
      gapsSec = Seq(3600L, 3600L), maxPerStep = Some(5)))
    assert(capped(1L) == full(1L), "entity under the cap changed")
    assert(capped(0L)._2 == 3, "bot lost depth despite chaining " +
      "within its newest 5 events per step")
    // the cap keeps NEWEST events: the bot's first_step moves forward
    assert(capped(0L)._1.getTime > full(0L)._1.getTime,
      "cap did not keep the newest events per step")
    intercept[IllegalArgumentException] {
      Funnel.sequenceMatch(df, steps = Seq("view", "click"),
        gapsSec = Seq(3600L), maxPerStep = Some(0))
    }
  }

  test("retention: acquisition-event cohorts, day-k distinct activity, " +
      "non-acquired entities out of scope") {
    val events = Seq(
      // user 1: signup Jan 1, active days 0/1/3 (two events day 1
      // must count once)
      (1L, "2024-01-01 08:00:00", "signup"),
      (1L, "2024-01-02 09:00:00", "click"),
      (1L, "2024-01-02 10:00:00", "view"),
      (1L, "2024-01-04 09:00:00", "click"),
      // user 2: activity BEFORE signup (ignored, k < 0), signup Jan 1,
      // then active day 2 only... and a day-9 event beyond maxDays
      (2L, "2023-12-30 09:00:00", "view"),
      (2L, "2024-01-01 09:00:00", "signup"),
      (2L, "2024-01-03 09:00:00", "purchase"),
      (2L, "2024-01-10 09:00:00", "view"),
      // user 3: signup Jan 2 — its own cohort row
      (3L, "2024-01-02 12:00:00", "signup"),
      (3L, "2024-01-03 12:00:00", "click"),
      // user 4: never signs up — out of scope entirely
      (4L, "2024-01-01 09:00:00", "view"))
      .map { case (u, t, e) => (u, ts(t), e) }
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.retention(events,
        cohortPred = col("event_type") === "signup", maxDays = 3)
      .as[(java.sql.Date, Long, Long, Long, Long)]
      .collect().map(r => r._1.toString -> ((r._2, r._3, r._4, r._5)))
      .toMap
    assert(out == Map(
      "2024-01-01" -> ((2L, 1L, 1L, 1L)), // d1: u1; d2: u2; d3: u1
      "2024-01-02" -> ((1L, 1L, 0L, 0L))))
  }
}
