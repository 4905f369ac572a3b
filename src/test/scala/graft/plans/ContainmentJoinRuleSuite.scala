package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ContainmentJoinRuleSuite extends SparkSpec {
  import spark.implicits._

  // negatives (bucket tiling), boundary-inclusive hits, an empty
  // interval, a null point and a null bound — every edge the operator
  // suite pins, through the RULE instead.
  private def points = Seq(
    (1L, -2500L), (2L, -1L), (3L, 0L), (4L, 999L), (5L, 1000L),
    (6L, 4242L), (7L, 7000L)).toDF("pid", "p")
      .unionByName(Seq((8L, Option.empty[Long])).toDF("pid", "p"))
  private def intervals = Seq(
    (10L, -3000L, -2000L), (11L, -10L, 5L), (12L, 0L, 999L),
    (13L, 999L, 1000L), (14L, 4000L, 5000L), (15L, 5000L, 4000L))
    .toDF("iid", "s", "e")
    .unionByName(Seq((16L, Option.empty[Long], Option(9000L)))
      .toDF("iid", "s", "e"))

  private def naive(p: DataFrame, i: DataFrame): DataFrame =
    p.join(i, col("p") >= col("s") && col("p") <= col("e"))

  private def collectSet(df: DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").as[(Long, Long)].collect().toSet

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations = Seq(ContainmentJoinRule)
    try f
    finally spark.experimental.extraOptimizations = Nil
  }

  test("control: the naive containment join IS a nested loop without the rule") {
    val plan = naive(points, intervals).queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"control assumption broke — plan:\n$plan")
  }

  test("rule rewrites to a bucketed equi join with identical results") {
    val expected = collectSet(naive(points, intervals))
    assert(expected.nonEmpty)
    // boundary hits present in the fixture: p=999 in [0,999] & [999,1000]
    assert(expected.contains((4L, 12L)) && expected.contains((4L, 13L)))
    withRule {
      val df = naive(points, intervals)
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rule did not fire:\n$plan")
      assert(plan.contains("Generate explode"),
        s"no bucket generation in plan:\n$plan")
      assert(collectSet(df) == expected, "rewritten join changed results")
    }
    // and the rewrite agrees with the hand-built operator
    val op = graft.operators.RangeJoin.joinPointsInIntervals(
      points, intervals, col("p"), col("s"), col("e"), bucketWidth = 1000L)
    assert(collectSet(op) == expected)
  }

  test("strict bounds and flipped orientations rewrite with exact residuals") {
    val strictExpected = collectSet(
      points.join(intervals, col("p") > col("s") && col("p") < col("e")))
    withRule {
      val strict = points.join(intervals,
        col("p") > col("s") && col("p") < col("e"))
      assert(!strict.queryExecution.executedPlan.toString()
        .contains("BroadcastNestedLoopJoin"))
      assert(collectSet(strict) == strictExpected,
        "strictness lost in the residual")
      // flipped comparison orientation (s <= p && e >= p)
      val flipped = points.join(intervals,
        col("s") <= col("p") && col("e") >= col("p"))
      assert(!flipped.queryExecution.executedPlan.toString()
        .contains("BroadcastNestedLoopJoin"))
      assert(collectSet(flipped) == collectSet(naive(points, intervals)))
    }
  }

  test("no-fire guards: equi-keyed bands, non-integral axes stay untouched") {
    withRule {
      // an equi key makes the naive plan a hash join already — the
      // rule must not add replication on top
      val pk = points.withColumn("k", col("pid") % 2)
      val ik = intervals.withColumn("k", col("iid") % 2)
      val keyed = pk.join(ik, pk("k") === ik("k") &&
        col("p") >= col("s") && col("p") <= col("e"))
      val keyedPlan = keyed.queryExecution.executedPlan.toString()
      assert(!keyedPlan.contains("Generate explode"),
        s"rule fired on an equi-keyed join:\n$keyedPlan")
      // double-typed axis: bucket math would be inexact — left alone
      val pd = points.withColumn("pd", col("p").cast("double"))
      val id2 = intervals.withColumn("sd", col("s").cast("double"))
        .withColumn("ed", col("e").cast("double"))
      val dbl = pd.join(id2,
        col("pd") >= col("sd") && col("pd") <= col("ed"))
      assert(!dbl.queryExecution.executedPlan.toString()
        .contains("Generate explode"), "rule fired on a double axis")
    }
  }

  test("extra cross-side conjuncts survive as residuals") {
    val base = points.join(intervals,
      col("p") >= col("s") && col("p") <= col("e") &&
        col("pid") =!= col("iid") % 7)
    val expected = collectSet(base)
    withRule {
      val df = naive(points, intervals)
        .where(col("pid") =!= col("iid") % 7)
      val rewritten = points.join(intervals,
        col("p") >= col("s") && col("p") <= col("e") &&
          col("pid") =!= col("iid") % 7)
      assert(!rewritten.queryExecution.executedPlan.toString()
        .contains("BroadcastNestedLoopJoin"))
      assert(collectSet(rewritten) == expected)
    }
  }

  test("outer/semi/anti orientations: rewritten when the preserved side " +
      "is the point side, untouched otherwise, results identical") {
    def outerSet(df: DataFrame): Set[(Long, Option[Long])] =
      df.select("pid", "iid").as[(Long, Option[Long])].collect().toSet
    val loExpected = outerSet(points.join(intervals,
      col("p") >= col("s") && col("p") <= col("e"), "left_outer"))
    val semiExpected = points.join(intervals,
      col("p") >= col("s") && col("p") <= col("e"), "left_semi")
      .select("pid").as[Long].collect().toSet
    val antiExpected = points.join(intervals,
      col("p") >= col("s") && col("p") <= col("e"), "left_anti")
      .select("pid").as[Long].collect().toSet
    // sanity: the fixture exercises all three outcomes
    assert(loExpected.exists(_._2.isEmpty) && semiExpected.nonEmpty &&
      antiExpected.nonEmpty)
    withRule {
      val lo = points.join(intervals,
        col("p") >= col("s") && col("p") <= col("e"), "left_outer")
      assert(!lo.queryExecution.executedPlan.toString()
        .contains("BroadcastNestedLoopJoin"), "left_outer did not rewrite")
      assert(outerSet(lo) == loExpected)
      val semi = points.join(intervals,
        col("p") >= col("s") && col("p") <= col("e"), "left_semi")
      assert(!semi.queryExecution.executedPlan.toString()
        .contains("BroadcastNestedLoopJoin"), "left_semi did not rewrite")
      assert(semi.select("pid").as[Long].collect().toSet == semiExpected)
      val anti = points.join(intervals,
        col("p") >= col("s") && col("p") <= col("e"), "left_anti")
      assert(!anti.queryExecution.executedPlan.toString()
        .contains("BroadcastNestedLoopJoin"), "left_anti did not rewrite")
      assert(anti.select("pid").as[Long].collect().toSet == antiExpected)
      // the UNSAFE orientation — intervals preserved (left_outer with
      // the point on the right) — must stay a nested loop: a
      // replicated preserved side would change multiplicities
      val loWrong = intervals.join(points,
        col("p") >= col("s") && col("p") <= col("e"), "left_outer")
      assert(!loWrong.queryExecution.executedPlan.toString()
        .contains("Generate explode"),
        "rule fired with the replicated side preserved")
      // right_outer with the point on the right IS the safe mirror
      val ro = intervals.join(points,
        col("p") >= col("s") && col("p") <= col("e"), "right_outer")
      assert(!ro.queryExecution.executedPlan.toString()
        .contains("BroadcastNestedLoopJoin"), "right_outer did not rewrite")
      val roSet = ro.select("pid", "iid").as[(Long, Option[Long])]
        .collect().toSet
      assert(roSet == loExpected)
    }
  }

  test("a wrong-orientation pair listed first must not mask the legal one") {
    // left_outer with TWO containment pairs: the first conjunct pair's
    // point lives on the RIGHT (illegal orientation for left_outer),
    // the second pair's on the LEFT (legal). The orientation predicate
    // filters inside the pair search, so the legal pair still rewrites
    // (review catch: filtering after headOption rejected the whole
    // join).
    val l = Seq((1L, 5L, 0L, 100L), (2L, 42L, 0L, 10L))
      .toDF("pid", "p", "lo2", "hi2")
    val r = Seq((10L, 0L, 10L, 50L), (11L, 40L, 50L, 5L))
      .toDF("iid", "s", "e", "q2")
    def joined(df: org.apache.spark.sql.DataFrame) = df
    val cond = col("lo2") <= col("q2") && col("q2") <= col("hi2") &&
      col("p") >= col("s") && col("p") <= col("e")
    val expected = l.join(r, cond, "left_outer")
      .select("pid", "iid").as[(Long, Option[Long])].collect().toSet
    withRule {
      val df = l.join(r, cond, "left_outer")
      assert(!df.queryExecution.executedPlan.toString()
        .contains("BroadcastNestedLoopJoin"),
        "legal pair masked by the wrong-orientation pair")
      assert(df.select("pid", "iid").as[(Long, Option[Long])]
        .collect().toSet == expected)
    }
  }

  test("Long.MinValue positions bucket without overflow; wide intervals " +
      "fail loudly at the fan-out guard") {
    withRule {
      // MinValue sentinel point: the (x - pmod) floor-div form
      // underflowed long here and threw under ANSI (review catch); the
      // integral form must bucket and match correctly.
      val pMin = Seq((1L, Long.MinValue), (2L, -500L)).toDF("pid", "p")
      val iMin = Seq((10L, Long.MinValue, Long.MinValue + 10L),
        (11L, -1000L, 0L)).toDF("iid", "s", "e")
      val df = pMin.join(iMin, col("p") >= col("s") && col("p") <= col("e"))
      assert(!df.queryExecution.executedPlan.toString()
        .contains("BroadcastNestedLoopJoin"))
      assert(collectSet(df) == Set((1L, 10L), (2L, 11L)))
      // an open-ended sentinel interval would replicate to ~2^43
      // buckets — the guard must raise the actionable graft error, not
      // hang or die in Sequence internals
      val iWide = Seq((20L, 0L, Long.MaxValue)).toDF("iid", "s", "e")
      val wide = pMin.join(iWide,
        col("p") >= col("s") && col("p") <= col("e"))
      val err = intercept[Exception](wide.collect())
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(err).exists(_.contains("ContainmentJoinRule")),
        s"guard error not surfaced: $err")
    }
  }

  test("timestamp axes rewrite: Cast-to-seconds is monotone, residual " +
      "keeps sub-second exactness") {
    // the sessionize/window-attribution shape: events joined to time
    // windows with `ts BETWEEN w_start AND w_end` — previously a
    // nested loop (timestamps were excluded from the integral guard).
    // Sub-second boundaries pin the residual: an event 1 ms after the
    // window end shares the window's SECOND bucket but must not match.
    val evs = Seq(
      (1L, "2024-01-01 10:00:00.500"),
      (2L, "2024-01-01 10:59:59.999"),
      (3L, "2024-01-01 11:00:00.001"),
      (4L, "2024-03-05 00:00:00.000")).toDF("eid", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val wins = Seq(
      (10L, "2024-01-01 10:00:00.000", "2024-01-01 11:00:00.000"),
      (11L, "2024-03-01 00:00:00.000", "2024-03-31 23:59:59.999"))
      .toDF("wid", "ws_s", "we_s")
      .withColumn("w_start", to_timestamp(col("ws_s")))
      .withColumn("w_end", to_timestamp(col("we_s")))
      .drop("ws_s", "we_s")
    val cond = col("ts") >= col("w_start") && col("ts") <= col("w_end")
    val naivePlan = evs.join(wins, cond)
      .queryExecution.executedPlan.toString()
    assert(naivePlan.contains("BroadcastNestedLoopJoin"))
    val expected = evs.join(wins, cond).select("eid", "wid")
      .as[(Long, Long)].collect().toSet
    assert(expected == Set((1L, 10L), (2L, 10L), (4L, 11L)),
      s"fixture assumption: $expected") // eid 3 is 1ms past the window
    withRule {
      val df = evs.join(wins, cond)
      assert(!df.queryExecution.executedPlan.toString()
        .contains("BroadcastNestedLoopJoin"), "timestamp axis not rewritten")
      assert(df.select("eid", "wid").as[(Long, Long)].collect().toSet ==
        expected)
    }
  }

  test("timestamp_ntz axes rewrite through the UTC mapping — no " +
      "Cast(ntz, long) MatchError, results identical") {
    // Spark 4 has no direct NTZ→long cast: the round-11 ADVICE crash
    // was the rule injecting one post-analysis and dying in
    // Cast.castToLong at execution. The fix routes NTZ through
    // NTZ→TIMESTAMP(UTC)→long; this pins (a) the join EXECUTES, (b)
    // results match the un-rewritten join incl. a sub-second residual
    // boundary, (c) the rewrite actually fired (not a silent no-fire).
    val evs = Seq(
      (1L, "2024-01-01 10:00:00.500"),
      (2L, "2024-01-01 10:59:59.999"),
      (3L, "2024-01-01 11:00:00.001"),
      (4L, "2024-03-05 00:00:00.000")).toDF("eid", "ts_s")
      .withColumn("ts", to_timestamp_ntz(col("ts_s"))).drop("ts_s")
    val wins = Seq(
      (10L, "2024-01-01 10:00:00.000", "2024-01-01 11:00:00.000"),
      (11L, "2024-03-01 00:00:00.000", "2024-03-31 23:59:59.999"))
      .toDF("wid", "ws_s", "we_s")
      .withColumn("w_start", to_timestamp_ntz(col("ws_s")))
      .withColumn("w_end", to_timestamp_ntz(col("we_s")))
      .drop("ws_s", "we_s")
    assert(evs.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val cond = col("ts") >= col("w_start") && col("ts") <= col("w_end")
    val expected = evs.join(wins, cond).select("eid", "wid")
      .as[(Long, Long)].collect().toSet
    assert(expected == Set((1L, 10L), (2L, 10L), (4L, 11L)),
      s"fixture assumption: $expected") // eid 3 is 1ms past the window
    withRule {
      val df = evs.join(wins, cond)
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"ntz axis not rewritten:\n$plan")
      assert(df.select("eid", "wid").as[(Long, Long)].collect().toSet ==
        expected, "ntz rewrite changed results")
    }
  }

  test("fan-out guard bound agrees with its message: a span of exactly " +
      "maxBuckets+1 buckets fails, maxBuckets passes") {
    // round-11 ADVICE off-by-one: strict > let hiB−loB = maxBuckets
    // (i.e. maxBuckets+1 replicas) through while the error text says
    // "more than maxBuckets buckets".
    withRule {
      spark.conf.set("spark.graft.rangeJoin.maxBuckets", "10")
      try {
        val p = Seq((1L, 0L)).toDF("pid", "p")
        // width 1000: [0, 10999] spans buckets 0..10 = 11 = max+1 → fail
        val iOver = Seq((20L, 0L, 10999L)).toDF("iid", "s", "e")
        val over = p.join(iOver,
          col("p") >= col("s") && col("p") <= col("e"))
        def messages(t: Throwable): Seq[String] =
          if (t == null) Nil
          else Option(t.getMessage).toSeq ++ messages(t.getCause)
        val err = intercept[Exception](over.collect())
        assert(messages(err).exists(_.contains("ContainmentJoinRule")),
          s"boundary span did not hit the guard: $err")
        // [0, 9999] spans buckets 0..9 = 10 = max → allowed
        val iOk = Seq((21L, 0L, 9999L)).toDF("iid", "s", "e")
        val ok = p.join(iOk, col("p") >= col("s") && col("p") <= col("e"))
        assert(collectSet(ok) == Set((1L, 21L)))
      } finally spark.conf.unset("spark.graft.rangeJoin.maxBuckets")
    }
  }

  test("keyless band joins rewrite: bounds may be EXPRESSIONS over the " +
      "other side") {
    // |p − s| ≤ 10 written as the containment pair p ≥ s−10 ∧ p ≤ s+10:
    // lo and hi are expressions (not bare columns) over the interval
    // side — the rule's single-sided check is on references, so the
    // keyless band join (the nested-loop trap in attribution
    // pipelines) gets the bucketed shape too.
    val l = Seq((1L, 5L), (2L, 42L), (3L, 1500L)).toDF("pid", "p")
    val r = Seq((10L, 0L), (11L, 50L), (12L, 1493L)).toDF("iid", "s")
    val cond = col("p") >= col("s") - 10 && col("p") <= col("s") + 10
    val expected = l.join(r, cond).select("pid", "iid")
      .as[(Long, Long)].collect().toSet
    assert(expected == Set((1L, 10L), (2L, 11L), (3L, 12L)))
    withRule {
      val df = l.join(r, cond)
      assert(!df.queryExecution.executedPlan.toString()
        .contains("BroadcastNestedLoopJoin"), "band join did not rewrite")
      assert(df.select("pid", "iid").as[(Long, Long)].collect().toSet ==
        expected)
    }
  }

  private def ovLeft = Seq(
    (1L, 0L, 10L), (2L, 20L, 30L), (3L, 5L, 25L),
    (4L, 950L, 1050L), (5L, -2500L, -2400L)).toDF("lid", "ls", "le")
  private def ovRight = Seq(
    (11L, 8L, 22L), (12L, 30L, 40L), (13L, 26L, 28L),
    (14L, 1040L, 2000L), (15L, -2450L, -100L)).toDF("rid", "rs", "re")
  private def ovCond =
    col("ls") <= col("re") && col("rs") <= col("le")

  test("interval-overlap rewrite is OPT-IN: untouched by default, " +
      "bucketed and identical under assumeWellFormedIntervals") {
    val expected = ovLeft.join(ovRight, ovCond).select("lid", "rid")
      .as[(Long, Long)].collect().toSet
    // fixture exercises: boundary touch (le=30 vs rs=30), cross-bucket
    // spans (950-1050 vs 1040-2000), negatives
    assert(expected == Set((1L, 11L), (2L, 11L), (3L, 11L), (2L, 12L),
      (2L, 13L), (4L, 14L), (5L, 15L)), s"fixture assumption: $expected")
    withRule {
      // DEFAULT: a rule can't assume well-formed intervals — no fire
      val off = ovLeft.join(ovRight, ovCond)
      assert(off.queryExecution.executedPlan.toString()
        .contains("BroadcastNestedLoopJoin"),
        "overlap rewrite fired without the opt-in conf")
      spark.conf.set("spark.graft.rangeJoin.assumeWellFormedIntervals",
        "true")
      try {
        val on = ovLeft.join(ovRight, ovCond)
        val plan = on.queryExecution.executedPlan.toString()
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"overlap did not rewrite under the conf:\n$plan")
        assert(collectPairs(on) == expected,
          "overlap rewrite changed results on well-formed intervals")
        // exactly-once: no silent duplicate pairs from shared buckets
        assert(on.count() == expected.size.toLong)
        // flipped orientations (ge forms) rewrite too
        val flipped = ovLeft.join(ovRight,
          col("re") >= col("ls") && col("le") >= col("rs"))
        assert(!flipped.queryExecution.executedPlan.toString()
          .contains("BroadcastNestedLoopJoin"))
        assert(collectPairs(flipped) == expected)
        // outer joins stay untouched — the preserved side would be
        // replicated
        val outer = ovLeft.join(ovRight, ovCond, "left_outer")
        assert(!outer.queryExecution.executedPlan.toString()
          .contains("__graft_lbkt"),
          "outer overlap join rewrote despite replication hazard")
      } finally spark.conf.unset(
        "spark.graft.rangeJoin.assumeWellFormedIntervals")
    }
  }

  test("overlap divergence-by-design: inverted rows match naively but " +
      "are dropped under the well-formed assumption") {
    val lInv = ovLeft.unionByName(Seq((9L, 50L, 30L)).toDF("lid", "ls", "le"))
    val rOne = Seq((19L, 20L, 60L)).toDF("rid", "rs", "re")
    // the inverted row satisfies the naive conjuncts: 50 ≤ 60 ∧ 20 ≤ 30
    val naiveSet = collectPairs(lInv.join(rOne, ovCond))
    assert(naiveSet.contains((9L, 19L)), "fixture: inverted row must match naively")
    withRule {
      spark.conf.set("spark.graft.rangeJoin.assumeWellFormedIntervals",
        "true")
      try {
        val on = lInv.join(rOne, ovCond)
        assert(!on.queryExecution.executedPlan.toString()
          .contains("BroadcastNestedLoopJoin"))
        assert(collectPairs(on) == naiveSet - ((9L, 19L)),
          "divergence contract: exactly the inverted row drops")
      } finally spark.conf.unset(
        "spark.graft.rangeJoin.assumeWellFormedIntervals")
    }
  }

  private def collectPairs(df: DataFrame): Set[(Long, Long)] =
    df.select("lid", "rid").as[(Long, Long)].collect().toSet

  test("overlap pairing ambiguity: 2D box intersection bails instead of " +
      "mixing axes (round-12 ADVICE)") {
    // Two overlap patterns in ONE inner join — a 2D box intersection.
    // With interleaved conjunct order, first-match pairing coupled the
    // x low-bound with the y high-bound: the derived intervals mixed
    // axes and the non-empty filter silently dropped every genuinely
    // matching box, even though each real interval IS well-formed.
    // The fix fires only on exactly one inequality per orientation, so
    // this plan must stay untouched and the results exact.
    val boxesL = Seq(
      (1L, 0L, 10L, 0L, 10L),      // overlaps rid=11 in both axes
      (2L, 20L, 30L, 100L, 200L),  // x overlaps 11, y only 12
      (3L, -50L, -40L, 5L, 8L))    // x misses both
      .toDF("lid", "xlo", "xhi", "ylo", "yhi")
    val boxesR = Seq(
      (11L, 5L, 25L, 2L, 12L),
      (12L, 18L, 60L, 150L, 260L))
      .toDF("rid", "rxlo", "rxhi", "rylo", "ryhi")
    // interleaved order — the exact shape from the ADVICE finding
    val cond = col("xlo") <= col("rxhi") && col("rylo") <= col("yhi") &&
      col("rxlo") <= col("xhi") && col("ylo") <= col("ryhi")
    val expected = boxesL.join(boxesR, cond).select("lid", "rid")
      .as[(Long, Long)].collect().toSet
    assert(expected == Set((1L, 11L), (2L, 12L)),
      s"fixture assumption: $expected")
    withRule {
      spark.conf.set("spark.graft.rangeJoin.assumeWellFormedIntervals",
        "true")
      try {
        val df = boxesL.join(boxesR, cond)
        val plan = df.queryExecution.executedPlan.toString()
        assert(!plan.contains("__graft_lbkt"),
          s"ambiguous 2-axis overlap must not rewrite:\n$plan")
        assert(df.select("lid", "rid").as[(Long, Long)].collect().toSet ==
          expected, "2D box join results changed")
        // consistent conjunct order is equally ambiguous to the rule —
        // it cannot know which bounds form an axis — so it bails too
        val ordered = boxesL.join(boxesR,
          col("xlo") <= col("rxhi") && col("rxlo") <= col("xhi") &&
            col("ylo") <= col("ryhi") && col("rylo") <= col("yhi"))
        assert(!ordered.queryExecution.executedPlan.toString()
          .contains("__graft_lbkt"))
        assert(ordered.select("lid", "rid").as[(Long, Long)]
          .collect().toSet == expected)
      } finally spark.conf.unset(
        "spark.graft.rangeJoin.assumeWellFormedIntervals")
    }
  }

  test("SQL surface: BETWEEN in a spark.sql join rewrites too") {
    // BETWEEN parses to the GreaterThanOrEqual/LessThanOrEqual
    // conjunct pair, so the SQL-writing user gets the same rewrite.
    points.createOrReplaceTempView("cjr_points")
    intervals.createOrReplaceTempView("cjr_intervals")
    val sql = """SELECT p.pid, i.iid FROM cjr_points p
                 JOIN cjr_intervals i ON p.p BETWEEN i.s AND i.e"""
    val expected = spark.sql(sql).as[(Long, Long)].collect().toSet
    withRule {
      val df = spark.sql(sql)
      assert(!df.queryExecution.executedPlan.toString()
        .contains("BroadcastNestedLoopJoin"), "BETWEEN did not rewrite")
      assert(df.as[(Long, Long)].collect().toSet == expected)
    }
  }

  test("GraftExtensions registration path works end-to-end") {
    // `spark.sql.extensions` is a STATIC conf read from the
    // SparkContext at session construction — unreachable in a suite
    // whose context already exists. Builder.withExtensions invokes the
    // SAME entry class (GraftExtensions is the (SparkSessionExtensions
    // => Unit) both paths call), so registering through it on a fresh
    // session over the shared context exercises the injection
    // end-to-end. getOrCreate returns the active session, so clear
    // active/default first (the Spark test-suite idiom).
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      assert(s2 ne orig, "needed a fresh session to apply extensions")
      import s2.implicits._
      val p2 = Seq((1L, 5L), (2L, 42L)).toDF("pid", "p")
      val i2 = Seq((10L, 0L, 10L), (11L, 40L, 50L)).toDF("iid", "s", "e")
      val df = p2.join(i2, col("p") >= col("s") && col("p") <= col("e"))
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"extension-registered rule did not fire:\n$plan")
      assert(df.select("pid", "iid").as[(Long, Long)].collect().toSet ==
        Set((1L, 10L), (2L, 11L)))
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
