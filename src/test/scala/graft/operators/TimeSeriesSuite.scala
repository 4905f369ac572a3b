package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSuite extends SparkSpec {
  import spark.implicits._

  // Controlled 30-slot corpus exercising the correlation identities:
  //   u1: 10/20/30 on days 0-2           (the probe shape)
  //   u2: exactly 2× u1                  → centered(u2) = 2·centered(u1) → r = 1
  //   u3: exactly −1× u1                 → r = −1
  //   u4: constant 5.0 on ALL 30 days    → centered ≡ 0 → clamped sim 0, no NaN
  private def ev = {
    def rows(uid: Long, dayVals: Seq[(Int, Double)]) =
      dayVals.zipWithIndex.map { case ((d, v), i) =>
        (uid * 1000 + i, f"2024-01-${d + 1}%02d 12:00:00", uid, v) }
    val all =
      rows(1L, Seq(0 -> 10.0, 1 -> 20.0, 2 -> 30.0)) ++
      rows(2L, Seq(0 -> 20.0, 1 -> 40.0, 2 -> 60.0)) ++
      rows(3L, Seq(0 -> -10.0, 1 -> -20.0, 2 -> -30.0)) ++
      rows(4L, (0 until 30).map(d => d -> 5.0))
    all.toDF("event_id", "ts_s", "user_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
  }

  test("centered-cosine IS Pearson r: scale → 1, inversion → −1, " +
      "constant series → clamped 0") {
    val out = TimeSeries.topKCorrelated(ev, col("user_id") <= 4,
        startDate = "2024-01-01", nSlots = 30, k = 3)
      .as[(Long, Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out((1L, 2L))._2 == 1.0, s"scaled copy not at r=1: ${out((1L, 2L))}")
    assert(out((2L, 1L))._2 == 1.0)
    assert(out((1L, 3L))._2 == -1.0, "inverted series not at r=-1")
    assert(out((1L, 2L))._1 == 1, "scaled copy must rank first")
    // the constant user correlates 0 with everyone — and everyone
    // with it — via the norm clamp (never NaN, CLAUDE.md invariant)
    assert(out((4L, 1L))._2 == 0.0 && out((1L, 4L))._2 == 0.0)
    assert(out.values.forall { case (_, s) => !s.isNaN })
  }

  test("series construction: daily sums, absent days zero, out-of-range " +
      "events ignored, hash-partitioning invariance") {
    // two events the same day sum; an event outside the window must
    // not shift the series
    val e2 = ev.unionByName(Seq(
        (9001L, "2024-01-02 01:00:00", 1L, 5.0),   // day 1 extra → 25.0
        (9002L, "2023-12-31 23:00:00", 1L, 999.0), // before the window
        (9003L, "2024-02-05 00:00:00", 1L, 999.0)) // after the window
      .toDF("event_id", "ts_s", "user_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s"))
    val vec = TimeSeries.dailySeries(e2, "2024-01-01", 30)
      .where(col("user_id") === 1L)
      .select("vec").as[Seq[Double]].head()
    assert(vec.length == 30)
    val mean = (10.0 + 25.0 + 30.0) / 30
    assert(math.abs(vec(1) - (25.0 - mean)) < 1e-9, s"day-1 slot: ${vec(1)}")
    assert(math.abs(vec(5) - (0.0 - mean)) < 1e-9, "absent day not zero")
    // partitioning must not change the (rounded) series
    val a = TimeSeries.dailySeries(e2, "2024-01-01", 30)
      .as[(Long, Seq[Double])].collect().toMap
    val b = TimeSeries.dailySeries(e2.repartition(7), "2024-01-01", 30)
      .as[(Long, Seq[Double])].collect().toMap
    assert(a == b, "partitioning changed the centered series")
  }

  test("the centered series IS an embedding column: the IVF ANN path " +
      "runs on it and finds the brute-force neighbors") {
    // the documented scale path for wide entity counts, demonstrated
    // rather than asserted: sf0.1's 1500 user series through the SAME
    // ivfTopKFrom core the embedding queries use
    import graft.llm.Similarity
    val events = spark.read.parquet(s"$sf01/events.parquet")
    val series = TimeSeries.dailySeries(events, "2024-01-01", 30)
    val brute = Similarity.bruteForceTopK(
        series.where(col("user_id") < 10), series, k = 5,
        idCol = "user_id", vecCol = "vec")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val cents = Similarity.lowestIdCentroids(series, 16,
      idCol = "user_id", vecCol = "vec")
    val ivf = Similarity.ivfTopKFrom(series.where(col("user_id") < 10),
        series, k = 5, cents, nProbe = 8, idCol = "user_id",
        vecCol = "vec")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (ivf intersect brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"series-IVF recall@5 too low: $recall")
  }

  test("registered query: full top-k per query user, fixture sanity") {
    val out = graft.SparkEntry.queries("op_ts_topk")(spark, sf0001)
      .as[(Long, Long, Int, Double)].collect()
    assert(out.nonEmpty)
    val perQuery = out.groupBy(_._1)
    assert(perQuery.values.forall(_.length == 5))
    assert(out.forall(r => r._4 >= -1.0 - 1e-9 && r._4 <= 1.0 + 1e-9),
      "a correlation left [-1, 1]")
  }

  test("timeWeightedAvg: step interpolation de-weights bursts; " +
      "single samples and same-ts ties stay deterministic") {
    import java.sql.Timestamp
    def ts(x: String) = Timestamp.valueOf(x)
    val rows = Seq(
      // u1: value 100 held for 1 h, then a 10-sample burst of 0s over
      // 10 s, then 0 held for 1 h — a plain avg reads ~8.3 (12 rows,
      // one is 100); the twa must read ~50 (half the span at 100)
      (1L, "2024-01-01 00:00:00.0", 100.0),
      (1L, "2024-01-01 01:00:00.0", 0.0),
      (1L, "2024-01-01 01:00:01.0", 0.0),
      (1L, "2024-01-01 01:00:02.0", 0.0),
      (1L, "2024-01-01 01:00:03.0", 0.0),
      (1L, "2024-01-01 01:00:04.0", 0.0),
      (1L, "2024-01-01 01:00:05.0", 0.0),
      (1L, "2024-01-01 01:00:06.0", 0.0),
      (1L, "2024-01-01 01:00:07.0", 0.0),
      (1L, "2024-01-01 01:00:08.0", 0.0),
      (1L, "2024-01-01 01:00:09.0", 0.0),
      (1L, "2024-01-01 02:00:09.0", 0.0),
      // u2: one sample — zero span, twa = its own value
      (2L, "2024-01-01 00:00:00.0", 7.5),
      // u3: two samples at the SAME ts — zero span, twa = max (the
      // deterministic last-by-(ts, value) choice)
      (3L, "2024-01-01 00:00:00.0", 3.0),
      (3L, "2024-01-01 00:00:00.0", 9.0))
      .map { case (u, t, v) => (u, ts(t), v) }
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.timeWeightedAvg(rows)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // u1: 100 for 3600 s + 0 for 3609 s over 7209 s = 49.9376
    assert(out(1L) == ((12L, 7209.0, 49.9376)), s"u1: ${out(1L)}")
    assert(out(2L) == ((1L, 0.0, 7.5)))
    assert(out(3L) == ((2L, 0.0, 9.0)))
  }

  test("gapFill: regular grid with LOCF, staleness timestamps, ties " +
      "pre-collapsed to max, partitioning-independent") {
    import java.sql.Timestamp
    def ts(x: String) = Timestamp.valueOf(x)
    val rows = Seq(
      // u1: obs at 00:00 (v 1) and 00:16:40 (v 2); 300 s grid →
      // points 00:00..00:15 (grid stops AT or before t1)
      (1L, "2024-01-01 00:00:00.0", 1.0),
      (1L, "2024-01-01 00:16:40.0", 2.0),
      // u2: a same-ts tie — max value must win everywhere downstream
      (2L, "2024-01-01 00:00:00.0", 3.0),
      (2L, "2024-01-01 00:00:00.0", 9.0),
      (2L, "2024-01-01 00:05:00.0", 4.0))
      .map { case (u, t, v) => (u, ts(t), v) }
      .toDF("user_id", "ts", "value")
    Seq(1, 5).foreach { parts =>
      val out = TimeSeries.gapFill(rows.repartition(parts), stepSec = 300L)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getDouble(3))).toSet
      val u1 = (0 to 3).map(k =>
        (1L, f"2024-01-01 00:${5 * k}%02d:00.0",
          "2024-01-01 00:00:00.0", 1.0)).toSet
      val u2 = Set(
        (2L, "2024-01-01 00:00:00.0", "2024-01-01 00:00:00.0", 9.0),
        (2L, "2024-01-01 00:05:00.0", "2024-01-01 00:05:00.0", 4.0))
      assert(out == u1 ++ u2, s"parts=$parts: $out")
    }
    // every grid point carries a value (the grid starts AT an
    // observation) — checked on the real fixture
    val fix = graft.Tables.load(spark, sf0001, "events")
      .select(col("user_id"), col("ts"), col("value"))
    val filled = TimeSeries.gapFill(fix, stepSec = 21600L)
    assert(filled.where(col("value").isNull).count() == 0)
    // per-key row count = floor(span/step) + 1
    val expected = fix.groupBy("user_id")
      .agg(expr("(unix_seconds(CAST(max(ts) AS TIMESTAMP)) - " +
        "unix_seconds(CAST(min(ts) AS TIMESTAMP))) div 21600 + 1")
        .as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(filled.count() == expected)
  }
}
