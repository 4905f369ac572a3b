package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{MgSummary, MisraGriesAgg, MisraGriesSketch}

class HeavyHittersSuite extends SparkSpec {

  /** Seeded Zipf-ish stream: rank r gets weight 1/r^1.2 over `vocab`
    * ranks — a genuine heavy tail, unlike the uniform fixture. */
  private def zipfStream(n: Int, vocab: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val w = (1 to vocab).map(r => 1.0 / math.pow(r, 1.2)).toArray
    val cum = w.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    Seq.fill(n) {
      val x = rnd.nextDouble() * total
      val idx = {
        val i = java.util.Arrays.binarySearch(cum, x)
        if (i >= 0) i else -i - 1
      }
      s"w$idx"
    }
  }

  test("MG sketch: distributed aggregation keeps the n/(k+1) guarantee " +
      "on a Zipf stream (est ≤ true, undercount bounded, recall 1.0)") {
    import spark.implicits._
    val k = 64
    val data = zipfStream(n = 30000, vocab = 2000, seed = 7L)
    val truth = data.groupBy(identity).map { case (i, xs) =>
      (i, xs.size.toLong)
    }
    val df = data.toDF("item").repartition(8)
    val s = df.select(MisraGriesAgg.mg_sketch(col("item"), k).as("s"))
      .selectExpr("s.n AS n", "s.entries AS entries")
      .as[MgSummary](org.apache.spark.sql.Encoders.product[MgSummary])
      .head()
    assert(s.n == data.size)
    assert(s.entries.size <= k)
    val bound = s.n.toDouble / (k + 1)
    s.entries.foreach { e =>
      val t = truth(e.item)
      assert(e.est <= t, s"${e.item}: est ${e.est} > true $t")
      assert(t - e.est <= bound,
        s"${e.item}: undercount ${t - e.est} > bound $bound")
    }
    val held = s.entries.map(_.item).toSet
    truth.filter(_._2 > bound).keys.foreach { item =>
      assert(held.contains(item),
        s"$item (true ${truth(item)}) above n/(k+1)=$bound but evicted")
    }
  }

  test("MG merge: pointwise sum + (k+1)-th-largest subtraction keeps " +
      "≤ k counters and the combined heavy item") {
    val a = new MisraGriesSketch(2)
    Seq.fill(5)("a").foreach(a.add); Seq.fill(3)("b").foreach(a.add)
    val b = new MisraGriesSketch(2)
    Seq.fill(4)("c").foreach(b.add); Seq.fill(2)("d").foreach(b.add)
    a.mergeIn(b)
    assert(a.n == 14)
    assert(a.counters.size <= 2)
    // pointwise {a5 b3 c4 d2}, cut = 3rd largest = 3 → {a→2, c→1}
    assert(a.counters == scala.collection.mutable.HashMap(
      "a" -> 2L, "c" -> 1L))
    // 'a' (true 5) sits above 14/(k+1)=14/3 and must survive
    assert(a.counters.contains("a"))
  }

  test("frequentItems: exact and partitioning-independent with a " +
      "sketch narrower than the vocabulary (real decrements)") {
    import spark.implicits._
    val m = 32
    val data = zipfStream(n = 20000, vocab = 1500, seed = 11L)
    val n = data.size.toLong
    val expected = data.groupBy(identity).collect {
      case (i, xs) if xs.size.toLong * m >= n => (i, xs.size.toLong)
    }.toSet
    assert(expected.nonEmpty, "test corpus produced no heavy hitters")
    Seq(1, 13).foreach { parts =>
      val df = data.toDF("item").repartition(parts)
      val got = HeavyHitters.frequentItems(df, "item", m = m, k = 64)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  test("frequentItems: exact-boundary count kept, nulls excluded from " +
      "n and output, empty input → empty (term, cnt) frame") {
    import spark.implicits._
    // n=4 non-null; 'a' at cnt·m = 2·2 = 4 = n sits ON the boundary
    val df = Seq("a", "a", "b", "c").toDF("item")
    val got = HeavyHitters.frequentItems(df, "item", m = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 2L)))
    val withNulls = Seq(Some("a"), Some("a"), None, Some("b"))
      .toDF("item")
    val got2 = HeavyHitters.frequentItems(withNulls, "item", m = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // n = 3 (null skipped): a keeps (4 ≥ 3), b drops (2 < 3)
    assert(got2 == Set(("a", 2L)))
    val empty = HeavyHitters.frequentItems(
      Seq.empty[String].toDF("item"), "item", m = 2)
    assert(empty.columns.toSeq == Seq("term", "cnt"))
    assert(empty.count() == 0)
    // k < m would void the recall guarantee — must refuse loudly
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentItems(df, "item", m = 10, k = 5)
    }
  }

  test("sketch memo: bounded LRU — a hot shape survives eviction " +
      "pressure from 70 other shapes (no clear-the-world)") {
    import spark.implicits._
    // distinct cache keys = same plan, distinct sketch width k
    val df = Seq("x", "x", "y").toDF("item")
    HeavyHitters.frequentItems(df, "item", m = 2, k = 90) // warm hot shape
    // calibrate jobs-per-sketch on one filler shape
    val jPer = countJobs {
      HeavyHitters.frequentItems(df, "item", m = 2, k = 999); ()
    }
    assert(jPer > 0, "calibration construction ran no job")
    // 70 fresh shapes overflow the 64-entry LRU; the hot shape is
    // re-touched every 8, so it must stay resident the whole way —
    // its re-constructions contribute ZERO jobs to the delta
    val pressure = countJobs {
      (0 until 70).foreach { i =>
        HeavyHitters.frequentItems(df, "item", m = 2, k = 1000 + i)
        if (i % 8 == 0)
          HeavyHitters.frequentItems(df, "item", m = 2, k = 90)
      }
    }
    assert(pressure == 70 * jPer,
      s"pressure loop ran $pressure jobs, expected ${70 * jPer} — " +
        "the hot shape's sketch re-ran (memo evicted it under pressure)")
    val hotAgain = countJobs {
      HeavyHitters.frequentItems(df, "item", m = 2, k = 90); ()
    }
    assert(hotAgain == 0, "final hot re-construction ran a job")
    assert(HeavyHitters.sketchCacheSize <= 64,
      s"memo grew past its bound: ${HeavyHitters.sketchCacheSize}")
  }

  test("frequentItemsByKey: exact per group on Zipf streams with " +
      "different vocabularies, partitioning-independent, null keys/" +
      "items excluded") {
    import spark.implicits._
    val m = 32
    // three groups with different sizes, vocabularies and seeds —
    // each group's threshold is ITS OWN n_g/m
    val groups = Map(
      "en" -> zipfStream(n = 15000, vocab = 1200, seed = 3L),
      "de" -> zipfStream(n = 6000, vocab = 800, seed = 5L),
      "zh" -> zipfStream(n = 900, vocab = 90, seed = 9L))
    val expected = groups.flatMap { case (g, data) =>
      val n = data.size.toLong
      data.groupBy(identity).collect {
        case (i, xs) if xs.size.toLong * m >= n => (g, i, xs.size.toLong)
      }
    }.toSet
    assert(expected.nonEmpty && expected.map(_._1).size == 3,
      "every group must contribute heavy hitters")
    val rows = groups.toSeq.flatMap { case (g, data) => data.map((g, _)) }
    Seq(1, 13).foreach { parts =>
      val df = rows.toDF("lang", "item").repartition(parts)
      val got = HeavyHitters.frequentItemsByKey(df, "lang", "item",
          m = m, k = 64)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got == expected, s"parts=$parts")
    }
    // null group keys and null items drop; n_g counts only non-null
    // items of non-null groups
    val withNulls = Seq(
      (Some("a"), Some("x")), (Some("a"), Some("x")),
      (Some("a"), None), (None, Some("x")), (Some("a"), Some("y")))
      .toDF("lang", "item")
    val got2 = HeavyHitters.frequentItemsByKey(withNulls, "lang", "item",
        m = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // group a: n = 3 non-null items → x keeps (2·3 ≥ 3), y drops (1·3 ≥ 3 holds!)
    assert(got2 == Set(("a", "x", 2L), ("a", "y", 1L)), got2.toString)
    // k < m voids the per-group recall guarantee — refuse loudly
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentItemsByKey(withNulls, "lang", "item",
        m = 10, k = 5)
    }
  }

  test("registered op_heavy_hitters_grouped: candidates ride a " +
      "BROADCAST join (non-candidates die map-side, no full-domain " +
      "shuffle) over partial aggregation") {
    val q = graft.queries.OperatorQueries.heavyHittersGrouped(
      spark, sf0001)
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(800))
    val out = q.collect()
    assert(out.nonEmpty)
    // every count clears 2% of its OWN language's token total
    val totals = graft.Tables.load(spark, sf0001, "documents")
      .select(col("lang"), explode(
        graft.llm.TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(2) * 50 >= totals(r.getString(0)), r.toString)
    }
  }

  test("frequentItemsByKey: maxGroups overflow fails loudly with the " +
      "remedy; under the cap the result is complete") {
    import spark.implicits._
    val df = (0 until 50).map(g => (s"g$g", "x")).toDF("lang", "item")
    val err = intercept[IllegalArgumentException] {
      HeavyHitters.frequentItemsByKey(df, "lang", "item", m = 2,
        maxGroups = 10)
    }
    assert(err.getMessage.contains("maxGroups") &&
      err.getMessage.contains("raise maxGroups"), err.getMessage)
    // at the exact cap: complete, no throw
    val ok = HeavyHitters.frequentItemsByKey(df, "lang", "item", m = 2,
      maxGroups = 50).collect()
    assert(ok.length == 50 && ok.forall(_.getLong(2) == 1L))
  }

  test("registered op_heavy_hitters: pass 2 filters with a literal " +
      "InSet before its aggregation (no full-domain shuffle)") {
    val q = graft.queries.OperatorQueries.heavyHitters(spark, sf0001)
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("INSET") || plan.contains(" IN ("),
      plan.take(800))
    // partial + final aggregation around the candidate-only shuffle
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(800))
    val out = q.collect()
    assert(out.nonEmpty)
    // the fixture's 31-token vocab sits under the sketch width, so the
    // candidate set is exact; every returned count clears 1% of total
    val total = graft.Tables.load(spark, sf0001, "documents")
      .select(explode(graft.llm.TextAnalysis.tokens(col("text")))
        .as("t")).count()
    out.foreach { r =>
      assert(r.getLong(1) * 100 >= total, r.toString)
    }
  }
}
