package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSuite extends SparkSpec {
  import spark.implicits._

  private val ctx = 64

  // NOT cached: a cached plan becomes an InMemoryRelation that
  // substitutes into PlanQualitySuite's fresh plan for the same query
  // and breaks its exchange-count assertion.
  private def spans() = graft.queries.LlmQueries.all("llm_pack")(
    spark, sf0001)

  test("every sequence is exactly full except each shard's last") {
    val sp = spans()
    val bySeq = sp.groupBy("shard", "seq_no")
      .agg(sum(col("tok_end") - col("tok_start")).as("fill"))
    val lastSeq = sp.groupBy("shard").agg(max("seq_no").as("last"))
    val ragged = bySeq.join(lastSeq, Seq("shard"))
      .where(col("fill") =!= ctx)
    // only shard-last sequences may be ragged, and never overfull
    assert(ragged.where(col("seq_no") =!= col("last")).count() == 0)
    assert(bySeq.where(col("fill") > ctx).count() == 0)
    // sequences within a shard are contiguous from 0 (no gaps: every
    // seq_no in [0, last] carries spans)
    val perShard = bySeq.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("seq_no").as("mx"))
      .where(col("n") =!= col("mx") + 1)
    assert(perShard.count() == 0)
  }

  test("spans reassemble every non-empty document exactly") {
    val sp = spans()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .where(col("n") > 0)
    // per doc: slices tile [0, n) — start at 0, contiguous, end at n
    val agg = sp.groupBy("doc_id").agg(
      min("tok_start").as("mn"), max("tok_end").as("mx"),
      sum(col("tok_end") - col("tok_start")).as("covered"),
      count(lit(1)).as("k"))
    val joined = docs.join(agg, Seq("doc_id"), "left")
    assert(joined.where(col("k").isNull).count() == 0, "doc lost")
    assert(joined.where(col("mn") =!= 0 || col("mx") =!= col("n") ||
      col("covered") =!= col("n")).count() == 0, "doc not tiled exactly")
    // and a straddling doc exists (the operator's reason to emit spans)
    assert(sp.groupBy("doc_id").count().where(col("count") > 1).count() > 0)
  }

  test("seq_off places spans contiguously within each sequence") {
    val sp = spans()
    // within a sequence, spans sorted by seq_off must tile [0, fill)
    val bad = sp.select(col("shard"), col("seq_no"),
        col("seq_off"), (col("tok_end") - col("tok_start")).as("len"))
      .withColumn("expected_next", col("seq_off") + col("len"))
      .groupBy("shard", "seq_no")
      .agg(min("seq_off").as("first"),
        sum("len").as("fill"),
        max("expected_next").as("lastEnd"))
      .where(col("first") =!= 0 || col("lastEnd") =!= col("fill"))
    assert(bad.count() == 0)
  }

  test("typicality: all-rare-token gibberish scores the corpus minimum") {
    // a doc of unique unseen tokens has tf=1 for every token — its
    // mean ln(tf/total) is the floor of the score range
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    val gib = Seq((999999L, "zqxjv kwzqx vbnmq pzzkw xqjvz wqkzx"))
      .toDF("doc_id", "text")
    val scored = TextAnalysis.typicality(docs.unionByName(gib))
      .select(col("doc_id"), col("unigram_logprob")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored.contains(999999L))
    val others = (scored - 999999L).values
    assert(others.forall(_ > scored(999999L)),
      s"gibberish ${scored(999999L)} not the minimum")
  }

  test("e2e prepare: dedup and decontamination visibly did their jobs") {
    val packed = graft.queries.LlmQueries.all("llm_e2e_prepare")(
      spark, sf0001)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(packed.nonEmpty)
    // exact dedup kept the ORIGINAL of every planted copy pair
    assert(packed.forall(_ < 1000000L), "a planted duplicate survived")
    // benchmark docs (every 13th) are verbatim in the corpus, so
    // decontamination must drop every one that can be flagged at all
    // — i.e. that yields >= minShared(2) winnow fingerprints. (A doc
    // too short for 2 fingerprints legitimately survives; asserting
    // on ALL %13 docs would pin a fixture accident, not the operator.)
    val flaggable = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("doc_id") % 13 === 0)
      .where(size(TextAnalysis.winnowFingerprints(col("text"))) >= 2)
      .select("doc_id").as[Long].collect().toSet
    assert(flaggable.nonEmpty && (packed intersect flaggable).isEmpty,
      "a flaggable benchmark doc was packed")
  }

  test("property: packFn over any chunking equals the single batch " +
      "(random corpora, TestGroupState)") {
    // Pure-JVM state-machine property: splitting a sorted doc list
    // into ANY consecutive chunks (micro-batches) must yield exactly
    // the single-batch spans, with the offset state threading through.
    import org.apache.spark.sql.streaming.TestGroupState
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import graft.llm.Packing.{DocTokens, Span}
    val fn = Packing.packFn(64) _
    import org.apache.spark.api.java.{Optional => JOptional}
    import org.apache.spark.sql.streaming.GroupStateTimeout
    def run(chunks: Seq[Seq[DocTokens]]): Seq[Span] = {
      var off = Option.empty[Long]
      chunks.flatMap { chunk =>
        val st = TestGroupState.create[Long](
          off.map(JOptional.of[Long]).getOrElse(JOptional.empty[Long]()),
          GroupStateTimeout.NoTimeout, 0L,
          JOptional.empty[Long](), false)
        val out = fn(0, chunk.iterator, st).toSeq
        off = Some(st.get)
        out
      }
    }
    val lenGen = Gen.chooseNum(1L, 200L)
    (0 until 30).foreach { trial =>
      val n = 1 + trial % 12
      val docs = (0 until n).map { i =>
        DocTokens(i.toLong * 3 + 1, 0,
          lenGen.apply(Gen.Parameters.default, Seed(trial * 100L + i)).get)
      }
      val single = run(Seq(docs))
      // random consecutive chunking driven by the trial index
      val k = 1 + trial % 4
      val chunked = run(docs.grouped(math.max(1, n / k)).toSeq)
      assert(chunked == single, s"trial $trial: chunking changed spans")
      // tiling invariants on the single-batch output
      val byDoc = single.groupBy(_.doc_id)
      docs.foreach { d =>
        val sp = byDoc(d.doc_id).sortBy(_.tok_start)
        assert(sp.head.tok_start == 0 && sp.last.tok_end == d.n_tokens)
        assert(sp.map(s => s.tok_end - s.tok_start).sum == d.n_tokens)
        assert(sp.forall(s => s.seq_off >= 0 && s.seq_off < 64))
      }
    }
  }

  test("packing is deterministic across partitionings") {
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packSequences(df, ctxLen = ctx, nShards = 8)
        .as[(Int, Long, Long, Long, Long, Long)].collect().toSet
    assert(run(base) == run(base.repartition(13, col("doc_id"))))
  }
}
