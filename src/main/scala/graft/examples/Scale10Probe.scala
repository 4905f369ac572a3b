package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: 10× scale-up behavior of the LSH dedup operators at
  * CONSTANT duplicate density (perturbed replicas — naive replication
  * measures duplicate-group explosion, not scaling). */
object Scale10Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llm.{Decontaminate, Dedup, Similarity}

    def embsX(k: Int) = {
      val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>")
          .as("embedding"))
      (0 until k).map { i =>
        base.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
          .withColumn("embedding",
            zip_with(col("embedding"),
              sequence(lit(0), size(col("embedding")) - 1),
              (x, d) => x + lit(0.4) *
                (pmod(xxhash64(d, col("vec_id"), lit(i)), lit(200))
                  / 100.0 - 1.0)))
      }.reduce(_ unionAll _)
        .repartition(spark.sparkContext.defaultParallelism)
    }
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    // 10× documents at CONSTANT near-dup density: each replica gets
    // its vowels rewritten to a replica digit (kills cross-replica
    // shingle overlap — naive replication makes every doc a 10-copy
    // group) and then its own planted near-dups (the registered-query
    // rule: every 7th doc + a 4-token tail).
    def docsX(k: Int) = {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
      (0 until k).map { i =>
        val rep = base.select(
          (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          translate(col("text"), "aeiou", s"$i$i$i$i$i").as("text"))
        rep.unionByName(rep
          .where(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000)
          .withColumn("text",
            concat(col("text"), lit(" graft dup probe tail"))))
      }.reduce(_ unionAll _)
        .repartition(spark.sparkContext.defaultParallelism)
    }
    def run(which: Set[String]): Unit = {
      if (which("embed")) {
        // sf0.1 registered-query corpus: pair count must stay 400
        timed("sf0.1 embedDupLsh")(
          graft.queries.LlmQueries.embedDupLsh(spark, sfDir).count())
        val e = embsX(10).localCheckpoint(true)
        println(s"--- scale 10x: ${e.count()} vectors")
        timed("10x embed_dup_lsh (prefilter)")(
          Similarity.cosineDupPairsLsh(e, threshold = 0.999).count())
        timed("10x embed prefilter + maxBucket=2000")(
          Similarity.cosineDupPairsLsh(e, threshold = 0.999,
            maxBucket = 2000).count())
      }
      if (which("minhash")) {
        val d = docsX(10).localCheckpoint(true)
        println(s"--- scale 10x: ${d.count()} docs")
        timed("10x minhashLshPairs")(
          Dedup.minhashLshPairs(d, threshold = 0.5).count())
      }
      if (which("containment")) {
        // containment has NO length bound by definition — maxDf is
        // its only quadratic-tail guard; measure the lever at 10×
        val d = docsX(10).localCheckpoint(true)
        println(s"--- scale 10x: ${d.count()} docs")
        Dedup.ngramContainmentPairs(docsX(1), threshold = 0.9,
          maxDf = 1000000).count()
        timed("10x containment uncapped")(
          Dedup.ngramContainmentPairs(d, threshold = 0.9,
            maxDf = 1000000).count())
        timed("10x containment maxDf=2000")(
          Dedup.ngramContainmentPairs(d, threshold = 0.9,
            maxDf = 2000).count())
      }
      if (which("ngram")) {
        val d = docsX(10).localCheckpoint(true)
        println(s"--- scale 10x: ${d.count()} docs")
        // warmup at 1x so codegen/session cost doesn't ride the number
        Dedup.ngramJaccardPairs(docsX(1), threshold = 0.5,
          maxDf = 1000000).count()
        timed("10x ngramJaccardPairs")(
          Dedup.ngramJaccardPairs(d, threshold = 0.5,
            maxDf = 1000000).count())
      }
      if (which("spans")) {
        // duplicate-passage spans: positional match join + pair-local
        // islands window — wall must track corpus size (the window
        // partitions by (pair, alignment), bounded by doc length)
        val d1 = docsX(1).localCheckpoint(true)
        val d10 = docsX(10).localCheckpoint(true)
        println(s"--- corpora: ${d1.count()} / ${d10.count()} docs")
        Dedup.duplicateSpans(d1).count()
        timed("1x duplicateSpans")(Dedup.duplicateSpans(d1).count())
        timed("10x duplicateSpans")(Dedup.duplicateSpans(d10).count())
        // force the ACTUAL cut: a bare count() lets Catalyst eliminate
        // the left join (unique right keys) and prune the whole token
        // filter — it measures corpus count, not the operator
        def runCut(d: org.apache.spark.sql.DataFrame): Long =
          Dedup.cutSpans(d, Dedup.duplicateSpans(d))
            .agg(sum(length(col("text_cut"))), sum(col("n_removed")))
            .collect()(0).getLong(1)
        timed("1x cutSpans (tokens removed)")(runCut(d1))
        timed("10x cutSpans (tokens removed)")(runCut(d10))
      }
      if (which("pack")) {
        // packing: per-shard window — wall must stay ~linear and the
        // span invariants hold at 10× (full sequences except shard
        // tails)
        import graft.llm.Packing
        val d1 = docsX(1).localCheckpoint(true)
        val d10 = docsX(10).localCheckpoint(true)
        println(s"--- corpora: ${d1.count()} / ${d10.count()} docs")
        Packing.packSequences(d1, ctxLen = 64, nShards = 32).count()
        timed("1x packSequences")(
          Packing.packSequences(d1, ctxLen = 64, nShards = 32).count())
        timed("10x packSequences")(
          Packing.packSequences(d10, ctxLen = 64, nShards = 32).count())
      }
      if (which("typicality")) {
        // typicality (round-6 skew-safe shape): partial-aggregated
        // groupBy(id,tok) → groupBy(tok) tf → join back — wall must
        // track the token count (scan-dominated), with no Window task
        // holding a whole token's occurrences
        import graft.llm.TextAnalysis
        val d1 = docsX(1).localCheckpoint(true)
        val d10 = docsX(10).localCheckpoint(true)
        println(s"--- corpora: ${d1.count()} / ${d10.count()} docs")
        TextAnalysis.typicality(d1).count()
        timed("1x typicality")(TextAnalysis.typicality(d1).count())
        timed("10x typicality")(TextAnalysis.typicality(d10).count())
      }
      if (which("e2e")) {
        // the composed prepare pipeline (quality → lang → dedup →
        // decontaminate → mix → pack) — every stage individually
        // probed linear must stay linear composed
        import graft.llm.{Decontaminate, Packing, Sampling, TextAnalysis}
        def prepare(corpus: org.apache.spark.sql.DataFrame,
            bench: org.apache.spark.sql.DataFrame): Long = {
          val sig = TextAnalysis.qualitySignals(corpus)
            .withColumn("lang", TextAnalysis.langId(col("text")))
            .withColumn("fingerprint",
              TextAnalysis.fingerprint(col("text")))
            .where(col("verdict") === "keep")
          val deduped = sig.groupBy("fingerprint")
            .agg(min("doc_id").as("doc_id"),
              min_by(col("text"), col("doc_id")).as("text"),
              min_by(col("lang"), col("doc_id")).as("lang"))
            .drop("fingerprint")
          val clean = Decontaminate.clean(deduped, bench)
          val mixed = Sampling.sampleMix(clean, "lang",
            Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.25),
            defaultRate = 0.1)
          Packing.packSequences(mixed, ctxLen = 64, nShards = 32).count()
        }
        val d1 = docsX(1).localCheckpoint(true)
        val d10 = docsX(10).localCheckpoint(true)
        val bench = d1
          .where(col("doc_id") % 13 === 0 && col("doc_id") < 1000000)
          .localCheckpoint(true)
        println(s"--- corpora: ${d1.count()} / ${d10.count()} docs, " +
          s"bench ${bench.count()}")
        prepare(d1, bench) // warmup
        timed("1x e2e prepare")(prepare(d1, bench))
        timed("10x e2e prepare")(prepare(d10, bench))
      }
      if (which("novelty")) {
        // novelty scoring (r9 op): the min-owner join probes with the
        // corpus-hottest shingle keys (phrase-pool fixture text) —
        // wall must track corpus size, conservation must hold at 10×.
        import graft.llm.TextAnalysis
        val d1 = docsX(1).localCheckpoint(true)
        val d10 = docsX(10).localCheckpoint(true)
        println(s"--- corpora: ${d1.count()} / ${d10.count()} docs")
        def runIt(d: org.apache.spark.sql.DataFrame): Long =
          TextAnalysis.noveltyScores(d)
            .agg(sum(col("n_novel")), sum(col("n_shingles")),
              sum(col("novelty")))
            .collect()(0).getLong(0)
        runIt(d1) // warmup
        timed("1x noveltyScores (sum n_novel)")(runIt(d1))
        timed("10x noveltyScores (sum n_novel)")(runIt(d10))
        // conservation at 10×: every distinct shingle owned once
        val distinct10 = graft.llm.Dedup
          .shingleSetsMd5(d10, "doc_id", "text", 3)
          .select(explode(col("sh")).as("s")).distinct().count()
        println(s"10x distinct shingles: $distinct10 " +
          s"(== sum n_novel: ${runIt(d10) == distinct10})")
      }
      if (which("linededup")) {
        // line-level dedup (r8 op): the GLOBAL footer line appears in
        // every doc of every replica — its fingerprint is the hottest
        // join key in the suite (55 k probe rows against a ONE-row
        // build at 10×). Wall must track corpus size; the aggregate
        // runs over the output columns (a bare count() would let
        // column pruning drop the concat_ws/collect_list rebuild —
        // the probe-the-output lesson).
        def withBoiler(d: org.apache.spark.sql.DataFrame) = d.select(
          col("doc_id"),
          concat(lit("begin shared preamble for source "),
            pmod(col("doc_id"), lit(20L)).cast("string"), lit(" end\n"),
            col("text"),
            lit("\nglobal footer boilerplate shared by every document"))
            .as("text"))
        val d1 = withBoiler(docsX(1)).localCheckpoint(true)
        val d10 = withBoiler(docsX(10)).localCheckpoint(true)
        println(s"--- corpora: ${d1.count()} / ${d10.count()} docs")
        def runIt(d: org.apache.spark.sql.DataFrame): Long =
          Dedup.dedupLines(d)
            .agg(sum(length(col("text_dedup"))), sum(col("n_removed")))
            .collect()(0).getLong(1)
        runIt(d1) // warmup
        timed("1x dedupLines (lines removed)")(runIt(d1))
        timed("10x dedupLines (lines removed)")(runIt(d10))
        val plan = Dedup.dedupLines(d10).queryExecution.executedPlan
        val s = plan.toString()
        println("10x plan Window: " + s.contains("Window"))
        println("10x plan BroadcastHashJoin: " +
          s.contains("BroadcastHashJoin"))
        println("10x plan SortMergeJoin: " + s.contains("SortMergeJoin"))
        // At real scale the firsts build outgrows broadcast and the
        // hot-footer key meets a SHUFFLED join — disable broadcast to
        // measure that path's skew behavior under AQE at 10×.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          timed("10x dedupLines, broadcast disabled (lines removed)")(
            runIt(d10))
          val s2 = Dedup.dedupLines(d10).queryExecution.executedPlan
            .toString()
          println("no-bcast plan SortMergeJoin/ShuffledHashJoin: " +
            (s2.contains("SortMergeJoin") || s2.contains("ShuffledHashJoin")))
        } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      if (which("semdedup")) {
        // SemDeDup's scale rule is k ∝ n (cells stay bounded). Measure
        // the lever: 10× vectors with the SAME k=16 grows every cell
        // 10× (Σ|cell|² → ~100× pairs); 10× vectors with k=160 keeps
        // E|cell| constant (~10× pairs). Aggregate over kept — a bare
        // count() would let Catalyst eliminate the unique-key left
        // join and prune the pair generation entirely.
        timed("sf0.1 semDedup (registered)")(
          graft.queries.LlmQueries.semDedup(spark, sfDir)
            .where(col("kept") === 0).count())
        val e = embsX(10).localCheckpoint(true)
        println(s"--- scale 10x: ${e.count()} vectors")
        def dropped(k: Int): Long =
          Similarity.semDedupFrom(e,
            Similarity.lowestIdCentroids(e, nCentroids = k),
            threshold = 0.999)
            .where(col("kept") === 0).count()
        timed("10x semDedup k=16 (cells grow 10x)")(dropped(16))
        timed("10x semDedup k=160 (k scaled with n)")(dropped(160))
      }
      if (which("rangejoin")) {
        // Range join cost ∝ input + matched output. Scale the POINT
        // side 10× against a fixed interval set: matches grow ~10×,
        // wall must track. (Scaling both sides grows the matched
        // relation itself quadratically — semantics, not the plan.)
        val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        val windows = orders.where(col("o_orderkey") % 100 === 0)
          .select(col("o_orderkey").as("promo_key"),
            col("o_orderdate").as("w_start"))
          .localCheckpoint(true)
        def ptsX(k: Int) = (0 until k).map { i =>
          // jitter dates ±3 days per replica so replicas don't stack
          // on identical positions (hot-bucket realism, stays in range)
          orders.select(
            (col("o_orderkey") + lit(i * 100000000L)).as("o_orderkey"),
            date_add(to_date(col("o_orderdate")),
              (pmod(xxhash64(col("o_orderkey"), lit(i)), lit(7)) - 3)
                .cast("int")).as("o_orderdate"),
            col("o_totalprice"))
        }.reduce(_ unionAll _)
          .repartition(spark.sparkContext.defaultParallelism)
        val dayOf = (c: org.apache.spark.sql.Column) =>
          unix_date(to_date(c))
        def agg(points: org.apache.spark.sql.DataFrame): Long =
          graft.operators.RangeJoin.joinPointsInIntervals(
              points, windows, dayOf(col("o_orderdate")),
              dayOf(col("w_start")), dayOf(col("w_start")) + 6,
              bucketWidth = 7)
            .groupBy("promo_key")
            .agg(count(lit(1)).as("n"), sum("o_totalprice").as("rev"))
            .agg(sum("n")).collect()(0).getLong(0)
        val p1 = ptsX(1).localCheckpoint(true)
        val p10 = ptsX(10).localCheckpoint(true)
        println(s"--- points: ${p1.count()} / ${p10.count()}")
        agg(p1) // warmup
        timed("1x rangeJoin (matched rows)")(agg(p1))
        timed("10x rangeJoin (matched rows)")(agg(p10))
      }
      if (which("bigram")) {
        // Bigram LM: two count shuffles + two join-backs, everything
        // pre-collapsed — wall must track corpus size. Aggregate OVER
        // the score so Catalyst can't eliminate the unique-key left
        // join-back and prune the LM chain.
        import graft.llm.TextAnalysis
        def score(d: org.apache.spark.sql.DataFrame): Long =
          TextAnalysis.bigramLogprob(d)
            .agg(sum("bigram_logprob"), count(lit(1)))
            .collect()(0).getLong(1)
        val d1 = docsX(1).localCheckpoint(true)
        val d10 = docsX(10).localCheckpoint(true)
        println(s"--- corpora: ${d1.count()} / ${d10.count()} docs")
        score(d1) // warmup
        timed("1x bigramLogprob")(score(d1))
        timed("10x bigramLogprob")(score(d10))
      }
      if (which("overlap")) {
        // Interval overlap: shipments ×10 against the fixed window
        // set — matched rows ~10×, wall must track (the rangejoin
        // argument, now with both sides bucket-replicated).
        val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        val windows = orders.where(col("o_orderkey") % 100 === 0)
          .select(col("o_orderkey").as("promo_key"),
            col("o_orderdate").as("w_start"))
          .localCheckpoint(true)
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .where(col("l_orderkey") % 10 === 0)
          .select(col("l_shipdate"), col("l_quantity"))
        def shipX(k: Int) = (0 until k).map { i =>
          li.select(
            date_add(to_date(col("l_shipdate")),
              (pmod(xxhash64(col("l_quantity"), lit(i)), lit(7)) - 3)
                .cast("int")).as("l_shipdate"),
            col("l_quantity"))
        }.reduce(_ unionAll _)
          .repartition(spark.sparkContext.defaultParallelism)
        val dayOf = (c: org.apache.spark.sql.Column) =>
          unix_date(to_date(c))
        def agg(ships: org.apache.spark.sql.DataFrame): Long =
          graft.operators.RangeJoin.joinOverlappingIntervals(
              windows, ships,
              dayOf(col("w_start")), dayOf(col("w_start")) + 6,
              dayOf(col("l_shipdate")),
              dayOf(col("l_shipdate")) + col("l_quantity").cast("int") % 30,
              bucketWidth = 7)
            .groupBy("promo_key")
            .agg(count(lit(1)).as("n"), sum("l_quantity"))
            .agg(sum("n")).collect()(0).getLong(0)
        val s1 = shipX(1).localCheckpoint(true)
        val s10 = shipX(10).localCheckpoint(true)
        println(s"--- shipments: ${s1.count()} / ${s10.count()}")
        agg(s1) // warmup
        timed("1x intervalOverlap (matched rows)")(agg(s1))
        timed("10x intervalOverlap (matched rows)")(agg(s10))
      }
      if (which("pq")) {
        // PQ-ADC scan: per-pair cost is m table lookups, so wall must
        // track corpus size ~linearly (queries fixed at 10); the
        // codebook stays the registered query's (built from the 1×
        // corpus — a quantizer is corpus-independent infrastructure).
        val e1 = embsX(1).localCheckpoint(true)
        val e10 = embsX(10).localCheckpoint(true)
        println(s"--- corpora: ${e1.count()} / ${e10.count()} vectors")
        val cb = Similarity.pqCodebooks(e1, m = 8, ks = 16)
        val q = e1.where(col("vec_id") < 10)
        Similarity.pqTopKFrom(q, e1, k = 5, cb, rerank = 50).count()
        timed("1x pqTopKFrom")(
          Similarity.pqTopKFrom(q, e1, k = 5, cb, rerank = 50).count())
        timed("10x pqTopKFrom")(
          Similarity.pqTopKFrom(q, e10, k = 5, cb, rerank = 50).count())
      }
      if (which("tfidf")) {
        // tf-idf and drift ride the typicality chain — wall must be
        // ~linear in corpus size (partial-aggregated counts, keyed
        // join-backs, doc-bounded windows only).
        val d1 = docsX(1).localCheckpoint(true)
        val d10 = docsX(10).localCheckpoint(true)
        println(s"--- corpora: ${d1.count()} / ${d10.count()} docs")
        import graft.llm.TextAnalysis
        TextAnalysis.tfidfTopTerms(d1).count() // warmup
        timed("1x tfidfTopTerms")(TextAnalysis.tfidfTopTerms(d1).count())
        timed("10x tfidfTopTerms")(TextAnalysis.tfidfTopTerms(d10).count())
        val side1 = pmod(col("doc_id"), lit(2))
        val dl1 = d1.withColumn("lang", lit("x"))
        val dl10 = d10.withColumn("lang", lit("x"))
        TextAnalysis.tokenDrift(dl1, side1).count()
        timed("1x tokenDrift")(TextAnalysis.tokenDrift(dl1, side1).count())
        timed("10x tokenDrift")(TextAnalysis.tokenDrift(dl10, side1).count())
      }
      if (which("pagerank")) {
        // PageRank cost = edge build (minhash, probed separately) +
        // iterations over the rank vector; this isolates the
        // ITERATION term: fixed 10 rounds over 1× vs 10× vertex/edge
        // sets (edges from the replicated near-dup corpus).
        import graft.operators.PageRank
        def graph(k: Int) = {
          val d = docsX(k).localCheckpoint(true)
          val pairs = Dedup.minhashLshPairsMd5(d, threshold = 0.5)
            .select(col("id_a").as("u"), col("id_b").as("v"))
            .localCheckpoint(true)
          val edges = pairs.unionAll(
            pairs.select(col("v").as("u"), col("u").as("v")))
          (d.select(col("doc_id").as("id")), edges, pairs.count())
        }
        val (v1, e1, n1) = graph(1)
        val (v10, e10, n10) = graph(10)
        println(s"--- pair edges: $n1 / $n10")
        PageRank.pageRank(v1, e1, 10).count() // warmup
        timed("1x pageRank 10 iters")(PageRank.pageRank(v1, e1, 10).count())
        timed("10x pageRank 10 iters")(PageRank.pageRank(v10, e10, 10).count())
      }
      if (which("qmodel")) {
        // LR fit cost vs corpus size: LBFGS sweeps the (cached)
        // corpus+twin feature frame per iteration — wall should track
        // input size; scoring is map-only.
        import graft.llm.QualityModel
        val d1 = docsX(1).localCheckpoint(true)
        val d10 = docsX(10).localCheckpoint(true)
        println(s"--- corpora: ${d1.count()} / ${d10.count()} docs")
        QualityModel.trainScore(d1).count() // warmup
        timed("1x qualityModel train+score")(
          QualityModel.trainScore(d1).count())
        timed("10x qualityModel train+score")(
          QualityModel.trainScore(d10).count())
      }
      if (which("events")) {
        // Sessionization/SCD2 stress: SAME user ids, 10× history each
        // (jittered ±1 h so replicas interleave instead of stacking) —
        // per-user window partitions grow 10×, the documented
        // hot-entity caveat, measured instead of assumed.
        import graft.streaming.EventTimeOps
        val base = spark.read.parquet(s"$sfDir/events.parquet")
          .select("user_id", "ts", "event_id", "event_type", "value")
        val e1 = base.repartition(32).localCheckpoint(true)
        val e10 = (0 until 10).map { i =>
          base.withColumn("ts", col("ts") + expr(
              s"make_interval(0, 0, 0, 0, 0, 0, ${i * 3667})"))
            .withColumn("event_id", col("event_id") + lit(i * 100000000L))
        }.reduce(_ unionAll _).repartition(32).localCheckpoint(true)
        println(s"--- events: ${e1.count()} / ${e10.count()}")
        def sess(df: org.apache.spark.sql.DataFrame) =
          EventTimeOps.sessionStats(df, "ts", "user_id", "value",
            "30 minutes").count()
        sess(e1) // warmup
        timed("1x sessionStats")(sess(e1))
        timed("10x sessionStats")(sess(e10))
        def scd(df: org.apache.spark.sql.DataFrame) = {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          df.withColumn("prev", lag(col("event_type"), 1).over(w))
            .where(col("prev").isNull || col("prev") =!= col("event_type"))
            .withColumn("valid_to", lead(col("ts"), 1).over(w))
            .count()
        }
        timed("1x scd2")(scd(e1))
        timed("10x scd2")(scd(e10))
      }
      if (which("hier")) {
        // Two-level quantizer assignment at k=160 (the SemDeDup k ∝ n
        // regime): flat argmax is n·k dots; hierarchical routes via 13
        // refined anchors + top-P probed groups (~13 + P·12 dots/row).
        // Aggregate OVER cid (sum), never count() — the probe lesson:
        // a bare count lets Catalyst prune the assignment entirely.
        val e1 = embsX(1).localCheckpoint(true)
        val e10 = embsX(10).localCheckpoint(true)
        println(s"--- corpora: ${e1.count()} / ${e10.count()} vectors")
        val cents = Similarity.lowestIdCentroids(e10, 160)
        val flat = Similarity.flatAssignFn(cents)
        val hier = Similarity.hierarchicalAssignFn(cents, 13, coarseProbe = 2)
        def sumCid(df: org.apache.spark.sql.DataFrame,
            fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
          df.select(fn(col("embedding")).as("cid"))
            .agg(sum(col("cid").cast("long"))).head().getLong(0)
        sumCid(e1, flat) // codegen warmup
        timed("1x  flat assign (k=160)")(sumCid(e1, flat))
        timed("10x flat assign (k=160)")(sumCid(e10, flat))
        timed("1x  hier assign (13 anchors, P=2)")(sumCid(e1, hier))
        timed("10x hier assign (13 anchors, P=2)")(sumCid(e10, hier))
      }
      if (which("tokenizer")) {
        // Both trainers' cost is dictionary-sized (the two-phase
        // argument): docsX(10) grows the distinct-word dictionary ~10×
        // (per-replica vowel rewrites), so this measures the actual
        // scaling term — pair-stats/EM jobs over the dictionary — not
        // the corpus scan.
        val d1 = docsX(1).localCheckpoint(true)
        val d10 = docsX(10).localCheckpoint(true)
        println(s"--- corpora: ${d1.count()} / ${d10.count()} docs")
        import graft.llm.{Bpe, Unigram}
        Bpe.trainBpeBatched(d1, nMerges = 8, batch = 8).collect() // warmup
        timed("1x  bpe batched B=32, 64 merges")(
          Bpe.trainBpeBatched(d1, 64, batch = 32, minFreq = 1L).count())
        timed("10x bpe batched B=32, 64 merges")(
          Bpe.trainBpeBatched(d10, 64, batch = 32, minFreq = 1L).count())
        timed("1x  unigram train (defaults)")(
          Unigram.trainUnigram(d1).count())
        timed("10x unigram train (defaults)")(
          Unigram.trainUnigram(d10).count())
      }
      if (which("skew")) {
        // The suites PIN the plan shapes that make hot keys AQE's
        // problem (shuffle joins, no windows); this arm proves the
        // claimed safety net actually FIRES at runtime: an adversarial
        // corpus where one fingerprint owns ~99% of rows (the
        // line-dedup footer case taken to the limit) through a
        // shuffle join, with the skew thresholds lowered to fixture
        // bytes (defaults: 256 MB partitions — nothing local would
        // ever trigger). Evidence = "AQEShuffleRead ... skewed" in
        // the executed adaptive plan + wall-clock.
        val restore = Seq(
          "spark.sql.autoBroadcastJoinThreshold",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes",
          // the OFF-arm toggles this mid-try; a throw there must not
          // leave skew splitting disabled for later arms
          "spark.sql.adaptive.skewJoin.enabled")
          .map(k => k -> spark.conf.getOption(k)).toMap
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
        try {
          val n = 2000000L
          // one hot fingerprint (0) on 99% of rows + a long tail;
          // ~64-byte payload so the hot partition clears the 1 MB bar
          val left = spark.range(n).select(
            when(col("id") % 100 =!= 0, lit(0L)).otherwise(col("id"))
              .as("fp"),
            col("id").as("doc_id"),
            lpad(col("id").cast("string"), 48, "x").as("payload"))
          val right = spark.range(200000).select(col("id").as("fp"),
            (col("id") % 7).as("tag"))
          def runOnce(): (Long, Double, String) = {
            val joined = left.join(right, "fp")
              .agg(count(lit(1)).as("rows"), sum(length(col("payload"))))
            val t0 = System.nanoTime()
            val rows = joined.collect()(0).getLong(0)
            ((rows), (System.nanoTime() - t0) / 1e9,
              joined.queryExecution.executedPlan.toString())
          }
          runOnce() // warmup (codegen + shuffle service)
          val (rows, secs, plan) = runOnce()
          val fired = plan.contains("skewed")
          val skewLine = plan.linesIterator
            .find(_.contains("skewed")).getOrElse("").trim
          spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
          val (_, secsOff, _) = runOnce()
          spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
          println(f"skew arm: $rows%d joined rows; split ON $secs%.1f s / " +
            f"OFF $secsOff%.1f s; fired = $fired")
          println(s"skew arm plan: $skewLine")
          assert(fired, "AQE skew split did NOT fire — evidence arm broken")
        } finally restore.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
      if (which("decontaminate")) {
        // Fixed benchmark set drawn from REPLICA 0's transformed text
        // (docsX rewrites vowels per replica, so a base-corpus
        // benchmark would match nothing): the contaminated docs are
        // exactly replica 0's %13 rows at every scale — OUTPUT must
        // stay constant while corpus-side work scales 10×, and the
        // broadcast side must stay the benchmark.
        val d1 = docsX(1).localCheckpoint(true)
        val d10 = docsX(10).localCheckpoint(true)
        val bench = d1
          .where(col("doc_id") % 13 === 0 && col("doc_id") < 1000000)
          .localCheckpoint(true)
        println(s"benchmark docs: ${bench.count()}")
        println(s"--- corpora: ${d1.count()} / ${d10.count()} docs")
        // warmup pass first: the session's first heavy query otherwise
        // pays codegen/broadcast warmup and poisons the 1× number
        Decontaminate.contaminated(d1, bench, minShared = 2).count()
        timed("1x decontaminate")(
          Decontaminate.contaminated(d1, bench, minShared = 2).count())
        timed("10x decontaminate")(
          Decontaminate.contaminated(d10, bench, minShared = 2).count())
        val plan = Decontaminate.contaminated(d10, bench, minShared = 2)
          .queryExecution.executedPlan.toString()
        println("10x plan BroadcastHashJoin: " +
          plan.contains("BroadcastHashJoin"))
        println("10x plan SortMergeJoin: " + plan.contains("SortMergeJoin"))
      }
    }
    run(args.drop(1).headOption
      .map(_.split(",").toSet)
      .getOrElse(Set("embed", "minhash", "decontaminate")))
    spark.stop()
  }
}
