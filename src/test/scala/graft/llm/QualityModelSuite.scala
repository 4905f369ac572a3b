package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityModelSuite extends SparkSpec {
  import spark.implicits._

  private def corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    .select("doc_id", "text")

  test("separates originals from corrupted twins (accuracy floor)") {
    val model = QualityModel.fit(corpus)
    val posScores = QualityModel.scoreWith(corpus, model)
      .collect().map(_.getAs[Double]("q_score"))
    // corruptions scored with the SAME model (never retrained — a
    // model fit on corrupted-vs-doubly-corrupted would be degenerate:
    // stripping vowels twice is a fixpoint)
    val negScores = QualityModel.scoreWith(
      corpus.withColumn("text", QualityModel.corrupt(col("text"))), model)
      .collect().map(_.getAs[Double]("q_score"))
    assert(posScores.nonEmpty && negScores.nonEmpty)
    assert((posScores ++ negScores).forall(s => s >= 0.0 && s <= 1.0))
    val posAcc = posScores.count(_ >= 0.5).toDouble / posScores.length
    val negAcc = negScores.count(_ < 0.5).toDouble / negScores.length
    assert(posAcc >= 0.9, s"originals misclassified: acc=$posAcc")
    assert(negAcc >= 0.9, s"corruptions misclassified: acc=$negAcc")
  }

  test("e2e score-sample: kept fraction tracks mean score, deterministic") {
    import graft.queries.LlmQueries
    val kept = LlmQueries.e2eScoreSample(spark, sf0001).cache()
    val n = corpus.count().toDouble
    val meanScore = QualityModel.trainScore(corpus)
      .agg(avg("q_score")).head().getDouble(0)
    val frac = kept.count() / n
    // Bernoulli-by-bucket with per-row p = q_score: expected kept
    // fraction = mean score; md5 buckets are uniform enough at n=500
    // for a ±0.1 band
    assert(math.abs(frac - meanScore) < 0.1,
      s"kept frac $frac vs mean score $meanScore")
    // kept ids are a subset of the corpus and the run is deterministic
    val ids = kept.select("doc_id").as[Long].collect().toSet
    val ids2 = LlmQueries.e2eScoreSample(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == ids2)
    assert(ids.subsetOf(corpus.select("doc_id").as[Long].collect().toSet))
    kept.unpersist()
  }

  test("deterministic across partitionings (canonical fit layout)") {
    val a = QualityModel.trainScore(corpus)
      .as[(Long, Double)].collect().toMap
    val b = QualityModel.trainScore(corpus.repartition(7))
      .as[(Long, Double)].collect().toMap
    assert(a == b, "partitioning changed the trained scores")
  }

  test("fused LM features: accuracy floor holds, deterministic") {
    // The fused family must not regress the vowel-twin task the base
    // model aces (measured 1.0/1.0 — QualityFuseProbe).
    val model = QualityModel.fitFused(corpus)
    val pos = QualityModel.scoreWithFused(corpus, corpus, model)
      .collect().map(_.getAs[Double]("q_score"))
    val neg = QualityModel.scoreWithFused(
      corpus.withColumn("text", QualityModel.corrupt(col("text"))),
      corpus, model).collect().map(_.getAs[Double]("q_score"))
    assert(pos.count(_ >= 0.5).toDouble / pos.length >= 0.9)
    assert(neg.count(_ < 0.5).toDouble / neg.length >= 0.9)
    // determinism across partitionings: LM features are rounded count
    // ratios, fit layout canonical — same contract as the base model
    val a = QualityModel.trainScoreFused(corpus)
      .as[(Long, Double)].collect().toMap
    val b = QualityModel.trainScoreFused(corpus.repartition(7))
      .as[(Long, Double)].collect().toMap
    assert(a == b, "partitioning changed the fused trained scores")
  }

  test("LM feature is what separates word-order corruption held-out") {
    // Controlled cyclic-chain corpus — bigram structure is REAL here,
    // unlike the fixture whose ~30-token effective vocabulary covers
    // every shuffled bigram (QualityFuseProbe: both models at chance
    // there; corpus-structure limit, not an operator one). Doc d =
    // tokens w_(d+j mod 100), j < 30: every context is followed by
    // exactly one successor corpus-wide, so an in-order doc's
    // bigram_lp ≈ ln 1 = 0 while a shuffled doc's bigrams are unseen
    // → floored near ln(0.5/B). The token MULTISET is preserved by
    // the shuffle, so every per-row surface feature is identical —
    // the base fit has NOTHING to learn (scores pin to ~0.5) and the
    // fused fit separates (almost) perfectly. Held-out: fit on even
    // ids, evaluate on odd ids (same chain, disjoint docs).
    val chain = (0 until 200).map { d =>
      (d.toLong, (0 until 30).map(j => f"w${(d + j) % 100}%03d")
        .mkString(" "))
    }.toDF("doc_id", "text")
    val even = chain.where(col("doc_id") % 2 === 0)
    val odd = chain.where(col("doc_id") % 2 === 1)
    val oddShuf = odd.withColumn("text",
      QualityModel.shuffleTokens(col("text")))
    val baseM = QualityModel.fit(even,
      corruptFn = QualityModel.shuffleTokens)
    val fusedM = QualityModel.fitFused(even,
      corruptFn = QualityModel.shuffleTokens)
    def acc(scores: Array[Double], pos: Boolean): Double =
      scores.count(s => if (pos) s >= 0.5 else s < 0.5)
        .toDouble / scores.length
    def sc(df: org.apache.spark.sql.DataFrame,
        m: QualityModel.Model, fused: Boolean): Array[Double] =
      (if (fused) QualityModel.scoreWithFused(df, even, m)
       else QualityModel.scoreWith(df, m))
        .collect().map(_.getAs[Double]("q_score"))
    val baseAcc = (acc(sc(odd, baseM, fused = false), pos = true) +
      acc(sc(oddShuf, baseM, fused = false), pos = false)) / 2
    val fusedAcc = (acc(sc(odd, fusedM, fused = true), pos = true) +
      acc(sc(oddShuf, fusedM, fused = true), pos = false)) / 2
    assert(baseAcc <= 0.6, s"base should be ~chance, got $baseAcc")
    assert(fusedAcc >= 0.95, s"fused should separate, got $fusedAcc")
    assert(fusedAcc > baseAcc + 0.3,
      s"LM feature did not improve held-out accuracy: $baseAcc -> $fusedAcc")
  }
}
