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
}
