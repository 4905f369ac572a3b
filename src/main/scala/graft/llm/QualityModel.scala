package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier — the GPT-3/CCNet-style filter: a
  * linear model separating "reference-like" text from junk, used to
  * score (and downweight or drop) crawl documents. Here the negative
  * class is built SELF-SUPERVISED from the corpus itself — each
  * positive doc gets a deterministically corrupted twin (vowels
  * stripped: fluent-prose signals collapse — stopword hits vanish,
  * mean word length shrinks, punctuation density rises) — so the
  * pipeline needs no external labels, the common bootstrap when no
  * curated reference corpus is at hand.
  *
  * Features are the existing map-only signal family
  * ([[TextAnalysis.qualitySignals]] + [[TextAnalysis.repetitionSignals]]
  * + log token count); the model is L2 logistic regression.
  *
  * Determinism (the ivfTopK KMeans discipline): the fit input is
  * hash-repartitioned by id and sorted within partitions, so LBFGS's
  * partition-wise gradient sums see identical points in identical
  * order regardless of how the corpus arrived — same seed ⇒ identical
  * coefficients ⇒ identical scores (pinned across partitionings in
  * QualityModelSuite).
  *
  * Scale shape: feature extraction is map-only (scan speed); the fit
  * consumes the corpus + its twin once per LBFGS iteration over a
  * CACHED input (Spark ML re-evaluates uncached input per iteration
  * — the KMeans lesson); scoring is map-only with the coefficients
  * as literals. At 100 TB fit on a seeded SAMPLE (the quantizer
  * argument: a linear model needs a sketch, not every row). */
object QualityModel {

  /** Deterministic corruption: strip vowels — destroys the fluency
    * signals while keeping length/structure in-distribution. */
  def corrupt(text: Column): Column = translate(text, "aeiouAEIOU", "")

  private val FeatureCols = Seq("punct_ratio", "stopword_ratio",
    "mean_word_len", "dup_token_frac", "top_bigram_frac", "ln_tokens")

  /** Map-only feature frame: (idCol, label, features…) for any
    * (idCol, text) input. */
  def featurize(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sig = TextAnalysis.repetitionSignals(
      TextAnalysis.qualitySignals(df, textCol), textCol)
    sig.select(col(idCol) +: FeatureCols.map {
      case "ln_tokens" =>
        log(greatest(col("n_tokens"), lit(1)).cast("double")).as("ln_tokens")
      case c => col(c).cast("double").as(c)
    }: _*)
  }

  /** Fitted model as plain numbers — scoring then needs no ML
    * runtime, just a column expression. */
  final case class Model(coefficients: Seq[Double], intercept: Double)

  /** Fit the discriminator on corpus ∪ corrupted twin. The two
    * classes are told apart by an explicit `cls` flag carried through
    * the union — never by shifting ids (an id-offset scheme silently
    * collides positive and shifted-negative rows on any corpus whose
    * ids reach the offset, duplicating rows through the label join and
    * corrupting the fit). (cls, id) is unique by construction, so it
    * is also the canonical-layout sort key. */
  def fit(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): Model = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val pos = df.select(col(idCol), col(textCol))
    val neg = df.select(col(idCol), corrupt(col(textCol)).as(textCol))
    val feats = featurize(pos, idCol, textCol)
        .withColumn("label", lit(1.0)).withColumn("cls", lit(1))
      .unionByName(featurize(neg, idCol, textCol)
        .withColumn("label", lit(0.0)).withColumn("cls", lit(0)))
    val assembler = new VectorAssembler()
      .setInputCols(FeatureCols.toArray).setOutputCol("features")
    // Canonical fit layout (the KMeans determinism lesson) + cache
    // (ML re-evaluates uncached input per LBFGS iteration).
    val fitInput = assembler.transform(
        feats.repartition(16, col("cls"), col(idCol))
          .sortWithinPartitions("cls", idCol))
      .select("features", "label").persist()
    val m =
      try new LogisticRegression()
        .setMaxIter(50).setRegParam(0.01).setStandardization(true)
        .fit(fitInput)
      finally fitInput.unpersist(blocking = false)
    Model(m.coefficients.toArray.toSeq, m.intercept)
  }

  /** Score docs MAP-ONLY under a fitted model: (idCol, q_score =
    * sigmoid(w·x + b), rounded to 4 decimals) — coefficients ride as
    * literals, no model UDF in the scan path. */
  def scoreWith(df: DataFrame, model: Model, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val scored = featurize(df, idCol, textCol)
    val margin = FeatureCols.zipWithIndex.map { case (c, i) =>
      col(c) * lit(model.coefficients(i)) }.reduce(_ + _) +
      lit(model.intercept)
    scored.select(col(idCol),
      round(lit(1.0) / (lit(1.0) + exp(-margin)), 4).as("q_score"))
  }

  /** Train on corpus ∪ corrupted twin, then score EVERY corpus doc. */
  def trainScore(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    scoreWith(df, fit(df, idCol, textCol), idCol, textCol)
}
