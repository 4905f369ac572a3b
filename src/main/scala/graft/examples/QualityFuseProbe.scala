package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import graft.llm.{QualityModel, TextAnalysis}

/** Measurement probe for the fused (base + corpus-LM) quality model:
  * accuracy on the vowel-stripped training task, and the held-out
  * word-order-shuffle task the base features cannot see (token
  * multiset preserved → every per-row feature ~unchanged; bigram
  * likelihood destroyed). Backs the QualityModelSuite floors. */
object QualityFuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")

    def rebuilt(shuffle: Boolean): DataFrame = {
      val toks = TextAnalysis.tokens(F.col("text"))
      val ordered = if (shuffle)
        F.transform(F.array_sort(F.transform(toks,
          t => F.struct(F.xxhash64(t, F.col("doc_id")).as("h"), t.as("t")))),
          s => s.getField("t"))
      else toks
      corpus.withColumn("text", F.concat_ws(" ", ordered))
    }

    val base = QualityModel.fit(corpus)
    val fused = QualityModel.fitFused(corpus)
    val lm = corpus

    def acc(scores: Array[Double], pos: Boolean): Double =
      scores.count(s => if (pos) s >= 0.5 else s < 0.5).toDouble / scores.length

    def col(df: DataFrame): Array[Double] =
      df.collect().map(_.getAs[Double]("q_score"))

    // training task: originals vs vowel-stripped twins
    val twins = corpus.withColumn("text", QualityModel.corrupt(F.col("text")))
    println(f"[fuse] train task  base: pos=${acc(col(QualityModel.scoreWith(corpus, base)), true)}%.3f " +
      f"neg=${acc(col(QualityModel.scoreWith(twins, base)), false)}%.3f")
    println(f"[fuse] train task fused: pos=${acc(col(QualityModel.scoreWithFused(corpus, lm, fused)), true)}%.3f " +
      f"neg=${acc(col(QualityModel.scoreWithFused(twins, lm, fused)), false)}%.3f")

    // Held-out shuffle task: fit on the EVEN token-rebuilt half with
    // shuffle corruption (the class only the LM can see), evaluate on
    // the held-out ODD half. Base features are ~identical between a
    // rebuilt doc and its shuffle (same token multiset), so the base
    // fit has almost nothing to learn; the fused fit has bigram_lp.
    val reb = rebuilt(shuffle = false)
    val even = reb.where(F.col("doc_id") % 2 === 0)
    val odd = reb.where(F.col("doc_id") % 2 === 1)
    val baseS = QualityModel.fit(even,
      corruptFn = QualityModel.shuffleTokens)
    val fusedS = QualityModel.fitFused(even,
      corruptFn = QualityModel.shuffleTokens)
    val oddShuf = odd.withColumn("text",
      QualityModel.shuffleTokens(F.col("text")))
    val bp = acc(col(QualityModel.scoreWith(odd, baseS)), true)
    val bn = acc(col(QualityModel.scoreWith(oddShuf, baseS)), false)
    val fp = acc(col(QualityModel.scoreWithFused(odd, even, fusedS)), true)
    val fn = acc(col(QualityModel.scoreWithFused(oddShuf, even, fusedS)), false)
    println(f"[fuse] held-out shuffle  base: pos=$bp%.3f neg=$bn%.3f mean=${(bp + bn) / 2}%.3f")
    println(f"[fuse] held-out shuffle fused: pos=$fp%.3f neg=$fn%.3f mean=${(fp + fn) / 2}%.3f")
    // Measured on the FIXTURE both sit at chance (~0.50/0.52): the
    // fixture's effective vocabulary is ~30 frequent tokens (uni_lp
    // ≈ −3.4 across all frames), so every shuffled bigram already
    // occurs somewhere in the corpus and the bigram LM has no order
    // signal to find — a corpus-structure limit, not an operator one.
    // QualityModelSuite therefore pins the mechanism on a controlled
    // cyclic-chain corpus where bigram structure is real (base exactly
    // chance, fused ~1.0); this probe records the fixture numbers.
    spark.stop()
  }
}
