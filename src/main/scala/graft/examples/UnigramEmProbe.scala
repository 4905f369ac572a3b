package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{TextAnalysis, Unigram}

/** Dev probe: corpus marginal log-likelihood trajectory of the EM
  * unigram trainer vs the Viterbi trainer — per-iteration LL on the
  * shared seed vocabulary (the EM monotonicity theorem's quantity)
  * and the post-prune end states. Backs the UnigramSuite dominance
  * test's choice of comparison point. */
object UnigramEmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    import spark.implicits._
    val dict = d.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .as[(String, Long)].collect().toSeq
    def corpusLL(model: Seq[(String, Long, Double)]): Double = {
      val lp = model.map { case (p, _, x) => p -> x }.toMap
      val maxLen = model.iterator.map(_._1.length).max
      dict.iterator.map { case (w, f) => f * Unigram.logZ(w, lp, maxLen) }.sum
    }
    (0 to 4).foreach { k =>
      val em = corpusLL(Unigram.trainModelEm(d, nIter = k))
      val vit = corpusLL(Unigram.trainModel(d, nIter = k))
      println(f"nIter=$k  LL(em)=$em%.4f  LL(viterbi)=$vit%.4f  " +
        f"diff=${em - vit}%.4f")
    }
    // pre-prune comparison: huge vocabSize disables the cap
    (0 to 4).foreach { k =>
      val em = corpusLL(Unigram.trainModelEm(d, vocabSize = 100000, nIter = k))
      val vit = corpusLL(Unigram.trainModel(d, vocabSize = 100000, nIter = k))
      println(f"nIter=$k NOPRUNE  LL(em)=$em%.4f  LL(viterbi)=$vit%.4f  " +
        f"diff=${em - vit}%.4f")
    }
    // controlled ambiguous corpus: "ab"x100 "a"x10 "b"x10 — EM fixpoint
    // p_a = 1/11 beats Viterbi's hard-count 1/12 (analytic)
    val amb = (Seq.fill(100)("ab") ++ Seq.fill(10)("a") ++
      Seq.fill(10)("b")).toDF("text")
    val ambDict = Seq(("ab", 100L), ("a", 10L), ("b", 10L))
    def ambLL(model: Seq[(String, Long, Double)]): Double = {
      val lp = model.map { case (p, _, x) => p -> x }.toMap
      val maxLen = model.iterator.map(_._1.length).max
      ambDict.iterator.map { case (w, f) =>
        f * Unigram.logZ(w, lp, maxLen) }.sum
    }
    (0 to 6).foreach { k =>
      val em = ambLL(Unigram.trainModelEm(amb, maxPieceLen = 2, nIter = k))
      val vit = ambLL(Unigram.trainModel(amb, maxPieceLen = 2, nIter = k))
      println(f"AMB nIter=$k  LL(em)=$em%.6f  LL(viterbi)=$vit%.6f  " +
        f"diff=${em - vit}%.6f")
    }
    spark.stop()
  }
}
