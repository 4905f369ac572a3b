package graft.examples

import org.apache.spark.sql.SparkSession
import graft.llm.QualityModel

/** Round-13 plan census for the LM feature lineage: the tokenize-once
  * tagged-term restructure cut the finalized adaptive plan from 12
  * shuffle stages / 5 Generates (separate token+bigram explodes, c1
  * chained off c2, totals re-running their parents) to 7 stages / 4
  * Generates — and demonstrated that NO stage reuse fires between the
  * count table's consumers (column pruning specializes each copy),
  * which is what justifies lmCounts(materialize = true) in the fused
  * fit. */
object LmPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    val df = QualityModel.lmFeatures(corpus, corpus)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    val ids = "ShuffleQueryStage (\\d+)".r.findAllMatchIn(plan)
      .map(_.group(1)).toSeq
    println(s"[plan] stageRefs=${ids.size} distinct=${ids.distinct.size}")
    val finStart = plan.indexOf("+- == Final Plan ==")
    val finEnd = plan.indexOf("+- == Initial Plan ==")
    val fin = plan.substring(math.max(finStart, 0),
      if (finEnd >= 0) finEnd else plan.length)
    def cnt(s: String) = s.r.findAllIn(fin).size
    println(s"[plan] finalGenerates=${cnt("Generate")}")
    spark.stop()
  }
}
