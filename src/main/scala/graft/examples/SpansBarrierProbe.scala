package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B: does a lazy localCheckpoint barrier on the fuzzy
  * survivors (consumed twice: duplicateSpans + cutSpans, whose
  * different column pruning splits the exact-dedup fingerprint
  * exchange into two canonically-unequal executions) beat the
  * recompute? Measured before deciding whether to ship the barrier
  * in `e2ePrepareSpans`. */
object SpansBarrierProbe {
  def variant(s: SparkSession, dir: String, barrier: String): DataFrame = {
    val surv0 = graft.queries.LlmQueries.fuzzySurvivorsOf(
      graft.queries.LlmQueries.keptDeduped(
        graft.queries.LlmQueries.docsWithSpliceDups(s, dir)))
    val survivors = barrier match {
      case "ckpt"    => surv0.localCheckpoint(false)
      case "persist" => surv0.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      case _         => surv0
    }
    val spans = graft.llm.Dedup.duplicateSpans(survivors)
    val cut = graft.llm.Dedup.cutSpans(survivors, spans, keep = Seq("lang"))
      .withColumnRenamed("text_cut", "text")
    val bench = graft.Tables.load(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .where(col("doc_id") % 13 === 0).select("doc_id", "text")
    val clean = graft.llm.Decontaminate.clean(cut, bench)
    val mixed = graft.llm.Sampling.sampleMix(clean, "lang",
      Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.25), defaultRate = 0.1)
    graft.llm.Packing.packSequences(mixed, ctxLen = 64, nShards = 8)
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").appName("spans-barrier-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // interleave arms to share warmth fairly; 3 passes each
    (1 to 3).foreach { pass =>
      Seq("none", "ckpt", "persist").foreach { b =>
        val t0 = System.nanoTime()
        val df = variant(spark, sf, b)
        val cols = df.columns.map(c => count(df(c)))
        val n = df.agg(cols.head, cols.tail: _*).collect()(0)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"== barrier=$b%-7s pass$pass: $dt%.2f s  (counts ${n.toSeq.mkString(",")})")
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
