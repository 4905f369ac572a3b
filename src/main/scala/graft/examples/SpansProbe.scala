package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}

/** Round-8 measurement probe for the passage-level compositions:
  * wall-clock for the spans capstone family at a given SF, plus the
  * runtime exchange-reuse census of `llm_e2e_prepare_spans` (how many
  * shuffle stages EXECUTE vs arrive as ReusedExchange — the 2×
  * pruned-variant finding recorded in SCALE.md round 8).
  *
  * Usage: runMain graft.examples.SpansProbe [sfDir] */
object SpansProbe {

  /** Distinct (stageId, executed|REUSED, partitioning) triples of a
    * collected query's adaptive plan. QueryStageExec nodes are LEAVES
    * (children = Nil) — the subtree hangs off `.plan`, which is why a
    * naive children-walk sees zero stages. */
  def stageCensus(plan: SparkPlan): Seq[(Int, String, String)] = {
    def walk(p: SparkPlan): Seq[(Int, String, String)] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec =>
        val self = q.plan match {
          case _: ReusedExchangeExec => Seq((q.id, "REUSED",
            q.plan.outputPartitioning.toString.take(60)))
          case _: ShuffleExchangeExec => Seq((q.id, "exec",
            q.plan.outputPartitioning.toString.take(60)))
          case _ => Nil
        }
        self ++ walk(q.plan)
      case other => other.children.flatMap(walk)
    }
    walk(plan).distinct.sortBy(_._1)
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").appName("spans-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("llm_dup_spans", "llm_cut_spans", "llm_decontaminate_cut",
        "llm_e2e_prepare_fuzzy", "llm_e2e_prepare_spans").foreach { q =>
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        // aggregate OVER the output columns: a bare count() lets
        // Catalyst prune the expensive text reconstruction (SCALE.md)
        val df = graft.SparkEntry.queries(q)(spark, sf)
        val cols = df.columns.map(c =>
          org.apache.spark.sql.functions.count(df(c)))
        df.agg(cols.head, cols.tail: _*).collect()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"== $q pass$pass: $dt%.2f s")
      }
    }
    val df = graft.SparkEntry.queries("llm_e2e_prepare_spans")(spark, sf)
    df.collect()
    val census = stageCensus(df.queryExecution.executedPlan)
    census.foreach { case (id, kind, key) =>
      println(s"== stage $id $kind $key") }
    println("== executed: " + census.count(_._2 == "exec") +
      ", reused: " + census.count(_._2 == "REUSED") +
      ", executed-fingerprint: " + census.count(t =>
        t._2 == "exec" && t._3.contains("fingerprint")))
    spark.stop()
  }
}
