package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: 10× scale-up of the fuzzy e2e capstone at CONSTANT
  * duplicate density (the Scale10Probe replica scheme: vowels
  * rewritten to a replica digit kill cross-replica shingle overlap,
  * then each replica gets its OWN planted families — exact copies of
  * every 10th doc, tail-extended near-copies of every 7th). Compares
  * the registered sf0.1 query against the same pipeline over the 10×
  * corpus; output spans are aggregated (not count()'d — the probe
  * methodology lesson) so the packing work is actually measured. */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.LlmQueries

    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($r)")
    }

    def mixedX(k: Int) = {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
      (0 until k).map { i =>
        val rep = base.select(
          (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          translate(col("text"), "aeiou", s"$i$i$i$i$i").as("text"))
        rep
          .unionByName(rep.where(col("doc_id") % 10 === 0)
            .withColumn("doc_id", col("doc_id") + 1000000))
          .unionByName(rep.where(col("doc_id") % 7 === 0)
            .withColumn("doc_id", col("doc_id") + 2000000)
            .withColumn("text",
              concat(col("text"), lit(" graft dup probe tail"))))
      }.reduce(_ unionAll _)
        .repartition(spark.sparkContext.defaultParallelism)
    }

    // the fuzzy pipeline over an arbitrary corpus + benchmark set —
    // same stages as LlmQueries.e2ePrepareFuzzy
    def fuzzyPrepare(corpus: org.apache.spark.sql.DataFrame,
        bench: org.apache.spark.sql.DataFrame): Long = {
      val deduped = LlmQueries.keptDeduped(corpus)
      val pairs = graft.llm.Dedup.minhashLshPairsMd5(deduped,
        threshold = 0.5)
      val nonReps = graft.llm.Dedup.dedupClusters(pairs)
        .where(col("id") =!= col("cluster_rep"))
        .select(col("id").as("doc_id"))
      val survivors = deduped.join(nonReps, Seq("doc_id"), "left_anti")
      // raw-corpus flags, matching the registered query's flagFrom
      val clean = graft.llm.Decontaminate.clean(survivors, bench,
        flagFrom = Some(corpus))
      val mixed = graft.llm.Sampling.sampleMix(clean, "lang",
        Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.25), defaultRate = 0.1)
      val out = graft.llm.Packing.packSequences(mixed, ctxLen = 64,
        nShards = 8)
      // aggregate OVER the output columns: a bare count() would let
      // Catalyst prune the span arithmetic and unique-key joins
      out.agg(sum(col("tok_end") - col("tok_start")),
        max(col("seq_no"))).head().getLong(0)
    }

    val bench1 = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") % 13 === 0).select("doc_id", "text")
    // first run soaks JVM/codegen/footer warmup; the second is the
    // comparable number (the Bench main warms up the same way)
    timed("sf0.1 fuzzy e2e (warmup)")(
      fuzzyPrepare(LlmQueries.docsWithMixedDups(spark, sfDir), bench1))
    timed("sf0.1 fuzzy e2e (warm)")(
      fuzzyPrepare(LlmQueries.docsWithMixedDups(spark, sfDir), bench1))

    // benchmark set stays FIXED size (eval sets don't grow with the
    // corpus — the Decontaminate scale stance); extra args = more
    // scale points (e.g. `... sf0.1 10 30` probes 10x AND 30x)
    val scales = args.drop(1).map(_.toInt) match {
      case Array() => Seq(10)
      case ks => ks.toSeq
    }
    scales.foreach { k =>
      val d = mixedX(k).localCheckpoint(true)
      println(s"--- scale ${k}x: ${d.count()} docs")
      timed(s"${k}x fuzzy e2e")(fuzzyPrepare(d, bench1))
    }
    spark.stop()
  }
}
