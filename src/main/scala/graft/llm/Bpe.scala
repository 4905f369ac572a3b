package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE vocabulary training (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the tokenizer-prep capstone: learn the merge table a production
  * tokenizer ships from the corpus itself.
  *
  * Classic two-phase shape, and the reason it scales: the CORPUS-sized
  * work is exactly one tokenize + groupBy into the word-frequency
  * DICTIONARY (Zipf: ~10⁸ distinct words even at web scale — a small
  * distributed table); every merge round after that touches only the
  * dictionary. Per round: adjacent-pair frequencies (explode +
  * partial-aggregated sum weighted by word freq), a ONE-ROW argmax
  * collect (freq desc, then (left, right) asc — fully deterministic),
  * and a map-only greedy left-to-right merge of the winning pair in
  * every word's symbol array. The iterative-loop lesson applies
  * verbatim (SCALE.md): the merged frame takes a LAZY localCheckpoint
  * and the next round's argmax collect is the materializing action —
  * one Spark job per merge round, lineage truncated.
  *
  * Honest scale limit, documented: rounds are inherently SEQUENTIAL
  * (each merge changes the pair statistics the next argmax reads), so
  * a real 32k-merge vocabulary means 32k rounds — production trainers
  * batch top-B symbol-disjoint merges per round (rounds = vocab/B) or
  * run the loop single-node over the (small) dictionary; both consume
  * this operator's dictionary build unchanged.
  *
  * No cross-engine oracle (the data-dependent per-round argmax cannot
  * ride a static SQL text in DuckDB 1.0 — no init-form list_reduce to
  * express the greedy merge, and recursive CTEs cannot aggregate over
  * the recursive reference). Instead BpeSuite pins the merge table
  * EXACTLY against an independent single-threaded reference
  * implementation, plus the overlapping-run greedy rule ("aaa" + (a,a)
  * → ["aa","a"]) and end-of-word marker semantics.
  */
object Bpe {

  /** End-of-word marker — a real symbol (standard BPE), so merges
    * distinguish word-final from word-internal contexts. */
  val EndOfWord = "</w>"

  /** Greedy left-to-right single-pair merge over a symbol array:
    * scan symbols, and whenever the running tail is `l` and the next
    * symbol is `r`, replace the tail with `l+r`. Because the merged
    * symbol is the CONCATENATION (≠ `l` unless degenerate), an
    * overlapping run like a,a,a under (a,a) merges leftmost-first to
    * aa,a — the standard rule — with no explicit overlap bookkeeping.
    *
    * `l`/`r` are COLUMNS (bound from a broadcast one-row frame), not
    * literals, so every merge round generates the IDENTICAL codegen
    * source and the whole training loop compiles ONCE — with baked
    * literals each of the nMerges rounds compiled its own class
    * (measured: 23 s cold → the literal codegen was ~80 % of it). */
  private[llm] def mergeOne(sym: Column, l: Column, r: Column): Column =
    aggregate(sym, array().cast("array<string>"), (out, s) =>
      when(size(out) > 0 &&
          element_at(out, -1) === l && s === r,
        concat(slice(out, lit(1), size(out) - 1), array(concat(l, r))))
        .otherwise(concat(out, array(s))))

  /** Initial symbol sequence of a word: its characters plus the
    * end-of-word marker. */
  private def initialSymbols(w: Column): Column =
    concat(filter(split(w, ""), s => length(s) > 0),
      array(lit(EndOfWord)))

  /** [[trainBpe]] returning the merge list driver-side — the form
    * the encode path ([[BpeEncodeExpr]]) consumes as literals. */
  def trainMerges(df: DataFrame, nMerges: Int, minFreq: Long = 2L,
      textCol: String = "text"): Seq[(Int, String, String, String, Long)] =
    trainBpe(df, nMerges, minFreq, textCol)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq

  /** Train `nMerges` BPE merges on the corpus; returns the merge
    * table (step, left, right, merged, pair_freq) — the artifact a
    * tokenizer ships. Stops early when the best remaining pair's
    * frequency drops below `minFreq` (or no pairs remain). */
  def trainBpe(df: DataFrame, nMerges: Int, minFreq: Long = 2L,
      textCol: String = "text"): DataFrame = {
    require(nMerges >= 1, s"nMerges=$nMerges must be >= 1")
    val spark = df.sparkSession
    // Corpus-sized phase: ONE tokenize + partial-aggregated groupBy
    // into the word dictionary. explode_outer + null test on the
    // GENERATED column (the shingleInv re-inline lesson).
    val dict = df.select(
        explode_outer(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(col("w").isNotNull)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"), initialSymbols(col("w")).as("sym"))
    var cur = dict.localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      // Adjacent pairs weighted by word frequency. A word of < 2
      // symbols yields null → dropped on the generated column.
      val pairs = cur.select(col("freq"),
          explode_outer(graft.functions.ExprUtils.bindOnce(col("sym")) { s =>
            when(size(s) >= 2,
              zip_with(slice(s, lit(1), size(s) - 1), slice(s, lit(2), size(s) - 1),
                (a, b) => struct(a.as("l"), b.as("r"))))
          }).as("p"))
        .where(col("p").isNotNull)
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("pf"))
      // One-row deterministic argmax; this collect is ALSO the action
      // that materializes the previous round's lazy checkpoint — one
      // job per round (the CC-loop lesson).
      val best = pairs.orderBy(col("pf").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty || best(0).getAs[Long]("pf") < minFreq) done = true
      else {
        val l = best(0).getAs[String]("l")
        val r = best(0).getAs[String]("r")
        val pf = best(0).getAs[Long]("pf")
        merges += Row(step, l, r, l + r, pf)
        val pair = spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(Row(l, r)), 1),
          StructType(Seq(StructField("__ml", StringType, nullable = false),
            StructField("__mr", StringType, nullable = false))))
        cur = cur.crossJoin(broadcast(pair))
          .withColumn("sym", mergeOne(col("sym"), col("__ml"), col("__mr")))
          .drop("__ml", "__mr")
          .localCheckpoint(false)
        step += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1),
      StructType(Seq(
        StructField("step", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("pair_freq", LongType, nullable = false))))
  }

  /** Single-threaded reference BPE over a token iterator — the
    * BpeSuite ground truth (same tokenizer, same tie-breaks, same
    * greedy rule), deliberately written in the textbook dictionary
    * form with none of the distributed machinery. */
  private[llm] def referenceBpe(tokens: Iterator[String], nMerges: Int,
      minFreq: Long = 2L): Seq[(Int, String, String, String, Long)] = {
    val dict = scala.collection.mutable.HashMap.empty[List[String], Long]
    tokens.foreach { w =>
      val sym = w.map(_.toString).toList :+ EndOfWord
      dict(sym) = dict.getOrElse(sym, 0L) + 1L
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var step = 1
    var continue = true
    while (step <= nMerges && continue) {
      val pf = scala.collection.mutable.HashMap.empty[(String, String), Long]
      dict.foreach { case (sym, f) =>
        sym.zip(sym.tail).foreach(p => pf(p) = pf.getOrElse(p, 0L) + f)
      }
      val best = pf.toSeq.sortBy { case ((l, r), f) => (-f, l, r) }.headOption
      best match {
        case Some(((l, r), f)) if f >= minFreq =>
          out += ((step, l, r, l + r, f))
          val next = dict.map { case (sym, cnt) =>
            val b = scala.collection.mutable.ListBuffer.empty[String]
            sym.foreach { s =>
              if (b.nonEmpty && b.last == l && s == r)
                b(b.length - 1) = l + r
              else b += s
            }
            (b.toList, cnt)
          }
          dict.clear()
          next.foreach { case (sym, cnt) =>
            dict(sym) = dict.getOrElse(sym, 0L) + cnt }
          step += 1
        case _ => continue = false
      }
    }
    out.toSeq
  }
}
