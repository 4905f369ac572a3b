package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.LlmQueries

class BpeSuite extends SparkSpec {
  import spark.implicits._

  test("merge table matches the single-threaded reference EXACTLY") {
    // The registered query's corpus and params, against the textbook
    // dictionary implementation (same tokenizer, tie-breaks, greedy
    // rule, end-of-word marker) — the rows-only query's oracle
    // substitute.
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val dist = LlmQueries.bpeTrain(spark, sf0001)
      .as[(Int, String, String, String, Long)].collect().toSeq
      .sortBy(_._1)
    val toks = d.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .as[String].collect().iterator
    val ref = Bpe.referenceBpe(toks, nMerges = 12)
    assert(dist == ref, s"distributed $dist\nreference   $ref")
    assert(dist.nonEmpty && dist.map(_._1) == (1 to dist.length))
    // merged symbol is always the concatenation
    assert(dist.forall { case (_, l, r, m, _) => m == l + r })
    // pair frequencies are non-increasing is NOT guaranteed by BPE
    // (a merge can create a new, more frequent pair), so no such
    // assertion — the reference equality is the contract.
  }

  test("overlapping runs merge leftmost-first; end-of-word marker is a symbol") {
    // "aaa" under (a,a) → aa,a — the standard greedy rule (the merged
    // symbol 'aa' no longer equals 'a', so no overlap bookkeeping is
    // needed); and the </w> marker participates as a real symbol so
    // word-final merges are distinct.
    val df = Seq.fill(5)("aaa").toDF("text")
    val merges = Bpe.trainBpe(df, nMerges = 2, minFreq = 2L)
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    // pairs of "aaa</w>": (a,a)×2, (a,</w>)×1 per word → best (a,a) f=10
    assert(merges.head == ((1, "a", "a", "aa", 10L)))
    // after merge: aa,a,</w> → pairs (aa,a) f=5, (a,</w>) f=5 — tie
    // broken by (left, right) asc: "a" < "aa"
    assert(merges(1) == ((2, "a", "</w>", "a</w>", 5L)))
    val ref = Bpe.referenceBpe(Iterator.fill(5)("aaa"), 2)
    assert(merges == ref)
  }

  test("early stop below minFreq; determinism across partitionings") {
    val df = Seq("ab", "ab", "cd").toDF("text")
    val m = Bpe.trainBpe(df, nMerges = 10, minFreq = 2L)
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    // (a,b) f=2 merges; then (ab,</w>) f=2 merges; everything else
    // has frequency 1 < minFreq → stop
    assert(m.map(x => (x._2, x._3, x._5)) ==
      Seq(("a", "b", 2L), ("ab", "</w>", 2L)))
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = Bpe.trainBpe(d, 6).as[(Int, String, String, String, Long)]
      .collect().toSeq.sortBy(_._1)
    val b = Bpe.trainBpe(d.repartition(7), 6)
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(a == b, "partitioning changed the merge table")
  }
}
