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

  test("native encode ≡ the trainer's merge chain; subwords reconstruct") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val merges = Bpe.trainMerges(d, nMerges = 12).map(m => (m._2, m._3))
    assert(merges.nonEmpty)
    val words = d.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .distinct().limit(500)
    // HOF reference: chars + </w>, then the trainer's own mergeOne
    // fold per merge in rank order — the exact training trajectory.
    val hofInit = concat(
      filter(split(col("w"), ""), s => length(s) > 0),
      array(lit(Bpe.EndOfWord)))
    val hofEncoded = merges.foldLeft(hofInit) { case (sym, (l, r)) =>
      Bpe.mergeOne(sym, lit(l), lit(r)) }
    val rows = words.select(col("w"),
      graft.functions.BpeEncodeExpr.bpe_encode(col("w"), merges).as("n"),
      hofEncoded.as("h"))
      .as[(String, Seq[String], Seq[String])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, native, hof) =>
      assert(native == hof, s"encode diverges for '$w'")
      assert(native.mkString == w + Bpe.EndOfWord,
        s"subwords don't reconstruct '$w'")
    }
    // the registered report runs and ranks densely
    val rep = LlmQueries.bpeEncode(spark, sf0001).collect()
    assert(rep.nonEmpty && rep.map(_.getAs[Int]("rank")).toSeq ==
      (1 to rep.length))
  }

  test("BpeEncodeExpr doGenCode compiles and matches eval") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val expr = graft.functions.BpeEncodeExpr(
      BoundReference(0, StringType, nullable = true),
      Seq(("a", "a"), ("aa", "a")))
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on bad code
    val gen = proj(InternalRow(UTF8String.fromString("aaaa"))).getArray(0)
    val out = (0 until gen.numElements()).map(i => gen.getUTF8String(i).toString)
    // aaaa</w>: (a,a) pass → aa,aa,</w>; (aa,a) pass → no 'a' left
    assert(out == Seq("aa", "aa", Bpe.EndOfWord))
    assert(proj(InternalRow(null)).isNullAt(0))
  }

  test("property: random corpora match the reference exactly") {
    // Random small-alphabet corpora exercise tie-breaks and
    // overlapping-run merges far harder than natural text (many equal
    // pair frequencies, aaa-runs everywhere).
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val wordGen = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    (0 until 4).foreach { trial =>
      val words = (0 until 60).map(i =>
        wordGen.apply(Gen.Parameters.default, Seed(trial * 1000L + i)).get)
      val df = words.toDF("text") // one word per doc — tokens() keeps it
      val dist = Bpe.trainBpe(df, nMerges = 8, minFreq = 2L)
        .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
      val ref = Bpe.referenceBpe(words.iterator, nMerges = 8, minFreq = 2L)
      assert(dist == ref, s"trial $trial: $dist vs $ref")
    }
  }

  test("batched B=1 reproduces the sequential trainer EXACTLY") {
    // The batching rule degenerates to plain greedy at B=1 (window of
    // one, nothing to conflict with), so the map-probe merge pass and
    // the per-pair merge pass must produce the identical table — the
    // equivalence that lets the batched path claim the sequential
    // algorithm's semantics.
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val seq = Bpe.trainBpe(d, nMerges = 12)
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    val b1 = Bpe.trainBpeBatched(d, nMerges = 12, batch = 1)
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(b1 == seq, s"batched(B=1) diverged:\n$b1\nvs\n$seq")
  }

  test("batched B>1 matches the batched reference; conflicts skip, not stall") {
    // The registered query's params against the single-threaded
    // reference extended with the same windowed-disjoint rule.
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val dist = LlmQueries.bpeTrainBatched(spark, sf0001)
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    val toks = d.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .as[String].collect().iterator
    val ref = Bpe.referenceBpeBatched(toks, nMerges = 24, batch = 8)
    assert(dist == ref, s"distributed $dist\nreference   $ref")
    assert(dist.nonEmpty && dist.map(_._1) == (1 to dist.length))
    // Controlled conflict pin: "ab"×5 ∪ "ac"×4 at B=2. Round-1 window
    // is {(a,b) f=5, (b,</w>) f=5} (tie broken left asc) — the second
    // shares 'b' with the first, so it is SKIPPED and the round
    // accepts one merge; round 2 accepts (ab,</w>) AND the disjoint
    // (a,c); round 3 finishes (ac,</w>). Frequencies are pre-batch.
    val ctl = (Seq.fill(5)("ab") ++ Seq.fill(4)("ac")).toDF("text")
    val m = Bpe.trainBpeBatched(ctl, nMerges = 4, batch = 2, minFreq = 2L)
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(m == Seq(
      (1, "a", "b", "ab", 5L),
      (2, "ab", "</w>", "ab</w>", 5L),
      (3, "a", "c", "ac", 4L),
      (4, "ac", "</w>", "ac</w>", 4L)), s"conflict table: $m")
  }

  test("property: random corpora match the batched reference exactly") {
    // Small alphabets force dense conflicts inside every window —
    // the acceptance rule (l, r, AND merged symbol all unused) is
    // exercised far harder than on natural text.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val wordGen = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    (0 until 4).foreach { trial =>
      val words = (0 until 60).map(i =>
        wordGen.apply(Gen.Parameters.default, Seed(9000L + trial * 1000L + i)).get)
      val df = words.toDF("text")
      val dist = Bpe.trainBpeBatched(df, nMerges = 8, batch = 3, minFreq = 2L)
        .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
      val ref = Bpe.referenceBpeBatched(words.iterator, nMerges = 8,
        batch = 3, minFreq = 2L)
      assert(dist == ref, s"trial $trial: $dist vs $ref")
    }
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
