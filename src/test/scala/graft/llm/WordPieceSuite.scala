package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.LlmQueries

class WordPieceSuite extends SparkSpec {
  import spark.implicits._

  test("merge table matches the single-threaded reference EXACTLY; " +
      "## layout invariants hold") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val dist = LlmQueries.wordpieceTrain(spark, sf0001)
      .as[(Int, String, String, String, Long, Double)].collect().toSeq
      .sortBy(_._1)
    val toks = d.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .as[String].collect().iterator
    val ref = WordPiece.referenceWordPiece(toks, nMerges = 12)
    assert(dist == ref, s"distributed $dist\nreference   $ref")
    assert(dist.nonEmpty && dist.map(_._1) == (1 to dist.length))
    dist.foreach { case (_, l, r, m, pf, sc) =>
      // a pair's right element sits at position ≥ 2 of some word, so
      // it is ALWAYS a continuation; the merged symbol inherits the
      // left's prefix and strips the right's
      assert(r.startsWith(WordPiece.Hash), s"right '$r' not ##-prefixed")
      assert(m == WordPiece.mergedSymbol(l, r))
      assert(pf >= 2L && sc > 0.0)
    }
  }

  test("likelihood argmax: a rarer-but-predictable pair beats the " +
      "most frequent pair (where plain BPE would differ)") {
    // (a,##b) appears 10× but a,b are everywhere (c(a)=100, c(##b)=10
    // → score 0.01); (c,##d) appears 8× and c,d appear ONLY there
    // (8/(8·8) = 0.125). Frequency-greedy BPE would merge (a,##b)
    // first; WordPiece must pick (c,##d).
    val corpus = (Seq.fill(10)("ab") ++ Seq.fill(90)("a") ++
      Seq.fill(8)("cd")).mkString(" ")
    val df = Seq(corpus).toDF("text")
    val wp = WordPiece.trainWordPiece(df, nMerges = 1)
      .as[(Int, String, String, String, Long, Double)].head()
    assert((wp._2, wp._3, wp._4) == (("c", "##d", "cd")), wp.toString)
    assert(wp._5 == 8L && math.abs(wp._6 - 0.125) < 1e-12)
    val bpe = Bpe.trainBpe(df, nMerges = 1)
      .as[(Int, String, String, String, Long)].head()
    assert(bpe._2 == "a", s"BPE control changed: $bpe") // frequency picks a-pair
  }

  test("vocabFromMerges skips re-training and matches trainVocab; " +
      "trainVocab memoizes per (corpus, params) in one JVM") {
    val df = Seq("the cat sat", "the cat ran", "the bat sat")
      .toDF("text")
    val merges = WordPiece.trainWordPiece(df, nMerges = 4)
    val direct = WordPiece.vocabFromMerges(df, merges)
    val viaTrain = WordPiece.trainVocab(df, nMerges = 4)
    assert(direct == viaTrain,
      s"vocabFromMerges $direct != trainVocab $viaTrain")
    // memo: a second trainVocab on the same (plan, params) must not
    // re-run the nMerges training rounds (ADVICE r13 — the encode
    // query used to pay a full second training on top of the train
    // query's)
    val again = countJobs {
      val v = WordPiece.trainVocab(df, nMerges = 4)
      assert(v == direct)
    }
    assert(again == 0,
      s"memoized trainVocab re-ran $again job(s)")
    // different params = different model — must NOT hit the memo
    val other = WordPiece.trainVocab(df, nMerges = 2)
    assert(other != direct)
  }

  test("trainer is partitioning-independent (score ratio of exact longs)") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = WordPiece.trainWordPiece(d.repartition(1), nMerges = 8)
      .collect().map(_.toSeq).toSeq
    val b = WordPiece.trainWordPiece(d.repartition(7), nMerges = 8)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("native MaxMatch encode ≡ reference; greedy-longest, whole-word " +
      "UNK, reconstruction") {
    val vocab = Seq("un", "##aff", "##able", "##ffa", "a", "##b",
      "b", "hug", "##s", "h", "##u", "##g")
    val vs = vocab.toSet
    // BERT's own example: greedy longest-first, NOT leftmost-maximal
    assert(WordPiece.referenceEncode("unaffable", vs) ==
      Seq("un", "##aff", "##able"))
    assert(WordPiece.referenceEncode("hugs", vs) == Seq("hug", "##s"))
    // 'x' unmatchable → the WHOLE word collapses to [UNK]
    assert(WordPiece.referenceEncode("hugx", vs) == Seq("[UNK]"))
    assert(WordPiece.referenceEncode("", vs) == Seq.empty)
    val words = Seq("unaffable", "hugs", "hugx", "ab", "b", "a",
      "uhg", "hug")
    val got = words.toDF("w").select(col("w"),
        graft.functions.WordPieceEncodeExpr.wordpiece_encode(
          col("w"), vocab).as("p"))
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      assert(got(w) == WordPiece.referenceEncode(w, vs), s"word $w")
      // reconstruction: non-UNK encodings strip ## back to the word
      if (got(w) != Seq("[UNK]"))
        assert(got(w).map(_.stripPrefix(WordPiece.Hash)).mkString == w)
    }
  }

  test("encode expression codegen compiles and matches eval " +
      "(no silent fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val expr = graft.functions.WordPieceEncodeExpr(
      BoundReference(0, StringType, nullable = true),
      Seq("a", "##b", "ab"), "[UNK]")
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on bad code
    def enc(w: String): Seq[String] = {
      val row = proj(InternalRow(UTF8String.fromString(w)))
      val arr = row.getArray(0)
      (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    }
    assert(enc("ab") == Seq("ab")) // longest match wins over a+##b
    assert(enc("abb") == Seq("ab", "##b"))
    assert(enc("ba") == Seq("[UNK]")) // bare 'b' not in vocab
    assert(proj(InternalRow(null)).isNullAt(0))
  }

  test("registered encode query: corpus round-trips through its own " +
      "vocabulary (no [UNK] possible when vocab is self-trained)") {
    val q = LlmQueries.wordpieceEncode(spark, sf0001)
    val out = q.collect()
    assert(out.nonEmpty && out.length <= 30)
    // the trained vocab contains the full self-alphabet, so MaxMatch
    // can never fail on the corpus it was trained on
    assert(!out.exists(_.getAs[String]("piece") == "[UNK]"))
    // ranks dense from 1, frequencies non-increasing
    assert(out.map(_.getAs[Int]("rank")).toSeq == (1 to out.length))
    val freqs = out.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("freq"))
    assert(freqs.zip(freqs.tail).forall { case (x, y) => x >= y })
  }
}
