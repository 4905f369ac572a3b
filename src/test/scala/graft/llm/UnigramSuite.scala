package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.LlmQueries

class UnigramSuite extends SparkSpec {
  import spark.implicits._

  test("vocabulary table matches the single-threaded reference EXACTLY") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val dist = LlmQueries.unigramTrain(spark, sf0001)
      .as[(Int, String, Long, Double)].collect().toSeq.sortBy(_._1)
    val toks = d.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .as[String].collect().iterator
    val ref = Unigram.referenceUnigram(toks)
      .zipWithIndex.map { case ((p, c, lp), i) =>
        (i + 1, p, c, math.rint(lp * 1e6) / 1e6) }
    assert(dist == ref,
      s"distributed (${dist.length}): ${dist.take(10)}...\n" +
        s"reference   (${ref.length}): ${ref.take(10)}...")
    assert(dist.nonEmpty && dist.map(_._1) == (1 to dist.length))
    // coverage: every character of the dictionary is a vocab piece
    val pieces = dist.map(_._2).toSet
    val chars = d.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .as[String].collect().flatMap(_.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(pieces), s"missing chars: ${chars -- pieces}")
    // counts are ranked desc (piece-asc ties)
    assert(dist.sliding(2).forall { case Seq(a, b) =>
      a._3 > b._3 || (a._3 == b._3 && a._2 < b._2) })
    // multi-char pieces actually won training mass — the model is a
    // real subword tokenizer, not a char fallback
    assert(dist.exists(r => r._2.length >= 2 && r._3 > 0))
  }

  test("Viterbi DP: hand-computed segmentations, ties, unknown chars") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    def seg(word: String, pieces: Seq[String], lps: Seq[Double]): Seq[String] = {
      val expr = graft.functions.ViterbiSegmentExpr(
        BoundReference(0, StringType, nullable = true), pieces, lps)
      // via codegen — throws where queries silently fall back
      val proj = GenerateUnsafeProjection.generate(Seq(expr))
      val arr = proj(InternalRow(UTF8String.fromString(word))).getArray(0)
      (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    }
    // one piece strictly better: ln(.25) beats ln(.5)+ln(.25)
    assert(seg("ab", Seq("a", "b", "ab"),
      Seq(math.log(0.5), math.log(0.25), math.log(0.25))) == Seq("ab"))
    // exact score tie (-2.0 both ways) → fewer pieces wins
    assert(seg("xy", Seq("x", "y", "xy"),
      Seq(-1.0, -1.0, -2.0)) == Seq("xy"))
    // equal score AND piece count → smallest split point (longest
    // final piece): "abc" as [a,bc] vs [ab,c], both -2.0 2-piece →
    // backpointer keeps j=1... the first candidate in j-ascending scan
    // for position 3 is j=1 ("bc"), so [a, bc]
    assert(seg("abc", Seq("a", "c", "ab", "bc"),
      Seq(-1.0, -1.0, -1.0, -1.0)) == Seq("a", "bc"))
    // unknown char consumes exactly one char at the Unk penalty
    assert(seg("a!b", Seq("a", "b", "ab"),
      Seq(-1.0, -1.0, -1.0)) == Seq("a", "!", "b"))
    // null word → null output
    val exprN = graft.functions.ViterbiSegmentExpr(
      BoundReference(0, StringType, nullable = true), Seq("a"), Seq(-1.0))
    val projN = GenerateUnsafeProjection.generate(Seq(exprN))
    assert(projN(InternalRow(null)).isNullAt(0))
  }

  test("encode report: reconstruction, fertility bounds, determinism") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val model = Unigram.trainModel(d)
    val pcs = model.map(_._1)
    val lps = model.map(_._3)
    // every corpus word reconstructs from its segmentation, pieces all
    // in-vocab (training corpus → no unk path)
    val vocabSet = pcs.toSet
    val words = d.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .distinct().limit(400)
      .select(col("w"), graft.functions.ViterbiSegmentExpr
        .viterbi_segment(col("w"), pcs, lps).as("s"))
      .as[(String, Seq[String])].collect()
    assert(words.nonEmpty)
    words.foreach { case (w, s) =>
      assert(s.mkString == w, s"'$w' does not reconstruct: $s")
      assert(s.forall(vocabSet), s"'$w' used out-of-vocab pieces: $s")
    }
    // the registered report: fertility within [1/maxPieceLen-ish, len]
    val rep = LlmQueries.unigramEncode(spark, sf0001).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val ppt = r.getAs[Double]("pieces_per_token")
      assert(ppt >= 1.0 / 6 && ppt <= 30.0, r.toString)
    }
    // determinism across partitionings (dictionary order must not leak)
    val m2 = Unigram.trainModel(d.repartition(7))
    assert(model == m2, "partitioning changed the unigram model")
  }

  test("property: random corpora match the reference exactly") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val wordGen = Gen.choose(1, 7).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    (0 until 3).foreach { trial =>
      val words = (0 until 80).map(i =>
        wordGen.apply(Gen.Parameters.default, Seed(4200L + trial * 1000L + i)).get)
      val df = words.toDF("text")
      val dist = Unigram.trainUnigram(df, vocabSize = 20, seedSize = 50,
        maxPieceLen = 4, nIter = 2)
        .as[(Int, String, Long, Double)].collect().toSeq.sortBy(_._1)
      val ref = Unigram.referenceUnigram(words.iterator, vocabSize = 20,
        seedSize = 50, maxPieceLen = 4, nIter = 2)
        .zipWithIndex.map { case ((p, c, lp), i) =>
          (i + 1, p, c, math.rint(lp * 1e6) / 1e6) }
      assert(dist == ref, s"trial $trial:\n$dist\nvs\n$ref")
    }
  }
}
