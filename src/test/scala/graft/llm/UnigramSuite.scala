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

  test("EM twin: vocabulary table matches the single-threaded marginals " +
      "reference EXACTLY") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val dist = LlmQueries.unigramTrainEm(spark, sf0001)
      .as[(Int, String, Double, Double)].collect().toSeq.sortBy(_._1)
    val toks = d.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .as[String].collect().iterator
    val q = graft.functions.LatticeMarginalsExpr.QuantScale
    val ref = Unigram.referenceUnigramEm(toks)
      .zipWithIndex.map { case ((p, c, lp), i) =>
        (i + 1, p, math.rint(c / q * 1e6) / 1e6, math.rint(lp * 1e6) / 1e6) }
    assert(dist == ref,
      s"distributed (${dist.length}): ${dist.take(10)}...\n" +
        s"reference   (${ref.length}): ${ref.take(10)}...")
    assert(dist.nonEmpty && dist.map(_._1) == (1 to dist.length))
    // character coverage survives the loss prune
    val pieces = dist.map(_._2).toSet
    val chars = d.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .as[String].collect().flatMap(_.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(pieces), s"missing chars: ${chars -- pieces}")
    // expected counts rank desc (piece-asc ties); multis carry mass
    assert(dist.sliding(2).forall { case Seq(a, b) =>
      a._3 > b._3 || (a._3 == b._3 && a._2 < b._2) })
    assert(dist.exists(r => r._2.length >= 2 && r._3 > 0))
    // determinism across partitionings — the leaf-quantization
    // contract: long M-step sums are partition-order-free
    val m2 = Unigram.trainModelEm(d.repartition(7))
    val m1 = Unigram.trainModelEm(d)
    assert(m1 == m2, "partitioning changed the EM model")
  }

  test("lattice marginals: hand-computed expectations, unk edges, null") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    def marg(word: String, pieces: Seq[String],
        lps: Seq[Double]): Seq[(String, Long)] = {
      val expr = graft.functions.LatticeMarginalsExpr(
        BoundReference(0, StringType, nullable = true), pieces, lps)
      // via codegen — throws where queries silently fall back
      val proj = GenerateUnsafeProjection.generate(Seq(expr))
      val arr = proj(InternalRow(UTF8String.fromString(word))).getArray(0)
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getLong(1))
      }
    }
    // "ab" under {a: .5, b: .25, ab: .25}: two segmentations,
    // P([a,b]) = .125, P([ab]) = .25, Z = .375 → E[a] = E[b] = 1/3,
    // E[ab] = 2/3; micro-quantized: 333333 / 666667 (rint half-up)
    assert(marg("ab", Seq("a", "b", "ab"),
      Seq(math.log(0.5), math.log(0.25), math.log(0.25))) ==
      Seq(("a", 333333L), ("ab", 666667L), ("b", 333333L)))
    // unknown char: single lattice path a-!-b; the unk edge carries
    // the mass but emits NO count — a and b get exactly 1.0 each
    assert(marg("a!b", Seq("a", "b"), Seq(-1.0, -1.0)) ==
      Seq(("a", 1000000L), ("b", 1000000L)))
    // single segmentation → all counts exactly 1.0
    assert(marg("abc", Seq("a", "b", "c"), Seq(-1.0, -2.0, -3.0)) ==
      Seq(("a", 1000000L), ("b", 1000000L), ("c", 1000000L)))
    // null word → null output
    val exprN = graft.functions.LatticeMarginalsExpr(
      BoundReference(0, StringType, nullable = true), Seq("a"), Seq(-1.0))
    val projN = GenerateUnsafeProjection.generate(Seq(exprN))
    assert(projN(InternalRow(null)).isNullAt(0))
  }

  test("EM convergence stop: exact count fixpoint ends the loop below " +
      "the nIter cap, model identical to the full budget") {
    // a corpus of single-character words has exactly one segmentation
    // per word: round 1 converts seed counts to micro-units with the
    // same probabilities, round 2 reproduces round 1's counts exactly
    // — the fixpoint detector must stop there regardless of the cap,
    // and stopping must be output-invisible (skipped rounds are
    // bit-identical no-ops by the determinism contract).
    val fast = Seq.fill(40)("a b a c").toDF("text")
    val capped = Unigram.trainModelEm(fast, nIter = 2, maxPieceLen = 2)
    assert(Unigram.lastEmRounds == 2)
    val converged = Unigram.trainModelEm(fast, nIter = 25, maxPieceLen = 2)
    val rounds = Unigram.lastEmRounds
    assert(rounds < 25, s"convergence stop never fired ($rounds rounds)")
    assert(converged == capped,
      "early stop changed the model vs the equivalent fixed budget")
    // an ambiguous corpus still moving at the cap must run every round
    val amb = (Seq.fill(100)("ab") ++ Seq.fill(10)("a") ++
      Seq.fill(10)("b")).toDF("text")
    Unigram.trainModelEm(amb, nIter = 3, maxPieceLen = 2)
    assert(Unigram.lastEmRounds == 3,
      "moving counts mistaken for a fixpoint")
  }

  test("EM model dominates the Viterbi model on corpus marginal " +
      "likelihood (what the full E-step buys)") {
    def corpusLL(dict: Seq[(String, Long)],
        model: Seq[(String, Long, Double)]): Double = {
      val lp = model.map { case (p, _, x) => p -> x }.toMap
      val maxLen = model.iterator.map(_._1.length).max
      dict.iterator.map { case (w, f) =>
        f * Unigram.logZ(w, lp, maxLen) }.sum
    }
    // Dominance needs a corpus with AMBIGUOUS segmentations where
    // Viterbi's winner-take-all counts lock into a worse fixpoint —
    // "ab"×100 "a"×10 "b"×10: Viterbi assigns every "ab" to the [ab]
    // piece, fixpoint p_a = p_b = 1/12; the marginal-LL optimum is
    // p_a = 1/11 (max of 20·ln(1−x) + 2·ln x per 10 words), which the
    // forward-backward E-step reaches: LL gap ≈ +0.0557 nats at
    // nIter=3, → +0.0805 converged (UnigramEmProbe). The FIXTURE
    // can't show this: its ~30-token effective vocabulary makes both
    // trainers converge to the SAME fixpoint (probe: diff 0.0000 at
    // nIter=4) — the controlled-corpus pattern, as with
    // llm_quality_model_lm.
    val amb = (Seq.fill(100)("ab") ++ Seq.fill(10)("a") ++
      Seq.fill(10)("b")).toDF("text")
    val ambDict = Seq(("ab", 100L), ("a", 10L), ("b", 10L))
    val llEm = corpusLL(ambDict,
      Unigram.trainModelEm(amb, maxPieceLen = 2))
    val llVit = corpusLL(ambDict,
      Unigram.trainModel(amb, maxPieceLen = 2))
    assert(llEm > llVit,
      s"EM likelihood $llEm does not dominate Viterbi $llVit")
    // and on the fixture: the EM theorem itself — corpus marginal LL
    // is monotone non-decreasing in nIter (tolerance for the 1e-6
    // count quantization at the fixpoint)
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val dict = d.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .as[(String, Long)].collect().toSeq
    val lls = (0 to 3).map(k =>
      corpusLL(dict, Unigram.trainModelEm(d, nIter = k)))
    lls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-6, s"EM likelihood regressed: $lls")
    }
    assert(lls.last > lls.head, s"EM never improved: $lls")
  }

  test("subword-regularization sampling: reconstruction, score " +
      "dominance, determinism, unk handling") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val model = Unigram.trainModel(d)
    val pcs = model.map(_._1)
    val lps = model.map(_._3)
    val lpOf = pcs.zip(lps).toMap
    val words = d.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .distinct().limit(300)
      .select(col("w"),
        graft.functions.LatticeSampleExpr
          .lattice_sample(col("w"), pcs, lps, alpha = 0.5, seed = 42L)
          .as("s"),
        graft.functions.ViterbiSegmentExpr
          .viterbi_segment(col("w"), pcs, lps).as("v"))
      .as[(String, Seq[String], Seq[String])].collect()
    assert(words.nonEmpty)
    words.foreach { case (w, s, v) =>
      assert(s.mkString == w, s"'$w' does not reconstruct: $s")
      // a sampled path never beats the Viterbi optimum
      val sScore = s.map(lpOf).sum
      val vScore = v.map(lpOf).sum
      assert(sScore <= vScore + 1e-9,
        s"'$w': sampled $sScore beats viterbi $vScore")
    }
    // determinism across partitionings — the (word, seed)-pure RNG
    // contract (rand() would redraw per partition layout)
    def sampleMap(df: org.apache.spark.sql.DataFrame): Map[String, Seq[String]] =
      df.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
        .select(col("w"), graft.functions.LatticeSampleExpr
          .lattice_sample(col("w"), pcs, lps, alpha = 0.5, seed = 42L)
          .as("s"))
        .as[(String, Seq[String])].collect().toMap
    assert(sampleMap(d) == sampleMap(d.repartition(7)),
      "partitioning changed the sampled segmentations")
    // and the registered report runs
    assert(LlmQueries.unigramSample(spark, sf0001).count() > 0)
    // unknown chars take the forced unk edge and still reconstruct
    val unk = Seq("a!b").toDF("w")
      .select(graft.functions.LatticeSampleExpr
        .lattice_sample(col("w"), Seq("a", "b"), Seq(-1.0, -1.0),
          alpha = 1.0, seed = 7L).as("s"))
      .as[Seq[String]].head()
    assert(unk.mkString == "a!b" && unk.contains("!"))
  }

  test("sampling distribution: hand lattice frequencies track P^alpha; " +
      "codegen path matches the leaf sampler") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val pcs = Seq("a", "b", "ab")
    val lps = Seq(math.log(0.5), math.log(0.25), math.log(0.25))
    def leafOnce(alpha: Double, seed: Long): Seq[String] = {
      val m = new java.util.HashMap[String, java.lang.Double]()
      pcs.zip(lps).foreach { case (p, l) => m.put(p, alpha * l) }
      val out = graft.functions.LatticeSampleExpr
        .sample("ab", m, 2, alpha, seed)
      (0 until out.size).map(out.get)
    }
    // P([ab]) on "ab": α=1 → .25/(.25+.125) = 2/3; α=0 → uniform 1/2;
    // α=5 → 32/33 ≈ .97 (→ Viterbi). 600 seeds, ±4σ bounds.
    def freqAb(alpha: Double): Double =
      (0 until 600).count(s =>
        leafOnce(alpha, 1000L + s) == Seq("ab")) / 600.0
    val f1 = freqAb(1.0)
    assert(f1 > 0.55 && f1 < 0.78, s"alpha=1 P([ab]) drifted: $f1")
    val f0 = freqAb(0.0)
    assert(f0 > 0.42 && f0 < 0.58, s"alpha=0 not uniform: $f0")
    val f5 = freqAb(5.0)
    assert(f5 > 0.9, s"alpha=5 should be near-Viterbi: $f5")
    // codegen ≡ leaf for a handful of seeds (the bitwise-shared-leaf
    // contract, through GenerateUnsafeProjection which throws where
    // queries silently fall back)
    (0 until 5).foreach { s =>
      val expr = graft.functions.LatticeSampleExpr(
        BoundReference(0, StringType, nullable = true), pcs, lps,
        alpha = 1.0, seed = 1000L + s)
      val proj = GenerateUnsafeProjection.generate(Seq(expr))
      val arr = proj(InternalRow(UTF8String.fromString("ab"))).getArray(0)
      val got = (0 until arr.numElements())
        .map(i => arr.getUTF8String(i).toString)
      assert(got == leafOnce(1.0, 1000L + s), s"seed $s: codegen differs")
    }
    // null word → null
    val exprN = graft.functions.LatticeSampleExpr(
      BoundReference(0, StringType, nullable = true), pcs, lps, 1.0, 1L)
    val projN = GenerateUnsafeProjection.generate(Seq(exprN))
    assert(projN(InternalRow(null)).isNullAt(0))
  }

  test("property: random corpora match the EM reference exactly") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val wordGen = Gen.choose(1, 7).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    (0 until 2).foreach { trial =>
      val words = (0 until 60).map(i =>
        wordGen.apply(Gen.Parameters.default, Seed(9100L + trial * 1000L + i)).get)
      val df = words.toDF("text")
      val q = graft.functions.LatticeMarginalsExpr.QuantScale
      val dist = Unigram.trainUnigramEm(df, vocabSize = 20, seedSize = 50,
        maxPieceLen = 4, nIter = 2)
        .as[(Int, String, Double, Double)].collect().toSeq.sortBy(_._1)
      val ref = Unigram.referenceUnigramEm(words.iterator, vocabSize = 20,
        seedSize = 50, maxPieceLen = 4, nIter = 2)
        .zipWithIndex.map { case ((p, c, lp), i) =>
          (i + 1, p, math.rint(c / q * 1e6) / 1e6,
            math.rint(lp * 1e6) / 1e6) }
      assert(dist == ref, s"trial $trial:\n$dist\nvs\n$ref")
    }
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
