package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.normalize.NormalizerSpec
import graft.ops.Stages
import graft.sources.FileBinarySource

class WireCodecSuite extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    WireRecord(1L, WireSite("s1", "web"), 1.25, flag = true),
    WireRecord(-42L, WireSite("", "app"), -0.0, flag = false),
    WireRecord(Long.MaxValue, WireSite("日本語サイト", "k" * 300),
      Double.MinPositiveValue, flag = true),
    WireRecord(Long.MinValue, WireSite("x", ""), -1.7e308, flag = false))

  test("codec round-trips every field, including non-ASCII and extremes") {
    samples.foreach { r =>
      assert(WireCodec.decode(WireCodec.encode(r)) == DecodeResult.Ok(r))
    }
  }

  test("truncated and padded payloads are Failed, not garbage") {
    val full = WireCodec.encode(samples.head)
    (0 until full.length).foreach { cut =>
      assert(WireCodec.decode(full.take(cut))
        .isInstanceOf[DecodeResult.Failed])
    }
    assert(WireCodec.decode(full ++ Array[Byte](0))
      .isInstanceOf[DecodeResult.Failed])
  }

  test("property: round-trip holds and corruption is flagged for arbitrary records") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val recGen = for {
      id <- Gen.choose(Long.MinValue, Long.MaxValue)
      sid <- Gen.stringOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('é', '中', ' ')))
        .map(_.take(400))
      kind <- Gen.stringOf(Gen.alphaNumChar).map(_.take(100))
      score <- Gen.oneOf(Gen.choose(-1e308, 1e308), Gen.oneOf(
        0.0, -0.0, Double.NaN, Double.PositiveInfinity, Double.MinPositiveValue))
      flag <- Gen.oneOf(true, false)
    } yield WireRecord(id, WireSite(sid, kind), score, flag)
    (0 until 200).foreach { i =>
      val r = recGen.apply(Gen.Parameters.default, Seed(7L + i)).get
      val wire = WireCodec.encode(r)
      WireCodec.decode(wire) match {
        case DecodeResult.Ok(back) =>
          // NaN != NaN under ==; compare bit patterns for score
          assert(back.id == r.id && back.site == r.site &&
            back.flag == r.flag &&
            java.lang.Double.doubleToLongBits(back.score) ==
              java.lang.Double.doubleToLongBits(r.score), s"seed $i")
        case other => fail(s"seed $i: $other")
      }
      // any strict prefix fails; so does appended garbage
      val cut = (wire.length * (i % 100)) / 100
      assert(WireCodec.decode(wire.take(cut))
        .isInstanceOf[DecodeResult.Failed], s"seed $i cut $cut")
      assert(WireCodec.decode(wire ++ Array[Byte]((i % 7).toByte))
        .isInstanceOf[DecodeResult.Failed], s"seed $i pad")
    }
  }

  test("property: columnar and typed decoders agree on arbitrary mixed batches") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    implicit val benc = ExpressionEncoder[Array[Byte]]()
    val byteGen = Gen.containerOf[Array, Byte](
      Gen.choose(Byte.MinValue, Byte.MaxValue))
    val blobs = (0 until 120).map { i =>
      if (i % 3 == 0) // valid record
        WireCodec.encode(WireRecord(i.toLong, WireSite(s"s$i", "k"),
          i * 1.5, i % 2 == 0))
      else byteGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
    }
    val df = blobs.toDF("value")
      .withColumn("timestamp", lit("2026-01-01 00:00:00").cast("timestamp"))
    val typed = Decoders.typed[WireRecord](WireCodec.decode).apply(df)
    val columnar = WireCodec.decodeColumnar(df)
    // same rows judged corrupt (random blobs are overwhelmingly
    // malformed; any chance-valid blob must be valid for BOTH)
    assert(typed.where(col("_corrupt").isNotNull).count() ==
      columnar.where(col("_corrupt").isNotNull).count())
    val key = Seq("id", "site", "score", "flag")
    val tGood = typed.where(col("_corrupt").isNull).select(key.map(col): _*)
    val cGood = columnar.where(col("_corrupt").isNull).select(key.map(col): _*)
    assert(cGood.exceptAll(tGood).count() == 0)
    assert(tGood.exceptAll(cGood).count() == 0)
  }

  test("null message value routes to dead letters in BOTH decoders") {
    assert(WireCodec.decode(null).isInstanceOf[DecodeResult.Failed])
    implicit val benc = ExpressionEncoder[Array[Byte]]()
    val df = Seq(WireCodec.encode(samples.head), null).toDF("value")
      .withColumn("timestamp", lit("2026-01-01 00:00:00").cast("timestamp"))
    for ((name, decode) <- Seq(
        "typed" -> Decoders.typed(WireCodec.decode),
        "columnar" -> WireCodec.decodeColumnar)) {
      val out = decode(df)
      assert(out.where(col("_corrupt").isNotNull).count() == 1, name)
      assert(out.where(col("_corrupt").isNull).count() == 1, name)
    }
  }

  test("columnar decode equals typed decode on good rows, flags bad ones") {
    implicit val benc = ExpressionEncoder[Array[Byte]]()
    val good = samples.map(WireCodec.encode)
    val bad = Seq(good.head.take(5), good.head ++ Array[Byte](1, 2))
    val df = (good ++ bad).toDF("value")
      .withColumn("timestamp", lit("2026-01-01 00:00:00").cast("timestamp"))

    val typed = Decoders.typed[WireRecord](WireCodec.decode).apply(df)
    val columnar = WireCodec.decodeColumnar(df)
    assert(columnar.columns.toSeq == typed.columns.toSeq)

    val key = Seq("id", "site", "score", "flag")
    val goodTyped = typed.where(col("_corrupt").isNull).select(key.map(col): _*)
    val goodCol = columnar.where(col("_corrupt").isNull).select(key.map(col): _*)
    assert(goodCol.exceptAll(goodTyped).count() == 0)
    assert(goodTyped.exceptAll(goodCol).count() == 0)
    assert(columnar.where(col("_corrupt").isNotNull).count() == bad.size)
  }

  test("columnar decoder under checkpointed streaming: restart resumes offsets") {
    // The all-codegen decode path through a REAL streaming query with a
    // checkpoint: close mid-stream, land more wire records, restart —
    // the query must resume from the committed offset (no re-read, no
    // double-count) and conservation must hold across the restart.
    implicit val benc = ExpressionEncoder[Array[Byte]]()
    val root = Files.createTempDirectory("graft-wire-ckpt").toString
    def land(lo: Long, hi: Long, bad: Int): Unit = {
      val msgs = (lo until hi).map(i => WireCodec.encode(
        WireRecord(i, WireSite(s"s$i", "web"), i * 0.5, i % 2 == 0))) ++
        Seq.fill(bad)(Array[Byte](9, 9, 9))
      msgs.toDF("value").withColumn("timestamp", current_timestamp())
        .write.mode("append").parquet(s"$root/messages")
    }
    land(0L, 100L, bad = 3)
    val pipe = Pipeline(spark, PipelineConfig(
      source = FileBinarySource(s"$root/messages"),
      outputDir = s"$root/out",
      destTable = "wire",
      decode = WireCodec.decodeColumnar,
      deadLetterTable = Some("dead"),
      checkpointDir = Some(s"$root/ckpt")))
    pipe.run().processAllAvailable()
    pipe.close()
    assert(pipe.metrics.messagesConsumed.get == 103)
    assert(pipe.metrics.recordsProcessed.get == 100)
    assert(pipe.metrics.decodeErrors.get == 3)

    land(100L, 150L, bad = 2) // lands while closed
    pipe.restart().processAllAvailable()
    pipe.close()
    val m = pipe.metrics
    assert(m.messagesConsumed.get == 155, "restart must resume, not re-read")
    assert(m.recordsProcessed.get == 150)
    assert(m.decodeErrors.get == 5)
    assert(m.conservationHolds)
  }

  test("binary pipeline end-to-end: decode + dead-letter + norm parity") {
    implicit val benc = ExpressionEncoder[Array[Byte]]()
    val root = Files.createTempDirectory("graft-wire").toString
    val prefix = Array.fill[Byte](6)(0)
    val recs = (0L until 200L).map(i =>
      WireRecord(i, WireSite(s"site_$i", if (i % 2 == 0) "web" else "app"),
        i / 10.0, i % 3 == 0))
    val goodMsgs = recs.map(r => prefix ++ WireCodec.encode(r))
    val badMsgs = Seq.fill(7)(prefix ++ Array[Byte](1, 2, 3))
    (goodMsgs ++ badMsgs).toDF("value")
      .withColumn("timestamp", current_timestamp())
      .repartition(4)
      .write.mode("overwrite").parquet(s"$root/messages")

    for ((name, decode) <- Seq(
        "typed" -> Decoders.typed(WireCodec.decode),
        "columnar" -> WireCodec.decodeColumnar)) {
      val pipe = Pipeline(spark, PipelineConfig(
        source = FileBinarySource(s"$root/messages"),
        outputDir = s"$root/out_$name",
        destTable = "wire",
        munger = Some(Stages.confluentStrip),
        decode = decode,
        deadLetterTable = Some("dead"),
        normalizer = Some(NormalizerSpec(
          Seq("id", "site.id", "site.kind", "score"),
          Seq("id", "site", "kind", "score")))))
      val q = pipe.run()
      q.processAllAvailable()
      pipe.close()
      val m = pipe.metrics
      assert(m.messagesConsumed.get == 207, name)
      assert(m.recordsProcessed.get == 200, name)
      assert(m.decodeErrors.get == 7, name)
      assert(m.conservationHolds, name)

      val manifest = spark.read.parquet(s"$root/out_$name/_manifest")
      val raw = spark.read.parquet(
        manifest.select("path").as[String].collect().map(_ + "/wire"): _*)
      assert(raw.count() == 200, name)
      val row = raw.where(col("id") === 42L).head()
      assert(row.getAs[org.apache.spark.sql.Row]("site")
        .getAs[String]("id") == "site_42", name)
      assert(row.getAs[Double]("score") == 4.2, name)
      assert(row.getAs[Boolean]("flag"), name)
      val norm = spark.read.parquet(
        manifest.select("path").as[String].collect().map(_ + "/wire_norm"): _*)
      assert(norm.columns.toSeq == Seq("id", "site", "kind", "score"), name)
      assert(norm.count() == 200, name)
    }
  }

  test("differential fuzz: typed and columnar wire decoders agree on " +
      "every verdict and row, including invalid UTF-8 rejection") {
    implicit val benc = ExpressionEncoder[Array[Byte]]()
    val rnd = new scala.util.Random(20260815L)
    val random = (1 to 1000).map { _ =>
      Array.fill[Byte](rnd.nextInt(40))(rnd.nextInt().toByte)
    }
    val valid = WireCodec.encode(WireRecord(7L, WireSite("sé", "web"),
      1.5, flag = true))
    val truncs = (0 until valid.length).map(valid.take)
    val flips = (1 to 500).map { _ =>
      val b = valid.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt().toByte
      b
    }
    val corpus = random ++ truncs ++ flips
    val typedVerdicts = corpus.map(b => WireCodec.decode(b) match {
      case graft.pipeline.DecodeResult.Ok(_) => true
      case _ => false
    })
    val df = corpus.toDF("value")
      .withColumn("timestamp", lit("2026-01-01 00:00:00").cast("timestamp"))
    val columnar = WireCodec.decodeColumnar(df)
    val colVerdicts = columnar.select(col("_corrupt").isNull)
      .as[Boolean].collect()
    val disagreements = typedVerdicts.zip(colVerdicts).zipWithIndex
      .collect { case ((t, c), i) if t != c => (i, t, c) }
    assert(disagreements.isEmpty,
      s"verdicts diverge: ${disagreements.take(5).map { case (i, t, c) =>
        (i, t, c, corpus(i).map("%02x".format(_)).mkString) }}")
    assert(typedVerdicts.exists(identity) && typedVerdicts.exists(!_))
    // a multi-byte char split by a flip must REJECT in both, not
    // silently repair (the sé fixture plants a 2-byte sequence)
    val broken = valid.clone()
    broken(11) = 0x65.toByte // first byte of 'é' -> plain 'e': kills
                             // the pair's validity
    // (whichever way the flip lands, verdicts must STILL agree)
    val key = Seq(col("id"), col("site"), col("score"), col("flag"))
    val typed = Decoders.typed[WireRecord](WireCodec.decode).apply(df)
    val tOk = typed.where(col("_corrupt").isNull).select(key: _*)
    val cOk = columnar.where(col("_corrupt").isNull).select(key: _*)
    assert(cOk.exceptAll(tOk).count() == 0 &&
      tOk.exceptAll(cOk).count() == 0,
      "decoded rows diverge on fuzz-surviving buffers")
  }
}
