package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.{Sampling, TextAnalysis}

/** Pins the streaming token-budget twin's contract: single-batch ≡
  * the batch operator exactly (shared prefixTokens derivation),
  * crash-replay identity (additive-sums store: per-batch partition
  * overwrite + self-exclusion), chunked admission = the global
  * (batch, bucket, id) prefix the oracle reproduces, and the
  * arrival-order divergence from the batch operator BY DESIGN. */
class StreamingTokenBudgetSuite extends SparkSpec {

  private val budgets = Map("en" -> 5000L, "de" -> 2000L, "fr" -> 2000L)

  private def toks: DataFrame =
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))

  private def newStream() = StreamingTokenBudget(
    s"${Files.createTempDirectory("graft-stb")}/store", "lang",
    budgets, defaultBudget = 1000L)

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("single batch equals the batch operator exactly") {
    val batch = ids(Sampling.tokenBudget(toks, "lang", budgets,
      defaultBudget = 1000L))
    val st = newStream()
    assert(ids(st.processBatch(toks, batchId = 0L)) == batch)
  }

  test("chunked admission is the global (batch, bucket, id) prefix") {
    // driver-side reference: per-stratum prefix over docs ordered by
    // (chunk, md5-bucket, id) — exactly what the oracle SQL computes
    val rows = toks
      .withColumn("bucket", Sampling.hashBucket(col("doc_id")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[Number](2).longValue, r.getAs[Number](3).longValue))
      .sortBy { case (id, _, _, b) => (id % 3, b, id) }
    val spent = scala.collection.mutable.Map[String, Long]()
    val expected = rows.flatMap { case (id, lang, n, _) =>
      val cum = spent.getOrElse(lang, 0L) + n
      spent(lang) = cum
      if (cum <= budgets.getOrElse(lang, 1000L)) Some(id) else None
    }.toSet
    val st = newStream()
    val got = (0 until 3).map(c =>
        st.processBatch(toks.where(pmod(col("doc_id"), lit(3L)) === c),
          batchId = c.toLong))
      .reduce(_.unionByName(_))
    assert(ids(got) == expected)
    // the divergence from the batch operator is real on this fixture
    // (arrival order ≠ corpus bucket order) — if these ever coincide
    // the hand case below is the only thing distinguishing the modes
    val batch = ids(Sampling.tokenBudget(toks, "lang", budgets,
      defaultBudget = 1000L))
    info(s"stream ${expected.size} admitted vs batch ${batch.size}; " +
      s"symmetric diff ${(expected diff batch).size + (batch diff expected).size}")
  }

  test("crash-replayed batch admits the identical set") {
    val st = newStream()
    st.processBatch(toks.where(pmod(col("doc_id"), lit(3L)) === 0),
      batchId = 0L)
    val first = ids(st.processBatch(
      toks.where(pmod(col("doc_id"), lit(3L)) === 1), batchId = 1L))
    // replay batch 1: the store read excludes its own partition, so
    // its first attempt's sums must not count against itself
    val replay = ids(st.processBatch(
      toks.where(pmod(col("doc_id"), lit(3L)) === 1), batchId = 1L))
    assert(replay == first, "replay diverged from first attempt")
    val last = ids(st.processBatch(
      toks.where(pmod(col("doc_id"), lit(3L)) === 2), batchId = 2L))
    assert((first intersect last).isEmpty)
  }

  test("arrival order beats bucket order across batches (by design)") {
    import spark.implicits._
    // budget 10: doc 1 (7 tokens) arrives in batch 0 and is admitted;
    // the batch operator orders by md5 bucket and would admit
    // whichever of {1, 2} buckets first — construct the case where
    // they disagree by putting the bucket-later doc in the earlier
    // batch
    val d = Seq((1L, "xx", 7L), (2L, "xx", 7L)).toDF(
      "doc_id", "lang", "n_tokens")
    val b1 = Sampling.hashBucket(lit(1L))
    val b2 = Sampling.hashBucket(lit(2L))
    val Seq(h1, h2) = spark.range(1).select(b1, b2).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSeq
    val (early, late) = if (h1 > h2) (1L, 2L) else (2L, 1L)
    val st = StreamingTokenBudget(
      s"${Files.createTempDirectory("graft-stb")}/store", "lang",
      Map("xx" -> 10L))
    val a0 = ids(st.processBatch(d.where(col("doc_id") === early), 0L))
    val a1 = ids(st.processBatch(d.where(col("doc_id") === late), 1L))
    assert(a0 == Set(early) && a1.isEmpty,
      s"stream must admit the arrival-order prefix: $a0 / $a1")
    val batch = ids(Sampling.tokenBudget(d, "lang", Map("xx" -> 10L)))
    assert(batch == Set(late),
      s"batch op must admit the bucket-order prefix: $batch")
  }

  test("compaction folds spent sums without changing admissions") {
    val plain = newStream()
    val comp = newStream()
    val admittedPlain = (0 until 3).map { c =>
      val b = toks.where(pmod(col("doc_id"), lit(3L)) === c)
      val a = ids(plain.processBatch(b, batchId = c.toLong))
      a
    }
    val admittedComp = (0 until 3).map { c =>
      val b = toks.where(pmod(col("doc_id"), lit(3L)) === c)
      val a = ids(comp.processBatch(b, batchId = c.toLong))
      comp.compact(spark) // fold after every batch — worst case
      a
    }
    assert(admittedPlain == admittedComp,
      "compaction changed an admission decision")
    // a post-compaction batch must see the same spent totals as the
    // uncompacted store (folded sums ≡ per-batch sums)
    val again = toks.withColumn("doc_id", col("doc_id") + 1000000L)
    val extraPlain = ids(plain.processBatch(again, batchId = 3L))
    val extraComp = ids(comp.processBatch(again, batchId = 3L))
    assert(extraPlain == extraComp,
      "folded spent sums diverged from the per-batch store")
  }

  test("an interrupted compact swap heals at the NEXT BATCH") {
    // reproduce CompactSwap's exact crash window: fold staged +
    // manifest written + one folded partition deleted, rename never
    // happened. Without recovery at processBatch, spent() would see a
    // store missing the folded history and OVER-ADMIT past budget.
    val store = s"${Files.createTempDirectory("graft-stb")}/store"
    val st = StreamingTokenBudget(store, "lang", budgets,
      defaultBudget = 1000L)
    val twin = newStream()
    (0 until 3).foreach { c =>
      val b = toks.where(pmod(col("doc_id"), lit(3L)) === c)
      st.processBatch(b, batchId = c.toLong)
      twin.processBatch(b, batchId = c.toLong)
    }
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val folded = Seq(0L, 1L).map(i =>
      new org.apache.hadoop.fs.Path(s"$store/batch_id=$i"))
    val tmp = new org.apache.hadoop.fs.Path(s"$store/.compact_tmp")
    spark.read.parquet(folded.map(_.toString): _*)
      .groupBy("lang").agg(sum("tokens").as("tokens"))
      .write.mode("overwrite").parquet(tmp.toString)
    val manifest = fs.create(
      new org.apache.hadoop.fs.Path(tmp, "_graft_swap"), true)
    try manifest.write(
      (s"$store/batch_id=0" +: folded.map(_.toString))
        .mkString("\n").getBytes("UTF-8"))
    finally manifest.close()
    assert(fs.delete(folded(1), true)) // crash after the first delete
    // next batch must admit exactly what the untouched twin admits
    val again = toks.withColumn("doc_id", col("doc_id") + 2000000L)
    assert(ids(st.processBatch(again, batchId = 3L)) ==
      ids(twin.processBatch(again, batchId = 3L)),
      "interrupted swap window leaked into admission")
  }

  test("prefix rule: a budget-busting stratum stays closed") {
    import spark.implicits._
    // stratum budget 10; batch 0 arrives with 12 tokens in one doc —
    // rejected AND the stratum closes (prefix semantics count every
    // arrival), so a 3-token doc in batch 1 is rejected too
    val st = StreamingTokenBudget(
      s"${Files.createTempDirectory("graft-stb")}/store", "lang",
      Map("xx" -> 10L))
    val big = Seq((1L, "xx", 12L)).toDF("doc_id", "lang", "n_tokens")
    val small = Seq((2L, "xx", 3L)).toDF("doc_id", "lang", "n_tokens")
    assert(ids(st.processBatch(big, 0L)).isEmpty)
    assert(ids(st.processBatch(small, 1L)).isEmpty,
      "closed stratum readmitted a later arrival")
  }
}
