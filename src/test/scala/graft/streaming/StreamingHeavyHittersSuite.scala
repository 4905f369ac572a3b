package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingHeavyHittersSuite extends SparkSpec {
  import spark.implicits._

  private def zipfStream(n: Int, vocab: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val w = (1 to vocab).map(r => 1.0 / math.pow(r, 1.2)).toArray
    val cum = w.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    Seq.fill(n) {
      val x = rnd.nextDouble() * total
      val i = java.util.Arrays.binarySearch(cum, x)
      s"w${if (i >= 0) i else -i - 1}"
    }
  }

  test("chunked folding keeps the sandwich: guaranteed ⊆ exact heavy " +
      "set ⊆ candidates, and the n/(k+1) bound holds per counter") {
    val root = Files.createTempDirectory("graft-shh").toString
    val k = 64
    val m = 32
    val data = zipfStream(30000, 2000, seed = 5L)
    val truth = data.groupBy(identity).map { case (i, xs) =>
      (i, xs.size.toLong) }
    val store = StreamingHeavyHitters(s"$root/store", k)
    data.grouped(7500).zipWithIndex.foreach { case (chunk, id) =>
      store.processBatch(chunk.toDF("item"), "item", id.toLong)
    }
    val s = store.summary(spark)
    assert(s.n == data.size)
    assert(s.entries.size <= k)
    val bound = s.n.toDouble / (k + 1)
    s.entries.foreach { e =>
      val t = truth(e.item)
      assert(e.est <= t, s"${e.item}: est ${e.est} > true $t")
      assert(t - e.est <= bound, s"${e.item}: undercount > bound")
    }
    val held = s.entries.map(_.item).toSet
    truth.filter(_._2 > bound).keys.foreach(i =>
      assert(held.contains(i), s"$i above bound but evicted"))
    val exactHeavy = truth.collect {
      case (i, c) if c * m >= s.n => i }.toSet
    val g = store.guaranteed(spark, m).map(_.item).toSet
    val c = store.candidates(spark, m).map(_.item).toSet
    assert(g.subsetOf(exactHeavy), s"false positives: ${g -- exactHeavy}")
    assert(exactHeavy.subsetOf(c), s"false negatives: ${exactHeavy -- c}")
    assert(exactHeavy.nonEmpty && g.nonEmpty)
  }

  test("batchId guard: a replayed batch is a no-op (exactly-once state)") {
    val root = Files.createTempDirectory("graft-shh-r").toString
    val store = StreamingHeavyHitters(s"$root/store", k = 8)
    val b = Seq("a", "a", "b").toDF("item")
    store.processBatch(b, "item", 0L)
    store.processBatch(b, "item", 0L) // crash-replay of the same id
    val s = store.summary(spark)
    assert(s.n == 3L, s"replay double-counted: n=${s.n}")
    store.processBatch(b, "item", 1L) // a genuinely new batch folds
    assert(store.summary(spark).n == 6L)
    // reopening the store at a different width must fail loudly — the
    // stored k would otherwise silently win and the caller's n/(k+1)
    // reasoning would be wrong
    intercept[IllegalArgumentException] {
      StreamingHeavyHitters(s"$root/store", k = 16).summary(spark)
    }
  }

  test("crash between delete and rename recovers from the tmp file " +
      "(no silent state zeroing)") {
    val root = Files.createTempDirectory("graft-shh-cw").toString
    val store = StreamingHeavyHitters(s"$root/store", k = 8)
    store.processBatch(Seq("a", "a", "b").toDF("item"), "item", 0L)
    store.processBatch(Seq("a", "c").toDF("item"), "item", 1L)
    // simulate the writeState crash window: the completed new state
    // sits in _sketch.tmp and sketch.bin is already deleted
    val sketch = new java.io.File(s"$root/store/sketch.bin")
    val tmp = new java.io.File(s"$root/store/_sketch.tmp")
    java.nio.file.Files.copy(sketch.toPath, tmp.toPath)
    assert(sketch.delete())
    val s = store.summary(spark)
    assert(s.n == 5L, s"state zeroed: n=${s.n}")
    // and the batchId guard survived: replaying batch 1 stays a no-op
    store.processBatch(Seq("a", "c").toDF("item"), "item", 1L)
    assert(store.summary(spark).n == 5L)
  }

  test("attach: file-stream micro-batches fold end to end; fresh " +
      "store reads empty") {
    val root = Files.createTempDirectory("graft-shh-e2e").toString
    val store = StreamingHeavyHitters(s"$root/store", k = 16)
    assert(store.summary(spark).n == 0L)
    val d = (Seq.fill(40)("hot") ++ (1 to 20).map(i => s"cold$i"))
      .toDF("item")
    d.repartition(3).write.parquet(s"$root/in")
    val stream = spark.readStream.schema(d.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
    val q = store.attach(stream, "item", s"$root/ckpt")
    q.processAllAvailable()
    q.stop()
    val s = store.summary(spark)
    assert(s.n == 60L)
    // 'hot' (2/3 of the stream) is guaranteed at m = 2
    assert(store.guaranteed(spark, 2).map(_.item) == Seq("hot"))
  }
}
