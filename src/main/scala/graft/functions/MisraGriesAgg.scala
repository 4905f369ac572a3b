package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One Misra–Gries frequent-items summary: at most `k` counters plus
  * the exact processed-item total `n`. The classic streaming update
  * (Misra & Gries 1982) keeps, for every item, an estimate `est` with
  *
  *   true − n/(k+1)  ≤  est  ≤  true
  *
  * so every item with true frequency above `n/(k+1)` is GUARANTEED to
  * hold a counter when the stream ends — the candidate-recall property
  * [[graft.operators.HeavyHitters]] builds on. Summaries are mergeable
  * without losing the bound (Agarwal et al. 2012, "Mergeable summaries":
  * add counters pointwise, then subtract the (k+1)-th largest counter
  * value from every counter and drop the non-positive ones), which is
  * exactly what makes the sketch a real distributed aggregate: partial
  * aggregation, AQE, and arbitrary partitioning all preserve the
  * guarantee. Counter VALUES (and which below-threshold items linger)
  * do depend on partitioning — callers must treat the summary as a
  * candidate set + error bound, never as exact counts.
  */
final class MisraGriesSketch(val k: Int) extends Serializable {
  require(k >= 1, s"MisraGriesSketch needs k >= 1, got $k")

  val counters: mutable.HashMap[String, Long] = mutable.HashMap.empty
  var n: Long = 0L

  /** Streaming update: increment a held counter, claim a free slot, or
    * decrement every counter by one (the MG step — each decrement
    * event burns k+1 occurrences including the arriving one, which is
    * where the n/(k+1) bound comes from). */
  def add(item: String): Unit = {
    n += 1
    counters.get(item) match {
      case Some(c) => counters.update(item, c + 1L)
      case None if counters.size < k => counters.update(item, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        val keys = counters.keysIterator.toArray
        var i = 0
        while (i < keys.length) {
          val key = keys(i)
          val c = counters(key)
          if (c == 1L) dead += key else counters.update(key, c - 1L)
          i += 1
        }
        dead.foreach(counters.remove)
    }
  }

  /** Mergeable-summaries combine: pointwise sum, then if more than `k`
    * counters survive, subtract the (k+1)-th largest value from all and
    * keep the strictly positive remainder (≤ k entries by construction;
    * equivalent to that many simultaneous MG decrements, so the
    * combined error stays ≤ (n_a + n_b)/(k+1)). */
  def mergeIn(other: MisraGriesSketch): Unit = {
    n += other.n
    other.counters.foreach { case (key, c) =>
      counters.update(key, counters.getOrElse(key, 0L) + c)
    }
    if (counters.size > k) {
      val vals = counters.values.toArray
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - (k + 1))
      val keep = counters.iterator.filter(_._2 > cut).map {
        case (key, c) => (key, c - cut)
      }.toArray
      counters.clear()
      keep.foreach { case (key, c) => counters.update(key, c) }
    }
  }
}

/** One surviving counter in a finished summary. `est` undercounts the
  * true frequency by at most `n/(k+1)`. */
case class MgEntry(item: String, est: Long)

/** Finished summary: exact item total + the surviving counters, sorted
  * (est desc, item asc) so the output is deterministic GIVEN the
  * summary state (the state itself is partitioning-dependent; see
  * [[MisraGriesSketch]]). */
case class MgSummary(n: Long, entries: Seq[MgEntry])

/** Typed UDAF wrapper: `mg_sketch(col, k)` aggregates a string column
  * into one [[MgSummary]]. NULL items are skipped (they never count
  * toward `n` and cannot surface as candidates). The buffer is the
  * mutable sketch itself (kryo-serialized only at partial-aggregation
  * boundaries, the TypedImperativeAggregate contract), so per-row
  * updates stay allocation-light. */
final class MisraGriesAgg(k: Int)
    extends Aggregator[String, MisraGriesSketch, MgSummary] {

  override def zero: MisraGriesSketch = new MisraGriesSketch(k)

  override def reduce(b: MisraGriesSketch, in: String): MisraGriesSketch = {
    if (in != null) b.add(in)
    b
  }

  override def merge(a: MisraGriesSketch,
      b: MisraGriesSketch): MisraGriesSketch = {
    a.mergeIn(b)
    a
  }

  override def finish(b: MisraGriesSketch): MgSummary =
    MgSummary(b.n,
      b.counters.toSeq.map { case (item, c) => MgEntry(item, c) }
        .sortBy(e => (-e.est, e.item)))

  override def bufferEncoder: Encoder[MisraGriesSketch] =
    Encoders.kryo[MisraGriesSketch]
  override def outputEncoder: Encoder[MgSummary] =
    Encoders.product[MgSummary]
}

object MisraGriesAgg {
  /** Column form: one summary row for the whole (or grouped) input. */
  def mg_sketch(item: Column, k: Int): Column =
    udaf(new MisraGriesAgg(k), Encoders.STRING).apply(item)
}
