package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: pair every point row with every
  * interval row whose `[start, end]` contains the point's position.
  * The reference delegates this family to DuckDB (SURVEY.md §2.2 —
  * DuckDB plans it as an IEJoin); Spark has NO native inequality-join
  * strategy, so a naive `p BETWEEN s AND e` condition with no equi
  * key degenerates to BroadcastNestedLoopJoin — O(|points|·|intervals|)
  * comparisons and a broadcast of one whole side, the classic 100 TB
  * scale-killer.
  *
  * This operator plans the scalable shape instead: quantize the
  * position axis into fixed-width buckets, replicate each interval to
  * every bucket it overlaps (fan-out = ceil(width/bucketWidth) + 1,
  * bounded when interval widths are bounded), and equi-join points to
  * interval copies on the bucket id with the containment predicate as
  * a residual filter. Cost = one shuffle of each side keyed by bucket
  * (AQE may still broadcast a genuinely small side — fine, it stays a
  * HASH join on the bucket key, never a nested loop). Each matched
  * pair emits EXACTLY once because a point lies in exactly one bucket
  * and an interval is replicated at most once per bucket.
  *
  * Choosing `bucketWidth` ≈ the typical interval width keeps both the
  * replication factor (≤ 2× for intervals no wider than a bucket) and
  * the per-bucket candidate count small; a very hot bucket (position
  * skew) is AQE skew-split territory like any other shuffle join.
  *
  * Positions are caller-supplied LONG expressions (days, epoch
  * seconds, integer keys — any totally ordered axis quantized to a
  * unit). NULL positions/bounds never match (inner-join semantics);
  * intervals with `end < start` are empty and dropped.
  */
object RangeJoin {

  /** Floor division that is correct for negative positions too
    * (`div` truncates toward zero; buckets must tile the axis). */
  private def floorDiv(x: Column, w: Long): Column =
    ((x - pmod(x, lit(w))) / w).cast("long")

  /** @param points     left side; one output row per containing interval
    * @param intervals  right side with inclusive `[startPos, endPos]`
    * @param pointPos   LONG position of each point row
    * @param startPos   LONG inclusive lower bound of each interval row
    * @param endPos     LONG inclusive upper bound of each interval row
    * @param bucketWidth positive bucket width in position units
    * @return points.* ++ intervals.* for every containment match
    */
  def joinPointsInIntervals(
      points: DataFrame, intervals: DataFrame,
      pointPos: Column, startPos: Column, endPos: Column,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")

    val p = points
      .withColumn("__pos", pointPos.cast("long"))
      .withColumn("__bkt", floorDiv(col("__pos"), bucketWidth))
    val i = intervals
      .withColumn("__s", startPos.cast("long"))
      .withColumn("__e", endPos.cast("long"))
      .where(col("__e") >= col("__s"))
      // explode_outer + generated-column filter is the re-inline-safe
      // explode form (CLAUDE.md round-6 lesson); bounds here are cheap
      // but the shape stays uniform with the rest of the repo.
      .withColumn("__bkt",
        explode(sequence(floorDiv(col("__s"), bucketWidth),
          floorDiv(col("__e"), bucketWidth))))

    p.join(i, p("__bkt") === i("__bkt") &&
        col("__pos") >= col("__s") && col("__pos") <= col("__e"))
      .drop("__pos", "__bkt", "__s", "__e")
  }

  /** Interval-overlap join: pair every left interval with every right
    * interval sharing at least one position (`[ls,le] ∩ [rs,re] ≠ ∅`,
    * bounds inclusive). Same bucketed strategy as
    * [[joinPointsInIntervals]], with one twist: BOTH sides replicate
    * across their buckets, so a pair overlapping in several buckets
    * would match once per shared bucket. The dedup is declarative,
    * not a distinct: a pair is emitted ONLY in its canonical bucket —
    * the bucket of `max(ls, rs)`, which for any overlapping pair lies
    * inside both intervals and is therefore present in both replica
    * sets, exactly once. No post-join shuffle, no duplicate rows.
    * Empty (`end < start`) intervals on either side never match. */
  def joinOverlappingIntervals(
      left: DataFrame, right: DataFrame,
      leftStart: Column, leftEnd: Column,
      rightStart: Column, rightEnd: Column,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val l = left
      .withColumn("__ls", leftStart.cast("long"))
      .withColumn("__le", leftEnd.cast("long"))
      .where(col("__le") >= col("__ls"))
      .withColumn("__lbkt", explode(sequence(
        floorDiv(col("__ls"), bucketWidth),
        floorDiv(col("__le"), bucketWidth))))
    val r = right
      .withColumn("__rs", rightStart.cast("long"))
      .withColumn("__re", rightEnd.cast("long"))
      .where(col("__re") >= col("__rs"))
      .withColumn("__rbkt", explode(sequence(
        floorDiv(col("__rs"), bucketWidth),
        floorDiv(col("__re"), bucketWidth))))
    l.join(r, l("__lbkt") === r("__rbkt") &&
        col("__ls") <= col("__re") && col("__rs") <= col("__le") &&
        l("__lbkt") ===
          floorDiv(greatest(col("__ls"), col("__rs")), bucketWidth))
      .drop("__ls", "__le", "__lbkt", "__rs", "__re", "__rbkt")
  }

  /** Per-key time-band join: pair each left row with the right rows
    * whose `rightTime` lies in `[leftTime + lowerMs, leftTime +
    * upperMs]` (bounds in milliseconds, inclusive; negative = before
    * the left event — e.g. lowerMs = -86400000, upperMs = 0 for "the
    * 24 h leading up to"). This is the common production case
    * (attribution, session stitching): the equi keys already bound
    * candidates per key, so the plan is an ordinary keyed hash /
    * sort-merge join with the band as a residual filter — one shuffle
    * per side, skew on a hot key handled like any other keyed join
    * (AQE split / salting). For the KEYLESS point-in-interval case
    * use [[joinPointsInIntervals]]; for continuous ingestion
    * `streaming.StreamJoin.intervalJoin` runs the SAME condition with
    * watermarks bounding join state.
    *
    * Key columns must be named distinctly across the two sides (both
    * sides of a self-join should rename) — the right key columns stay
    * in the output for null-inspection under outer join types.
    */
  def joinBand(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)], leftTime: String, rightTime: String,
      lowerMs: Long, upperMs: Long, joinType: String = "inner")
      : DataFrame = {
    require(lowerMs <= upperMs, s"empty band: [$lowerMs, $upperMs]")
    val cond = keys.map { case (lk, rk) => left(lk) === right(rk) }
      .reduce(_ && _) &&
      right(rightTime) >= left(leftTime) +
        expr(s"INTERVAL $lowerMs MILLISECOND") &&
      right(rightTime) <= left(leftTime) +
        expr(s"INTERVAL $upperMs MILLISECOND")
    left.join(right, cond, joinType)
  }
}
