package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSuite extends SparkSpec {
  import spark.implicits._

  private def pts(ps: Long*) =
    ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("pid", "pos")
  private def ivs(ranges: (Long, Long)*) =
    ranges.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      .toDF("iid", "s", "e")

  private def joined(points: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame, w: Long) =
    RangeJoin.joinPointsInIntervals(points, intervals,
      col("pos"), col("s"), col("e"), w)

  test("matches the naive cross-join filter exactly (incl. negatives, " +
      "multi-bucket intervals, inclusive bounds)") {
    val p = pts(-15L, -7L, -1L, 0L, 3L, 6L, 7L, 13L, 20L, 100L)
    val i = ivs((-10L, -2L), (0L, 6L), (6L, 6L), (5L, 25L), (30L, 40L),
      (-20L, 50L))
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val got = joined(p, i, w).select("pid", "iid")
        .as[(Long, Long)].collect().sorted.toSeq
      val want = p.crossJoin(i)
        .where(col("pos") >= col("s") && col("pos") <= col("e"))
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"bucketWidth=$w")
      // exactly-once: no duplicate (point, interval) pairs
      assert(got.distinct == got, s"bucketWidth=$w emits duplicates")
    }
  }

  test("empty (end < start) intervals and null positions never match") {
    val p = pts(5L).unionByName(
      Seq((99L, Option.empty[Long])).toDF("pid", "pos"))
    val i = ivs((10L, 2L), (0L, 9L))
    val got = joined(p, i, 4L).select("pid", "iid")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L)))
  }

  test("interval overlap matches the naive cross-join filter exactly — " +
      "multi-bucket overlaps emit once (canonical bucket)") {
    val li = ivs((-10L, -2L), (0L, 6L), (5L, 25L), (-20L, 50L), (8L, 9L))
      .withColumnRenamed("iid", "lid")
    val ri = ivs((-5L, 3L), (6L, 6L), (0L, 40L), (26L, 30L), (60L, 70L))
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val got = RangeJoin.joinOverlappingIntervals(
          li.withColumnRenamed("s", "a").withColumnRenamed("e", "b"),
          ri, col("a"), col("b"), col("s"), col("e"), w)
        .select("lid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val want = li.withColumnRenamed("s", "a").withColumnRenamed("e", "b")
        .crossJoin(ri)
        .where(col("a") <= col("e") && col("s") <= col("b"))
        .select("lid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"bucketWidth=$w")
      assert(got.distinct == got, s"bucketWidth=$w emits duplicates")
    }
  }

  test("plans an equi hash join on the bucket key, never a nested loop") {
    val p = pts(0L, 5L, 10L)
    val i = ivs((0L, 4L), (5L, 9L))
    val plan = joined(p, i, 5L).queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    assert(!plan.contains("CartesianProduct"), plan.take(600))
  }
}
