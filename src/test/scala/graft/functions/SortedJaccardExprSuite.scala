package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SortedJaccardExprSuite extends SparkSpec {
  import spark.implicits._

  test("agrees with array_intersect/array_union on random distinct sets") {
    // Deterministic pseudo-random sets via xxhash64 — no Math.random.
    val pairs = spark.range(200).select(
      sort_array(array_distinct(transform(sequence(lit(0),
        pmod(xxhash64(col("id")), lit(60)).cast("int")),
        i => pmod(xxhash64(col("id"), i), lit(40))))).as("a"),
      sort_array(array_distinct(transform(sequence(lit(0),
        pmod(xxhash64(col("id"), lit(1)), lit(60)).cast("int")),
        i => pmod(xxhash64(col("id"), i, lit(1)), lit(40))))).as("b"))
    val both = pairs.select(
      SortedJaccardExpr.sorted_jaccard(col("a"), col("b")).as("merge"),
      (size(array_intersect(col("a"), col("b"))).cast("double") /
        size(array_union(col("a"), col("b")))).as("hashset"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (m, h) => assert(m == h, s"$m != $h") }
  }

  test("edge cases: disjoint, identical, subset, empties") {
    def j(a: Seq[Long], b: Seq[Long]): Option[Double] =
      Seq((a, b)).toDF("a", "b").select(
        SortedJaccardExpr.sorted_jaccard(col("a"), col("b")))
        .as[Option[Double]].head()
    assert(j(Seq(1L, 2L, 3L), Seq(4L, 5L)) == Some(0.0))
    assert(j(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == Some(1.0))
    assert(j(Seq(1L, 2L), Seq(1L, 2L, 3L, 4L)) == Some(0.5))
    assert(j(Seq(-5L, 1L), Seq(-5L, 7L)) == Some(1.0 / 3)) // negatives sort first
    assert(j(Nil, Seq(1L)) == Some(0.0))
    assert(j(Nil, Nil) == None) // 0/0 → null, like the SQL division
    // null input → null
    val viaNull = Seq((Seq(1L), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(SortedJaccardExpr.sorted_jaccard(col("a"), col("b")))
      .as[Option[Double]].head()
    assert(viaNull.isEmpty)
  }

  test("doGenCode compiles and matches eval (no silent fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val t = ArrayType(LongType, containsNull = false)
    val expr = SortedJaccardExpr(
      BoundReference(0, t, nullable = true),
      BoundReference(1, t, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on bad code
    def arr(xs: Long*) = new GenericArrayData(xs.toArray)
    val row = InternalRow(arr(1L, 3L, 5L), arr(3L, 5L, 7L, 9L))
    assert(proj(row).getDouble(0) == 2.0 / 5)
    assert(proj(row).getDouble(0) ==
      expr.eval(row).asInstanceOf[Double])
    // both-empty → null through GENERATED code too
    assert(proj(InternalRow(arr(), arr())).isNullAt(0))
    assert(proj(InternalRow(null, arr(1L))).isNullAt(0))
  }
}
