package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.llm.{Dedup, TextAnalysis}

class HashedShinglesExprSuite extends SparkSpec {
  import spark.implicits._

  test("bit-identical to the xxhash64 HOF chain on real documents") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").limit(200)
    val native = docs.select(col("doc_id"),
      HashedShinglesExpr.hashed_shingles(
        TextAnalysis.tokens(col("text")), 3).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    val hof = Dedup.shingleSetsHof(docs, "doc_id", "text", 3)
      .as[(Long, Seq[Long])].collect().toMap
    assert(native.keySet == hof.keySet)
    native.keySet.foreach { id =>
      assert(native(id) == hof(id), s"doc $id") // values AND order
    }
  }

  test("edge cases: under-width, exact-width, repeats deduped") {
    val df = Seq(
      (1L, "one two"),         // 2 tokens < n=3 → empty
      (2L, "one two three"),   // exactly one shingle
      (3L, "a b c a b c a b c")// repeated shingles collapse
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      HashedShinglesExpr.hashed_shingles(
        TextAnalysis.tokens(col("text")), 3).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L).isEmpty)
    assert(out(2L).size == 1)
    assert(out(3L).size == 3) // abc, bca, cab
    val hof = Dedup.shingleSetsHof(df, "doc_id", "text", 3)
      .as[(Long, Seq[Long])].collect().toMap
    assert(out == hof)
  }

  test("null token elements hash as the seed, matching xxhash64(null)") {
    val df = Seq(1).toDF("i").select(
      array(lit("a"), lit(null).cast("string"), lit("b")).as("toks"))
    val native = df.select(
      HashedShinglesExpr.hashed_shingles(col("toks"), 2).as("sh"))
      .as[Seq[Long]].head()
    val th = transform(col("toks"), t => xxhash64(t)) // null → seed 42
    val hof = df.select(array_distinct(transform(
      sequence(lit(0), size(th) - 2),
      i => xxhash64(element_at(th, i + 1),
        element_at(th, i + 2)))).as("sh"))
      .as[Seq[Long]].head()
    assert(native == hof) // no NPE, same values
  }

  test("TopShingleFreqExpr: counts agree with string n-grams; codegen compiles") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val expr = TopShingleFreqExpr(
      BoundReference(0, ArrayType(StringType, containsNull = false),
        nullable = true), 2)
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on bad code
    def frac(tokens: String*): Double = {
      val in = new GenericArrayData(tokens.map(UTF8String.fromString).toArray)
      val gen = proj(InternalRow(in)).getDouble(0)
      assert(gen == expr.eval(InternalRow(in)).asInstanceOf[Double])
      gen
    }
    assert(frac("a", "b", "a", "b", "a") == 0.5)   // "a b" 2 of 4
    assert(frac("x", "x", "x") == 1.0)             // "x x" both
    assert(frac("a") == 0.0)                       // under width
    assert(frac("a", "b", "c", "d") == 1.0 / 3)    // 3 bigrams, all distinct
    assert(proj(InternalRow(null)).isNullAt(0))
  }

  test("doGenCode compiles and matches eval (no silent fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val expr = HashedShinglesExpr(
      BoundReference(0, ArrayType(StringType, containsNull = false),
        nullable = true), 2)
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on bad code
    val in = new GenericArrayData(
      Array("a", "b", "c").map(UTF8String.fromString))
    val viaGen = proj(InternalRow(in)).getArray(0).toLongArray.toSeq
    val viaEval = expr.eval(InternalRow(in))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq
    assert(viaGen == viaEval && viaGen.size == 2)
    assert(proj(InternalRow(null)).isNullAt(0))
  }
}
