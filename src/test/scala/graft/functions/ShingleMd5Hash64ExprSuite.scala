package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.llm.TextAnalysis

class ShingleMd5Hash64ExprSuite extends SparkSpec {
  import spark.implicits._

  /** The HOF chain the native expression replaced (shingle strings via
    * element_at/concat_ws, then per-string md5-long). */
  private def hofChain(textCol: String, n: Int, distinct: Boolean) =
    graft.functions.ExprUtils.bindOnce(
      TextAnalysis.tokens(col(textCol))) { t =>
      val shingles0 = when(size(t) >= n,
        transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ",
            (0 until n).map(j => element_at(t, i + j + 1)): _*)))
        .otherwise(array().cast("array<string>"))
      val shingles = if (distinct) array_distinct(shingles0) else shingles0
      TokenMd5Hash64Expr.token_md5_hash64(shingles)
    }

  test("bit-identical to the concat_ws+md5 HOF chain on real documents") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").limit(200)
    for (distinct <- Seq(true, false)) {
      val native = docs.select(col("doc_id"),
        ShingleMd5Hash64Expr.shingle_md5_hash64(
          TextAnalysis.tokens(col("text")), 3, distinct).as("sh"))
        .as[(Long, Seq[Long])].collect().toMap
      val hof = docs.select(col("doc_id"),
        hofChain("text", 3, distinct).as("sh"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(native.keySet == hof.keySet)
      native.keySet.foreach { id =>
        assert(native(id) == hof(id), s"doc $id distinct=$distinct")
      }
    }
  }

  test("edge cases: under-width, exact-width, repeats, unicode") {
    val df = Seq(
      (1L, "one two"),           // 2 tokens < n=3 → empty
      (2L, "one two three"),     // exactly one shingle
      (3L, "a b c a b c a b c"), // repeats: distinct collapses, raw keeps
      (4L, ""),                  // empty text
      (5L, "héllo wörld 中文 done") // non-ascii survives lower+regex tokens
    ).toDF("doc_id", "text")
    for (distinct <- Seq(true, false)) {
      val native = df.select(col("doc_id"),
        ShingleMd5Hash64Expr.shingle_md5_hash64(
          TextAnalysis.tokens(col("text")), 3, distinct).as("sh"))
        .as[(Long, Seq[Long])].collect().toMap
      val hof = df.select(col("doc_id"),
        hofChain("text", 3, distinct).as("sh"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(native == hof, s"distinct=$distinct")
    }
    val raw = df.select(col("doc_id"),
      ShingleMd5Hash64Expr.shingle_md5_hash64(
        TextAnalysis.tokens(col("text")), 3, distinct = false).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(raw(1L).isEmpty && raw(4L).isEmpty)
    assert(raw(2L).size == 1)
    assert(raw(3L).size == 7) // positional: all 7 windows kept
    val ded = df.select(col("doc_id"),
      ShingleMd5Hash64Expr.shingle_md5_hash64(
        TextAnalysis.tokens(col("text")), 3, distinct = true).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(ded(3L).size == 3) // abc, bca, cab
  }

  test("null token elements are skipped like concat_ws skips them") {
    val df = Seq(1).toDF("i").select(
      array(lit("a"), lit(null).cast("string"), lit("b")).as("toks"))
    val native = df.select(ShingleMd5Hash64Expr.shingle_md5_hash64(
      col("toks"), 2, distinct = false).as("sh"))
      .as[Seq[Long]].head()
    val hof = df.select(TokenMd5Hash64Expr.token_md5_hash64(
      transform(sequence(lit(0), size(col("toks")) - 2),
        i => concat_ws(" ", element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2)))).as("sh"))
      .as[Seq[Long]].head()
    assert(native == hof) // ("a",null)→"a", (null,"b")→"b"
  }

  test("property: bit-identical to the HOF chain on random token arrays") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val tokGen = Gen.listOfN(12, Gen.oneOf(
      Gen.stringOfN(3, Gen.alphaNumChar),
      Gen.oneOf("", " ", "é中", "a_b", "0", "é", "longertoken99")))
    val rows = (0 until 150).map { i =>
      val toks = tokGen.apply(Gen.Parameters.default, Seed(31L + i)).get
        .take(i % 13) // vary length incl. 0 and < n
      (i.toLong, toks)
    }
    val df = rows.toDF("id", "toks")
    for (n <- Seq(2, 4); distinct <- Seq(true, false)) {
      val native = df.select(col("id"),
        ShingleMd5Hash64Expr.shingle_md5_hash64(col("toks"), n, distinct)
          .as("sh")).as[(Long, Seq[Long])].collect().toMap
      val sh0 = when(size(col("toks")) >= n,
        transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ",
            (0 until n).map(j => element_at(col("toks"), i + j + 1)): _*)))
        .otherwise(array().cast("array<string>"))
      val hof = df.select(col("id"), TokenMd5Hash64Expr.token_md5_hash64(
        if (distinct) array_distinct(sh0) else sh0).as("sh"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(native == hof, s"n=$n distinct=$distinct")
    }
  }

  test("doGenCode compiles and matches eval (no silent fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val expr = ShingleMd5Hash64Expr(
      BoundReference(0, ArrayType(StringType, containsNull = false),
        nullable = true), 2, distinct = true)
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
