package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.llm.Similarity

class HyperplaneSigsExprSuite extends SparkSpec {
  import spark.implicits._

  test("bit-identical to per-table lshSignature HOF calls on real embeddings") {
    val e = Tables.load(spark, sf0001, "embeddings").limit(200)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val (nBits, nTables, seed) = (8, 4, 42L)
    val native = e.select(col("vec_id"),
      HyperplaneSigsExpr.hyperplane_sigs(col("v"), nBits, nTables, seed)
        .as("sigs"))
      .as[(Long, Seq[Long])].collect().toMap
    val hof = e.select(col("vec_id"),
      array((0 until nTables).map(t =>
        Similarity.lshSignature(col("v"), nBits, seed + t)): _*).as("sigs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native.keySet == hof.keySet)
    native.keySet.foreach { id =>
      assert(native(id) == hof(id), s"vec $id")
    }
  }

  test("edge vectors: zero vector collides everywhere, sign boundaries hold") {
    val df = Seq(
      (1L, Seq.fill(16)(0.0)),              // zero vector → all sigs 0
      (2L, Seq.fill(16)(0.0)),              // ...so 1 and 2 collide
      (3L, (0 until 16).map(_.toDouble)),   // arbitrary
      (4L, (0 until 16).map(i => -i.toDouble)) // negated → complement-ish
    ).toDF("vec_id", "v")
    val out = df.select(col("vec_id"),
      HyperplaneSigsExpr.hyperplane_sigs(col("v"), 12, 4).as("sigs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L).forall(_ == 0L) && out(1L) == out(2L))
    val hof = df.select(col("vec_id"),
      array((0 until 4).map(t =>
        Similarity.lshSignature(col("v"), 12, 42L + t)): _*).as("sigs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out == hof)
  }

  test("property: matches HOF on random vectors incl. NaN/Inf/extremes") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vGen = Gen.listOfN(24, Gen.oneOf(
      Gen.choose(-1.0, 1.0),
      Gen.oneOf(0.0, -0.0, 1e300, -1e300, 1e-300,
        Double.NaN, Double.PositiveInfinity)))
    val rows = (0 until 120).map { i =>
      (i.toLong, vGen.apply(Gen.Parameters.default, Seed(7L + i)).get
        .take(4 + i % 21)) // widths 4..24
    }
    val df = rows.toDF("id", "v")
    val native = df.select(col("id"),
      HyperplaneSigsExpr.hyperplane_sigs(col("v"), 6, 3, 99L).as("sigs"))
      .as[(Long, Seq[Long])].collect().toMap
    val hof = df.select(col("id"),
      array((0 until 3).map(t =>
        Similarity.lshSignature(col("v"), 6, 99L + t)): _*).as("sigs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == hof)
  }

  test("null vector element yields all-zero signatures like the HOF form") {
    val df = Seq(1).toDF("i").select(
      array(lit(1.0), lit(null).cast("double"), lit(-2.0)).as("v"))
    val native = df.select(
      HyperplaneSigsExpr.hyperplane_sigs(col("v"), 8, 3).as("sigs"))
      .as[Seq[Long]].head()
    assert(native == Seq(0L, 0L, 0L))
    val hof = df.select(array((0 until 3).map(t =>
      Similarity.lshSignature(col("v"), 8, 42L + t)): _*).as("sigs"))
      .as[Seq[Long]].head()
    assert(native == hof)
  }

  test("doGenCode compiles and matches eval (no silent fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val expr = HyperplaneSigsExpr(
      BoundReference(0, ArrayType(DoubleType, containsNull = false),
        nullable = true), 8, 3, 42L)
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on bad code
    val in = new GenericArrayData(Array(1.0, -2.0, 3.5, 0.0))
    val viaGen = proj(InternalRow(in)).getArray(0).toLongArray.toSeq
    val viaEval = expr.eval(InternalRow(in))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq
    assert(viaGen == viaEval && viaGen.size == 3)
    assert(proj(InternalRow(null)).isNullAt(0))
  }
}
