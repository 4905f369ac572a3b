package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.llm.Similarity

class PqExprSuite extends SparkSpec {
  import spark.implicits._

  private def cbFor(dir: String) = Similarity.pqCodebooks(
    Tables.load(spark, dir, "embeddings"), m = 8, ks = 16)

  test("pq_codes / pq_dist_table bit-identical to the HOF forms") {
    val cb = cbFor(sf0001)
    val (m, ks, sub) = (8, 16, 8)
    val e = Tables.load(spark, sf0001, "embeddings").limit(200)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // HOF reference: the exact chain the native pass replaced —
    // bindOnce'd slices, sqdist folds, array_position-first-min.
    def hofCodes(vec: org.apache.spark.sql.Column) = array((0 until m).map { j =>
      ExprUtils.bindOnce(slice(vec, j * sub + 1, sub)) { sl =>
        ExprUtils.bindOnce(
          array((0 until ks).map(c =>
            Similarity.sqdist(sl, typedlit(cb(j)(c)))): _*)) {
          sc => (array_position(sc, array_min(sc)) - 1).cast("int") }
      }
    }: _*)
    def hofDt(vec: org.apache.spark.sql.Column) = array((for {
      j <- 0 until m; c <- 0 until ks
    } yield ExprUtils.bindOnce(slice(vec, j * sub + 1, sub))(sl =>
      Similarity.sqdist(sl, typedlit(cb(j)(c))))): _*)
    val native = e.select(col("vec_id"),
      PqExpr.pq_codes(col("v"), cb).as("codes"),
      PqExpr.pq_dist_table(col("v"), cb).as("dt"))
      .as[(Long, Seq[Int], Seq[Double])].collect()
      .map { case (id, cs, dt) => id -> ((cs, dt)) }.toMap
    val hof = e.select(col("vec_id"),
      hofCodes(col("v")).as("codes"), hofDt(col("v")).as("dt"))
      .as[(Long, Seq[Int], Seq[Double])].collect()
      .map { case (id, cs, dt) => id -> ((cs, dt)) }.toMap
    assert(native.keySet == hof.keySet)
    native.keySet.foreach { id =>
      assert(native(id)._1 == hof(id)._1, s"codes diverge for vec $id")
      // exact double equality — the left-to-right fold contract
      assert(native(id)._2 == hof(id)._2, s"dist table diverges for vec $id")
    }
  }

  test("width mismatch and null elements yield NULL, ties take lowest code") {
    val cb: Seq[Seq[Seq[Double]]] = // m=2, ks=2, sub=2; codes 0 and 1 equal
      Seq(Seq(Seq(1.0, 0.0), Seq(1.0, 0.0)), Seq(Seq(0.0, 0.0), Seq(2.0, 2.0)))
    val df = Seq(
      (1L, Some(Seq(1.0, 0.0, 0.0, 0.0))),   // valid width 4
      (2L, Some(Seq(1.0, 0.0))),             // wrong width → null
      (3L, None: Option[Seq[Double]])        // null vector → null
    ).toDF("id", "v").select(col("id"), col("v").cast("array<double>").as("v"))
    val out = df.select(col("id"), PqExpr.pq_codes(col("v"), cb).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Int](1))).toMap
    assert(out(1L).contains(Seq(0, 0))) // subspace 0: tie → code 0
    assert(out(2L).isEmpty && out(3L).isEmpty)
  }

  test("doGenCode compiles and matches eval (no silent fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val cb: Seq[Seq[Seq[Double]]] =
      Seq(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)), Seq(Seq(2.0, 2.0), Seq(3.0, 3.0)))
    val in = BoundReference(0, ArrayType(DoubleType, containsNull = true),
      nullable = true)
    for (expr <- Seq(PqCodesExpr(in, cb), PqDistTableExpr(in, cb))) {
      val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on bad code
      val vec = new GenericArrayData(Array(0.9, 0.9, 2.4, 2.4))
      val gen = proj(InternalRow(vec)).getArray(0)
      val ev = expr.eval(InternalRow(vec))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      assert(gen.numElements() == ev.numElements())
      (0 until gen.numElements()).foreach { i =>
        assert(gen.get(i, expr.dataType
          .asInstanceOf[ArrayType].elementType) ==
          ev.get(i, expr.dataType.asInstanceOf[ArrayType].elementType))
      }
      // wrong width → null through codegen too
      val bad = new GenericArrayData(Array(1.0, 2.0, 3.0))
      assert(proj(InternalRow(bad)).isNullAt(0))
      assert(proj(InternalRow(null)).isNullAt(0))
    }
  }
}
