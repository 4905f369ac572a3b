package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Dedup

class SimHash64ExprSuite extends SparkSpec {
  import spark.implicits._

  test("native simhash matches the functions._ reference implementation") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "spark structured streaming with catalyst",
      "x")
      .zipWithIndex.map(_.swap).toDF("id", "text")
    val hs = Dedup.tokenHashes64(Dedup.tokenMd5s(col("text")))
    val out = docs.select(col("id"),
      SimHash64Expr.simhash64(hs).as("native"),
      graft.functions.ExprUtils.bindOnce(hs)(h =>
        Dedup.simhashFromHashes(h)).as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"id ${r.getInt(0)}")
    }
  }
}
