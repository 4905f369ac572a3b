package graft.functions

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._

import graft.SparkSpec

object EvalCounter {
  val count = new AtomicLong(0)
}

class ExprUtilsSuite extends SparkSpec {
  import spark.implicits._

  test("bindOnce evaluates the bound expression once per row, not per reference") {
    EvalCounter.count.set(0)
    val counting = udf { (x: Long) =>
      EvalCounter.count.incrementAndGet(); x * 2
    }
    val df = spark.range(100).coalesce(1) // single partition, same JVM
    // body references the bound value 5 times
    val out = df.select(ExprUtils.bindOnce(counting(col("id"))) { v =>
      v + v + v + v + v
    }.as("r")).agg(sum("r")).head().getLong(0)
    assert(out == (0L until 100L).map(_ * 2 * 5).sum)
    val evals = EvalCounter.count.get
    assert(evals == 100, s"bound expr evaluated $evals times for 100 rows")

    // Control — the actual pathology: a reference INSIDE a
    // higher-order-function lambda is re-evaluated per element (no
    // CSE there, unlike plain projections which codegen does dedup).
    EvalCounter.count.set(0)
    val c = counting(col("id"))
    df.select(aggregate(sequence(lit(1), lit(5)), lit(0L),
      (acc, _) => acc + c).as("r")).agg(sum("r")).head()
    assert(EvalCounter.count.get == 500,
      s"control should evaluate 5×/row inside the lambda, got ${EvalCounter.count.get}")
    // ...and bindOnce fixes exactly that case:
    EvalCounter.count.set(0)
    df.select(ExprUtils.bindOnce(counting(col("id"))) { v =>
      aggregate(sequence(lit(1), lit(5)), lit(0L), (acc, _) => acc + v)
    }.as("r")).agg(sum("r")).head()
    assert(EvalCounter.count.get == 100,
      s"bindOnce inside HOF should evaluate once/row, got ${EvalCounter.count.get}")
  }

  test("bindOnce preserves null semantics of the body") {
    val df = Seq(Some(1L), None).toDF("x")
    val out = df.select(ExprUtils.bindOnce(col("x")) { v =>
      coalesce(v * 10, lit(-1L))
    }.as("r")).as[Long].collect().toSet
    assert(out == Set(10L, -1L))
  }
}
