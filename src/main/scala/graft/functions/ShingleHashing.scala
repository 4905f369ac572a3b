package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData

/** The one shingle-hash definition shared by every native expression
  * that consumes it ([[HashedShinglesExpr]], [[TopShingleFreqExpr]]):
  * per-token hash = `XXH64.hashUTF8String(t, 42)` — exactly Spark's
  * `xxhash64(col)`, with null elements hashing to the seed the way
  * hash expressions skip null children — and an n-token shingle hash
  * left-folds `XXH64.hashLong` from seed 42 the way the variadic
  * `xxhash64(h1..hn)` does. Any change to seed or null stance lands
  * here once, not per expression.
  */
private[functions] object ShingleHashing {
  final val Seed = 42L

  /** Hash every token of the array (null element → seed). */
  def hashTokens(tokens: ArrayData): Array[Long] = {
    val cnt = tokens.numElements()
    val th = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      val t = tokens.getUTF8String(i)
      th(i) = if (t == null) Seed else XXH64.hashUTF8String(t, Seed)
      i += 1
    }
    th
  }

  /** Hash of the n-token shingle starting at `i`. */
  def shingleHash(th: Array[Long], i: Int, n: Int): Long = {
    var h = Seed
    var j = 0
    while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
    h
  }
}
