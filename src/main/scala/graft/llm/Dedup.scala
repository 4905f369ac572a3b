package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact (hash-groupBy), n-gram Jaccard
  * (inverted-index join), MinHash+LSH (signature → band → bucket
  * join), SimHash (hamming bands), embedding-cosine near-dup.
  *
  * Scale stance (100 TB): nothing here compares all pairs. Exact dedup
  * is one hash-partitioned groupBy on a 32-byte key; Jaccard joins
  * only docs sharing a shingle, with a document-frequency cap to
  * bound hot-shingle skew; MinHash/SimHash bucket by band key so the
  * candidate join is per-bucket; embedding dedup blocks on a key.
  */
object Dedup {

  /** Exact dedup: group by content fingerprint; keep the min doc_id
    * (deterministic representative), count the copies. */
  def exact(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct shingle set per doc: (id, shingles array). */
  private def shingleSets(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      TextAnalysis.shingles(col(textCol), n).as("sh"))

  /** N-gram Jaccard near-dup pairs via inverted index:
    * explode shingles → drop shingles with document frequency >
    * `maxDf` (hot-key cap: a stopword-ish shingle shared by millions
    * of docs would otherwise create a quadratic join) → self-join per
    * shingle → count common → Jaccard from set sizes. Emits pairs
    * `id_a < id_b` with `jaccard >= threshold`. */
  def ngramJaccardPairs(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, threshold: Double = 0.6,
      maxDf: Int = 1000): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, n)
      .withColumn("sz", size(col("sh")))
    val inv = sets.select(col("id"), col("sz"), explode(col("sh")).as("s"))
    val capped = inv.withColumn("df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("s")))
      .where(col("df") <= maxDf)
    val a = capped.select(col("s"), col("id").as("id_a"), col("sz").as("sz_a"))
    val b = capped.select(col("s"), col("id").as("id_b"), col("sz").as("sz_b"))
    a.join(b, Seq("s"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard", round(
        col("common") / (col("sz_a") + col("sz_b") - col("common")), 4))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Deterministic MinHash parameters (seeded, reproducible). */
  private val P = 2147483647L // 2^31-1
  private def hashParams(k: Int, seed: Long): Seq[(Long, Long)] = {
    val r = new java.util.Random(seed)
    Seq.fill(k)((math.abs(r.nextLong()) % (P - 1) + 1,
      math.abs(r.nextLong()) % P))
  }

  /** MinHash signature as an array column: for each of `k` hash
    * functions, min over shingles of (a*h32(s)+b) mod P, where
    * h32 = xxhash64 folded to [0, P). Pure expression — computed in
    * the scan projection, no shuffle. Empty shingle set → NULL sig. */
  def minhashSignature(sh: Column, k: Int = 32, seed: Long = 42L): Column = {
    val params = hashParams(k, seed)
    val sigs = params.map { case (a, b) =>
      array_min(transform(sh, s =>
        pmod(lit(a) * pmod(xxhash64(s), lit(P)) + lit(b), lit(P))))
    }
    when(size(sh) > 0, array(sigs: _*)).otherwise(lit(null))
  }

  /** MinHash+LSH near-dup pairs: signature → `bands` band keys →
    * per-band bucket join for candidates → exact Jaccard verify.
    * Candidates are only pairs agreeing on a full band (standard LSH
    * guarantee), so the join is bucket-local — the scale path. */
  def minhashLshPairs(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.6, seed: Long = 42L): DataFrame = {
    val rows = k / bands
    val sets = shingleSets(df, idCol, textCol, n)
      .where(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), k, seed))
    val banded = sets.select(col("id"), col("sh"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        bnd => hash(concat_ws("_",
          (0 until rows).map(r =>
            element_at(col("sig"), (bnd * rows + r + 1).cast("int"))): _*),
          bnd))))
      .withColumnRenamed("col", "band_key")
      .withColumnRenamed("pos", "band")
    val l = banded.select(col("band"), col("band_key"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("band_key"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    val cand = l.join(r, Seq("band", "band_key"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash from token md5 bits: per token take the first 16
    * hex chars of md5 as a 64-bit value; each output bit is the sign
    * of the vote sum across tokens. Deterministic across runs and
    * engines (md5-based, not JVM-hash-based). */
  def simhash(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val bits = (0 until 64).map { j =>
      // bit j of md5-derived 64-bit token hash, voted across tokens
      val nibbleIdx = j / 4 + 1
      val bitInNibble = j % 4
      val vote = aggregate(toks, lit(0),
        (acc, t) => acc + when(
          (conv(substring(md5(t), nibbleIdx, 1), 16, 10).cast("int")
            .bitwiseAND(lit(1 << bitInNibble))) > 0, lit(1))
          .otherwise(lit(-1)))
      when(vote > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-dup pairs: band the 64-bit simhash into 4 16-bit
    * chunks; pairs agreeing on any chunk are candidates (guarantees
    * recall for hamming distance ≤ 3); verify hamming ≤ `maxHamming`. */
  def simhashPairs(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
      simhash(col(textCol)).as("sim"))
    val banded = sigs.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sim"), b * 16)
          .bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("col", "chunk")
      .withColumnRenamed("pos", "band")
    val l = banded.select(col("band"), col("chunk"), col("id").as("id_a"),
      col("sim").as("sim_a"))
    val r = banded.select(col("band"), col("chunk"), col("id").as("id_b"),
      col("sim").as("sim_b"))
    l.join(r, Seq("band", "chunk"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(
        col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
