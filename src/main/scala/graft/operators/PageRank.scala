package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration damped PageRank — graph centrality over derived
  * document graphs (here: the near-dup similarity graph, where a high
  * score marks a duplication hub — a boilerplate template, a mirrored
  * page — worth downweighting or auditing; the soft complement of
  * [[graft.llm.Dedup.dedupClusters]]' hard component labels).
  *
  * Variant notes (both deliberate, both mirrored by the oracle):
  * fixed iteration count (not convergence-tested — a static unrolled
  * SQL oracle must be a pure function of the text), and NO
  * dangling-mass redistribution (the common "leaky" simplification;
  * dangling vertices keep the teleport term only). `resid = 1 −
  * damping` is computed ONCE here and interpolated into the oracle
  * text, so both engines use the bit-identical double (1 − 0.85 is
  * 0.15000000000000002 in IEEE — writing `0.15` in one engine and
  * computing `1 − d` in the other would diverge at full precision).
  *
  * Scale shape: per iteration, ONE keyed shuffle joins the rank
  * vector to the edge list on the source vertex (contributions
  * partial-aggregate per destination before their shuffle), plus a
  * broadcast one-row vertex count. Edges, degrees, and vertices are
  * lazily localCheckpointed ONCE and pre-partitioned on the join key,
  * so every iteration re-reads stored rows instead of re-deriving
  * the (potentially expensive — minhash!) edge lineage, and the
  * per-iteration join reuses the same layout. Rank frames checkpoint
  * per iteration — lineage stays one level deep, the CC-loop lesson.
  * No driver-side materialization anywhere; the whole loop is lazy
  * until the caller's action. */
object PageRank {

  /** `vertices(id)`, `edges(u, v)` directed (symmetrize upstream for
    * an undirected graph). Returns (id, rank) with Σrank ≤ 1 (leaky
    * variant); multiply by |V| for a mean-1 score. */
  def pageRank(vertices: DataFrame, edges: DataFrame, iters: Int,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val resid = 1.0 - damping
    val verts = vertices.select(col("id")).transform(graft.functions.ExprUtils.barrier)
    val e = edges.select(col("u"), col("v"))
      .repartition(col("u")).transform(graft.functions.ExprUtils.barrier)
    val deg = e.groupBy("u").agg(count(lit(1)).as("dg"))
      .transform(graft.functions.ExprUtils.barrier)
    val nAgg = verts.agg(count(lit(1)).cast("double").as("nv"))
    var ranks = verts.crossJoin(broadcast(nAgg))
      .select(col("id"), (lit(1.0) / col("nv")).as("rank"))
      .transform(graft.functions.ExprUtils.barrier)
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("id", "u"), Seq("u"))
        .join(deg, Seq("u"))
        .groupBy(col("v").as("id"))
        .agg(sum(col("rank") / col("dg")).as("m"))
      ranks = verts.crossJoin(broadcast(nAgg))
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(resid) / col("nv") +
            lit(damping) * coalesce(col("m"), lit(0.0))).as("rank"))
        .transform(graft.functions.ExprUtils.barrier)
    }
    ranks
  }

  /** The oracle-text constant for `resid` — same double both engines
    * (Scala Double.toString round-trips exactly through DuckDB's
    * parser). */
  def residLiteral(damping: Double): String = (1.0 - damping).toString
}
