package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the standard pretraining hygiene pass:
  * drop (or flag) training documents that share enough winnowing
  * fingerprints with an evaluation/benchmark set that they likely
  * contain benchmark passages. Fingerprint overlap catches verbatim
  * and lightly-edited contamination that exact-dedup misses, because
  * the winnowing guarantee makes any sufficiently long shared passage
  * yield shared fingerprints ([[TextAnalysis.winnowFingerprints]]).
  *
  * Scale stance (100 TB): the benchmark side is small by definition
  * (eval sets are MBs against a multi-TB corpus), so its distinct
  * fingerprint set is BROADCAST — the corpus side is a map-only
  * fingerprint explode + broadcast-hash semi-join + one groupBy on
  * doc id. The corpus is never shuffled with payloads, only
  * (doc_id, fp) longs reach the aggregate.
  */
object Decontaminate {

  /** Contaminated docs: (`idCol`, n_shared) for every training doc
    * sharing at least `minShared` distinct winnow fingerprints with
    * ANY benchmark document. The id column keeps the caller's name —
    * the output joins back against the caller's frame without a
    * rename. */
  def contaminated(docs: DataFrame, benchmark: DataFrame,
      k: Int = 4, w: Int = 4, minShared: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // explode_outer + null test on the GENERATED column: plain
    // explode's implicit size/notnull filter re-runs the winnow pass
    // below the exchange (the shingleInv lesson in Dedup)
    val benchFps = benchmark
      .select(explode_outer(
        TextAnalysis.winnowFingerprints(col(textCol), k, w)).as("fp"))
      .where(col("fp").isNotNull)
      .distinct()
    val docFps = docs.select(col(idCol),
      explode_outer(TextAnalysis.winnowFingerprints(col(textCol), k, w))
        .as("fp"))
      .where(col("fp").isNotNull)
    // per-doc fingerprints are already distinct (winnowing dedups), so
    // a plain count after the semi-join is the distinct-overlap count
    docFps.join(broadcast(benchFps), Seq("fp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** [[contaminated]] with a BLOOM pre-filter — the benchmark-set
    * scale remedy, output BYTE-IDENTICAL to the exact path (shares
    * its DuckDB oracle): [[contaminated]] broadcasts the benchmark's
    * full distinct-fingerprint set (8 bytes/fp plus hash-set
    * overhead) to every task; when the "benchmark" is itself large —
    * a heldout split, a multi-benchmark union, a customer
    * deny-list — that broadcast becomes the bottleneck. Here the
    * fingerprint set is folded ONCE into a Bloom filter (Spark's own
    * `BloomFilterAggregate`, ~10 bits/item at the default 3 % FPP)
    * which rides the task binary as a LITERAL; the corpus side drops
    * ~all rows MAP-SIDE through `BloomFilterMightContain` (codegen'd,
    * no-false-negative), and only the surviving candidates — true
    * hits plus the FPP sliver — pay the exact join that restores
    * exactness. False positives die in the exact join; false
    * negatives are impossible; ergo output ≡ [[contaminated]]
    * (suite-pinned at both SFs, and `llm_decontaminate_bloom` runs
    * the SAME oracle text as `llm_decontaminate`).
    *
    * The exactness join carries NO broadcast hint (round-12 ADVICE:
    * hinting `benchFps` would re-broadcast the very set the bloom
    * exists to avoid shipping) — after the map-side cull the
    * SURVIVING corpus side is the small relation, so AQE broadcasts
    * that side in the large-benchmark regime and either side at
    * fixture scale; both produce identical rows. The bloom's win is
    * the map-side probe reduction plus freeing the join's build side
    * to be whichever relation is actually smaller.
    *
    * Driver-side materialization: one count + one bloom binary
    * (benchmark-bounded — the dropHotKeys-style documented collect).
    * The bloom literal makes query construction eager on the
    * BENCHMARK side only (the bpe_train construction contract). */
  def contaminatedBloom(docs: DataFrame, benchmark: DataFrame,
      k: Int = 4, w: Int = 4, minShared: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    val benchFps = benchmark
      .select(explode_outer(
        TextAnalysis.winnowFingerprints(col(textCol), k, w)).as("fp"))
      .where(col("fp").isNotNull)
      .distinct()
    val nBench = math.max(benchFps.count(), 1L)
    val bloomBytes = benchFps.agg(ColumnBridge.column(
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(ColumnBridge.expression(col("fp")), nBench)
          .toAggregateExpression()).as("bloom"))
      .head().getAs[Array[Byte]]("bloom")
    val mightContain = ColumnBridge.column(new BloomFilterMightContain(
      Literal.create(bloomBytes,
        org.apache.spark.sql.types.BinaryType),
      ColumnBridge.expression(col("fp"))))
    val docFps = docs.select(col(idCol),
      explode_outer(TextAnalysis.winnowFingerprints(col(textCol), k, w))
        .as("fp"))
      .where(col("fp").isNotNull)
      .where(mightContain) // map-side: ~all corpus rows die here
    docFps.join(benchFps, Seq("fp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Benchmark-side contamination REPORT — the transpose of
    * [[contaminated]]: for every benchmark document, how many
    * training docs share at least `minShared` distinct winnow
    * fingerprints WITH THAT benchmark doc (`n_docs`), and the total
    * shared-fingerprint mass across them (`n_fp_shared`). This is the
    * eval-integrity view a lab actually reports: "which benchmark
    * items leaked into the corpus, and how badly" — per-item, so a
    * contaminated eval subset can be excluded or the eval re-split.
    *
    * Same scale shape as [[contaminated]]: the benchmark (bench_id,
    * fp) set broadcasts, the corpus contributes map-only exploded
    * (doc_id, fp) longs, and the per-(bench, doc) overlap count is a
    * partial-aggregated groupBy — a corpus fp shared with two
    * benchmark docs counts toward both, which per-item attribution
    * requires. Output: (bench_id, n_docs, n_fp_shared). */
  def contaminationReport(docs: DataFrame, benchmark: DataFrame,
      k: Int = 4, w: Int = 4, minShared: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val benchFps = benchmark
      .select(col(idCol).as("bench_id"), explode_outer(
        TextAnalysis.winnowFingerprints(col(textCol), k, w)).as("fp"))
      .where(col("fp").isNotNull)
    val docFps = docs.select(col(idCol),
      explode_outer(TextAnalysis.winnowFingerprints(col(textCol), k, w))
        .as("fp"))
      .where(col("fp").isNotNull)
    docFps.join(broadcast(benchFps), Seq("fp"))
      .groupBy(col("bench_id"), col(idCol))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .groupBy("bench_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_shared").as("n_fp_shared"))
  }

  /** The clean corpus: `docs` minus contaminated rows.
    *
    * `flagFrom` (optional) is the frame the contamination flags are
    * computed OVER; it defaults to `docs` itself. Contamination is a
    * per-document predicate on (`idCol`, `textCol`), and the anti-join
    * ignores flags on ids absent from `docs` — so any frame whose rows
    * are a SUPERSET of `docs`' (same text per id, `idCol` unique)
    * yields row-identical output (suite-pinned). Composed pipelines
    * should pass their RAW source here: when `docs` is the tail of an
    * expensive lineage (dedup aggregates shuffle the full corpus
    * text), flagging from the raw scan turns the flag subquery into
    * scan + map-only winnow + broadcast semi-join and drops the
    * lineage's second evaluation — at 100 TB that is one fewer
    * full-corpus text shuffle, bought with map-only winnow work on
    * rows the lineage would have filtered (duplicate-id inputs would
    * inflate `n_shared` across rows, so keep ids unique). */
  def clean(docs: DataFrame, benchmark: DataFrame,
      k: Int = 4, w: Int = 4, minShared: Int = 2,
      idCol: String = "doc_id", textCol: String = "text",
      flagFrom: Option[DataFrame] = None,
      bloom: Boolean = false): DataFrame = {
    // `bloom = true` swaps the flag stage for [[contaminatedBloom]] —
    // the large-benchmark regime; flags (and therefore output) are
    // byte-identical by that method's exactness contract
    // (suite-pinned), so the choice is purely a cost-model knob.
    val flag =
      if (bloom) contaminatedBloom(flagFrom.getOrElse(docs), benchmark,
        k, w, minShared, idCol, textCol)
      else contaminated(flagFrom.getOrElse(docs), benchmark, k, w,
        minShared, idCol, textCol)
    docs.join(flag.select(idCol), Seq(idCol), "left_anti")
  }

  /** Span-based decontamination — cut, don't drop: excise the
    * benchmark-contaminated PASSAGES from each document and keep its
    * clean remainder, instead of [[clean]]'s whole-document drop.
    * This is what production pipelines run to avoid over-dropping a
    * long document for one quoted eval question.
    *
    * Two-stage composition of the existing machinery, cheap-to-
    * precise:
    *  1. FLAG with the winnow-fingerprint overlap ([[contaminated]] —
    *     map-only winnow + broadcast semi-join): candidate docs are a
    *     tiny fraction of the corpus. The winnowing guarantee makes
    *     this pre-filter sound for the spans stage: any shared run of
    *     ≥ `minTokens` ≥ 2·(k+w−1) tokens selects ≥ `minShared`=2
    *     identical interior fingerprints, so no doc with a cuttable
    *     span escapes the flag.
    *  2. LOCATE on flagged docs only with positional k-gram spans
    *     against the benchmark ([[Dedup.duplicateSpansAgainst]] —
    *     the benchmark side is small by definition), then
    *     [[Dedup.cutSpans]] removes the matched token ranges.
    *
    * Output = [[Dedup.cutSpans]]'s shape over the WHOLE corpus:
    * (idCol, text_cut, n_removed) — unflagged docs pass through as
    * their token reconstruction with n_removed 0; a benchmark doc
    * present verbatim in the corpus is cut to empty. `spanK`/
    * `minTokens` bound the cut granularity: runs shorter than
    * `minTokens` canonical tokens are below the excision threshold
    * (and below what the flag stage reliably sees). */
  def cutContaminated(docs: DataFrame, benchmark: DataFrame,
      k: Int = 4, w: Int = 4, minShared: Int = 2, spanK: Int = 8,
      minTokens: Int = 16, maxDf: Int = 1000,
      idCol: String = "doc_id", textCol: String = "text",
      bloom: Boolean = false): DataFrame = {
    // bloom = true swaps the flag stage for [[contaminatedBloom]]
    // (flags byte-identical by its exactness contract, so the cut
    // output is too — suite-pinned); the span-locate stage is
    // unaffected either way.
    val flag =
      if (bloom) contaminatedBloom(docs, benchmark, k, w, minShared,
        idCol, textCol)
      else contaminated(docs, benchmark, k, w, minShared, idCol, textCol)
    val flagged = docs.join(flag.select(idCol), Seq(idCol), "left_semi")
    val spans = Dedup.duplicateSpansAgainst(flagged, benchmark,
      idCol, textCol, spanK, minTokens, maxDf)
    Dedup.cutSpans(docs, spans, idCol, textCol)
  }

  /** Streaming-friendly clean: the SAME contamination predicate as a
    * PER-ROW decision. The benchmark's distinct fingerprint set folds
    * into ONE single-row array (eval sets are MBs against a multi-TB
    * corpus by definition) broadcast to every task; each doc
    * intersects its own winnow fingerprints with it map-side. No
    * stream-side join state, no aggregation, no watermark — the pass
    * composes into an append-mode streaming query unchanged. Per-doc
    * winnow fingerprints are distinct, so the intersect size equals
    * [[clean]]'s distinct-overlap count: output is row-identical
    * (suite-pinned) — PROVIDED `idCol` is unique per row, its
    * position in the pipeline (after exact dedup). With duplicate
    * ids, [[clean]] aggregates overlap ACROSS the id's rows before
    * the anti-join while this decides per row — a doc split across
    * two rows with 1 shared fingerprint each is dropped by batch
    * (1+1 ≥ minShared) but kept here. Null/short texts yield a NULL
    * fingerprint array, which is coalesced to empty below — a doc
    * with no fingerprints can't be contaminated, and [[clean]]'s
    * anti-join likewise keeps it (a bare NULL would make the WHERE
    * three-valued and silently DROP the row). Batch callers should
    * prefer [[clean]] — the exploded broadcast-hash semi-join keeps
    * the per-row work proportional to MATCHES, not to the benchmark
    * set size. */
  def cleanStreaming(docs: DataFrame, benchmark: DataFrame,
      k: Int = 4, w: Int = 4, minShared: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val benchSet = benchmark
      .select(explode(TextAnalysis.winnowFingerprints(col(textCol), k, w))
        .as("fp"))
      .agg(collect_set(col("fp")).as("bench_fps"))
    docs.crossJoin(broadcast(benchSet))
      .where(size(array_intersect(
        coalesce(TextAnalysis.winnowFingerprints(col(textCol), k, w),
          array()),
        col("bench_fps"))) < minShared)
      .drop("bench_fps")
  }
}
