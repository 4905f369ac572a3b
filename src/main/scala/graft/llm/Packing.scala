package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sequence packing — the standard pretraining "concat and split"
  * dataloader transform: per shard, consecutive documents' token
  * streams are concatenated and split into fixed-`ctxLen` training
  * sequences, so a document's tokens may straddle a sequence
  * boundary. Emits one SPAN row per (document × overlapped sequence):
  * the doc's token slice `[tok_start, tok_end)` lands at offset
  * `seq_off` of sequence `(shard, seq_no)` — the manifest a
  * dataloader needs, with no token ids materialized.
  *
  * Scale stance (100 TB): packing is a running sum over an ordered
  * stream, which cannot be both global and parallel — so the stream
  * is SHARDED: shard = stable md5 bucket of the doc id (the
  * [[Sampling.hashBucket]] lever — deterministic, SQL-reproducible,
  * incremental-friendly) and the cumulative-offset window runs PER
  * SHARD. One shuffle (by shard), `nShards`-way parallel — size
  * nShards to the cluster; only each shard's LAST sequence is ragged,
  * and the spans make raggedness explicit (`sum(tok_end − tok_start)
  * < ctxLen`). Fully deterministic: shard and within-shard order
  * (doc id) are pure functions of the input rows, so the same corpus
  * packs identically across runs, partitionings, and engines (the
  * whole pipeline is plain SQL — llm_pack carries a DuckDB oracle).
  */
object Packing {

  /** @param ctxLen  tokens per training sequence
    * @param nShards independent packing streams (pick ≈ cluster
    *                parallelism; sequences are per-shard)
    * Output: (shard, seq_no, idCol, tok_start, tok_end, seq_off),
    * one row per document × sequence it overlaps. Empty documents
    * (zero whitespace tokens) contribute nothing. */
  def packSequences(docs: DataFrame, ctxLen: Int, nShards: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(ctxLen >= 1, s"ctxLen=$ctxLen must be >= 1")
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    val counted = docs.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("shard",
        Sampling.hashBucket(col(idCol), nShards).cast("int"))
    // Explicit ROWS frame, not the default RANGE: with unique doc ids
    // the two coincide, but RANGE would give DUPLICATE ids identical
    // cumulative offsets — silently overlapping sequences, diverging
    // from the DuckDB oracle (which pins ROWS explicitly). ROWS keeps
    // the frame well-defined for any input.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // Exclusive prefix sum: the offset of the doc's first token in
    // its shard's concatenated stream.
    val offs = counted.withColumn("off",
      sum(col("n_tokens")).over(w) - col("n_tokens"))
    // One span per ctxLen-window the doc overlaps. The casts divide
    // non-negative longs, so truncation = floor; exact up to 2^53
    // tokens per shard (double mantissa) — far past any real shard.
    val firstSeq = (col("off") / ctxLen).cast("long")
    val lastSeq = ((col("off") + col("n_tokens") - 1) / ctxLen).cast("long")
    offs.select(col("shard"), col(idCol), col("n_tokens"), col("off"),
        explode(sequence(firstSeq, lastSeq)).as("seq_no"))
      .select(col("shard"), col("seq_no"), col(idCol),
        greatest(lit(0L), col("seq_no") * ctxLen - col("off"))
          .as("tok_start"),
        least(col("n_tokens"), (col("seq_no") + 1) * ctxLen - col("off"))
          .as("tok_end"),
        greatest(lit(0L), col("off") - col("seq_no") * ctxLen)
          .as("seq_off"))
  }

  final case class DocTokens(doc_id: Long, shard: Int, n_tokens: Long)
  final case class Span(shard: Int, seq_no: Long, doc_id: Long,
      tok_start: Long, tok_end: Long, seq_off: Long)

  /** Spans of one document given its first token's stream offset —
    * the same arithmetic as the batch operator's span projection. */
  private def spansOf(shard: Int, docId: Long, n: Long, off: Long,
      ctxLen: Int): Iterator[Span] = {
    val first = off / ctxLen
    val last = (off + n - 1) / ctxLen
    (first to last).iterator.map { k =>
      Span(shard, k, docId,
        math.max(0L, k * ctxLen - off),
        math.min(n, (k + 1) * ctxLen - off),
        math.max(0L, off - k * ctxLen))
    }
  }

  /** Per-shard packing state machine: the ONLY state is the shard's
    * running token offset (one long per shard — constant-size state
    * regardless of corpus size). Docs within a micro-batch pack in
    * doc-id order; batches pack in arrival order.
    *
    * Memory contract: only the DOC list (one small row per doc)
    * materializes; per-doc offsets are assigned in one eager pass so
    * the state updates before this returns, and the Span rows — which
    * outnumber docs and dominate bytes — stream out of a LAZY
    * iterator (an eager flatMap here held every span of the
    * micro-batch shard in one task's heap — review catch). */
  def packFn(ctxLen: Int)(shard: Int, docs: Iterator[DocTokens],
      state: GroupState[Long]): Iterator[Span] = {
    val sorted = docs.toSeq.sortBy(_.doc_id)
    var off = state.getOption.getOrElse(0L)
    val withOff = sorted.map { d =>
      val o = off; off += d.n_tokens; (d, o)
    }
    state.update(off)
    withOff.iterator.flatMap { case (d, o) =>
      spansOf(shard, d.doc_id, d.n_tokens, o, ctxLen)
    }
  }

  /** Streaming sequence packing — continuous ingestion is the real
    * deployment mode of a pretraining pipeline: documents arrive,
    * sequences leave. `flatMapGroupsWithState` keyed by shard carries
    * each shard's running token offset across micro-batches, so
    * sequence numbering continues seamlessly and every emitted span
    * is final (Append mode — no retraction, safe to sink anywhere).
    * Replaying a corpus in doc-id order reproduces the batch
    * manifest EXACTLY (StreamingPackingSuite parity test); under
    * arbitrary arrival order the invariants that matter to a trainer
    * — full fixed-size sequences, exact doc reassembly — still hold,
    * only the doc→sequence assignment differs.
    *
    * Scale: one shuffle by shard per micro-batch; state is nShards
    * longs total.
    *
    * The typed state machine needs an INTEGRAL doc id (`Span.doc_id`
    * is a long): the id column must be an integral or string TYPE
    * (checked up front — a fractional type would try_cast by
    * TRUNCATION, silently interleaving 7.2 and 7.9 as one doc 7 and
    * diverging from batch packSequences, which keys spans by the raw
    * id), and per row a NULL or non-castable id fails FAST with a
    * clear raise_error (silently nulling would crash the non-nullable
    * Long encoder mid-stream with an opaque message). The shard
    * hashes the CASTED long so id and shard always derive from the
    * same value — hashing the raw string while keying spans by the
    * cast would let non-canonical numerics ("07" vs "7") interleave
    * two docs' spans under one id. Consequence: replay parity with
    * the batch operator is guaranteed for integral-TYPED id columns
    * (the cast is then the identity); numeric strings shard by their
    * canonical form, and fractional STRINGS ("7.2") are rejected by
    * the row guard (BIGINT try_cast accepts only integral text). */
  def packSequencesStream(docs: DataFrame, ctxLen: Int, nShards: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): Dataset[Span] = {
    require(ctxLen >= 1, s"ctxLen=$ctxLen must be >= 1")
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    import org.apache.spark.sql.types._
    val idType = docs.schema(docs.schema.fieldIndex(idCol)).dataType
    val integralOrString =
      Seq(ByteType, ShortType, IntegerType, LongType, StringType)
    require(integralOrString.contains(idType),
      s"packSequencesStream needs an integral or string $idCol; got " +
        s"${idType.simpleString} — a fractional id would truncate and " +
        "merge distinct documents")
    implicit val docEnc = Encoders.product[DocTokens]
    implicit val spanEnc = Encoders.product[Span]
    implicit val stateEnc: org.apache.spark.sql.Encoder[Long] =
      Encoders.scalaLong
    // try_cast (not cast): ANSI mode would otherwise throw its own
    // CAST_INVALID_INPUT before this guard runs, and non-ANSI would
    // silently null — try_cast + raise_error gives the same clear
    // failure under either setting. The filter on n_tokens runs
    // BEFORE the guard projection, so a NULL/bad id on an empty doc
    // (which contributes nothing) never trips it.
    val cast = expr(s"try_cast($idCol AS BIGINT)")
    val docId = when(cast.isNull,
      raise_error(concat(lit(s"packSequencesStream needs an integral " +
        s"$idCol; got "), coalesce(col(idCol).cast("string"), lit("NULL")))))
      .otherwise(cast)
    val counted = docs
      .select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .select(docId.as("doc_id"), col("n_tokens"))
      .withColumn("shard",
        Sampling.hashBucket(col("doc_id"), nShards).cast("int"))
      .select("doc_id", "shard", "n_tokens")
      .as[DocTokens]
    counted.groupByKey(_.shard)(Encoders.scalaInt)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(packFn(ctxLen))
  }
}
