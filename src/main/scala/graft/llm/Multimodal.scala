package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns
  * with typed metadata. The Spark-side plumbing — schema, partition
  * iteration, batch shape — is real; the codec itself is STUBBED with
  * a deterministic fake (image/audio libraries are not in this
  * container). Swap `decodeStub` for a real decoder (JNI/FFI or a
  * Python `mapInPandas` worker in PySpark deployments) without
  * touching the plumbing.
  */
object Multimodal {

  /** Metadata produced by the (stubbed) media decoder. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  // ========================= STUB =========================
  // Deterministic fake decode: metadata derived ONLY from blob length,
  // so the DuckDB oracle can reproduce it (octet_length arithmetic).
  // A real implementation parses the container header instead.
  private def decodeStub(bytes: Array[Byte]): (Long, Int, Int, Int) = {
    val n = bytes.length.toLong
    (n, (64 + n % 1856).toInt, (64 + (n * 7) % 1016).toInt,
      (1 + n % 240).toInt)
  }
  // ========================================================

  /** Decode a binary media column into typed metadata via partition
    * iteration (the Scala analog of `mapInPandas`: one pass per
    * partition, row batches streamed, no driver collection). Input
    * needs columns (`idCol`, `mediaCol: binary`). */
  def extractMeta(df: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media"): DataFrame = {
    val outSchema = StructType(
      StructField("id", LongType) +: mediaMetaSchema.fields.toIndexedSeq)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val in = df.select(col(idCol).cast("long"), col(mediaCol))
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (n, w, h, f) =
          if (bytes == null) (0L, 0, 0, 0) else decodeStub(bytes)
        Row(id, n, w, h, f)
      }
    }(enc).toDF("id", "n_bytes", "width", "height", "n_frames")
  }

  /** Deterministic frame sampling plan: every `stride`-th frame index
    * up to `n_frames` — the shape of a video pre-processing stage
    * (decode happens downstream per sampled frame). */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    // frame-less media (n_frames = 0, e.g. null blobs) yields NO rows
    // — the old greatest(n-1, 0) clamp emitted a phantom frame_idx 0
    // that a downstream per-frame decode would choke on, and diverged
    // from the oracle's (n_frames-1)//stride + 1 = 0
    meta.where(col("n_frames") > 0)
      .select(col("id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1,
          lit(stride))).as("frame_idx"))

  /** "Resize" planning: target dims preserving aspect ratio against a
    * max edge — pure arithmetic on metadata (the real pixel work is
    * the stubbed decoder's job). */
  def resizePlan(meta: DataFrame, maxEdge: Int): DataFrame = {
    val scale = least(
      lit(maxEdge.toDouble) / greatest(col("width"), lit(1)),
      lit(maxEdge.toDouble) / greatest(col("height"), lit(1)),
      lit(1.0))
    meta.select(col("id"), col("width"), col("height"),
      floor(col("width") * scale).cast("int").as("target_w"),
      floor(col("height") * scale).cast("int").as("target_h"))
  }
}
