package graft.pipeline

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

final case class WireSite(id: String, kind: String)

/** The demo record for the binary ingest path — same shape as the
  * JSON throughput demo (id, site{id,kind}, score, flag). */
final case class WireRecord(id: Long, site: WireSite, score: Double,
    flag: Boolean)

/** Hand-rolled length-prefixed binary wire codec — the stand-in for a
  * user's generated protobuf parser at the pluggable `unmarshalFunc`
  * boundary (/root/reference/proto.go:33,106-172; the reference never
  * assumes a wire format either, it takes the user's unmarshal fn).
  *
  * Layout (all multi-byte values big-endian / network order):
  * ```
  *   bytes 1-8    id          int64
  *   bytes 9-10   len(site.id)  uint16
  *   ...          site.id       UTF-8
  *   2 bytes      len(site.kind) uint16
  *   ...          site.kind      UTF-8
  *   8 bytes      score          IEEE-754 bits
  *   1 byte       flag           0/1
  * ```
  *
  * Two decoders, same semantics:
  *  - [[decode]] — imperative `Array[Byte] => DecodeResult`, plugged
  *    through `Decoders.typed` (the reference-parity boundary; pays
  *    the object round-trip of the typed mapPartitions).
  *  - [[decodeColumnar]] — the Spark-first path: the whole parse is
  *    ONE native codegen'd expression ([[WireParseExpr]]) fused into
  *    the scan's whole-stage-codegen span with no typed boundary at
  *    all, reading fields straight off the byte array. (The round-2
  *    version built the parse from `substr`/`hex`/`conv` chains —
  *    codegen'd but materializing a hex string and parsing it back
  *    per field, ~9 round-trips per record; same lesson as
  *    `TokenMd5Hash64Expr`, SCALE.md round-3 lesson 3.) The six field
  *    extractions over the one parse struct are deduplicated by
  *    codegen subexpression elimination (top-level projection — not
  *    the HOF lambda trap from SCALE.md).
  */
object WireCodec {

  def encode(r: WireRecord): Array[Byte] = {
    val sid = r.site.id.getBytes(UTF_8)
    val kind = r.site.kind.getBytes(UTF_8)
    val buf = ByteBuffer.allocate(8 + 2 + sid.length + 2 + kind.length + 8 + 1)
    buf.putLong(r.id)
    buf.putShort(sid.length.toShort)
    buf.put(sid)
    buf.putShort(kind.length.toShort)
    buf.put(kind)
    buf.putDouble(r.score)
    buf.put(if (r.flag) 1.toByte else 0.toByte)
    buf.array()
  }

  /** Typed decoder: truncated / trailing-garbage payloads route to the
    * dead letter frame (decode-error parity, proto.go:133-145). */
  val decode: Array[Byte] => DecodeResult[WireRecord] = { bytes =>
    if (bytes == null) DecodeResult.Failed("null message value")
    else try {
      val buf = ByteBuffer.wrap(bytes)
      val id = buf.getLong()
      val sid = new Array[Byte](buf.getShort() & 0xFFFF)
      buf.get(sid)
      val kind = new Array[Byte](buf.getShort() & 0xFFFF)
      buf.get(kind)
      val score = buf.getDouble()
      val flag = buf.get() == 1
      // strict UTF-8 (the proto readers' round-13 rule): silently
      // repairing invalid bytes here while the columnar path keeps
      // the raw slice would make the two decoders disagree on
      // accepted rows — both reject instead
      val sidS = UTF8String.fromBytes(sid)
      val kindS = UTF8String.fromBytes(kind)
      if (buf.hasRemaining) DecodeResult.Failed("trailing bytes")
      else if (!sidS.isValid || !kindS.isValid)
        DecodeResult.Failed("invalid UTF-8 in string field")
      else DecodeResult.Ok(WireRecord(id,
        WireSite(sidS.toString, kindS.toString), score, flag))
    } catch {
      case _: java.nio.BufferUnderflowException =>
        DecodeResult.Failed(s"truncated wire record (${bytes.length} bytes)")
    }
  }

  /** Columnar decoder: same output shape as
    * `Decoders.typed(WireCodec.decode)` — (id, site struct, score,
    * flag, timestamp, _corrupt) — with malformed payloads flagged via
    * `_corrupt` instead of dropped rows (the length equation catches
    * truncation AND trailing bytes). */
  val decodeColumnar: DataFrame => DataFrame = { df =>
    val r = ColumnBridge.column(
      WireParseExpr(ColumnBridge.expression(col("value"))))
    df.select(
      r.getField("id").as("id"),
      r.getField("site").as("site"),
      r.getField("score").as("score"),
      r.getField("flag").as("flag"),
      col("timestamp"),
      // null wire bytes null the whole parse struct — without this
      // coalesce they would pass as a "good" all-null row instead of
      // routing to the dead-letter frame like the typed decoder does
      coalesce(r.getField("_corrupt"),
        when(col("value").isNull, lit("null message value")))
        .as("_corrupt"))
  }
}

/** Native one-pass wire parse: `binary` → struct<id, site<id,kind>,
  * score, flag, _corrupt>. Good rows carry null `_corrupt`; malformed
  * rows (truncated / trailing bytes) carry the error text with every
  * data field null — decode-error routing parity
  * (/root/reference/proto.go:133-145). Codegen'd via a direct
  * `compute` call; no hex/string intermediates.
  */
case class WireParseExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("id", LongType),
    StructField("site", StructType(Seq(
      StructField("id", StringType), StructField("kind", StringType)))),
    StructField("score", DoubleType),
    StructField("flag", BooleanType),
    StructField("_corrupt", StringType)))
  override def nullable: Boolean = true

  /** One pass over the record bytes (0-based offsets of the layout
    * above: id @0, len1 @8, site.id @10, len2 @10+l1, kind @12+l1,
    * score @12+l1+l2, flag @20+l1+l2, total 21+l1+l2). */
  def compute(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length
    def fail(): InternalRow = new GenericInternalRow(Array[Any](
      null, null, null, null,
      UTF8String.fromString(s"malformed wire record ($n bytes)")))
    if (n < 21) return fail()
    val l1 = ((bytes(8) & 0xFF) << 8) | (bytes(9) & 0xFF)
    if (n < 12 + l1) return fail()
    val l2 = ((bytes(10 + l1) & 0xFF) << 8) | (bytes(11 + l1) & 0xFF)
    if (n != 21 + l1 + l2) return fail()
    // strict UTF-8 — agreement with the typed decoder (see decode)
    val sid = UTF8String.fromBytes(bytes, 10, l1)
    val kind = UTF8String.fromBytes(bytes, 12 + l1, l2)
    if (!sid.isValid || !kind.isValid) return fail()
    val buf = ByteBuffer.wrap(bytes) // big-endian by default
    new GenericInternalRow(Array[Any](
      buf.getLong(0),
      new GenericInternalRow(Array[Any](sid, kind)),
      java.lang.Double.longBitsToDouble(buf.getLong(12 + l1 + l2)),
      bytes(20 + l1 + l2) == 1,
      null))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wireParseExpr", this)
    val rowCls = classOf[InternalRow].getName
    defineCodeGen(ctx, ev, c => s"($rowCls) $ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): WireParseExpr =
    copy(child = c)
  override def prettyName: String = "wire_parse"
}
