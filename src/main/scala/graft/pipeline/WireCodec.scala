package graft.pipeline

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DoubleType, LongType}

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
  *    built from codegen'd expressions (`substr`/`hex`/`conv` +
  *    a `StaticInvoke` bit-cast), so it fuses into the scan's
  *    whole-stage-codegen span with no typed boundary at all. The
  *    shared length subexpressions are deduplicated by codegen
  *    subexpression elimination (top-level projection — not the HOF
  *    lambda trap from SCALE.md).
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
    try {
      val buf = ByteBuffer.wrap(bytes)
      val id = buf.getLong()
      val sid = new Array[Byte](buf.getShort() & 0xFFFF)
      buf.get(sid)
      val kind = new Array[Byte](buf.getShort() & 0xFFFF)
      buf.get(kind)
      val score = buf.getDouble()
      val flag = buf.get() == 1
      if (buf.hasRemaining) DecodeResult.Failed("trailing bytes")
      else DecodeResult.Ok(WireRecord(id,
        WireSite(new String(sid, UTF_8), new String(kind, UTF_8)),
        score, flag))
    } catch {
      case _: java.nio.BufferUnderflowException =>
        DecodeResult.Failed(s"truncated wire record (${bytes.length} bytes)")
    }
  }

  /** Signed big-endian int64 from 8 bytes at `pos` (1-based), as two
    * unsigned 4-byte halves so the sign bit lands correctly. */
  private def beLong(v: Column, pos: Column): Column = {
    val hi = conv(hex(v.substr(pos, lit(4))), 16, 10).cast("long")
    val lo = conv(hex(v.substr(pos + 4, lit(4))), 16, 10).cast("long")
    shiftleft(hi, 32).bitwiseOR(lo)
  }

  private def beShort(v: Column, pos: Column): Column =
    conv(hex(v.substr(pos, lit(2))), 16, 10).cast("int")

  /** `java.lang.Double.longBitsToDouble` as a codegen'd static call —
    * Spark has no built-in reinterpret cast. */
  private def longBitsToDouble(bits: Column): Column =
    ColumnBridge.column(StaticInvoke(
      classOf[java.lang.Double], DoubleType, "longBitsToDouble",
      Seq(ColumnBridge.expression(bits)), Seq(LongType)))

  /** Columnar decoder: same output shape as
    * `Decoders.typed(WireCodec.decode)` — (id, site struct, score,
    * flag, timestamp, _corrupt) — with malformed payloads flagged via
    * `_corrupt` instead of dropped rows (the length equation catches
    * truncation AND trailing bytes; a too-short buffer nulls the
    * length fields, which fails the equation null-safely). */
  val decodeColumnar: DataFrame => DataFrame = { df =>
    val v = col("value")
    val l1 = beShort(v, lit(9))
    val l2 = beShort(v, lit(11) + l1)
    val ok = length(v) === lit(21) + l1 + l2
    val flagByte = conv(hex(v.substr(lit(21) + l1 + l2, lit(1))), 16, 10)
    df.select(
      when(ok, beLong(v, lit(1))).as("id"),
      when(ok, struct(
        v.substr(lit(11), l1).cast("string").as("id"),
        v.substr(lit(13) + l1, l2).cast("string").as("kind"))).as("site"),
      when(ok, longBitsToDouble(beLong(v, lit(13) + l1 + l2))).as("score"),
      when(ok, flagByte.cast("int") === 1).as("flag"),
      col("timestamp"),
      when(!coalesce(ok, lit(false)),
        concat(lit("malformed wire record ("), length(v), lit(" bytes)")))
        .as("_corrupt"))
  }
}
