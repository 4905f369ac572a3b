package graft.mock

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S4 — schema-driven synthetic message generator, parity with the
  * reference's `MockKafka` (/root/reference/kafka.go:238-264): random
  * data for EVERY field of a message schema, marshalled and fed to the
  * pipeline. Deviations by design: deterministic from a seed (the
  * reference seeds per-goroutine wall clock and is not reproducible —
  * SURVEY.md §3.2), and generation is columnar expressions (codegen'd,
  * executor-parallel, no driver loop) so at scale it generates data at
  * memory bandwidth across the cluster.
  */
object MockGen {

  /** Deterministic value column for one field, keyed on (path, seed, id). */
  private def columnFor(path: String, dt: DataType, id: Column,
      seed: Long): Column = {
    val h = abs(xxhash64(lit(path), lit(seed), id))
    dt match {
      case LongType => h % 1000000L
      case IntegerType => (h % 100000L).cast("int")
      case DoubleType => (h % 1000000L).cast("double") / lit(100.0)
      case BooleanType => (h % 2L) === 0L
      case StringType => concat(lit(path.replace('.', '_') + "_"),
        (h % 100000L).cast("string"))
      case BinaryType => unhex(md5(h.cast("string")))
      case TimestampType =>
        timestamp_millis(lit(1704067200000L) + (h % 31536000000L))
      case ArrayType(et, _) =>
        // 0..3 elements; element values vary by index
        transform(
          sequence(lit(0), (h % 4L).cast("int") - 1),
          i => columnFor(s"$path[]", et, id * lit(31L) + i.cast("long"), seed))
      case st: StructType =>
        struct(st.fields.map(f =>
          columnFor(s"$path.${f.name}", f.dataType, id, seed)
            .as(f.name)).toIndexedSeq: _*)
      case other =>
        throw new IllegalArgumentException(s"MockGen: unsupported $other")
    }
  }

  private def row(schema: StructType, id: Column, seed: Long): Seq[Column] =
    schema.fields.toIndexedSeq.map(f =>
      columnFor(f.name, f.dataType, id, seed).as(f.name))

  /** Batch generator: `rows` deterministic rows of `schema`. */
  def batch(spark: SparkSession, schema: StructType, rows: Long,
      seed: Long = 42L): DataFrame = {
    val base = spark.range(rows)
    base.select(row(schema, col("id"), seed): _*)
  }

  /** Streaming generator over the rate source (`rowsPerSecond`). */
  def streaming(spark: SparkSession, schema: StructType, rowsPerSec: Long,
      seed: Long = 42L): DataFrame = {
    val base = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSec.toString).load()
    base.select(row(schema, col("value"), seed): _*)
  }

  /** Marshal generated rows to wire-shaped messages (`value: binary`,
    * `timestamp`) — the `proto.Marshal` → `mChan` step of MockKafka
    * (kafka.go:248-260), with JSON bytes standing in for protobuf
    * (the decoder is pluggable by design, proto.go:33). */
  def asMessages(df: DataFrame, prefixBytes: Int = 0): DataFrame = {
    val payload = to_json(struct(df.columns.map(col).toIndexedSeq: _*))
    val valueCol =
      if (prefixBytes == 0) payload.cast("binary")
      else concat(
        unhex(lit("00" * prefixBytes)), payload.cast("binary"))
    df.select(valueCol.as("value"),
      coalesce(
        df.columns.find(_ == "ts").map(col).getOrElse(lit(null)),
        current_timestamp()).cast("timestamp").as("timestamp"))
  }
}
