package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Message sources (S1-S4, SURVEY.md §2.1). A source yields a streaming
  * DataFrame with the Kafka-source column shape:
  * `value: BinaryType`, `timestamp: TimestampType`.
  *
  * The reference's consumer pool (`consumeKafka`,
  * /root/reference/kafka.go:90-167) maps to source partition
  * parallelism here: N Kafka clients ≈ N source tasks, no user code.
  */
trait MessageSource {
  def stream(spark: SparkSession): DataFrame
}

/** S1/S3 — real Kafka source: a thin config holder that compiles to
  * `readStream.format("kafka")` options. SASL/TLS/group settings
  * pass through as `kafka.*` options (parity with `KafkaClientConf`,
  * /root/reference/kafka.go:25-62). The kafka connector jar is not in
  * this environment — construction works, `stream()` requires the jar
  * at runtime (prod wiring is config-only by design).
  */
final case class KafkaSource(
    brokers: Seq[String],
    topic: String,
    groupId: Option[String] = None,
    saslMechanism: Option[String] = None, // e.g. "PLAIN"
    securityProtocol: Option[String] = None, // e.g. "SASL_SSL"
    saslJaasConfig: Option[String] = None,
    minPartitions: Option[Int] = None, // ≈ ClientCount fan-out (S2)
    maxOffsetsPerTrigger: Option[Long] = None, // ≈ batch-size control (P3)
    extraOptions: Map[String, String] = Map.empty) extends MessageSource {

  def options: Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> brokers.mkString(","),
      "subscribe" -> topic)
    val opt = Seq(
      groupId.map("kafka.group.id" -> _),
      saslMechanism.map("kafka.sasl.mechanism" -> _),
      securityProtocol.map("kafka.security.protocol" -> _),
      saslJaasConfig.map("kafka.sasl.jaas.config" -> _),
      minPartitions.map(v => "minPartitions" -> v.toString),
      maxOffsetsPerTrigger.map(v => "maxOffsetsPerTrigger" -> v.toString)
    ).flatten.toMap
    base ++ opt ++ extraOptions
  }

  override def stream(spark: SparkSession): DataFrame =
    spark.readStream.format("kafka").options(options).load()
      .select(col("value"), col("timestamp"))
}

/** File-backed streaming source with the same column shape — used where
  * the Kafka jar is absent; each parquet file plays a partition of the
  * topic. Expects columns `value: binary` (and optionally `timestamp`).
  */
final case class FileBinarySource(path: String,
    maxFilesPerTrigger: Option[Int] = None) extends MessageSource {
  override def stream(spark: SparkSession): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("timestamp",
        org.apache.spark.sql.types.TimestampType)))
    val r = spark.readStream.schema(schema)
    val r2 = maxFilesPerTrigger.fold(r)(n =>
      r.option("maxFilesPerTrigger", n.toString))
    r2.parquet(path)
  }
}

/** Adapter for an already-constructed streaming DataFrame (e.g. a
  * MemoryStream in tests, or a user-supplied source — the reference's
  * `WithoutKafka` stage-skipping, /root/reference/quacfka.go:262-283).
  */
final case class DataFrameSource(df: DataFrame) extends MessageSource {
  override def stream(spark: SparkSession): DataFrame = {
    val cols = df.columns.toSet
    require(cols.contains("value"), "message source needs a 'value' column")
    if (cols.contains("timestamp")) df.select(col("value"), col("timestamp"))
    else df.select(col("value"),
      current_timestamp().as("timestamp"))
  }
}
