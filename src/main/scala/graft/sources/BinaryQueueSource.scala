package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types.{BinaryType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** S1 beyond config parity — a REAL DataSource-V2 streaming source
  * exercising the exact API surface the Kafka connector implements
  * (`MicroBatchStream` + `SupportsAdmissionControl`), over a
  * partitioned append-only binary log no external jar is needed for.
  * The reference's consumer loop (/root/reference/kafka.go:90-167:
  * PollFetches → per-partition records → mChan) maps 1:1: Spark's
  * microbatch planner IS the poll loop, an offsets map
  * {partition → records consumed} is the consumer-group position
  * (checkpointed, resumed across restarts), `maxOffsetsPerTrigger`
  * is the admission throttle (kafka.go's bounded-channel
  * backpressure), and one InputPartition per queue partition is the
  * client fan-out (S2). Column shape matches the Kafka source and
  * [[FileBinarySource]]: `value: binary, timestamp: timestamp`.
  *
  * Queue layout: `dir/p<N>.log`, each an append-only sequence of
  * frames `[int32 payloadLen][int64 tsMillis][payload]` (big-endian).
  * A torn tail frame (a crashed writer) is ignored until its bytes
  * complete — offsets count only whole frames, so a reader never
  * observes a partial record. Readers go through the Hadoop
  * FileSystem API (the StreamingSeriesStore lesson — file:/hdfs:/
  * s3a: all work); [[BinaryQueue.append]] is the local test-side
  * producer.
  *
  * Scale notes: latestOffset frame-walks each partition file per
  * trigger (O(bytes) driver-side) — a production deployment keeps a
  * sidecar frame index or fixed-size frames; the read path itself
  * streams each partition's byte range once per task. */
class BinaryQueueProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-binqueue"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BinaryQueueProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    // re-wrap: properties arrive case-sensitive from the session
    val opts = new CaseInsensitiveStringMap(properties)
    val dir = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-binqueue needs a path option (the queue directory)"))
    val maxPerTrigger =
      Option(opts.get("maxOffsetsPerTrigger")).map(_.toLong)
    new BinQueueTable(dir, maxPerTrigger)
  }
}

object BinaryQueueProvider {
  val Schema: StructType = StructType(Seq(
    StructField("value", BinaryType),
    StructField("timestamp", TimestampType)))
}

private[sources] class BinQueueTable(dir: String,
    maxPerTrigger: Option[Long]) extends Table with SupportsRead {
  override def name(): String = s"graft-binqueue(`$dir`)"
  override def schema(): StructType = BinaryQueueProvider.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan = new Scan {
      override def readSchema(): StructType = BinaryQueueProvider.Schema
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream = new BinQueueMicroBatchStream(dir, maxPerTrigger)
    }
  }
}

/** Offset = records consumed per partition, JSON `{"0":12,"1":7}`
  * (sorted by partition id — a canonical text per position). A
  * partition absent from the map is at 0. */
private[sources] case class BinQueueOffset(counts: Map[Int, Long])
    extends Offset {
  override def json(): String =
    counts.toSeq.sortBy(_._1)
      .map { case (p, n) => s""""$p":$n""" }.mkString("{", ",", "}")
}

private[sources] object BinQueueOffset {
  private val Entry = """"(\d+)"\s*:\s*(\d+)""".r
  def fromJson(s: String): BinQueueOffset =
    BinQueueOffset(Entry.findAllMatchIn(s)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

private[sources] class BinQueueMicroBatchStream(dir: String,
    maxPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl {

  private def hadoopConf = SparkSession.active.sessionState.newHadoopConf()

  /** Whole frames currently present per partition file. */
  private def available(): Map[Int, Long] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(hadoopConf)
    if (!fs.exists(root)) return Map.empty
    fs.listStatus(root).toSeq
      .filter(s => s.getPath.getName.matches("p\\d+\\.log"))
      .map { s =>
        val pid = s.getPath.getName.stripPrefix("p").stripSuffix(".log").toInt
        pid -> BinaryQueue.countFrames(fs, s.getPath, s.getLen)
      }.toMap
  }

  override def initialOffset(): Offset = BinQueueOffset(Map.empty)
  override def deserializeOffset(json: String): Offset =
    BinQueueOffset.fromJson(json)
  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead " +
        "(SupportsAdmissionControl)") // the Kafka source's convention

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[BinQueueOffset].counts
    val avail = available()
    val newPer = avail.map { case (p, n) =>
      p -> math.max(0L, n - from.getOrElse(p, 0L)) }
    limit match {
      case mr: ReadMaxRows if newPer.values.sum > mr.maxRows =>
        // proportional allotment, remainder one-by-one in partition-id
        // order — deterministic, every partition makes progress
        val total = newPer.values.sum
        val r = mr.maxRows
        val base = newPer.map { case (p, a) => p -> (r * a / total) }
        var left = r - base.values.sum
        val taken = mutable.Map(base.toSeq: _*)
        newPer.keys.toSeq.sorted.foreach { p =>
          if (left > 0 && taken(p) < newPer(p)) {
            taken(p) += 1; left -= 1
          }
        }
        BinQueueOffset(avail.map { case (p, n) =>
          p -> math.min(n, from.getOrElse(p, 0L) + taken.getOrElse(p, 0L)) })
      case _ => BinQueueOffset(avail)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val from = start.asInstanceOf[BinQueueOffset].counts
    val to = end.asInstanceOf[BinQueueOffset].counts
    to.toSeq.sortBy(_._1).flatMap { case (p, hi) =>
      val lo = from.getOrElse(p, 0L)
      if (hi > lo)
        Some(BinQueuePartition(s"$dir/p$p.log", lo, hi): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BinQueueReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class BinQueuePartition(path: String,
    start: Long, end: Long) extends InputPartition

private[sources] class BinQueueReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BinQueuePartition]
    new PartitionReader[InternalRow] {
      // executors resolve the scheme with default Hadoop conf — pass
      // fully-qualified paths for non-default filesystems
      private val fsPath = new org.apache.hadoop.fs.Path(p.path)
      private val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(
          fsPath.getFileSystem(new org.apache.hadoop.conf.Configuration())
            .open(fsPath), 1 << 16))
      private var skipped = 0L
      private var emitted = 0L
      private var row: InternalRow = _
      override def next(): Boolean = {
        while (skipped < p.start) { // frame-skip to the start offset
          val len = in.readInt(); in.skipNBytes(8L + len); skipped += 1
        }
        if (emitted >= p.end - p.start) return false
        val len = in.readInt()
        val ts = in.readLong()
        val payload = new Array[Byte](len)
        in.readFully(payload)
        row = new GenericInternalRow(Array[Any](payload, ts * 1000L))
        emitted += 1
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}

/** Local producer + frame utilities for the binary queue. */
object BinaryQueue {
  /** Append whole frames to `dir/p<partition>.log` (created on first
    * use). Local-filesystem producer for tests and demos — the
    * consumer side is scheme-agnostic. */
  def append(dir: String, partition: Int,
      msgs: Seq[(Array[Byte], Long)]): Unit = {
    val d = new java.io.File(stripFileScheme(dir))
    d.mkdirs()
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(
        new java.io.File(d, s"p$partition.log"), true)))
    try msgs.foreach { case (bytes, tsMillis) =>
      out.writeInt(bytes.length)
      out.writeLong(tsMillis)
      out.write(bytes)
    } finally out.close()
  }

  private def stripFileScheme(dir: String): String =
    if (dir.startsWith("file:")) new java.net.URI(dir).getPath else dir

  /** Count WHOLE frames in a log file — a torn tail frame (len header
    * present, bytes incomplete) is excluded until its bytes land. */
  private[sources] def countFrames(fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path, fileLen: Long): Long = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(path), 1 << 16))
    try {
      var pos = 0L
      var n = 0L
      var done = false
      while (!done) {
        if (pos + 12 > fileLen) done = true
        else {
          val len = in.readInt()
          if (pos + 12 + len > fileLen) done = true
          else {
            in.skipNBytes(8L + len)
            pos += 12L + len
            n += 1
          }
        }
      }
      n
    } finally in.close()
  }
}

/** [[MessageSource]] face of the DSv2 queue — drop-in next to
  * [[KafkaSource]]/[[FileBinarySource]] in a [[graft.pipeline.Pipeline]]. */
final case class BinaryQueueSource(dir: String,
    maxOffsetsPerTrigger: Option[Long] = None) extends MessageSource {
  override def stream(spark: SparkSession): DataFrame = {
    val r = spark.readStream
      .format(classOf[BinaryQueueProvider].getName)
      .option("path", dir)
    maxOffsetsPerTrigger.fold(r)(n =>
      r.option("maxOffsetsPerTrigger", n.toString)).load()
  }
}
