package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.FileBinarySource

/** Checkpoint/resume — an explicit IMPROVEMENT over the reference,
  * which has no offset/state checkpointing ("at-least-once-ish" via
  * consumer groups only, SURVEY.md §2.2): with a checkpointLocation,
  * a restarted pipeline resumes from recorded offsets and processes
  * only new data.
  */
class CheckpointSuite extends SparkSpec {

  private val schema = StructType(Seq(StructField("id", LongType)))

  private def writeBatch(dir: String, from: Long, n: Long): Unit = {
    import spark.implicits._
    (from until from + n).toDF("id")
      .select(to_json(struct(col("id"))).cast("binary").as("value"),
        current_timestamp().as("timestamp"))
      .write.mode("append").parquet(dir)
  }

  test("restarted pipeline resumes from checkpoint, processing only new files") {
    val root = Files.createTempDirectory("graft-ckpt").toString
    val msgDir = s"$root/msgs"
    writeBatch(msgDir, 0, 100)

    def mkPipe() = Pipeline(spark, PipelineConfig(
      source = FileBinarySource(msgDir),
      outputDir = s"$root/out",
      destTable = "ids",
      decode = Decoders.json(schema),
      checkpointDir = Some(s"$root/ckpt")))

    val p1 = mkPipe()
    val q1 = p1.run()
    q1.processAllAvailable()
    p1.close()
    assert(p1.metrics.messagesConsumed.get == 100)

    // new data lands while the pipeline is down
    writeBatch(msgDir, 100, 40)

    val p2 = mkPipe()
    val q2 = p2.run()
    q2.processAllAvailable()
    p2.close()
    // only the 40 new messages — offsets resumed, no reprocessing
    assert(p2.metrics.messagesConsumed.get == 40)

    // and the sink holds all 140 decoded rows exactly once
    val manifest = spark.read.parquet(s"$root/out/_manifest")
    import spark.implicits._
    val segs = manifest.select("path").as[String].collect()
    val all = spark.read.parquet(segs.map(_ + "/ids"): _*)
    assert(all.count() == 140)
    assert(all.select("id").distinct().count() == 140)
  }
}
