package graft.examples

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: op_sequence_match under an adversarially hot entity
  * (SCALE.md round-13 record). Stage joins are per-entity
  * |stage_i| × |step_{i+1} events| — quadratic in ONE entity's event
  * count (the documented sessionize-class caveat; unlike the funnel,
  * the min-reduction that bounds this is provably invalid under
  * per-step gaps). The probe measures a hot bot account against the
  * upstream remedy the docs prescribe: `Sampling.capPerKey` on
  * (entity, type) BEFORE the chain — which keeps the newest K events
  * per leg and leaves every normal entity untouched. */
object SeqMatchProbe {
  def main(args: Array[String]): Unit = {
    val hotPerType = args.headOption.map(_.toInt).getOrElse(4000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def mk(user: Long, perType: Int): Seq[(Long, Timestamp, String)] =
      (0 until perType).flatMap { i =>
        Seq("view", "click", "purchase").zipWithIndex.map {
          case (tp, j) =>
            (user, new Timestamp(t0 + i * 60000L + j * 15000L), tp)
        }
      }
    // 1000 normal users at 10 events/type + one hot bot
    val normal = (1L to 1000L).flatMap(mk(_, 10))
    val hot = mk(0L, hotPerType)
    val events = spark.createDataset(normal ++ hot)
      .toDF("user_id", "ts", "event_type")
      .repartition(32).localCheckpoint(true)

    def run(label: String, maxPerStep: Option[Int] = None)(
        df: org.apache.spark.sql.DataFrame): Long = {
      val t = System.nanoTime()
      val out = graft.operators.Funnel.sequenceMatch(df,
        steps = Seq("view", "click", "purchase"),
        gapsSec = Seq(3600L, 3600L), maxPerStep = maxPerStep).collect()
      println(f"$label%-10s wall=${(System.nanoTime() - t) / 1e9}%7.2fs " +
        f"entities=${out.length}")
      out.count(_.getAs[Int]("depth") == 3).toLong
    }

    val full = run("uncapped")(events)
    // the remedy, now wired INTO the operator (round-14 verdict item):
    // newest K events per (user, type) before the chain
    val cap = run("capped", maxPerStep = Some(200))(events)
    println(s"full-depth entities: uncapped=$full capped=$cap " +
      "(normal users identical by construction; only the bot's " +
      "chain count is truncated)")
    spark.stop()
  }
}
