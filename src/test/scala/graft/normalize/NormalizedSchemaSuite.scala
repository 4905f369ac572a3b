package graft.normalize

import org.apache.spark.sql.types._

import graft.SparkSpec

class NormalizedSchemaSuite extends SparkSpec {
  import spark.implicits._

  test("normalizedSchema matches the schema normalize() actually produces") {
    val df = Seq(
      ("a", Site("s"), Ts(1L, 2), Seq.empty[Imp],
        Seq(Store(Gallery(Seq(Deal("d", 1.0))))))
    ).map(t => BidEvent(t._1, t._2, t._3, t._4, t._5)).toDF()
    val spec = NormalizerSpec(
      Seq("id", "site.id", "timestamp.seconds",
        "stores[0].gallery.deals.id", "stores[0].gallery.deals.price"),
      Seq("id", "site", "event_time", "deal", "deal_price"))

    val derived = Normalizer.normalizedSchema(df.schema, spec)
    val actual = Normalizer.normalize(df, spec).schema

    assert(derived.fieldNames.toSeq == actual.fieldNames.toSeq)
    assert(derived.fields.map(_.dataType).toSeq ==
      actual.fields.map(_.dataType).toSeq)
    assert(derived == StructType(Seq(
      StructField("id", StringType, nullable = true),
      StructField("site", StringType, nullable = true),
      StructField("event_time", LongType, nullable = true),
      StructField("deal", StringType, nullable = true),
      StructField("deal_price", DoubleType, nullable = true))))
  }

  test("benchmark sampler produces sliding-window JSONL") {
    val m = new graft.pipeline.PipelineMetrics()
    m.recordsProcessed.set(3000)
    m.recordsInserted.set(3000)
    m.sample(30.0) // one manual 30s sample
    m.recordsProcessed.set(9000)
    m.sample(30.0)
    val report = m.benchmarksReport()
    val lines = report.trim.split('\n')
    assert(lines.length == 2)
    assert(lines(0).contains("\"records_per_second\": \"100.00\""))
    assert(lines(1).contains("\"records_per_second\": \"200.00\""))
  }
}
