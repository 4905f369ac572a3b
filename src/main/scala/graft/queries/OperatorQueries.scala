package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.normalize.{Normalizer, NormalizerSpec}
import graft.ops.Stages

/** Pipeline-operator queries (SURVEY.md §2.1) expressed as batch
  * DataFrame programs over the fixture tables, each with a DuckDB
  * oracle. The streaming wiring of the same operators lives in
  * graft.pipeline and is exercised by ScalaTest.
  */
object OperatorQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Build a deterministic nested frame from `events`: struct columns +
    * a list column that is EMPTY for every 5th event — exercising all
    * normalizer semantics (dotted path, aliased rename, per-element
    * fan-out, empty-list⇒NULL-row, indexed access). */
  private[graft] def nestedEvents(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    ev.select(
      col("event_id"),
      struct(col("user_id").as("id"), col("event_type").as("kind"))
        .as("site"),
      struct(floor(col("value") * 1000).cast("long").as("seconds"))
        .as("ts"),
      when(col("event_id") % 5 === 0,
          array().cast("array<struct<id:string,price:double>>"))
        .otherwise(array(
          struct(concat(lit("d"), col("event_id")).as("id"),
            col("value").as("price")),
          struct(concat(lit("e"), col("event_id")).as("id"),
            (col("value") * 2).as("price"))))
        .as("deals"))
  }

  /** N1 — normalizer flatten/unnest projection
    * (/root/reference/quacfka.go:106-120, README.md:111-131). */
  def normalize(s: SparkSession, dir: String): DataFrame =
    Normalizer.normalize(nestedEvents(s, dir), NormalizerSpec(
      Seq("event_id", "site.id", "site.kind", "ts.seconds",
        "deals.id", "deals.price", "deals[0].id"),
      Seq("event_id", "site", "kind", "event_time",
        "deal", "deal_price", "first_deal")))

  val normalizeSql: String =
    """WITH nested AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(floor(value*1000) AS BIGINT) AS seconds,
      |    CASE WHEN event_id % 5 = 0
      |      THEN CAST([] AS STRUCT(id VARCHAR, price DOUBLE)[])
      |      ELSE [{'id': 'd' || CAST(event_id AS VARCHAR), 'price': value},
      |            {'id': 'e' || CAST(event_id AS VARCHAR), 'price': value * 2}]
      |    END AS deals
      |  FROM events)
      |SELECT event_id, user_id AS site, event_type AS kind,
      |  seconds AS event_time, d.u.id AS deal, d.u.price AS deal_price,
      |  deals[1].id AS first_deal
      |FROM nested LEFT JOIN LATERAL unnest(deals) AS d(u) ON true""".stripMargin

  /** S5+P1+P2 — munge (strip 6-byte Confluent prefix from binary) then
    * JSON-decode with dead-letter routing; every 7th payload is
    * corrupted to exercise the corrupt path. */
  def mungeDecode(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val msgs = ev.select(
      concat(unhex(lit("0" * 12)),
        when(col("event_id") % 7 === 0, lit("garbage{"))
          .otherwise(col("props")).cast("binary")).as("value"),
      current_timestamp().as("timestamp"))
    val munged = Stages.munge(Stages.confluentStrip)(msgs)
    val decoded = Stages.decodeJson(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType))))(munged)
    decoded
      .select(when(col("_corrupt").isNull, lit("ok"))
        .otherwise(lit("__corrupt")).as("status"), col("k"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
  }

  val mungeDecodeSql: String =
    """WITH msg AS (
      |  SELECT CASE WHEN event_id % 7 = 0 THEN 'garbage{' ELSE props END
      |    AS payload FROM events),
      |dec AS (
      |  SELECT CASE WHEN json_valid(payload)
      |      THEN CAST(json_extract_string(payload, '$.k') AS BIGINT) END AS k,
      |    CASE WHEN json_valid(payload) THEN 'ok' ELSE '__corrupt' END
      |      AS status
      |  FROM msg)
      |SELECT status, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
      |FROM dec GROUP BY status""".stripMargin

  /** P1 — REAL protobuf wire-format decode, no jar involved
    * (graft.pipeline.ProtoCodec: hand-rolled varint / zigzag /
    * fixed64 / length-delimited / nested-message codec — the
    * reference's canonical generated-protobuf `unmarshalFunc`
    * boundary, /root/reference/proto.go:33,106-172, with the actual
    * wire format instead of the length-prefixed stand-in). The whole
    * round trip is columnar: events → `ProtoEncodeExpr` → inject an
    * unknown field (15, varint) on every 5th payload — a proto reader
    * MUST skip it — corrupt every 7th to a truncated varint →
    * `ProtoParseExpr` decode with dead-letter routing. The oracle
    * predicts the decoded values straight from the source columns, so
    * any varint/zigzag/nesting/skip misparse breaks the hash match;
    * `ts = event_id − 500` puts NEGATIVE zigzag values on the wire. */
  def protoDecode(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import graft.pipeline.{ProtoCodec, ProtoEncodeExpr}
    val ev = Tables.load(s, dir, "events")
    val rec = struct(
      col("event_id").as("id"),
      struct(concat(lit("u"), col("user_id").cast("string")).as("id"),
        col("event_type").as("kind")).as("site"),
      col("value").as("score"),
      (col("event_id") % 2 === 0).as("flag"),
      (col("event_id") - 500).as("ts"))
    val payload = ColumnBridge.column(
      ProtoEncodeExpr(ColumnBridge.expression(rec)))
    // bindOnce: the encode rides two branches of the CASE — without
    // the pin it would re-encode per reference (SCALE.md CSE lesson)
    val wire = graft.functions.ExprUtils.bindOnce(payload) { p =>
      when(col("event_id") % 7 === 0, unhex(lit("FFFF")))
        .when(col("event_id") % 5 === 0, concat(p, unhex(lit("7801"))))
        .otherwise(p)
    }
    val msgs = ev.select(wire.as("value"),
      current_timestamp().as("timestamp"))
    ProtoCodec.decodeColumnar(msgs)
      .select(col("id"), col("site.id").as("site_id"),
        col("site.kind").as("site_kind"), col("score"), col("flag"),
        col("ts"),
        when(col("_corrupt").isNull, lit("ok"))
          .otherwise(lit("__corrupt")).as("status"))
  }

  // COALESCEs mirror proto3 default semantics: a NULL source column
  // encodes as an ABSENT field on the wire and decodes to ""/0.0 on
  // the Spark side, while bare SQL would propagate NULL ('u'||NULL =
  // NULL) — a silent hash mismatch if the events fixture ever gains
  // nulls (ADVICE r6). flag/ts derive from event_id, the row key.
  val protoDecodeSql: String =
    """SELECT
      |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_id END AS id,
      |  CASE WHEN event_id % 7 = 0 THEN NULL
      |       ELSE COALESCE('u' || CAST(user_id AS VARCHAR), '') END
      |    AS site_id,
      |  CASE WHEN event_id % 7 = 0 THEN NULL
      |       ELSE COALESCE(event_type, '') END
      |    AS site_kind,
      |  CASE WHEN event_id % 7 = 0 THEN NULL
      |       ELSE COALESCE(value, 0.0) END AS score,
      |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE (event_id % 2 = 0) END
      |    AS flag,
      |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_id - 500 END AS ts,
      |  CASE WHEN event_id % 7 = 0 THEN '__corrupt' ELSE 'ok' END AS status
      |FROM events""".stripMargin

  /** K1/K2/K4+Q1 — whole-pipeline smoke as a batch query: messages →
    * pipeline (munge, decode, rotate-per-batch, runner) → returns the
    * segment manifest. Not SQL-expressible → rows-only check. */
  def pipelineSink(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.{Decoders, Pipeline, PipelineConfig}
    import graft.sink.RotationPolicy
    import graft.sources.DataFrameSource
    val root = java.nio.file.Files.createTempDirectory("graft-op").toString
    val ev = Tables.load(s, dir, "events")
    val msgs = ev.select(
      concat(unhex(lit("0" * 12)), col("props").cast("binary")).as("value"),
      current_timestamp().as("timestamp"))
    val pipe = Pipeline(s, PipelineConfig(
      source = DataFrameSource(msgs), // batch-fed below
      outputDir = s"$root/out",
      destTable = "events_raw",
      munger = Some(Stages.confluentStrip),
      decode = Decoders.json(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))),
      rotation = RotationPolicy(thresholdMB = 0, durationSec = 100000,
        clamp = false)))
    pipe.processBatch(msgs)
    pipe.close()
    s.read.parquet(s"$root/out/_manifest")
      .select("seg_index", "size_mb", "tables")
  }

  /** S4 — deterministic mock source: generated rows for a nested
    * schema, marshalled and decoded back (round-trip). Rows-only. */
  def mockSource(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("site", StructType(Seq(StructField("name", StringType)))),
      StructField("score", DoubleType),
      StructField("tags", ArrayType(StringType))))
    val gen = graft.mock.MockGen.batch(s, schema, 1000, seed = 42)
    val msgs = graft.mock.MockGen.asMessages(gen, prefixBytes = 6)
    val munged = Stages.munge(Stages.confluentStrip)(msgs)
    Stages.decodeJson(schema)(munged)
      .where(col("_corrupt").isNull)
      .select(col("id"), col("site.name").as("site_name"), col("score"),
        size(col("tags")).as("n_tags"))
  }

  /** As-of join — enrich each event with the latest order at or before
    * the event time for the same customer (SURVEY.md §2.2 "as-of";
    * graft.operators.AsofJoin). Right side pre-deduplicated on
    * (key, time) so tie resolution is deterministic in both engines. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events").select(
      col("event_id"), col("user_id"),
      // ts is epoch-nanos (LongType); integer-divide to micros —
      // float division would lose precision above 2^53
      timestamp_micros(expr("ts div 1000")).as("ets"))
      // plant a key with no right-side rows so the oracle also checks
      // the NULL (no-match) path — every fixture user has prior orders
      .withColumn("user_id", when(col("event_id") % 97 === 0,
        col("user_id") + 1000000).otherwise(col("user_id")))
    val ord = Tables.load(s, dir, "orders")
      .groupBy("o_custkey", "o_orderdate")
      .agg(max("o_orderkey").as("o_orderkey"))
    graft.operators.AsofJoin.joinAsof(ev, ord,
      Seq("user_id" -> "o_custkey"), "ets", "o_orderdate")
      .select("event_id", "user_id", "o_orderkey", "o_orderdate")
  }

  val asofJoinSql: String =
    """WITH e AS (
      |  SELECT event_id,
      |    CASE WHEN event_id % 97 = 0 THEN user_id + 1000000
      |         ELSE user_id END AS user_id, ts
      |  FROM events),
      |r AS (
      |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, r.o_orderkey, r.o_orderdate
      |FROM e ASOF LEFT JOIN r
      |  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate""".stripMargin

  /** Event-time tumbling window aggregate (graft.streaming
    * .EventTimeOps) — the same code path the watermarked streaming
    * query runs, checked batch-side against DuckDB time_bucket. */
  def eventWindow(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events").select(
      timestamp_micros(expr("ts div 1000")).as("ets"),
      col("event_type"), col("value"))
    graft.streaming.EventTimeOps.tumblingCounts(
      ev, "ets", "event_type", "value", "1 hour")
  }

  val eventWindowSql: String =
    """SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP)
      |    AS window_start,
      |  event_type, count(*) AS n_events,
      |  round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  val all: Map[String, Q] = Map(
    "op_normalize" -> (normalize _),
    "op_munge_decode" -> (mungeDecode _),
    "op_proto_decode" -> (protoDecode _),
    "op_pipeline_sink" -> (pipelineSink _),
    "op_mock_source" -> (mockSource _),
    "op_asof_join" -> (asofJoin _),
    "op_event_window" -> (eventWindow _)
  )

  val oracles: Map[String, String] = Map(
    "op_normalize" -> normalizeSql,
    "op_munge_decode" -> mungeDecodeSql,
    "op_proto_decode" -> protoDecodeSql,
    "op_asof_join" -> asofJoinSql,
    "op_event_window" -> eventWindowSql
  )
}
