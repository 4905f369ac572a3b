package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.normalize.{Normalizer, NormalizerSpec}

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

  val all: Map[String, Q] = Map(
    "op_normalize" -> (normalize _)
  )

  val oracles: Map[String, String] = Map(
    "op_normalize" -> normalizeSql
  )
}
