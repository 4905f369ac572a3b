package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SaltingSuite extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join (results invariant under salting)") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .withColumnRenamed("l_partkey", "p_partkey")
    val part = Tables.load(spark, sf0001, "part")
    val plain = li.join(part, Seq("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Salting.saltedJoin(li, part, Seq("p_partkey"), buckets = 8)
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("salted distinct count is exact (salts partition disjointly)") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Salting.saltedDistinctCount(li, "l_returnflag",
      "l_partkey", buckets = 16)
      .as[(String, Long)].collect().toMap
    assert(salted == exact)
  }
}

class KafkaSourceSuite extends SparkSpec {
  test("Kafka config compiles to the standard option set (S3 parity)") {
    val src = graft.sources.KafkaSource(
      brokers = Seq("b1:9092", "b2:9092"),
      topic = "events",
      groupId = Some("graft"),
      saslMechanism = Some("PLAIN"),
      securityProtocol = Some("SASL_SSL"),
      minPartitions = Some(5), // ≈ ClientCount fan-out (S2)
      maxOffsetsPerTrigger = Some(122880L * 8))
    val o = src.options
    assert(o("kafka.bootstrap.servers") == "b1:9092,b2:9092")
    assert(o("subscribe") == "events")
    assert(o("kafka.group.id") == "graft")
    assert(o("kafka.sasl.mechanism") == "PLAIN")
    assert(o("kafka.security.protocol") == "SASL_SSL")
    assert(o("minPartitions") == "5")
    assert(o("maxOffsetsPerTrigger") == "983040")
  }
}
