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

  test("saltFrom column: results invariant AND hot key actually spreads") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .withColumnRenamed("l_partkey", "p_partkey")
    val part = Tables.load(spark, sf0001, "part")
    val plain = li.join(part, Seq("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Salting.saltedJoin(li, part, Seq("p_partkey"),
      buckets = 8, saltFrom = Seq(col("l_orderkey")))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
    // the salt must vary WITHIN a key: pick the most frequent partkey
    // and check its rows land in >1 bucket
    val hot = li.groupBy("p_partkey").count()
      .orderBy(desc("count")).select("p_partkey").head().getLong(0)
    val spread = li.where(col("p_partkey") === hot)
      .select(pmod(xxhash64(col("l_orderkey")), lit(8)).as("salt"))
      .distinct().count()
    assert(spread > 1, s"hot key $hot landed in $spread bucket(s)")
  }

  test("right/full outer join types are rejected (silent-duplicate guard)") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .withColumnRenamed("l_partkey", "p_partkey")
    val part = Tables.load(spark, sf0001, "part")
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer")) {
      val e = intercept[IllegalArgumentException] {
        Salting.saltedJoin(li, part, Seq("p_partkey"), buckets = 4,
          joinType = jt)
      }
      assert(e.getMessage.contains(jt), jt)
    }
    // left-preserving types still pass validation and plan
    for (jt <- Seq("inner", "left", "left_outer", "left_semi", "left_anti"))
      Salting.saltedJoin(li, part, Seq("p_partkey"), buckets = 4,
        joinType = jt).queryExecution.optimizedPlan
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
