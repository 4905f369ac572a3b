package graft

import org.apache.spark.sql.types.{LongType, StructField, StructType,
  TimestampNTZType, TimestampType}

/** Fixture-drift tripwire (VERDICT r8 item 2): the driver regenerates
  * /root/testdata between rounds and changed events.ts from
  * INT64-epoch-nanos to timestamp[us] in r8, which surfaced as six
  * cryptic DATATYPE_MISMATCH analysis errors spread over suites. The
  * tripwire pins every table's schema at load so the next drift fails
  * in ONE place with a message naming the column. */
class TablesSuite extends SparkSpec {

  test("every fixture table loads under the pinned schema") {
    // load() itself asserts; a drifted fixture makes this throw
    Tables.names.foreach(n => Tables.load(spark, sf0001, n))
  }

  test("a drifted column type fires the tripwire with a one-line diff") {
    val drifted = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType), // expected TIMESTAMP_NTZ
      StructField("user_id", LongType)))
    val e = intercept[IllegalStateException](
      Tables.assertFixtureSchema("events", drifted))
    assert(e.getMessage.contains("fixture changed"))
    assert(e.getMessage.contains("events.ts is now TIMESTAMP"))
    assert(e.getMessage.contains("expected TIMESTAMP_NTZ"))
  }

  test("a missing column fires the tripwire") {
    val truncated = StructType(Seq(StructField("event_id", LongType)))
    val e = intercept[IllegalStateException](
      Tables.assertFixtureSchema("events", truncated))
    assert(e.getMessage.contains("fixture changed"))
  }

  test("unknown table names are not schema-checked") {
    // forward-compat: a future fixture table loads without a pin
    Tables.assertFixtureSchema("not_a_fixture", StructType(Nil))
  }
}
