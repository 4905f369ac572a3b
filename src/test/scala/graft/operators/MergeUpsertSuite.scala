package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MERGE semantics edges the oracle's derived change set cannot reach:
  * a change row legitimately updating a value TO NULL (presence-flag
  * matching, never value-null tests), a delete for an absent key
  * (no-op), and unmatched rows on both sides. */
class MergeUpsertSuite extends SparkSpec {
  import spark.implicits._

  test("merge: update-to-null, insert, delete, absent-key delete no-op") {
    val snap = Seq(
      (1L, Option("a"), Option(10.0)),
      (2L, Option("b"), Option(20.0)),
      (3L, Option("c"), Option(30.0)),
      (4L, Option("d"), Option(40.0)))
      .toDF("k", "name", "v")
    val changes = Seq(
      // update k=1, name explicitly TO NULL — must override, not keep
      (1L, Option.empty[String], Option(11.0), false),
      // delete k=3
      (3L, Option.empty[String], Option.empty[Double], true),
      // insert k=9
      (9L, Option("i"), Option(90.0), false),
      // delete of an ABSENT key — a no-op, never a phantom row
      (7L, Option.empty[String], Option.empty[Double], true))
      .toDF("k", "name", "v", "is_delete")
    val out = MergeUpsert.merge(snap, changes, Seq("k"),
        deleteCol = Some("is_delete"))
      .as[(Long, Option[String], Option[Double])].collect().toSet
    assert(out == Set(
      (1L, None, Some(11.0)), // updated, name overridden to null
      (2L, Some("b"), Some(20.0)), // untouched
      (4L, Some("d"), Some(40.0)), // untouched
      (9L, Some("i"), Some(90.0)))) // inserted; k=3 deleted, k=7 no-op
    // without a delete column every change row upserts
    val noDel = MergeUpsert.merge(snap,
      changes.drop("is_delete"), Seq("k"))
      .as[(Long, Option[String], Option[Double])].collect().toSet
    assert(noDel.contains((3L, None, None)) && noDel.size == 6)
  }
}
