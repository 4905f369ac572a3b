package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed MERGE (upsert + delete) of a change set into a snapshot — the
  * lakehouse `MERGE INTO` semantics as a plain relational operator:
  * matched keys take the change row's values, unmatched change rows
  * insert, unmatched snapshot rows persist, and rows whose change is
  * flagged deleted drop (a delete for an absent key is a no-op).
  *
  * Shape: ONE full-outer shuffle join on the key — the copy-on-write
  * merge every table format performs under `MERGE INTO`. At 100 TB the
  * change set is normally ≪ the snapshot, so AQE broadcasts it and the
  * snapshot never shuffles; for recurring merges, bucket the snapshot
  * by the key so successive merges co-locate for free. Change values
  * may be legitimately NULL, so "matched" is detected with an
  * explicit presence flag, never by value-null tests.
  *
  * Contract: key columns are UNIQUE on both sides (the standard MERGE
  * precondition — multiple matches per target row are ambiguous;
  * dedupe changes upstream, e.g. last-writer-wins by a version rank).
  * `changes` must carry every snapshot column (same names) plus the
  * optional boolean `deleteCol`. */
object MergeUpsert {

  def merge(snapshot: DataFrame, changes: DataFrame, keys: Seq[String],
      deleteCol: Option[String] = None): DataFrame = {
    val valueCols = snapshot.columns.filterNot(keys.contains)
    val renamed = changes.columns.foldLeft(changes) { (d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, s"__ch_$c")
    }.withColumn("__ch_present", lit(1))
    val joined = snapshot.join(renamed, keys.toIndexedSeq, "full_outer")
    val keep = deleteCol
      .map(c => !coalesce(col(s"__ch_$c"), lit(false)))
      .getOrElse(lit(true))
    joined.where(keep)
      .select(keys.map(col).toIndexedSeq ++ valueCols.toIndexedSeq.map(c =>
        when(col("__ch_present").isNotNull, col(s"__ch_$c"))
          .otherwise(col(c)).as(c)): _*)
  }
}
