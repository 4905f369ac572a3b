package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.MergeUpsert

class StreamingMergeUpsertSuite extends SparkSpec {
  import spark.implicits._

  private def changes(rows: (Long, String, Option[Double], Boolean, Long)*)
      : DataFrame =
    rows.toSeq.toDF("id", "name", "score", "deleted", "version")

  private def snap(store: StreamingMergeUpsert): Set[(Long, String, Option[Double])] =
    store.snapshot(spark,
      changes().schema).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet

  test("chunked replay ≡ one-shot last-wins merge; deletes and " +
      "NULL-valued updates apply") {
    val root = Files.createTempDirectory("graft-smu").toString
    val store = StreamingMergeUpsert(s"$root/store", Seq("id"),
      deleteCol = Some("deleted"), versionCol = Some("version"))
    val b1 = changes((1L, "a", Some(1.0), false, 1L),
      (2L, "b", Some(2.0), false, 1L), (3L, "c", Some(3.0), false, 1L))
    // NULL score must OVERRIDE 2.0 (presence-flag matching), and a
    // within-batch pair on id 5 must resolve last-writer-wins
    val b2 = changes((2L, "b2", None, false, 2L),
      (4L, "d", Some(4.0), false, 2L))
    val b3 = changes((3L, "x", None, true, 3L),
      (5L, "e", Some(5.0), false, 3L), (5L, "e2", Some(5.5), false, 4L))
    Seq(b1, b2, b3).foreach(store.processBatch)
    val expected = Set((1L, "a", Some(1.0)), (2L, "b2", None),
      (4L, "d", Some(4.0)), (5L, "e2", Some(5.5)))
    assert(snap(store) == expected)
    // one-shot: the SAME change log in one batch (version last-wins
    // pre-dedup resolves cross-chunk updates) → identical snapshot
    val oneRoot = Files.createTempDirectory("graft-smu1").toString
    val one = StreamingMergeUpsert(s"$oneRoot/store", Seq("id"),
      deleteCol = Some("deleted"), versionCol = Some("version"))
    one.processBatch(b1.union(b2).union(b3))
    assert(snap(one) == expected)
  }

  test("replay idempotency: re-applying the last batch leaves the " +
      "snapshot unchanged (foreachBatch crash-replay contract)") {
    val root = Files.createTempDirectory("graft-smu-r").toString
    val store = StreamingMergeUpsert(s"$root/store", Seq("id"),
      deleteCol = Some("deleted"), versionCol = Some("version"))
    store.processBatch(changes((1L, "a", Some(1.0), false, 1L),
      (2L, "b", Some(2.0), false, 1L)))
    val b2 = changes((1L, "a2", None, false, 2L),
      (2L, "x", None, true, 2L), (9L, "i", Some(9.0), false, 2L))
    store.processBatch(b2)
    val after = snap(store)
    store.processBatch(b2) // replay
    assert(snap(store) == after)
    assert(after == Set((1L, "a2", None), (9L, "i", Some(9.0))))
  }

  test("delete for an absent key is a no-op; untouched store reads " +
      "as an empty snapshot with the value schema") {
    val root = Files.createTempDirectory("graft-smu-d").toString
    val store = StreamingMergeUpsert(s"$root/store", Seq("id"),
      deleteCol = Some("deleted"), versionCol = Some("version"))
    val empty = store.snapshot(spark, changes().schema)
    assert(empty.columns.toSeq == Seq("id", "name", "score"))
    assert(empty.count() == 0)
    store.processBatch(changes((7L, "zz", None, true, 1L),
      (1L, "a", Some(1.0), false, 1L)))
    assert(snap(store) == Set((1L, "a", Some(1.0))))
  }

  test("a leftover pre-delete staging dir is discarded and the batch " +
      "applies cleanly (CompactSwap recovery wiring)") {
    val root = Files.createTempDirectory("graft-smu-c").toString
    val store = StreamingMergeUpsert(s"$root/store", Seq("id"),
      deleteCol = Some("deleted"), versionCol = Some("version"))
    store.processBatch(changes((1L, "a", Some(1.0), false, 1L)))
    // simulate a crash between the staging write and the swap: staging
    // holds a manifest recording a still-existing snapshot
    val staging = new java.io.File(s"$root/store/_staging")
    assert(staging.mkdirs())
    val mf = new java.io.PrintWriter(s"$root/store/_staging/_graft_swap")
    mf.println(s"$root/store/snapshot")
    mf.println(s"$root/store/snapshot")
    mf.close()
    store.processBatch(changes((2L, "b", Some(2.0), false, 2L)))
    assert(snap(store) ==
      Set((1L, "a", Some(1.0)), (2L, "b", Some(2.0))))
    assert(!staging.exists())
  }

  test("snapshot() self-heals a crash mid-swap: the staged-only copy " +
      "is recovered instead of reading an empty snapshot") {
    val root = Files.createTempDirectory("graft-smu-mid").toString
    val store = StreamingMergeUpsert(s"$root/store", Seq("id"),
      deleteCol = Some("deleted"), versionCol = Some("version"))
    store.processBatch(changes((1L, "a", Some(1.0), false, 1L)))
    // simulate the swapStaged crash window: snapshot deleted, the only
    // full copy still in _staging with its manifest
    val snapDir = new java.io.File(s"$root/store/snapshot")
    val staging = new java.io.File(s"$root/store/_staging")
    assert(snapDir.renameTo(staging)) // staging holds the merged copy
    // the renamed dir carries the PREVIOUS swap's manifest + its
    // Hadoop checksum sidecar; drop the stale crc before rewriting
    // the manifest raw
    new java.io.File(staging, "._graft_swap.crc").delete()
    val mf = new java.io.PrintWriter(s"$root/store/_staging/_graft_swap")
    mf.println(s"$root/store/snapshot")
    mf.println(s"$root/store/snapshot") // folded partition: now gone
    mf.close()
    // a bare READ must complete the swap, not return empty
    assert(snap(store) == Set((1L, "a", Some(1.0))))
    assert(snapDir.exists() && !staging.exists())
  }

  test("attach: version-ordered file-stream chunks reproduce the " +
      "sequential-batch snapshot end to end") {
    val root = Files.createTempDirectory("graft-smu-e2e").toString
    val b1 = changes((1L, "a", Some(1.0), false, 1L),
      (2L, "b", Some(2.0), false, 1L))
    val b2 = changes((2L, "b2", None, false, 2L),
      (3L, "c", Some(3.0), false, 2L))
    val b3 = changes((1L, "x", None, true, 3L))
    // sequential appends: FileStreamSource orders files by mtime (the
    // StreamJoinSuite replay discipline)
    b1.coalesce(1).write.mode("append").parquet(s"$root/in")
    Thread.sleep(1100)
    b2.coalesce(1).write.mode("append").parquet(s"$root/in")
    Thread.sleep(1100)
    b3.coalesce(1).write.mode("append").parquet(s"$root/in")
    val store = StreamingMergeUpsert(s"$root/store", Seq("id"),
      deleteCol = Some("deleted"), versionCol = Some("version"))
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
    val q = store.attach(stream, s"$root/ckpt")
    q.processAllAvailable()
    q.stop()
    // reference: the batch operator applied per chunk in order
    val viaBatch = Seq(b2, b3).foldLeft(
      MergeUpsert.merge(changes().where(lit(false))
          .drop("deleted", "version"),
        b1, Seq("id"), Some("deleted"))) { (s, c) =>
      MergeUpsert.merge(s, c, Seq("id"), Some("deleted"))
    }.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(snap(store) == viaBatch)
    assert(snap(store) == Set((2L, "b2", None), (3L, "c", Some(3.0))))
  }
}
