package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The delete-then-rename snapshot swap shared by
  * [[StreamingSeriesStore.compact]], [[StreamingVectorIndex.compact]]
  * and [[StreamingVectorIndex.rebuild]], with every filesystem boolean
  * CHECKED (round-12 ADVICE): `FileSystem.delete` and `rename` report
  * failure by RETURN VALUE, not exception — HDFS `rename` returns
  * false when the destination exists, and a swallowed false silently
  * loses the folded snapshot.
  *
  * Crash recovery (round-13 review finding): once the folded
  * partitions are deleted, the staging dir holds the ONLY copy of
  * their rows — a naive compaction re-run would `mode("overwrite")`
  * that sole copy with a fold of whatever partitions remain. So the
  * swap records a MANIFEST (`_graft_swap` inside the staging dir:
  * line 1 = destination, rest = folded partition paths) before the
  * first delete, and [[recoverStaleStaging]] — which every compaction
  * runs first — resolves a leftover staging dir by it:
  *
  *  - no manifest ⇒ the staging WRITE itself crashed; originals are
  *    untouched ⇒ discard the staging dir and restage;
  *  - manifest present, every recorded partition still exists ⇒ the
  *    crash hit before any delete ⇒ discard and restage (this is the
  *    case the `attach(compactEvery)` replay contract relies on);
  *  - manifest present, some recorded partition gone ⇒ an interrupted
  *    swap ⇒ COMPLETE it (delete the surviving recorded partitions,
  *    swap staging into the recorded destination) — self-healing
  *    instead of data loss.
  *
  * The manifest rides into the destination on rename; its leading
  * underscore keeps it invisible to Spark's file index. */
private[streaming] object CompactSwap {

  private val ManifestName = "_graft_swap"
  private val StagingName = ".compact_tmp"

  /** Heal a crashed compaction swap. Every store WRITER entry
    * (processBatch) calls this before its first store read, so an
    * interrupted compact() closes at the NEXT BATCH instead of
    * lingering until someone happens to run compact() again — in the
    * window, reads would see a store missing every folded partition
    * (for the token-budget store that means quota over-admission;
    * for dedup stores, re-admitted duplicates). Single-writer
    * contract makes the write-from-a-read-path safe. */
  def recoverDir(spark: SparkSession, dir: String,
      tmpName: String = StagingName): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(root))
      recoverStaleStaging(fs, new Path(root, tmpName))
  }

  /** The shared compaction scaffold over a `batch_id=N`-partitioned
    * store: fold all-but-the-max partitions into one partition at the
    * lowest folded id (the max id may still be rewritten by a replay;
    * every lower id has committed), staged under `.compact_tmp` and
    * swapped in with the manifest ladder above. The store-specific
    * part is ONLY the fold transform (dedup-sort for line/fuzzy
    * stores, per-key re-aggregation for additive-sum stores) and,
    * when the store is sub-partitioned, the read/write hooks
    * (StreamingVectorIndex's basePath + partitionBy). Maintenance
    * contract: no concurrent writer mid-swap. */
  def foldBatchPartitions(spark: SparkSession, dir: String,
      read: Seq[String] => DataFrame = null,
      write: (DataFrame, String) => Unit = null)(
      fold: DataFrame => DataFrame): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return
    // resolve any crashed previous swap BEFORE listing partitions —
    // recovery can change the set
    recoverStaleStaging(fs, new Path(root, StagingName))
    val parts = fs.listStatus(root).filter(s => s.isDirectory &&
      s.getPath.getName.startsWith("batch_id="))
    if (parts.length <= 2) return
    val withIds = parts.map(s =>
      s.getPath -> s.getPath.getName.stripPrefix("batch_id=").toLong)
    val maxId = withIds.map(_._2).max
    val folded = withIds.filter(_._2 != maxId)
    val snapId = folded.map(_._2).min
    val paths = folded.map(_._1.toString).toIndexedSeq
    val snapshot = fold(
      if (read == null) spark.read.parquet(paths: _*) else read(paths))
    val tmp = new Path(root, StagingName)
    if (write == null)
      snapshot.write.mode("overwrite").parquet(tmp.toString)
    else write(snapshot, tmp.toString)
    swap(fs, folded.map(_._1).toIndexedSeq, tmp,
      new Path(root, s"batch_id=$snapId"))
  }

  /** Resolve a leftover staging dir per the ruleset above. Call
    * BEFORE listing partitions — recovery can change the set. */
  def recoverStaleStaging(fs: FileSystem, tmp: Path): Unit = {
    if (!fs.exists(tmp)) return
    val manifest = new Path(tmp, ManifestName)
    if (!fs.exists(manifest)) {
      // staging write never completed; originals intact
      if (!fs.delete(tmp, true) && fs.exists(tmp))
        throw new java.io.IOException(
          s"graft compact: cannot discard incomplete staging dir $tmp")
      return
    }
    val lines = {
      val in = fs.open(manifest)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toVector
      finally in.close()
    }
    val dest = new Path(lines.head)
    val folded = lines.tail.map(new Path(_))
    if (folded.forall(fs.exists)) {
      // pre-delete crash: every original survives — restage freshly
      if (!fs.delete(tmp, true) && fs.exists(tmp))
        throw new java.io.IOException(
          s"graft compact: cannot discard pre-delete staging dir $tmp")
    } else {
      // interrupted swap: the staging dir holds the only full copy —
      // finish what the crashed run started
      swapStaged(fs, folded.filter(fs.exists), tmp, dest)
    }
  }

  /** Record the manifest, then delete each folded partition and move
    * `tmp` to `dest`. */
  def swap(fs: FileSystem, folded: Seq[Path], tmp: Path, dest: Path)
      : Unit = {
    val out = fs.create(new Path(tmp, ManifestName), true)
    try {
      out.write((dest.toString +: folded.map(_.toString))
        .mkString("\n").getBytes("UTF-8"))
    } finally out.close()
    swapStaged(fs, folded, tmp, dest)
  }

  private def swapStaged(fs: FileSystem, folded: Seq[Path], tmp: Path,
      dest: Path): Unit = {
    folded.foreach { p =>
      if (!fs.delete(p, true) && fs.exists(p))
        throw new java.io.IOException(
          s"graft compact: failed to delete folded partition $p; " +
            "aborting before the snapshot swap (a leftover partition " +
            "would double-count against the snapshot)")
    }
    if (fs.exists(dest) && !fs.delete(dest, true))
      throw new java.io.IOException(
        s"graft compact: failed to clear stale snapshot target $dest; " +
          s"folded snapshot preserved at $tmp")
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(
        s"graft compact: rename $tmp -> $dest returned false; " +
          s"folded snapshot preserved at $tmp — the next compaction " +
          "completes the swap automatically (recoverStaleStaging)")
  }
}
