package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

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
