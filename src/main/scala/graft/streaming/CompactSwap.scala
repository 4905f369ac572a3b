package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** The delete-then-rename snapshot swap shared by
  * [[StreamingSeriesStore.compact]] and
  * [[StreamingVectorIndex.compact]], with every filesystem boolean
  * CHECKED (round-12 ADVICE): `FileSystem.delete` and `rename` report
  * failure by RETURN VALUE, not exception — HDFS `rename` returns
  * false when the destination exists (e.g. a leftover
  * `batch_id=<snapId>` from a previous partially-failed compaction),
  * and a swallowed false silently loses the folded snapshot. Failure
  * modes and their handling:
  *
  *  - a folded partition that cannot be DELETED would double-count on
  *    every later read (snapshot + original) → throw;
  *  - a stale rename TARGET is cleared first (its content was already
  *    folded into the staged snapshot — either by this run or the
  *    previous crashed one whose staging the overwrite replaced);
  *  - a rename that still returns false means the snapshot exists
  *    only in the staging dir → throw with the staging path so the
  *    operator can recover it, never discard silently. */
private[streaming] object CompactSwap {

  /** Delete each folded partition, then move `tmp` to `dest`. */
  def swap(fs: FileSystem, folded: Seq[Path], tmp: Path, dest: Path)
      : Unit = {
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
          s"folded snapshot preserved at $tmp — retry the swap or " +
          "restore the staged dir manually")
  }
}
