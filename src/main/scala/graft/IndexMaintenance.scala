package graft

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared crash-consistency choreography for the persisted indexes
  * ([[graft.dedup.LshIndex]], [[graft.similarity.IvfIndex]]): staged
  * table swaps and fragmentation counting. One implementation because
  * this logic is crash-window-critical — a fix to the recovery
  * ordering in one index must not silently miss the other (review
  * finding r13).
  */
object IndexMaintenance {

  /** Parquet data files under the given directories (recursive). A
    * directory that does not exist counts 0 — compaction entry points
    * call [[finishStagedSwap]] BEFORE counting, so a missing live dir
    * is either mid-recovery (handled there) or genuinely absent.
    */
  def parquetFileCount(fs: FileSystem, dirs: Seq[Path]): Int =
    dirs.map { dir =>
      if (!fs.exists(dir)) 0
      else {
        val it = fs.listFiles(dir, true)
        var n = 0
        while (it.hasNext) {
          if (it.next().getPath.getName.endsWith(".parquet")) n += 1
        }
        n
      }
    }.sum

  /** Finish an interrupted staged swap: a compact() that crashed
    * between deleting the live table and renaming its staged
    * replacement leaves `<live>_next` complete and `<live>` absent —
    * rename the staged copy into place. No-op when the live table
    * exists. MUST run before any read of the live path on a
    * maintenance entry point (the r13 review found compactIfFragmented
    * listing the live dir before recovery ever ran — the maintenance
    * job would crash every cycle in exactly the window it documents as
    * recoverable).
    */
  def finishStagedSwap(fs: FileSystem, live: Path, staged: Path): Unit = {
    if (!fs.exists(live) && fs.exists(staged)) {
      require(fs.rename(staged, live),
        s"index compact recovery: rename of $staged into $live failed")
    }
  }

  /** Atomic-as-possible swap of a fully-staged rewrite into place:
    * delete the live table, rename the staged one. The caller must
    * have finished writing `staged` (including _SUCCESS) before
    * calling; a crash between the two steps is the window
    * [[finishStagedSwap]] recovers.
    */
  def swapStaged(fs: FileSystem, live: Path, staged: Path): Unit = {
    fs.delete(live, true)
    require(fs.rename(staged, live),
      s"index compact: rename of $staged into $live failed")
  }
}
