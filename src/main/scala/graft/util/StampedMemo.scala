package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** Per-instance memo for tiny layout-metadata reads (bucket counts,
  * centroid tables, live row counts), keyed by the watched paths'
  * modification times. The r22 profiles showed the same one-row meta
  * parquet scheduled as 2 Spark jobs (listing + head) up to 8 times per
  * query — pure driver-orchestration overhead, since the value can only
  * change when its directory does. Every engine mutation replaces or
  * touches its watched directory (two-rename swaps create a fresh
  * staging dir; appends move files in; deletes append tombstone files),
  * so a stamp mismatch forces a fresh read. Mutating methods should
  * ALSO call [[invalidate]] explicitly — belt and braces against coarse
  * filesystem mtime granularity within one instance. Nothing persists
  * across instances or runs: a new source handle always reads afresh,
  * so bench timings never inherit another run's work. */
final class StampedMemo[T](fs: () => FileSystem, watched: Seq[String]) {
  @volatile private var cell: Option[(Seq[Long], T)] = None
  private def stamp(): Seq[Long] = {
    val f = fs()
    watched.map { p =>
      val pp = new Path(p)
      if (f.exists(pp)) f.getFileStatus(pp).getModificationTime else -1L
    }
  }
  def apply(compute: => T): T = {
    val k = stamp()
    cell match {
      case Some((k0, v)) if k0 == k => v
      case _ =>
        val v = compute
        cell = Some((k, v))
        v
    }
  }
  def invalidate(): Unit = cell = None
}
