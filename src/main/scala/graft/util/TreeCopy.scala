package graft.util

import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}

/** Byte-faithful directory-tree copy with FILE-LEVEL parallelism — the
  * snapshot primitive every layout shares. `FileUtil.copy` walks the
  * tree single-threaded on the driver; a layout snapshot is hundreds of
  * small parquet part-files, so the copy was latency-bound on
  * sequential open/close round-trips (r22 profile: q290's wall was
  * mostly this). Here the tree is listed once, directories are created
  * up front, and the files copy on a bounded pool (I/O-bound, so a few
  * threads saturate local disk and HDFS alike). Failure of any single
  * copy fails the whole call — callers copy into hidden staging and
  * rename, so a partial tree is never published (unchanged crash
  * contract). */
object TreeCopy {
  def copy(fs: FileSystem, src: Path, dst: Path,
      conf: Configuration, threads: Int = 8): Boolean = {
    val srcStat = fs.getFileStatus(src)
    if (srcStat.isFile) return FileUtil.copy(fs, src, fs, dst, false, conf)
    val files = scala.collection.mutable.ArrayBuffer.empty[(Path, Path)]
    def walk(s: Path, d: Path): Unit = {
      fs.mkdirs(d)
      fs.listStatus(s).foreach { st =>
        val dd = new Path(d, st.getPath.getName)
        if (st.isDirectory) walk(st.getPath, dd)
        else files += ((st.getPath, dd))
      }
    }
    walk(src, dst)
    if (files.isEmpty) return true
    val pool = Executors.newFixedThreadPool(math.min(threads, files.size))
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(pool)
    try {
      val oks = files.toSeq
        .map { case (s, d) => Future(FileUtil.copy(fs, s, fs, d, false, conf)) }
        .map(Await.result(_, Duration.Inf))
      oks.forall(identity)
    } finally pool.shutdown()
  }
}
