package graft.util

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Overlap INDEPENDENT Spark action chains from the driver — the
  * optimization-guide §2.6 pattern: Spark's scheduler happily runs
  * several jobs at once inside one application; actions are only
  * sequential because driver code calls them sequentially. A
  * driver-orchestrated walk (graph beam serve, recall probe) is a chain
  * of tiny jobs that leaves most cores idle, so a handful of such
  * chains interleave with near-linear wall-clock gain.
  *
  * Use ONLY when each `f(x)` is independent of every other: reads
  * shared immutable frames, writes nothing another chain reads. Results
  * return in input order, so callers stay deterministic. The pool is
  * bounded (default 4) to cap the pinned working sets alive at once. */
object Par {
  def map[A, B](xs: Seq[A], maxThreads: Int = 4)(f: A => B): Seq[B] =
    if (xs.size <= 1) xs.map(f)
    else {
      val pool = Executors.newFixedThreadPool(math.min(maxThreads, xs.size))
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      try xs.map(x => Future(f(x))).map(Await.result(_, Duration.Inf))
      finally pool.shutdown()
    }
}
