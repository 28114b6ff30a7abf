package graft.iceberg

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Bounded parallel map for driver-side metadata I/O (manifest fetches,
  * parquet footer reads). One shared shape: a dedicated daemon pool — not
  * the global EC, which unrelated driver code shares — a hard timeout
  * instead of an infinite await, and order-preserving results. At 100 TB
  * a commit touches O(10k) files; sequential driver loops over an object
  * store would dominate planning/commit time. */
private[iceberg] object DriverPool {

  def mapParallel[A, B](
      items: Seq[A], parallelism: Int, timeout: Duration, name: String)(
      f: A => B): Seq[B] = {
    if (items.isEmpty) return Seq.empty
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(math.max(1, parallelism), items.size),
      (r: Runnable) => {
        val t = new Thread(r, name)
        t.setDaemon(true)
        t
      })
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      Await.result(Future.traverse(items)(a => Future(f(a))), timeout)
    } catch {
      case _: java.util.concurrent.TimeoutException =>
        throw new java.io.IOException(
          s"timed out after $timeout running ${items.size} $name task(s)")
    } finally pool.shutdownNow()
  }
}
