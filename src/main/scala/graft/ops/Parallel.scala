package graft.ops

/** Scoped driver-side action overlap (guide §2.6: Spark's scheduler
  * happily runs several jobs at once inside one application — actions
  * are only sequential because driver code calls them sequentially).
  * Used where a crawl loop's per-batch actions are INDEPENDENT — the
  * standing-state probe vs. the fold-in, or the per-layer snapshot
  * pins — so one action's straggler tail back-fills with the other's
  * work instead of leaving the cluster idle.
  *
  * The pool threads are created at first submit, so they inherit the
  * submitter's Spark local properties (job group / description are
  * InheritableThreadLocals) — a cancellable caller stays cancellable.
  */
private[graft] object Parallel {

  /** Run the thunks concurrently, return their results in order.
    * Degenerate sizes run inline (no pool).
    */
  def run[A](fs: Seq[() => A]): Seq[A] =
    if (fs.lengthCompare(1) <= 0) fs.map(_())
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(fs.size)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      try Await.result(Future.sequence(fs.map(f => Future(f()))), Duration.Inf)
      finally pool.shutdown()
    }

  /** Two-sided overlap with typed results. */
  def both[A, B](a: => A, b: => B): (A, B) = {
    val r = run[Any](Seq(() => a, () => b))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}
