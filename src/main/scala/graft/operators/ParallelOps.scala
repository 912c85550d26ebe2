package graft.operators

/** Overlap INDEPENDENT Spark actions (optimization guide §2.6): Spark's
  * scheduler happily runs several jobs at once inside one application —
  * actions are only sequential because driver code calls them sequentially.
  * The index builders each write two independent relations (bands+sigs /
  * postings+codebook); running the two write jobs concurrently lets the
  * second job's tasks back-fill executors freed by the first job's tail —
  * on a cluster the win is the straggler tail of each write, locally it is
  * the per-job fixed overhead.
  *
  * A fresh Thread per call (not a pool): Spark's job-scoped local
  * properties (job description/group, AQE flags) live in an
  * InheritableThreadLocal, so a thread CREATED here inherits the caller's
  * properties — a long-lived pool would freeze whatever properties existed
  * when the pool's threads were first spun up. The thread cost is
  * microseconds against multi-second write jobs.
  */
private[graft] object ParallelOps {

  /** Run `a` and `b` concurrently; return once BOTH have settled (a failed
    * branch never leaves the other's write job racing the caller's cleanup
    * path). The first failure is rethrown, the other attached as
    * suppressed. */
  def inParallel(a: => Unit, b: => Unit): Unit = {
    @volatile var errA: Throwable = null
    val t = new Thread(() => try a catch { case e: Throwable => errA = e },
      "graft-parallel-write")
    t.setDaemon(true)
    t.start()
    var errB: Throwable = null
    try b catch { case e: Throwable => errB = e }
    t.join()
    if (errB != null) {
      if (errA != null) errB.addSuppressed(errA)
      throw errB
    }
    if (errA != null) throw errA
  }
}
