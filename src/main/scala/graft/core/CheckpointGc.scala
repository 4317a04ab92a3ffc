package graft.core

/** Eager `localCheckpoint(true)` block accounting.
  *
  * Checkpointed RDD blocks are only released when a driver GC lets
  * ContextCleaner's weak references fire (Spark's periodic fallback GC
  * defaults to 30 min). Batch runs (Bench) System.gc() between passes; a
  * long-running HttpApi server would otherwise accumulate blocks from
  * every completed fillable-counter/binop query between periodic GCs.
  * Checkpoint-heavy query paths `note()` each eager checkpoint and the
  * server calls `maybeGc()` after each request — a GC runs at most once
  * per `threshold` checkpoints, so idle servers and checkpoint-free
  * workloads never pay one.
  */
object CheckpointGc {
  private val created = new java.util.concurrent.atomic.AtomicLong(0L)
  @volatile private var lastGcAt = 0L
  private val gcQueued = new java.util.concurrent.atomic.AtomicBoolean(false)

  // Single background daemon runs the System.gc() — a synchronous GC on
  // the HTTP worker thread would charge the stop-the-world pause to the
  // request that happened to cross the threshold AND stall every
  // in-flight query JVM-wide while holding the request's latency budget.
  // The queue depth is effectively 1 (gcQueued), so a GC storm can't
  // build up behind a slow collector.
  private lazy val gcRunner = {
    val ex = java.util.concurrent.Executors.newSingleThreadExecutor(r => {
      val t = new Thread(r, "graft-checkpoint-gc")
      t.setDaemon(true)
      t
    })
    ex
  }

  def note(): Unit = { created.incrementAndGet(); () }

  def maybeGc(threshold: Int = 16): Unit = {
    val n = created.get()
    if (n - lastGcAt >= threshold && gcQueued.compareAndSet(false, true)) {
      lastGcAt = n
      gcRunner.execute(() =>
        try System.gc()
        finally gcQueued.set(false))
    }
  }

  /** test hook: block until a queued GC (if any) has completed */
  def awaitQuiesce(): Unit =
    gcRunner.submit(new Runnable { def run(): Unit = () }).get()
}
