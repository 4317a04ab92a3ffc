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

  def note(): Unit = { created.incrementAndGet(); () }

  def maybeGc(threshold: Int = 16): Unit = {
    val n = created.get()
    if (n - lastGcAt >= threshold) synchronized {
      if (n - lastGcAt >= threshold) { lastGcAt = n; System.gc() }
    }
  }
}
