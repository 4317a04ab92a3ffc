package graft.core

/** Storage-side per-query resource limits, mirroring the reference's
  * vmstorage/netstorage flags:
  *
  *  - `-search.maxUniqueTimeseries` (app/vmstorage/vmstorage.go:26) —
  *    cap the unique series a single query may scan
  *    (lib/storage/index_db.go:2211 errTooManyTimeseries);
  *  - `-search.maxSamplesPerQuery` (app/vmselect/netstorage/
  *    netstorage.go:31,1114) — cap the raw samples a single query may
  *    process across all series.
  *
  * Both default DISABLED here. (The reference defaults
  * maxSamplesPerQuery to 1e9 because its row-oriented search unpacks
  * whole blocks on the query path; our scans are columnar and the guard
  * is opt-in protection, not a CPU-accounting necessity.)
  *
  * Enforcement: the reference checks counters inline while unpacking
  * blocks; a declarative Spark plan has no mid-scan hook, so when a
  * limit is set every selector leaf REGISTERS an aggregate-only
  * pre-count over its time span, and a query runs them as ONE union job
  * — a column-pruned count scan that costs far less than the evaluation
  * it guards, flushed BEFORE any eager construction work (see
  * pendingFlush below) and always before execution.
  */
object StorageLimits {
  @volatile var maxSamplesPerQuery: Long = 0L
  @volatile var maxUniqueTimeseries: Long = 0L
  def enabled: Boolean = maxSamplesPerQuery > 0 || maxUniqueTimeseries > 0

  // Deferred-enforcement hook: Eval batches the per-leaf pre-counts into
  // ONE union job per query, run at end of plan construction — but a few
  // construction paths do EAGER Spark work (the two-level rollup's
  // level-1 checkpoint + count, the binop adaptive pushdown's left
  // checkpoint, the histogram LE checkpoint). Those sites call
  // flushPending() FIRST, so the limits still reject before the
  // expensive work they exist to prevent; the hook is a no-op when
  // limits are disabled or nothing is registered.
  private val pendingFlush = new ThreadLocal[() => Unit]

  /** install a hook, returning the previously-installed one (null when
    * none) — a nested top-level eval on the same thread must restore its
    * caller's hook on exit, not unconditionally remove it, or the outer
    * query loses reject-before-eager-work for its remainder
    */
  def swapPendingFlush(f: () => Unit): () => Unit = {
    val prev = pendingFlush.get()
    pendingFlush.set(f)
    prev
  }
  def restorePendingFlush(prev: () => Unit): Unit =
    if (prev == null) pendingFlush.remove() else pendingFlush.set(prev)
  def flushPending(): Unit = {
    val f = pendingFlush.get()
    if (f != null) f()
  }

  def samplesError(limit: Long): IllegalArgumentException =
    new IllegalArgumentException(
      s"cannot select more than -search.maxSamplesPerQuery=$limit samples; " +
        "possible solutions: increase the -search.maxSamplesPerQuery; " +
        "reduce time range for the query; use more specific label filters " +
        "in order to select fewer series")

  def seriesError(limit: Long): IllegalArgumentException =
    new IllegalArgumentException(
      s"the number of matching timeseries exceeds $limit; " +
        "either narrow down the search or increase -search.max* command-line " +
        "flag values (the most likely limit is -search.maxUniqueTimeseries)")
}
