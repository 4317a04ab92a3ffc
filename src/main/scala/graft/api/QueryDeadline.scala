package graft.api

import org.apache.spark.sql.SparkSession

/** Per-request query deadline (app/vmselect/searchutil/searchutil.go:21-43):
  * the `timeout` arg, clamped to the 30 s `-search.maxQueryDuration`
  * default (non-positive or oversized values fall back to the max).
  *
  * Enforcement is Spark-native: every job the request starts runs in a
  * dedicated job group, and a timer cancels the group (interrupting its
  * tasks) when the deadline fires — a runaway query frees its executors
  * instead of holding the cluster. A deadline that fires mid-stream
  * truncates the chunked response, exactly the failure mode of the
  * reference's bufferedwriter when its deadline trips.
  */
object QueryDeadline {

  val MaxQueryDurationMs = 30000L

  /** searchutil.GetMaxQueryDuration clamping */
  def clamp(requestedMs: Option[Long]): Long = requestedMs match {
    case Some(ms) if ms > 0 && ms <= MaxQueryDurationMs => ms
    case _ => MaxQueryDurationMs
  }

  def run[T](spark: SparkSession, timeoutMs: Long)(body: => T): T = {
    val sc = spark.sparkContext
    val group = "graft-deadline-" + java.util.UUID.randomUUID()
    sc.setJobGroup(group, s"query deadline ${timeoutMs}ms", interruptOnCancel = true)
    val timer = new java.util.Timer("graft-query-deadline", true)
    // Re-fire the cancel until the request finishes: a single cancel can
    // race job submission on a loaded driver (observed: the cancel event
    // processed between two AQE stage jobs left the next stage running to
    // completion), and cancelJobGroupAndFutureJobs is idempotent, so the
    // next tick reaps anything that slipped through.
    timer.scheduleAtFixedRate(new java.util.TimerTask {
      def run(): Unit = sc.cancelJobGroupAndFutureJobs(group)
    }, timeoutMs, 250L)
    try body
    finally {
      timer.cancel()
      sc.clearJobGroup()
    }
  }
}
