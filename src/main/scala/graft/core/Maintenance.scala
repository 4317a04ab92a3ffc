package graft.core

import org.apache.spark.sql.SparkSession

/** Background store maintenance — the engine-side analog of the
  * reference's per-table watcher goroutines: the retention watcher drops
  * whole out-of-retention partitions on a jittered one-minute ticker
  * (`lib/storage/table.go:446-485`) and downsampling runs inside
  * background merges (`lib/storage/partition.go:535` +
  * `-downsampling.period`). Here one round is `step()` — retention
  * partition-drop first, then each downsample tier trails the flat store
  * (`SampleStore.downsampleNewDates`), so a date dropped by retention
  * propagates OUT of its tiers in the same round (the tier job removes
  * partitions for vanished source dates).
  *
  * `step()` never throws: each job's failure lands in the report's
  * `errors` and the next round retries (the fingerprint diff makes every
  * job idempotent and incremental). `start()` runs rounds on a daemon
  * thread every `periodMs`; `stop()` interrupts and joins it. The facade
  * auto-refresh layers (base-store generation, tier maintenance
  * manifests) pick changes up with no further wiring — a facade
  * configured with the same paths serves each round's output within its
  * refresh TTL.
  *
  * The per-series `-retentionFilter` rewrites stay on the compaction
  * path (`SampleStore.applyRetentionFilters`, the reference applies them
  * during merges too); the select-time predicate covers serving between
  * compactions.
  */
final class Maintenance(
    spark: SparkSession,
    storePath: String,
    periodMs: Long = 60000L,
    downsampleTiers: Map[Long, String] = Map.empty,
    retentionPeriodMs: Long = 0L,
    nowMs: () => Long = () => System.currentTimeMillis()) {
  require(periodMs > 0, s"maintenance period must be positive (got $periodMs)")

  import Maintenance.Report

  @volatile private var last: Option[Report] = None

  /** the most recent round's report (None before the first round) */
  def lastReport: Option[Report] = last

  private def msg(e: Exception): String =
    Option(e.getMessage).getOrElse(e.getClass.getName)

  /** run one maintenance round synchronously; never throws */
  def step(): Report = {
    val errs = Seq.newBuilder[(String, String)]
    val dropped =
      if (retentionPeriodMs <= 0) Nil
      else
        try SampleStore.dropExpiredDates(spark, storePath, nowMs() - retentionPeriodMs)
        catch { case e: Exception => errs += ("retention" -> msg(e)); Nil }
    val ds = downsampleTiers.toSeq.sortBy(_._1).map { case (iv, tier) =>
      iv -> (
        try SampleStore.downsampleNewDates(spark, storePath, tier, iv)
        catch { case e: Exception => errs += (s"downsample:$iv" -> msg(e)); Nil })
    }.toMap
    val r = Report(nowMs(), dropped, ds, errs.result())
    last = Some(r)
    r
  }

  private val stopFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
  @volatile private var thread: Thread = null

  /** start the periodic rounds (idempotent); daemon thread, errors stay
    * in the reports
    */
  def start(): Unit = synchronized {
    if (thread != null) return
    stopFlag.set(false)
    thread = new Thread(() => {
      while (!stopFlag.get()) {
        step()
        try Thread.sleep(periodMs)
        catch { case _: InterruptedException => () }
      }
    }, "graft-maintenance")
    thread.setDaemon(true)
    thread.start()
  }

  /** stop and join the round thread (a round in flight completes) */
  def stop(): Unit = synchronized {
    if (thread == null) return
    stopFlag.set(true)
    thread.interrupt()
    thread.join(30000L)
    thread = null
  }
}

object Maintenance {
  /** one round's outcome: dropped retention dates, re-downsampled dates
    * per tier interval, and (job → message) failures
    */
  final case class Report(
      atMs: Long,
      droppedDates: Seq[String],
      downsampled: Map[Long, Seq[String]],
      errors: Seq[(String, String)])
}
