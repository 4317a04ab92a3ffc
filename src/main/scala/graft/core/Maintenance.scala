package graft.core

import org.apache.spark.sql.SparkSession

/** Background store maintenance — the engine-side analog of the
  * reference's per-table watcher goroutines: the retention watcher drops
  * whole out-of-retention partitions on a jittered one-minute ticker
  * (`lib/storage/table.go:446-485`) and downsampling runs inside
  * background merges (`lib/storage/partition.go:535` +
  * `-downsampling.period`). Here one round is `step()` — retention
  * partition-drop first, then every derivation trails the flat store:
  * the tag index (`SampleStore.indexNewDates`), the bucketized layout
  * (`bucketizeNewDates`, which carries its own index), and each
  * downsample tier (`downsampleNewDates`) — so a date dropped by
  * retention propagates OUT of all of them in the same round (each
  * trailing job removes partitions for vanished source dates).
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
    nowMs: () => Long = () => System.currentTimeMillis(),
    // flat-store tag index to trail per changed date
    // (SampleStore.indexNewDates; the bucketized layout's index rides
    // the bucketize job instead)
    tagIndexPath: Option[String] = None,
    // bucketized layout to trail (table name, table path, bucket count)
    // — bucketizeNewDates also maintains ITS tag index and sheds
    // retention-dropped dates
    bucketize: Option[Maintenance.BucketizeTarget] = None,
    // called after every round with its report — the facade hooks its
    // frame refreshes here (e.g. re-read the tag index the round rewrote)
    afterRound: Maintenance.Report => Unit = _ => ()) {
  require(periodMs > 0, s"maintenance period must be positive (got $periodMs)")

  import Maintenance.Report

  @volatile private var last: Option[Report] = None
  @volatile private var rounds: Long = 0L
  @volatile private var errorsTotal: Long = 0L

  /** the most recent round's report (None before the first round) */
  def lastReport: Option[Report] = last

  /** rounds completed since construction (the /metrics counter) */
  def roundsRun: Long = rounds

  /** cumulative failed-job count across all rounds */
  def errorCount: Long = errorsTotal

  private def msg(e: Exception): String =
    Option(e.getMessage).getOrElse(e.getClass.getName)

  /** run one maintenance round synchronously; never throws. Order:
    * retention drop first, then every derivation trails the store —
    * index, bucketized layout, downsample tiers — so a dropped date
    * propagates out of all of them in the same round.
    */
  def step(): Report = {
    val errs = Seq.newBuilder[(String, String)]
    val dropped =
      if (retentionPeriodMs <= 0) Nil
      else
        try SampleStore.dropExpiredDates(spark, storePath, nowMs() - retentionPeriodMs)
        catch { case e: Exception => errs += ("retention" -> msg(e)); Nil }
    // one fingerprint walk per round (computed AFTER the retention drop
    // so every trailing job sees the post-drop truth) — each job would
    // otherwise re-list every date dir, the round's dominant request
    // cost on an object store
    val prints =
      try Some(SampleStore.storeDateFingerprints(spark, storePath))
      catch { case e: Exception => errs += ("fingerprints" -> msg(e)); None }
    val indexed = tagIndexPath.toSeq.flatMap { p =>
      try SampleStore.indexNewDates(spark, storePath, p, fingerprints = prints)
      catch { case e: Exception => errs += ("tagindex" -> msg(e)); Nil }
    }
    val bucketized = bucketize.toSeq.flatMap { b =>
      try SampleStore.bucketizeNewDates(spark, storePath, b.table, b.tablePath,
        b.buckets, fingerprints = prints)
      catch { case e: Exception => errs += ("bucketize" -> msg(e)); Nil }
    }
    val ds = downsampleTiers.toSeq.sortBy(_._1).map { case (iv, tier) =>
      iv -> (
        try SampleStore.downsampleNewDates(spark, storePath, tier, iv,
          fingerprints = prints)
        catch { case e: Exception => errs += (s"downsample:$iv" -> msg(e)); Nil })
    }.toMap
    val r = Report(nowMs(), dropped, indexed, bucketized, ds, errs.result())
    last = Some(r)
    rounds += 1
    errorsTotal += r.errors.length
    try afterRound(r)
    catch { case _: Exception => () } // observer hook: never kills the loop
    r
  }

  // Each start() gets its OWN stop flag, captured by that run's closure:
  // a stop() whose 30 s join timed out on a long Spark round must not
  // leave a zombie that resumes when a later start() resets a SHARED
  // flag — two concurrent loops would clobber each other's manifests.
  @volatile private var stopFlag: java.util.concurrent.atomic.AtomicBoolean = null
  @volatile private var thread: Thread = null

  /** start the periodic rounds (idempotent); daemon thread. A round that
    * dies on a non-Exception Throwable (driver OOM, linkage error) is
    * surfaced as a synthetic error report and the loop CONTINUES — a
    * silently-dead maintenance thread under a healthy-looking
    * /internal/maintenance is worse than a retried round.
    */
  def start(): Unit = synchronized {
    if (thread != null) return
    val flag = new java.util.concurrent.atomic.AtomicBoolean(false)
    stopFlag = flag
    thread = new Thread(() => {
      while (!flag.get()) {
        try step()
        catch {
          case t: Throwable =>
            last = Some(Report(
              try nowMs() catch { case _: Exception => 0L },
              Nil, Nil, Nil, Map.empty,
              Seq("round" -> Option(t.getMessage).getOrElse(t.getClass.getName))))
        }
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
  /** one round's outcome: dropped retention dates, re-indexed and
    * re-bucketized dates, re-downsampled dates per tier interval, and
    * (job → message) failures
    */
  final case class Report(
      atMs: Long,
      droppedDates: Seq[String],
      indexed: Seq[String],
      bucketized: Seq[String],
      downsampled: Map[Long, Seq[String]],
      errors: Seq[(String, String)])

  /** a bucketized layout for the round to trail */
  final case class BucketizeTarget(table: String, tablePath: String, buckets: Int = 8)
}
