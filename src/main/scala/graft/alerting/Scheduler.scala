package graft.alerting

import org.apache.spark.sql.DataFrame

import scala.collection.mutable

/** The vmalert I/O loop (app/vmalert/group.go eval loop +
  * app/vmalert/remotewrite write-back): on each `step(now)`, every
  * group whose interval has elapsed is evaluated against the live
  * store —
  *
  *  - recording rules run as instant queries and their results are
  *    appended back to the store via `append`, so they are queryable
  *    from the NEXT round on (remote-write visibility, not same-round);
  *  - alerting rules advance the same live state machine as
  *    [[Rules.execStep]], and the round's firing alerts (plus the ones
  *    that just resolved, with endsAt set) are POSTed to the notifier
  *    in the Alertmanager API shape.
  *
  * Evaluation is driver-orchestrated but each rule's query is a full
  * Spark plan over the store — the loop scales with rule count and
  * alert cardinality, the data-scale work stays distributed.
  */
final class Scheduler(
    groups: Seq[Rules.RuleGroup],
    getSamples: () => DataFrame,
    append: Seq[(String, Map[String, String], Long, Double)] => Unit,
    notifier: Option[Notifier] = None) {

  Rules.validate(groups)

  /** configured notification targets, for /api/v1/notifiers (web.go:674) */
  def notifierTargets: Seq[Notifier] = notifier.toSeq

  // live alert state per (group, rule-name)
  private var states =
    Map.empty[(String, String), Map[Map[String, String], Rules.AlertState]]
  private val lastEval = mutable.Map.empty[String, Long]
  // last evaluation error per (group, rule-name); cleared on success
  private val errors = mutable.Map.empty[(String, String), String]
  // per-rule telemetry of the latest round, for the ApiRule fields
  // lastSamples/evaluationTime/lastEvaluation (rule/web.go:85-133)
  private val ruleStats = mutable.Map.empty[(String, String), Scheduler.RuleStat]

  /** per-rule evaluation errors from the latest rounds */
  def lastErrors(): Map[(String, String), String] = errors.toMap

  /** latest-round telemetry for one rule */
  def ruleStat(group: String, rule: String): Option[Scheduler.RuleStat] =
    ruleStats.get((group, rule))

  /** wall time of the group's last evaluation round */
  def lastEvalMs(group: String): Option[Long] = lastEval.get(group)

  /** all current alert instances: (group, rule, labels, state) */
  def activeAlerts(): Seq[(String, String, Map[String, String], Rules.AlertState)] =
    states.toSeq.flatMap { case ((g, r), m) =>
      m.toSeq.map { case (lbls, st) => (g, r, lbls, st) }
    }

  /** pending/firing instances with expanded annotations, for the
    * Prometheus-shaped /api/v1/alerts rendering
    */
  def apiAlerts(): Seq[(Map[String, String], Map[String, String], Rules.AlertState)] = {
    val ruleByName = groups.flatMap(g =>
      g.rules.filter(!_.isRecording).map(r => (g.name, r.alert) -> r)).toMap
    activeAlerts()
      .filter { case (_, _, _, st) => st.state == "pending" || st.state == "firing" }
      .map { case (g, rn, lbls, st) =>
        val ann = ruleByName.get((g, rn)).map(_.annotations.map { case (k, v) =>
          k -> Rules.expandTemplate(v, lbls, st.value, ruleByName((g, rn)).expr)
        }).getOrElse(Map.empty[String, String])
        (lbls, ann, st)
      }
  }

  /** Reinstate pending alerts' activeAt from the `ALERTS_FOR_STATE`
    * series written by a previous Scheduler over the same store
    * (alerting.go:808 restore; group.go:439 calls it after the FIRST
    * evaluation so only currently-active alerts can be restored — call
    * this after one `step()`). Without it, a restart silently resets
    * every `for:`-pending clock and alerts re-wait their full delay.
    *
    * Only rules with `for: > 0` and at least one live alert are queried;
    * only pending, not-yet-restored instances are patched; matching is
    * on the full merged label set, exactly the hash match the reference
    * performs.
    */
  def restore(nowMs: Long, lookbackMs: Long = 60 * 60 * 1000L): Unit = {
    val samples = getSamples()
    groups.foreach { g =>
      g.rules.filter(r => !r.isRecording && r.forMs > 0).foreach { r =>
        val key = (g.name, r.alert)
        val live = states.getOrElse(key, Map.empty)
        if (live.exists { case (_, st) => st.state == "pending" && !st.restored }) {
          def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
          val nameFilter =
            (if (g.name.nonEmpty) Seq(s"alertgroup=${q(g.name)}") else Nil) :+
              s"alertname=${q(r.alert)}"
          // labels whose value is a template can't be matched literally
          // (reference issue 9305) — the full-labelset match below still
          // guards correctness
          val labelFilter = r.labels.toSeq.collect {
            case (k, v) if !(v.contains("{{") && v.contains("}}")) =>
              s"$k=${q(v)}"
          }
          val expr = s"default_rollup(ALERTS_FOR_STATE{" +
            (nameFilter ++ labelFilter).mkString(",") +
            s"}[${math.max(1L, lookbackMs / 1000)}s])"
          // query at now-1s so the current run's own write-back is not
          // read (reference issue 10335)
          try {
            val res = graft.api.Api.query(samples, expr, nowMs - 1000L, g.intervalMs)
              .collect()
              .map { row =>
                (Option(row.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty),
                  row.getDouble(3))
              }
            var next = live
            res.foreach { case (tags, activeAtSec) =>
              next.get(tags) match {
                case Some(st) if st.state == "pending" && !st.restored =>
                  next += tags -> st.copy(
                    activeAtMs = (activeAtSec * 1000).toLong, restored = true)
                case _ =>
              }
            }
            states += key -> next
          } catch {
            case e: Exception =>
              errors(key) = s"failed to execute restore query: ${String.valueOf(e.getMessage)}"
          }
        }
      }
    }
  }

  /** evaluate every group due at `nowMs`; returns the evaluated group
    * names (empty when nothing was due)
    */
  def step(nowMs: Long): Seq[String] = {
    val due = groups.filter(g =>
      lastEval.get(g.name).forall(last => nowMs - last >= g.intervalMs))
    due.foreach(evalGroup(_, nowMs))
    due.map(_.name)
  }

  private def evalGroup(g: Rules.RuleGroup, nowMs: Long): Unit = {
    lastEval(g.name) = nowMs
    val samples = getSamples()
    val recorded = Seq.newBuilder[(String, Map[String, String], Long, Double)]
    val toNotify = Seq.newBuilder[Notifier.Alert]
    // Per-rule error isolation (the reference's eval loop stores the
    // error on the rule and keeps going — rule.go exec): one failing
    // rule (duplicate-label errDuplicate, a transient query failure)
    // must not abort the rest of the group, the other due groups, or
    // the caller's scheduling loop.
    g.rules.foreach { r =>
      val key = (g.name, if (r.isRecording) r.record else r.alert)
      val t0 = System.nanoTime()
      def recordStat(samplesN: Int): Unit =
        ruleStats(key) = Scheduler.RuleStat(samplesN,
          (System.nanoTime() - t0) / 1e6, nowMs)
      try {
        val res = graft.api.Api.query(samples, r.expr, nowMs, g.intervalMs)
          .collect()
          .map { row =>
            (Option(row.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty),
              row.getDouble(3))
          }.toSeq
        if (r.isRecording) {
          // recording.go toTimeSeries: rule labels override series labels
          val rows = res.map { case (tags, v) =>
            (r.record, tags ++ r.labels, nowMs, v)
          }
          // recording.go errDuplicate: two source series collapsing onto
          // the same labelset after the rule-label overlay is a rule
          // error, not a silent double-append
          val dup = rows.groupBy { case (n, tags, _, _) => (n, tags) }
            .collectFirst { case ((_, tags), rs) if rs.size > 1 => tags }
          dup match {
            case Some(tags) =>
              throw new IllegalStateException(
                s"labels $tags: produced non-unique timeseries (errDuplicate)")
            case None => recorded ++= rows
          }
        } else {
          val prev = states.getOrElse(key, Map.empty)
          val next = Rules.execStep(r, g.name, prev, res, nowMs)
          states += key -> next
          next.foreach { case (lbls, st) =>
            val ann = r.annotations.map { case (k, v) =>
              k -> Rules.expandTemplate(v, lbls, st.value, r.expr)
            }
            if (st.state == "firing")
              // active alerts carry endsAt = now + 4×interval (vmalert's
              // resolveDuration, main.go) so Alertmanager auto-resolves
              // them if this ruler dies instead of waiting out its own
              // resolve_timeout
              toNotify += Notifier.Alert(lbls, ann, st.activeAtMs,
                endMs = nowMs + 4 * math.max(g.intervalMs, 1000L))
            else if (st.state == "inactive" && st.resolvedAtMs == nowMs)
              toNotify += Notifier.Alert(lbls, ann, st.activeAtMs, endMs = st.resolvedAtMs)
            // alertToTimeSeries write-back (alerting.go:376): ALERTS with
            // the alertstate label, ALERTS_FOR_STATE with activeAt unix
            // seconds — the latter is what restore() reads after a restart
            if (st.state == "pending" || st.state == "firing") {
              recorded += (("ALERTS", lbls + ("alertstate" -> st.state), nowMs, 1.0))
              recorded += (("ALERTS_FOR_STATE", lbls, nowMs,
                math.floor(st.activeAtMs / 1000.0)))
            }
          }
        }
        errors -= key
        recordStat(res.size)
      } catch {
        case e: Exception =>
          errors(key) = String.valueOf(e.getMessage)
          recordStat(0)
      }
    }
    val rec = recorded.result()
    if (rec.nonEmpty) append(rec)
    val alerts = toNotify.result()
    if (alerts.nonEmpty) notifier.foreach(_.send(alerts))
  }
}

object Scheduler {
  /** one rule's latest-round telemetry: result rows, eval wall ms, at */
  final case class RuleStat(samples: Int, durationMs: Double, atMs: Long)
}
