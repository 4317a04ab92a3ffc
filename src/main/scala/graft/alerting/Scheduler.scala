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

  // live alert state per (group, rule-name)
  private var states =
    Map.empty[(String, String), Map[Map[String, String], Rules.AlertState]]
  private val lastEval = mutable.Map.empty[String, Long]
  // last evaluation error per (group, rule-name); cleared on success
  private val errors = mutable.Map.empty[(String, String), String]

  /** per-rule evaluation errors from the latest rounds */
  def lastErrors(): Map[(String, String), String] = errors.toMap

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
      try {
        val res = graft.api.Api.query(samples, r.expr, nowMs, g.intervalMs)
          .collect()
          .map { row =>
            (Option(row.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty),
              row.getDouble(3))
          }.toSeq
        if (r.isRecording) {
          // recording.go toTimeSeries: rule labels override series labels
          res.foreach { case (tags, v) =>
            recorded += ((r.record, tags ++ r.labels, nowMs, v))
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
              toNotify += Notifier.Alert(lbls, ann, st.activeAtMs)
            else if (st.state == "inactive" && st.resolvedAtMs == nowMs)
              toNotify += Notifier.Alert(lbls, ann, st.activeAtMs, endMs = st.resolvedAtMs)
          }
        }
        errors -= key
      } catch {
        case e: Exception => errors(key) = String.valueOf(e.getMessage)
      }
    }
    val rec = recorded.result()
    if (rec.nonEmpty) append(rec)
    val alerts = toNotify.result()
    if (alerts.nonEmpty) notifier.foreach(_.send(alerts))
  }
}
