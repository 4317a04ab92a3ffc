package graft.alerting

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** vmalert-tool `unittest` core (app/vmalert-tool/unittest): synthetic
  * input series in the promtool value notation, a ticked group replay
  * (rule exec per evaluation interval, recording results written back so
  * later groups can read them), and the two assertion forms —
  * `alert_rule_test` (firing alerts at eval_time) and
  * `metricsql_expr_test` (instant samples at eval_time).
  */
object UnitTest {

  final case class ExpAlert(
      labels: Map[String, String],
      annotations: Map[String, String] = Map.empty)

  final case class AlertTest(
      evalTimeMs: Long,
      alertname: String,
      groupname: String = "",
      expAlerts: Seq[ExpAlert] = Nil)

  final case class ExpSample(labels: Map[String, String], value: Double)

  final case class ExprTest(
      expr: String,
      evalTimeMs: Long,
      expSamples: Seq[ExpSample])

  final case class TestCase(
      intervalMs: Long,
      inputSeries: Seq[(String, String)], // (selector, values notation)
      alertTests: Seq[AlertTest] = Nil,
      exprTests: Seq[ExprTest] = Nil)

  // ------------------------------------------------------------------
  // promtool value notation (unittest/input.go parseInputValue):
  // scalars, `_` omissions, `stale`, and `a+bxN` / `a-bxN` / `axN`
  // expansions
  // ------------------------------------------------------------------

  private val numRe =
    """(?i)[+x-]?(?:\d+(?:\.\d*)?|\.\d+|inf|nan|_)(?:e[+-]?\d+)?[+x-]?""".r

  def parseValues(input: String): Seq[Option[Double]] =
    parseValues(input, origin = true)

  /** `origin=false` marks the recursive inner call of the 3-part form,
    * where `axN` is an arithmetic progression a·0..a·N rather than
    * repetition (input.go parseInputValue's origin flag)
    */
  private def parseValues(input: String, origin: Boolean): Seq[Option[Double]] = {
    val out = ArrayBuffer.empty[Option[Double]]
    val items = input.trim.split("\\s+").filter(_.nonEmpty)
    require(items.nonEmpty, "values cannot be an empty string")
    items.foreach { item =>
      if (item == "stale") out += Some(Double.NaN) // staleness marker
      else {
        val vals = numRe.findAllIn(item).toSeq
        vals.length match {
          case 1 =>
            if (vals.head == "_") out += None
            else out += Some(vals.head.toDouble)
          case 2 =>
            val p1 = vals.head.dropRight(1)
            val n = vals(1).toLong
            vals.head.last match {
              case '+' => out += Some(p1.toDouble + n)
              case 'x' | 'X' =>
                if (p1 == "_") {
                  // `_xN` emits N omissions
                  (1L to n).foreach(_ => out += None)
                } else {
                  val v1 = p1.toDouble
                  if (!origin || v1 == 0)
                    (0L to n).foreach(i => out += Some(v1 * i))
                  else
                    // `axN` at top level repeats a (rewrite a+0xN)
                    (0L to n).foreach(_ => out += Some(v1))
                }
              case other => throw new IllegalArgumentException(
                s"got invalid operation '$other'")
            }
          case 3 =>
            // `v1+v2xN` / `v1-v2xN`: arithmetic progression around v1
            val sub = parseValues(vals(1) + vals(2), origin = false).flatten
            val p1 = vals.head.dropRight(1)
            val v1 = p1.toDouble
            val isAdd = vals.head.last == '+'
            sub.foreach { r =>
              out += Some(if (isAdd) r + v1 else v1 - r)
            }
          case _ => throw new IllegalArgumentException(s"unsupported input $item")
        }
      }
    }
    out.toSeq
  }

  // ------------------------------------------------------------------
  // selectors → (name, tags)
  // ------------------------------------------------------------------

  def parseSelector(s: String): (String, Map[String, String]) = {
    graft.lang.Parser.parse(s) match {
      case graft.lang.MetricExpr(filterss) if filterss.size == 1 =>
        var name = ""
        val tags = scala.collection.mutable.Map.empty[String, String]
        filterss.head.foreach { f =>
          require(!f.isNegative && !f.isRegexp,
            s"input series selector must use plain equality: $s")
          if (f.label == "__name__") name = f.value else tags(f.label) = f.value
        }
        (name, tags.toMap)
      case _ =>
        throw new IllegalArgumentException(s"got invalid input series $s")
    }
  }

  private val sampleSchema = StructType(Seq(
    StructField("name", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("ts", LongType),
    StructField("value", DoubleType)))

  def buildSamples(
      spark: SparkSession,
      input: Seq[(String, String)],
      intervalMs: Long,
      startMs: Long = 0L): Seq[Row] =
    input.flatMap { case (sel, values) =>
      val (name, tags) = parseSelector(sel)
      parseValues(values).zipWithIndex.collect {
        case (Some(v), i) => Row(name, tags, startMs + i * intervalMs, v)
      }
    }

  // ------------------------------------------------------------------
  // runner
  // ------------------------------------------------------------------

  /** Run one test case against the rule groups; returns failure
    * descriptions (empty = pass). Evaluation ticks from t=0 at the test
    * interval up to the largest eval_time; per tick each group's
    * recording rules materialize back into the store (ExecOnce + flush)
    * and each alerting rule advances its live state (execStep).
    */
  def run(
      spark: SparkSession,
      groups: Seq[Rules.RuleGroup],
      tc: TestCase): Seq[String] = {
    val failures = ArrayBuffer.empty[String]
    val baseRows = buildSamples(spark, tc.inputSeries, tc.intervalMs)
    val recorded = ArrayBuffer.empty[Row]
    def samples: DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList((baseRows ++ recorded): _*), sampleSchema)

    val maxT = (tc.alertTests.map(_.evalTimeMs) ++ tc.exprTests.map(_.evalTimeMs) :+ 0L).max
    // live alert state per (group, rule)
    var states = Map.empty[(String, String), Map[Map[String, String], Rules.AlertState]]
    // firing snapshots at requested eval times
    val firingAt = scala.collection.mutable.Map
      .empty[(Long, String, String), Seq[Map[String, String]]]
    val alertEvalTimes = tc.alertTests.map(_.evalTimeMs).toSet

    var ts = 0L
    while (ts <= maxT) {
      groups.foreach { g =>
        g.rules.foreach { r =>
          if (r.isRecording) {
            val res = graft.api.Api.query(samples, r.expr, ts, tc.intervalMs)
              .collect()
            res.foreach { row =>
              val tags0 = Option(row.getMap[String, String](1))
                .map(_.toMap).getOrElse(Map.empty)
              val tags = tags0 ++ r.labels
              recorded += Row(r.record, tags, ts, row.getDouble(3))
            }
          } else {
            val res = graft.api.Api.query(samples, r.expr, ts, tc.intervalMs)
              .collect()
              .map { row =>
                (Option(row.getMap[String, String](1)).map(_.toMap)
                  .getOrElse(Map.empty[String, String]), row.getDouble(3))
              }.toSeq
            val key = (g.name, r.alert)
            val st = Rules.execStep(r, g.name, states.getOrElse(key, Map.empty), res, ts)
            states += key -> st
            if (alertEvalTimes(ts))
              firingAt((ts, g.name, r.alert)) =
                st.collect { case (labels, a) if a.state == "firing" => labels }.toSeq
          }
        }
      }
      ts += tc.intervalMs
    }

    tc.alertTests.foreach { at =>
      val candidates = firingAt.collect {
        case ((t, gn, an), labels)
          if t == at.evalTimeMs && an == at.alertname &&
            (at.groupname.isEmpty || gn == at.groupname) => labels
      }.flatten.toSeq
      val got = candidates
        .map(_ - "alertname" - "alertgroup")
        .sortBy(_.toSeq.sorted.mkString(","))
      val exp = at.expAlerts.map(_.labels)
        .sortBy(_.toSeq.sorted.mkString(","))
      if (got != exp)
        failures += s"alert ${at.alertname} at t=${at.evalTimeMs}: " +
          s"firing $got, expected $exp"
    }

    tc.exprTests.foreach { et =>
      val res = graft.api.Api.query(samples, et.expr, et.evalTimeMs, tc.intervalMs)
        .collect()
        .map { row =>
          val tags = Option(row.getMap[String, String](1)).map(_.toMap)
            .getOrElse(Map.empty[String, String])
          val named = Option(row.getString(0)).filter(_.nonEmpty)
            .map(n => tags + ("__name__" -> n)).getOrElse(tags)
          ExpSample(named, row.getDouble(3))
        }.toSeq.sortBy(_.labels.toSeq.sorted.mkString(","))
      val exp = et.expSamples.sortBy(_.labels.toSeq.sorted.mkString(","))
      val ok = res.size == exp.size && res.zip(exp).forall { case (g, e) =>
        g.labels == e.labels && math.abs(g.value - e.value) <= math.abs(e.value) / 1e9
      }
      if (!ok)
        failures += s"expr '${et.expr}' at t=${et.evalTimeMs}: got $res, expected $exp"
    }

    failures.toSeq
  }
}
