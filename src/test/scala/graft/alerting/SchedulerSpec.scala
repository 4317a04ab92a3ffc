package graft.alerting

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer
import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** e2e for the vmalert I/O loop: rule fires → the Alertmanager-shaped
  * webhook stub receives the alert JSON; recording results are appended
  * to the store and queryable on the next round.
  */
class SchedulerSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("name", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("ts", LongType),
    StructField("value", DoubleType)))

  private def mkStore(rows: ArrayBuffer[Row]): () => DataFrame =
    () => spark.createDataFrame(java.util.Arrays.asList(rows.toSeq: _*), schema)

  test("scheduler: recording write-back is queryable next round") {
    val rows = ArrayBuffer[Row](
      Row("m", Map("job" -> "a"), 0L, 10.0),
      Row("m", Map("job" -> "a"), 60000L, 20.0))
    val sched = new Scheduler(
      Seq(Rules.RuleGroup("g", 60000L, Seq(
        Rules.Rule(record = "rec:m", expr = "m", labels = Map("src" -> "rec"))))),
      mkStore(rows),
      app => rows ++= app.map { case (n, t, ts, v) => Row(n, t, ts, v) })
    assert(sched.step(60000L) == Seq("g"))
    // the recorded series landed in the store with rule labels merged
    assert(rows.exists(r => r.getString(0) == "rec:m" &&
      r.getLong(2) == 60000L && r.getDouble(3) == 20.0 &&
      r.getMap[String, String](1).toMap == Map("job" -> "a", "src" -> "rec")))
    // not due again at the same instant
    assert(sched.step(60000L).isEmpty)
    // next round can query the recording result
    val res = graft.api.Api.query(mkStore(rows)(), "rec:m", 120000L, 60000L).collect()
    assert(res.length == 1 && res.head.getDouble(3) == 20.0)
  }

  test("scheduler: a failing rule is isolated and recorded, others still run") {
    // two series collapse onto identical alert labels -> execStep throws
    // errDuplicate for the first rule; the second rule must still run
    val rows = ArrayBuffer[Row](
      Row("m", Map("job" -> "a"), 60000L, 10.0),
      Row("m", Map("job" -> "b"), 60000L, 20.0))
    val sched = new Scheduler(
      Seq(Rules.RuleGroup("g", 60000L, Seq(
        Rules.Rule(alert = "Dup", expr = "m > 0", labels = Map("job" -> "x")),
        Rules.Rule(record = "good:rec", expr = "sum(m)")))),
      mkStore(rows),
      app => rows ++= app.map { case (n, t, ts, v) => Row(n, t, ts, v) })
    assert(sched.step(60000L) == Seq("g"))
    assert(sched.lastErrors().keySet == Set(("g", "Dup")))
    assert(sched.lastErrors()(("g", "Dup")).contains("not unique"))
    assert(rows.exists(r => r.getString(0) == "good:rec" && r.getDouble(3) == 30.0))
  }

  test("scheduler: recording rule collapsing series is errDuplicate, not double-append") {
    val rows = ArrayBuffer[Row](
      Row("m", Map("job" -> "a"), 60000L, 10.0),
      Row("m", Map("job" -> "b"), 60000L, 20.0))
    val sched = new Scheduler(
      Seq(Rules.RuleGroup("g", 60000L, Seq(
        // the job override collapses both series onto one labelset
        Rules.Rule(record = "rec:m", expr = "m", labels = Map("job" -> "x"))))),
      mkStore(rows),
      app => rows ++= app.map { case (n, t, ts, v) => Row(n, t, ts, v) })
    sched.step(60000L)
    assert(sched.lastErrors()(("g", "rec:m")).contains("errDuplicate"))
    assert(!rows.exists(_.getString(0) == "rec:m"))
  }

  test("scheduler: restore reinstates pending activeAt from ALERTS_FOR_STATE") {
    val rows = ArrayBuffer[Row](Row("errors", Map("job" -> "api"), 60000L, 42.0))
    val store = mkStore(rows)
    val append: Seq[(String, Map[String, String], Long, Double)] => Unit =
      app => rows ++= app.map { case (n, t, ts, v) => Row(n, t, ts, v) }
    val groups = Seq(Rules.RuleGroup("g", 60000L, Seq(
      Rules.Rule(alert = "HighErrors", expr = "errors > 10", forMs = 120000L))))

    val first = new Scheduler(groups, store, append)
    first.step(60000L) // pending, activeAt=60000; writes ALERTS_FOR_STATE
    assert(rows.exists(r => r.getString(0) == "ALERTS_FOR_STATE" &&
      r.getDouble(3) == 60.0))
    assert(rows.exists(r => r.getString(0) == "ALERTS" &&
      r.getMap[String, String](1).toMap.get("alertstate").contains("pending")))

    // "restart": a fresh Scheduler over the same store. The series is
    // still failing at the next round.
    rows += Row("errors", Map("job" -> "api"), 120000L, 42.0)
    val second = new Scheduler(groups, store, append)
    second.step(120000L) // fresh pending with activeAt=120000
    second.restore(120000L)
    val st = second.activeAlerts().collectFirst {
      case (_, "HighErrors", _, s) => s
    }.get
    assert(st.state == "pending" && st.activeAtMs == 60000L && st.restored)

    // for: has now truly elapsed since the ORIGINAL activeAt — fires
    // without re-waiting
    rows += Row("errors", Map("job" -> "api"), 180000L, 42.0)
    second.step(180000L)
    assert(second.activeAlerts().exists { case (_, r, _, s) =>
      r == "HighErrors" && s.state == "firing" })

    // a third scheduler without restore would still be pending at 180000
    val third = new Scheduler(groups, store, append)
    third.step(180000L)
    assert(third.activeAlerts().forall { case (_, _, _, s) => s.state == "pending" })
  }

  test("scheduler: firing alert POSTs Alertmanager JSON to the webhook") {
    val bodies = ArrayBuffer.empty[String]
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/v2/alerts", ex => {
      bodies.synchronized {
        bodies += new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      }
      ex.sendResponseHeaders(200, 2)
      ex.getResponseBody.write("ok".getBytes)
      ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val rows = ArrayBuffer[Row](
        Row("errors", Map("job" -> "api"), 60000L, 42.0))
      val sched = new Scheduler(
        Seq(Rules.RuleGroup("g", 60000L, Seq(
          Rules.Rule(alert = "HighErrors", expr = "errors > 10",
            annotations = Map("summary" -> "errors at {{ $value }}"))))),
        mkStore(rows),
        _ => (),
        Some(new Notifier(s"http://127.0.0.1:$port")))
      sched.step(60000L)
      assert(bodies.size == 1)
      val b = bodies.head
      assert(b.contains(""""alertname":"HighErrors""""))
      assert(b.contains(""""alertgroup":"g""""))
      assert(b.contains(""""job":"api""""))
      assert(b.contains(""""summary":"errors at 42""""))
      assert(b.contains(""""startsAt":"1970-01-01T00:01:00Z""""))
      // active alerts carry endsAt = now + 4×interval (resolveDuration)
      assert(b.contains(""""endsAt":"1970-01-01T00:05:00Z""""))
      val firing = sched.activeAlerts()
      assert(firing.exists { case (_, r, _, st) =>
        r == "HighErrors" && st.state == "firing" })
      // /api/v1/alerts rendering from the live scheduler state
      val aj = graft.api.Api.alerts(sched)
      assert(aj.contains(""""alertname":"HighErrors""""))
      assert(aj.contains(""""state":"firing""""))
      assert(aj.contains(""""summary":"errors at 42""""))
      assert(aj.contains(""""value":"42""""))

      // series gone → alert resolves; webhook gets endsAt
      rows.clear()
      rows += Row("errors", Map("job" -> "api"), 120000L, 1.0)
      sched.step(120000L)
      assert(bodies.size == 2)
      assert(bodies(1).contains(""""endsAt":"1970-01-01T00:02:00Z""""))
    } finally server.stop(0)
  }
}
