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
      assert(!b.contains("endsAt"))
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
