package graft.alerting

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets

/** Alertmanager dispatch (app/vmalert/notifier/alertmanager.go): POSTs
  * the JSON alert array to `<addr>/api/v2/alerts` (the reference appends
  * alertManagerPath to the configured address at config-build time,
  * alertmanager.go:168). Request body shape per
  * alertmanager_request.qtpl: startsAt/endsAt RFC3339Nano, generatorURL,
  * labels, annotations.
  */
object Notifier {

  final case class Alert(
      labels: Map[String, String],
      annotations: Map[String, String],
      startMs: Long,
      endMs: Long = 0L, // 0 = not resolved (endsAt omitted)
      generatorURL: String = "")

  import graft.api.Json

  private def rfc3339(ms: Long): String =
    java.time.Instant.ofEpochMilli(ms).toString

  private def jstr(s: String): String = Json.str(s)

  private def jmap(m: Map[String, String]): String = Json.obj(m)

  /** render the POST body (alertmanager_request.qtpl amRequest) */
  def requestBody(alerts: Seq[Alert]): String =
    alerts.map { a =>
      val endsAt =
        if (a.endMs != 0L) s""""endsAt":${jstr(rfc3339(a.endMs))},""" else ""
      s"""{"startsAt":${jstr(rfc3339(a.startMs))},""" +
        s""""generatorURL":${jstr(a.generatorURL)},$endsAt""" +
        s""""labels":${jmap(a.labels)},"annotations":${jmap(a.annotations)}}"""
    }.mkString("[", ",", "]")
}

/** One Alertmanager endpoint. `addr` is the base address; the AM v2
  * alerts path is appended unless already present.
  */
final class Notifier(addr: String, timeoutMs: Int = 10000) {
  import Notifier._

  private val alertManagerPath = "/api/v2/alerts"
  private val url: String =
    if (addr.endsWith(alertManagerPath)) addr
    else addr.stripSuffix("/") + alertManagerPath

  @volatile private var lastErrorMsg: String = ""

  def lastError: String = lastErrorMsg

  /** full delivery URL, the reference's Target.Addr() (notifier/init.go:288) */
  def address: String = url

  /** POST the alerts; errors are recorded (lastError), not thrown —
    * the reference's Send swallows send errors into metrics/lastError
    * so one dead Alertmanager doesn't stop the eval loop.
    */
  def send(alerts: Seq[Alert]): Boolean = {
    if (alerts.isEmpty) return true
    try {
      val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val body = requestBody(alerts).getBytes(StandardCharsets.UTF_8)
      conn.getOutputStream.write(body)
      conn.getOutputStream.close()
      val rc = conn.getResponseCode
      // >= 400 makes getInputStream throw; drain the matching stream so
      // the structured error below is reached and the connection is
      // reusable
      val stream =
        if (rc >= 400) Option(conn.getErrorStream)
        else Option(conn.getInputStream)
      stream.foreach(s => { s.readAllBytes(); s.close() })
      conn.disconnect()
      if (rc / 100 == 2) { lastErrorMsg = ""; true }
      else {
        lastErrorMsg = s"unexpected response code $rc from $url"
        false
      }
    } catch {
      case e: Exception =>
        lastErrorMsg = String.valueOf(e.getMessage)
        false
    }
  }
}
