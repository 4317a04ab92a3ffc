package graft.api

import graft.sources.Relabel

/** `/metric-relabel-debug` and `/target-relabel-debug` — step-by-step
  * relabeling playground (lib/promrelabel/debug.go writeRelabelDebug,
  * debug.qtpl RelabelDebugStepsJSON). `format=json` mirrors the
  * reference's JSON shape, including the per-step in/out label strings
  * with `<span>` highlights on changed labels (the vmui debugger renders
  * those directly); any other format gets a minimal HTML table over the
  * same steps.
  */
object RelabelDebug {

  private val inColor = "#D15757"
  private val outColor = "#4495e0"

  /** `name{a="b",c="d"}` / `name` / `{}` → label map with `__name__`
    * (promutil.NewLabelsFromString)
    */
  def parseMetric(metric0: String): Map[String, String] = {
    var metric = if (metric0.trim.isEmpty) "{}" else metric0.trim
    // normalizeInputLabels (debug.go:141): single line only; balanced
    // braces; brace-less `k="v", …` lists get wrapped
    if (metric.contains('\n'))
      throw new IllegalArgumentException(
        "cannot parse metric: only one time series is allowed; got multiple lines")
    val hasOpen = metric.contains('{')
    val hasClose = metric.contains('}')
    if (hasOpen != hasClose)
      throw new IllegalArgumentException(
        s"cannot parse metric: cannot unmarshal Prometheus line $metric0")
    if (!hasOpen && metric.contains('=')) metric = s"{$metric}"
    val brace = metric.indexOf('{')
    val (name, rest) =
      if (brace < 0) (metric, "")
      else (metric.take(brace).trim, metric.drop(brace))
    if (rest.nonEmpty && !rest.endsWith("}"))
      throw new IllegalArgumentException(s"cannot parse metric: missing '}' in $metric0")
    var m = Map.empty[String, String]
    if (name.nonEmpty) m += ("__name__" -> name)
    var s = if (rest.isEmpty) "" else rest.substring(1, rest.length - 1).trim
    while (s.nonEmpty) {
      val eq = s.indexOf('=')
      if (eq <= 0)
        throw new IllegalArgumentException(s"cannot parse metric: expected label=\"value\" in $s")
      val label = s.take(eq).trim
      var rem = s.drop(eq + 1).trim
      if (rem.isEmpty || (rem.head != '"' && rem.head != '\''))
        throw new IllegalArgumentException(s"cannot parse metric: missing quoted value for $label")
      val q = rem.head
      rem = rem.tail
      val sb = new StringBuilder
      var closed = false
      while (!closed) {
        if (rem.isEmpty)
          throw new IllegalArgumentException(s"cannot parse metric: unterminated value for $label")
        val c = rem.head
        rem = rem.tail
        if (c == '\\' && rem.nonEmpty && q == '"') { sb += rem.head; rem = rem.tail }
        else if (c == q) closed = true
        else sb += c
      }
      m += (label -> sb.toString)
      s = rem.trim
      if (s.startsWith(",")) s = s.tail.trim
      else if (s.nonEmpty)
        throw new IllegalArgumentException(s"cannot parse metric: expected ',' before $s")
    }
    m
  }

  /** sorted `name{k="v",…}` rendering (promrelabel.LabelsToString):
    * bare name when no other labels, `{}` when empty
    */
  def labelsToString(m: Map[String, String]): String = {
    val name = m.getOrElse("__name__", "")
    val rest = (m - "__name__").toSeq.sortBy(_._1)
    if (name.nonEmpty && rest.isEmpty) name
    else name + rest.map { case (k, v) => s"""$k=${quoteGo(v)}""" }
      .mkString("{", ",", "}")
  }

  /** Go strconv.Quote enough for label values */
  private def quoteGo(v: String): String =
    "\"" + v.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case c => c.toString
    } + "\""

  /** labels with changed ones wrapped in bold colored spans
    * (debug.qtpl:257 labelsWithHighlight); `, ` separators there vs bare
    * `,` in labelsToString — the reference templates genuinely differ
    */
  private def labelsWithHighlight(m: Map[String, String],
      changed: Set[String], color: String): String = {
    def span(s: String) = s"""<span style="font-weight:bold;color:$color">$s</span>"""
    val name = m.getOrElse("__name__", "")
    val nameStr =
      if (name.isEmpty) ""
      else if (changed("__name__")) span(name)
      else name
    val rest = (m - "__name__").toSeq.sortBy(_._1)
    if (name.nonEmpty && rest.isEmpty) nameStr
    else nameStr + rest.map { case (k, v) =>
      val s = s"""$k=${quoteGo(v)}"""
      if (changed(k)) span(s) else s
    }.mkString("{", ", ", "}")
  }

  private def changedNames(in: Map[String, String], out: Map[String, String]): Set[String] =
    (in.keySet ++ out.keySet).filter(k => in.get(k) != out.get(k))

  /** scrape URL from __scheme__/__address__/__metrics_path__/__param_*
    * (lib/promrelabel/scrape_url.go GetScrapeURL)
    */
  def scrapeUrl(m: Map[String, String]): String = {
    var scheme = m.getOrElse("__scheme__", "")
    if (scheme.isEmpty) scheme = "http"
    var metricsPath = m.getOrElse("__metrics_path__", "")
    if (metricsPath.isEmpty) metricsPath = "/metrics"
    var address = m.getOrElse("__address__", "")
    if (address.isEmpty) return ""
    if (address.startsWith("http://")) { scheme = "http"; address = address.drop(7) }
    else if (address.startsWith("https://")) { scheme = "https"; address = address.drop(8) }
    val slash = address.indexOf('/')
    if (slash >= 0) { metricsPath = address.drop(slash); address = address.take(slash) }
    if (!metricsPath.startsWith("/")) metricsPath = "/" + metricsPath
    val params = m.toSeq.collect {
      case (k, v) if k.startsWith("__param_") => k.drop("__param_".length) -> v
    }.sortBy(_._1)
    val query =
      if (params.isEmpty) ""
      else (if (metricsPath.contains("?")) "&" else "?") +
        params.map { case (k, v) =>
          java.net.URLEncoder.encode(k, "UTF-8") + "=" +
            java.net.URLEncoder.encode(v, "UTF-8")
        }.mkString("&")
    s"$scheme://$address$metricsPath$query"
  }

  /** full debug run: parse → per-rule steps → finalization steps
    * (debug.go:59 newDebugRelabelSteps)
    */
  def run(isTargetRelabel: Boolean, metric: String,
      relabelConfigs: String): (Seq[Relabel.DebugStep], String) = {
    val labels0 = parseMetric(metric)
    val rules =
      try Relabel.parseConfig(relabelConfigs)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"cannot parse relabel configs: ${e.getMessage}")
      }
    var (labels, dss) = Relabel.applyDebug(labels0, rules)
    var steps = dss
    var targetURL = ""
    if (isTargetRelabel) {
      // add missing instance from __address__, build the URL, drop ALL
      // __-prefixed labels (scrapeWorkConfig.getScrapeWork order)
      if (labels.getOrElse("instance", "").isEmpty &&
        labels.getOrElse("__address__", "").nonEmpty) {
        val in = labels
        labels += ("instance" -> labels("__address__"))
        steps :+= Relabel.DebugStep(
          "add missing instance label from __address__ label", in, labels)
      }
      targetURL = scrapeUrl(labels)
      val cleaned = labels.filter { case (k, _) => !k.startsWith("__") }
      if (cleaned != labels) {
        steps :+= Relabel.DebugStep("remove labels with __ prefix", labels, cleaned)
        labels = cleaned
      }
    } else {
      // FinalizeLabels: drop __-prefixed except __name__
      val cleaned = labels.filter { case (k, _) => !k.startsWith("__") || k == "__name__" }
      if (cleaned != labels) {
        steps :+= Relabel.DebugStep(
          "remove labels with __ prefix except of __name__", labels, cleaned)
        labels = cleaned
      }
    }
    (steps, targetURL)
  }

  /** the reference's JSON response (debug.qtpl:214 RelabelDebugStepsJSON) */
  def json(isTargetRelabel: Boolean, metric: String, relabelConfigs: String): String =
    try {
      val (steps, _) = run(isTargetRelabel, metric, relabelConfigs)
      val stepJson = steps.map { ds =>
        val changed = changedNames(ds.in, ds.out)
        s"""{"inLabels":"${Json.esc(labelsWithHighlight(ds.in, changed, inColor))}",""" +
          s""""outLabels":"${Json.esc(labelsWithHighlight(ds.out, changed, outColor))}",""" +
          s""""rule":"${Json.esc(ds.rule)}","errors":{}}"""
      }.mkString(",")
      val tail =
        if (steps.isEmpty) ""
        else s""","originalLabels":"${Json.esc(labelsToString(steps.head.in))}",""" +
          s""""resultingLabels":"${Json.esc(labelsToString(steps.last.out))}""""
      s"""{"status":"success","steps":[$stepJson]$tail}"""
    } catch {
      case e: Exception =>
        s"""{"status":"error","error":"${Json.esc(s"Error: ${e.getMessage}")}"}"""
    }

  /** minimal HTML fallback for format != json — same steps, plain table */
  def html(isTargetRelabel: Boolean, metric: String, relabelConfigs: String): String = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val title = if (isTargetRelabel) "Target relabel debug" else "Metric relabel debug"
    val body =
      try {
        val (steps, targetURL) = run(isTargetRelabel, metric, relabelConfigs)
        val rows = steps.map(ds =>
          s"<tr><td><pre>${esc(ds.rule)}</pre></td><td>${esc(labelsToString(ds.in))}</td>" +
            s"<td>${esc(labelsToString(ds.out))}</td></tr>").mkString
        val urlNote =
          if (targetURL.nonEmpty) s"<p>target URL: ${esc(targetURL)}</p>" else ""
        s"""$urlNote<table border="1"><tr><th>Rule</th><th>In</th><th>Out</th></tr>$rows</table>"""
      } catch {
        case e: Exception => s"<p>Error: ${esc(String.valueOf(e.getMessage))}</p>"
      }
    s"<!DOCTYPE html><html><head><title>$title</title></head><body><h1>$title</h1>$body</body></html>"
  }
}
