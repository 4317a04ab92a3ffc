package graft.alerting

import graft.SparkSpec
import graft.core.GridSpec
import org.apache.spark.sql.DataFrame

/** vmalert rule semantics in replay form (rule/alerting.go execRange,
  * rule/recording.go, config/config.go): YAML group parsing, recording
  * rename + label overlay + duplicate detection, the pending→firing
  * state machine with gap resets, `for: 0` always-firing, label
  * templating, and the ALERTS_FOR_STATE activeAt series.
  */
class RulesSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000L
  // counter series: user 1 high (always > 10), user 2 crosses at t>=3h
  private lazy val samples: DataFrame = {
    val rows = for {
      u <- Seq(1, 2)
      i <- 0 until 10
    } yield {
      val v = if (u == 1) 100.0 else if (i >= 3 && i != 6) 50.0 else 1.0
      ("m", Map("user" -> u.toString), i * H, v)
    }
    rows.toDF("name", "tags", "ts", "value")
  }
  private val grid = GridSpec(0L, 10 * H, H)

  test("parseConfig: groups, intervals, rules, nested labels/annotations") {
    val groups = Rules.parseConfig(
      """groups:
        |  - name: g1
        |    interval: 30s
        |    rules:
        |      - record: job:m:avg
        |        expr: avg_over_time(m[1h])
        |        labels:
        |          team: core
        |      - alert: High
        |        expr: m > 10
        |        for: 2h
        |        keep_firing_for: 1h
        |        labels:
        |          severity: page
        |        annotations:
        |          summary: "value is {{ $value }}"
        |  - name: g2
        |    rules:
        |      - alert: Always
        |        expr: m
        |""".stripMargin)
    assert(groups.size == 2)
    assert(groups.head.name == "g1" && groups.head.intervalMs == 30000L)
    val Seq(rec, al) = groups.head.rules
    assert(rec.record == "job:m:avg" && rec.labels == Map("team" -> "core"))
    assert(al.alert == "High" && al.forMs == 2 * H && al.keepFiringForMs == H)
    assert(al.annotations("summary") == "value is {{ $value }}")
    assert(groups(1).name == "g2" && groups(1).rules.head.forMs == 0L)
  }

  test("recording rule renames and overlays labels") {
    val r = Rules.Rule(record = "job:m:avg", expr = "avg_over_time(m[1h])",
      labels = Map("team" -> "core"))
    val out = Rules.recordingRange(samples, r, grid).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getString(0) == "job:m:avg"))
    val tags = out.head.getMap[String, String](1)
    assert(tags("team") == "core" && tags.contains("user"))
  }

  test("recording rule duplicate collapse errors (errDuplicate)") {
    // overriding the only distinguishing label collapses both users
    val r = Rules.Rule(record = "dup", expr = "avg_over_time(m[1h])",
      labels = Map("user" -> "x"))
    intercept[IllegalStateException] {
      Rules.recordingRange(samples, r, grid).collect()
    }
  }

  test("alerting state machine: pending until `for` held, gap resets") {
    val r = Rules.Rule(alert = "High", expr = "avg_over_time(m[1h]) > 10",
      forMs = 2 * H)
    val out = Rules.alertingRange(samples, r, "g", H, grid)
      .filter("name = 'ALERTS'").collect()
      .map(x => (x.getMap[String, String](1)("user"),
        x.getLong(2), x.getMap[String, String](1)("alertstate")))
      .toSet
    // user 1: active from t=0 (the (t-1h, t] window holds the sample at
    // 0), fires once 2h have elapsed
    assert(out(("1", 0L, "pending")))
    assert(out(("1", 1 * H, "pending")))
    assert(out(("1", 2 * H, "firing")))
    // user 2: condition holds 3h..5h, gap at 6h (low value), resumes 7h..
    assert(out(("2", 3 * H, "pending")))
    assert(out(("2", 4 * H, "pending")))
    assert(out(("2", 5 * H, "firing")))
    assert(!out.exists(e => e._1 == "2" && e._2 == 6 * H)) // no data point
    assert(out(("2", 7 * H, "pending"))) // gap reset a new activation
    assert(out(("2", 9 * H, "firing")))
    val alertnames = Rules.alertingRange(samples, r, "g", H, grid)
      .filter("name = 'ALERTS'").select("tags").head.getMap[String, String](0)
    assert(alertnames("alertname") == "High" && alertnames("alertgroup") == "g")
  }

  test("for: 0 fires immediately; ALERTS_FOR_STATE carries activeAt secs") {
    val r = Rules.Rule(alert = "Now", expr = "avg_over_time(m[1h]) > 10")
    val df = Rules.alertingRange(samples, r, "g", H, grid)
    val states = df.filter("name = 'ALERTS'").collect()
      .map(_.getMap[String, String](1)("alertstate")).toSet
    assert(states == Set("firing"))
    val fs = df.filter("name = 'ALERTS_FOR_STATE'").collect()
      .map(x => (x.getMap[String, String](1)("user"), x.getLong(2), x.getDouble(3)))
    // user 1 is active from grid t=0 → activeAt = 0s
    assert(fs.filter(_._1 == "1").minBy(_._2)._3 == 0.0)
  }

  test("label templates expand $labels/$value/$expr") {
    val r = Rules.Rule(alert = "T", expr = "avg_over_time(m[1h]) > 10",
      labels = Map("who" -> "u{{ $labels.user }}", "v" -> "{{ $value }}"))
    val tags = Rules.alertingRange(samples, r, "g", H, grid)
      .filter("name = 'ALERTS'")
      .filter("tags['user'] = '1'").select("tags").head.getMap[String, String](0)
    assert(tags("who") == "u1")
    assert(tags("v") == "100") // first value of the range result
  }

  test("ported TestAlertingRuleExecRange state vectors (alerting_test.go:583)") {
    // (name, forSec, intervalSec, series: (labels, ts-seconds),
    //  expected per point in series order: (state, activeAt-seconds))
    val vectors = Seq(
      ("empty-labels", 0L, 0L,
        Seq((Map.empty[String, String], Seq(1L))),
        Seq(("firing", 1L))),
      ("single-firing-on-range", 0L, 0L,
        Seq((Map.empty[String, String], Seq(1000L, 2000L, 3000L))),
        Seq(("firing", 1000L), ("firing", 2000L), ("firing", 3000L))),
      ("for-pending", 1L, 1L,
        Seq((Map.empty[String, String], Seq(1L, 3L, 5L))),
        Seq(("pending", 1L), ("pending", 3L), ("pending", 5L))),
      ("for-firing", 3L, 3L,
        Seq((Map.empty[String, String], Seq(1L, 3L, 5L))),
        Seq(("pending", 1L), ("pending", 1L), ("firing", 1L))),
      ("for-hold-pending", 1L, 1L,
        Seq((Map.empty[String, String], Seq(1L, 2L, 5L))),
        Seq(("pending", 1L), ("firing", 1L), ("pending", 5L))),
      ("firing-activeAt-reset", 0L, 1L,
        Seq((Map.empty[String, String], Seq(1L, 4L, 5L, 6L))),
        Seq(("firing", 1L), ("firing", 4L), ("firing", 4L), ("firing", 4L))),
      ("for-cycle", 1L, 1L,
        Seq((Map.empty[String, String], Seq(1L, 2L, 5L, 6L, 20L))),
        Seq(("pending", 1L), ("firing", 1L), ("pending", 5L),
          ("firing", 5L), ("pending", 20L))),
      ("multi-series", 3L, 3L,
        Seq(
          (Map.empty[String, String], Seq(1L, 3L, 5L)),
          (Map("foo" -> "bar"), Seq(1L, 5L))),
        Seq(("pending", 1L), ("pending", 1L), ("firing", 1L),
          ("pending", 1L), ("pending", 5L))))
    for ((nm, forSec, intervalSec, series, expected) <- vectors) {
      val rows = series.flatMap { case (labels, ts) =>
        ts.map(t => ("", labels, t * 1000L, 1.0))
      }
      val res = rows.toDF("name", "tags", "t", "value")
      val rule = Rules.Rule(alert = nm, forMs = forSec * 1000)
      val out = Rules.alertSeries(res, rule, "", intervalSec * 1000)
      val alerts = out.filter("name = 'ALERTS'").collect()
        .map(r => ((r.getMap[String, String](1) - "alertname" - "alertstate").toMap,
          r.getLong(2), r.getMap[String, String](1)("alertstate")))
        .toSet
      val forStates = out.filter("name = 'ALERTS_FOR_STATE'").collect()
        .map(r => ((r.getMap[String, String](1) - "alertname").toMap,
          r.getLong(2), r.getDouble(3)))
        .toSet
      val expPoints = series.flatMap { case (labels, ts) => ts.map(labels -> _) }
      expPoints.zip(expected).foreach { case ((labels, t), (state, activeAt)) =>
        assert(alerts((labels, t * 1000, state)),
          s"$nm: expected $state at t=$t for $labels; got $alerts")
        assert(forStates((labels, t * 1000, activeAt.toDouble)),
          s"$nm: expected activeAt=$activeAt at t=$t for $labels; got $forStates")
      }
      // no alertgroup label when the group is unnamed
      assert(out.filter("tags['alertgroup'] IS NOT NULL").isEmpty)
    }
  }

  test("ported TestAlertingRule_Exec live state vectors (alerting_test.go:210)") {
    val step = 5L // defaultStep = 5ms
    val foo = Map("name" -> "foo")
    // (name, forMs, keepFiringForMs,
    //  steps: present label-sets per round,
    //  expected states per round: labelset -> state; None = don't check)
    val vectors: Seq[(String, Long, Long, Seq[Seq[Map[String, String]]],
        Seq[Option[Map[Map[String, String], String]]])] = Seq(
      ("firing-inactive-cycle", 0L, 0L,
        Seq(Seq(foo), Nil, Seq(foo), Nil, Nil),
        Seq(Some(Map(foo -> "firing")), Some(Map(foo -> "inactive")),
          Some(Map(foo -> "firing")), Some(Map(foo -> "inactive")),
          Some(Map(foo -> "inactive")))),
      ("multiple-steps-firing", 0L, 0L,
        Seq(Seq(foo), Seq(Map("name" -> "foo1")), Seq(Map("name" -> "foo2"))),
        Seq(
          Some(Map(foo -> "firing")),
          Some(Map(foo -> "inactive", Map("name" -> "foo1") -> "firing")),
          Some(Map(foo -> "inactive", Map("name" -> "foo1") -> "inactive",
            Map("name" -> "foo2") -> "firing")))),
      ("for-pending", 60000L, 0L,
        Seq(Seq(foo)),
        Seq(Some(Map(foo -> "pending")))),
      ("for-fired", step, 0L,
        Seq(Seq(foo), Seq(foo)),
        Seq(Some(Map(foo -> "pending")), Some(Map(foo -> "firing")))),
      ("for-pending-empty-deletes", 1000L, 0L,
        Seq(Seq(foo), Seq(foo), Nil),
        Seq(Some(Map(foo -> "pending")), Some(Map(foo -> "pending")),
          Some(Map.empty))),
      ("pending-firing-inactive-pending-firing", step, 0L,
        Seq(Seq(foo), Seq(foo), Nil, Seq(foo), Seq(foo)),
        Seq(Some(Map(foo -> "pending")), Some(Map(foo -> "firing")),
          Some(Map(foo -> "inactive")), Some(Map(foo -> "pending")),
          Some(Map(foo -> "firing")))),
      ("keepfiring", step, step,
        Seq(Seq(foo), Seq(foo), Nil, Seq(foo)),
        Seq(Some(Map(foo -> "pending")), Some(Map(foo -> "firing")),
          Some(Map(foo -> "firing")), Some(Map(foo -> "firing")))),
      ("keepfiring-expires", step, 2 * step,
        Seq(Seq(foo), Seq(foo), Nil, Nil, Nil, Seq(foo), Seq(foo)),
        Seq(Some(Map(foo -> "pending")), Some(Map(foo -> "firing")),
          Some(Map(foo -> "firing")), Some(Map(foo -> "firing")),
          Some(Map(foo -> "inactive")), Some(Map(foo -> "pending")),
          Some(Map(foo -> "firing")))))
    for ((nm, forMs, kffMs, steps, expected) <- vectors) {
      val rule = Rules.Rule(alert = nm, forMs = forMs, keepFiringForMs = kffMs)
      var state = Map.empty[Map[String, String], Rules.AlertState]
      var ts = 1730160000000L // 2024-10-29T00:00:00Z
      steps.zip(expected).zipWithIndex.foreach { case ((present, exp), i) =>
        state = Rules.execStep(rule, "", state, present.map(_ -> 1.0), ts)
        ts += step
        exp.foreach { expStates =>
          val got = state.map { case (k, a) => (k - "alertname") -> a.state }
          assert(got == expStates, s"$nm step $i: got $got want $expStates")
        }
      }
    }
  }

  test("/api/v1/rules renders loaded groups") {
    val groups = Rules.parseConfig(
      """groups:
        |  - name: g1
        |    interval: 1m
        |    rules:
        |      - alert: High
        |        expr: m > 10
        |        for: 2h
        |""".stripMargin)
    val body = graft.api.Api.rules(groups)
    assert(body.contains(""""name":"g1""""))
    assert(body.contains(""""type":"alerting""""))
    assert(body.contains(""""duration":7200"""))
  }

  test("alertingStream applies the live transitions per trigger") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Rules.AlertEvent]
    val rule = Rules.Rule(alert = "S", expr = "m", forMs = 2000L)
    // intervalMs=0: transition-only mode (processing-time timeouts need a
    // live clock, which a processAllAvailable test cannot drive)
    val out = Rules.alertingStream(mem.toDS(), rule, intervalMs = 0L)
    val query = out.writeStream.format("memory").queryName("alerts_out")
      .outputMode("update").start()
    try {
      mem.addData(Rules.AlertEvent("a", Map("alertname" -> "S"), 1000L, 1.0))
      query.processAllAvailable()
      mem.addData(Rules.AlertEvent("a", Map("alertname" -> "S"), 3000L, 2.0))
      query.processAllAvailable()
      val rows = spark.table("alerts_out")
        .select("state", "activeAtMs", "atMs").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
      assert(rows.contains(("pending", 1000L, 1000L)))
      assert(rows.contains(("firing", 1000L, 3000L))) // 3000-1000 >= for 2s
    } finally query.stop()
  }

  test("validate rejects bad groups (config.go Validate core checks)") {
    def g(rules: Rules.Rule*): Seq[Rules.RuleGroup] =
      Seq(Rules.RuleGroup("g", 60000L, rules))
    // valid
    Rules.validate(g(Rules.Rule(alert = "a", expr = "m > 1")))
    // both / neither record+alert
    intercept[IllegalArgumentException](
      Rules.validate(g(Rules.Rule(record = "r", alert = "a", expr = "m"))))
    intercept[IllegalArgumentException](
      Rules.validate(g(Rules.Rule(expr = "m"))))
    // empty expr
    intercept[IllegalArgumentException](
      Rules.validate(g(Rules.Rule(alert = "a"))))
    // unparsable expr
    intercept[IllegalArgumentException](
      Rules.validate(g(Rules.Rule(alert = "a", expr = "sum(("))))
    // duplicate rule
    intercept[IllegalArgumentException](
      Rules.validate(g(
        Rules.Rule(alert = "a", expr = "m"),
        Rules.Rule(alert = "a", expr = "m"))))
    // unnamed group
    intercept[IllegalArgumentException](
      Rules.validate(Seq(Rules.RuleGroup("", 60000L,
        Seq(Rules.Rule(alert = "a", expr = "m"))))))
  }

  test("parseConfig: compact layout (groups at column 0, rules at indent 2)") {
    val groups = Rules.parseConfig(
      """groups:
        |- name: g1
        |  interval: 30s
        |  rules:
        |  - record: r1
        |    expr: sum(m)
        |  - alert: A1
        |    expr: m > 1
        |- name: g2
        |  rules:
        |  - alert: A2
        |    expr: m
        |""".stripMargin)
    assert(groups.map(_.name) == Seq("g1", "g2"))
    assert(groups.head.rules.map(r => r.record + r.alert) == Seq("r1", "A1"))
    assert(groups(1).rules.map(_.alert) == Seq("A2"))
  }

  test("parseConfig: block-scalar exprs (kube-good.rules style)") {
    val groups = Rules.parseConfig(
      """groups:
        |  - name: kube
        |    rules:
        |      - record: cluster:usage
        |        expr: |
        |          sum(rate(m[5m]))
        |            / on() group_left() sum(n)
        |        labels:
        |          src: blk
        |      - alert: Folded
        |        expr: >-
        |          m
        |          > 10
        |        for: 5m
        |""".stripMargin)
    assert(groups.size == 1)
    val Seq(rec, al) = groups.head.rules
    assert(rec.record == "cluster:usage")
    assert(rec.expr == "sum(rate(m[5m]))\n  / on() group_left() sum(n)")
    assert(rec.labels == Map("src" -> "blk"))
    assert(al.expr == "m > 10" && al.forMs == 5 * 60000L)
  }

  test("parseConfig: rule keys after labels: at deep indent are not swallowed") {
    // group items at indent 2 → rule keys sit at indent 8; with the old
    // `indent >= 6` heuristic, `for:`/`annotations:`/`expr:` following
    // `labels:` were absorbed into the labels map
    val groups = Rules.parseConfig(
      """groups:
        |  - name: kube
        |    rules:
        |      - alert: A
        |        expr: m > 1
        |        labels:
        |          severity: page
        |        for: 10m
        |        annotations:
        |          summary: s1
        |      - alert: B
        |        labels:
        |          team: x
        |        expr: n > 2
        |""".stripMargin)
    val Seq(a, b) = groups.head.rules
    assert(a.labels == Map("severity" -> "page"))
    assert(a.forMs == 10 * 60000L)
    assert(a.annotations == Map("summary" -> "s1"))
    assert(b.labels == Map("team" -> "x") && b.expr == "n > 2")
  }

  test("parseConfig: inline block scalar on the rule item keeps sibling keys") {
    val groups = Rules.parseConfig(
      """groups:
        |- name: g
        |  rules:
        |  - expr: |
        |      sum(m)
        |    record: r
        |""".stripMargin)
    assert(groups.head.rules == Seq(Rules.Rule(record = "r", expr = "sum(m)")))
  }

  test("absenceStep: pending alert is removed on absence") {
    val st = Rules.AlertState("pending", 1000L, 5.0)
    val (next, outs, dur) = Rules.absenceStep("sk", Some(st), 120000L, 0L, 60000L)
    assert(next.isEmpty && outs.isEmpty && dur.isEmpty)
  }

  test("absenceStep: firing without keep_firing_for resolves immediately") {
    val st = Rules.AlertState("firing", 1000L, 5.0)
    val (next, outs, dur) = Rules.absenceStep("sk", Some(st), 120000L, 0L, 60000L)
    assert(next.exists(_.state == "inactive"))
    assert(next.exists(_.resolvedAtMs == 120000L))
    assert(outs.map(o => (o.state, o.activeAtMs, o.atMs)) ==
      Seq(("inactive", 1000L, 120000L)))
    assert(dur.contains(Rules.ResolvedRetentionMs))
  }

  test("absenceStep: firing holds through keep_firing_for then resolves") {
    val kff = 300000L
    val st0 = Rules.AlertState("firing", 1000L, 5.0)
    // first absence: starts the keep-firing clock, stays firing
    val (n1, o1, d1) = Rules.absenceStep("sk", Some(st0), 120000L, kff, 60000L)
    assert(n1.exists(a => a.state == "firing" && a.keepFiringSinceMs == 120000L))
    assert(o1.map(_.state) == Seq("firing"))
    assert(d1.contains(120000L)) // 2 × interval re-arm
    // still inside the hold window: keeps firing, clock unchanged
    val (n2, o2, _) = Rules.absenceStep("sk", n1, 300000L, kff, 60000L)
    assert(n2.exists(a => a.state == "firing" && a.keepFiringSinceMs == 120000L))
    assert(o2.map(_.state) == Seq("firing"))
    // past the hold window: resolves with retention armed
    val (n3, o3, d3) = Rules.absenceStep("sk", n2, 420000L, kff, 60000L)
    assert(n3.exists(a => a.state == "inactive" && a.resolvedAtMs == 420000L))
    assert(o3.map(_.state) == Seq("inactive"))
    assert(d3.contains(Rules.ResolvedRetentionMs))
  }

  test("absenceStep: resolved-retention expiry removes the entry silently") {
    val st = Rules.AlertState("inactive", 1000L, 5.0, resolvedAtMs = 120000L)
    val (next, outs, dur) = Rules.absenceStep("sk", Some(st),
      120000L + Rules.ResolvedRetentionMs, 0L, 60000L)
    assert(next.isEmpty && outs.isEmpty && dur.isEmpty)
  }

  test("groupRange unions recording and alerting outputs") {
    val g = Rules.RuleGroup("g", H, Seq(
      Rules.Rule(record = "rec:m", expr = "avg_over_time(m[1h])"),
      Rules.Rule(alert = "A", expr = "avg_over_time(m[1h]) > 10", forMs = H)))
    val names = Rules.groupRange(samples, g, 0L, 10 * H)
      .select("name").distinct().collect().map(_.getString(0)).toSet
    assert(names == Set("rec:m", "ALERTS", "ALERTS_FOR_STATE"))
  }
}
