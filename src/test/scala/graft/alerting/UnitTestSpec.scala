package graft.alerting

import graft.SparkSpec

/** vmalert-tool unittest runner semantics
  * (app/vmalert-tool/unittest): value notation expansion, selector
  * parsing, and end-to-end test cases modeled on the reference's
  * testdata (InstanceDown `up == 0` with `for: 5m`, AlwaysFiring,
  * recording-rule chaining across groups).
  */
class UnitTestSpec extends SparkSpec {

  test("value notation expands like input.go parseInputValue") {
    def f(s: String): Seq[Option[Double]] = UnitTest.parseValues(s)
    assert(f("1") == Seq(Some(1.0)))
    assert(f("1 2 3") == Seq(Some(1.0), Some(2.0), Some(3.0)))
    assert(f("_") == Seq(None))
    assert(f("0+1x3") == Seq(Some(0.0), Some(1.0), Some(2.0), Some(3.0)))
    assert(f("5+10x2") == Seq(Some(5.0), Some(15.0), Some(25.0)))
    assert(f("10-1x2") == Seq(Some(10.0), Some(9.0), Some(8.0)))
    assert(f("7x3") == Seq.fill(4)(Some(7.0)))
    assert(f("0x2") == Seq(Some(0.0), Some(0.0), Some(0.0)))
    assert(f("_x3") == Seq(None, None, None))
    assert(f("stale").head.exists(_.isNaN))
    assert(f("1 _ 0+2x2") ==
      Seq(Some(1.0), None, Some(0.0), Some(2.0), Some(4.0)))
  }

  test("selector parsing") {
    assert(UnitTest.parseSelector("up") == ("up", Map.empty))
    assert(UnitTest.parseSelector("""up{job="vm", instance="a:9090"}""") ==
      ("up", Map("job" -> "vm", "instance" -> "a:9090")))
  }

  test("alert_rule_test: InstanceDown fires after `for` holds (testdata shape)") {
    val groups = Rules.parseConfig(
      """groups:
        |  - name: group1
        |    rules:
        |      - alert: InstanceDown
        |        expr: up == 0
        |        for: 5m
        |        labels:
        |          severity: page
        |      - alert: AlwaysFiring
        |        expr: 1
        |""".stripMargin)
    val tc = UnitTest.TestCase(
      intervalMs = 60000L,
      inputSeries = Seq(
        ("""up{job="vmagent", instance="localhost:9090"}""", "0+0x120")),
      alertTests = Seq(
        // before `for` has elapsed: pending, so no firing alerts
        UnitTest.AlertTest(120000L, "InstanceDown", expAlerts = Nil),
        // two hours in: firing with the merged labels
        UnitTest.AlertTest(7200000L, "InstanceDown", expAlerts = Seq(
          UnitTest.ExpAlert(Map(
            "job" -> "vmagent", "instance" -> "localhost:9090",
            "severity" -> "page")))),
        // AlwaysFiring (expr `1`, for: 0) fires from the start
        UnitTest.AlertTest(0L, "AlwaysFiring", expAlerts = Seq(
          UnitTest.ExpAlert(Map.empty)))))
    val failures = UnitTest.run(spark, groups, tc)
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("metricsql_expr_test and recording write-back chaining") {
    val groups = Rules.parseConfig(
      """groups:
        |  - name: g2
        |    rules:
        |      - record: t1
        |        expr: test
        |  - name: g3
        |    rules:
        |      - record: t2
        |        expr: t1
        |""".stripMargin)
    val tc = UnitTest.TestCase(
      intervalMs = 60000L,
      inputSeries = Seq(("""test{a="b"}""", "3x10")),
      exprTests = Seq(
        UnitTest.ExprTest("t1", 300000L, Seq(
          UnitTest.ExpSample(Map("__name__" -> "t1", "a" -> "b"), 3.0))),
        // t2 records t1 — a cross-group dependency through the store
        UnitTest.ExprTest("t2", 300000L, Seq(
          UnitTest.ExpSample(Map("__name__" -> "t2", "a" -> "b"), 3.0)))))
    val failures = UnitTest.run(spark, groups, tc)
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("failing assertions are reported, not thrown") {
    val groups = Rules.parseConfig(
      """groups:
        |  - name: g
        |    rules:
        |      - alert: A
        |        expr: missing_metric
        |""".stripMargin)
    val tc = UnitTest.TestCase(
      intervalMs = 60000L,
      inputSeries = Seq(("test", "1")),
      alertTests = Seq(UnitTest.AlertTest(0L, "A",
        expAlerts = Seq(UnitTest.ExpAlert(Map("x" -> "y"))))))
    val failures = UnitTest.run(spark, groups, tc)
    assert(failures.size == 1 && failures.head.contains("alert A"))
  }
}
