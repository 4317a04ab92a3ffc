package graft.lang

import org.scalatest.funsuite.AnyFunSuite

/** Ported guard vectors: TestEscapeDots + TestEscapeDotsInRegexpLabelFilters
  * (app/vmselect/promql/exec_test.go:15-51) and
  * TestMetricsqlIsLikelyInvalid_{False,True} (exec_test.go:10788-10925).
  */
class GuardsSpec extends AnyFunSuite {

  test("escapeDots (exec_test.go:15 vectors)") {
    val f = (s: String, want: String) =>
      assert(Guards.escapeDots(s) == want, s"escapeDots($s)")
    f("", "")
    f("a", "a")
    f("foobar", "foobar")
    f(".", """\.""")
    f(".*", ".*")
    f(".+", ".+")
    f("..", """\.\.""")
    f("foo.b.{2}ar..+baz.*", """foo\.b.{2}ar\..+baz.*""")
  }

  test("escapeDotsInRegexpLabelFilters (exec_test.go:33 vectors)") {
    // compare rendered forms of (transformed input) vs (parsed expected) —
    // robust to renderer style differences vs Go's AppendString
    val f = (s: String, want: String) => {
      val got = Render.render(Guards.escapeDotsInRegexpLabelFilters(Parser.parse(s)))
      assert(got == Render.render(Parser.parse(want)), s"escapeDotsInFilters($s) = $got")
    }
    f("2", "2")
    f("foo.bar + 123", "foo.bar + 123")
    f("""foo{bar=~"baz.xx.yyy"}""", """foo{bar=~"baz\\.xx\\.yyy"}""")
    f("""sum(a.b{c="d.e",x=~"a.b.+[.a]",y!~"aaa.bb|cc.dd"}) + avg_over_time(1,sum({x=~"aa.bb"}))""",
      """sum(a.b{c="d.e",x=~"a\\.b.+[\\.a]",y!~"aaa\\.bb|cc\\.dd"}) + avg_over_time(1, sum({x=~"aa\\.bb"}))""")
  }

  test("isLikelyInvalid — valid queries (exec_test.go:10788 corpus)") {
    val ok = Seq(
      "http_total[5m]",
      "sum(http_total)",
      "sum(foo, bar)",
      "absent(http_total)",
      "rate(http_total[1m])",
      "avg_over_time(up[1m])",
      "sum(rate(http_total[1m]))",
      "sum(sum(http_total))",
      "sum(sum_over_time(http_total[1m] )) by (instance)",
      "sum(up{cluster='a'}[1m] or up{cluster='b'}[1m])",
      "(avg_over_time(alarm_test1[1m]) - avg_over_time(alarm_test1[1m] offset 5m)) > 0.1",
      "http_total[1m] offset 1m",
      "sum(http_total offset 1m)",
      "rate(http_total[5m])[5m:1m]",
      "rate(sum(http_total)[5m:1m])",
      "rate(rate(http_total[5m])[5m:1m])",
      "sum(rate(sum(http_total)[5m:1m]))",
      "rate(sum(rate(http_total[5m]))[5m:1m])",
      "rate(sum(sum(http_total))[5m:1m])",
      "avg_over_time(rate(http_total[5m])[5m:1m])",
      "delta(avg_over_time(up[1m])[5m:1m]) > 0.1",
      "avg_over_time(avg by (site) (metric)[2m:1m])",
      "sum(http_total)[5m:1m] offset 1m",
      "round(sum(sum_over_time(http_total[1m])) by (instance))[5m:1m] offset 1m",
      "rate(sum(http_total)[5m:1m]) - rate(sum(http_total)[5m:1m])",
      "avg_over_time((rate(http_total[5m])-rate(http_total[5m]))[5m:1m])",
      "sum_over_time((up{cluster='a'} or up{cluster='b'})[5m:1m])",
      "sum(sum_over_time((up{cluster='a'} or up{cluster='b'})[5m:1m])) by (instance)",
      "max_over_time(rate(my_counter_total[5m])[1h:])",
      "max_over_time(rate(my_counter_total[5m])[1h:1m])[5m:1m]",
      "max_over_time(rate(my_counter_total[5m])[1h:])[5m:]",
      """WITH (
           cpuSeconds = node_cpu_seconds_total{instance=~"x",job=~"y"},
           cpuIdle = rate(cpuSeconds{mode='idle'}[5m])
         ) max_over_time(cpuIdle[1h:])""",
      "rate(http_total)[5m:1m]",
      "up[:5m]",
      "sum(up[:5m])",
      "absent(foo[5m])",
      "sum(up[5m])",
      "avg(foo[5m])",
      "sort(foo[5m])",
      "rate(rate(http_total)[5m:1m])",
      "rate(sum(rate(http_total))[5m:1m])",
      "avg_over_time((rate(http_total)-rate(http_total))[5m:1m])",
      "count_over_time(http_total)",
      "sum(http_total) offset 1m",
      "round(sum(sum_over_time(http_total[1m])) by (instance)) offset 1m",
      // timestamp is exempt (issue 9527)
      "timestamp(sum(foo))")
    for (q <- ok)
      assert(!Guards.isLikelyInvalid(Parser.parse(q)), s"expected valid: $q")
  }

  test("isLikelyInvalid — implicit-conversion queries (exec_test.go:10878 corpus)") {
    val bad = Seq(
      "rate(sum(http_total))",
      "rate(rate(http_total))",
      "sum(rate(sum(http_total)))",
      "rate(sum(rate(http_total)))",
      "rate(sum(sum(http_total)))",
      "avg_over_time(rate(http_total[5m]))",
      "rate(sum(http_total)) - rate(sum(http_total))",
      "avg_over_time(rate(http_total)-rate(http_total))",
      "sum_over_time(up{cluster='a'} or up{cluster='b'})",
      "sum_over_time(up{cluster='a'}[1m] or up{cluster='b'}[1m])",
      "sum(sum_over_time(up{cluster='a'}[1m] or up{cluster='b'}[1m])) by (instance)",
      """WITH (
           cpuSeconds = node_cpu_seconds_total{instance=~"x",job=~"y"},
           cpuIdle = rate(cpuSeconds{mode='idle'}[5m])
         ) max_over_time(cpuIdle)""")
    for (q <- bad)
      assert(Guards.isLikelyInvalid(Parser.parse(q)), s"expected invalid: $q")
  }

  test("applySearchFlags: disableImplicitConversion rejects, treatDots rewrites") {
    import graft.api.{Api, SearchFlags}
    try {
      SearchFlags.disableImplicitConversion = true
      val e = intercept[IllegalArgumentException](Api.applySearchFlags("rate(sum(foo))"))
      assert(e.getMessage.contains("-search.disableImplicitConversion"))
      assert(Api.applySearchFlags("rate(foo[1m])") == "rate(foo[1m])")
      SearchFlags.disableImplicitConversion = false
      SearchFlags.treatDotsAsIsInRegexps = true
      assert(Api.applySearchFlags("""foo{bar=~"a.b"}""") ==
        Render.render(Parser.parse("""foo{bar=~"a\\.b"}""")))
    } finally {
      SearchFlags.disableImplicitConversion = false
      SearchFlags.treatDotsAsIsInRegexps = false
    }
  }
}
