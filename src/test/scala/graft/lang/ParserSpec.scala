package graft.lang

import org.scalatest.funsuite.AnyFunSuite

class ParserSpec extends AnyFunSuite {

  test("number / duration / string literals") {
    assert(Parser.parse("3.5") == NumberExpr(3.5))
    assert(Parser.parse("0x1f") == NumberExpr(31.0))
    assert(Parser.parse("5m") == NumberExpr(300.0)) // durations = seconds in number position
    assert(Parser.parse("1h30m") == NumberExpr(5400.0))
    assert(Parser.parse("\"a\\nb\"") == StringExpr("a\nb"))
    assert(Parser.parse("-2") == NumberExpr(-2))
  }

  test("constant folding") {
    assert(Parser.parse("(1 + 2) * 3") == NumberExpr(9))
    assert(Parser.parse("2 ^ 3 ^ 2") == NumberExpr(512)) // right-assoc
    assert(Parser.parse("\"a\" + \"b\"") == StringExpr("ab"))
    assert(Parser.parse("1 > bool 2") == NumberExpr(0))
  }

  test("selectors") {
    assert(Parser.parse("http_requests_total") == MetricExpr.named("http_requests_total"))
    val e = Parser.parse("""foo{job="api", code!~"5.."}""")
    assert(e == MetricExpr(Seq(Seq(
      LabelFilter("__name__", "foo", false, false),
      LabelFilter("job", "api", false, false),
      LabelFilter("code", "5..", true, true)))))
    // or-filter lists
    val or = Parser.parse("""m{a="1" or b="2", c="3"}""").asInstanceOf[MetricExpr]
    assert(or.filterss.size == 2)
    assert(or.filterss(1).map(_.label) == Seq("__name__", "b", "c"))
  }

  test("rollup windows, offset, at, subquery") {
    val e = Parser.parse("rate(m[5m] offset 1h)").asInstanceOf[FuncExpr]
    val r = e.args.head.asInstanceOf[RollupExpr]
    assert(r.window.map(_.ms(1000)).contains(300000L) && r.offset.map(_.ms(1000)).contains(3600000L))
    val sq = Parser.parse("max_over_time(rate(m[5m])[30m:1m])").asInstanceOf[FuncExpr]
    val rr = sq.args.head.asInstanceOf[RollupExpr]
    assert(rr.window.map(_.ms(1000)).contains(1800000L) && rr.step.map(_.ms(1000)).contains(60000L))
    val at = Parser.parse("m @ 1700000000").asInstanceOf[RollupExpr]
    assert(at.at.contains(AtTimestamp(1.7e9)))
    assert(Parser.parse("m @ start()").asInstanceOf[RollupExpr].at.contains(AtStart))
    assert(Parser.parse("m @ end()").asInstanceOf[RollupExpr].at.contains(AtEnd))
    // `@ -1` is a legitimate negative epoch timestamp, not a sentinel
    assert(Parser.parse("m @ -1").asInstanceOf[RollupExpr].at.contains(AtTimestamp(-1)))
    val neg = Parser.parse("m offset -5m").asInstanceOf[RollupExpr]
    assert(neg.offset.map(_.ms(1000)).contains(-300000L))
    // step-multiple durations resolve against the ACTUAL step at eval time
    val im = Parser.parse("m[5i]").asInstanceOf[RollupExpr]
    assert(im.window.map(_.ms(30000)).contains(150000L))
    assert(im.window.map(_.ms(60000)).contains(300000L))
  }

  test("aggregates with modifiers") {
    val e = Parser.parse("""sum(rate(m[5m])) by (job) limit 10""").asInstanceOf[AggrFuncExpr]
    assert(e.name == "sum" && e.modifier.contains(By(Seq("job"))) && e.limit == 10)
    val p = Parser.parse("""sum by (job) (m)""").asInstanceOf[AggrFuncExpr]
    assert(p.modifier.contains(By(Seq("job"))))
    val w = Parser.parse("""count without (instance) (m)""").asInstanceOf[AggrFuncExpr]
    assert(w.modifier.contains(Without(Seq("instance"))))
    val tk = Parser.parse("topk(3, m)").asInstanceOf[AggrFuncExpr]
    assert(tk.args.head == NumberExpr(3))
  }

  test("binary operators with vector matching") {
    val e = Parser.parse("a / on(job) group_left(extra) b").asInstanceOf[BinaryOpExpr]
    assert(e.op == "/" && e.groupModifier.contains(On(Seq("job"))) &&
      e.joinModifier.contains(GroupLeft(Seq("extra"))))
    val c = Parser.parse("a > bool b").asInstanceOf[BinaryOpExpr]
    assert(c.boolModifier)
    // precedence: or < and < cmp < add < mul < pow
    val prec = Parser.parse("a + b * c").asInstanceOf[BinaryOpExpr]
    assert(prec.op == "+" && prec.right.asInstanceOf[BinaryOpExpr].op == "*")
    val set = Parser.parse("a and b or c").asInstanceOf[BinaryOpExpr]
    assert(set.op == "or" && set.left.asInstanceOf[BinaryOpExpr].op == "and")
    val d = Parser.parse("a default 0").asInstanceOf[BinaryOpExpr]
    assert(d.op == "default" && d.right == NumberExpr(0))
    val ifExpr = Parser.parse("a if b default 0").asInstanceOf[BinaryOpExpr]
    assert(ifExpr.op == "default")
  }

  test("WITH templates") {
    assert(Parser.parse("WITH (x = 2) x * 3") == NumberExpr(6))
    val e = Parser.parse("""WITH (f = foo{a="b"}) rate(f[1m])""").asInstanceOf[FuncExpr]
    val sel = e.args.head.asInstanceOf[RollupExpr].expr.asInstanceOf[MetricExpr]
    assert(sel.filterss.head.map(_.label) == Seq("__name__", "a"))
    // parameterized template
    val p = Parser.parse("WITH (f(a, b) = a + b) f(1, 2)")
    assert(p == NumberExpr(3))
    // filter template merged into a selector conjunction
    val ft = Parser.parse("""WITH (cf = {job="api"}) m{cf, code="200"}""").asInstanceOf[MetricExpr]
    assert(ft.filterss.head.map(_.label) == Seq("__name__", "job", "code"))
    // bindings may reference earlier bindings in the same list
    assert(Parser.parse("WITH (a = 2, b = a * 3) b") == NumberExpr(6))
    intercept[ParseError](Parser.parse("WITH (a = 1, a = 2) a"))
  }

  test("union lists and parens") {
    val u = Parser.parse("(a, b, c)").asInstanceOf[ParensExpr]
    assert(u.exprs.size == 3)
    assert(Parser.parse("((a))") == MetricExpr.named("a"))
    val un = Parser.parse("union(a, b)").asInstanceOf[FuncExpr]
    assert(un.name == "union")
  }

  test("keep_metric_names modifier") {
    // attaches to the call itself (no spurious rollup wrapper)
    val e = Parser.parse("rate(m[5m]) keep_metric_names").asInstanceOf[FuncExpr]
    assert(e.keepMetricNames)
    // but a real rollup suffix still owns the flag
    val r = Parser.parse("m[5m] offset 1m keep_metric_names").asInstanceOf[RollupExpr]
    assert(r.keepMetricNames)
  }

  test("errors") {
    intercept[ParseError](Parser.parse("sum("))
    intercept[ParseError](Parser.parse("m{a=}"))
    intercept[RuntimeException](Parser.parse("m[5m"))
    intercept[ParseError](Parser.parse("and")) // reserved binop word
  }
}
