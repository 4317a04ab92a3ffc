package graft.lang

import org.scalatest.funsuite.AnyFunSuite

/** Render (AST → MetricsQL text) contract: `render ∘ parse` is a fixed
  * point over the ENTIRE ported exec_test.go golden corpus — the
  * rendered text is valid MetricsQL and re-parses to the same tree
  * (compared via its rendering, which is NaN-safe where case-class
  * equality on Double is not). No SparkSession needed.
  */
class RenderSpec extends AnyFunSuite {

  test("render∘parse is a fixed point across the golden corpus") {
    val failures = graft.tools.GoldenTriage.entries.flatMap { e =>
      try {
        val r1 = Render.render(Parser.parse(e.q))
        val r2 =
          try Render.render(Parser.parse(r1))
          catch {
            case ex: Exception =>
              fail(s"${e.nm}: rendering does not re-parse: '$r1' (${ex.getMessage})")
          }
        if (r1 == r2) None else Some(s"${e.nm}: '$r1' re-rendered as '$r2'")
      } catch {
        case _: Exception => None // skip queries the parser itself rejects
      }
    }
    assert(failures.isEmpty, failures.take(10).mkString("\n"))
  }

  test("render spot checks: selectors, rollups, modifiers") {
    def rt(q: String): String = Render.render(Parser.parse(q))
    assert(rt("m{a=\"1\",b!=\"2\"}") == """m{a="1", b!="2"}""")
    assert(rt("rate(m[5m]) keep_metric_names") == "rate(m[5m]) keep_metric_names")
    assert(rt("sum(rate(m[5m])) by (job) limit 3") == "sum(rate(m[5m])) by (job) limit 3")
    assert(rt("a / on(x) group_left(y) b") == "a / on (x) group_left (y) b")
    assert(rt("m offset -1h @ start()") == "m offset -1h @ start()")
    assert(rt("max_over_time(m[1h:5m])") == "max_over_time(m[1h:5m])")
    // WITH templates expand at parse time — rendering IS the expansion
    assert(rt("WITH (f(x) = x * 2) f(m)") == "m * 2")
  }
}
