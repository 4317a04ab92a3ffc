package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Ported golden corpus: lib/protoparser/prometheus/parser_test.go
  * TestRowsUnmarshalFailure (every line must parse to zero rows) and
  * TestRowsUnmarshalSuccess (exact metric/tags/value/timestamp)
  * against [[LineFormats.parsePromLine]]. Pure-JVM — no SparkSession.
  *
  * Mapping notes: the reference keeps tags as an ordered list; the
  * engine's model is a map, so expected duplicate-free tag lists compare
  * as maps. Absent timestamps are Timestamp=0 in the reference Row;
  * parsePromLine returns None — compared as 0.
  */
class PromParserGoldenSpec extends AnyFunSuite {

  private case class R(metric: String, tags: Map[String, String],
      value: Double, ts: Long = 0L)

  private def parse(s: String): Seq[R] =
    s.split("\n", -1).toSeq.flatMap(l => LineFormats.parsePromLine(l))
      .map(p => R(p.name, p.tags, p.value, p.ts.getOrElse(0L)))

  private def ok(s: String, expected: R*): Unit = {
    val got = parse(s)
    // NaN-safe comparison
    assert(got.length == expected.length, s"row count for ${s.take(80)}: $got")
    got.zip(expected).foreach { case (g, e) =>
      assert(g.metric == e.metric && g.tags == e.tags && g.ts == e.ts,
        s"row mismatch for ${s.take(80)}: $g vs $e")
      assert(g.value == e.value || (g.value.isNaN && e.value.isNaN),
        s"value mismatch for ${s.take(80)}: $g vs $e")
    }
  }

  private val failures = Seq(
    "", " ", "\t", "\t  \r", "\t\t  \n\n  # foobar", "#foobar", "#foobar\n",
    // invalid tags
    "a{", "a { ", "a {foo", "a {foo} 3", "a {foo  =",
    """a {foo  ="bar""", """a {foo  ="b\ar""", """a {foo  = "bar"""",
    """a {foo  ="bar",""", """a {foo  ="bar" , """,
    """a {foo  ="bar" , baz } 2""",
    // issue 4284 + invalid quoted UTF-8 forms
    """a{"__name__":"upsd_time_left_ns","host":"myhost", status_OB="true"} 12""",
    """a{host:"myhost"} 12""",
    """a{host:"myhost",foo="bar"} 12""",
    """metric_"name"{"foo"="bar"}""",
    """"metric_name"{"name":"name}""",
    """metric_"name{"name":"name"}""",
    """metric{"foo":"bar"}""",
    """{"foo":"bar", "metric"}""",
    // empty metric name
    """{foo="bar"}""",
    // invalid quotes for label value
    """{foo='bar'} 23""", "{foo=`bar`} 23",
    // missing value
    "aaa", " aaa", " aaa ", " aaa   \n", " aa{foo=\"bar\"}   \n",
    // invalid value
    "foo bar", "foo bar 124",
    // invalid timestamp
    "foo 123 bar",
    // metric name defined multiple times
    """{"foo", "foo2", bar="baz"} 1 2""",
    """foobar{"foo", bar="baz"} 1 2""",
    // missing closing quote on key
    """{"a", "b = "c"}""",
    // empty metric name with tag
    """{"a"="ok"} 1""")

  for ((s, i) <- failures.zipWithIndex)
    test(f"failure $i%02d: ${s.replace("\n", "\\n").take(60)}") {
      assert(parse(s).isEmpty, s"expected zero rows for ${s.take(80)}")
    }

  test("empty lines and comments parse to zero rows") {
    Seq("", "\r", "\n\n", "\n\r\n", "\t  \t\n\r\n#foobar\n  # baz")
      .foreach(s => assert(parse(s).isEmpty))
  }

  test("single line, no tags") {
    ok("foobar 78.9", R("foobar", Map.empty, 78.9))
    ok("foobar 123.456 789\n", R("foobar", Map.empty, 123.456, 789000L))
    ok("foobar{} 123.456 789.4354\n", R("foobar", Map.empty, 123.456, 789435L))
  }

  test("banner comments before a metric") {
    val banner =
      "#                                    _\n" +
      "#   ___ __ _ ___ ___  __ _ _ __   __| |_\n" +
      "#  / __/ _` / __/ __|/ _` | '_ \\ / _` |\n" +
      "# | (_| (_| \\__ \\__ \\ (_| | | | | (_| |\n" +
      "#  \\___\\__,_|___/___/\\__,_|_| |_|\\__,_|\n" +
      "#\n" +
      "# TYPE cassandra_token_ownership_ratio gauge\n" +
      "cassandra_token_ownership_ratio 78.9"
    ok(banner, R("cassandra_token_ownership_ratio", Map.empty, 78.9))
  }

  test("# char in label value, label name, metric name, exemplars") {
    ok("""foo{bar="#1 az"} 24""", R("foo", Map("bar" -> "#1 az"), 24))
    ok("""foo{bar#2="#1 az"} 24 456""",
      R("foo", Map("bar#2" -> "#1 az"), 24, 456000L))
    ok("""foo#qw{bar#2="#1 az"} 24 456 # foobar {baz="x"}""",
      R("foo#qw", Map("bar#2" -> "#1 az"), 24, 456000L))
    ok("foo_bucket{le=\"10\",a=\"#b\"} 17 # {trace_id=\"oHg5SJ#YRHA0\"} 9.8 1520879607.789\n" +
      "\t   abc 123 456 # foobar\n" +
      "\t   foo   344#bar",
      R("foo_bucket", Map("le" -> "10", "a" -> "#b"), 17),
      R("abc", Map.empty, 123, 456000L),
      R("foo", Map.empty, 344))
  }

  test("incorrectly escaped backslash is kept verbatim") {
    ok("""mssql_sql_server_active_transactions_sec{loginname="domain\somelogin",env="develop"} 56""",
      R("mssql_sql_server_active_transactions_sec",
        Map("loginname" -> "domain\\somelogin", "env" -> "develop"), 56))
  }

  test("OpenMetrics Infinity word forms") {
    ok("\n\t\tfoo Infinity\n\t\tbar +Infinity\n\t\tbaz -infinity\n" +
      "\t\taaa +inf\n\t\tbbb -INF\n\t\tccc INF\n\t",
      R("foo", Map.empty, Double.PositiveInfinity),
      R("bar", Map.empty, Double.PositiveInfinity),
      R("baz", Map.empty, Double.NegativeInfinity),
      R("aaa", Map.empty, Double.PositiveInfinity),
      R("bbb", Map.empty, Double.NegativeInfinity),
      R("ccc", Map.empty, Double.PositiveInfinity))
  }

  test("timestamps: past 2^31 stay ms; floats are OpenMetrics seconds") {
    ok("aaa 1123 429496729600", R("aaa", Map.empty, 1123, 429496729600L))
    ok("aaa 1123 42949.567", R("aaa", Map.empty, 1123, 42949567L))
  }

  test("tags, quoted UTF-8 names and keys") {
    ok("""foo{bar="baz"} 1 2""", R("foo", Map("bar" -> "baz"), 1, 2000L))
    ok("""foo{"bar"="baz"} 1 2""", R("foo", Map("bar" -> "baz"), 1, 2000L))
    ok("""{"foo", "bar"="baz"} 1 2""", R("foo", Map("bar" -> "baz"), 1, 2000L))
    ok("""{"foo", "bar"="baf\"y"} 1 2""",
      R("foo", Map("bar" -> "baf\"y"), 1, 2000L))
    ok("""{bar="baz", "foo"} 1 2""", R("foo", Map("bar" -> "baz"), 1, 2000L))
    ok("""{"foo"} 1 2""", R("foo", Map.empty, 1, 2000L))
    ok("""{"温度{房间"} 1 2""", R("温度{房间", Map.empty, 1, 2000L))
    ok("""{"foo", "温度{房间=\"水电费"="baz"} 1 2""",
      R("foo", Map("温度{房间=\"水电费" -> "baz"), 1, 2000L))
    ok("""foo{bar="b\"a\\z"} -1.2""",
      R("foo", Map("bar" -> "b\"a\\z"), -1.2))
  }

  test("empty keys dropped, empty values kept, trailing comma") {
    ok("""foo {bar="baz",aa="",x="y",="z"} 1 2""",
      R("foo", Map("bar" -> "baz", "aa" -> "", "x" -> "y"), 1, 2000L))
    ok("""foo{bar="baz",} 1 2""", R("foo", Map("bar" -> "baz"), 1, 2000L))
  }

  test("multi lines, invalid lines dropped, spaces around tags") {
    ok("# foo\n # bar ba zzz\nfoo 0.3 2\naaa 3\nbar.baz 0.34 43\n",
      R("foo", Map.empty, 0.3, 2000L),
      R("aaa", Map.empty, 3),
      R("bar.baz", Map.empty, 0.34, 43000L))
    ok("\t foo\t {  } 0.3\t 2\naaa\n  bar.baz 0.34 43\n",
      R("foo", Map.empty, 0.3, 2000L),
      R("bar.baz", Map.empty, 0.34, 43000L))
    ok("vm_accounting\t{   name=\"vminsertRows\", accountID = \"1\" , projectID=\t\"1\"   } 277779100",
      R("vm_accounting",
        Map("name" -> "vminsertRows", "accountID" -> "1", "projectID" -> "1"),
        277779100))
  }
}
