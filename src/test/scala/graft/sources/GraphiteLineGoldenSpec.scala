package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Ported golden corpus: lib/protoparser/graphite/parser_test.go
  * (TestRowsUnmarshal_Success / _Failure / _SanitizeMetricNamesSuccess)
  * against [[LineFormats.parseGraphiteLine]]. Pure-JVM.
  * Timestamps are raw graphite SECONDS at this level (the DataFrame
  * wrapper scales to ms); absent = None compared as 0.
  */
class GraphiteLineGoldenSpec extends AnyFunSuite {

  private case class R(metric: String, tags: Map[String, String],
      value: Double, ts: Long = 0L)

  private def parse(s: String, sanitize: Boolean = false): Seq[R] =
    s.split("\n", -1).toSeq
      .flatMap(l => LineFormats.parseGraphiteLine(l, sanitize))
      .map(p => R(p.name, p.tags, p.value, p.ts.getOrElse(0L)))

  private def ok(s: String, expected: R*): Unit = {
    val got = parse(s)
    assert(got == expected, s"for ${s.take(60)}")
  }

  test("failures: missing value, invalid value, invalid timestamp") {
    Seq("aaa", "aa bb", "aa 123 bar").foreach(s =>
      assert(parse(s).isEmpty, s"expected zero rows for $s"))
  }

  test("empty lines") {
    Seq("", "\r", "\n\n", "\n\r\n").foreach(s => assert(parse(s).isEmpty))
  }

  test("single lines, numeric metric, missing/negative/big/float timestamps") {
    ok(" 123 455", R("123", Map.empty, 455))
    ok("foobar -123.456 789", R("foobar", Map.empty, -123.456, 789))
    ok("foo.bar 123.456 789\n", R("foo.bar", Map.empty, 123.456, 789))
    ok("aaa 1123", R("aaa", Map.empty, 1123))
    ok("aaa 1123 -1", R("aaa", Map.empty, 1123, -1))
    ok("aaa 1123 429496729600", R("aaa", Map.empty, 1123, 429496729600L))
    ok("aaa 1123 4294.943", R("aaa", Map.empty, 1123, 4294))
  }

  test("whitespace inside metric names, tag names and tag values") {
    ok("s a;ta g1=aaa1;tag2=bb b2;tag3 1 23",
      R("s a", Map("ta g1" -> "aaa1", "tag2" -> "bb b2"), 1, 23))
  }

  test("tags: values keep '=', empty names/values drop, bare semicolon") {
    ok("foo;bar=baz 1 2", R("foo", Map("bar" -> "baz"), 1, 2))
    ok("foo;bar=123;baz=aa=bb 1 2",
      R("foo", Map("bar" -> "123", "baz" -> "aa=bb"), 1, 2))
    ok("foo; 1", R("foo", Map.empty, 1))
    ok("foo; 1 2", R("foo", Map.empty, 1, 2))
    ok("foo;bar 1 2", R("foo", Map.empty, 1, 2))
    ok("foo;bar=baz;aa=;x=y;=z 1 2",
      R("foo", Map("bar" -> "baz", "x" -> "y"), 1, 2))
  }

  test("multi lines, invalid lines dropped") {
    ok("foo 0.3 2\naaa 3\nbar.baz 0.34 43\n",
      R("foo", Map.empty, 0.3, 2),
      R("aaa", Map.empty, 3),
      R("bar.baz", Map.empty, 0.34, 43))
    ok("foo 0.3 2\naaa\nbar.baz 0.34 43\n",
      R("foo", Map.empty, 0.3, 2),
      R("bar.baz", Map.empty, 0.34, 43))
  }

  test("tab separators and trailing whitespace") {
    ok("foo.baz\t125.456\t1789\n", R("foo.baz", Map.empty, 125.456, 1789))
    ok("foo;baz=bar;bb=;y=x;=z\t1\t2",
      R("foo", Map("baz" -> "bar", "y" -> "x"), 1, 2))
    ok("foo.baz 125 1789 \na 1.34 567\t  ",
      R("foo.baz", Map.empty, 125, 1789),
      R("a", Map.empty, 1.34, 567))
    ok("foo.baz \t125  1789 \t\n", R("foo.baz", Map.empty, 125, 1789))
  }

  test("sanitizeMetricName: repeated dots collapse, illegal chars to _") {
    assert(parse("foo...b..a.r\\a--baz 123", sanitize = true) ==
      Seq(R("foo.b.a.r_a__baz", Map.empty, 123)))
    // tag KEYS sanitize, tag VALUES don't
    assert(parse("s a;ta g..1=a-b..c;tag2 123 456", sanitize = true) ==
      Seq(R("s_a", Map("ta_g.1" -> "a-b..c"), 123, 456)))
  }
}
