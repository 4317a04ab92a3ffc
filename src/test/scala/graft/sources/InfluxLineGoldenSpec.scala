package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Ported golden corpus: lib/protoparser/influx/parser_test.go
  * (TestRowsUnmarshalSuccess / TestRowsUnmarshalFailure / the
  * unescapeTagValue vectors) against [[LineFormats.parseInfluxLine]].
  * Pure-JVM. Timestamps are RAW line-protocol integers at this level
  * (the DataFrame wrapper scales ns→ms); absent = None compared as 0.
  */
class InfluxLineGoldenSpec extends AnyFunSuite {

  private case class R(measurement: String, tags: Map[String, String],
      fields: Seq[(String, Double)], ts: Long = 0L)

  private def parse(s: String): Seq[R] =
    s.split("\n", -1).toSeq.flatMap(l => LineFormats.parseInfluxLine(l))
      .map(p => R(p.measurement, p.tags,
        p.fields.map(f => f.key -> f.value), p.ts.getOrElse(0L)))

  private def ok(s: String, expected: R*): Unit =
    assert(parse(s) == expected, s"for ${s.take(70)}")

  test("failures: every invalid line parses to zero rows") {
    Seq(
      "foo", "foo,bar=baz 1234", // no fields ('1234' = fields w/o '=')
      "foo,bar", "foo,bar baz", "foo,bar=123, 123", // missing tag value
      "foo bar", "foo bar=", "foo bar=,baz=23 123", "foo bar=1, 123",
      """foo bar=" 123""", """foo bar="123""", """foo bar=",123""",
      """foo bar=a"", 123""", // missing field value / closing quote
      "foo =123", "foo =123\nbar", // missing field name
      "foo bar=123 baz", // invalid timestamp
      "foo bar=1abci", "foo bar=-2abci", "foo bar=3abcu", // bad suffixes
      "GET /foo HTTP/1.1", "GET /foo?bar=baz HTTP/1.0")
      .foreach(s => assert(parse(s).isEmpty, s"expected zero rows for $s"))
  }

  test("empty lines and comments") {
    Seq("", "\n\n", "\n\r\n", "\n# foobar\n", "#foobar baz", "#foobar baz\n#sss")
      .foreach(s => assert(parse(s).isEmpty))
  }

  test("missing measurement") {
    ok(" baz=123", R("", Map.empty, Seq("baz" -> 123.0)))
    ok(",foo=bar baz=123", R("", Map("foo" -> "bar"), Seq("baz" -> 123.0)))
  }

  test("minimal lines, trailing whitespace, comments around") {
    ok("foo bar=123", R("foo", Map.empty, Seq("bar" -> 123.0)))
    ok("foo bar=123   ", R("foo", Map.empty, Seq("bar" -> 123.0)))
    ok("# comment\nfoo bar=123\r\n#comment2 sdsf dsf",
      R("foo", Map.empty, Seq("bar" -> 123.0)))
    ok("foo bar=123\n", R("foo", Map.empty, Seq("bar" -> 123.0)))
    ok("foo bar=123.45 -345", R("foo", Map.empty, Seq("bar" -> 123.45), -345L))
  }

  test("tags: single, multiple, empty keys/values skipped") {
    ok("foo,tag1=xyz bar=123",
      R("foo", Map("tag1" -> "xyz"), Seq("bar" -> 123.0)))
    ok("foo,tag1=xyz,tag2=43as bar=123",
      R("foo", Map("tag1" -> "xyz", "tag2" -> "43as"), Seq("bar" -> 123.0)))
    ok("foo,tag1=xyz,tagN=,tag2=43as,=xxx bar=123",
      R("foo", Map("tag1" -> "xyz", "tag2" -> "43as"), Seq("bar" -> 123.0)))
  }

  test("typed field values: quoted strings, bools, i/u suffixes") {
    ok("""system,host=ip-172-16-10-144 uptime_format="3 days, 21:01",quoted_float="-1.23",quoted_int="123" 1557761040000000000""",
      R("system", Map("host" -> "ip-172-16-10-144"),
        Seq("uptime_format" -> 0.0, "quoted_float" -> -1.23, "quoted_int" -> 123.0),
        1557761040000000000L))
    ok("""foo,tag1=xyz,tag2=43as bar=-123e4,x=True,y=-45i,z=f,aa="f,= \"a",bb=23u 48934""",
      R("foo", Map("tag1" -> "xyz", "tag2" -> "43as"),
        Seq("bar" -> -123e4, "x" -> 1.0, "y" -> -45.0, "z" -> 0.0,
          "aa" -> 0.0, "bb" -> 23.0), 48934L))
  }

  test("escape chars in measurement, tag keys/values and field keys") {
    ok("""fo\,bar\=b\ az,x\=\ b=\\a\,\=\q\  \\\a\ b\=\,=4.34""",
      R("fo,bar=b az", Map("x= b" -> "\\a,=\\q "),
        Seq("\\\\a b=," -> 4.34)))
    ok("""ports,foo=a,bar=et\ +\ V,baz=ype INDISCARDS=245333676,OUTDISCARDS=1798680""",
      R("ports", Map("foo" -> "a", "bar" -> "et + V", "baz" -> "ype"),
        Seq("INDISCARDS" -> 245333676.0, "OUTDISCARDS" -> 1798680.0)))
    ok("""x,y=z,g=p:\ \ 5432\,\ gp\ mon\ [lol]\ con10\ cmd5\ SELECT f=1""",
      R("x", Map("y" -> "z", "g" -> "p:  5432, gp mon [lol] con10 cmd5 SELECT"),
        Seq("f" -> 1.0)))
  }

  test("multiple lines, invalid middle line dropped, no trailing newline") {
    val expected = Seq(
      R("foo", Map("tag" -> "xyz"), Seq("field" -> 1.23), 48934L),
      R("bar", Map.empty, Seq("x" -> -1.0)))
    ok("foo,tag=xyz field=1.23 48934\nbar x=-1i\n\n", expected: _*)
    ok("foo,tag=xyz field=1.23 48934\ninvalid line\nbar x=-1i\n\n", expected: _*)
    ok("foo,tag=xyz field=1.23 48934\nbar x=-1i", expected: _*)
  }

  test("superfluous whitespace between fields and timestamp") {
    val exp = R("cpu_utilization", Map("host" -> "mnsbook-pro.local"),
      Seq("value" -> 119.8), 1607222595591L)
    ok("cpu_utilization,host=mnsbook-pro.local value=119.8 1607222595591", exp)
    ok("cpu_utilization,host=mnsbook-pro.local   value=119.8   1607222595591", exp)
  }
}
