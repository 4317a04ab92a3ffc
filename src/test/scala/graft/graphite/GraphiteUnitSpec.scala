package graft.graphite

import org.scalatest.funsuite.AnyFunSuite

/** Ported unit vectors from the reference's graphite helper tests:
  * render_api_test.go (parseInterval/parseTime), transform_test.go
  * (unmarshalTags, getPathFromName, regex replacement),
  * natural_compare_test.go (naturalLess via the sort key).
  * No SparkSession needed.
  */
class GraphiteUnitSpec extends AnyFunSuite {

  test("parseInterval success vectors (render_api_test.go:8)") {
    val f: (String, Long) => Unit = (s, exp) =>
      assert(GraphiteQL.parseInterval(s) == exp, s)
    f("1ms", 1)
    f("-10.5ms", -10)
    f("+5.5s", 5500)
    f("7.85s", 7850)
    f("-7.85sec", -7850)
    f("-7.85secs", -7850)
    f("5seconds", 5000)
    f("10min", 10 * 60 * 1000)
    f("10 mins", 10 * 60 * 1000)
    f(" 10  mins ", 10 * 60 * 1000)
    f("10m", 10 * 60 * 1000)
    f("-10.5min", -(10.5 * 60 * 1000).toLong)
    f("-10.5m", -(10.5 * 60 * 1000).toLong)
    f("3minutes", 3 * 60 * 1000)
    f("3h", 3 * 3600 * 1000)
    f("-4.5hour", -(4.5 * 3600 * 1000).toLong)
    f("7hours", 7L * 3600 * 1000)
    f("5d", 5L * 24 * 3600 * 1000)
    f("-3.5days", -(3.5 * 24 * 3600 * 1000).toLong)
    f("0.5w", (0.5 * 7 * 24 * 3600 * 1000).toLong)
    f("10weeks", 10L * 7 * 24 * 3600 * 1000)
    f("2months", 2L * 30 * 24 * 3600 * 1000)
    f("2mo", 2L * 30 * 24 * 3600 * 1000)
    f("1.2y", (1.2 * 365 * 24 * 3600 * 1000).toLong)
    f("-3years", -3L * 365 * 24 * 3600 * 1000)
  }

  test("parseInterval error vectors (render_api_test.go:46)") {
    for (s <- Seq("", "foo", "'1minute'", "123"))
      intercept[Exception](GraphiteQL.parseInterval(s))
  }

  test("parseTime vectors (render_api_test.go:63)") {
    val now = System.currentTimeMillis()
    val msPerDay = 24L * 3600 * 1000
    def f(s: String, exp: Long): Unit =
      assert(GraphiteTime.parseTime(now, s) == exp, s)
    f("now", now)
    f("today", now - now % msPerDay)
    f("yesterday", now - now % msPerDay - msPerDay)
    f("1234567890", 1234567890000L)
    f("18:36_20210223", 1614105360000L)
    f("20210223", 1614038400000L)
    f("02/23/21", 1614038400000L)
    f("2021-02-23", 1614038400000L)
    f("2021-02-23T18:36:12Z", 1614105372000L)
    f("-3hours", now - 3 * 3600 * 1000)
    f("1.5minutes", now + (1.5 * 60 * 1000).toLong)
    for (s <- Seq("", "foobar", "1235aafb"))
      intercept[Exception](GraphiteTime.parseTime(now, s))
  }

  test("unmarshalTags vectors (transform_test.go:8)") {
    assert(GraphiteTime.unmarshalTags("") == Map.empty[String, String])
    assert(GraphiteTime.unmarshalTags("foo.bar") == Map("name" -> "foo.bar"))
    assert(GraphiteTime.unmarshalTags("foo;bar=baz") ==
      Map("name" -> "foo", "bar" -> "baz"))
    assert(GraphiteTime.unmarshalTags("foo.bar;bar;x=aa;baz=aaa;x=y") ==
      Map("name" -> "foo.bar", "baz" -> "aaa", "x" -> "y"))
  }

  test("getPathFromName vectors (transform_test.go:47)") {
    val f: (String, String) => Unit = (n, exp) =>
      assert(GraphiteModel.pathFromName(n) == exp, n)
    f("", "")
    f("foo", "foo")
    f("foo.bar", "foo.bar")
    f("foo.bar,baz.aa", "foo.bar,baz.aa")
    f("foo(bar.baz,aa.bb)", "bar.baz")
    f("foo(1, 'foo', aaa )", "aaa")
    f("foo|bar(baz)", "foo")
    f("a(b(c.d.e))", "c.d.e")
    f("foo()", "foo()")
    f("123", "123")
    f("foo(123)", "123")
    f("fo(bar", "fo(bar")
  }

  test("regex replacement conversion (transform_test.go:71)") {
    val f: (String, String) => Unit = (s, exp) =>
      assert(GraphiteFuncs.goReplacement(s) == exp, s)
    f("", "")
    f("foo", "foo")
    f("""a\d+""", """a\d+""")
    f("""\1f\\oo\2""", """$1f\\oo$2""")
  }

  test("naturalLess vectors via the sort key (natural_compare_test.go)") {
    val key: String => String = s =>
      // mirror naturalKeyUdf's function without a SparkSession
      {
        val sb = new StringBuilder
        var i = 0
        while (i < s.length) {
          if (s(i).isDigit) {
            var k = i
            while (k < s.length && s(k).isDigit) k += 1
            val num = s.substring(i, k)
            sb.append("0" * math.max(0, 24 - num.length)).append(num)
            i = k
          } else { sb.append(s(i)); i += 1 }
        }
        sb.toString
      }
    def less(a: String, b: String): Boolean = key(a) < key(b)
    assert(!less("", ""))
    assert(less("a", "b"))
    assert(less("", "foo"))
    assert(!less("foo", ""))
    assert(!less("foo", "foo"))
    assert(!less("b", "a"))
    assert(less("1", "2"))
    assert(!less("10", "2"))
    assert(!less("foo100", "foo12"))
    assert(less("foo12", "foo100"))
    assert(less("10foo2", "10foo10"))
    assert(!less("10foo10", "10foo2"))
    assert(!less("foo1bar10", "foo1bar2aa"))
    assert(less("foo1bar2aa", "foo1bar10aa"))
  }

  test("getRegexpForQuery vectors (metrics_api_test.go:8)") {
    import graft.api.GraphiteHttp.regexForQuery
    val f: (String, Char, String) => Unit = (q, d, exp) =>
      assert(regexForQuery(q, d) == exp, s"$q / $d")
    f("", '.', """^\.?$""")
    f("foobar", '.', """^foobar\.?$""")
    f("*", '.', """^[^\.]*\.?$""")
    f("*", '_', """^[^_]*_?$""")
    f("foo.*.bar", '.', """^foo\.[^\.]*\.bar\.?$""")
    f("fo*b{ar,aaa}[a-z]xx*.d", '.', """^fo[^\.]*b(?:ar|aaa)[a-z]xx[^\.]*\.d\.?$""")
    f("fo*b{ar,aaa}[a-z]xx*_d", '_', """^fo[^_]*b(?:ar|aaa)[a-z]xx[^_]*_d_?$""")
    f("foo.[ab]*z", '.', """^foo\.[ab][^\.]*z\.?$""")
    f("foo_[ab]*", '_', """^foo_[ab][^_]*_?$""")
    f("foo_[ab]_", '_', """^foo_[ab]_$""")
    f("foo.[ab].", '.', """^foo\.[ab]\.$""")
    f("foo{b{ar*,ba*z[1-9]}", '.', """^foo\{b(?:ar[^\.]*|ba[^\.]*z[1-9])\.?$""")
    f("{foo*}", '.', """^(?:foo[^\.]*)\.?$""")
    f("{foo*,}", '.', """^(?:foo[^\.]*|)\.?$""")
    f("foo[bar", '.', """^foo\[bar\.?$""")
    f("foo{bar", '.', """^foo\{bar\.?$""")
    f("foo{ba,r", '.', """^foo\{ba,r\.?$""")
    f("[a-z]", '.', """^[a-z]\.?$""")
    f("{foo,x*,x{y,a*b}c}a", '.', """^(?:foo|x[^\.]*|x(?:y|a[^\.]*b)c)a\.?$""")
  }

  test("sortPaths vectors (metrics_api_test.go:41)") {
    import graft.api.GraphiteHttp.sortPathsRef
    assert(sortPathsRef(Seq("foo", "bar"), ".") == Seq("bar", "foo"))
    assert(sortPathsRef(Seq("foo.", "bar", "aa", "ab."), ".") ==
      Seq("ab.", "foo.", "aa", "bar"))
    assert(sortPathsRef(Seq("foo.", "bar", "aa", "ab."), "_") ==
      Seq("aa", "ab.", "bar", "foo."))
  }

  test("filterLeaves vectors (metrics_api_test.go:54)") {
    import graft.api.GraphiteHttp.filterLeaves
    assert(filterLeaves(Seq("foo", "bar"), ".") == Seq("foo", "bar"))
    assert(filterLeaves(Seq("a.", ".", "bc"), ".") == Seq("bc"))
    assert(filterLeaves(Seq("a.", ".", "bc"), "_") == Seq("a.", ".", "bc"))
    assert(filterLeaves(Seq("a_", "_", "bc"), "_") == Seq("bc"))
    assert(filterLeaves(Seq("foo.", "bar."), ".") == Seq.empty)
  }

  test("addAutomaticVariants vectors (metrics_api_test.go:69)") {
    import graft.api.GraphiteHttp.addAutomaticVariants
    val f: (String, String, String) => Unit = (q, d, exp) =>
      assert(addAutomaticVariants(q, d) == exp, s"$q / $d")
    f("", ".", "")
    f("foobar", ".", "foobar")
    f("foo,bar.baz", ".", "{foo,bar}.baz")
    f("foo,bar.baz", "_", "{foo,bar.baz}")
    f("foo,bar_baz*", "_", "{foo,bar}_baz*")
    f("foo.bar,baz,aa.bb,cc", ".", "foo.{bar,baz,aa}.{bb,cc}")
    f("foo.b*r,b[a-xz]z,aa.bb,cc", ".", "foo.{b*r,b[a-xz]z,aa}.{bb,cc}")
  }

  test("alignTimeUnit honors the request timezone (transform.go:5017 + tz)") {
    import java.time.ZoneId
    val ny = ZoneId.of("America/New_York")
    val berlin = ZoneId.of("Europe/Berlin")
    // 2024-01-15T13:47:23.123Z = NY 08:47:23.123 (EST, -5)
    val t0 = 1705326443123L
    val utcMidnight = 1705276800000L // 2024-01-15T00:00:00Z
    assert(GraphiteTime.alignTimeUnit(t0, "d", ny) == utcMidnight + 5 * 3600000L)
    assert(GraphiteTime.alignTimeUnit(t0, "h", ny) == utcMidnight + 13 * 3600000L)
    // Jan 15 2024 is a Monday: default week align (ISO 1) is that midnight
    assert(GraphiteTime.alignTimeUnit(t0, "w", ny) == utcMidnight + 5 * 3600000L)
    // w0 aligns to Sunday: one absolute day earlier
    assert(GraphiteTime.alignTimeUnit(t0, "w0", ny) ==
      utcMidnight + 5 * 3600000L - 86400000L)
    // mon → Go time.Date(y, m, 0) = last day of previous month, NY midnight
    assert(GraphiteTime.alignTimeUnit(t0, "mon", ny) ==
      1703980800000L + 5 * 3600000L) // 2023-12-31T05:00:00Z
    // UTC default unchanged
    assert(GraphiteTime.alignTimeUnit(t0, "d") == utcMidnight)
    // DST-morning day align: Berlin midnight Mar 31 2024 is offset +1
    assert(GraphiteTime.alignTimeUnit(1711886400000L /* 2024-03-31T12:00Z */,
      "d", berlin) == 1711839600000L) // 2024-03-30T23:00:00Z
    // Go subtracts ABSOLUTE 24h days for week alignment: Wed 2024-04-03
    // w0 → local midnight Apr 3 (UTC+2) minus 72h crosses the Mar 31 DST
    // gap and lands at 2024-03-30T22:00Z (23:00 local, NOT midnight)
    assert(GraphiteTime.alignTimeUnit(1712145600000L /* 2024-04-03T12:00Z */,
      "w0", berlin) == 1711836000000L)
  }

  test("goFmt matches Go %g forms") {
    assert(GraphiteModel.goFmt(5) == "5")
    assert(GraphiteModel.goFmt(5.8) == "5.8")
    assert(GraphiteModel.goFmt(-580) == "-580")
    assert(GraphiteModel.goFmt(123456) == "123456")
    assert(GraphiteModel.goFmt(1e6) == "1e+06")
    assert(GraphiteModel.goFmt(1234567.0) == "1.234567e+06")
    assert(GraphiteModel.goFmt(0.001) == "0.001")
    assert(GraphiteModel.goFmt(0.00001) == "1e-05")
    assert(GraphiteModel.goFmt(1.2799358208e22) == "1.2799358208e+22")
    assert(GraphiteModel.goFmt(Double.NaN) == "NaN")
  }
}
