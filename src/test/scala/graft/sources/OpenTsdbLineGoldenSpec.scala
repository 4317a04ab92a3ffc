package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Ported golden corpus: lib/protoparser/opentsdb/parser_test.go
  * (TestRowsUnmarshalFailure / TestRowsUnmarshalSuccess) against
  * [[LineFormats.parseOpenTsdbLine]]. Pure-JVM; timestamps raw (the
  * DataFrame wrapper applies SECOND_MASK scaling).
  */
class OpenTsdbLineGoldenSpec extends AnyFunSuite {

  private case class R(metric: String, tags: Map[String, String],
      value: Double, ts: Long)

  private def parse(s: String): Seq[R] =
    s.split("\n", -1).toSeq.flatMap(l => LineFormats.parseOpenTsdbLine(l))
      .map(p => R(p.name, p.tags, p.value, p.ts))

  test("failures: every invalid line parses to zero rows") {
    Seq(
      "xx", // missing put prefix
      "put  111 34", // missing metric? (111 becomes metric, then no value sep)
      "put aaa", // missing timestamp
      "put aaa 1123", // missing value
      "put aaa timestamp", // invalid timestamp
      "put foobar 3df4 -123456 a=b",
      "put aaa 123 invalid-value", // invalid value
      "put foobar 789 -123foo456 a=b",
      "put aaa\nbbb 123 34", // invalid multiline
      "put aaa 123 4.5 foo") // invalid tag
      .foreach(s => assert(parse(s).isEmpty, s"expected zero rows for $s"))
  }

  test("empty lines") {
    Seq("", "\r", "\n\n", "\n\r\n").foreach(s => assert(parse(s).isEmpty))
  }

  test("single line, empty tags, missing tags, fractional timestamps") {
    assert(parse("put foobar 789 -123.456 a=b") ==
      Seq(R("foobar", Map("a" -> "b"), -123.456, 789L)))
    assert(parse("put foobar 789 -123.456 a= b=c =d") ==
      Seq(R("foobar", Map("b" -> "c"), -123.456, 789L)))
    assert(parse("put aaa 123 43") == Seq(R("aaa", Map.empty, 43, 123L)))
    assert(parse("put aaa 123 43 ") == Seq(R("aaa", Map.empty, 43, 123L)))
    assert(parse("put foobar 789.4 -123.456 a=b") ==
      Seq(R("foobar", Map("a" -> "b"), -123.456, 789L)))
    assert(parse("put foo.bar 789 123.456 a=b\n") ==
      Seq(R("foo.bar", Map("a" -> "b"), 123.456, 789L)))
  }

  test("tag values keep '=', multiple tags, multi lines with bad middle") {
    assert(parse("put foo 2 1 bar=baz") == Seq(R("foo", Map("bar" -> "baz"), 1, 2L)))
    assert(parse("put foo 2 1 bar=baz x=y") ==
      Seq(R("foo", Map("bar" -> "baz", "x" -> "y"), 1, 2L)))
    assert(parse("put foo 2 1 bar=baz=aaa x=y") ==
      Seq(R("foo", Map("bar" -> "baz=aaa", "x" -> "y"), 1, 2L)))
    assert(parse("put foo 2 0.3 a=b\nput bar.baz 43 0.34 a=b\n") ==
      Seq(R("foo", Map("a" -> "b"), 0.3, 2L),
        R("bar.baz", Map("a" -> "b"), 0.34, 43L)))
    assert(parse("put foo 2 0.3 a=b\naaa bbb\nput bar.baz 43 0.34 a=b\n") ==
      Seq(R("foo", Map("a" -> "b"), 0.3, 2L),
        R("bar.baz", Map("a" -> "b"), 0.34, 43L)))
  }

  test("repeated spaces between every token") {
    val exp = Seq(R("foobar", Map("a" -> "b"), -123.456, 789L))
    assert(parse("put  foobar 789 -123.456 a=b") == exp)
    assert(parse("put foobar  789 -123.456 a=b") == exp)
    assert(parse("put foobar 789  -123.456 a=b") == exp)
    assert(parse("put foobar 789 -123.456  a=b") == exp)
    assert(parse("put foobar 789 -123.456 a=b ") == exp)
    assert(parse("put foobar 789 -123.456 a=b  c=d") ==
      Seq(R("foobar", Map("a" -> "b", "c" -> "d"), -123.456, 789L)))
  }
}
