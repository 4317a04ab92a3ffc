package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ported golden corpus: lib/protoparser/csvimport
  * (column_descriptor_test.go TestParseColumnDescriptorsFailure,
  * parser_test.go TestRowsUnmarshalFailure/Success, TestHeaderDetection)
  * against [[LineFormats.csvImportFormatted]]/[[LineFormats.csvImportBody]].
  */
class CsvImportGoldenSpec extends SparkSpec {

  private case class R(metric: String, tags: Map[String, String],
      value: Double, ts: Long = 0L)

  private def run(format: String, body: String, header: Boolean = false): Seq[R] = {
    val s = spark
    import s.implicits._
    val out =
      if (header) LineFormats.csvImportBody(s, body, format, 0L)
      else LineFormats.csvImportFormatted(
        body.linesIterator.filter(_.trim.nonEmpty).map(_.trim).toSeq.toDF("line"),
        format, 0L)
    out.collect()
      .map(r => R(r.getString(0),
        Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty),
        r.getDouble(3), r.getLong(2)))
      .sortBy(r => (r.ts, r.metric)).toSeq
  }

  test("column descriptor failures (ParseColumnDescriptors)") {
    Seq("",
      "1:time:unix_s", "1:label:aaa", // missing metric column
      "foo:time:unix_s,bar:metric:temp", "0:metric:aaa", "-123:metric:aaa",
      s"${64 * 1024 + 10}:metric:aaa", // invalid column number
      "1:time:unix_s,2:time:rfc3339,3:metric:aaa", // duplicate time
      "1:time:custom:2006,2:time:rfc3339,3:metric:aaa",
      "1:time:foobar,2:metric:aaa", "1:time:,2:metric:aaa",
      "1:time:sss:sss,2:metric:aaa", // invalid time format
      "2:label:,1:metric:aaa", // empty label name
      "1:metric:", // empty metric name
      "1:metric:aaa,2:aaaa:bbb") // unknown type
      .foreach(f => assertThrows[IllegalArgumentException](
        run(f, "1,2,3"), s"format must be rejected: $f"))
  }

  test("unmarshal failures: invalid cells drop the row") {
    Seq(
      ("1:metric:foo,2:time:rfc3339", "234,foobar"),
      ("1:metric:foo,2:time:unix_s", "234,foobar"),
      ("1:metric:foo,2:time:unix_ms", "234,foobar"),
      ("1:metric:foo,2:time:unix_ns", "234,foobar"),
      ("1:metric:foo,2:time:custom:foobar", "234,234"),
      ("1:metric:foo,2:time:unix_s", "1,12345678901234567"), // sec overflow
      ("3:metric:aaa", "123,456"), // missing metric column
      ("1:metric:foo,2:label:bar", "123"), // missing label column
      ("1:label:foo,2:metric:bar", "aaa")) // missing metric column
      .foreach { case (f, body) =>
        assert(run(f, body).isEmpty, s"expected zero rows for $f / $body")
      }
    assert(run("1:metric:foo", "12foobar").isEmpty)
  }

  test("success: basic rows, labels, empty metric cells") {
    assert(run("1:metric:foo", "") == Nil)
    assert(run("1:metric:foo", "123") == Seq(R("foo", Map.empty, 123)))
    assert(run("1:metric:foo,2:time:unix_s,3:label:foo,4:label:bar",
      "123,456,xxx,yy") ==
      Seq(R("foo", Map("foo" -> "xxx", "bar" -> "yy"), 123, 456000L)))
    // extra columns beyond the descriptors are ignored
    assert(run("1:metric:foo", "123,456,foo,bar") == Seq(R("foo", Map.empty, 123)))
    assert(run("2:metric:foo", "123,-45.6,foo,bar") == Seq(R("foo", Map.empty, -45.6)))
    // empty metric cells drop just that sample
    assert(run("1:metric:foo,2:metric:bar,3:metric:baz,4:metric:quux", "1,,,2")
      .map(_.metric).sorted == Seq("foo", "quux"))
    assert(run("1:metric:foo,2:metric:bar", "123,") == Seq(R("foo", Map.empty, 123)))
    assert(run("1:metric:foo,2:metric:bar,3:label:xx", ",,abc") == Nil)
    // missing label values become empty strings
    assert(run("1:metric:foo,2:label:bar,3:label:baz,4:label:xxx", "123,x,,") ==
      Seq(R("foo", Map("bar" -> "x", "baz" -> "", "xxx" -> ""), 123)))
    assert(run("1:metric:foo,2:label:bar,3:label:baz,4:label:xxx", "123,,,") ==
      Seq(R("foo", Map("bar" -> "", "baz" -> "", "xxx" -> ""), 123)))
  }

  test("custom Go time layouts and quoted fields") {
    assert(run(
      "2:metric:bar,1:metric:foo,3:label:foo,4:label:bar,5:time:custom:2006-01-02 15:04:05.999Z",
      """"2.34",5.6,"foo"",bar","aa",2015-08-10 20:04:40.123Z""") ==
      Seq(
        R("bar", Map("foo" -> "foo\",bar", "bar" -> "aa"), 5.6, 1439237080123L),
        R("foo", Map("foo" -> "foo\",bar", "bar" -> "aa"), 2.34, 1439237080123L)))
    assert(run(
      "2:label:symbol,3:time:custom:2006-01-02 15:04:05.999Z,4:metric:bid,5:metric:ask",
      """
      "aaa","AUDCAD","2015-08-10 00:00:01.000Z",0.9725,0.97273
      "aaa","AUDCAD","2015-08-10 00:00:02.000Z",0.97253,0.97276
      """) ==
      Seq(
        R("ask", Map("symbol" -> "AUDCAD"), 0.97273, 1439164801000L),
        R("bid", Map("symbol" -> "AUDCAD"), 0.9725, 1439164801000L),
        R("ask", Map("symbol" -> "AUDCAD"), 0.97276, 1439164802000L),
        R("bid", Map("symbol" -> "AUDCAD"), 0.97253, 1439164802000L)))
  }

  test("rfc3339 with offsets and millisecond precision") {
    val f = "1:label:mytest,2:time:rfc3339,3:metric:M10,4:metric:M20,5:metric:M30,6:metric:M40,7:metric:M50,8:metric:M60"
    val exp = Seq("M10" -> 10.0, "M20" -> 20.0, "M30" -> 30.0, "M60" -> 60.0)
      .map { case (m, v) => R(m, Map("mytest" -> "test"), v, 1671983832000L) }
      .sortBy(_.metric)
    assert(run(f, "test,2022-12-25T16:57:12+01:00,10,20,30,,,60,70,80")
      .sortBy(_.metric) == exp)
    assert(run(f, "test,2022-12-25T16:57:12.000+01:00,10,20,30,,,60,70,80")
      .sortBy(_.metric) == exp)
  }

  test("header detection (UnmarshalDetectHeader)") {
    assert(run("1:metric:foo", "value\n123", header = true) ==
      Seq(R("foo", Map.empty, 123)))
    assert(run("1:metric:foo", "foo\n42", header = true) ==
      Seq(R("foo", Map.empty, 42)))
    assert(run("1:metric:foo,2:time:unix_s", "value,timestamp\n123,456",
      header = true) == Seq(R("foo", Map.empty, 123, 456000L)))
    assert(run("1:metric:foo,2:time:unix_ms", "value,timestamp\n10,2000",
      header = true) == Seq(R("foo", Map.empty, 10, 2000L)))
    assert(run("1:metric:foo,2:time:rfc3339",
      "value,timestamp\n10,2024-01-01T00:00:00Z", header = true) ==
      Seq(R("foo", Map.empty, 10, 1704067200000L)))
    assert(run("1:label:host,2:metric:cpu,3:time:unix_s",
      "host,value,timestamp\nmyhost,99.5,1000", header = true) ==
      Seq(R("cpu", Map("host" -> "myhost"), 99.5, 1000000L)))
    assert(run("1:metric:foo,2:time:unix_s",
      "value,timestamp\n10,100\n20,200\n30,300", header = true) ==
      Seq(R("foo", Map.empty, 10, 100000L), R("foo", Map.empty, 20, 200000L),
        R("foo", Map.empty, 30, 300000L)))
    assert(run("1:metric:bid,2:metric:ask,3:time:unix_s",
      "bid,ask,timestamp\n1.5,1.6,1000", header = true)
      .sortBy(_.metric) ==
      Seq(R("ask", Map.empty, 1.6, 1000000L), R("bid", Map.empty, 1.5, 1000000L)))
    // one non-numeric metric column is enough: the WHOLE first row skips
    assert(run("1:metric:foo,2:metric:bar", "123,count\n1,2", header = true)
      .sortBy(_.metric) ==
      Seq(R("bar", Map.empty, 2), R("foo", Map.empty, 1)))
    // header only, no data
    assert(run("1:metric:foo,2:time:unix_s", "value,timestamp", header = true) == Nil)
    // column gap
    assert(run("3:metric:foo", "a,b,value\na,b,123", header = true) ==
      Seq(R("foo", Map.empty, 123)))
    // numeric first row is data
    assert(run("1:metric:foo,2:time:unix_s", "123,456", header = true) ==
      Seq(R("foo", Map.empty, 123, 456000L)))
    assert(run("1:metric:foo", "123\n456", header = true) ==
      Seq(R("foo", Map.empty, 123), R("foo", Map.empty, 456)))
    // valid rfc3339 parses as data, not header
    assert(run("1:metric:foo,2:time:rfc3339", "123,2024-01-01T00:00:00Z",
      header = true) == Seq(R("foo", Map.empty, 123, 1704067200000L)))
    // text LABEL columns never trigger detection
    assert(run("1:label:host,2:metric:foo,3:time:unix_s",
      "myhost,42,1000\notherhost,99,2000", header = true) ==
      Seq(R("foo", Map("host" -> "myhost"), 42, 1000000L),
        R("foo", Map("host" -> "otherhost"), 99, 2000000L)))
  }
}
