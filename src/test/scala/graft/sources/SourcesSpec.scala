package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {

  test("datadog v1 JSON: first-colon tag split, host/device labels, sec->ms") {
    val s = spark
    import s.implicits._
    val body = """{"series":[{"metric":"sys.cpu","host":"h1","device":"/dev/sda1",""" +
      """"points":[[1704067200.5, 42.25]],"tags":["env:prod","url:http://x:8080","bare"]}]}"""
    val out = LineFormats.datadogV1(Seq(body).toDF("body")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "sys.cpu")
    val tags = r.getMap[String, String](1).toMap
    assert(tags == Map("env" -> "prod", "url" -> "http://x:8080", "bare" -> "",
      "host" -> "h1", "device" -> "/dev/sda1"))
    assert(r.getLong(2) == 1704067200500L) // seconds (fractional) -> ms
    assert(r.getDouble(3) == 42.25)
  }

  test("datadog v2 JSON: resources, host-tag rename, source_type_name") {
    val s = spark
    import s.implicits._
    val body = """{"series":[{"metric":"sys.mem","points":[{"timestamp":1704067200,""" +
      """"value":7.5}],"resources":[{"name":"h9","type":"host"}],""" +
      """"source_type_name":"System","tags":["env:prod","host:fake"]}]}"""
    val out = LineFormats.datadogV2(Seq(body).toDF("body")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "sys.mem")
    assert(r.getMap[String, String](1).toMap == Map(
      "host" -> "h9", "env" -> "prod", "exported_host" -> "fake",
      "source_type_name" -> "System"))
    assert(r.getLong(2) == 1704067200000L && r.getDouble(3) == 7.5)
  }

  test("newrelic events: string fields are tags, number fields are samples") {
    val s = spark
    import s.implicits._
    val body = """[{"Events":[{"eventType":"SystemSample","timestamp":1704067200,""" +
      """"cpuPercent":12.5,"memoryUsedBytes":1024,"hostname":"h1","empty":"",""" +
      """"numericString":"42"}]}]"""
    val out = LineFormats.newRelic(Seq(body).toDF("body")).collect()
    assert(out.length == 2) // cpuPercent + memoryUsedBytes
    val byName = out.map(r => r.getString(0) -> r).toMap
    assert(byName.keySet == Set("cpuPercent", "memoryUsedBytes"))
    val r = byName("cpuPercent")
    // JSON-string values stay tags even when numeric-looking; empty skipped
    assert(r.getMap[String, String](1).toMap == Map(
      "eventType" -> "SystemSample", "hostname" -> "h1", "numericString" -> "42"))
    assert(r.getLong(2) == 1704067200000L) // sec -> ms
    assert(r.getDouble(3) == 12.5)
  }

  test("zabbix connector line: host labels, item tags, clock+ns timestamp") {
    val s = spark
    import s.implicits._
    val line = """{"host":{"host":"db1","name":"DB one"},"groups":["g"],""" +
      """"item_tags":[{"tag":"app","value":"pg"}],"itemid":7,"name":"pg.size",""" +
      """"clock":1704067200,"ns":987654321,"value":"123.5","type":0}"""
    val out = LineFormats.zabbix(Seq(line).toDF("line")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "pg.size")
    assert(r.getMap[String, String](1).toMap == Map(
      "host" -> "db1", "hostname" -> "DB one", "app" -> "pg"))
    assert(r.getLong(2) == 1704067200987L) // clock*1e3 + ns/1e6
    assert(r.getDouble(3) == 123.5)
  }

  test("ddsketch quantile walk matches the reference interpolation") {
    // hand-built 2-bucket sketch: k=[1500,1501] n=[3,1], cnt=4, min=2, max=9
    // rank(q=0.5) = rint(0.5*3) = 2; first bucket holds cumulative 3 > 2 ->
    // weight = (3-2)/3; vLow = min (i==0), vHigh = gamma^(1500-bias)*gamma
    val s = spark
    import s.implicits._
    val payload = {
      // hand-rolled agent payload: varint/zigzag/length-delimited encoders
      def zz(v: Int): Long = (v.toLong << 1) ^ (v.toLong >> 31)
      def enc(build: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
        val o = new java.io.ByteArrayOutputStream()
        build(o); o.toByteArray
      }
      val kPacked = enc { o => def v2(x0: Long): Unit = { var x = x0
          while ((x & ~0x7fL) != 0) { o.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
          o.write(x.toInt) }
        v2(zz(1500)); v2(zz(1501)) }
      val nPacked = enc { o => o.write(3); o.write(1) }
      val dogFull = enc { o =>
        def v2(x0: Long): Unit = { var x = x0
          while ((x & ~0x7fL) != 0) { o.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
          o.write(x.toInt) }
        def t2(f: Int, w: Int): Unit = v2((f.toLong << 3) | w)
        def d2(f: Int, v: Double): Unit = { t2(f, 1)
          val bits = java.lang.Double.doubleToLongBits(v)
          (0 until 8).foreach(i => o.write(((bits >>> (8 * i)) & 0xff).toInt)) }
        t2(1, 0); v2(1704067200L)
        t2(2, 0); v2(4L)
        d2(3, 2.0); d2(4, 9.0); d2(6, 20.0)
        t2(7, 2); v2(kPacked.length); o.write(kPacked)
        t2(8, 2); v2(nPacked.length); o.write(nPacked)
      }
      val sketch = enc { o =>
        def v2(x0: Long): Unit = { var x = x0
          while ((x & ~0x7fL) != 0) { o.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
          o.write(x.toInt) }
        def t2(f: Int, w: Int): Unit = v2((f.toLong << 3) | w)
        def s2(f: Int, v: String): Unit = { t2(f, 2)
          val b = v.getBytes("UTF-8"); v2(b.length); o.write(b) }
        s2(1, "lat"); s2(2, "h1"); s2(4, "env:prod")
        t2(7, 2); v2(dogFull.length); o.write(dogFull)
      }
      enc { o =>
        def v2(x0: Long): Unit = { var x = x0
          while ((x & ~0x7fL) != 0) { o.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
          o.write(x.toInt) }
        def t2(f: Int, w: Int): Unit = v2((f.toLong << 3) | w)
        t2(1, 2); v2(sketch.length); o.write(sketch)
      }
    }
    val out = ProtoFormats.datadogSketches(Seq(Tuple1(payload)).toDF("payload"))
      .collect()
    assert(out.length == 9) // 5 quantiles + sum/count/min/max
    val byKey = out.map(r => (r.getString(0),
      r.getMap[String, String](1).getOrElse("quantile", "")) -> r.getDouble(3)).toMap
    assert(byKey(("lat.sum", "")) == 20.0)
    assert(byKey(("lat.count", "")) == 4.0)
    assert(byKey(("lat.min", "")) == 2.0)
    assert(byKey(("lat.max", "")) == 9.0)
    // q=0.5: rank=rint(1.5)=2 (round half to even), bucket 0 cum=3 > 2:
    // weight=1/3, vLow=min=2, vHigh=gamma^(1500-bias+1)
    val gamma = 1 + 2.0 / 128
    val bias = 1 - math.floor(math.log(1e-9) / math.log1p(2.0 / 128)).toInt
    val vHigh = math.pow(gamma, (1500 - bias + 1).toDouble)
    val expected = 2.0 * (1.0 / 3) + vHigh * (2.0 / 3)
    assert(math.abs(byKey(("lat", "0.5")) - expected) < 1e-9)
    assert(out.forall(_.getLong(2) == 1704067200000L))
    val tags = out.head.getMap[String, String](1)
    assert(tags("host") == "h1" && tags("env") == "prod")
  }

  test("remote-write native histograms expand to vmrange bucket series") {
    // prompb Histogram (types.proto L57) hand-marshaled: integer counts
    // ride cumulative sint64 DELTAS, float histograms absolute counts
    // (write_request_unmarshaler.go:430); schema 0 → base-2 buckets
    import graft.sources.ProtoFormats.Writer
    def zig(v: Long) = (v << 1) ^ (v >> 63)
    val h = new Writer
    h.int64(1, 10L) // count_int
    h.double(3, 99.5) // sum
    h.int64(4, zig(0)) // schema
    h.double(5, 0.001) // zero_threshold
    h.int64(6, 2L) // zero_count_int
    h.message(11, new Writer().int64(1, zig(1)).int64(2, 2L)) // positive span
    h.int64(12, zig(3)) // positive deltas: 3, then 3-1=2
    h.int64(12, zig(-1))
    h.message(8, new Writer().int64(1, zig(0)).int64(2, 1L)) // negative span
    h.double(10, 1.5) // negative float count (absolute)
    h.int64(15, 15000L) // timestamp ms
    val ts = new Writer
    ts.message(1, new Writer().string(1, "__name__").string(2, "nh"))
    ts.message(1, new Writer().string(1, "job").string(2, "vm"))
    ts.message(4, h)
    val payload = org.xerial.snappy.Snappy.compress(
      new Writer().message(1, ts).bytes)
    val out = ProtoFormats.decodeWriteRequest(payload)
      .map(r => (r.getString(0), r.getAs[Map[String, String]](1),
        r.getLong(2), r.getDouble(3))).toSet
    val jv = Map("job" -> "vm")
    def vr(s: String) = jv + ("vmrange" -> s)
    assert(out == Set(
      ("nh_count", jv, 15000L, 10.0),
      ("nh_sum", jv, 15000L, 99.5),
      ("nh_bucket", vr("-1.000e-03...1.000e-03"), 15000L, 2.0),
      ("nh_bucket", vr("1.000e+00...2.000e+00"), 15000L, 3.0),
      ("nh_bucket", vr("2.000e+00...4.000e+00"), 15000L, 2.0),
      ("nh_bucket", vr("-1.000e+00...-5.000e-01"), 15000L, 1.5)), out)
  }

  test("remote-write protobuf round trip preserves series, tags and samples") {
    val s = spark
    import s.implicits._
    val in = Seq(
      ("up", Map("job" -> "api", "instance" -> "i1"), 1000L, 1.5),
      ("up", Map("job" -> "api", "instance" -> "i1"), 2000L, 2.5),
      ("mem", Map("host" -> "a"), 1500L, -3.25),
      (null.asInstanceOf[String], Map("only" -> "tags"), 99L, 0.0))
      .toDF("name", "tags", "ts", "value")
    val out = ProtoFormats.remoteWrite(ProtoFormats.exportRemoteWrite(in))
      .collect()
      .map(r => (r.getString(0), r.getMap[String, String](1).toMap, r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out == Set(
      ("up", Map("job" -> "api", "instance" -> "i1"), 1000L, 1.5),
      ("up", Map("job" -> "api", "instance" -> "i1"), 2000L, 2.5),
      ("mem", Map("host" -> "a"), 1500L, -3.25),
      (null, Map("only" -> "tags"), 99L, 0.0)))
  }

  test("OTLP protobuf round trip preserves metric names, attributes and points") {
    val s = spark
    import s.implicits._
    val in = Seq(
      ("requests", Map("method" -> "GET"), 1000L, 7.0),
      ("requests", Map("method" -> "POST"), 1000L, 9.0),
      ("latency", Map.empty[String, String], 2500L, 0.125))
      .toDF("name", "tags", "ts", "value")
    val out = ProtoFormats.otlp(ProtoFormats.exportOtlp(in))
      .collect()
      .map(r => (r.getString(0), r.getMap[String, String](1).toMap, r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out == Set(
      ("requests", Map("method" -> "GET"), 1000L, 7.0),
      ("requests", Map("method" -> "POST"), 1000L, 9.0),
      ("latency", Map.empty[String, String], 2500L, 0.125)))
  }

  test("OTLP histogram and summary convert to prometheus-compat series") {
    // ported vectors: reference streamparser_test.go:125-151 — a
    // histogram (count 15, sum 30, bounds [0.1,0.5,1,5], buckets
    // [0,5,10,0,0]), its sumless twin, and a summary (sum 32.5, count 5,
    // quantiles .1/.5/1); resource attr job=vm merges into every series
    import graft.sources.ProtoFormats.Writer
    def kv(field: Int, k: String, v: String) =
      new Writer().message(field,
        new Writer().string(1, k).message(2, new Writer().string(1, v)))
    def histMetric(name: String, hasSum: Boolean) = {
      val dp = new Writer
      dp.message(9, new Writer().string(1, "label2")
        .message(2, new Writer().string(1, "value2")))
      dp.fixed64(3, 30000000000L) // 30s in ns
      dp.fixed64(4, 15L)
      if (hasSum) dp.double(5, 30.0)
      dp.packedFixed64s(6, Seq(0L, 5L, 10L, 0L, 0L))
      dp.packedDoubles(7, Seq(0.1, 0.5, 1.0, 5.0))
      new Writer().string(1, name).message(9, new Writer().message(1, dp))
    }
    def summaryMetric(name: String) = {
      val dp = new Writer
      dp.message(7, new Writer().string(1, "label6")
        .message(2, new Writer().string(1, "value6")))
      dp.fixed64(3, 35000000000L)
      dp.fixed64(4, 5L)
      dp.double(5, 32.5)
      Seq((0.1, 7.5), (0.5, 10.0), (1.0, 15.0)).foreach { case (q, v) =>
        dp.message(6, new Writer().double(1, q).double(2, v))
      }
      new Writer().string(1, name).message(11, new Writer().message(1, dp))
    }
    val sm = new Writer
    sm.message(2, histMetric("my-histogram", hasSum = true))
    sm.message(2, histMetric("my-sumless-histogram", hasSum = false))
    sm.message(2, summaryMetric("my-summary"))
    val resource = new Writer().message(1,
      new Writer().string(1, "job").message(2, new Writer().string(1, "vm")))
    val req = new Writer().message(1,
      new Writer().message(1, resource).message(2, sm)).bytes
    val out = ProtoFormats.decodeOtlp(req)
      .map(r => (r.getString(0), r.getAs[Map[String, String]](1),
        r.getLong(2), r.getDouble(3))).toSet
    val h2 = Map("job" -> "vm", "label2" -> "value2")
    val s6 = Map("job" -> "vm", "label6" -> "value6")
    assert(out == Set(
      ("my-histogram_count", h2, 30000L, 15.0),
      ("my-histogram_sum", h2, 30000L, 30.0),
      ("my-histogram_bucket", h2 + ("le" -> "0.1"), 30000L, 0.0),
      ("my-histogram_bucket", h2 + ("le" -> "0.5"), 30000L, 5.0),
      ("my-histogram_bucket", h2 + ("le" -> "1"), 30000L, 15.0),
      ("my-histogram_bucket", h2 + ("le" -> "5"), 30000L, 15.0),
      ("my-histogram_bucket", h2 + ("le" -> "+Inf"), 30000L, 15.0),
      ("my-sumless-histogram_count", h2, 30000L, 15.0),
      ("my-sumless-histogram_bucket", h2 + ("le" -> "0.1"), 30000L, 0.0),
      ("my-sumless-histogram_bucket", h2 + ("le" -> "0.5"), 30000L, 5.0),
      ("my-sumless-histogram_bucket", h2 + ("le" -> "1"), 30000L, 15.0),
      ("my-sumless-histogram_bucket", h2 + ("le" -> "5"), 30000L, 15.0),
      ("my-sumless-histogram_bucket", h2 + ("le" -> "+Inf"), 30000L, 15.0),
      ("my-summary_count", s6, 35000L, 5.0),
      ("my-summary_sum", s6, 35000L, 32.5),
      ("my-summary", s6 + ("quantile" -> "0.1"), 35000L, 7.5),
      ("my-summary", s6 + ("quantile" -> "0.5"), 35000L, 10.0),
      ("my-summary", s6 + ("quantile" -> "1"), 35000L, 15.0)), out)
    // exponential histogram → VM-native vmrange buckets (ported vector:
    // streamparser_test.go:594 generateExpHistogram / :369-378 expected —
    // scale 0, positive offset 2 counts [1,2,3,4,5,0,0,1], negative
    // offset 2 counts [1..5], count 31, sum 588; zero buckets skipped)
    def zig(v: Int) = ((v << 1) ^ (v >> 31)).toLong
    val ehDp = new Writer
    ehDp.message(1, new Writer().string(1, "label1")
      .message(2, new Writer().string(1, "value1")))
    ehDp.fixed64(3, 15000000000L)
    ehDp.fixed64(4, 31L)
    ehDp.double(5, 588.0)
    ehDp.int64(6, zig(0))
    val pos = new Writer().int64(1, zig(2))
    Seq(1L, 2L, 3L, 4L, 5L, 0L, 0L, 1L).foreach(pos.int64(2, _))
    ehDp.message(8, pos)
    val negB = new Writer().int64(1, zig(2))
    Seq(1L, 2L, 3L, 4L, 5L).foreach(negB.int64(2, _))
    ehDp.message(9, negB)
    val ehReq = new Writer().message(1, new Writer().message(2,
      new Writer().message(2, new Writer().string(1, "test-histogram")
        .message(10, new Writer().message(1, ehDp))))).bytes
    val ehOut = ProtoFormats.decodeOtlp(ehReq)
      .map(r => (r.getString(0), r.getAs[Map[String, String]](1),
        r.getLong(2), r.getDouble(3))).toSet
    val l1 = Map("label1" -> "value1")
    def vr(s: String) = l1 + ("vmrange" -> s)
    assert(ehOut == Set(
      ("test-histogram_count", l1, 15000L, 31.0),
      ("test-histogram_sum", l1, 15000L, 588.0),
      ("test-histogram_bucket", vr("4.000e+00...8.000e+00"), 15000L, 1.0),
      ("test-histogram_bucket", vr("8.000e+00...1.600e+01"), 15000L, 2.0),
      ("test-histogram_bucket", vr("1.600e+01...3.200e+01"), 15000L, 3.0),
      ("test-histogram_bucket", vr("3.200e+01...6.400e+01"), 15000L, 4.0),
      ("test-histogram_bucket", vr("6.400e+01...1.280e+02"), 15000L, 5.0),
      ("test-histogram_bucket", vr("5.120e+02...1.024e+03"), 15000L, 1.0),
      ("test-histogram_bucket", vr("-8.000e+00...-4.000e+00"), 15000L, 1.0),
      ("test-histogram_bucket", vr("-1.600e+01...-8.000e+00"), 15000L, 2.0),
      ("test-histogram_bucket", vr("-3.200e+01...-1.600e+01"), 15000L, 3.0),
      ("test-histogram_bucket", vr("-6.400e+01...-3.200e+01"), 15000L, 4.0),
      ("test-histogram_bucket", vr("-1.280e+02...-6.400e+01"), 15000L, 5.0)), ehOut)
    // NO_RECORDED_VALUE flag (bit 1) → staleness-marker NaN on a gauge
    val staleDp = new Writer().fixed64(3, 1000000000L).double(4, 5.0).int64(8, 1L)
    val staleReq = new Writer().message(1, new Writer().message(2,
      new Writer().message(2, new Writer().string(1, "g")
        .message(5, new Writer().message(1, staleDp))))).bytes
    val staleRows = ProtoFormats.decodeOtlp(staleReq).toList
    assert(staleRows.size == 1 && staleRows.head.getDouble(3).isNaN)
  }

  private def lines(ls: String*): DataFrame = {
    val s = spark
    import s.implicits._
    ls.toDF("line")
  }

  private def one(df: DataFrame): (String, Map[String, String], Long, Double) = {
    val r = df.collect().head
    (r.getString(0), r.getMap[String, String](1).toMap, r.getLong(2), r.getDouble(3))
  }

  test("prometheus text: labels, escapes, timestamps, comments") {
    val df = LineFormats.prometheusText(lines(
      "# HELP http_requests_total comment",
      """http_requests_total{method="post",code="200"} 1027 1395066363000""",
      """msg{txt="a\"b"} 3.5""",
      "no_labels 42",
      "bad line with no value x"), defaultTsMs = 777L)
    val rows = df.orderBy("name").collect()
    assert(rows.length == 3)
    val byName = df.collect().map(r => r.getString(0) ->
      ((r.getMap[String, String](1).toMap, r.getLong(2), r.getDouble(3)))).toMap
    assert(byName("http_requests_total") ==
      ((Map("method" -> "post", "code" -> "200"), 1395066363000L, 1027.0)))
    assert(byName("msg")._1 == Map("txt" -> "a\"b"))
    assert(byName("no_labels") == ((Map.empty, 777L, 42.0)))
  }

  test("influx line protocol: tags, multi-field fan-out, ns timestamp") {
    val df = LineFormats.influxLine(lines(
      "cpu,host=a,region=us usage_idle=90.5,usage_user=7 1465839830100400200",
      "mem value=3i"), defaultTsMs = 99L)
    val rows = df.collect().map(r => r.getString(0) ->
      ((r.getMap[String, String](1).toMap, r.getLong(2), r.getDouble(3)))).toMap
    assert(rows("cpu_usage_idle") ==
      ((Map("host" -> "a", "region" -> "us"), 1465839830100L, 90.5)))
    assert(rows("cpu_usage_user")._3 == 7.0)
    assert(rows("mem_value") == ((Map.empty, 99L, 3.0)))
  }

  test("graphite plaintext with tag support") {
    val df = LineFormats.graphiteLine(lines(
      "foo.bar.baz;dc=east;host=h1 10.5 1609459200",
      "plain.metric 1 1609459260"))
    val rows = df.collect().map(r => r.getString(0) ->
      ((r.getMap[String, String](1).toMap, r.getLong(2), r.getDouble(3)))).toMap
    assert(rows("foo.bar.baz") ==
      ((Map("dc" -> "east", "host" -> "h1"), 1609459200000L, 10.5)))
    assert(rows("plain.metric") == ((Map.empty, 1609459260000L, 1.0)))
  }

  test("opentsdb telnet put") {
    val (n, tags, ts, v) = one(LineFormats.openTsdbLine(lines(
      "put sys.cpu.user 1356998400 42.5 host=web01 cpu=0")))
    assert(n == "sys.cpu.user" && tags == Map("host" -> "web01", "cpu" -> "0"))
    assert(ts == 1356998400000L && v == 42.5)
  }

  test("json-lines import explodes parallel arrays") {
    val df = LineFormats.jsonImport(lines(
      """{"metric":{"__name__":"up","job":"api"},"values":[1,0],"timestamps":[100,200]}"""))
    val rows = df.orderBy("ts").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "up" &&
      rows(0).getMap[String, String](1).toMap == Map("job" -> "api"))
    assert(rows(0).getLong(2) == 100L && rows(0).getDouble(3) == 1.0)
    assert(rows(1).getDouble(3) == 0.0)
  }

  test("csv import stacks value columns") {
    val s = spark
    import s.implicits._
    val csv = Seq((1000L, "h1", 1.5, 7.0)).toDF("ts", "host", "temp", "load")
    val df = LineFormats.csvImport(csv, "ts", Seq("temp", "load"), Seq("host"))
    val rows = df.collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows == Map("temp" -> 1.5, "load" -> 7.0))
  }

  test("prom-text export round-trips through the parser") {
    val df = LineFormats.prometheusText(lines(
      """m{a="1"} 5 100""", """m{a="2"} 7 100"""), 0L)
    val reparsed = LineFormats.prometheusText(LineFormats.exportPromText(df), 0L)
    assert(reparsed.agg(sum("value")).collect().head.getDouble(0) == 12.0)
    assert(reparsed.count() == 2)
  }

  test("json-lines export groups a series into parallel arrays") {
    val df = LineFormats.prometheusText(lines(
      """m{a="1"} 5 100""", """m{a="1"} 6 200""", """m{a="2"} 7 100"""), 0L)
    val out = LineFormats.exportJsonLines(df)
    assert(out.count() == 2) // one line per series
    val back = LineFormats.jsonImport(out)
    assert(back.count() == 3)
    assert(back.agg(sum("value")).collect().head.getDouble(0) == 18.0)
  }

  test("federate emits the latest sample per series") {
    val df = LineFormats.prometheusText(lines(
      """m{a="1"} 5 100""", """m{a="1"} 6 200""", """m{a="2"} 7 100"""), 0L)
    val fed = LineFormats.prometheusText(LineFormats.federate(df), 0L)
    val vals = fed.collect().map(r => r.getMap[String, String](1)("a") -> r.getDouble(3)).toMap
    assert(vals == Map("1" -> 6.0, "2" -> 7.0))
  }

  test("relabel: replace, keep, labeldrop, hashmod, labelmap") {
    val samples = LineFormats.prometheusText(lines(
      """http_total{job="api-prod",instance="i1"} 1 100""",
      """http_total{job="api-dev",instance="i2"} 1 100""",
      """other{job="x"} 1 100"""), 0L)
    val rules = Seq(
      Relabel.Rule("keep", sourceLabels = Seq("job"), regex = "api-.*"),
      Relabel.Rule("replace", sourceLabels = Seq("job"), regex = "api-(.*)",
        targetLabel = "env", replacement = "$1"),
      Relabel.Rule("labeldrop", regex = "instance"))
    val out = Relabel.apply(samples, rules)
    val envs = out.collect().map(r => r.getMap[String, String](1).toMap).toSet
    assert(envs == Set(Map("job" -> "api-prod", "env" -> "prod"),
      Map("job" -> "api-dev", "env" -> "dev")))

    val hashed = Relabel.apply(samples,
      Seq(Relabel.Rule("hashmod", sourceLabels = Seq("job"), targetLabel = "shard", modulus = 4)))
    assert(hashed.collect().forall { r =>
      val s = r.getMap[String, String](1)("shard").toInt; s >= 0 && s < 4
    })

    val mapped = Relabel.apply(samples,
      Seq(Relabel.Rule("labelmap", regex = "job", replacement = "job_copy")))
    assert(mapped.collect().forall(r =>
      r.getMap[String, String](1).get("job_copy") == r.getMap[String, String](1).get("job")))
  }

  test("opentsdb http put: object/array, sec-vs-ms mask, string numbers") {
    val s = spark
    import s.implicits._
    val obj = """{"metric":"a","timestamp":1704067200,"value":"7.5","tags":{"h":"x"}}"""
    val arr = """[{"metric":"b","timestamp":1704067200123,"value":1},
                 |{"metric":"c","value":2},
                 |{"metric":"d","timestamp":"60.9","value":"bad"},
                 |{"value":5}]""".stripMargin
    val out = LineFormats.openTsdbHttp(Seq(obj, arr).toDF("body"), defaultTsMs = 999L)
      .collect().map(r => r.getString(0) ->
        ((r.getMap[String, String](1).toMap, r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set("a", "b", "c")) // bad value + missing metric drop
    assert(out("a") == ((Map("h" -> "x"), 1704067200000L, 7.5))) // sec -> ms
    assert(out("b") == ((Map.empty, 1704067200123L, 1.0))) // already ms
    assert(out("c") == ((Map.empty, 999L, 2.0))) // missing ts -> default
  }

  test("opentsdb http: reference parser_test.go vectors") {
    val s = spark
    import s.implicits._
    // rows that must parse to NOTHING (TestRowsUnmarshalFailure; the
    // metric-type vectors are omitted: from_json coerces a scalar to
    // string where the reference's typed getter errors — documented)
    val rejects = Seq(
      "{g", "1", "\"foo\"", "[1,2]", "null", "{}",
      """{"metric": "aaa"}""",
      """{"metric": "aaa", "timestamp": 1122}""",
      """{"metric": "aaa", "timestamp": "tststs"}""",
      """{"timestamp": 1122, "value": 33}""",
      """{"value": 33}""",
      """{"value": 33, "tags": {"fooo":"bar"}}""",
      """{"metric": "aaa", "timestamp": 1122, "value": "0.0.0"}""",
      """{"metric": "", "timestamp": 1122, "value": 0.45, "tags": {"foo": "bar"}}""",
      """{"metric": "aaa", "timestamp": "foobar", "value": 0.45, "tags": {"foo": "bar"}}""",
      """{"metric": "aaa", "timestamp": 1122, "value": "foobar", "tags": {"foo":"bar"}}""")
    assert(LineFormats.openTsdbHttp(rejects.toDF("body"), 5L).count() == 0)

    // success vectors (TestRowsUnmarshalSuccess); expected (name, tags,
    // tsMs after SECOND_MASK, value); parser ts 0/unset -> default 5
    def one(body: String): (String, Map[String, String], Long, Double) = {
      val r = LineFormats.openTsdbHttp(Seq(body).toDF("body"), 5L).collect()
      assert(r.length == 1, body)
      (r(0).getString(0), r(0).getMap[String, String](1).toMap,
        r(0).getLong(2), r(0).getDouble(3))
    }
    assert(one("""{"metric": "foobar", "timestamp": 789, "value": -123.456, "tags": {"a":"b"}}""")
      == (("foobar", Map("a" -> "b"), 789000L, -123.456)))
    assert(one("""{"metric": "foobar", "timestamp": "1789", "value": -123.456, "tags": {"a":"b"}}""")
      == (("foobar", Map("a" -> "b"), 1789000L, -123.456)))
    // float ts truncates to 17 (seconds -> ms)
    assert(one("""{"metric": "foobar", "timestamp": 17.89, "value": -123.456, "tags": {"a":"b"}}""")
      == (("foobar", Map("a" -> "b"), 17000L, -123.456)))
    assert(one("""{"metric": "foobar", "timestamp": 789, "value": -123.456, "tags": {}}""")
      == (("foobar", Map.empty[String, String], 789000L, -123.456)))
    assert(one("""{"metric": "foobar", "timestamp": 789, "value": -123.456}""")
      == (("foobar", Map.empty[String, String], 789000L, -123.456)))
    // empty tag keys/values dropped
    assert(one("""{"metric": "foobar", "timestamp": 123, "value": -123.456, "tags": {"a":"", "b":"c", "": "d"}}""")
      == (("foobar", Map("b" -> "c"), 123000L, -123.456)))
    assert(one("""{"metric": "foobar", "timestamp": 789, "value": "-12.456", "tags": {"a":"b"}}""")
      == (("foobar", Map("a" -> "b"), 789000L, -12.456)))
    // missing timestamp -> "current time" (our defaultTsMs)
    assert(one("""{"metric": "foobar", "value": "-12.456", "tags": {"a":"b"}}""")
      == (("foobar", Map("a" -> "b"), 5L, -12.456)))
  }

  test("native format: parquet bytes roundtrip") {
    val s = spark
    import s.implicits._
    val in = Seq(
      ("m", Map("a" -> "1"), 60000L, 1.5),
      ("n", Map.empty[String, String], 120000L, 2.5))
      .toDF("name", "tags", "ts", "value")
    val bytes = NativeFormat.exportNative(in)
    assert(new String(bytes.take(4), "ISO-8859-1") == "PAR1")
    val back = NativeFormat.importNative(s, bytes).orderBy("name").collect()
    assert(back.length == 2)
    assert(back(0).getString(0) == "m" &&
      back(0).getMap[String, String](1).toMap == Map("a" -> "1") &&
      back(0).getLong(2) == 60000L && back(0).getDouble(3) == 1.5)
    assert(back(1).getString(0) == "n" && back(1).getDouble(3) == 2.5)
  }

  test("csv import with format descriptors: labels, multi-metric, unix_s time") {
    val df = LineFormats.csvImportFormatted(lines(
      "\"Ber,lin\",20.5,120,7",
      "Paris,18.25,180,9"),
      "1:label:city,2:metric:temp,3:time:unix_s,4:metric:load", defaultTsMs = 0L)
    val rows = df.collect().map(r => (r.getString(0),
      r.getMap[String, String](1)("city")) ->
      ((r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.size == 4) // 2 rows x 2 metric descriptors
    assert(rows(("temp", "Ber,lin")) == ((120000L, 20.5))) // quoted comma survives
    assert(rows(("load", "Paris")) == ((180000L, 9.0)))
  }

  test("csv format descriptors: time extensions and the default timestamp") {
    // unix_ms passthrough; unix_ns integer-truncates to ms; rfc3339 parses
    val ms = LineFormats.csvImportFormatted(lines("1704067200123,5"),
      "1:time:unix_ms,2:metric:m", 0L).collect().head
    assert(ms.getLong(2) == 1704067200123L)
    val ns = LineFormats.csvImportFormatted(lines("1704067200123456789,5"),
      "1:time:unix_ns,2:metric:m", 0L).collect().head
    assert(ns.getLong(2) == 1704067200123L)
    val rfc = LineFormats.csvImportFormatted(lines("2024-01-01T00:02:00Z,5"),
      "1:time:rfc3339,2:metric:m", 0L).collect().head
    assert(rfc.getLong(2) == 1704067320000L)
    // no time column -> caller-supplied default
    val dft = LineFormats.csvImportFormatted(lines("5"), "1:metric:m", 777L)
      .collect().head
    assert(dft.getLong(2) == 777L)
    // malformed value rows drop, malformed time rows drop
    assert(LineFormats.csvImportFormatted(lines("x,notanumber"),
      "1:label:l,2:metric:m", 0L).count() == 0)
    assert(LineFormats.csvImportFormatted(lines("nottime,5"),
      "1:time:unix_s,2:metric:m", 0L).count() == 0)
  }

  test("csv format descriptor errors match the reference's rejections") {
    def err(format: String): String =
      intercept[IllegalArgumentException](
        LineFormats.csvImportFormatted(lines("1,2"), format, 0L)).getMessage
    assert(err("1:metric").contains("must have the following form"))
    assert(err("x:metric:m").contains("cannot parse <column_pos>"))
    assert(err("0:metric:m").contains("cannot be smaller than 1"))
    assert(err("1:metric:m,1:label:l").contains("duplicate <column_pos>"))
    assert(err("1:bogus:m").contains("unknown <column_type>"))
    assert(err("1:metric:").contains("name cannot be empty"))
    assert(err("1:time:unix_s,2:time:unix_ms,3:metric:m")
      .contains("more than a single `time` column"))
    assert(err("1:label:l").contains("missing 'metric' column"))
    assert(err("1:time:fortnights,2:metric:m")
      .contains("unknown format for time parsing"))
  }

  test("relabel: metric name is the __name__ pseudo-label") {
    val samples = LineFormats.prometheusText(lines("""a_total{x="1"} 1 100"""), 0L)
    val out = Relabel.apply(samples, Seq(
      Relabel.Rule("replace", sourceLabels = Seq("__name__"), regex = "(.*)_total",
        targetLabel = "__name__", replacement = "$1")))
    assert(out.collect().head.getString(0) == "a")
    val dropped = Relabel.apply(samples,
      Seq(Relabel.Rule("drop_metrics", regex = "a_.*")))
    assert(dropped.count() == 0)
  }
}
