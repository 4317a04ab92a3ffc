package graft.graphite

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Graphite Render engine semantics, pinned against
  * app/vmselect/graphite/transform.go behavior: storage summarize with
  * the 2s jitter rule, aggregation naming/tag rules, xFilesFactor gates,
  * per-series sequential transforms, moving windows with range
  * extension, pairwise lists, and the render-order contract.
  */
class GraphiteSpec extends SparkSpec {
  import spark.implicits._

  private val STEP = 10000L
  private val END = 120000L

  // web.server1.cpu: 1..12; web.server2.cpu: 2..24 (even); web.server1.mem: 0,10,..
  // warmup samples before t=0 feed the moving-window fetch extension
  private lazy val store: DataFrame = {
    val rows = Seq.newBuilder[(String, Map[String, String], Long, Double)]
    for (i <- 0 until 12) {
      rows += (("web.server1.cpu", Map.empty[String, String], i * STEP, i + 1.0))
      rows += (("web.server2.cpu", Map.empty[String, String], i * STEP, 2.0 * (i + 1)))
      rows += (("web.server1.mem", Map.empty[String, String], i * STEP, 10.0 * i))
    }
    rows += (("web.server1.cpu", Map.empty[String, String], -20000L, 100.0))
    rows += (("web.server1.cpu", Map.empty[String, String], -10000L, 200.0))
    // gap.a: buckets 0-3 = 1..4, a sample at 49s (bucket 4), jitter into bucket 5
    for (i <- 0 until 4)
      rows += (("gap.a", Map.empty[String, String], i * STEP, i + 1.0))
    rows += (("gap.a", Map.empty[String, String], 49000L, 7.0))
    // fill.a: values at buckets 0 and 3 only
    rows += (("fill.a", Map.empty[String, String], 0L, 1.0))
    rows += (("fill.a", Map.empty[String, String], 3 * STEP, 4.0))
    // tagged series
    for (i <- 0 until 12) {
      rows += (("req.total", Map("dc" -> "east"), i * STEP, 1.0))
      rows += (("req.total", Map("dc" -> "west"), i * STEP, 3.0))
    }
    // natural-sort fixtures
    rows += (("srt.a2", Map.empty[String, String], 0L, 1.0))
    rows += (("srt.a10", Map.empty[String, String], 0L, 2.0))
    rows.result().toDF("name", "tags", "ts", "value")
  }

  private def ctx: GraphiteCtx =
    GraphiteCtx(spark, store, 0L, END, STEP, nowMs = END)

  private def run(target: String): SeriesSet = GraphiteEval.exec(ctx, target)

  /** (name, t) → value */
  private def points(ss: SeriesSet): Map[(String, Long), Double] =
    ss.df.select("name", "t", "value").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap

  /** names in presentation order */
  private def names(ss: SeriesSet): Seq[String] =
    ss.df.select("ord", "sid", "name").distinct()
      .orderBy("ord", "sid").collect().map(_.getString(2)).toSeq

  // ---- parser ------------------------------------------------------

  test("graphiteql: metric, call, chained, named args, literals") {
    import GraphiteQL._
    assert(parse("web.*.cpu") == MetricExpr("web.*.cpu"))
    parse("sumSeries(web.{a,b}.cpu)") match {
      case FuncExpr("sumSeries", Seq(Arg("", MetricExpr("web.{a,b}.cpu"))), _) =>
      case other => fail(s"unexpected $other")
    }
    parse("foo.bar|sum|avg(0x10, key='v a l', True, None)") match {
      case FuncExpr("avg", args, true) =>
        assert(args.head.expr.isInstanceOf[FuncExpr])
        assert(args(1) == Arg("", NumberExpr(16)))
        assert(args(2) == Arg("key", StringExpr("v a l")))
        assert(args(3) == Arg("", BoolExpr(true)))
        assert(args(4) == Arg("", NoneExpr))
      case other => fail(s"unexpected $other")
    }
    assert(parse("scale(m, -1.5e2)").asInstanceOf[FuncExpr]
      .args(1).expr == NumberExpr(-150))
    intercept[ParseException](parse("sum(m"))
    intercept[ParseException](parse("m tail"))
  }

  test("glob matching: * stays within a dot-group") {
    val re = GraphiteQL.globToRegex("web.*.cpu")
    assert("web.server1.cpu".matches(re))
    assert(!"web.server1.sub.cpu".matches(re))
    assert("web.s2.cpu".matches(GraphiteQL.globToRegex("web.{s1,s2}.cpu")))
    assert("web.s3.cpu".matches(GraphiteQL.globToRegex("web.s[1-5].cpu")))
  }

  // ---- fetch -------------------------------------------------------

  test("fetch: glob select, dense grid, name pseudo-tag, order") {
    val ss = run("web.*.cpu")
    val p = points(ss)
    assert(p.size == 24)
    assert(p(("web.server1.cpu", 0L)) == 1.0)
    assert(p(("web.server2.cpu", 110000L)) == 24.0)
    assert(names(ss) == Seq("web.server1.cpu", "web.server2.cpu"))
    val tags = ss.df.select("tags").collect().map(_.getMap[String, String](0))
    assert(tags.forall(m => m.contains("name")))
  }

  test("fetch: empty buckets are NaN; 2s jitter adopts the near sample") {
    val p = points(run("gap.a"))
    assert(p(("gap.a", 30000L)) == 4.0)
    assert(p(("gap.a", 40000L)) == 7.0) // sample at 49s in bucket 4
    assert(p(("gap.a", 50000L)) == 7.0) // jitter: 50s - 49s <= 2s
    assert(p(("gap.a", 60000L)).isNaN) // 60s - 49s > 2s
    assert(p(("gap.a", 110000L)).isNaN)
  }

  // ---- aggregation -------------------------------------------------

  test("sumSeries: values, dedup naming, tags") {
    val ss = run("sumSeries(web.*.cpu)")
    val p = points(ss)
    assert(p(("sumSeries(web.*.cpu)", 0L)) == 3.0)
    assert(p(("sumSeries(web.*.cpu)", 110000L)) == 36.0)
    val tags = ss.df.select("tags").head.getMap[String, String](0)
    assert(tags("aggregatedBy") == "sum")
    assert(tags("name") == "sumSeries(web.*.cpu)")
  }

  test("averageSeries skips NaN; aggregate xFilesFactor=1 gates mixed points") {
    // gap.a is NaN from 60s; web.server1.cpu has values everywhere
    val avg = points(run("averageSeries(web.server1.cpu, gap.a)"))
    val key = avg.keys.head._1
    assert(avg((key, 0L)) == 1.0) // (1+1)/2
    assert(avg((key, 110000L)) == 12.0) // only cpu contributes
    val gated = points(run("aggregate(group(web.server1.cpu, gap.a), 'sum', 1)"))
    val gkey = gated.keys.head._1
    assert(gated((gkey, 0L)) == 2.0)
    assert(gated((gkey, 110000L)).isNaN) // 1 of 2 series → gated out
  }

  test("diffSeries: first series minus the rest, in branch order") {
    val p = points(run("diffSeries(web.server2.cpu, web.server1.cpu)"))
    val key = p.keys.head._1
    assert(key == "diffSeries(web.server2.cpu,web.server1.cpu)")
    assert(p((key, 0L)) == 1.0) // 2 - 1
    assert(p((key, 110000L)) == 12.0) // 24 - 12
  }

  test("groupByNode groups on the path node and names by key") {
    val ss = run("groupByNode(web.server1.*, 1, 'sum')")
    val p = points(ss)
    assert(p(("server1", 0L)) == 1.0) // cpu 1 + mem 0
    assert(p(("server1", 110000L)) == 12.0 + 110.0)
    val ss2 = run("groupByNode(web.*.cpu, 1, 'max')")
    assert(points(ss2)(("server2", 110000L)) == 24.0)
    assert(names(ss2).sorted == Seq("server1", "server2"))
  }

  test("countSeries / rangeOfSeries / multiplySeries") {
    val c = points(run("countSeries(web.*.cpu)"))
    assert(c((c.keys.head._1, 0L)) == 2.0)
    val r = points(run("rangeOfSeries(web.*.cpu)"))
    assert(r((r.keys.head._1, 110000L)) == 12.0)
    val m = points(run("multiplySeries(web.*.cpu)"))
    assert(m((m.keys.head._1, 0L)) == 2.0)
  }

  // ---- pointwise + per-series -------------------------------------

  test("pointwise naming and math: absolute, scale, offset, pow") {
    val p = points(run("scale(offset(web.server1.cpu, -2), 10)"))
    assert(p(("scale(offset(web.server1.cpu,-2),10)", 0L)) == -10.0)
    val q = points(run("pow(web.server1.cpu, 2)"))
    assert(q(("pow(web.server1.cpu,2)", 30000L)) == 16.0)
  }

  test("derivative and perSecond") {
    val d = points(run("derivative(web.server2.cpu)"))
    val dk = d.keys.head._1
    assert(d((dk, 0L)).isNaN)
    assert(d((dk, 10000L)) == 2.0)
    val ps = points(run("perSecond(web.server1.cpu)"))
    val pk = ps.keys.head._1
    assert(ps((pk, 10000L)) == 0.1) // +1 per 10s
  }

  test("keepLastValue and interpolate honor their limits") {
    val k1 = points(run("keepLastValue(fill.a, 1)"))
    val kk = k1.keys.head._1
    assert(k1((kk, 10000L)) == 1.0)
    assert(k1((kk, 20000L)).isNaN) // second NaN beyond limit
    val in = points(run("interpolate(fill.a)"))
    val ik = in.keys.head._1
    assert(in((ik, 10000L)) == 2.0)
    assert(in((ik, 20000L)) == 3.0)
    assert(in((ik, 40000L)).isNaN) // tail never interpolates
    val lim = points(run("interpolate(fill.a, 1)"))
    assert(lim((lim.keys.head._1, 10000L)).isNaN) // run of 2 > limit 1
  }

  test("transformNull, isNonNull, integral") {
    val t = points(run("transformNull(fill.a, 9)"))
    assert(t(("transformNull(fill.a,9)", 20000L)) == 9.0)
    val nn = points(run("isNonNull(fill.a)"))
    assert(nn(("isNonNull(fill.a)", 0L)) == 1.0)
    assert(nn(("isNonNull(fill.a)", 20000L)) == 0.0)
    val integ = points(run("integral(web.server1.cpu)"))
    assert(integ(("integral(web.server1.cpu)", 30000L)) == 10.0)
  }

  test("stacked accumulates across series in order") {
    val ss = run("stacked(group(web.server1.cpu, web.server2.cpu))")
    val p = points(ss)
    assert(p(("stacked(web.server1.cpu)", 0L)) == 1.0)
    assert(p(("stacked(web.server2.cpu)", 0L)) == 3.0)
  }

  // ---- filters / sorts --------------------------------------------

  test("filters: averageAbove, maximumBelow, grep, exclude, limit") {
    assert(names(run("averageAbove(web.*.cpu, 10)")) == Seq("web.server2.cpu"))
    assert(names(run("maximumBelow(web.*.cpu, 20)")) == Seq("web.server1.cpu"))
    assert(names(run("grep(web.*.cpu, 'server1')")) == Seq("web.server1.cpu"))
    assert(names(run("exclude(web.*.cpu, 'server1')")) == Seq("web.server2.cpu"))
    assert(names(run("limit(web.*.cpu, 1)")) == Seq("web.server1.cpu"))
  }

  test("highestCurrent / lowestAverage pick and order correctly") {
    assert(names(run("highestCurrent(web.*.cpu, 1)")) == Seq("web.server2.cpu"))
    assert(names(run("lowestAverage(web.*.cpu, 1)")) == Seq("web.server1.cpu"))
    // highest returns ascending stat order
    assert(names(run("highestCurrent(web.*.cpu, 2)")) ==
      Seq("web.server1.cpu", "web.server2.cpu"))
  }

  test("sortByName natural orders a2 before a10 numerically") {
    assert(names(run("sortByName(srt.*)")) == Seq("srt.a10", "srt.a2"))
    assert(names(run("sortByName(srt.*, natural=True)")) == Seq("srt.a2", "srt.a10"))
  }

  test("sortBy max descending") {
    assert(names(run("sortBy(web.*.cpu, 'max', True)")) ==
      Seq("web.server2.cpu", "web.server1.cpu"))
  }

  // ---- lists / division / percent ---------------------------------

  test("sumSeriesLists pairs positionally and names per pair") {
    val p = points(run("sumSeriesLists(web.server1.cpu, web.server2.cpu)"))
    val key = "sumSeries(web.server1.cpu,web.server2.cpu)"
    assert(p((key, 0L)) == 3.0)
    assert(p((key, 110000L)) == 36.0)
  }

  test("divideSeries by a single divisor") {
    val p = points(run("divideSeries(web.server2.cpu, web.server1.cpu)"))
    val key = "divideSeries(web.server2.cpu,web.server1.cpu)"
    assert(p((key, 0L)) == 2.0)
    assert(p((key, 110000L)) == 2.0)
  }

  test("asPercent against the set total") {
    val p = points(run("asPercent(web.*.cpu)"))
    assert(math.abs(p(("asPercent(web.server1.cpu,sumSeries(web.*.cpu))", 0L)) -
      100.0 / 3) < 1e-9)
    assert(math.abs(p(("asPercent(web.server2.cpu,sumSeries(web.*.cpu))", 0L)) -
      200.0 / 3) < 1e-9)
    val q = points(run("asPercent(web.server1.cpu, 50)"))
    assert(q(("asPercent(web.server1.cpu,50)", 0L)) == 2.0)
  }

  // ---- re-bucketing / moving --------------------------------------

  test("summarize sums 30s buckets") {
    val p = points(run("summarize(web.server1.cpu, '30s', 'sum')"))
    val key = "summarize(web.server1.cpu,'30s','sum')"
    assert(p((key, 0L)) == 6.0) // 1+2+3
    assert(p((key, 90000L)) == 33.0) // 10+11+12
  }

  test("hitcount integrates value*seconds per interval") {
    val p = points(run("hitcount(web.server1.cpu, '20s')"))
    val key = "hitcount(web.server1.cpu,'20s')"
    // bucket [0,20s): v2*10s (sample at 10s bills back 10s) = 20
    assert(p((key, 0L)) == 20.0)
    // bucket [20s,40s): carry v2 (20s->? no: sample at 20s exactly) →
    // v3*(20-20=0)… sample at 20s lands with lag 10s<20s: carry v2*(0)=0,
    // then 3*(0)+4*(10s)=40
    assert(p((key, 20000L)) == 40.0)
  }

  test("smartSummarize alignTo honors the request timezone") {
    // epoch 0 = 1970-01-01T00:00Z = Dec 31 19:00 in New York, so 'd'
    // alignment moves start to NY midnight = 1969-12-31T05:00:00Z =
    // -68400000 (transform.go:4996 alignTimeUnit in
    // ec.currentTime.Location()). With a 2h interval the floor'd
    // pointsLen (eval.go:112, (end-start)/step = 9) emits buckets at
    // -68400000 + k*7200000 — all before the samples, hence NaN, but
    // the bucket TIMESTAMPS pin the tz-shifted start end-to-end.
    val nyCtx = ctx.copy(tz = java.time.ZoneId.of("America/New_York"))
    val p = points(GraphiteEval.exec(nyCtx,
      "smartSummarize(web.server1.cpu, '1min', 'sum', 'd')"))
    val key = "smartSummarize(web.server1.cpu,'1min','sum')"
    // 1142 one-minute buckets from the shifted start; the warmup samples
    // (100, 200) land in the [-60s, 0) bucket, the live samples in the
    // last two
    assert(p.size == 1142)
    assert(p((key, -68400000L)).isNaN)
    assert(p((key, -60000L)) == 300.0)
    assert(p((key, 0L)) == 21.0)
    assert(p((key, 60000L)) == 57.0)
    // UTC default: start stays 0 → two 1-minute buckets, warmups excluded
    val pu = points(run("smartSummarize(web.server1.cpu, '1min', 'sum', 'd')"))
    assert(pu.keySet == Set((key, 0L), (key, 60000L)))
    assert(pu((key, 0L)) == 21.0)
    assert(pu((key, 60000L)) == 57.0)
  }

  test("hitcount alignToInterval honors the request timezone") {
    val nyCtx = ctx.copy(tz = java.time.ZoneId.of("America/New_York"))
    val p = points(GraphiteEval.exec(nyCtx,
      "hitcount(web.server1.cpu, '1d', true)"))
    val key = "hitcount(web.server1.cpu,'1d',true)"
    // aligned start = NY midnight before epoch → one 1d bucket there
    assert(p.keys.map(_._2).toSet == Set(-68400000L))
    assert(p.keys.map(_._1).toSet == Set(key))
  }

  test("movingAverage with a points-count window reaches before start") {
    val p = points(run("movingAverage(web.server1.cpu, 2)"))
    val key = "movingAverage(web.server1.cpu,2)"
    // at t=0 the window covers the warmup samples 100, 200
    assert(p((key, 0L)) == 150.0)
    assert(p((key, 20000L)) == 1.5) // samples at 0,10s = 1,2
  }

  test("movingMax with a misaligned interval window") {
    val p = points(run("movingMax(web.server1.cpu, '25s')"))
    val key = "movingMax(web.server1.cpu,'25s')"
    // output grid steps by 10s from 0; fetch grid sits at -25s+k*10s.
    // window [5s,30s) covers grid 5s,15s,25s = samples @10s,20s,30s → max 4
    assert(p((key, 30000L)) == 4.0)
    // window [-25s,0) covers the warmup grid points 100, 200 (and v=1 @-5s)
    assert(p((key, 0L)) == 200.0)
  }

  test("exponentialMovingAverage of a constant series is the constant") {
    // dc=east is constant 1.0 and transformNull fills its warmup with the
    // same 1.0, so the EMA recursion stays at the constant
    val p = points(run(
      "exponentialMovingAverage(transformNull(seriesByTag('name=req.total', 'dc=east'), 1), 3)"))
    assert(p.nonEmpty)
    assert(p.values.forall(v => math.abs(v - 1.0) < 1e-9))
  }

  test("timeShift pulls earlier data forward") {
    val p = points(run("timeShift(web.server1.cpu, '10s')"))
    val key = "timeShift(web.server1.cpu,'10s')"
    // shift = -10s: value at t is the sample from t-10s
    assert(p((key, 10000L)) == 1.0)
    assert(p((key, 110000L)) == 11.0)
  }

  // ---- synthetic + tags -------------------------------------------

  test("constantLine, threshold, timeFunction") {
    val c = points(run("constantLine(7)"))
    assert(c(("7", 0L)) == 7.0)
    assert(c.size == 3)
    val t = points(run("threshold(5, 'lim')"))
    assert(t(("lim", 0L)) == 5.0)
    val tf = run("time('clock', 30)")
    val p = points(tf)
    assert(p(("clock", 30000L)) == 30.0)
  }

  test("seriesByTag and groupByTags") {
    val ss = run("seriesByTag('name=req.total', 'dc=east')")
    val p = points(ss)
    assert(p.size == 12)
    assert(p.values.forall(_ == 1.0))
    val g = run("groupByTags(seriesByTag('name=req.total'), 'sum', 'dc')")
    val gp = points(g)
    assert(gp(("sum;dc=east", 0L)) == 1.0)
    assert(gp(("sum;dc=west", 0L)) == 3.0)
  }

  test("aliasByNode and aliasSub") {
    assert(names(run("aliasByNode(web.server1.cpu, 1)")) == Seq("server1"))
    assert(names(run("aliasByNode(web.server1.cpu, 0, -1)")) == Seq("web.cpu"))
    assert(names(run("aliasSub(web.server1.cpu, 'server(\\d+)', 'srv\\1')")) ==
      Seq("web.srv1.cpu"))
  }

  test("holtWintersForecast produces trimmed predictions") {
    val ss = GraphiteEval.exec(
      ctx, "holtWintersForecast(web.server1.cpu, '30s', '20s')")
    val p = points(ss)
    assert(p.size == 12)
    assert(p.keys.forall(_._1 == "holtWintersForecast(web.server1.cpu)"))
  }

  test("linearRegression fits the ramp exactly") {
    val p = points(run("linearRegression(web.server1.cpu)"))
    val key = p.keys.head._1
    assert(key.startsWith("linearRegression(web.server1.cpu"))
    // perfect line: v = 1 + t/10s
    assert(math.abs(p((key, 0L)) - 1.0) < 1e-6)
    assert(math.abs(p((key, 110000L)) - 12.0) < 1e-6)
  }

  test("pathExpression is capped at 1024 chars (safePathExpression)") {
    val long = "x" * 1500
    val ss = run(s"absolute(alias(web.server1.cpu, '$long'))")
    val pe = ss.df.select("pathExpr").head.getString(0)
    assert(pe.length == GraphiteModel.MaxPathExprLen + 3)
    assert(pe.endsWith("..."))
  }

  test("unknown function and reference TODOs raise errors") {
    intercept[GraphiteEval.GraphiteError](run("noSuchFunc(web.*.cpu)"))
    intercept[GraphiteEval.GraphiteError](run("cactiStyle(web.*.cpu)"))
  }
}
