package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamAggrSpec extends SparkSpec {

  private def samples(rows: (String, Map[String, String], Long, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("name", "tags", "ts", "value")
  }

  private val in = samples(
    ("m", Map("host" -> "a", "dc" -> "e"), 500L, 1.0),
    ("m", Map("host" -> "a", "dc" -> "e"), 900L, 3.0),
    ("m", Map("host" -> "b", "dc" -> "e"), 800L, 5.0),
    ("m", Map("host" -> "a", "dc" -> "e"), 1500L, 7.0))

  test("batch aggregation: outputs, naming, by-grouping") {
    val out = StreamAggr.aggregateBatch(in,
      StreamAggr.Config(1000L, by = Seq("dc"),
        outputs = Seq("sum_samples", "count_samples", "count_series", "last", "max")))
    val rows = out.collect().map(r =>
      (r.getString(0), r.getLong(2), r.getDouble(3))).toSet
    // window (0,1000]: sums 1+3+5=9, 3 samples, 2 series, last=3 (ts 900), max 5
    assert(rows.contains(("m:1s_by_dc_sum_samples", 1000L, 9.0)))
    assert(rows.contains(("m:1s_by_dc_count_samples", 1000L, 3.0)))
    assert(rows.contains(("m:1s_by_dc_count_series", 1000L, 2.0)))
    assert(rows.contains(("m:1s_by_dc_last", 1000L, 3.0)))
    assert(rows.contains(("m:1s_by_dc_max", 1000L, 5.0)))
    assert(rows.contains(("m:1s_by_dc_sum_samples", 2000L, 7.0)))
    val tags = out.filter(col("name").endsWith("sum_samples"))
      .select(col("tags")).collect().head.getMap[String, String](0).toMap
    assert(tags == Map("dc" -> "e")) // only by-labels survive
  }

  test("config validation mirrors newAggregator (streamaggr.go:475-608)") {
    def bad(f: => StreamAggr.Config): String =
      intercept[IllegalArgumentException](f).getMessage
    assert(bad(StreamAggr.Config(500L)).contains("cannot be smaller than 1s"))
    assert(bad(StreamAggr.Config(2000L, dedupIntervalMs = Some(3000L)))
      .contains("cannot exceed interval"))
    assert(bad(StreamAggr.Config(3000L, dedupIntervalMs = Some(2000L)))
      .contains("must be a multiple of dedup_interval"))
    assert(bad(StreamAggr.Config(2000L, stalenessIntervalMs = Some(1000L)))
      .contains("staleness_interval"))
    assert(bad(StreamAggr.Config(1000L, by = Seq("a"), without = Seq("b")))
      .contains("cannot be set simultaneously"))
    assert(bad(StreamAggr.Config(1000L, outputs = Nil)).contains("at least a single entry"))
    assert(bad(StreamAggr.Config(1000L, outputs = Seq("max", "max")))
      .contains("duplicate aggregation function"))
    assert(bad(StreamAggr.Config(1000L, outputs = Seq("quantiles(0.5)", "quantiles(0.9)")))
      .contains("duplicate aggregation function"))
    assert(bad(StreamAggr.Config(1000L, outputs = Seq("p99"))).contains("unsupported output"))
    assert(bad(StreamAggr.Config(1000L, outputs = Seq("quantiles(1.5)")))
      .contains("must be in the range [0..1]"))
    assert(bad(StreamAggr.Config(1000L, outputs = Seq("quantiles(")))
      .contains("missing closing brace"))
    assert(bad(StreamAggr.Config(1000L, outputs = Seq("quantiles()")))
      .contains("at least one phi"))
    assert(bad(StreamAggr.Config(1000L, outputs = Seq("histogram_bucket"),
      keepMetricNames = true)).contains("cannot be applied"))
    assert(bad(StreamAggr.Config(1000L, outputs = Seq("quantiles(0.5, 0.9)"),
      keepMetricNames = true)).contains("cannot be applied"))
    // single-phi quantiles + keep_metric_names is legal (one series out)
    StreamAggr.Config(1000L, outputs = Seq("quantiles(0.5)"), keepMetricNames = true)
  }

  test("quantiles(...) output: per-phi series with a quantile label") {
    val out = StreamAggr.aggregateBatch(in,
      StreamAggr.Config(1000L, by = Seq("dc"), outputs = Seq("quantiles(0.5, 1)")))
      .collect()
      .map(r => (r.getString(0), r.getMap[String, String](1).toMap,
        r.getLong(2), r.getDouble(3))).toSet
    // window (0,1000]: values 1,3,5 → q0.5=3, q1=5; phi strings Go-%g
    assert(out.contains(("m:1s_by_dc_quantiles",
      Map("dc" -> "e", "quantile" -> "0.5"), 1000L, 3.0)))
    assert(out.contains(("m:1s_by_dc_quantiles",
      Map("dc" -> "e", "quantile" -> "1"), 1000L, 5.0)))
    assert(out.contains(("m:1s_by_dc_quantiles",
      Map("dc" -> "e", "quantile" -> "0.5"), 2000L, 7.0)))
  }

  test("without-grouping suffix and label dropping (streamaggr.go:626-634)") {
    val out = StreamAggr.aggregateBatch(in,
      StreamAggr.Config(1000L, without = Seq("host"), outputs = Seq("min")))
      .collect()
      .map(r => (r.getString(0), r.getMap[String, String](1).toMap,
        r.getLong(2), r.getDouble(3))).toSet
    assert(out.contains(("m:1s_without_host_min", Map("dc" -> "e"), 1000L, 1.0)))
  }

  test("sum_samples_total accumulates interval sums across flushes") {
    // empty by/without groups per full label set (host a and b separate)
    val out = StreamAggr.sumSamplesTotalBatch(in, StreamAggr.Config(1000L))
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set((1000L, 4.0), (1000L, 5.0), (2000L, 11.0)))
  }

  test("explicit staleness resets counter state after a silent gap") {
    val counter = samples(
      ("c", Map("i" -> "x"), 500L, 10.0),
      ("c", Map("i" -> "x"), 900L, 14.0),    // +4
      ("c", Map("i" -> "x"), 5900L, 100.0))  // 5s gap > 2s staleness
    // without staleness: 100 >= 14 → +86; with: treated as a fresh series
    val plain = StreamAggr.totalBatch(counter, StreamAggr.Config(1000L))
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    assert(plain(6000L) == 100.0) // 10 + 4 + 86
    val stale = StreamAggr.totalBatch(counter,
      StreamAggr.Config(1000L, stalenessIntervalMs = Some(2000L)))
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    // the group entry dies with its staleness (output.go flushState): the
    // running total restarts in the new era — and re-emits while alive
    assert(stale(1000L) == 14.0 && stale(2000L) == 14.0) // alive re-emit
    assert(!stale.contains(3000L)) // past deadline: group deleted
    assert(stale(6000L) == 100.0)  // fresh era: total restarts
    val staleProm = StreamAggr.totalBatch(counter,
      StreamAggr.Config(1000L, stalenessIntervalMs = Some(2000L)),
      keepFirstSample = false)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    assert(staleProm(1000L) == 4.0 && staleProm(6000L) == 0.0) // firsts dropped
  }

  test("ignore_first_sample_interval suppresses early first samples") {
    val counter = samples(
      ("c", Map("i" -> "x"), 500L, 10.0),   // first sample inside warmup
      ("c", Map("i" -> "x"), 900L, 14.0),
      ("c", Map("i" -> "y"), 3500L, 50.0),  // first sample after warmup
      ("c", Map("i" -> "y"), 3900L, 51.0))
    val out = StreamAggr.totalBatch(counter,
      StreamAggr.Config(1000L, ignoreFirstSampleIntervalMs = Some(2000L)))
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    // x's first sample (ts 500 < 500+2000) ignored: its group shows +4;
    // y starts at 3500 ≥ 2500: its group shows 50 + 1 (groups are
    // per-label-set with empty by/without)
    assert(out(1000L) == 4.0 && out(4000L) == 51.0)
  }

  test("ignore_first_intervals drops the replay's first N flushes") {
    val yaml =
      """- match: m
        |  interval: 1s
        |  outputs: [sum_samples]
        |  ignore_first_intervals: 1
        |  staleness_interval: 5s
        |  ignore_old_samples: true
        |  no_align_flush_to_interval: true
        |  flush_on_shutdown: true
        |  enable_windows: true
        |""".stripMargin
    val cfgs = StreamAggr.parseConfigs(yaml)
    assert(cfgs.head.ignoreFirstIntervals == 1 &&
      cfgs.head.stalenessIntervalMs.contains(5000L) &&
      cfgs.head.ignoreOldSamples && cfgs.head.noAlignFlushToInterval &&
      cfgs.head.flushOnShutdown && cfgs.head.enableWindows &&
      cfgs.head.intervalRaw == "1s")
    val out = StreamAggr.applyAll(in, cfgs)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toSet
    // first flush at 1000 dropped; host-b's group is alive-but-empty at
    // 2000 (staleness 5s) so sum_samples flushes 0 there
    assert(out == Set((2000L, 7.0), (2000L, 0.0)))
  }

  test("full config pipeline: yaml parse, match, drop labels, relabel, keep names") {
    val yaml =
      """# the -streamAggr.config shape (streamaggr.go Config)
        |- name: agg1
        |  match: '{__name__="m"}'
        |  interval: 1s
        |  outputs: [sum_samples]
        |  by: [dc]
        |  keep_metric_names: true
        |  drop_input_labels: [junk]
        |  output_relabel_configs:
        |  - target_label: env
        |    replacement: prod
        |- match: n
        |  interval: 1s
        |  outputs:
        |  - max
        |  without: [host]
        |  dedup_interval: 500ms
        |""".stripMargin
    val cfgs = StreamAggr.parseConfigs(yaml)
    assert(cfgs.length == 2)
    assert(cfgs.head.name == "agg1" && cfgs.head.keepMetricNames &&
      cfgs.head.matchSelectors == Seq("""{__name__="m"}""") &&
      cfgs.head.dropInputLabels == Seq("junk") &&
      cfgs.head.outputRelabel.length == 1)
    assert(cfgs(1).without == Seq("host") &&
      cfgs(1).dedupIntervalMs.contains(500L) && cfgs(1).outputs == Seq("max"))

    val mixed = samples(
      ("m", Map("host" -> "a", "dc" -> "e", "junk" -> "x"), 500L, 1.0),
      ("m", Map("host" -> "b", "dc" -> "e", "junk" -> "y"), 800L, 5.0),
      ("n", Map("host" -> "a"), 700L, 2.0),
      ("other", Map.empty[String, String], 600L, 9.0)) // matches neither
    val out = StreamAggr.applyAll(mixed, cfgs).collect()
      .map(r => (r.getString(0),
        Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty),
        r.getLong(2), r.getDouble(3))).toSet
    // cfg1: match m only, keep_metric_names keeps "m", by dc, env added
    assert(out.contains(("m", Map("dc" -> "e", "env" -> "prod"), 1000L, 6.0)))
    // cfg2: match n, suffixed name, host dropped by without
    assert(out.contains(("n:1s_without_host_max", Map.empty[String, String], 1000L, 2.0)))
    // "other" matched neither config
    assert(!out.exists(_._1.contains("other")))
    // keep_metric_names with several outputs is rejected at construction
    intercept[IllegalArgumentException] {
      StreamAggr.Config(1000L, outputs = Seq("max", "min"), keepMetricNames = true)
    }
  }

  test("batch total accumulates reset-aware increases across windows") {
    val counter = samples(
      ("c", Map("i" -> "x"), 100L, 10.0),
      ("c", Map("i" -> "x"), 800L, 25.0), // +15
      ("c", Map("i" -> "x"), 1500L, 5.0), // reset → +5
      ("c", Map("i" -> "x"), 1900L, 11.0), // +6
      ("c", Map("i" -> "x"), 2500L, 20.0)) // +9
    // total keeps a new series' first sample value (total.go:50)…
    val out = StreamAggr.totalBatch(counter, StreamAggr.Config(1000L))
      .orderBy("t").collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1000L, 25.0), (2000L, 36.0), (3000L, 45.0)))
    // …total_prometheus ignores it (total.go:118 getSuffix)
    val outP = StreamAggr.totalBatch(counter, StreamAggr.Config(1000L),
      keepFirstSample = false)
      .orderBy("t").collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(outP.toSeq == Seq(("c:1s_total_prometheus", 1000L, 15.0),
      ("c:1s_total_prometheus", 2000L, 26.0), ("c:1s_total_prometheus", 3000L, 35.0)))
  }

  test("streaming aggregation over event-time windows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val stream = mem.toDF().toDF("name", "ts", "value")
      .withColumn("tags", map(lit("host"), lit("h")))
      .withColumn("eventTime", timestamp_millis(col("ts")))
    val out = StreamAggr.aggregate(stream,
      StreamAggr.Config(1000L, by = Seq("host"), outputs = Seq("sum_samples", "max")))
    val query = out.writeStream.format("memory").queryName("sa_out")
      .outputMode("update").start()
    try {
      mem.addData(("m", 100L, 1.0), ("m", 600L, 2.0), ("m", 1200L, 10.0))
      query.processAllAvailable()
      val rows = spark.table("sa_out").collect()
        .map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSet
      assert(rows.contains(("m:1s_by_host_sum_samples", 1000L, 3.0)))
      assert(rows.contains(("m:1s_by_host_max", 2000L, 10.0)))
    } finally query.stop()
  }

  test("streaming config pipeline: match + relabel + quantile label on a live stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val stream = mem.toDF().toDF("name", "ts", "value")
      .withColumn("tags", map(lit("host"), lit("h"), lit("junk"), lit("x")))
      .withColumn("eventTime", timestamp_millis(col("ts")))
    val cfg = StreamAggr.parseConfigs(
      """- match: m
        |  interval: 1s
        |  outputs: ['quantiles(0.5)']
        |  by: [host]
        |  drop_input_labels: [junk]
        |  output_relabel_configs:
        |  - target_label: env
        |    replacement: prod
        |""".stripMargin).head
    val out = StreamAggr.aggregateConfigured(stream, cfg)
    val query = out.writeStream.format("memory").queryName("sac_out")
      .outputMode("update").start()
    try {
      mem.addData(("m", 100L, 1.0), ("m", 600L, 3.0), ("other", 700L, 9.0))
      query.processAllAvailable()
      val rows = spark.table("sac_out").collect()
        .map(r => (r.getString(0),
          Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty),
          r.getLong(2), r.getDouble(3))).toSet
      // valyala/histogram index rule: median of {1, 3} is a[⌊0.5·1+0.5⌋]=3
      assert(rows.contains(("m:1s_by_host_quantiles",
        Map("host" -> "h", "quantile" -> "0.5", "env" -> "prod"), 1000L, 3.0)))
      assert(!rows.exists(_._1.contains("other")))
    } finally query.stop()
  }

  test("ingest end-to-end: prometheus text stream → parse → window aggregate") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[String]
    val parsed = graft.sources.LineFormats.prometheusText(mem.toDF().toDF("line"), 0L)
      .withColumn("eventTime", timestamp_millis(col("ts")))
    val out = StreamAggr.aggregate(parsed,
      StreamAggr.Config(1000L, by = Seq("job"), outputs = Seq("sum_samples")))
    val query = out.writeStream.format("memory").queryName("ingest_out")
      .outputMode("update").start()
    try {
      mem.addData(
        // fractional-second OpenMetrics timestamps (the parser scales
        // sub-2^31 timestamps from seconds to ms)
        """http_total{job="api"} 5 0.1""",
        """http_total{job="api"} 7 0.6""",
        """http_total{job="web"} 11 0.7""",
        "# comment ignored",
        "garbage line")
      query.processAllAvailable()
      val rows = spark.table("ingest_out").collect().map(r =>
        (r.getString(0), r.getMap[String, String](1)("job"), r.getDouble(3))).toSet
      assert(rows == Set(
        ("http_total:1s_by_job_sum_samples", "api", 12.0),
        ("http_total:1s_by_job_sum_samples", "web", 11.0)))
    } finally query.stop()
  }

  test("streaming dedup stage keeps one sample per series per interval") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val stream = mem.toDF().toDF("name", "ts", "value")
      .withColumn("tags", map(lit("host"), lit("h")))
      .withColumn("eventTime", timestamp_millis(col("ts")))
    val out = StreamAggr.aggregate(stream,
      StreamAggr.Config(1000L, by = Seq("host"),
        outputs = Seq("count_samples"), dedupIntervalMs = Some(500L)))
    val query = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("update").start()
    try {
      // three samples in one 500ms dedup bucket + one in the next
      mem.addData(("m", 100L, 1.0), ("m", 200L, 2.0), ("m", 300L, 3.0), ("m", 700L, 4.0))
      query.processAllAvailable()
      val counts = spark.table("dedup_out").collect()
        .map(r => r.getLong(2) -> r.getDouble(3)).toMap
      assert(counts(1000L) == 2.0) // deduped from 4 samples to 2
    } finally query.stop()
  }

  test("stateful rate: per-trigger increase over the prev-trigger gap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[StreamAggr.SeriesSample]
    val out = StreamAggr.statefulRate(mem.toDS())
    val query = out.writeStream.format("memory").queryName("rate_out")
      .outputMode("update").start()
    try {
      mem.addData(StreamAggr.SeriesSample("c", 1000L, 10.0),
        StreamAggr.SeriesSample("c", 2000L, 25.0)) // +15 over 1s
      query.processAllAvailable()
      mem.addData(StreamAggr.SeriesSample("c", 3000L, 5.0)) // reset: +5 over 1s
      query.processAllAvailable()
      val rates = spark.table("rate_out").collect().map(_.getDouble(1)).toSet
      assert(rates == Set(15.0, 5.0))
    } finally query.stop()
  }

  test("stateful total: staleness gap restarts the series (event-time)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[StreamAggr.SeriesSample]
    val out = StreamAggr.statefulTotal(mem.toDS(), stalenessMs = 1000L,
      keepFirstSample = false) // prometheus flavor: pin the zero-start rule
    val query = out.writeStream.format("memory").queryName("total_stale_out")
      .outputMode("update").start()
    try {
      mem.addData(StreamAggr.SeriesSample("c", 1000L, 10.0),
        StreamAggr.SeriesSample("c", 1500L, 20.0)) // +10
      query.processAllAvailable()
      // 3.5s silence > 1s staleness: the 100 restarts the series (no +80),
      // then +5 accumulates on top of the previous total
      mem.addData(StreamAggr.SeriesSample("c", 5000L, 100.0),
        StreamAggr.SeriesSample("c", 5200L, 105.0))
      query.processAllAvailable()
      val totals = spark.table("total_stale_out").collect().map(_.getDouble(1))
      assert(totals.contains(10.0))
      assert(totals.contains(15.0))
      assert(!totals.contains(95.0)) // the stale gap must not count
    } finally query.stop()
  }

  test("floorBucketIdx domain matches the oracle lutx join: out-of-table null") {
    val s = spark
    import s.implicits._
    // guesses must have BOTH (g, g+1) in the correction table (-180..340),
    // i.e. g in [-180, 339] — exactly the oracle's inner join on lutx
    val df = Seq(1e-11, 1e-10, 1.0, 1e18, 1e19)
      .toDF("value")
      .select(col("value"),
        graft.operators.HistogramQ.floorBucketIdx(col("value")).as("k"))
      .collect().map(r => r.getDouble(0) -> Option(r.get(1))).toMap
    assert(df(1e-11).isEmpty)       // g = -198 < -180 → dropped, as the oracle drops it
    assert(df(1e-10).contains(-180L))
    assert(df(1.0).contains(0L))
    assert(df(1e18).contains(324L))
    assert(df(1e19).isEmpty)        // g = 342 > 339 → dropped
  }

  test("stateful total carries counter state across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[StreamAggr.SeriesSample]
    val out = StreamAggr.statefulTotal(mem.toDS(), keepFirstSample = false)
    val query = out.writeStream.format("memory").queryName("total_out")
      .outputMode("update").start()
    try {
      mem.addData(StreamAggr.SeriesSample("c", 100L, 10.0),
        StreamAggr.SeriesSample("c", 200L, 25.0)) // +15
      query.processAllAvailable()
      mem.addData(StreamAggr.SeriesSample("c", 300L, 5.0), // reset → +5
        StreamAggr.SeriesSample("c", 400L, 12.0)) // +7
      query.processAllAvailable()
      val totals = spark.table("total_out").collect()
        .map(r => r.getDouble(1))
      assert(totals.contains(15.0)) // after batch 1
      assert(totals.contains(27.0)) // after batch 2: state carried
    } finally query.stop()
  }
}
