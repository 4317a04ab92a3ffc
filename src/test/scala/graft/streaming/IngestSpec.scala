package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** End-to-end write path: landing-zone text files → parse → relabel →
  * date-partitioned parquet, with the file sink's exactly-once manifest
  * proven across a query restart.
  */
class IngestSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"ingest_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def drop(dir: String, name: String, body: String): Unit =
    Files.write(Paths.get(dir, name), body.getBytes(StandardCharsets.UTF_8))

  test("landing zone → relabel → date-partitioned store, exactly-once across restart") {
    val landing = tmp("landing")
    val store = tmp("store")
    val ckpt = tmp("ckpt")
    // relabel: drop the debug series, rename job → service
    val yaml =
      """- action: drop
        |  source_labels: [job]
        |  regex: debug
        |- action: labelmap
        |  regex: "job"
        |  replacement: "service"
        |- action: labeldrop
        |  regex: "job"
        |""".stripMargin
    // two days of samples → two date partitions
    drop(landing, "a.txt",
      """m{job="api"} 1 1704067200000
        |m{job="debug"} 99 1704067200000
        |m{job="api"} 2 1704153600000
        |""".stripMargin)
    Ingest.promTextToStore(spark, landing, store, ckpt, 0L, Some(yaml))
      .awaitTermination()
    val first = Ingest.readStore(spark, store)
    assert(first.count() == 2) // debug row relabel-dropped
    assert(first.filter(col("tags").getItem("service") === "api").count() == 2)
    assert(first.filter(col("tags").getItem("job").isNotNull).count() == 0)
    // date partitioning on disk (the retention/pruning unit)
    val parts = new java.io.File(store).listFiles().map(_.getName).filter(_.startsWith("date="))
    assert(parts.toSet == Set("date=2024-01-01", "date=2024-01-02"), parts.mkString(","))

    // restart with the SAME checkpoint: the already-committed file must
    // not be re-ingested; only the new file lands
    drop(landing, "b.txt", """m{job="api"} 3 1704240000000""" + "\n")
    Ingest.promTextToStore(spark, landing, store, ckpt, 0L, Some(yaml))
      .awaitTermination()
    val second = Ingest.readStore(spark, store)
    assert(second.count() == 3, s"exactly-once violated: ${second.count()} rows")
    assert(second.agg(sum("value")).head().getDouble(0) == 6.0)

    // the streamed store is query-ready through the engine
    val grid = graft.core.GridSpec(1704067200000L, 1704240000000L, 86400000L)
    val res = graft.Engine.query(second, "m", grid, 90000000L)
      .filter(!isnan(col("value")))
    assert(res.count() == 3)
  }

  test("influx-line landing zone: same exactly-once pipeline, ns timestamps") {
    val landing = tmp("ilanding")
    val store = tmp("istore")
    val ckpt = tmp("ickpt")
    drop(landing, "a.lp",
      """m,job=api value=1 1704067200000000000
        |m,job=api value=2,extra=7 1704153600000000000
        |# a comment line must be skipped
        |""".stripMargin)
    Ingest.toStore(spark, landing, store, ckpt, 0L, format = "influx")
      .awaitTermination()
    val first = Ingest.readStore(spark, store)
    // two lines, second fans out to two fields → 3 samples, ns → ms
    assert(first.count() == 3)
    assert(first.filter(col("name") === "m_value").count() == 2)
    assert(first.filter(col("name") === "m_extra").count() == 1)
    assert(first.agg(max("ts")).head().getLong(0) == 1704153600000L)

    // restart with the same checkpoint: committed file not re-ingested
    drop(landing, "b.lp", "m,job=api value=3 1704240000000000000\n")
    Ingest.toStore(spark, landing, store, ckpt, 0L, format = "influx")
      .awaitTermination()
    val second = Ingest.readStore(spark, store)
    assert(second.count() == 4, s"exactly-once violated: ${second.count()} rows")
    assert(second.agg(sum("value")).head().getDouble(0) == 13.0)
  }

  test("JSON-lines (vmimport) landing zone lands multi-sample lines") {
    val landing = tmp("jlanding")
    val store = tmp("jstore")
    val ckpt = tmp("jckpt")
    drop(landing, "a.jsonl",
      """{"metric":{"__name__":"m","job":"api"},"values":[1,2],"timestamps":[1704067200000,1704153600000]}
        |{"metric":{"__name__":"n"},"values":[5],"timestamps":[1704067200000]}
        |""".stripMargin)
    Ingest.toStore(spark, landing, store, ckpt, 0L, format = "jsonl")
      .awaitTermination()
    val out = Ingest.readStore(spark, store)
    assert(out.count() == 3)
    assert(out.filter(col("name") === "m" &&
      col("tags").getItem("job") === "api").count() == 2)
    assert(out.agg(sum("value")).head().getDouble(0) == 8.0)
  }

  test("graphite and opentsdb landing zones parse through the same pipeline") {
    val landing = tmp("glanding")
    val store = tmp("gstore")
    val ckpt = tmp("gckpt")
    drop(landing, "a.graphite",
      """cpu.usage;host=h1 1.5 1704067200
        |cpu.usage;host=h2 2.5 1704067260
        |""".stripMargin)
    Ingest.toStore(spark, landing, store, ckpt, 0L, format = "graphite")
      .awaitTermination()
    val g = Ingest.readStore(spark, store)
    assert(g.count() == 2 &&
      g.filter(col("name") === "cpu.usage" &&
        col("tags")("host") === "h1").count() == 1)
    assert(g.agg(max("ts")).head().getLong(0) == 1704067260000L) // s → ms

    val landing2 = tmp("olanding")
    val store2 = tmp("ostore")
    val ckpt2 = tmp("ockpt")
    drop(landing2, "a.tsdb",
      """put sys.load 1704067200 0.7 host=h1
        |put sys.load 1704067260 0.9 host=h1
        |""".stripMargin)
    Ingest.toStore(spark, landing2, store2, ckpt2, 0L, format = "opentsdb")
      .awaitTermination()
    val o = Ingest.readStore(spark, store2)
    assert(o.count() == 2 &&
      o.filter(col("name") === "sys.load").count() == 2)
    assert(o.agg(sum("value")).head().getDouble(0) == 1.6)
  }

  test("csv landing zone (csv:<format>) drops per-file header rows") {
    val landing = tmp("clanding")
    val store = tmp("cstore")
    val ckpt = tmp("cckpt")
    val fmt = "1:time:unix_ms,2:metric:temp,3:label:host"
    drop(landing, "a.csv",
      """time,temp,host
        |1704067200000,21.5,h1
        |1704153600000,22.5,h2
        |""".stripMargin)
    Ingest.toStore(spark, landing, store, ckpt, 0L, format = s"csv:$fmt")
      .awaitTermination()
    val out = Ingest.readStore(spark, store)
    assert(out.count() == 2) // the header line dropped per row
    assert(out.filter(col("name") === "temp").count() == 2)
    assert(out.filter(col("tags")("host") === "h2").count() == 1)
    assert(out.agg(sum("value")).head().getDouble(0) == 44.0)

    // per-sample tolerance (matches the HTTP body path): one bad metric
    // cell drops only that sample, not the whole multi-metric line
    val landing2 = tmp("clanding2")
    val store2 = tmp("cstore2")
    val ckpt2 = tmp("cckpt2")
    drop(landing2, "a.csv", "1704067200000,N/A,42\n")
    Ingest.toStore(spark, landing2, store2, ckpt2, 0L,
      format = "csv:1:time:unix_ms,2:metric:a,3:metric:b").awaitTermination()
    val out2 = Ingest.readStore(spark, store2)
    assert(out2.count() == 1)
    assert(out2.head().getString(0) == "b" && out2.head().getDouble(3) == 42.0)
  }

  test("aggregate-at-ingest: stored output hash-matches the batch aggregator across a restart") {
    // landing → parse → streamaggr (1m tumbling windows) → store as ONE
    // exactly-once query (app/vminsert/common/streamaggr.go shape): the
    // stored frame must equal StreamAggr.aggregateBatch on the same
    // input for every window the watermark has closed, with window state
    // carried across the restart
    val landing = tmp("alanding")
    val store = tmp("astore")
    val ckpt = tmp("ackpt")
    val cfg = StreamAggr.Config(60000L,
      outputs = Seq("sum_samples", "count_samples", "max"),
      matchSelectors = Seq("""{__name__="m"}"""))
    def run(): Unit =
      // unordered single-dir backlog → one-batch drain (contract doc)
      Ingest.awaitBounded(
        Ingest.toStoreAggregated(spark, landing, store, ckpt, 0L, cfg,
          maxFilesPerTrigger = 1000))
    // run 1: window1 [0,60s) complete, window2 [60s,120s) half-filled —
    // watermark reaches 90s-10s=80s, so ONLY window1 flushes to the store
    drop(landing, "a.txt",
      """m{job="api"} 1 10
        |m{job="api"} 2 30
        |m{job="api"} 4 60
        |m{job="api"} 8 90
        |""".stripMargin) // OpenMetrics seconds (< 2^31 → ×1000)
    run()
    assert(Ingest.readStore(spark, store).agg(max("ts")).head().getLong(0) == 60000L)
    // run 2 (restart, same checkpoint): window2 gains a sample from the
    // NEW file and must flush exactly once, merging run-1 state; the
    // heartbeat advances the watermark past window2's end
    drop(landing, "b.txt",
      """m{job="api"} 16 100
        |m{job="api"} 0 600
        |""".stripMargin)
    run()
    val stored = Ingest.readStore(spark, store)
      .select("name", "tags", "ts", "value")
    val parsedAll = graft.sources.LineFormats.prometheusText(
      spark.read.text(landing).select(col("value").as("line")), 0L)
    val batch = StreamAggr.aggregateBatch(parsedAll, cfg)
      .withColumnRenamed("t", "ts")
      .filter(col("ts") <= 120000L) // the heartbeat's own window is still open
      .select("name", "tags", "ts", "value")
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select(col("name"), to_json(array_sort(map_entries(col("tags")))).as("tg"),
        col("ts"), col("value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(key(stored) === key(batch),
      s"stored=${key(stored)}\nbatch=${key(batch)}")
    // window2 must aggregate run-1 state (4, 8) WITH run-2's 16: max=16,
    // count=3 — proving state survived the restart and flushed once
    assert(stored.filter(col("ts") === 120000L && col("name").contains("max"))
      .head().getDouble(3) == 16.0)
  }

  test("remote-write binary landing zone: protobuf decode, exactly-once across restart") {
    import spark.implicits._
    val landing = tmp("rwlanding")
    val store = tmp("rwstore")
    val ckpt = tmp("rwckpt")
    def samplesDf(rows: Seq[(String, String, Long, Double)]) =
      rows.map { case (n, job, ts, v) => (n, Map("job" -> job), ts, v) }
        .toDF("name", "tags", "ts", "value")
    // land one WriteRequest payload (snappy protobuf POST body, the way a
    // collector would persist it)
    Ingest.writeBinaryLanding(
      graft.sources.ProtoFormats.exportRemoteWrite(samplesDf(Seq(
        ("m", "api", 1704067200000L, 1.0),
        ("m", "api", 1704153600000L, 2.0),
        ("n", "web", 1704067200000L, 5.0))).coalesce(1)),
      landing)
    Ingest.binaryToStore(spark, landing, store, ckpt, format = "remotewrite")
      .awaitTermination()
    val first = Ingest.readStore(spark, store)
    assert(first.count() == 3)
    assert(first.filter(col("name") === "m" &&
      col("tags")("job") === "api").count() == 2)
    // date partitioning carried through (the retention/pruning unit)
    val parts = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith("date="))
    assert(parts.toSet == Set("date=2024-01-01", "date=2024-01-02"))
    // restart with the same checkpoint: committed payload not re-ingested
    Ingest.writeBinaryLanding(
      graft.sources.ProtoFormats.exportRemoteWrite(samplesDf(Seq(
        ("m", "api", 1704240000000L, 4.0))).coalesce(1)),
      landing, suffix = "-r2.bin")
    Ingest.binaryToStore(spark, landing, store, ckpt, format = "remotewrite")
      .awaitTermination()
    val second = Ingest.readStore(spark, store)
    assert(second.count() == 4, s"exactly-once violated: ${second.count()} rows")
    assert(second.agg(sum("value")).head().getDouble(0) == 12.0)
  }

  test("OTLP binary landing zone parses through the same durable pipeline") {
    import spark.implicits._
    val landing = tmp("otlplanding")
    val store = tmp("otlpstore")
    val ckpt = tmp("otlpckpt")
    val df = Seq(
      ("req_total", Map("svc" -> "a"), 1704067200000L, 10.0),
      ("req_total", Map("svc" -> "b"), 1704067260000L, 20.0))
      .toDF("name", "tags", "ts", "value")
    Ingest.writeBinaryLanding(
      graft.sources.ProtoFormats.exportOtlp(df.coalesce(1)), landing)
    Ingest.binaryToStore(spark, landing, store, ckpt, format = "otlp")
      .awaitTermination()
    val out = Ingest.readStore(spark, store)
    assert(out.count() == 2)
    assert(out.filter(col("name") === "req_total" &&
      col("tags")("svc") === "b").head().getDouble(3) == 20.0)
  }

  test("aggregate-at-ingest over TIME-ORDERED files: small trigger, bounded state, exact output") {
    // the bounded-state contract's good path: a collector appending in
    // arrival order + maxFilesPerTrigger=1 drains a multi-window backlog
    // with at most a couple of open windows in state at any moment —
    // awaitBounded(maxStateRows=3) passing IS the bounded-state assertion
    val landing = tmp("ordlanding")
    val store = tmp("ordstore")
    val ckpt = tmp("ordckpt")
    val cfg = StreamAggr.Config(60000L, outputs = Seq("sum_samples"),
      matchSelectors = Seq("""{__name__="m"}"""))
    val base = System.currentTimeMillis()
    def dropAt(name: String, body: String, mtimeOffsetMs: Long): Unit = {
      drop(landing, name, body)
      assert(Paths.get(landing, name).toFile.setLastModified(base + mtimeOffsetMs))
    }
    // one window per file, ascending both in event time and mtime
    dropAt("a.txt", "m 1 10\nm 2 30\n", 0L) // window [0,60s) sum 3
    dropAt("b.txt", "m 4 70\nm 8 80\n", 10000L) // [60,120s) sum 12
    dropAt("c.txt", "m 16 130\n", 20000L) // [120,180s) sum 16
    dropAt("d.txt", "m 0 600\n", 30000L) // heartbeat closes window 3
    Ingest.awaitBounded(
      Ingest.toStoreAggregated(spark, landing, store, ckpt, 0L, cfg,
        maxFilesPerTrigger = 1),
      maxStateRows = 3)
    val out = Ingest.readStore(spark, store).filter(col("ts") <= 180000L)
    val got = out.collect().map(r => (r.getLong(2), r.getDouble(3))).toSet
    assert(got === Set((60000L, 3.0), (120000L, 12.0), (180000L, 16.0)), got)
  }

  test("pre-flight state estimate sees a one-batch overload BEFORE the drain") {
    // awaitBounded observes state at batch boundaries only — the
    // unordered one-batch drain must be rejected by the estimate, which
    // counts distinct (group, window) in the backlog up front
    val landing = tmp("estlanding")
    val cfg = StreamAggr.Config(1000L, outputs = Seq("sum_samples"),
      matchSelectors = Seq("""{__name__="m"}"""))
    drop(landing, "a.txt",
      (100 to 109).map(s => s"m 1 $s").mkString("", "\n", "\n")) // 10 windows
    drop(landing, "b.txt", "other 1 100\n") // unmatched: not state
    val est = Ingest.estimateAggregatedStateRows(spark, landing, 0L, cfg)
    assert(est == 10L, s"estimate $est != 10 open windows")
    // by-label grouping collapses the group dimension, not the windows
    val cfgBy = cfg.copy(by = Seq("job"))
    assert(Ingest.estimateAggregatedStateRows(spark, landing, 0L, cfgBy) == 10L)
  }

  test("awaitBounded rejects an over-state drain cleanly instead of OOMing") {
    // ten 1s windows all within the 10s watermark delay of the max event
    // time: none can close, so the drain terminates with 10 open windows
    // in state — the guard must stop/throw with the SCALEBENCH remedy
    val landing = tmp("guardlanding")
    val store = tmp("guardstore")
    val ckpt = tmp("guardckpt")
    val cfg = StreamAggr.Config(1000L, outputs = Seq("sum_samples"),
      matchSelectors = Seq("""{__name__="m"}"""))
    drop(landing, "a.txt",
      (100 to 109).map(s => s"m 1 $s").mkString("", "\n", "\n"))
    val e = intercept[IllegalStateException](
      Ingest.awaitBounded(
        Ingest.toStoreAggregated(spark, landing, store, ckpt, 0L, cfg,
          maxFilesPerTrigger = 1000),
        maxStateRows = 2))
    assert(e.getMessage.contains("maxStateRows=2"))
    assert(e.getMessage.contains("maxFilesPerTrigger"))
  }
}
