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
      Ingest.toStoreAggregated(spark, landing, store, ckpt, 0L, cfg)
        .awaitTermination()
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
}
