package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The ingestion WRITE PATH (SURVEY §3.4) as one Structured Streaming
  * pipeline — the Spark-native form of the reference's
  * HTTP POST → protoparser → relabel → storage.AddRows chain
  * (app/vminsert/common/insert_ctx.go:270 relabel,
  * lib/storage/storage.go:1670 AddRows, monthly partitions
  * lib/storage/partition.go:28):
  *
  *   landing zone (text files dropped by collectors/load balancers)
  *     → per-protocol line parser (map-side, no shuffle)
  *     → relabeling rules   (map-side, one pass)
  *     → [optional] stream aggregation at ingest (streamaggr)
  *     → date-partitioned Parquet store (the AddRows + LSM equivalent)
  *
  * The protocol dispatch mirrors app/vminsert/main.go:192-326, which
  * routes every supported line format into the same InsertCtx chain —
  * here every format funnels through the SAME LineFormats parsers the
  * HTTP routes use, so a collector can drop Influx-line or JSON-lines
  * files and get the identical exactly-once pipeline prometheus text
  * gets.
  *
  * Exactly-once: the parquet file sink commits each micro-batch through
  * its manifest log, so a crashed/restarted query (same checkpoint)
  * never duplicates or loses a landed file — the property the
  * reference gets from per-request acks + WAL-less LSM restarts.
  * Ingest-time dedup stays OPTIONAL query-time work here (the
  * reference's -streamAggr.dedupInterval is optional too); the store's
  * query paths and the compaction job (SampleStore.compact) both apply
  * the -dedup.minScrapeInterval rule.
  *
  * Scale shape: file listing + parse + relabel are embarrassingly
  * parallel; the only wide edge is the sink's file-per-partition write
  * (or the windowed aggregate's one shuffle in the streamaggr form).
  * `maxFilesPerTrigger` bounds a micro-batch; AvailableNow drains a
  * backlog in bounded batches and terminates.
  */
object Ingest {

  /** parse a landing-zone `line` frame per protocol — the
    * app/vminsert/main.go:192-326 dispatch over the shared parsers
    */
  def parseLines(lines: DataFrame, format: String, defaultTsMs: Long): DataFrame =
    format match {
      case "prometheus" => graft.sources.LineFormats.prometheusText(lines, defaultTsMs)
      case "influx" => graft.sources.LineFormats.influxLine(lines, defaultTsMs)
      case "graphite" => graft.sources.LineFormats.graphiteLine(lines, defaultTsMs)
      case "opentsdb" => graft.sources.LineFormats.openTsdbLine(lines, defaultTsMs)
      case "jsonl" | "vmimport" => graft.sources.LineFormats.jsonImport(lines)
      case csv if csv.startsWith("csv:") => // `csv:<format>` per /api/v1/import/csv
        graft.sources.LineFormats.csvImportLines(
          lines, csv.stripPrefix("csv:"), defaultTsMs)
      case other => throw new IllegalArgumentException(
        s"unsupported ingest format: $other (supported: prometheus, influx, " +
          "graphite, opentsdb, jsonl, csv:<format>)")
    }

  /** parse a landing-zone binary `payload` frame per protocol — the
    * reference's dominant WRITE protocols: Prometheus remote-write
    * (snappy protobuf, app/vminsert/promremotewrite/request_handler.go:23),
    * OTLP metrics (lib/protoparser/opentelemetry), DataDog sketches
    * (lib/protoparser/datadogsketches). Timestamps ride the payloads, so
    * no defaultTsMs is needed.
    */
  def parsePayloads(payloads: DataFrame, format: String): DataFrame =
    format match {
      case "remotewrite" | "promremotewrite" =>
        graft.sources.ProtoFormats.remoteWrite(payloads)
      case "otlp" | "opentelemetry" =>
        graft.sources.ProtoFormats.otlp(payloads)
      case "datadogsketches" =>
        graft.sources.ProtoFormats.datadogSketches(payloads)
      case other => throw new IllegalArgumentException(
        s"unsupported binary ingest format: $other (supported: remotewrite, " +
          "otlp, datadogsketches)")
    }

  /** Binary-payload landing zone → date-partitioned parquet store, the
    * exactly-once twin of [[toStore]] for protobuf write protocols: a
    * collector/load balancer lands each POST body (remote-write WriteRequest,
    * OTLP ExportMetricsServiceRequest, DataDog SketchPayload) as ONE file;
    * `binaryFile` streams whole files, the protoparser decodes map-side,
    * and the file sink's manifest makes restarts exactly-once — the
    * durable pipeline the reference's vminsert→vmstorage hop provides for
    * its highest-volume protocols.
    *
    * `maxFilesPerTrigger` defaults LOW (64), unlike the text path's 1000:
    * `binaryFile` materializes WHOLE bodies (content column), so one
    * micro-batch holds ≈ files × bodySize × decode-amplification in
    * memory at once — a 512-file batch of ~4.5 MB snappy WriteRequests
    * OOMed an 8g/32-thread JVM, while 64-file batches drained 30M rows
    * at 1.47M rows/s (IngestScale `rw` rung, SCALEBENCH r10). The sink is
    * stateless so ANY bound is correct; size it to
    * heap / (bodySize × ~6 × cores).
    */
  def binaryToStore(
      spark: SparkSession,
      landingDir: String,
      storeDir: String,
      checkpointDir: String,
      format: String = "remotewrite",
      relabelYaml: Option[String] = None,
      availableNow: Boolean = true,
      maxFilesPerTrigger: Int = 64): StreamingQuery = {
    // file streaming sources demand an explicit schema; binaryFile's is
    // fixed (path, modificationTime, length, content)
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    val payloads = spark.readStream
      .format("binaryFile")
      .schema(binarySchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(landingDir)
      .select(col("content").as("payload"))
    val parsed = parsePayloads(payloads, format)
    val relabeled = relabelYaml.fold(parsed) { yaml =>
      graft.sources.Relabel.apply(parsed, graft.sources.Relabel.parseConfig(yaml))
    }
    val dated = relabeled.withColumn("date", to_date(timestamp_millis(col("ts"))))
    val w = dated.writeStream
      .format("parquet")
      .option("path", storeDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("date")
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Hadoop Configuration is not Serializable; ship it to executors via
    * its Writable form (the same trick Spark's internal wrapper uses)
    */
  private final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** land binary payload rows as one file each (what a collector does with
    * POST bodies) — executor-side writes through the Hadoop FileSystem
    * API, so the landing dir can be any shared filesystem (file://, HDFS,
    * s3a://…), exactly the [[binaryToStore]] contract
    */
  def writeBinaryLanding(payloads: DataFrame, dir: String,
      suffix: String = ".bin"): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val conf = new SerializableHadoopConf(
      payloads.sparkSession.sessionState.newHadoopConf())
    new HPath(dir).getFileSystem(conf.value).mkdirs(new HPath(dir))
    payloads.select("payload").foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val p = new HPath(dir)
        val fs = p.getFileSystem(conf.value)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var i = 0
        it.foreach { r =>
          val out = fs.create(new HPath(p, f"payload-$pid%05d-$i%05d$suffix"), true)
          try out.write(r.getAs[Array[Byte]](0))
          finally out.close()
          i += 1
        }
    }
  }

  /** Start (or drain, with `Trigger.AvailableNow`) a landing-zone
    * ingestion into a date-partitioned parquet store.
    *
    * @param landingDir   directory collectors drop text files into
    * @param storeDir     SampleStore-compatible parquet root
    * @param checkpointDir streaming checkpoint (file-sink manifest)
    * @param defaultTsMs  timestamp for lines without one — REQUIRED, no
    *                     default: an implicit 0 lands timestamp-less
    *                     lines in the 1970-01-01 date partition,
    *                     polluting retention; the reference stamps
    *                     scrape time, so pass the ingest wall-clock at
    *                     stream start (deterministic replays pass a
    *                     fixed value)
    * @param format       prometheus | influx | graphite | opentsdb | jsonl
    * @param relabelYaml  optional relabel_config YAML applied per row
    * @param availableNow drain-and-stop (batch-like) vs continuous
    */
  def toStore(
      spark: SparkSession,
      landingDir: String,
      storeDir: String,
      checkpointDir: String,
      defaultTsMs: Long,
      format: String = "prometheus",
      relabelYaml: Option[String] = None,
      availableNow: Boolean = true,
      maxFilesPerTrigger: Int = 1000): StreamingQuery = {
    val dated = parsedStream(spark, landingDir, format, defaultTsMs,
      relabelYaml, maxFilesPerTrigger)
      .withColumn("date", to_date(timestamp_millis(col("ts"))))
    val w = dated.writeStream
      .format("parquet")
      .option("path", storeDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("date")
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Aggregate-at-ingest: landing zone → parse → relabel → streamaggr
    * windowed outputs → date-partitioned store, as ONE exactly-once
    * streaming query — the reference's flagship cardinality-reduction
    * deployment (app/vminsert/common/streamaggr.go applies the
    * aggregators BEFORE storage; vmagent per remote-write). Only the
    * aggregate OUTPUT series land in the store.
    *
    * Window flush follows the watermark: a tumbling interval is written
    * once the watermark passes its end (append mode), so the stored
    * frame carries each output row exactly once across restarts. A
    * drained backlog's trailing intervals sit in state until later data
    * (or a heartbeat sample beyond `watermarkDelay` past the interval
    * end) advances the watermark — the standard Structured Streaming
    * contract, and the streaming twin of the reference's
    * flush-on-interval tickers (streamaggr.go:344 flushLoop).
    *
    * BOUNDED-STATE CONTRACT (SCALEBENCH r9, enforced since r10):
    * `maxFilesPerTrigger` is REQUIRED here (unlike the raw [[toStore]],
    * where state is zero) because the safe value depends on the backlog's
    * time-ordering, and a silently-large default OOMs executors:
    *
    *  - TIME-ORDERED landing files (collectors appending in arrival
    *    order — the normal case): pass a SMALL value (2 measured 1.41M
    *    rows/s at 100M rows); the watermark advances between
    *    micro-batches and closed windows leave state continuously.
    *  - UNORDERED backlog: event-time disorder across micro-batches
    *    DROPS late rows once the watermark passes them, so the whole
    *    backlog must drain in ONE batch (pass ≥ the landing file count)
    *    — and then every window's state is open at once, which OOMed at
    *    30M rows / 72M windows on an 8g executor. Use [[awaitBounded]]
    *    to turn that into a clean rejection.
    */
  def toStoreAggregated(
      spark: SparkSession,
      landingDir: String,
      storeDir: String,
      checkpointDir: String,
      defaultTsMs: Long,
      cfg: StreamAggr.Config,
      maxFilesPerTrigger: Int,
      format: String = "prometheus",
      relabelYaml: Option[String] = None,
      watermarkDelay: String = "10 seconds",
      availableNow: Boolean = true): StreamingQuery = {
    val parsed = parsedStream(spark, landingDir, format, defaultTsMs,
      relabelYaml, maxFilesPerTrigger)
      .withColumn("eventTime", timestamp_millis(col("ts")))
    val aggregated = StreamAggr.aggregateConfigured(parsed, cfg, watermarkDelay)
      .withColumnRenamed("t", "ts")
      .select("name", "tags", "ts", "value")
      .withColumn("date", to_date(timestamp_millis(col("ts"))))
    val w = aggregated.writeStream
      .format("parquet")
      .option("path", storeDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("date")
      .outputMode("append")
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  private def parsedStream(
      spark: SparkSession,
      landingDir: String,
      format: String,
      defaultTsMs: Long,
      relabelYaml: Option[String],
      maxFilesPerTrigger: Int): DataFrame = {
    val lines = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(landingDir)
      .select(col("value").as("line"))
    val parsed = parseLines(lines, format, defaultTsMs)
    relabelYaml.fold(parsed) { yaml =>
      graft.sources.Relabel.apply(parsed, graft.sources.Relabel.parseConfig(yaml))
    }
  }

  /** prometheus-text convenience wrapper (the original §3.4 entry) */
  def promTextToStore(
      spark: SparkSession,
      landingDir: String,
      storeDir: String,
      checkpointDir: String,
      defaultTsMs: Long,
      relabelYaml: Option[String] = None,
      availableNow: Boolean = true,
      maxFilesPerTrigger: Int = 1000): StreamingQuery =
    toStore(spark, landingDir, storeDir, checkpointDir, defaultTsMs,
      format = "prometheus", relabelYaml = relabelYaml,
      availableNow = availableNow, maxFilesPerTrigger = maxFilesPerTrigger)

  /** Pre-flight estimate of the open-window state a ONE-batch drain of
    * the landing backlog would hold (distinct groups × windows): run it
    * BEFORE an unordered-backlog drain and reject when it exceeds what
    * the executors can hold — [[awaitBounded]] observes state only at
    * micro-batch BOUNDARIES (`lastProgress`), so a single batch that
    * materializes too much state mid-batch OOMs before any monitor can
    * fire. This is the check that actually preempts the SCALEBENCH r9
    * 30M-row failure; awaitBounded then guards the multi-batch growth
    * and the un-flushed residue.
    */
  def estimateAggregatedStateRows(
      spark: SparkSession,
      landingDir: String,
      defaultTsMs: Long,
      cfg: StreamAggr.Config,
      format: String = "prometheus"): Long =
    StreamAggr.estimateStateRows(
      parseLines(spark.read.text(landingDir).select(col("value").as("line")),
        format, defaultTsMs), cfg)

  /** Await an ingest query while ENFORCING the bounded-state contract: if
    * the streaming state (open aggregation windows) ever exceeds
    * `maxStateRows`, the query is stopped and a clean error carrying the
    * SCALEBENCH remedy is thrown — instead of the executor OOM the same
    * overload produces unguarded (measured at 30M unordered rows, r9).
    * The residual check after termination catches a drain whose FINAL
    * batch left oversized un-flushed state (data stuck awaiting a
    * watermark that will never come in this run); state that overshoots
    * WITHIN one batch is only visible at the batch boundary — for
    * unordered one-batch drains run [[estimateAggregatedStateRows]]
    * FIRST, which sees it before any memory is committed.
    */
  def awaitBounded(query: StreamingQuery, maxStateRows: Long = 50000000L): Unit = {
    def stateRows: Long = Option(query.lastProgress)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
    def check(): Unit = if (stateRows > maxStateRows) {
      query.stop()
      throw new IllegalStateException(
        s"aggregate-at-ingest state exceeded maxStateRows=$maxStateRows " +
          s"(open-window rows: $stateRows). The landing backlog is draining " +
          "in micro-batches too large for bounded state: over TIME-ORDERED " +
          "landing files pass a small maxFilesPerTrigger (2 sustains 1.41M " +
          "rows/s at 100M rows, SCALEBENCH.md); an UNORDERED backlog needs " +
          "a one-batch drain, which requires state for every window at " +
          "once — raise maxStateRows only if the cluster's executors can " +
          "actually hold it")
    }
    while (query.isActive) {
      check()
      query.awaitTermination(200)
    }
    query.awaitTermination() // surface any stream-thread exception
    check()
  }

  /** read the streamed store back as the canonical samples frame */
  def readStore(spark: SparkSession, storeDir: String): DataFrame =
    graft.core.SampleStore.read(spark, storeDir)
}
