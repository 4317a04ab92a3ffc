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
  *     → date-partitioned Parquet store (the AddRows + LSM equivalent)
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
  * parallel; the only wide edge is the sink's file-per-partition write.
  * `maxFilesPerTrigger` bounds a micro-batch; AvailableNow drains a
  * backlog in bounded batches and terminates.
  */
object Ingest {

  /** Start (or drain, with `Trigger.AvailableNow`) the prometheus-text
    * landing-zone ingestion into a date-partitioned parquet store.
    *
    * @param landingDir   directory collectors drop text files into
    * @param storeDir     SampleStore-compatible parquet root
    * @param checkpointDir streaming checkpoint (file-sink manifest)
    * @param relabelYaml  optional relabel_config YAML applied per row
    * @param defaultTsMs  timestamp for lines without one (scrape time)
    * @param availableNow drain-and-stop (batch-like) vs continuous
    */
  def promTextToStore(
      spark: SparkSession,
      landingDir: String,
      storeDir: String,
      checkpointDir: String,
      relabelYaml: Option[String] = None,
      defaultTsMs: Long = 0L,
      availableNow: Boolean = true,
      maxFilesPerTrigger: Int = 1000): StreamingQuery = {
    val lines = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(landingDir)
      .select(col("value").as("line"))
    val parsed = graft.sources.LineFormats.prometheusText(lines, defaultTsMs)
    val relabeled = relabelYaml.fold(parsed) { yaml =>
      graft.sources.Relabel.apply(parsed, graft.sources.Relabel.parseConfig(yaml))
    }
    val dated = relabeled
      .withColumn("date", to_date(timestamp_millis(col("ts"))))
    val w = dated.writeStream
      .format("parquet")
      .option("path", storeDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("date")
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** read the streamed store back as the canonical samples frame */
  def readStore(spark: SparkSession, storeDir: String): DataFrame =
    graft.core.SampleStore.read(spark, storeDir)
}
