package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion-throughput rung (r8 verdict task 7): the write path had
  * exactly-once proof (IngestSpec) but no rows/s number against the
  * reference's published single-node envelope (~1.5M samples/s,
  * README.md:1158 "1.5 million samples per second on a single node").
  *
  * Generates a prometheus-text landing zone of N samples (deterministic
  * xxhash64 values; 20 000 users × 5 metrics over 30 days — the
  * ScaleBench shape) under target/ingestscale/, then drains it through
  * the REAL pipeline:
  *   1. `Ingest.toStore`          — parse → date-partitioned parquet
  *   2. `Ingest.toStoreAggregated`— parse → streamaggr 1h sum/count → store
  *
  * Env knobs: INGESTSCALE_ROWS (default 1_000_000), INGESTSCALE_FILES
  * (default 32), INGESTSCALE_MAXFILES (maxFilesPerTrigger, default 1000),
  * INGESTSCALE_PASSES (default 2; min reported).
  *
  *   sbt "runMain graft.tools.IngestScale"
  *   INGESTSCALE_ROWS=10000000 sbt "runMain graft.tools.IngestScale"
  */
object IngestScale {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("INGESTSCALE_ROWS", "1000000").toLong
    val files = sys.env.getOrElse("INGESTSCALE_FILES", "32").toInt
    val maxFiles = sys.env.getOrElse("INGESTSCALE_MAXFILES", "1000").toInt
    val passes = sys.env.getOrElse("INGESTSCALE_PASSES", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // INGESTSCALE_ORDERED=1: range-partition the landing files by
    // timestamp (file k covers a contiguous time slice, the shape a real
    // collector zone has) — required for the aggregate-at-ingest rung,
    // where bounded micro-batches + a progressing watermark keep window
    // state bounded; an UNORDERED backlog drained in one batch holds
    // every window's state at once (measured OOM at 30M rows / 8g heap)
    val ordered = sys.env.get("INGESTSCALE_ORDERED").contains("1")
    val root = "target/ingestscale"
    val landing = s"$root/landing"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    // 30 days of 1s-resolution scrape lines: metric m<0-4>, user 0-19999
    val t0ms = 1704067200000L
    val gen = spark.range(rows)
      .withColumn("ts", lit(t0ms) + pmod(xxhash64(col("id"), lit(2)), lit(30L * 86400000L)))
      .select(col("ts"), concat(
        lit("m"), pmod(col("id"), lit(5)).cast("string"),
        lit("{user_id=\""), pmod(xxhash64(col("id")), lit(20000)).cast("string"),
        lit("\"} "),
        (pmod(xxhash64(col("id"), lit(1)), lit(1000000)) / 1000.0).cast("string"),
        lit(" "), col("ts").cast("string")).as("line"))
    (if (ordered) gen.repartitionByRange(files, col("ts")) else gen.repartition(files))
      .select("line")
      .write.mode(SaveMode.Overwrite).text(landing)
    println(s"[ingestscale] landing zone: $rows rows in $files files ordered=$ordered")

    def timed(label: String)(run: String => Unit): Unit = {
      var best = Double.MaxValue
      for (p <- 1 to passes) {
        val dir = s"$root/${label}_$p"
        val t0 = System.nanoTime()
        run(dir)
        val sec = (System.nanoTime() - t0) / 1e9
        best = math.min(best, sec)
        println(f"[ingestscale] $label pass=$p wall=$sec%.1fs rate=${rows / sec}%.0f rows/s")
        System.gc()
      }
      println(f"[ingestscale] $label BEST rate=${rows / best}%.0f rows/s (wall $best%.1fs)")
    }

    // INGESTSCALE_ONLY: comma list of store|aggr|rw (unset = all)
    val only = sys.env.get("INGESTSCALE_ONLY")
    def want(n: String) = only.forall(_.split(',').contains(n))
    if (want("store")) {
      timed("store") { dir =>
        graft.streaming.Ingest.toStore(spark, landing, s"$dir/store", s"$dir/ckpt",
          0L, maxFilesPerTrigger = maxFiles).awaitTermination()
      }
      val stored = graft.streaming.Ingest.readStore(spark, s"$root/store_1/store").count()
      require(stored == rows, s"lost rows: $stored != $rows")
    }
    if (want("aggr")) {
      val cfg = graft.streaming.StreamAggr.Config(3600000L,
        outputs = Seq("sum_samples", "count_samples"))
      timed("aggr") { dir =>
        graft.streaming.Ingest.toStoreAggregated(spark, landing, s"$dir/store",
          s"$dir/ckpt", 0L, cfg, maxFilesPerTrigger = maxFiles).awaitTermination()
      }
    }
    if (want("rw")) {
      // remote-write rung: the same sample population as snappy-protobuf
      // WriteRequest payload files (one landed POST body per partition),
      // drained through the binary exactly-once pipeline — the protobuf
      // twin of the text `store` rung
      val rwLanding = s"$root/rwlanding"
      val samples = spark.range(rows).select(
        concat(lit("m"), pmod(col("id"), lit(5)).cast("string")).as("name"),
        map(lit("user_id"),
          pmod(xxhash64(col("id")), lit(20000)).cast("string")).as("tags"),
        (lit(t0ms) + pmod(xxhash64(col("id"), lit(2)), lit(30L * 86400000L))).as("ts"),
        (pmod(xxhash64(col("id"), lit(1)), lit(1000000)) / 1000.0).as("value"))
      graft.streaming.Ingest.writeBinaryLanding(
        graft.sources.ProtoFormats.exportRemoteWrite(samples.repartition(files)),
        rwLanding)
      timed("remotewrite") { dir =>
        graft.streaming.Ingest.binaryToStore(spark, rwLanding, s"$dir/store",
          s"$dir/ckpt", format = "remotewrite",
          maxFilesPerTrigger = maxFiles).awaitTermination()
      }
      val stored = graft.streaming.Ingest
        .readStore(spark, s"$root/remotewrite_1/store").count()
      require(stored == rows, s"remote-write lost rows: $stored != $rows")
    }
    spark.stop()
  }
}
