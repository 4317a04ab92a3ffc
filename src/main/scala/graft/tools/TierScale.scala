package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental tier-maintenance cost rung (r13):
  * `SampleStore.downsampleNewDates` trails the flat store with a
  * downsample tier per CHANGED date — this probe prices the full build
  * vs the steady-state increment (one late-arrival date) so the
  * maintenance cadence argument is a measurement, not a claim. The
  * reference pays the analogous cost inside background merges
  * (lib/storage/partition.go:535 + -downsampling.period).
  *
  * Env: TIERSCALE_ROWS (default 30M), TIERSCALE_DAYS (default 30),
  * TIERSCALE_SERIES (default 100K), TIERSCALE_INTERVAL_MS (default 1h).
  */
object TierScale {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("TIERSCALE_ROWS", "30000000").toLong
    val days = sys.env.getOrElse("TIERSCALE_DAYS", "30").toInt
    val series = sys.env.getOrElse("TIERSCALE_SERIES", "100000").toLong
    val intervalMs = sys.env.getOrElse("TIERSCALE_INTERVAL_MS", "3600000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("tierscale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val T0 = 1704067200000L
    val D = 86400000L
    val store = "target/tierscale/store"
    val tier = "target/tierscale/tier"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("target/tierscale"))
    println(s"[tierscale] writing $rows rows / $series series / $days days …")
    // samples spread uniformly: series id cycles, ts walks the day range
    // (perDay floors, so clamp the day index — remainder ids otherwise
    // land on a day PAST the advertised range, and days > rows would
    // divide by zero under ANSI mode)
    val perDay = math.max(1L, rows / days)
    val samples = spark.range(rows).select(
      concat(lit("m"), pmod(col("id"), lit(100)).cast("string")).as("name"),
      map(lit("pod"), concat(lit("pod-"), pmod(col("id"), lit(series)).cast("string"))).as("tags"),
      (lit(T0) + least(expr(s"id div $perDay"), lit((days - 1).toLong)) * D +
        pmod(col("id") * 61357L, lit(D))).as("ts"),
      (pmod(abs(xxhash64(col("id"))), lit(10000)) / 100.0).as("value"))
    graft.core.SampleStore.write(samples, store,
      org.apache.spark.sql.SaveMode.Overwrite)

    def timed(label: String)(f: => Seq[String]): Unit = {
      val t0 = System.nanoTime()
      val changed = f
      println(f"[tierscale] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.1f s " +
        s"(${changed.length} dates)")
    }
    timed(s"full tier build ($days days)") {
      graft.core.SampleStore.downsampleNewDates(spark, store, tier, intervalMs)
    }
    timed("no-op run (nothing changed)") {
      graft.core.SampleStore.downsampleNewDates(spark, store, tier, intervalMs)
    }
    // steady state: ONE date's worth of late arrivals lands
    val late = spark.range(perDay).select(
      concat(lit("m"), pmod(col("id"), lit(100)).cast("string")).as("name"),
      map(lit("pod"), concat(lit("pod-"), pmod(col("id"), lit(series)).cast("string"))).as("tags"),
      (lit(T0) + (days / 2).toLong * D + pmod(col("id") * 48611L, lit(D))).as("ts"),
      lit(1.0).as("value"))
    graft.core.SampleStore.write(late, store)
    timed("incremental (1 changed date)") {
      graft.core.SampleStore.downsampleNewDates(spark, store, tier, intervalMs)
    }
    spark.stop()
  }
}
