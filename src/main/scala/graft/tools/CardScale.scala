package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Series-CARDINALITY rung (round 10): every prior probe scaled ROWS with
  * ~100K series; the reference's published envelope is about SERIES —
  * 50M+ active, 150M/day churn (docs/victoriametrics/README.md:1159-1161)
  * — and its pain point is the inverted index. Ours is per-series
  * groupBy/window cardinality: this rung generates SERIES-many distinct
  * tag sets with few samples each (the churn shape) and measures the
  * operations whose cost is a function of series count:
  *
  *   - series-count (`/api/v1/series/count`: distinct over the tag sets)
  *   - label-values listing (`/api/v1/label/.../values`)
  *   - instant keep-last (default_rollup's per-series last-sample shape)
  *   - select-time HA dedup (`Dedup.dedupNamedSamples`, grouping keys =
  *     name + canonical tags)
  *   - storage density: store bytes / row (vs the reference's sub-byte
  *     compressed samples; Parquet pays per-row tag repetition that the
  *     reference's per-series block layout does not — the bucketed
  *     layout's sorted series hash recovers most of it via RLE)
  *
  * Env: CARDSCALE_SERIES (default 10M), CARDSCALE_SAMPLES_PER (default 3).
  */
object CardScale {
  def main(args: Array[String]): Unit = {
    val series = sys.env.getOrElse("CARDSCALE_SERIES", "10000000").toLong
    val perSeries = sys.env.getOrElse("CARDSCALE_SAMPLES_PER", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("cardscale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rows = series * perSeries
    val T0 = 1704067200000L
    val store = "target/cardscale/store"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("target/cardscale"))
    println(s"[cardscale] writing $series series × $perSeries samples ($rows rows) …")
    // churn shape: metric m<0-4>, tags (pod, node) — pod unique per
    // series (the churned label), node reused (a stable one)
    // `/` on columns is DOUBLE division (the round-9 ns→ms trap) — the
    // series id must be integer `div`
    val sid = expr(s"id div $perSeries")
    val samples = spark.range(rows).select(
      concat(lit("m"), pmod(sid, lit(5)).cast("string")).as("name"),
      map(
        lit("pod"), concat(lit("pod-"), sid.cast("string")),
        lit("node"), concat(lit("n"), pmod(sid, lit(1000)).cast("string"))
      ).as("tags"),
      (lit(T0) + pmod(col("id"), lit(perSeries.toLong)) * 60000L).as("ts"),
      (pmod(abs(xxhash64(col("id"))), lit(10000)) / 100.0).as("value"))
    graft.core.SampleStore.write(samples, store,
      org.apache.spark.sql.SaveMode.Overwrite)

    def du(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      scala.util.Using.resource(java.nio.file.Files.walk(root)) {
        _.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
      }
    }
    val bytes = du(store)
    println(f"[cardscale] store size ${bytes / 1e6}%.1f MB = ${bytes.toDouble / rows}%.2f bytes/row")

    val df = graft.core.SampleStore.read(spark, store)
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[cardscale] $label%-28s $s%8.3f s (result $n)")
    }
    // warm scan
    df.agg(count(lit(1))).collect()
    timed("series count (distinct)") {
      df.selectExpr("name", "cast(array_sort(map_entries(tags)) as string) AS sk")
        .distinct().count()
    }
    timed("label values (pod)") {
      df.select(col("tags").getItem("pod")).distinct().count()
    }
    timed("instant keep-last per series") {
      df.groupBy(col("name"),
          array_sort(map_entries(col("tags"))).cast("string").as("_sk"))
        .agg(max_by(col("value"), col("ts")).as("v")).count()
    }
    timed("select-time HA dedup pass") {
      graft.pipeline.Dedup.dedupNamedSamples(df, 60000L).count()
    }
    // the architectural tradeoff vs the reference: a selective series
    // lookup is an index probe there (ms), a columnar scan here — the
    // per-query floor a 1000-executor cluster divides but never removes
    timed("single-series lookup (scan)") {
      df.filter(col("tags").getItem("pod") === s"pod-${series / 2}").count()
    }
    spark.stop()
  }
}
