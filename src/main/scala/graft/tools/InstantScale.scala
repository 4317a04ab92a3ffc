package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** O7 instant-rollup delta rung (round 11): the reference's biggest win
  * on repeated dashboard instant queries is evalInstantRollup
  * (eval.go:1176-1535) — `fn(m[big])` re-asked with the timestamp
  * advanced a few minutes re-uses the cached answer plus two
  * offset-sized delta windows instead of re-scanning the whole window.
  * [[graft.Engine.queryInstantCached]] is the Spark form; this rung
  * measures the refresh cost both ways on a parquet store where the
  * window is a large scan:
  *
  *   - full:  Engine.query at each refresh timestamp (the no-cache cost)
  *   - delta: queryInstantCached — prime once, then each refresh
  *            evaluates two `offset`-wide windows + a broadcast-size join
  *            against the persisted cached frame
  *
  * Env: INSTANTSCALE_ROWS (default 20M), INSTANTSCALE_REFRESHES
  * (default 5).
  */
object InstantScale {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("INSTANTSCALE_ROWS", "20000000").toLong
    val refreshes = sys.env.getOrElse("INSTANTSCALE_REFRESHES", "5").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("instantscale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 30 days of samples, 10K series — the 24h instant window reads ~1/30
    // of the store; a 1-minute refresh delta reads ~1/43200 of it
    val T0 = 1704067200000L
    val spanMs = 30L * 86400000L
    val nSeries = 10000L
    val store = "target/instantscale/store"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("target/instantscale"))
    println(s"[instantscale] writing $rows rows / $nSeries series over 30d …")
    val samples = spark.range(rows).select(
      lit("m").as("name"),
      map(lit("pod"), concat(lit("pod-"), pmod(col("id"), lit(nSeries)).cast("string"))).as("tags"),
      (lit(T0) + expr(s"id div $nSeries") * lit(spanMs * nSeries / rows)).as("ts"),
      (pmod(abs(xxhash64(col("id"))), lit(10000)) / 100.0).as("value"))
    graft.core.SampleStore.write(samples, store,
      org.apache.spark.sql.SaveMode.Overwrite)
    val df = graft.core.SampleStore.read(spark, store)
    df.agg(count(lit(1))).collect() // warm footers

    val q = "sum_over_time(m[24h])"
    val tEnd = T0 + spanMs
    def instant(t: Long) = graft.core.GridSpec(t, t, 60000L)
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // full re-evaluation per refresh (the no-O7 cost), includes one
    // untimed warm pass for codegen
    graft.Engine.query(df, q, instant(tEnd - 3600000L), 60000L).count()
    val fullTimes = (1 to refreshes).map { i =>
      time(graft.Engine.query(df, q, instant(tEnd + i * 60000L), 60000L).count())
    }
    // O7: prime once (full), then each refresh is a delta update
    graft.Engine.clearCache()
    val prime = time(
      graft.Engine.queryInstantCached(df, q, instant(tEnd), 60000L).count())
    val deltaTimes = (1 to refreshes).map { i =>
      time(graft.Engine.queryInstantCached(df, q, instant(tEnd + i * 60000L), 60000L).count())
    }
    val st = graft.Engine.instantCacheStats
    println(f"[instantscale] full refresh   ${fullTimes.map(t => f"$t%.2f").mkString(" ")} s (avg ${fullTimes.sum / refreshes}%.2f)")
    println(f"[instantscale] prime (miss)   $prime%.2f s")
    println(f"[instantscale] delta refresh  ${deltaTimes.map(t => f"$t%.2f").mkString(" ")} s (avg ${deltaTimes.sum / refreshes}%.2f)")
    println(s"[instantscale] cache stats: $st")
    println(f"[instantscale] refresh speedup ${fullTimes.sum / deltaTimes.sum}%.1f×")

    // r12: the AGGREGATED dashboard shape — sum(fn(m[w])) by (label) —
    // served from the same per-series delta cache plus a series-scale
    // aggregation (the reference's evalInstantRollup under the
    // incremental-aggregation wrapper, eval.go:1176)
    val qa = "sum(sum_over_time(m[24h])) by (pod)"
    graft.Engine.query(df, qa, instant(tEnd - 3600000L), 60000L).count()
    val aggFullTimes = (1 to refreshes).map { i =>
      time(graft.Engine.query(df, qa, instant(tEnd + i * 60000L), 60000L).count())
    }
    graft.Engine.clearCache()
    val aggPrime = time(
      graft.Engine.queryInstantCached(df, qa, instant(tEnd), 60000L).count())
    val aggDeltaTimes = (1 to refreshes).map { i =>
      time(graft.Engine.queryInstantCached(df, qa, instant(tEnd + i * 60000L), 60000L).count())
    }
    println(f"[instantscale] agg full       ${aggFullTimes.map(t => f"$t%.2f").mkString(" ")} s (avg ${aggFullTimes.sum / refreshes}%.2f)")
    println(f"[instantscale] agg prime      $aggPrime%.2f s")
    println(f"[instantscale] agg delta      ${aggDeltaTimes.map(t => f"$t%.2f").mkString(" ")} s (avg ${aggDeltaTimes.sum / refreshes}%.2f)")
    println(f"[instantscale] agg speedup    ${aggFullTimes.sum / aggDeltaTimes.sum}%.1f×")
    println(s"[instantscale] cache stats: ${graft.Engine.instantCacheStats}")
    spark.stop()
  }
}
