package graft

import graft.core.GridSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** O7-lite instant-rollup delta (eval.go:1176-1535): a repeated instant
  * `fn(m[big])` query is served as cached ± two offset-sized delta windows.
  *
  * The bounded-scan proof: the second query runs against a frame whose
  * samples OUTSIDE the two delta windows are corrupted (×1000). Local
  * relations of equal schema share a canonical plan key, so the cache entry
  * (built from clean data) is reused; if the engine re-scanned the full
  * window it would see the corruption. Getting the clean-data answer back
  * proves only the delta ranges were read.
  */
class InstantRollupSpec extends SparkSpec {

  private val step = 60000L
  private val hour = 3600000L
  private val t0 = 1000L * hour // aligned on the minute grid
  private val t1 = t0 + 5 * step

  private def frame(values: Long => Double, fromMs: Long, toMs: Long): DataFrame = {
    val rows = new java.util.ArrayList[Row]()
    var ts = fromMs
    while (ts <= toMs) { rows.add(Row("m", Map.empty[String, String], ts, values(ts))); ts += step }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("name", StringType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("ts", LongType),
      StructField("value", DoubleType))))
  }

  private def one(df: DataFrame): Double = {
    val rows = df.collect()
    assert(rows.length == 1, s"expected 1 row, got ${rows.length}")
    rows.head.getDouble(3)
  }

  test("additive instant rollup reads only the delta windows on refresh") {
    Engine.clearCache()
    val clean = frame(_ => 1.0, t0 - 4 * hour, t1)
    // corrupt everything in the cached window's middle; keep the tail
    // (t0, t1] and the head (t1-3h-5m, t1-3h] ranges clean
    val corruptLo = t0 - 2 * hour
    val corruptHi = t0 - 1 * hour
    val corrupted = frame(ts => if (ts > corruptLo && ts <= corruptHi) 1000.0 else 1.0,
      t0 - 4 * hour, t1)

    val v0 = one(Engine.queryInstantCached(clean, "sum_over_time(m[3h])", GridSpec(t0, t0, step)))
    assert(v0 === 180.0) // (t0-3h, t0] holds 180 one-minute samples
    assert(Engine.instantCacheStats.misses === 1)

    // full evaluation over the corrupted frame would see the ×1000 middle
    // (60 corrupted samples: 180 - 60 + 60×1000 = 60120)
    val vFull = one(Engine.query(corrupted, "sum_over_time(m[3h])", GridSpec(t1, t1, step)))
    assert(vFull > 10000.0)

    val v1 = one(Engine.queryInstantCached(corrupted, "sum_over_time(m[3h])", GridSpec(t1, t1, step)))
    assert(v1 === 180.0, "delta path must not re-read the corrupted middle")
    assert(Engine.instantCacheStats.deltaHits === 1)
  }

  test("repeating the same instant timestamp is an exact cache hit") {
    Engine.clearCache()
    val clean = frame(_ => 2.0, t0 - 4 * hour, t0)
    val g = GridSpec(t0, t0, step)
    val a = one(Engine.queryInstantCached(clean, "count_over_time(m[3h])", g))
    val b = one(Engine.queryInstantCached(clean, "count_over_time(m[3h])", g))
    assert(a === b)
    assert(Engine.instantCacheStats.exactHits === 1)
    assert(Engine.instantCacheStats.misses === 1)
  }

  test("max_over_time merges cached and tail maxima when the head cannot win") {
    Engine.clearCache()
    // strictly increasing values: the head extremum is always dominated
    val clean = frame(ts => (ts - t0 + 4 * hour).toDouble / step, t0 - 4 * hour, t1)
    val v0 = one(Engine.queryInstantCached(clean, "max_over_time(m[3h])", GridSpec(t0, t0, step)))
    val v1 = one(Engine.queryInstantCached(clean, "max_over_time(m[3h])", GridSpec(t1, t1, step)))
    assert(v1 > v0)
    assert(v1 === one(Engine.query(clean, "max_over_time(m[3h])", GridSpec(t1, t1, step))))
    assert(Engine.instantCacheStats.deltaHits === 1)
    assert(Engine.instantCacheStats.aborts === 0)
  }

  test("max_over_time falls back to full evaluation when the maximum leaves the window") {
    Engine.clearCache()
    // one spike right after the cached window's start: it is the cached max
    // at t0, but by t1 it has fallen into the head delta window
    val spikeTs = t0 - 3 * hour + 2 * step
    val clean = frame(ts => if (ts == spikeTs) 500.0 else 1.0, t0 - 4 * hour, t1)
    val v0 = one(Engine.queryInstantCached(clean, "max_over_time(m[3h])", GridSpec(t0, t0, step)))
    assert(v0 === 500.0)
    val v1 = one(Engine.queryInstantCached(clean, "max_over_time(m[3h])", GridSpec(t1, t1, step)))
    assert(v1 === 1.0, "spike left the window; the abort path must re-evaluate")
    assert(Engine.instantCacheStats.aborts === 1)
  }

  test("avg_over_time refresh is served from delta-cached sum and count") {
    Engine.clearCache()
    val clean = frame(_ => 3.0, t0 - 4 * hour, t1)
    val v0 = one(Engine.queryInstantCached(clean, "avg_over_time(m[3h])", GridSpec(t0, t0, step)))
    assert(v0 === 3.0)
    assert(Engine.instantCacheStats.misses === 2) // sum + count entries
    val v1 = one(Engine.queryInstantCached(clean, "avg_over_time(m[3h])", GridSpec(t1, t1, step)))
    assert(v1 === 3.0)
    assert(Engine.instantCacheStats.deltaHits === 2)
  }

  test("small windows and non-instant grids bypass the instant cache") {
    Engine.clearCache()
    val clean = frame(_ => 1.0, t0 - 2 * hour, t0)
    one(Engine.queryInstantCached(clean, "sum_over_time(m[30m])", GridSpec(t0, t0, step)))
    assert(Engine.instantCacheStats === Engine.InstantStats(0, 0, 0, 0))
  }

  // two-series frame for the aggregated dashboard shape
  private def taggedFrame(values: (String, Long) => Double,
      fromMs: Long, toMs: Long): DataFrame = {
    val rows = new java.util.ArrayList[Row]()
    var ts = fromMs
    while (ts <= toMs) {
      Seq("a", "b").foreach(p => rows.add(Row("m", Map("pod" -> p), ts, values(p, ts))))
      ts += step
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("name", StringType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("ts", LongType),
      StructField("value", DoubleType))))
  }

  test("sum(fn(m[w])) by (labels) rides the per-series delta cache") {
    Engine.clearCache()
    val clean = taggedFrame((_, _) => 1.0, t0 - 4 * hour, t1)
    val corrupted = taggedFrame(
      (_, ts) => if (ts > t0 - 2 * hour && ts <= t0 - hour) 1000.0 else 1.0,
      t0 - 4 * hour, t1)
    val q = "sum(sum_over_time(m[3h])) by (pod)"

    val r0 = Engine.queryInstantCached(clean, q, GridSpec(t0, t0, step)).collect()
    assert(r0.length === 2 && r0.forall(_.getDouble(3) === 180.0))
    assert(Engine.instantCacheStats.misses === 1)

    // the refresh must (a) take the delta path — clean answer despite the
    // corrupted middle — and (b) match Eval's own aggregation semantics
    // exactly (name null, tags reduced to the by-list)
    val r1 = Engine.queryInstantCached(corrupted, q, GridSpec(t1, t1, step))
    val full = Engine.query(clean, q, GridSpec(t1, t1, step))
    assert(r1.collect().toSet === full.collect().toSet)
    assert(Engine.instantCacheStats.deltaHits === 1)

    // a different aggregation of the SAME inner shares the cache entry
    val r2 = Engine.queryInstantCached(corrupted, "max(sum_over_time(m[3h]))",
      GridSpec(t1, t1, step)).collect()
    assert(r2.length === 1 && r2.head.getDouble(3) === 180.0)
    assert(Engine.instantCacheStats.deltaHits === 2)
    assert(Engine.instantCacheStats.misses === 1)

    // the whole grouped family is exact over the per-series merged frame
    // — avg and count against Eval's own full evaluation on clean data
    val qAvg = "avg(sum_over_time(m[3h])) by (pod)"
    assert(Engine.queryInstantCached(corrupted, qAvg, GridSpec(t1, t1, step))
      .collect().toSet ===
      Engine.query(clean, qAvg, GridSpec(t1, t1, step)).collect().toSet)
    val rCnt = Engine.queryInstantCached(corrupted, "count(sum_over_time(m[3h]))",
      GridSpec(t1, t1, step)).collect()
    assert(rCnt.length === 1 && rCnt.head.getDouble(3) === 2.0) // two series
    assert(Engine.instantCacheStats.misses === 1, "all aggregations share one entry")
  }

  test("a fully-aged-out series stays at 0 in the delta frame (reference parity)") {
    Engine.clearCache()
    // pod b's samples live ONLY in the first 2 minutes of the t0 window:
    // by t1 they have all aged out. The additive delta keeps b in the
    // per-series frame with cached − head = 0 — exactly the reference's
    // getSumInstantValues (eval.go:1653-1696 keeps the union of
    // cached+tail series and never drops a zeroed one) — so non-sum outer
    // aggregates (count/min/avg) see the dead series until tooBigOffset
    // forces a cold re-eval. This pins the DOCUMENTED parity behavior:
    // the delta count is 2, a cold recompute would say 1.
    val rows = new java.util.ArrayList[Row]()
    var ts = t0 - 3 * hour + step
    while (ts <= t1) {
      rows.add(Row("m", Map("pod" -> "a"), ts, 1.0))
      if (ts <= t0 - 3 * hour + 2 * step) rows.add(Row("m", Map("pod" -> "b"), ts, 1.0))
      ts += step
    }
    val df = spark.createDataFrame(rows, StructType(Seq(
      StructField("name", StringType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("ts", LongType),
      StructField("value", DoubleType))))
    val q = "count(sum_over_time(m[3h]))"
    val r0 = Engine.queryInstantCached(df, q, GridSpec(t0, t0, step)).collect()
    assert(r0.length === 1 && r0.head.getDouble(3) === 2.0) // both alive at t0
    assert(Engine.instantCacheStats.misses === 1)
    // refresh at t1: b aged out; a cold recompute counts 1
    val cold = Engine.query(df, q, GridSpec(t1, t1, step)).collect()
    assert(cold.head.getDouble(3) === 1.0)
    // the delta path keeps b at 0 → count 2 (parity with evalInstantRollup)
    val delta = Engine.queryInstantCached(df, q, GridSpec(t1, t1, step)).collect()
    assert(Engine.instantCacheStats.deltaHits === 1, "must take the delta path")
    assert(delta.head.getDouble(3) === 2.0,
      "additive delta keeps the zeroed dead series — documented reference parity")
    // sum is unaffected by the phantom (0 contributes nothing)
    val sumDelta = Engine.queryInstantCached(df, "sum(sum_over_time(m[3h]))",
      GridSpec(t1, t1, step)).collect()
    assert(sumDelta.head.getDouble(3) ===
      Engine.query(df, "sum(sum_over_time(m[3h]))", GridSpec(t1, t1, step))
        .collect().head.getDouble(3))
  }

  test("cacheTag invalidates instant entries for mutable same-plan stores") {
    Engine.clearCache()
    val g = GridSpec(t0, t0, step)
    // same schema → same canonicalized plan text for BOTH local relations
    val v1 = frame(_ => 1.0, t0 - 3 * hour + step, t0)
    val v2 = frame(_ => 2.0, t0 - 3 * hour + step, t0)
    val a = one(Engine.queryInstantCached(v1, "sum_over_time(m[3h])", g, cacheTag = "v1"))
    // without the tag this would be an exact hit serving v1's rows
    val b = one(Engine.queryInstantCached(v2, "sum_over_time(m[3h])", g, cacheTag = "v2"))
    assert(a === 180.0 && b === 360.0)
    assert(Engine.instantCacheStats.misses === 2)
    assert(Engine.instantCacheStats.exactHits === 0)
  }
}
