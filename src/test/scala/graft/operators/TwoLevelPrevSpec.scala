package graft.operators

import graft.SparkSpec
import graft.core.GridSpec
import org.apache.spark.sql.DataFrame

/** Parity of the two-level window≫step plan for the counter family
  * (edge-only [[OverArrayPrev]] kernels) against the explode path on the
  * same data — same prevPass, same post closure, different physical plan
  * (per-bucket edge partials + range-framed merge vs ceil(window/step)×
  * bucketize). Reference semantics anchor: rollup.go:701-823 window loop.
  */
class TwoLevelPrevSpec extends SparkSpec {

  // 4h of grid at 15m step; window 2h = 8 steps → two-level route engages
  private val start = 1704067200000L
  private val step = 900000L
  private val grid = GridSpec(start, start + 16 * step, step)
  private val window = 8 * step
  private val lookback = 2 * 3600000L

  /** 3 series with irregular gaps, counter resets, ties, and a singleton */
  private def samples: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.newBuilder[(String, Long, Double)]
    for (s <- Seq("a", "b")) {
      var v = 0.0
      var ts = start - window - 600000L
      while (ts < grid.endMs) {
        v = if (rnd.nextDouble() < 0.08) rnd.nextDouble() * 3 // counter reset
            else v + rnd.nextDouble() * 10
        rows += ((s, ts, math.floor(v * 100) / 100))
        ts += 200000L + rnd.nextInt(400000) // 3.3–10 min irregular gaps
      }
    }
    rows += (("c", start + 5 * step + 1, 7.0)) // singleton series, no prev
    rows.result().toDF("name", "ts", "value")
  }

  /** run `kernel` through whatever plan rollupMulti routes to */
  private def run(kernel: Kernel, df: DataFrame): Map[(String, Long), Double] =
    Rollup.rollup(df, Seq("name"), grid, window, kernel, lookbackMs = lookback)
      .collect()
      .flatMap(r => Option(r.getAs[java.lang.Double]("value"))
        .map(v => (r.getAs[String]("name"), r.getAs[Long]("t")) -> v.doubleValue()))
      .toMap

  /** same post closure, edgeOnly stripped → mergeable check fails → explode */
  private def forceExplode(k: Kernel): Kernel = k match {
    case OverArrayPrev(post, _, zf) => OverArrayPrev(post, edgeOnly = false, zeroFillGaps = zf)
    case other => other
  }

  private def checkParity(name: String, kernel: Kernel): Unit = {
    val df = samples.cache()
    try {
      val fast = run(kernel, df)
      val slow = run(forceExplode(kernel), df)
      assert(fast.keySet === slow.keySet, s"$name: row sets differ")
      val bad = fast.collect {
        case (k, v) if math.abs(v - slow(k)) > 1e-9 => s"$k: $v vs ${slow(k)}"
      }
      assert(bad.isEmpty, s"$name mismatches: ${bad.take(5).mkString("; ")}")
      assert(fast.nonEmpty, s"$name produced no rows — vacuous parity")
    } finally df.unpersist()
  }

  test("increase: two-level == explode at window = 8×step") {
    checkParity("increase", Kernels.increasePrev(lookback))
  }
  test("delta: two-level == explode") {
    checkParity("delta", Kernels.deltaPrev(lookback))
  }
  test("rate: two-level == explode") {
    checkParity("rate", Kernels.ratePrev)
  }
  test("increase_pure: two-level == explode") {
    checkParity("increase_pure", Kernels.increasePurePrev(lookback))
  }
  test("irate: two-level == explode (last-two-samples kernel)") {
    checkParity("irate", Kernels.iratePrev)
  }
  test("ideriv: two-level == explode") {
    checkParity("ideriv", Kernels.iderivPrev)
  }
  test("deriv_fast: two-level == explode") {
    checkParity("deriv_fast", Kernels.derivFastPrev)
  }

  test("counter two-level engages: partials explode-merge, no sample explode") {
    val df = Rollup.rollup(samples, Seq("name"), grid, window,
      Kernels.increasePrev(lookback), lookbackMs = lookback)
    val p = df.queryExecution.executedPlan.toString
    // the merge explode must fan out bucket PARTIALS (an aggregate sits
    // below it), never raw samples — and no sorted window array is
    // collected. The zero-fill pass adds one more explode over GAP rows
    // (samples whose next-sample gap exceeds the window — filtered before
    // the fan-out), which legitimately has no aggregate below it.
    // level1 is localCheckpointed since the antiSkew probe (round 7), so
    // the bucket-partial frame below the explode shows as the
    // checkpointed RDD scan rather than an in-plan Aggregate
    val explodes = "Generate explode".r.findAllMatchIn(p).map(_.start).toSeq
    assert(explodes.exists(i => p.substring(i).contains("Aggregate(") ||
      p.substring(i).contains("Scan ExistingRDD")),
      s"counter two-level must explode bucket partials, not samples:\n$p")
    assert(p.contains("(_nts") || p.contains("_nts#"),
      s"the non-partial explode must be the gap-filtered fill pass:\n$p")
    assert(!p.contains("collect_list"),
      s"counter two-level must not collect per-window arrays:\n$p")
    // merge is a plain hash aggregate — no sliding range frame, which
    // would recompute O(window/step) per row
    assert(!p.contains("RangeFrame"),
      s"counter merge must not use a sliding range frame:\n$p")
  }
}
