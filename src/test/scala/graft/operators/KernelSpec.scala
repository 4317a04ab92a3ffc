package graft.operators

import graft.SparkSpec
import graft.core.GridSpec
import org.apache.spark.sql.DataFrame

/** Kernel semantics on synthetic series — pins the counter-reset and
  * window-edge rules from app/vmselect/promql/rollup.go (see Scaladoc on
  * each kernel) independent of the DuckDB oracle.
  */
class KernelSpec extends SparkSpec {

  // one series, one 10s-window grid point at t=10000
  private val grid = GridSpec(10000L, 10000L, 10000L)

  private def series(samples: (Long, Double)*): DataFrame = {
    import spark.implicits._
    samples.map { case (ts, v) => ("s", ts, v) }.toDF("name", "ts", "value")
  }

  private def run(kernel: Kernel, samples: (Long, Double)*): Option[Double] = {
    val rows = Rollup.rollup(series(samples: _*), Seq("name"), grid, 10000L, kernel).collect()
    assert(rows.length <= 1)
    rows.headOption.flatMap(r => Option(r.getAs[java.lang.Double]("value")).map(_.doubleValue()))
  }

  test("increase sums deltas; counter reset contributes the post-reset value") {
    // 5 → 8 (+3) → reset to 2 (+2, the raw value) → 7 (+5) = 10
    assert(run(Kernels.increase, (1000L, 5.0), (3000L, 8.0), (5000L, 2.0), (7000L, 7.0)) === Some(10.0))
  }

  test("increase with monotone counter equals last - first") {
    assert(run(Kernels.increase, (1000L, 5.0), (9000L, 25.0)) === Some(20.0))
  }

  test("rate divides the reset-corrected increase by window seconds") {
    assert(run(Kernels.rate(10000L), (1000L, 0.0), (9000L, 40.0)) === Some(4.0))
  }

  test("delta is last - first without reset correction") {
    assert(run(Kernels.delta, (1000L, 5.0), (5000L, 2.0), (9000L, 4.0)) === Some(-1.0))
  }

  test("irate uses the last two samples and handles a reset") {
    // last two: 8 @7000 → 2 @9000: reset, dv = 2, dt = 2s → 1.0
    assert(run(Kernels.irate, (1000L, 1.0), (7000L, 8.0), (9000L, 2.0)) === Some(1.0))
  }

  test("irate on a single sample is empty/null") {
    assert(run(Kernels.irate, (5000L, 3.0)).isEmpty)
  }

  test("resets counts negative adjacent deltas") {
    assert(run(Kernels.resets, (1000L, 3.0), (3000L, 1.0), (5000L, 4.0), (7000L, 2.0)) === Some(2.0))
  }

  test("changes counts value changes, not samples") {
    assert(run(Kernels.changes, (1000L, 1.0), (3000L, 1.0), (5000L, 2.0), (7000L, 2.0)) === Some(1.0))
  }

  test("integrate is the left-Riemann sum over inter-sample gaps") {
    // 2.0 for 4s + 6.0 for 4s = 8 + 24 = 32
    assert(run(Kernels.integrate, (1000L, 2.0), (5000L, 6.0), (9000L, 1.0)) === Some(32.0))
  }

  test("mode picks the most frequent value, smallest on tie") {
    assert(run(Kernels.mode, (1000L, 3.0), (3000L, 1.0), (5000L, 3.0), (7000L, 1.0)) === Some(1.0))
  }

  test("mad is the median absolute deviation") {
    // values 1,2,9 → median 2, |dev| = 1,0,7 → median 1
    assert(run(Kernels.mad, (1000L, 1.0), (3000L, 2.0), (5000L, 9.0)) === Some(1.0))
  }

  test("an empty window yields no row (NaN-at-grid-point semantics)") {
    assert(run(Kernels.increase).isEmpty)
    assert(run(Kernels.avg).isEmpty)
  }

  test("window boundary is (t-window, t]: sample at t-window excluded, at t included") {
    assert(run(Kernels.count, (0L, 1.0), (10000L, 1.0)) === Some(1.0))
  }

  test("tlast_change falls back to first sample ts for a constant series") {
    assert(run(Kernels.tlastChange, (1000L, 4.0), (5000L, 4.0)) === Some(1.0))
  }

  test("holt_winters follows the double-smoothing recursion") {
    // reference recursion (rollup.go:1030), sf=0.5 tf=0.5, values 10,20,30,
    // no pre-window sample: s0=10 consumed, b0=values[0]-s0=10;
    // v=20: s=.5·20+.5·(10+10)=20, b=.5·(20-10)+.5·10=10;
    // v=30: s=.5·30+.5·(20+10)=30 → last s = 30
    assert(run(Kernels.holtWinters(0.5, 0.5),
      (1000L, 10.0), (3000L, 20.0), (5000L, 30.0)) === Some(30.0))
    // single unseeded sample → consumed as s0 and returned (not NaN)
    assert(run(Kernels.holtWinters(0.5, 0.5), (1000L, 10.0)) === Some(10.0))
    // sf outside [0,1] → NaN
    assert(run(Kernels.holtWinters(1.5, 0.5),
      (1000L, 10.0), (3000L, 20.0)).exists(_.isNaN))
  }

  test("stale_samples counts NaN markers only") {
    assert(run(Kernels.staleSamples,
      (1000L, 1.0), (3000L, Double.NaN), (5000L, Double.NaN)) === Some(2.0))
  }
}
