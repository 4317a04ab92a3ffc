package graft.operators

import graft.{Engine, SparkSpec}
import graft.core.GridSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** The reference's own rollup edge vectors, run through the full engine:
  * app/vmselect/promql/rollup_test.go rollupConfig.Do tests over the fixed
  * 12-sample series (testValues/testTimestamps, rollup_test.go:12-15) —
  * empty windows, partial windows at range edges, auto-window (Window=0,
  * scrape-interval staleness) behavior, counter-family deltas, and the
  * lifetime/lag/scrape_interval families. Expected vectors copied verbatim;
  * a NaN expected point means "no row at that grid timestamp" in our
  * absent-row model.
  */
class RollupEdgeSpec extends SparkSpec {

  private val n = Double.NaN
  private val testValues = Seq[Double](123, 34, 44, 21, 54, 34, 99, 12, 44, 32, 34, 34)
  private val testTimestamps = Seq[Long](5, 15, 24, 36, 49, 60, 78, 80, 97, 115, 120, 130)

  private lazy val samples: DataFrame = {
    val rows = new java.util.ArrayList[Row]()
    testTimestamps.zip(testValues).foreach { case (t, v) =>
      rows.add(Row("m", Map.empty[String, String], t, v))
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("name", StringType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("ts", LongType),
      StructField("value", DoubleType)))).cache()
  }

  /** run q on the grid, compare the per-timestamp vector (NaN = absent) */
  private def checkVec(q: String, start: Long, end: Long, step: Long,
      expected: Seq[Double]): Unit = {
    val got = Engine.query(samples, q, GridSpec(start, end, step)).collect()
      .map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val ts = (start to end by step)
    assert(ts.size == expected.size, s"bad test: ${ts.size} grid points, ${expected.size} expected")
    val errs = ts.zip(expected).flatMap { case (t, ev) =>
      got.get(t) match {
        case None if ev.isNaN => None
        case None => Some(s"t=$t: expected $ev, got no row")
        case Some(gv) if ev.isNaN && gv.isNaN => None
        case Some(gv) if ev.isNaN => Some(s"t=$t: expected absent, got $gv")
        case Some(gv) =>
          if (math.abs(gv - ev) <= math.abs(ev) * 1e-12 + 1e-12) None
          else Some(s"t=$t: expected $ev, got $gv")
      }
    }
    assert(errs.isEmpty, s"$q: ${errs.mkString("; ")}")
  }

  // --- TestRollupNoWindowNoPoints / TestRollupWindowNoPoints ---

  test("no-window range entirely before the first sample is empty") {
    checkVec("first_over_time(m)", 0, 4, 1, Seq(n, n, n, n, n))
  }

  test("no-window delta past the series end holds, then goes stale") {
    // rollup_test.go:751 — delta keeps emitting (2,0,0,0) while the last
    // sample stays in the staleness window, then stops
    checkVec("delta(m)", 120, 148, 4, Seq(2, 0, 0, 0, n, n, n, n))
  }

  test("explicit window before the first sample is empty") {
    checkVec("first_over_time(m[3ms])", 0, 4, 1, Seq(n, n, n, n, n))
  }

  test("explicit window past the series end is empty") {
    checkVec("first_over_time(m[3ms])", 161, 191, 10, Seq(n, n, n, n))
  }

  // --- TestRollupNoWindowPartialPoints ---

  test("auto-window staleness at the range head (partial points)") {
    checkVec("first_over_time(m)", 0, 25, 5, Seq(n, 123, n, 34, n, 44))
  }

  test("auto-window staleness at the range tail (partial points)") {
    checkVec("first_over_time(m)", 100, 160, 20, Seq(44, 32, 34, n))
  }

  test("auto-window with a negative range start") {
    checkVec("first_over_time(m)", -50, 150, 50, Seq(n, n, 123, 34, 32))
  }

  // --- TestRollupWindowPartialPoints ---

  test("explicit 8ms window at the range head") {
    checkVec("last_over_time(m[8ms])", 0, 20, 5, Seq(n, 123, 123, 34, 34))
  }

  test("explicit 18ms window at the range tail") {
    checkVec("last_over_time(m[18ms])", 100, 160, 20, Seq(44, 34, 34, n))
  }

  test("explicit 19ms window mid-range") {
    checkVec("last_over_time(m[19ms])", 0, 150, 50, Seq(n, 54, 44, n))
  }

  // --- TestRollupFuncsLookbackDelta (all three deltas agree on this vector) ---

  test("staleness vector on a 10ms-step grid over the series tail") {
    checkVec("first_over_time(m)", 80, 140, 10, Seq(99, n, 44, n, 32, 34, n))
  }

  // --- TestRollupFuncsNoWindow ---

  test("first_over_time auto-window vector") {
    checkVec("first_over_time(m)", 0, 160, 40, Seq(n, 123, 54, 44, 34))
  }

  test("count_over_time auto-window vector") {
    checkVec("count_over_time(m)", 0, 160, 40, Seq(n, 4, 4, 3, 1))
  }

  test("min_over_time auto-window vector") {
    checkVec("min_over_time(m)", 0, 160, 40, Seq(n, 21, 12, 32, 34))
  }

  test("max_over_time auto-window vector") {
    checkVec("max_over_time(m)", 0, 160, 40, Seq(n, 123, 99, 44, 34))
  }

  test("sum_over_time auto-window vector") {
    checkVec("sum_over_time(m)", 0, 160, 40, Seq(n, 222, 199, 110, 34))
  }

  test("avg_over_time auto-window vector") {
    checkVec("avg_over_time(m)", 0, 160, 40, Seq(n, 55.5, 49.75, 36.666666666666664, 34))
  }

  test("stddev_over_time auto-window vector") {
    checkVec("stddev_over_time(m)", 0, 160, 40,
      Seq(n, 39.81519810323691, 32.080952292598795, 5.2493385826745405, 0))
  }

  test("delta auto-window vector (prev-sample rule at window edges)") {
    checkVec("delta(m)", 0, 160, 40, Seq(n, 21, -9, 22, 0))
  }

  test("delta_prometheus strict first-to-last vector") {
    checkVec("delta_prometheus(m)", 0, 160, 40, Seq(n, -102, -42, -10, n))
  }

  test("idelta last-two-samples vector") {
    checkVec("idelta(m)", 10, 130, 40, Seq(123, 33, -87, 0))
  }

  // deriv/deriv_fast/scrape_interval CAN auto-adjust their window in the
  // engine path (rollup.go:204 rollupFuncsCanAdjustWindow); the rc.Do test
  // configs leave MayAdjustWindow unset, so the vectors assume window ==
  // step — pinned here with an explicit step-sized window.

  test("deriv (least-squares) step-window vector") {
    checkVec("deriv(m[40ms])", 0, 160, 40,
      Seq(n, -2879.310344827588, 127.87627310448904, -496.5831435079728, 0))
  }

  test("deriv_fast first-to-last slope vector") {
    checkVec("deriv_fast(m[4ms])", 0, 20, 4, Seq(n, n, n, 0, -8900, 0))
  }

  test("ideriv last-two-samples slope vector") {
    checkVec("ideriv(m)", 0, 160, 40, Seq(n, -1916.6666666666665, -43500, 400, 0))
  }

  test("changes counts including the prev-sample boundary") {
    checkVec("changes(m)", 0, 160, 40, Seq(n, 4, 4, 3, 0))
  }

  test("changes_prometheus ignores the prev sample") {
    checkVec("changes_prometheus(m)", 0, 160, 40, Seq(n, 3, 3, 2, 0))
  }

  test("changes over a small explicit window") {
    checkVec("changes(m[9ms])", 0, 45, 9, Seq(n, 1, 1, 1, 1, 0))
  }

  test("resets auto-window vector") {
    checkVec("resets(m)", 0, 160, 40, Seq(n, 2, 2, 1, 0))
  }

  test("integrate auto-window vector") {
    checkVec("integrate(m)", 0, 160, 40, Seq(n, 2.148, 1.593, 1.156, 0.34))
  }

  test("distinct_over_time auto-window vector") {
    checkVec("distinct_over_time(m)", 0, 160, 40, Seq(n, 4, 4, 3, 1))
  }

  test("distinct_over_time explicit 80ms window vector") {
    checkVec("distinct_over_time(m[80ms])", 0, 160, 40, Seq(n, 4, 7, 6, 3))
  }

  test("lag auto-window vector") {
    checkVec("lag(m)", 0, 160, 40, Seq(n, 0.004, 0, 0, 0.03))
  }

  test("lifetime auto-window vector") {
    checkVec("lifetime(m)", 0, 160, 40, Seq(n, 0.031, 0.044, 0.04, 0.01))
  }

  test("lifetime explicit 200ms window vector") {
    checkVec("lifetime(m[200ms])", 0, 160, 40, Seq(n, 0.031, 0.075, 0.115, 0.125))
  }

  test("scrape_interval step-window vector") {
    checkVec("scrape_interval(m[40ms])", 0, 160, 40,
      Seq(n, 0.010333333333333333, 0.011, 0.013333333333333334, 0.01))
  }

  test("scrape_interval explicit 80ms window vector") {
    checkVec("scrape_interval(m[80ms])", 0, 160, 40,
      Seq(n, 0.010333333333333333, 0.010714285714285714, 0.012, 0.0125))
  }
}
