package graft.operators

import graft.SparkSpec
import graft.core.GridSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** The reference's removeCounterResets unit vectors
  * (rollup_test.go:119-170 TestRemoveCounterResets), asserted against the
  * prev pass's reset-corrected column `_cv`: plain resets, negative values,
  * partial resets (issue 2787), staleness-segmented correction
  * (issue 8072), and monotonicity under float precision error (issue 5571).
  *
  * `stalenessInterval = lookbackDelta + window` (rollup.go:380-387); the
  * helper passes window=0 so lookbackMs IS the staleness interval, exactly
  * like the Go test's third argument.
  */
class CounterResetSpec extends SparkSpec {

  private def corrected(values: Seq[Double], timestamps: Seq[Long],
      stalenessMs: Long): Seq[Double] = {
    val rows = new java.util.ArrayList[Row]()
    timestamps.zip(values).foreach { case (t, v) => rows.add(Row("m", t, v)) }
    val df: DataFrame = spark.createDataFrame(rows, StructType(Seq(
      StructField("name", StringType),
      StructField("ts", LongType),
      StructField("value", DoubleType))))
    Rollup.prevPass(df, Seq("name"), GridSpec(0L, 1000L, 100L),
        windowMs = 0L, lookbackMs = stalenessMs, autoAdjust = false)
      .select("ts", "_cv").collect()
      .sortBy(_.getLong(0)).map(_.getDouble(1)).toSeq
  }

  private val testValues = Seq[Double](123, 34, 44, 21, 54, 34, 99, 12, 44, 32, 34, 34)
  private val testTimestamps = Seq[Long](5, 15, 24, 36, 49, 60, 78, 80, 97, 115, 120, 130)

  test("counter resets accumulate the pre-reset value") {
    assert(corrected(testValues, testTimestamps, 0L) ===
      Seq[Double](123, 157, 167, 188, 221, 255, 320, 332, 364, 396, 398, 398))
  }

  test("negative counters only pin the first value") {
    assert(corrected(Seq(-100, -200, -300, -400), Seq(0L, 1L, 2L, 3L), 0L) ===
      Seq[Double](-100, -100, -100, -100))
  }

  test("partial counter reset adds only the drop (issue 2787)") {
    assert(corrected(Seq(100, 95, 120, 119, 139, 50), (0L to 5L), 0L) ===
      Seq[Double](100, 100, 125, 125, 145, 195))
  }

  test("staleness gaps reset the correction (issue 8072)") {
    assert(corrected(Seq(10, 12, 14, 4, 6, 8, 6, 8, 4, 6),
      Seq(10L, 20L, 30L, 60L, 70L, 80L, 90L, 100L, 120L, 130L), 10L) ===
      Seq[Double](10, 12, 14, 4, 6, 8, 14, 16, 4, 6))
  }

  test("staleness gap clears a previously accumulated correction") {
    assert(corrected(Seq(10, 12, 2, 4), Seq(10L, 20L, 30L, 60L), 10L) ===
      Seq[Double](10, 12, 14, 4))
  }

  test("corrected values stay monotone under float precision error (issue 5571)") {
    val vals = Seq(34.094223, 2.7518, 2.140669, 0.044878, 1.887095, 2.546569,
      2.490149, 0.045, 0.035684, 0.062454, 0.058296)
    val out = corrected(vals, (0L until vals.size.toLong), 0L)
    out.sliding(2).foreach { case Seq(a, b) => assert(b >= a, s"$b < $a in $out") }
  }
}
