package graft.operators

import graft.core.{Grid, GridSpec}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Transform functions: pointwise / per-series operations on the aligned
  * grid (app/vmselect/promql/transform.go:23-137 registration). These never
  * touch raw samples — input here is a grid DataFrame
  * (keys…, t, value).
  *
  * Pointwise math (abs/ceil/…/clamp/round, transform.go:25-130) maps 1:1 to
  * codegen'd Column functions and needs no wrapper; [[math]] documents the
  * full catalog for SQL registration. Per-series whole-grid ops (running_*,
  * range_*, transform.go:1325-1699) are window functions partitioned by the
  * series key — partition-local, no cross-series shuffle beyond the first
  * repartition by key.
  */
object Transform {

  /** The pointwise scalar catalog (transform.go:25-130) as named Column
    * functions — one-arg wrappers around Spark's codegen'd builtins.
    */
  val math: Map[String, Column => Column] = Map(
    "abs" -> abs, "ceil" -> ceil0, "floor" -> floor0, "exp" -> exp,
    "ln" -> log, "log2" -> log2, "log10" -> log10, "sqrt" -> sqrt,
    "sin" -> sin, "cos" -> cos, "tan" -> tan, "asin" -> asin,
    "acos" -> acos, "atan" -> atan, "sinh" -> sinh, "cosh" -> cosh,
    "tanh" -> tanh, "asinh" -> asinh, "acosh" -> acosh, "atanh" -> atanh,
    "deg" -> degrees, "rad" -> radians, "sgn" -> signum)

  private def ceil0(c: Column): Column = ceil(c).cast(DoubleType)
  private def floor0(c: Column): Column = floor(c).cast(DoubleType)

  def clamp(c: Column, lo: Double, hi: Double): Column = // transform.go:270
    least(greatest(c, lit(lo)), lit(hi))
  def clampMax(c: Column, hi: Double): Column = least(c, lit(hi))
  def clampMin(c: Column, lo: Double): Column = greatest(c, lit(lo))

  /** bitmap_and/or/xor(v, mask) — transform.go:33-35 (on integral part) */
  def bitmapAnd(c: Column, mask: Long): Column = c.cast("long").bitwiseAND(lit(mask)).cast(DoubleType)
  def bitmapOr(c: Column, mask: Long): Column = c.cast("long").bitwiseOR(lit(mask)).cast(DoubleType)
  def bitmapXor(c: Column, mask: Long): Column = c.cast("long").bitwiseXOR(lit(mask)).cast(DoubleType)

  /** Date/time family on grid timestamps (transform.go:43-136): t is epoch
    * ms; functions evaluate in UTC like the reference.
    */
  def dt(t: Column): Column = timestamp_millis(t)
  def dayOfMonth(t: Column): Column = dayofmonth(dt(t)).cast(DoubleType)
  def dayOfWeek(t: Column): Column = (dayofweek(dt(t)) - 1).cast(DoubleType) // 0=Sunday, like VM
  def dayOfYear(t: Column): Column = dayofyear(dt(t)).cast(DoubleType)
  def daysInMonth(t: Column): Column = dayofmonth(last_day(dt(t))).cast(DoubleType)
  def hourOf(t: Column): Column = hour(dt(t)).cast(DoubleType)
  def minuteOf(t: Column): Column = minute(dt(t)).cast(DoubleType)
  def monthOf(t: Column): Column = month(dt(t)).cast(DoubleType)
  def yearOf(t: Column): Column = year(dt(t)).cast(DoubleType)

  // ---- per-series whole-grid ops ------------------------------------------

  private def series(keys: Seq[String]) = Window.partitionBy(keys.map(col): _*)
  private def runningW(keys: Seq[String]) =
    series(keys).orderBy(col("t")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
  private def wholeW(keys: Seq[String]) =
    series(keys).orderBy(col("t")).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

  /** running_avg/min/max/sum — transform.go:1325 */
  def runningSum(df: DataFrame, keys: Seq[String]): DataFrame =
    df.withColumn("value", sum("value").over(runningW(keys)))
  def runningAvg(df: DataFrame, keys: Seq[String]): DataFrame =
    df.withColumn("value", avg("value").over(runningW(keys)))
  def runningMin(df: DataFrame, keys: Seq[String]): DataFrame =
    df.withColumn("value", min("value").over(runningW(keys)))
  def runningMax(df: DataFrame, keys: Seq[String]): DataFrame =
    df.withColumn("value", max("value").over(runningW(keys)))

  /** range_* — whole-series constants broadcast back to every point
    * (transform.go:1352-1699).
    */
  def rangeAgg(df: DataFrame, keys: Seq[String], agg: Column => Column): DataFrame =
    df.withColumn("value", agg(col("value")).over(wholeW(keys)))

  def rangeAvg(df: DataFrame, keys: Seq[String]): DataFrame = rangeAgg(df, keys, avg)
  def rangeSum(df: DataFrame, keys: Seq[String]): DataFrame = rangeAgg(df, keys, sum)
  def rangeMin(df: DataFrame, keys: Seq[String]): DataFrame = rangeAgg(df, keys, min)
  def rangeMax(df: DataFrame, keys: Seq[String]): DataFrame = rangeAgg(df, keys, max)

  def rangeFirst(df: DataFrame, keys: Seq[String]): DataFrame =
    df.withColumn("value", first("value").over(series(keys).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
  def rangeLast(df: DataFrame, keys: Seq[String]): DataFrame =
    df.withColumn("value", last("value").over(series(keys).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))

  /** range_normalize: (v-min)/(max-min) per series — transform.go:1231 */
  def rangeNormalize(df: DataFrame, keys: Seq[String]): DataFrame = {
    val w = wholeW(keys)
    val mn = min("value").over(w)
    val mx = max("value").over(w)
    df.withColumn("value", when(mx > mn, (col("value") - mn) / (mx - mn)))
  }

  /** range_zscore / zscore(q): (v - mean)/stddev per series — transform.go:1599 */
  def rangeZscore(df: DataFrame, keys: Seq[String]): DataFrame = {
    val w = wholeW(keys)
    val sd = stddev_pop(col("value")).over(w)
    df.withColumn("value", when(sd > 0, (col("value") - avg(col("value")).over(w)) / sd))
  }

  /** range_quantile(phi) — transform.go:1305 */
  def rangeQuantile(df: DataFrame, keys: Seq[String], phi: Double): DataFrame =
    df.withColumn("value", percentile(col("value"), lit(phi)).over(wholeW(keys)))

  /** range_linear_regression: per-series trend line — transform.go:1255.
    * x is centered on the series' first grid point (epoch-seconds x loses
    * precision to cancellation in the normal equations).
    */
  def rangeLinearRegression(df: DataFrame, keys: Seq[String]): DataFrame = {
    val w = wholeW(keys)
    // x materialized first: window expressions cannot nest
    val withX = df.withColumn(
      "_x", (col("t") - min("t").over(series(keys))).cast(DoubleType) / 1000.0)
    withX
      .withColumn(
        "value",
        regr_intercept(col("value"), col("_x")).over(w) +
          regr_slope(col("value"), col("_x")).over(w) * col("_x"))
      .drop("_x")
  }

  /** remove_resets — running counter-reset removal (transform.go:108,
    * shares removeCounterResets rollup.go:921): cumulative sum of
    * reset-corrected deltas.
    */
  def removeResets(df: DataFrame, keys: Seq[String]): DataFrame = {
    val ordered = series(keys).orderBy(col("t"))
    val prev = lag(col("value"), 1).over(ordered)
    val corrected = when(prev.isNull, col("value"))
      .otherwise(when(col("value") >= prev, col("value") - prev).otherwise(col("value")))
    df.withColumn("_d", corrected)
      .withColumn("value", sum(col("_d")).over(runningW(keys)))
      .drop("_d")
  }

  /** keep_last_value — fill grid gaps with the last seen value
    * (transform.go:1681). Input may have missing grid points; output is the
    * dense grid per series. Grid densification = series-dims × grid cross
    * join (small dimension table side), then last-ignoring-nulls window.
    */
  def keepLastValue(df: DataFrame, keys: Seq[String], grid: GridSpec): DataFrame = {
    val dims = df.select(keys.map(col): _*).distinct()
    val dense = Grid.gridDf(df, grid).crossJoin(dims)
    dense
      .join(df, keys :+ "t", "left")
      .withColumn(
        "value",
        last(col("value"), ignoreNulls = true)
          .over(series(keys).orderBy(col("t"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** interpolate — linear fill between known grid points (transform.go:1621).
    * prev/next non-null neighbors via ignore-null window scans.
    */
  def interpolate(df: DataFrame, keys: Seq[String], grid: GridSpec): DataFrame = {
    val dims = df.select(keys.map(col): _*).distinct()
    val dense = Grid.gridDf(df, grid).crossJoin(dims).join(df, keys :+ "t", "left")
    val back = series(keys).orderBy(col("t")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = series(keys).orderBy(col("t")).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prevS = last(when(col("value").isNotNull, struct(col("t").as("t"), col("value").as("v"))), ignoreNulls = true).over(back)
    val nextS = first(when(col("value").isNotNull, struct(col("t").as("t"), col("value").as("v"))), ignoreNulls = true).over(fwd)
    dense.withColumn(
      "value",
      when(col("value").isNotNull, col("value"))
        .when(prevS.isNotNull && nextS.isNotNull,
          prevS.getField("v") + (nextS.getField("v") - prevS.getField("v")) *
            (col("t") - prevS.getField("t")).cast(DoubleType) /
            (nextS.getField("t") - prevS.getField("t")).cast(DoubleType))
        .when(prevS.isNotNull, prevS.getField("v"))
        .when(nextS.isNotNull, nextS.getField("v")))
  }

  /** smooth_exponential(q, sf) — EWMA per series (transform.go:1709):
    * v'_i = sf·v_i + (1-sf)·v'_{i-1}. Sequential recurrence → per-series
    * fold over the collected grid (series are short relative to executors;
    * the collect is per-group, partition-local).
    */
  def smoothExponential(df: DataFrame, keys: Seq[String], sf: Double): DataFrame = {
    val arr = array_sort(collect_list(struct(col("t").as("t"), col("value").as("v"))))
    df.groupBy(keys.map(col): _*)
      .agg(arr.as("_arr"))
      .withColumn(
        "_sm",
        aggregate(
          col("_arr"),
          expr("cast(array() as array<struct<t:bigint, v:double>>)"),
          (acc, x) => {
            val prev = element_at(acc, -1)
            val sm = when(size(acc) === 0, x.getField("v"))
              .otherwise(lit(sf) * x.getField("v") + lit(1 - sf) * prev.getField("v"))
            concat(acc, array(struct(x.getField("t").as("t"), sm.as("v"))))
          }))
      .select((keys.map(col) :+ explode(col("_sm")).as("_e")): _*)
      .select((keys.map(col) :+ col("_e.t").as("t") :+ col("_e.v").as("value")): _*)
  }

  /** range_mad — per-series median absolute deviation broadcast to every
    * point (transform.go:1268).
    */
  def rangeMad(df: DataFrame, keys: Seq[String]): DataFrame = {
    val w = wholeW(keys)
    val med = percentile(col("value"), lit(0.5)).over(w)
    val withDev = df.withColumn("_dev", abs(col("value") - med))
    withDev
      .withColumn("value", percentile(col("_dev"), lit(0.5)).over(wholeW(keys)))
      .drop("_dev")
  }

  /** range_trim_zscore(z, q) — drop points with |zscore| > z per series
    * (transform.go:1551).
    */
  def rangeTrimZscore(df: DataFrame, keys: Seq[String], z: Double): DataFrame = {
    val w = wholeW(keys)
    val sd = stddev_pop(col("value")).over(w)
    val zs = when(sd > 0, abs(col("value") - avg(col("value")).over(w)) / sd).otherwise(0.0)
    df.withColumn("_z", zs).filter(col("_z") <= z).drop("_z")
  }

  /** range_trim_outliers(k, q) — drop points with |v − median| > k·MAD
    * per series (transform.go:1528).
    */
  def rangeTrimOutliers(df: DataFrame, keys: Seq[String], k: Double): DataFrame = {
    val w = wholeW(keys)
    val med = percentile(col("value"), lit(0.5)).over(w)
    val withDev = df.withColumn("_med", med).withColumn("_dev", abs(col("value") - med))
    withDev
      .withColumn("_mad", percentile(col("_dev"), lit(0.5)).over(wholeW(keys)))
      .filter(col("_dev") <= lit(k) * col("_mad"))
      .drop("_med", "_dev", "_mad")
  }

  /** range_trim_spikes(phi, q) — trim the outermost phi fraction of points
    * by |v − median| per series (transform.go:1573).
    */
  def rangeTrimSpikes(df: DataFrame, keys: Seq[String], phi: Double): DataFrame = {
    val w = wholeW(keys)
    val med = percentile(col("value"), lit(0.5)).over(w)
    val withDev = df.withColumn("_dev", abs(col("value") - med))
    withDev
      .withColumn("_cut", percentile(col("_dev"), lit(1.0 - phi)).over(wholeW(keys)))
      .filter(col("_dev") <= col("_cut"))
      .drop("_dev", "_cut")
  }

  /** timezone_offset(tz) — UTC offset (seconds) of the zone at each grid
    * timestamp (transform.go:2763).
    */
  def timezoneOffset(t: Column, tz: String): Column =
    ((unix_millis(to_utc_timestamp(timestamp_millis(t), tz)) - t) / -1000L).cast(DoubleType)

  /** limit_offset(limit, offset, q) — transform.go:2292: keep `limit`
    * series after skipping `offset`, ordered by series key.
    */
  def limitOffset(df: DataFrame, keys: Seq[String], limit: Int, offset: Int): DataFrame = {
    // cap the distinct-series set to offset+limit rows FIRST via a
    // distributed sort+limit (TakeOrderedAndProject); only the bounded
    // result — query-parameter scale, not data scale — passes through the
    // no-partition rank window
    val dims = df.select(keys.map(col): _*).distinct()
      .orderBy(keys.map(col): _*).limit(offset + limit)
      .withColumn("_rn", row_number().over(Window.orderBy(keys.map(col): _*)))
      .filter(col("_rn") > offset)
      .drop("_rn")
    df.join(broadcast(dims), keys, "left_semi")
  }
}
