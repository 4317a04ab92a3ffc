package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Aggregate functions: across series, per grid point
  * (app/vmselect/promql/aggr.go:20-58 registration). All take a grid
  * DataFrame (seriesCols…, t, value) and a `by` grouping (PromQL
  * by(...) / without(...) reduces to: which label columns survive —
  * aggr.go:96 removeGroupTags).
  *
  * Simple folds ride Spark's partial+final HashAggregate — the exact
  * analogue of the reference's incremental aggregation
  * (aggr_incremental.go:18-66). Rank-style ops (topk/limitk/outliers*) are
  * window functions partitioned by (group, t) — no global sort.
  */
object Aggr {

  private def gcols(by: Seq[String]) = (by :+ "t").map(col)

  /** sum/min/max/avg/count/stddev/stdvar/sum2/geomean/distinct/group/any —
    * aggr.go:185,288,306,324,404,352,371,231,423,156,169.
    */
  def agg(df: DataFrame, by: Seq[String], aggExpr: Column): DataFrame =
    df.groupBy(gcols(by): _*).agg(aggExpr.as("value"))

  def sumA(df: DataFrame, by: Seq[String]): DataFrame = agg(df, by, sum("value"))
  def minA(df: DataFrame, by: Seq[String]): DataFrame = agg(df, by, min("value"))
  def maxA(df: DataFrame, by: Seq[String]): DataFrame = agg(df, by, max("value"))
  def avgA(df: DataFrame, by: Seq[String]): DataFrame = agg(df, by, avg("value"))
  def countA(df: DataFrame, by: Seq[String]): DataFrame = agg(df, by, count("value").cast(DoubleType))
  def stddevA(df: DataFrame, by: Seq[String]): DataFrame = agg(df, by, stddev_pop(col("value")))
  def stdvarA(df: DataFrame, by: Seq[String]): DataFrame = agg(df, by, var_pop(col("value")))
  def sum2A(df: DataFrame, by: Seq[String]): DataFrame = agg(df, by, sum(col("value") * col("value")))
  def geomeanA(df: DataFrame, by: Seq[String]): DataFrame = agg(df, by, exp(avg(log(col("value")))))
  def distinctA(df: DataFrame, by: Seq[String]): DataFrame =
    agg(df, by, size(collect_set(col("value"))).cast(DoubleType))
  def groupA(df: DataFrame, by: Seq[String]): DataFrame = agg(df, by, lit(1.0))
  def medianA(df: DataFrame, by: Seq[String]): DataFrame = agg(df, by, percentile(col("value"), lit(0.5)))
  def quantileA(df: DataFrame, by: Seq[String], phi: Double): DataFrame =
    agg(df, by, percentile(col("value"), lit(phi)))

  /** mode — most frequent value per group, smallest wins ties (aggr.go:446
    * iterates ascending keeping strict improvements).
    */
  def modeA(df: DataFrame, by: Seq[String]): DataFrame = {
    val counts = df.groupBy((gcols(by) :+ col("value")): _*).agg(count(lit(1)).as("_c"))
    counts
      .withColumn("_rn",
        row_number().over(
          Window.partitionBy(gcols(by): _*).orderBy(col("_c").desc, col("value").asc)))
      .filter(col("_rn") === 1)
      .drop("_c", "_rn")
  }

  /** count_values("label", q) — one output series per distinct value
    * (aggr.go:566): the value becomes a label, the count the value.
    */
  def countValues(df: DataFrame, by: Seq[String]): DataFrame =
    df.groupBy((gcols(by) :+ col("value").as("value_label")): _*)
      .agg(count(lit(1)).cast(DoubleType).as("value"))

  /** share(q) — per-point value / group sum (aggr.go:462) */
  def share(df: DataFrame, seriesCols: Seq[String], by: Seq[String]): DataFrame =
    df.withColumn(
      "value",
      col("value") / sum("value").over(Window.partitionBy(gcols(by): _*)))

  /** zscore(q) — cross-series z-score per point (aggr.go:493) */
  def zscoreA(df: DataFrame, by: Seq[String]): DataFrame = {
    val w = Window.partitionBy(gcols(by): _*)
    val sd = stddev_pop(col("value")).over(w)
    df.withColumn("value", when(sd > 0, (col("value") - avg(col("value")).over(w)) / sd))
  }

  /** topk/bottomk(k, q) — per-timestamp top/bottom k series
    * (aggr.go:646 newAggrFuncTopK). Rank window per (group, t);
    * deterministic tie-break on the series columns.
    */
  def topk(df: DataFrame, seriesCols: Seq[String], by: Seq[String], k: Int): DataFrame =
    rankFilter(df, seriesCols, by, k, col("value").desc)
  def bottomk(df: DataFrame, seriesCols: Seq[String], by: Seq[String], k: Int): DataFrame =
    rankFilter(df, seriesCols, by, k, col("value").asc)

  private def rankFilter(df: DataFrame, seriesCols: Seq[String], by: Seq[String], k: Int, o: Column): DataFrame =
    df.withColumn(
        "_rn",
        row_number().over(
          Window.partitionBy(gcols(by): _*).orderBy((o +: seriesCols.map(col(_).asc)): _*)))
      .filter(col("_rn") <= k)
      .drop("_rn")

  /** topk_avg/min/max/median/last(k, q) — whole-series top-k by a series
    * statistic (aggr.go:677 newAggrFuncRangeTopK): two-phase — per-series
    * stat, rank, broadcast semi-join back.
    */
  def topkStat(
      df: DataFrame,
      seriesCols: Seq[String],
      by: Seq[String],
      k: Int,
      stat: Column,
      desc: Boolean = true): DataFrame = {
    val ord = if (desc) col("_s").desc else col("_s").asc
    val stats = df
      .groupBy(seriesCols.map(col): _*)
      .agg(stat.as("_s"))
    // ungrouped top-k: sort+limit plans as a distributed
    // TakeOrderedAndProject — a no-partition rank window would funnel
    // every distinct series through one task (50M-series scale-killer)
    val winners =
      if (by.isEmpty)
        stats.orderBy((ord +: seriesCols.map(col(_).asc)): _*).limit(k)
          .select(seriesCols.map(col): _*)
      else stats
        .withColumn(
          "_rn",
          row_number().over(
            Window.partitionBy(by.map(col): _*).orderBy((ord +: seriesCols.map(col(_).asc)): _*)))
        .filter(col("_rn") <= k)
        .select(seriesCols.map(col): _*)
    df.join(broadcast(winners), seriesCols, "left_semi")
  }

  /** limitk(k, q) — keep k arbitrary-but-stable series per group
    * (aggr.go:1108: hash-ordered for stability across evaluations).
    */
  def limitk(df: DataFrame, seriesCols: Seq[String], by: Seq[String], k: Int): DataFrame = {
    val keys = df
      .select((seriesCols ++ by).map(col): _*)
      .distinct()
    // ungrouped limitk: distributed sort+limit (TakeOrderedAndProject),
    // not a no-partition rank window over every distinct series
    val winners =
      if (by.isEmpty)
        keys.orderBy(xxhash64(seriesCols.map(col): _*), col(seriesCols.head)).limit(k)
          .select(seriesCols.map(col): _*)
      else keys
        .withColumn(
          "_rn",
          row_number().over(
            Window.partitionBy(by.map(col): _*)
              .orderBy(xxhash64(seriesCols.map(col): _*), col(seriesCols.head))))
        .filter(col("_rn") <= k)
        .select(seriesCols.map(col): _*)
    df.join(broadcast(winners), seriesCols, "left_semi")
  }

  /** outliers_iqr(q) — keep whole series whose median falls outside the
    * cross-series Tukey fences (aggr.go:952); outliersk(k) — top-k series
    * by max deviation from the cross-series median (aggr.go:1040);
    * outliers_mad(tol) — series whose deviation exceeds tol·MAD
    * (aggr.go:1004).
    */
  def outliersIqr(df: DataFrame, seriesCols: Seq[String], by: Seq[String]): DataFrame = {
    val stats = df.groupBy(seriesCols.map(col): _*).agg(percentile(col("value"), lit(0.5)).as("_med"))
    val fences = stats
      .groupBy(by.map(col): _*)
      .agg(
        percentile(col("_med"), lit(0.25)).as("_q25"),
        percentile(col("_med"), lit(0.75)).as("_q75"))
    val outliers = stats
      .join(broadcast(fences), by)
      .filter(
        col("_med") < col("_q25") - (col("_q75") - col("_q25")) * 1.5 ||
          col("_med") > col("_q75") + (col("_q75") - col("_q25")) * 1.5)
      .select(seriesCols.map(col): _*)
    df.join(broadcast(outliers), seriesCols, "left_semi")
  }

  def outliersk(df: DataFrame, seriesCols: Seq[String], by: Seq[String], k: Int): DataFrame = {
    val med = df
      .groupBy(gcols(by): _*)
      .agg(percentile(col("value"), lit(0.5)).as("_gmed"))
    val dev = df
      .join(med, by :+ "t")
      .groupBy(seriesCols.map(col): _*)
      .agg(max(abs(col("value") - col("_gmed"))).as("_dev"))
      .withColumn(
        "_rn",
        row_number().over(
          Window.partitionBy(by.map(col): _*)
            .orderBy(col("_dev").desc +: seriesCols.map(col(_).asc): _*)))
      .filter(col("_rn") <= k)
      .select(seriesCols.map(col): _*)
    df.join(broadcast(dev), seriesCols, "left_semi")
  }

  /** mad(q) — cross-series median absolute deviation per point
    * (aggr.go:942): median over series of |v − median(v)|.
    */
  def madA(df: DataFrame, by: Seq[String]): DataFrame = {
    val w = Window.partitionBy(gcols(by): _*)
    val med = percentile(col("value"), lit(0.5)).over(w)
    df.withColumn("_dev", abs(col("value") - med))
      .groupBy(gcols(by): _*)
      .agg(percentile(col("_dev"), lit(0.5)).as("value"))
  }

  /** outliers_mad(tol, q) — keep whole series whose median deviates from
    * the group median of medians by more than tol·MAD (aggr.go:1004).
    */
  def outliersMad(df: DataFrame, seriesCols: Seq[String], by: Seq[String], tol: Double): DataFrame = {
    val stats = df.groupBy(seriesCols.map(col): _*)
      .agg(percentile(col("value"), lit(0.5)).as("_med"))
    val gmed = stats
      .groupBy(by.map(col): _*)
      .agg(percentile(col("_med"), lit(0.5)).as("_gmed"))
    val withDev = stats.join(broadcast(gmed), by)
      .withColumn("_dev", abs(col("_med") - col("_gmed")))
    val mad = withDev
      .groupBy(by.map(col): _*)
      .agg(percentile(col("_dev"), lit(0.5)).as("_mad"))
    val outliers = withDev.join(broadcast(mad), by)
      .filter(col("_dev") > lit(tol) * col("_mad"))
      .select(seriesCols.map(col): _*)
    df.join(broadcast(outliers), seriesCols, "left_semi")
  }

  /** quantiles("label", phi…, q) — several per-point quantiles at once,
    * one output series per phi (aggr.go:1162).
    */
  def quantilesA(df: DataFrame, by: Seq[String], phis: Seq[Double]): DataFrame = {
    val aggs = phis.zipWithIndex.map { case (p, i) =>
      percentile(col("value"), lit(p)).as(s"_q$i")
    }
    val stackArgs = phis.zipWithIndex.map { case (p, i) => s"'$p', _q$i" }.mkString(", ")
    df.groupBy(gcols(by): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((gcols(by) :+
        expr(s"stack(${phis.size}, $stackArgs) as (phi, value)")): _*)
  }

  /** histogram(q) — VM log-bucket histogram across series per point,
    * returned as cumulative `le` buckets (aggr.go:256 aggrFuncHistogram
    * ends with vmrangeBucketsToLE). Output: (by…, t, le string, value).
    */
  def histogram(df: DataFrame, by: Seq[String]): DataFrame = {
    val vmr = df
      .filter(!isnan(col("value")) && col("value") > 0.0)
      // metrics.Histogram clamp buckets: (0, 1e-9] and (1e18, +Inf);
      // group on the integer index, format once per surviving bucket
      .withColumn("_k", HistogramQ.bucketIdxClamped(col("value")))
      .groupBy((gcols(by) :+ col("_k")): _*)
      .agg(count(lit(1)).cast(DoubleType).as("value"))
      .withColumn("vmrange", HistogramQ.vmrangeOfIdx(col("_k")))
      .drop("_k")
    HistogramQ.vmrangeToLE(vmr, by)
  }
}
