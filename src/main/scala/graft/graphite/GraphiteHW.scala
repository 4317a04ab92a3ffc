package graft.graphite

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import GraphiteQL._
import GraphiteModel._
import GraphiteEval._
import GraphiteFuncs.TFunc

/** Graphite's holtWinters* family (transform.go:5160-5560): triple
  * exponential smoothing (alpha=0.1, gamma=0.1, beta=0.0035) over a
  * bootstrap-extended range, per series. The recursion is genuinely
  * sequential per series with a seasonal lookback, so it runs as a
  * per-series UDF over the collected (bounded: bootstrap/step points)
  * value array — parallelism across series is the scale axis, exactly
  * like the reference's one-goroutine-per-series evaluation.
  */
object GraphiteHW {

  private val hwUdf = udf { (vals: Seq[Double], seasonLength: Int) =>
    val n = vals.length
    val alpha = 0.1
    val gamma = alpha
    val beta = 0.0035
    val intercepts = new Array[Double](n)
    val slopes = new Array[Double](n)
    val seasonals = new Array[Double](n)
    val predictions = new Array[Double](n)
    val deviations = new Array[Double](n)
    def lastSeasonalAt(i: Int): Double = {
      val j = i - seasonLength
      if (j >= 0) seasonals(j) else 0.0
    }
    def lastDeviationAt(i: Int): Double = {
      val j = i - seasonLength
      if (j >= 0) deviations(j) else 0.0
    }
    var nextPred = Double.NaN
    var i = 0
    while (i < n) {
      val v = vals(i)
      if (v.isNaN) {
        intercepts(i) = 0; slopes(i) = 0; seasonals(i) = 0
        predictions(i) = nextPred; deviations(i) = 0
        nextPred = Double.NaN
      } else {
        var lastIntercept = 0.0
        var lastSlope = 0.0
        var prediction = 0.0
        if (i == 0) {
          lastIntercept = v; lastSlope = 0; prediction = v
        } else {
          lastIntercept = intercepts(i - 1)
          lastSlope = slopes(i - 1)
          if (lastIntercept.isNaN) lastIntercept = v
          prediction = nextPred
        }
        val lastSeasonal = lastSeasonalAt(i)
        val nextLastSeasonal = lastSeasonalAt(i + 1)
        val lastSeasonalDev = lastDeviationAt(i)
        val intercept = alpha * (v - lastSeasonal) + (1 - alpha) * (lastIntercept + lastSlope)
        val slope = beta * (intercept - lastIntercept) + (1 - beta) * lastSlope
        val seasonal = gamma * (v - intercept) + (1 - gamma) * lastSeasonal
        nextPred = intercept + slope + nextLastSeasonal
        val predForDev = if (prediction.isNaN) 0.0 else prediction
        val deviation = gamma * math.abs(v - predForDev) + (1 - gamma) * lastSeasonalDev
        intercepts(i) = intercept; slopes(i) = slope; seasonals(i) = seasonal
        predictions(i) = prediction; deviations(i) = deviation
      }
      i += 1
    }
    Seq(predictions.toSeq, deviations.toSeq)
  }

  /** evaluate the arg over [start-bootstrap, end), consolidate, and
    * attach per-series `_hw` = [predictions, deviations] arrays plus the
    * sorted `_pts`; returns (frame, step, trimPoints)
    */
  private def analysis(
      ctx: GraphiteCtx, fe: FuncExpr, bootstrapMs: Long,
      seasonalityMs: Long): (DataFrame, Long, Int) = {
    val ecc = ctx.copy(startMs = ctx.startMs - bootstrapMs)
    val inner = consolidateCommon(ecc, eval(ecc, arg(fe, "seriesList", 0).expr))
    val step = if (inner.step > 0) inner.step else ctx.storageStepMs
    val trim = (ecc.pointsLen(step) - ctx.pointsLen(step)).toInt
    val folded = inner.df.groupBy(col("sid")).agg(
      first(col("ord")).as("ord"), first(col("name")).as("name"),
      first(col("tags")).as("tags"), first(col("pathExpr")).as("pathExpr"),
      array_sort(collect_list(struct(col("t"), col("value")))).as("_pts"))
      .withColumn("_hw",
        hwUdf(transform(col("_pts"), _.getField("value")),
          lit((seasonalityMs / step).toInt)))
    (folded, step, trim)
  }

  private def bandArgs(ctx: GraphiteCtx, fe: FuncExpr): (Double, Long, Long) = {
    val delta = optNum(fe, "delta", 1, 3)
    val bootstrap = optStr(fe, "bootstrapInterval", 2, "7d")
    val seasonality = optStr(fe, "seasonality", 3, "1d")
    (delta, parseInterval(bootstrap), parseInterval(seasonality))
  }

  /** (origName, origOrd, t, upper, lower) band rows after trimming */
  private def bandRows(
      ctx: GraphiteCtx, fe: FuncExpr, delta: Double, bootstrapMs: Long,
      seasonalityMs: Long): (DataFrame, Long) = {
    val (folded, step, trim) = analysis(ctx, fe, bootstrapMs, seasonalityMs)
    val rows = folded.select(
      col("name").as("_origName"), col("ord").as("_origOrd"),
      posexplode(arrays_zip(
        slice(transform(col("_pts"), _.getField("t")), trim + 1, 1000000),
        slice(element_at(col("_hw"), 1), trim + 1, 1000000),
        slice(element_at(col("_hw"), 2), trim + 1, 1000000))))
      .select(
        col("_origName"), col("_origOrd"),
        col("col").getField("0").as("t"),
        col("col").getField("1").as("_pred"),
        col("col").getField("2").as("_dev"))
      .withColumn("_up",
        when(isnan(col("_pred")) || isnan(col("_dev")), Double.NaN)
          .otherwise(col("_pred") + lit(delta) * col("_dev")))
      .withColumn("_lo",
        when(isnan(col("_pred")) || isnan(col("_dev")), Double.NaN)
          .otherwise(col("_pred") - lit(delta) * col("_dev")))
      .drop("_pred", "_dev")
    (rows, step)
  }

  private def bandSeries(rows: DataFrame, step: Long, areaWrap: Boolean): SeriesSet = {
    def side(colName: String, kind: String, ordOff: Long): DataFrame = {
      val base = concat(lit(s"$kind("), col("_origName"), lit(")"))
      val nm = if (areaWrap) concat(lit("areaBetween("), base, lit(")")) else base
      val tags0 = map(lit(kind), lit("1"), lit("name"), col("_origName"))
      val tags = if (areaWrap)
        GraphiteEval.tagMerge(tags0, map(lit("areaBetween"), lit("1")))
      else tags0
      rows.select(
        nm.as("sid"),
        (col("_origOrd") * 2 + ordOff).as("ord"),
        nm.as("name"),
        tags.as("tags"),
        base.as("pathExpr"),
        lit(null).cast("string").as("consol"),
        lit(null).cast("double").as("xff"),
        lit(step).as("step"),
        col("t"),
        col(colName).as("value"))
    }
    SeriesSet(
      side("_up", "holtWintersConfidenceUpper", 0L)
        .unionByName(side("_lo", "holtWintersConfidenceLower", 1L)),
      Set(step))
  }

  def confidenceBands: TFunc = (ctx, fe) => {
    expectArgs(fe, 1, 4)
    val (delta, b, s) = bandArgs(ctx, fe)
    val (rows, step) = bandRows(ctx, fe, delta, b, s)
    bandSeries(rows, step, areaWrap = false)
  }

  def confidenceArea: TFunc = (ctx, fe) => {
    expectArgs(fe, 1, 4)
    val (delta, b, s) = bandArgs(ctx, fe)
    val (rows, step) = bandRows(ctx, fe, delta, b, s)
    // bands of >1 input series cannot form an area
    // (transformHoltWintersConfidenceArea len(bands) != 2 check)
    val n = rows.select(col("_origName"), col("_origOrd")).distinct().limit(2).count()
    if (n > 1)
      throw GraphiteError("expecting exactly two series; got more series")
    bandSeries(rows, step, areaWrap = true)
  }

  def aberration: TFunc = (ctx, fe) => {
    expectArgs(fe, 1, 4)
    val (delta, b, s) = bandArgs(ctx, fe)
    val (rows, step) = bandRows(ctx, fe, delta, b, s)
    val bands = rows.select(
      col("_origName").as("_bn"), col("t"), col("_up"), col("_lo"))
    val plain = consolidateTo(ctx, seriesArg(ctx, fe, "seriesList", 0), step)
    val joined = plain.df.join(bands,
      plain.df("name") === col("_bn") && plain.df("t") === bands("t"), "left")
      .drop(bands("t")).drop("_bn")
    val v = col("value")
    val aberr = when(isnan(v), 0.0)
      .when(col("_up").isNotNull && !isnan(col("_up")) && v > col("_up"), v - col("_up"))
      .when(col("_lo").isNotNull && !isnan(col("_lo")) && v < col("_lo"), v - col("_lo"))
      .otherwise(0.0)
    val out = mapSet(plain.copy(df = joined),
      value = aberr,
      name = wrapName("holtWintersAberration"),
      tagsUpd = Seq("holtWintersAberration" -> lit("1")))
    out.copy(df = out.df.drop("_up", "_lo"))
  }

  def forecast: TFunc = (ctx, fe) => {
    expectArgs(fe, 1, 3)
    val bootstrap = optStr(fe, "bootstrapInterval", 1, "7d")
    val seasonality = optStr(fe, "seasonality", 2, "1d")
    val (folded, step, trim) = analysis(ctx, fe, parseInterval(bootstrap),
      parseInterval(seasonality))
    val rows = folded.select(
      col("sid"), col("ord"), col("name"), col("tags"),
      posexplode(arrays_zip(
        slice(transform(col("_pts"), _.getField("t")), trim + 1, 1000000),
        slice(element_at(col("_hw"), 1), trim + 1, 1000000))))
      .select(col("sid"), col("ord"), col("name"), col("tags"),
        col("col").getField("0").as("t"),
        col("col").getField("1").as("value"))
      .withColumn("pathExpr", col("name"))
      .withColumn("consol", lit(null).cast("string"))
      .withColumn("xff", lit(null).cast("double"))
      .withColumn("step", lit(step))
    mapSet(SeriesSet(rows, Set(step)),
      name = wrapName("holtWintersForecast"),
      tagsUpd = Seq("holtWintersForecast" -> lit("1"),
        "name" -> wrapName("holtWintersForecast")))
  }
}
