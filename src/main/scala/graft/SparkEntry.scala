package graft

import graft.core.{GridSpec, Samples}
import graft.operators._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry (+ DuckDB oracle SQL) per
  * implemented operator from SURVEY.md §2.
  *
  * Conventions shared by every query/oracle pair:
  *  - events → samples mapping per FIXTURES.md §6 (name := event_type,
  *    series label := user_id, ts := epoch millis, value := value).
  *  - grid: Jan 2024 (the events table's span), hourly or daily step,
  *    timestamps as epoch-ms BIGINT `t`.
  *  - all double outputs rounded to 6 decimals ON BOTH SIDES so the
  *    driver's hash compare is immune to float summation order.
  *  - rows explicitly ordered; aggregate/computed columns aliased
  *    identically in Spark and SQL.
  */
object SparkEntry {

  // ---- shared grid constants (events span 2024-01-01 .. 2024-01-31) ----
  private val START = 1704067200000L // 2024-01-01T00:00:00Z
  private val END = 1706659200000L // 2024-01-31T00:00:00Z
  private val H = 3600000L
  private val D = 86400000L
  private val gridH = GridSpec(START, END, H)
  private val gridD = GridSpec(START, END, D)

  private def r6(c: Column): Column = round(c, 6)

  private def ev(s: SparkSession, dir: String): DataFrame = Samples.eventsFlat(s, dir)

  /** hourly tumbling rollup by metric name → (name, t, value) */
  private def roH(kernel: Kernel): (SparkSession, String) => DataFrame = (s, dir) =>
    Rollup.rollup(ev(s, dir), Seq("name"), gridH, H, kernel)
      .select(col("name"), col("t"), r6(col("value")).as("value"))
      .orderBy("name", "t")

  /** daily tumbling rollup by (name, user_id) → (name, user_id, t, value) */
  private def roD(kernel: Kernel): (SparkSession, String) => DataFrame = (s, dir) =>
    Rollup.rollup(ev(s, dir), Seq("name", "user_id"), gridD, D, kernel)
      .select(col("name"), col("user_id"), col("t"), r6(col("value")).as("value"))
      .orderBy("name", "user_id", "t")

  // ---- DuckDB oracle prelude builders ----
  /** bucketed events CTE: hourly (BH) / daily (BD) tumbling buckets */
  private val BH =
    s"SELECT event_type AS name, user_id, ((epoch_ms(ts::TIMESTAMP) + ${H - 1}) // $H) * $H AS t, " +
      "epoch_ms(ts::TIMESTAMP) AS tms, value FROM events"
  private val BD =
    s"SELECT event_type AS name, user_id, ((epoch_ms(ts::TIMESTAMP) + ${D - 1}) // $D) * $D AS t, " +
      "epoch_ms(ts::TIMESTAMP) AS tms, value FROM events"

  private def sqlH(agg: String): String =
    s"WITH b AS ($BH) SELECT name, t, round($agg, 6) AS value FROM b " +
      "GROUP BY name, t ORDER BY name, t"

  private def sqlD(agg: String): String =
    s"WITH b AS ($BD) SELECT name, user_id, t, round($agg, 6) AS value FROM b " +
      "GROUP BY name, user_id, t ORDER BY name, user_id, t"

  private case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      sql: Option[String])

  // =====================================================================
  // §2.2 rollup functions — hourly tumbling grid, grouped by metric name
  // =====================================================================
  private val rollupQueries: Seq[Q] = Seq(
    Q("ro_avg", roH(Kernels.avg), Some(sqlH("avg(value)"))),
    Q("ro_min", roH(Kernels.min), Some(sqlH("min(value)"))),
    Q("ro_max", roH(Kernels.max), Some(sqlH("max(value)"))),
    Q("ro_sum", roH(Kernels.sum), Some(sqlH("sum(value)"))),
    Q("ro_count", roH(Kernels.count), Some(sqlH("count(value)::DOUBLE"))),
    Q("ro_sum2", roH(Kernels.sum2), Some(sqlH("sum(value*value)"))),
    Q("ro_stddev", roH(Kernels.stddev), Some(sqlH("stddev_pop(value)"))),
    Q("ro_stdvar", roH(Kernels.stdvar), Some(sqlH("var_pop(value)"))),
    Q("ro_median", roH(Kernels.median), Some(sqlH("quantile_cont(value, 0.5)"))),
    Q("ro_quantile_p90", roH(Kernels.quantile(0.9)), Some(sqlH("quantile_cont(value, 0.9)"))),
    Q("ro_geomean", roH(Kernels.geomean), Some(sqlH("exp(avg(ln(value)))"))),
    Q("ro_distinct", roH(Kernels.distinct), Some(sqlH("count(DISTINCT value)::DOUBLE"))),
    Q("ro_range", roH(Kernels.range), Some(sqlH("max(value) - min(value)"))),
    Q("ro_first", roH(Kernels.first), Some(sqlH("first(value ORDER BY tms, value)"))),
    Q("ro_last", roH(Kernels.last), Some(sqlH("last(value ORDER BY tms, value)"))),
    Q("ro_tfirst", roH(Kernels.tfirst), Some(sqlH("min(tms)/1000.0"))),
    Q("ro_tlast", roH(Kernels.tlast), Some(sqlH("max(tms)/1000.0"))),
    Q("ro_count_gt_100", roH(Kernels.countGt(100)),
      Some(sqlH("sum(CASE WHEN value > 100 THEN 1 ELSE 0 END)::DOUBLE"))),
    Q("ro_count_le_100", roH(Kernels.countLe(100)),
      Some(sqlH("sum(CASE WHEN value <= 100 THEN 1 ELSE 0 END)::DOUBLE"))),
    Q("ro_sum_gt_100", roH(Kernels.sumGt(100)),
      Some(sqlH("sum(CASE WHEN value > 100 THEN value ELSE 0 END)"))),
    Q("ro_share_gt_100", roH(Kernels.shareGt(100)),
      Some(sqlH("sum(CASE WHEN value > 100 THEN 1.0 ELSE 0.0 END)/count(value)"))),
    Q("ro_lifetime", roH(Kernels.lifetime), Some(sqlH("(max(tms) - min(tms))/1000.0"))),
    Q("ro_lag", roH(Kernels.lag), Some(sqlH("(t - max(tms))/1000.0"))),
    Q("ro_scrape_interval", roH(Kernels.scrapeInterval),
      Some(sqlH("CASE WHEN count(value) > 1 THEN (max(tms)-min(tms))/1000.0/(count(value)-1) END"))),
    Q("ro_rate_over_sum", roH(Kernels.rateOverSum(H)), Some(sqlH("sum(value)/3600.0"))),
    Q("ro_zscore", roH(Kernels.zscore),
      Some(sqlH("CASE WHEN stddev_pop(value) > 0 THEN " +
        "(last(value ORDER BY tms, value) - avg(value))/stddev_pop(value) ELSE 0.0 END"))),
    Q("ro_deriv", roH(Kernels.deriv),
      Some(sqlH("CASE WHEN count(value) > 1 THEN regr_slope(value, (tms - t)/1000.0) END"))),
    Q("ro_predict_linear", roH(Kernels.predictLinear(3600)),
      Some(sqlH("CASE WHEN count(value) > 1 THEN regr_intercept(value, (tms - t)/1000.0) " +
        "+ regr_slope(value, (tms - t)/1000.0) * 3600 END"))),
    Q("ro_hoeffding_upper", roH(Kernels.hoeffdingUpper(0.9)),
      Some(sqlH("avg(value) + (max(value)-min(value)) * sqrt(ln(1.0/(1-0.9))/(2*count(value)))"))),
    Q("ro_outlier_iqr", roH(Kernels.outlierIqr),
      Some(sqlH("CASE WHEN count(*) >= 2 AND (" +
        "last(value ORDER BY tms, value) < quantile_cont(value, 0.25) - 1.5*(quantile_cont(value, 0.75) - quantile_cont(value, 0.25)) OR " +
        "last(value ORDER BY tms, value) > quantile_cont(value, 0.75) + 1.5*(quantile_cont(value, 0.75) - quantile_cont(value, 0.25))) " +
        "THEN last(value ORDER BY tms, value) END"))),
    Q("ro_tmin", roH(Kernels.tmin), Some(
      s"WITH b AS ($BH), m AS (SELECT name, t, tms, value, min(value) OVER (PARTITION BY name, t) AS mv FROM b) " +
        "SELECT name, t, round(max(CASE WHEN value = mv THEN tms END)/1000.0, 6) AS value " +
        "FROM m GROUP BY name, t ORDER BY name, t")),
    Q("ro_tmax", roH(Kernels.tmax), Some(
      s"WITH b AS ($BH), m AS (SELECT name, t, tms, value, max(value) OVER (PARTITION BY name, t) AS mv FROM b) " +
        "SELECT name, t, round(max(CASE WHEN value = mv THEN tms END)/1000.0, 6) AS value " +
        "FROM m GROUP BY name, t ORDER BY name, t")),
    Q("ro_mode", roH(Kernels.mode), Some(
      s"WITH b AS ($BH), c AS (SELECT name, t, value, count(*) AS cnt FROM b GROUP BY name, t, value) " +
        "SELECT name, t, round(value, 6) AS value FROM c " +
        "QUALIFY row_number() OVER (PARTITION BY name, t ORDER BY cnt DESC, value ASC) = 1 " +
        "ORDER BY name, t")),
    Q("ro_mad", roH(Kernels.mad), Some(
      s"WITH b AS ($BH), m AS (SELECT name, t, quantile_cont(value, 0.5) AS med FROM b GROUP BY name, t) " +
        "SELECT b.name AS name, b.t AS t, round(quantile_cont(abs(b.value - m.med), 0.5), 6) AS value " +
        "FROM b JOIN m ON b.name = m.name AND b.t = m.t " +
        "GROUP BY b.name, b.t ORDER BY name, t")))

  // =====================================================================
  // §2.2 order-sensitive rollups — daily tumbling grid by (name, user_id);
  // oracle uses lag()/list() window forms of the same adjacent-pair math
  // =====================================================================
  /** daily-bucket CTE with per-group lag(value)/lag(tms) */
  private def sqlDLag(agg: String): String =
    s"WITH b AS ($BD), d AS (SELECT name, user_id, t, tms, value, " +
      "lag(value) OVER (PARTITION BY name, user_id, t ORDER BY tms, value) AS pv, " +
      "lag(tms) OVER (PARTITION BY name, user_id, t ORDER BY tms, value) AS ptms FROM b) " +
      s"SELECT name, user_id, t, round($agg, 6) AS value FROM d " +
      "GROUP BY name, user_id, t ORDER BY name, user_id, t"

  /** daily-bucket CTE with ts-ordered value/tms lists (1-based indexing) */
  private def sqlDList(valueExpr: String): String =
    s"WITH b AS ($BD), l AS (SELECT name, user_id, t, " +
      "list(value ORDER BY tms, value) AS vs, list(tms ORDER BY tms, value) AS ts " +
      "FROM b GROUP BY name, user_id, t) " +
      s"SELECT name, user_id, t, round($valueExpr, 6) AS value FROM l " +
      "ORDER BY name, user_id, t"

  /** hourly rollup by name with an arbitrary lookback window (sliding) */
  private def roHW(kernel: Kernel, windowMs: Long): (SparkSession, String) => DataFrame =
    (s, dir) =>
      Rollup.rollup(ev(s, dir), Seq("name"), gridH, windowMs, kernel)
        .select(col("name"), col("t"), r6(col("value")).as("value"))
        .orderBy("name", "t")

  /** sliding-window oracle: grid × samples range join (the declarative
    * formulation; Spark side uses the map-side bucket explode instead)
    */
  private def sqlSlidingH(windowMs: Long, agg: String): String =
    s"WITH g AS (SELECT unnest(generate_series($START, $END, $H)) AS t), " +
      "b AS (SELECT event_type AS name, epoch_ms(ts::TIMESTAMP) AS tms, value FROM events), " +
      s"j AS (SELECT name, t, tms, value FROM g JOIN b ON b.tms > g.t - $windowMs AND b.tms <= g.t) " +
      s"SELECT name, t, round($agg, 6) AS value FROM j GROUP BY name, t ORDER BY name, t"

  private val increaseSql =
    "sum(CASE WHEN pv IS NULL THEN 0 WHEN value >= pv THEN value - pv ELSE value END)"

  private val rollupQueries2: Seq[Q] = Seq(
    Q("ro_delta", roD(Kernels.delta),
      Some(sqlD("last(value ORDER BY tms, value) - first(value ORDER BY tms, value)"))),
    Q("ro_idelta", roD(Kernels.idelta),
      Some(sqlDList("CASE WHEN len(vs) >= 2 THEN vs[len(vs)] - vs[len(vs)-1] END"))),
    Q("ro_increase", roD(Kernels.increase), Some(sqlDLag(increaseSql))),
    Q("ro_rate", roD(Kernels.rate(D)), Some(sqlDLag(s"$increaseSql / 86400.0"))),
    Q("ro_irate", roD(Kernels.irate),
      Some(sqlDList("CASE WHEN len(vs) >= 2 AND ts[len(ts)] > ts[len(ts)-1] THEN " +
        "(CASE WHEN vs[len(vs)] >= vs[len(vs)-1] THEN vs[len(vs)] - vs[len(vs)-1] ELSE vs[len(vs)] END)" +
        " / ((ts[len(ts)] - ts[len(ts)-1])/1000.0) END"))),
    Q("ro_ideriv", roD(Kernels.ideriv),
      Some(sqlDList("CASE WHEN len(vs) >= 2 AND ts[len(ts)] > ts[len(ts)-1] THEN " +
        "(vs[len(vs)] - vs[len(vs)-1]) / ((ts[len(ts)] - ts[len(ts)-1])/1000.0) END"))),
    Q("ro_deriv_fast", roD(Kernels.derivFast),
      Some(sqlD("CASE WHEN max(tms) > min(tms) THEN " +
        "(last(value ORDER BY tms, value) - first(value ORDER BY tms, value))" +
        " / ((max(tms) - min(tms))/1000.0) END"))),
    Q("ro_changes", roD(Kernels.changes),
      Some(sqlDLag("sum(CASE WHEN pv IS NOT NULL AND value != pv THEN 1 ELSE 0 END)::DOUBLE"))),
    Q("ro_increases_over_time", roD(Kernels.increasesOverTime),
      Some(sqlDLag("sum(CASE WHEN pv IS NOT NULL AND value > pv THEN 1 ELSE 0 END)::DOUBLE"))),
    Q("ro_decreases_over_time", roD(Kernels.decreasesOverTime),
      Some(sqlDLag("sum(CASE WHEN pv IS NOT NULL AND value < pv THEN 1 ELSE 0 END)::DOUBLE"))),
    Q("ro_resets", roD(Kernels.resets),
      Some(sqlDLag("sum(CASE WHEN pv IS NOT NULL AND value < pv THEN 1 ELSE 0 END)::DOUBLE"))),
    Q("ro_ascent_over_time", roD(Kernels.ascentOverTime),
      Some(sqlDLag("sum(CASE WHEN pv IS NOT NULL AND value > pv THEN value - pv ELSE 0 END)"))),
    Q("ro_descent_over_time", roD(Kernels.descentOverTime),
      Some(sqlDLag("sum(CASE WHEN pv IS NOT NULL AND value < pv THEN pv - value ELSE 0 END)"))),
    Q("ro_integrate", roD(Kernels.integrate),
      Some(sqlDLag("sum(CASE WHEN ptms IS NOT NULL THEN pv * ((tms - ptms)/1000.0) ELSE 0 END)"))),
    Q("ro_duration_over_time", roD(Kernels.durationOverTime(21600)),
      Some(sqlDLag("sum(CASE WHEN ptms IS NOT NULL AND tms - ptms <= 21600000 " +
        "THEN (tms - ptms)/1000.0 ELSE 0 END)"))),
    Q("ro_tlast_change", roD(Kernels.tlastChange),
      Some(sqlDLag("coalesce(max(CASE WHEN pv IS NOT NULL AND value != pv THEN tms END), min(tms))/1000.0"))),
    // sliding lookback (window > step): 6h window on the hourly grid
    Q("ro_sliding_max", roHW(Kernels.max, 6 * H), Some(sqlSlidingH(6 * H, "max(value)"))),
    Q("ro_sliding_avg", roHW(Kernels.avg, 6 * H), Some(sqlSlidingH(6 * H, "avg(value)"))),
    Q("ro_sliding_increase", roHW(Kernels.increase, 6 * H), Some(
      s"WITH g AS (SELECT unnest(generate_series($START, $END, $H)) AS t), " +
        "b AS (SELECT event_type AS name, epoch_ms(ts::TIMESTAMP) AS tms, value FROM events), " +
        s"j AS (SELECT name, t, tms, value FROM g JOIN b ON b.tms > g.t - ${6 * H} AND b.tms <= g.t), " +
        "d AS (SELECT name, t, value, lag(value) OVER (PARTITION BY name, t ORDER BY tms, value) AS pv FROM j) " +
        s"SELECT name, t, round($increaseSql, 6) AS value FROM d GROUP BY name, t ORDER BY name, t")),
    // fan-out rollups
    Q("ro_candlestick", (s, dir) =>
      Rollup.candlestick(ev(s, dir), Seq("name"), gridH, H)
        .select(col("name"), col("t"), col("rollup"), r6(col("value")).as("value"))
        .orderBy("name", "t", "rollup"),
      Some(s"WITH b AS ($BH), w AS (SELECT name, t, " +
        "first(value ORDER BY tms, value) AS open, last(value ORDER BY tms, value) AS close, " +
        "min(value) AS low, max(value) AS high FROM b GROUP BY name, t) " +
        "SELECT name, t, r AS rollup, round(v, 6) AS value FROM (" +
        "SELECT name, t, 'open' AS r, open AS v FROM w UNION ALL " +
        "SELECT name, t, 'close', close FROM w UNION ALL " +
        "SELECT name, t, 'low', low FROM w UNION ALL " +
        "SELECT name, t, 'high', high FROM w) ORDER BY name, t, rollup")),
    Q("ro_aggr_over_time", (s, dir) =>
      Rollup.aggrOverTime(ev(s, dir), Seq("name"), gridH, H,
        Seq("avg" -> Kernels.avg, "max" -> Kernels.max))
        .select(col("name"), col("t"), col("rollup"), r6(col("value")).as("value"))
        .orderBy("name", "t", "rollup"),
      Some(s"WITH b AS ($BH), w AS (SELECT name, t, avg(value) AS a, max(value) AS m FROM b GROUP BY name, t) " +
        "SELECT name, t, r AS rollup, round(v, 6) AS value FROM (" +
        "SELECT name, t, 'avg' AS r, a AS v FROM w UNION ALL " +
        "SELECT name, t, 'max', m FROM w) ORDER BY name, t, rollup")),
    Q("ro_quantiles_over_time", (s, dir) =>
      Rollup.quantilesOverTime(ev(s, dir), Seq("name"), gridH, H, Seq(0.5, 0.9))
        .select(col("name"), col("t"), col("phi"), r6(col("value")).as("value"))
        .orderBy("name", "t", "phi"),
      Some(s"WITH b AS ($BH), w AS (SELECT name, t, quantile_cont(value, 0.5) AS q5, " +
        "quantile_cont(value, 0.9) AS q9 FROM b GROUP BY name, t) " +
        "SELECT name, t, phi, round(v, 6) AS value FROM (" +
        "SELECT name, t, '0.5' AS phi, q5 AS v FROM w UNION ALL " +
        "SELECT name, t, '0.9', q9 FROM w) ORDER BY name, t, phi")),
    Q("ro_count_values_over_time", (s, dir) =>
      Rollup.countValuesOverTime(ev(s, dir), Seq("name"), gridH, H)
        .select(col("name"), col("t"), r6(col("value")).as("value"), col("cnt"))
        .orderBy("name", "t", "value"),
      Some(s"WITH b AS ($BH) SELECT name, t, round(value, 6) AS value, count(*)::DOUBLE AS cnt " +
        "FROM b GROUP BY name, t, value ORDER BY name, t, value")),
    Q("ro_histogram_over_time", (s, dir) =>
      Rollup.histogramOverTime(ev(s, dir), Seq("name"), gridH, H)
        .select(col("name"), col("t"), col("vmrange"), col("value"))
        .orderBy("name", "t", "vmrange"),
      Some(s"WITH b AS ($BH) SELECT name, t, floor(log10(value) * 18)::BIGINT AS vmrange, " +
        "count(*)::DOUBLE AS value FROM b GROUP BY name, t, vmrange ORDER BY name, t, vmrange")),
    Q("ro_present_over_time", (s, dir) =>
      Rollup.presentOverTime(ev(s, dir), Seq("name"), gridH, H)
        .select(col("name"), col("t"), col("value"))
        .orderBy("name", "t"),
      Some(s"WITH b AS ($BH) SELECT DISTINCT name, t, 1.0 AS value FROM b ORDER BY name, t")),
    Q("ro_absent_over_time", (s, dir) =>
      Rollup.absentOverTime(
        ev(s, dir).filter(col("name") === "error" && col("user_id") === 3), gridH, H)
        .select(col("t"), col("value"))
        .orderBy("t"),
      Some(s"SELECT t, 1.0 AS value FROM (SELECT unnest(generate_series($START, $END, $H)) AS t) g " +
        "WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.event_type = 'error' AND e.user_id = 3 " +
        s"AND epoch_ms(e.ts::TIMESTAMP) > g.t - $H AND epoch_ms(e.ts::TIMESTAMP) <= g.t) ORDER BY t")),
    Q("ro_default_rollup", (s, dir) =>
      Rollup.defaultRollup(ev(s, dir), Seq("name", "user_id"), gridH, 2 * H)
        .select(col("name"), col("user_id"), col("t"), r6(col("value")).as("value"))
        .orderBy("name", "user_id", "t"),
      Some(s"WITH g AS (SELECT unnest(generate_series($START, $END, $H)) AS t), " +
        "b AS (SELECT event_type AS name, user_id, epoch_ms(ts::TIMESTAMP) AS tms, value FROM events), " +
        s"j AS (SELECT name, user_id, t, tms, value FROM g JOIN b ON b.tms > g.t - ${2 * H} AND b.tms <= g.t) " +
        "SELECT name, user_id, t, round(last(value ORDER BY tms, value), 6) AS value FROM j " +
        "GROUP BY name, user_id, t ORDER BY name, user_id, t")))

  // =====================================================================
  private val relationalQueries: Seq[Q] = Seq(
    // TPC-H Q1-shaped pricing summary: scan + filter + groupBy agg
    Q("q1_agg", (s, dir) => {
      Samples.table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          r6(sum("l_quantity")).as("sum_qty"),
          r6(sum("l_extendedprice")).as("sum_base_price"),
          r6(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          r6(avg("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }, Some(
      "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 6) AS sum_qty, " +
        "round(sum(l_extendedprice), 6) AS sum_base_price, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price, " +
        "round(avg(l_quantity), 6) AS avg_qty, count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus")))

  // =====================================================================
  private val defs: Seq[Q] = rollupQueries ++ rollupQueries2 ++ relationalQueries

  /** Flagship: sum(rate(events[1d])) by (name) on the hourly grid —
    * the M1 end-to-end slice from SURVEY §7.2: per-(name,user) counter
    * rate over a sliding 1-day lookback, summed across users per name.
    */
  def entry(spark: SparkSession): DataFrame = {
    val samples = Samples.eventsFlat(spark, "/root/testdata/sf0.001")
    val rated = Rollup.rollup(samples, Seq("name", "user_id"), gridH, D, Kernels.rate(D))
    Aggr.sumA(rated, Seq("name"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    defs.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
