package graft

import graft.core.GridSpec
import graft.lang.{AggrFuncExpr, BinaryOpExpr, Eval, Expr, FuncExpr, MetricExpr, NumberExpr, ParensExpr, Parser, RollupExpr, StringExpr}
import org.apache.spark.sql.DataFrame

/** Engine facade: MetricsQL text → grid DataFrame (name, tags, t, value).
  *
  * The Spark analogue of promql.Exec (app/vmselect/promql/exec.go:36):
  * parse (WITH expansion + const folding at parse time), then lower the AST
  * to a DataFrame program on the requested grid via [[graft.lang.Eval]].
  */
object Engine {
  def query(
      samples: DataFrame,
      q: String,
      grid: GridSpec,
      lookbackMs: Long = 300000L): DataFrame =
    Eval.eval(samples, Parser.parse(q), Eval.EvalConfig(grid, lookbackMs))

  /** O6 result memoization with TIME-SUFFIX FETCH
    * (rollup_result_cache.go:283 — a dashboard refresh repeats the same
    * expr with the end timestamp advanced; only the new suffix must be
    * evaluated):
    *
    *  - exact (query, grid) repeats return the same PERSISTED frame
    *  - a repeat whose grid extends FORWARD by whole steps evaluates only
    *    (cachedEnd, newEnd] and unions it onto the cached prefix —
    *    provided the query is pointwise in time (each grid point depends
    *    only on samples in its own lookback window, like the reference's
    *    rollup-level cache entries). Queries with whole-range semantics
    *    (the running_, range_, sort, limit families) always re-evaluate.
    *
    * Bounded LRU-ish eviction (oldest insertion order).
    */
  private val cache = new java.util.LinkedHashMap[
    (String, String, Long, Long, Long), (Long, DataFrame)](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(String, String, Long, Long, Long), (Long, DataFrame)]): Boolean =
      if (size() > 64) { e.getValue._2.unpersist(); true } else false
  }

  /** cache observability for tests/ops: (exactHits, suffixHits, misses) */
  @volatile private var stats = (0L, 0L, 0L)
  def cacheStats: (Long, Long, Long) = stats
  def resetCacheStats(): Unit = stats = (0L, 0L, 0L)

  /** Whole-range (non-pointwise) surface: a grid point of these depends on
    * OTHER grid points of the same evaluation, so a suffix evaluation
    * would see a truncated range and diverge (the reference caches below
    * such nodes, at the rollup level — rollup_result_cache.go:202).
    * rand/now are nondeterministic across evaluations.
    */
  private val nonPointwise: Set[String] = Set(
    "running_sum", "running_avg", "running_min", "running_max",
    "range_sum", "range_avg", "range_min", "range_max", "range_first",
    "range_last", "range_quantile", "range_median", "range_stddev",
    "range_stdvar", "range_linear_regression", "range_normalize",
    "range_zscore", "range_mad", "range_trim_zscore", "range_trim_outliers",
    "range_trim_spikes", "keep_last_value", "interpolate",
    "sort", "sort_desc", "sort_by_label", "sort_by_label_desc",
    "sort_by_label_numeric", "sort_by_label_numeric_desc",
    "limit_offset", "drop_common_labels", "rand", "rand_normal",
    "rand_exponential", "now")

  private def pointwiseInTime(e: Expr): Boolean = e match {
    case FuncExpr(n, args, _) => !nonPointwise(n) && args.forall(pointwiseInTime)
    case AggrFuncExpr(n, args, _, limit) =>
      n != "limitk" && limit == 0 && args.forall(pointwiseInTime)
    case BinaryOpExpr(_, l, r, _, _, _, _) => pointwiseInTime(l) && pointwiseInTime(r)
    case RollupExpr(inner, _, _, _, at, _, _) =>
      // @-pinned evaluations replicate one instant — grid-size dependent
      at.isEmpty && pointwiseInTime(inner)
    case ParensExpr(es) => es.forall(pointwiseInTime)
    case _: MetricExpr | _: NumberExpr | _: StringExpr => true
    case _ => false
  }

  def queryCached(
      samples: DataFrame,
      q: String,
      grid: GridSpec,
      lookbackMs: Long = 300000L): DataFrame = cache.synchronized {
    val planKey = samples.queryExecution.logical.canonicalized.toString
    val key = (planKey, q, grid.stepMs, lookbackMs, grid.startMs)
    Option(cache.get(key)) match {
      case Some((end, df)) if end == grid.endMs =>
        stats = (stats._1 + 1, stats._2, stats._3)
        df
      case Some((end, df)) if end < grid.endMs &&
          (grid.endMs - end) % grid.stepMs == 0 &&
          (try pointwiseInTime(Parser.parse(q)) catch { case _: Exception => false }) =>
        val suffixGrid = GridSpec(end + grid.stepMs, grid.endMs, grid.stepMs)
        val suffix = query(samples, q, suffixGrid, lookbackMs).persist()
        val merged = df.unionByName(suffix)
        stats = (stats._1, stats._2 + 1, stats._3)
        cache.put(key, (grid.endMs, merged))
        merged
      case _ =>
        val df = query(samples, q, grid, lookbackMs).persist()
        stats = (stats._1, stats._2, stats._3 + 1)
        cache.put(key, (grid.endMs, df))
        df
    }
  }

  def clearCache(): Unit = cache.synchronized {
    cache.values().forEach(_._2.unpersist())
    cache.clear()
  }
}
