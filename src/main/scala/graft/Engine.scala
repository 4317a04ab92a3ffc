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
  /** cached result: grid end, the frame to serve, and every PERSISTED
    * constituent (the original full evaluation plus each suffix) — the
    * served union itself is not persisted, so eviction must unpersist the
    * pieces, not the union.
    */
  private final case class Entry(endMs: Long, df: DataFrame, persisted: Seq[DataFrame])

  private val cache = new java.util.LinkedHashMap[
    (String, String, Long, Long, Long), Entry](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(String, String, Long, Long, Long), Entry]): Boolean =
      if (size() > 64) { e.getValue.persisted.foreach(_.unpersist()); true } else false
  }

  /** cache observability for tests/ops: (exactHits, suffixHits, misses) */
  @volatile private var stats = (0L, 0L, 0L)
  def cacheStats: (Long, Long, Long) = stats
  def resetCacheStats(): Unit = stats = (0L, 0L, 0L)

  /** ALLOWLIST of transforms known to be pointwise in time: the value at a
    * grid point depends only on that point's inputs, so a suffix evaluation
    * over (cachedEnd, newEnd] produces the same rows a full evaluation
    * would. Everything NOT listed fails closed to full re-evaluation — the
    * running_/range_/sort/limit families carry whole-range state, and so do
    * smooth_exponential, remove_resets (running from range start),
    * keep_last_value/keep_next_value/interpolate (gap fill across points),
    * the rand family and now (nondeterministic), start/end
    * (grid-extent-valued). Rollup
    * functions are window-local (each point reads only its own lookback
    * window) and are allowed via [[Eval.isRollupFn]]. The reference caches
    * below such nodes at the rollup level — rollup_result_cache.go:202.
    */
  private val pointwiseTransforms: Set[String] = Set(
    // one-arg math (transform.go:25-130)
    "abs", "ceil", "floor", "exp", "ln", "log2", "log10", "sqrt", "sin",
    "cos", "tan", "asin", "acos", "atan", "sinh", "cosh", "tanh", "asinh",
    "acosh", "atanh", "deg", "rad", "sgn",
    "round", "clamp", "clamp_min", "clamp_max",
    // calendar projections of t
    "day_of_month", "day_of_week", "day_of_year", "days_in_month",
    "hour", "minute", "month", "year", "timezone_offset",
    // label surgery (per-row, time-independent)
    "alias", "label_set", "label_del", "label_keep", "label_copy",
    "label_move", "label_join", "label_replace", "label_value",
    "label_lowercase", "label_uppercase", "label_match", "label_mismatch",
    "labels_equal", "label_map", "label_transform",
    // per-point structure ops
    "absent", "union", "vector", "scalar", "time", "step", "pi",
    "drop_empty_series",
    "prometheus_buckets", "buckets_limit",
    "histogram_quantile", "histogram_share", "histogram_avg",
    "histogram_stddev", "histogram_stdvar", "histogram_fraction",
    "histogram_quantiles",
    "bitmap_and", "bitmap_or", "bitmap_xor")

  private def pointwiseInTime(e: Expr): Boolean = e match {
    case FuncExpr(n, args, _) =>
      (Eval.isRollupFn(n) || pointwiseTransforms(n)) && args.forall(pointwiseInTime)
    case AggrFuncExpr(n, args, _, limit) =>
      n != "limitk" && limit == 0 && args.forall(pointwiseInTime)
    case BinaryOpExpr(_, l, r, _, _, _, _, _, _) => pointwiseInTime(l) && pointwiseInTime(r)
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
      case Some(Entry(end, df, _)) if end == grid.endMs =>
        stats = (stats._1 + 1, stats._2, stats._3)
        df
      case Some(Entry(end, df, persisted)) if end < grid.endMs &&
          (grid.endMs - end) % grid.stepMs == 0 &&
          (try pointwiseInTime(Parser.parse(q)) catch { case _: Exception => false }) =>
        val suffixGrid = GridSpec(end + grid.stepMs, grid.endMs, grid.stepMs)
        val suffix = query(samples, q, suffixGrid, lookbackMs).persist()
        val merged = df.unionByName(suffix)
        stats = (stats._1, stats._2 + 1, stats._3)
        cache.put(key, Entry(grid.endMs, merged, persisted :+ suffix))
        merged
      case _ =>
        val df = query(samples, q, grid, lookbackMs).persist()
        stats = (stats._1, stats._2, stats._3 + 1)
        cache.put(key, Entry(grid.endMs, df, Seq(df)))
        df
    }
  }

  def clearCache(): Unit = cache.synchronized {
    cache.values().forEach(_.persisted.foreach(_.unpersist()))
    cache.clear()
  }
}
