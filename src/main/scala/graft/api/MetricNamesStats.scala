package graft.api

import scala.collection.mutable

import graft.lang._

/** Metric-names usage tracker behind `/api/v1/status/metric_names_stats`
  * (app/vmselect/stats/stats.go MetricNamesStatsHandler,
  * lib/storage/metricnamestats/tracker.go). Ingestion registers a name
  * with a zero request count; every query request bumps the count and the
  * last-request timestamp of each metric name it selects, so `le=0`
  * surfaces never-queried names — the reference's cardinality-cleanup
  * workflow.
  *
  * The reference tracks names at the storage search layer (per matched
  * series); this facade resolves a query's `__name__` filters against the
  * tracked name set on the driver (exact filters directly, regex filters
  * via anchored match like tag_filters.go:160), which yields the same
  * per-name counts without a store round trip — the tracked-name set is
  * metadata-scale by construction (one entry per distinct name).
  */
object MetricNamesStats {

  private final class Item(var requestsCount: Long, var lastRequestTs: Long)

  private val store = mutable.LinkedHashMap.empty[String, Item]
  private var createdTsSec: Long = System.currentTimeMillis() / 1000

  def reset(): Unit = store.synchronized {
    store.clear()
    createdTsSec = System.currentTimeMillis() / 1000
  }

  /** register an ingested name (requestsCount stays 0 until queried) */
  def registerIngest(name: String): Unit = store.synchronized {
    if (name != null && name.nonEmpty && !store.contains(name))
      store(name) = new Item(0L, 0L)
  }

  /** register a query request against every tracked name the expression's
    * selectors match (tracker.go:347 RegisterQueryRequest)
    */
  def registerQuery(expr: Expr, nowMs: Long): Unit = {
    val nowSec = nowMs / 1000
    store.synchronized {
      collectNameFilters(expr).foreach {
        case (value, isRegexp) =>
          if (!isRegexp) {
            store.get(value).foreach { it =>
              it.requestsCount += 1; it.lastRequestTs = nowSec
            }
          } else {
            val p =
              try java.util.regex.Pattern.compile(value)
              catch { case _: Exception => null }
            if (p != null) store.foreach { case (n, it) =>
              if (p.matcher(n).matches()) { // anchored, tag_filters.go:160
                it.requestsCount += 1; it.lastRequestTs = nowSec
              }
            }
          }
      }
    }
  }

  /** positive `__name__` filters of every selector in the expression */
  private def collectNameFilters(e: Expr): Seq[(String, Boolean)] = e match {
    case MetricExpr(filterss) =>
      filterss.flatMap(_.collect {
        case LabelFilter("__name__", v, false, re) if v.nonEmpty => (v, re)
      })
    case RollupExpr(inner, _, _, _, _, _, _) => collectNameFilters(inner)
    case FuncExpr(_, args, _) => args.flatMap(collectNameFilters)
    case AggrFuncExpr(_, args, _, _) => args.flatMap(collectNameFilters)
    case BinaryOpExpr(_, l, r, _, _, _, _, _, _) =>
      collectNameFilters(l) ++ collectNameFilters(r)
    case ParensExpr(exprs) => exprs.flatMap(collectNameFilters)
    case _ => Nil
  }

  /** response for /api/v1/status/metric_names_stats: records with
    * requestsCount <= le (when le >= 0) whose name matches match_pattern,
    * sorted ascending by (requestsCount, name), truncated to limit —
    * tracker.go:435 GetStats + StatsResult.Sort
    */
  def statsJson(limit: Int, le: Int, matchPattern: String): String = {
    val re =
      if (matchPattern.isEmpty) null
      else
        try java.util.regex.Pattern.compile(matchPattern)
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"match_pattern=${matchPattern} must be valid regex: ${e.getMessage}")
        }
    val (since, total, recs) = store.synchronized {
      val rs = store.iterator.collect {
        case (n, it)
            if (le < 0 || it.requestsCount <= le) &&
              (re == null || re.matcher(n).find()) =>
          (n, it.requestsCount, it.lastRequestTs)
      }.toVector
      (createdTsSec, store.size.toLong, rs)
    }
    val limited = recs.sortBy { case (n, c, _) => (c, n) }.take(limit)
    // memory figures mirror the reference's tracker accounting: a fixed
    // budget and the per-entry footprint (tracker.go statOverhead) — this
    // driver-side map is bounded by distinct-name cardinality either way
    val currentBytes = store.synchronized {
      store.keysIterator.map(16L + _.length).sum
    }
    val records = limited.map { case (n, c, ts) =>
      s"""{"metricName":"${Json.esc(n)}","queryRequestsCount":$c,"lastQueryRequestTimestamp":$ts}"""
    }.mkString(",")
    s"""{"status":"success","statsCollectedSince":$since,""" +
      s""""statsCollectedRecordsTotal":$total,""" +
      s""""trackerMemoryMaxSizeBytes":${64L * 1024 * 1024},""" +
      s""""trackerCurrentMemoryUsageBytes":$currentBytes,""" +
      s""""records":[$records]}"""
  }
}
