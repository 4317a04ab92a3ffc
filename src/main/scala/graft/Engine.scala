package graft

import graft.core.GridSpec
import graft.lang.{Eval, Parser}
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

  /** O6-lite result memoization (rollup_result_cache.go:202 in spirit):
    * repeated (query, grid) evaluations return the same PERSISTED frame,
    * so re-execution hits Spark's in-memory columnar cache instead of
    * re-scanning. Keyed per samples-plan so different inputs never
    * collide; bounded LRU-ish eviction (oldest insertion order).
    */
  private val cache = new java.util.LinkedHashMap[(String, String, GridSpec, Long), DataFrame](
    16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(String, String, GridSpec, Long), DataFrame]): Boolean =
      if (size() > 64) { e.getValue.unpersist(); true } else false
  }

  def queryCached(
      samples: DataFrame,
      q: String,
      grid: GridSpec,
      lookbackMs: Long = 300000L): DataFrame = cache.synchronized {
    val key = (samples.queryExecution.logical.canonicalized.toString, q, grid, lookbackMs)
    Option(cache.get(key)).getOrElse {
      val df = query(samples, q, grid, lookbackMs).persist()
      cache.put(key, df)
      df
    }
  }

  def clearCache(): Unit = cache.synchronized {
    cache.values().forEach(_.unpersist())
    cache.clear()
  }
}
