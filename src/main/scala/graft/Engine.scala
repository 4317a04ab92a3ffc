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
}
