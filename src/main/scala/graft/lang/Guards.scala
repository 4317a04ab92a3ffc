package graft.lang

/** Pre-execution query guardrails from the reference's exec entry point
  * (app/vmselect/promql/exec.go:20-62):
  *
  *  - `-search.treatDotsAsIsInRegexps` — escape literal dots in regexp
  *    label filters so `foo{bar=~"a.b.c"}` matches only the dotted name
  *    (exec.go:292 escapeDotsInRegexpLabelFilters, :310 escapeDots);
  *  - `-search.disableImplicitConversion` / `-search.logImplicitConversion`
  *    — reject/log queries that rely on implicit subquery conversions
  *    like `rate(sum(foo))` (metricsql/utils.go:79 IsLikelyInvalid);
  *  - `-search.maxResponseSeries` — cap the series count a /api/v1/query
  *    or /api/v1/query_range response may carry (exec.go:80; enforced in
  *    the HTTP facade where the response materializes).
  */
object Guards {

  /** exec.go:310 escapeDots: escape a dot unless already escaped or
    * followed by a regexp modifier (`*`, `+`, `{`).
    */
  def escapeDots(s: String): String = {
    if (!s.contains('.')) return s
    val b = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val modifierNext = i + 1 < s.length &&
        (s.charAt(i + 1) == '*' || s.charAt(i + 1) == '+' || s.charAt(i + 1) == '{')
      if (c == '.' && (i == 0 || s.charAt(i - 1) != '\\') && !modifierNext)
        b.append("\\.")
      else b.append(c)
      i += 1
    }
    b.toString
  }

  /** structure-preserving AST map over every MetricExpr */
  private def mapMetricExprs(e: Expr)(f: MetricExpr => MetricExpr): Expr = e match {
    case m: MetricExpr => f(m)
    case r: RollupExpr =>
      r.copy(expr = mapMetricExprs(r.expr)(f), at = r.at.map {
        case AtExpr(x) => AtExpr(mapMetricExprs(x)(f))
        case other => other
      })
    case fe: FuncExpr => fe.copy(args = fe.args.map(mapMetricExprs(_)(f)))
    case a: AggrFuncExpr => a.copy(args = a.args.map(mapMetricExprs(_)(f)))
    case b: BinaryOpExpr =>
      b.copy(left = mapMetricExprs(b.left)(f), right = mapMetricExprs(b.right)(f))
    case p: ParensExpr => p.copy(exprs = p.exprs.map(mapMetricExprs(_)(f)))
    case other => other
  }

  /** exec.go:292 — escape dots in every REGEXP label filter value */
  def escapeDotsInRegexpLabelFilters(e: Expr): Expr =
    mapMetricExprs(e) { m =>
      MetricExpr(m.filterss.map(_.map(lf =>
        if (lf.isRegexp) lf.copy(value = escapeDots(lf.value)) else lf)))
    }

  /** metricsql/rollup.go:102 GetRollupArgIdx — which argument of a rollup
    * function call is the series argument; -1 for non-rollup functions.
    */
  def rollupArgIdx(fe: FuncExpr): Int = {
    val n = fe.name.toLowerCase
    if (!Eval.isRollupFn(n)) -1
    else n match {
      case "quantile_over_time" | "aggr_over_time" | "count_values_over_time" |
          "hoeffding_bound_lower" | "hoeffding_bound_upper" => 1
      case "quantiles_over_time" => fe.args.length - 1
      case _ => 0
    }
  }

  private def visitAll(e: Expr)(f: Expr => Unit): Unit = {
    e match {
      case r: RollupExpr =>
        visitAll(r.expr)(f)
        r.at.foreach { case AtExpr(x) => visitAll(x)(f); case _ => }
      case fe: FuncExpr => fe.args.foreach(visitAll(_)(f))
      case a: AggrFuncExpr => a.args.foreach(visitAll(_)(f))
      case b: BinaryOpExpr => visitAll(b.left)(f); visitAll(b.right)(f)
      case p: ParensExpr => p.exprs.foreach(visitAll(_)(f))
      case _ =>
    }
    f(e)
  }

  /** metricsql/utils.go:79 IsLikelyInvalid: true when a rollup function's
    * series argument is neither a plain selector nor a windowed rollup —
    * i.e. the query relies on the implicit `default_rollup(arg[1i:1i])`
    * conversion, which surprises most of the time (`rate(sum(foo))`).
    * `timestamp` is exempt for Prometheus compatibility (issue 9527).
    */
  def isLikelyInvalid(e: Expr): Boolean = {
    var bad = false
    visitAll(e) {
      case fe: FuncExpr if !bad && fe.name.toLowerCase != "timestamp" =>
        val idx = rollupArgIdx(fe)
        if (idx >= 0 && idx < fe.args.length) {
          fe.args(idx) match {
            case re: RollupExpr =>
              re.expr match {
                case _: MetricExpr => // selector[window] / bare selector — fine
                case _ => if (re.window.isEmpty) bad = true
              }
            case _: MetricExpr => // bare selector — fine
            case _ => bad = true // implicit default_rollup(arg[1i:1i])
          }
        }
      case _ =>
    }
    bad
  }
}
