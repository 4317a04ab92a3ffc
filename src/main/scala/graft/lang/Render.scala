package graft.lang

/** MetricsQL AST → query-text serializer (the reference's
  * `expr.AppendString`, metricsql binary_op.go/parser.go AppendString
  * methods), backing `/expand-with-exprs` and `/prettify-query`
  * (app/vmselect/prometheus/prometheus.go:74,90): the parser expands
  * WITH templates and folds constants, so rendering the parsed tree IS
  * the expanded query.
  *
  * Contract pinned by RenderSpec: `render ∘ parse` is a fixed point
  * (re-parsing the rendering yields the same rendering) across the
  * entire ported exec_test.go golden corpus — i.e. the output is always
  * valid MetricsQL denoting the same tree. Byte-for-byte AppendString
  * parity (modifier spacing etc.) is NOT claimed.
  */
object Render {

  def render(e: Expr): String = e match {
    case NumberExpr(v) => num(v)
    case StringExpr(s) => quote(s)
    case m: MetricExpr => metric(m)
    case r: RollupExpr => rollup(r)
    case FuncExpr(name, args, keep) =>
      s"$name(${args.map(render).mkString(", ")})" + (if (keep) " keep_metric_names" else "")
    case AggrFuncExpr(name, args, mod, limit) =>
      val m = mod match {
        case Some(By(ls)) => s" by (${ls.mkString(", ")})"
        case Some(Without(ls)) => s" without (${ls.mkString(", ")})"
        case None => ""
      }
      val lim = if (limit > 0) s" limit $limit" else ""
      s"$name(${args.map(render).mkString(", ")})$m$lim"
    case b: BinaryOpExpr => binop(b)
    case ParensExpr(es) => s"(${es.map(render).mkString(", ")})"
  }

  /** Go %g-style shortest representation; specials spelled the way the
    * lexer reads them back
    */
  private def num(v: Double): String =
    if (v.isNaN) "NaN"
    else if (v == Double.PositiveInfinity) "Inf"
    else if (v == Double.NegativeInfinity) "-Inf"
    else graft.graphite.GraphiteModel.goFmt(v)

  private def quote(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\x${c.toInt}%02x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  private def filter(f: LabelFilter): String = {
    val op =
      if (f.isRegexp) { if (f.isNegative) "!~" else "=~" }
      else { if (f.isNegative) "!=" else "=" }
    s"${f.label}$op${quote(f.value)}"
  }

  /** conjunction's leading plain-equality `__name__` filter, if any */
  private def nameOf(conj: Seq[LabelFilter]): Option[String] =
    conj.headOption.collect {
      case LabelFilter("__name__", v, false, false) => v
    }

  private def metric(m: MetricExpr): String = {
    val conjs = m.filterss
    if (conjs.isEmpty) return "{}"
    val names = conjs.map(nameOf)
    // common metric name across every conjunction → `name{...}` form
    val common = names.head.filter(n =>
      n.nonEmpty && names.forall(_.contains(n)) && isIdent(n))
    common match {
      case Some(n) =>
        val rests = conjs.map(_.tail)
        if (rests.forall(_.isEmpty)) n
        else n + rests.map(_.map(filter).mkString(", "))
          .mkString("{", " or ", "}")
      case None =>
        conjs.map(_.map(filter).mkString(", ")).mkString("{", " or ", "}")
    }
  }

  private def isIdent(s: String): Boolean =
    s.nonEmpty && s.forall(c =>
      c.isLetterOrDigit || c == '_' || c == ':' || c == '.') &&
      !s.head.isDigit

  private def inParens(e: Expr): String = e match {
    case _: BinaryOpExpr | _: RollupExpr => s"(${render(e)})"
    case _ => render(e)
  }

  private def rollup(r: RollupExpr): String = {
    val base = inParens(r.expr)
    val brackets =
      (r.window, r.step) match {
        case (Some(w), Some(s)) => s"[${w.text}:${s.text}]"
        case (Some(w), None) => if (r.inheritStep) s"[${w.text}:]" else s"[${w.text}]"
        case (None, Some(s)) => s"[:${s.text}]"
        case (None, None) => if (r.inheritStep) "[:]" else ""
      }
    val off = r.offset.map(d => s" offset ${d.text}").getOrElse("")
    val at = r.at.map {
      case AtTimestamp(sec) => s" @ ${num(sec)}"
      case AtStart => " @ start()"
      case AtEnd => " @ end()"
      case AtExpr(e) => s" @ (${render(e)})"
    }.getOrElse("")
    val keep = if (r.keepMetricNames) " keep_metric_names" else ""
    s"$base$brackets$off$at$keep"
  }

  private def binop(b: BinaryOpExpr): String = {
    val sb = new StringBuilder(inParens(b.left))
    sb.append(' ').append(b.op)
    if (b.boolModifier) sb.append(" bool")
    b.groupModifier.foreach {
      case On(ls) => sb.append(s" on (${ls.mkString(", ")})")
      case Ignoring(ls) => sb.append(s" ignoring (${ls.mkString(", ")})")
    }
    b.joinModifier.foreach { jm =>
      val kw = jm match {
        case _: GroupLeft => "group_left"
        case _: GroupRight => "group_right"
      }
      if (jm.labels.isEmpty) sb.append(s" $kw")
      else sb.append(s" $kw (${jm.labels.mkString(", ")})")
      jm.prefix.foreach(p => sb.append(s" prefix ${quote(p)}"))
    }
    (b.fillLeft, b.fillRight) match {
      case (Some(l), Some(rv)) if l == rv || (l.isNaN && rv.isNaN) =>
        sb.append(s" fill(${num(l)})")
      case (l, rv) =>
        l.foreach(v => sb.append(s" fill_left(${num(v)})"))
        rv.foreach(v => sb.append(s" fill_right(${num(v)})"))
    }
    sb.append(' ').append(inParens(b.right))
    // binop-level keep_metric_names needs the parenthesized form: a bare
    // trailing keyword re-parses onto the RIGHT operand (parsePostfix
    // consumes it before the binop loop resumes)
    if (b.keepMetricNames) s"(${sb.toString}) keep_metric_names"
    else sb.toString
  }
}
