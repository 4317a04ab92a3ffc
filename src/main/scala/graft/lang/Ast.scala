package graft.lang

/** MetricsQL AST — mirrors the node taxonomy of the reference's parser
  * (vendor/github.com/VictoriaMetrics/metricsql/parser.go:1734-2389) while
  * staying an independent Scala design. Four expression families dispatch
  * evaluation (app/vmselect/promql/eval.go:279-346): metric selectors,
  * rollups, function calls (transform/aggregate), and binary operators.
  */
sealed trait Expr

/** Numeric literal. Durations used in number position are seconds
  * (MetricsQL: `rate(m[5m]) > 1/5m`).
  */
final case class NumberExpr(value: Double) extends Expr

final case class StringExpr(value: String) extends Expr

/** One label filter: `label op "value"`. Ops: =, !=, =~, !~ — regexes are
  * fully anchored like the reference (lib/storage/tag_filters.go:160).
  * `label` == "__name__" selects the metric name.
  */
final case class LabelFilter(
    label: String,
    value: String,
    isNegative: Boolean,
    isRegexp: Boolean) {
  def matches(v: String): Boolean = {
    val ok =
      if (isRegexp) java.util.regex.Pattern.matches(value, v)
      else v == value
    ok != isNegative
  }
}

/** Metric selector `name{f1, f2 or f3, f4}` — a disjunction of conjunctions
  * of label filters (metricsql MetricExpr.LabelFilterss, parser.go:2389).
  * The metric name, when present, is folded into each conjunction as an
  * `__name__` equality filter.
  */
final case class MetricExpr(filterss: Seq[Seq[LabelFilter]]) extends Expr

object MetricExpr {
  def named(name: String, extra: Seq[LabelFilter] = Nil): MetricExpr =
    MetricExpr(Seq(LabelFilter("__name__", name, isNegative = false, isRegexp = false) +: extra))
}

/** Unresolved duration: raw text ("5m", "1h30m", "3i", "-5m", "300").
  * `i` units are step multiples, so resolution must happen at eval time
  * against the actual query step — the reference keeps DurationExpr as a
  * string for exactly this reason (metricsql parser.go:1734-1782,
  * Duration(step) resolution). Bare numbers are seconds.
  */
final case class Dur(text: String) {
  def ms(stepMs: Long): Long = Lexer.durationMs(text, stepMs)
}

/** `@` modifier target: a fixed epoch-seconds timestamp, or the query's
  * start()/end() (resolved at eval time). A dedicated ADT rather than
  * sentinel numbers: negative epoch timestamps are legitimate values.
  */
sealed trait AtSpec
final case class AtTimestamp(sec: Double) extends AtSpec
case object AtStart extends AtSpec
case object AtEnd extends AtSpec
/** `@` with a start()/end()-relative expression (`@ (end()-10m)`,
  * `@ end() offset 10m`) — resolved against the grid at eval time.
  */
final case class AtExpr(e: Expr) extends AtSpec

/** `expr[window:step] offset o @ at` — durations kept unresolved (see
  * [[Dur]]); None window means "inherit step" (auto-adjust,
  * rollup.go:738-756). Subquery when `step` is set. Offset may be negative.
  */
final case class RollupExpr(
    expr: Expr,
    window: Option[Dur],
    step: Option[Dur],
    offset: Option[Dur],
    at: Option[AtSpec],
    inheritStep: Boolean = false,
    keepMetricNames: Boolean = false) extends Expr

/** Function call — rollup or transform, decided by the function table at
  * eval time (same split as eval.go:295-331).
  */
final case class FuncExpr(
    name: String,
    args: Seq[Expr],
    keepMetricNames: Boolean = false) extends Expr

sealed trait AggrModifier
final case class By(labels: Seq[String]) extends AggrModifier
final case class Without(labels: Seq[String]) extends AggrModifier

/** Aggregate call `sum(...) by (a,b) limit N` (aggr.go:20-58; `limit`
  * extra per aggr.go:110 aggrFuncExt).
  */
final case class AggrFuncExpr(
    name: String,
    args: Seq[Expr],
    modifier: Option[AggrModifier],
    limit: Int = 0) extends Expr

sealed trait GroupModifier
final case class On(labels: Seq[String]) extends GroupModifier
final case class Ignoring(labels: Seq[String]) extends GroupModifier

/** group_left/group_right with extra-label list (`*` = copy ALL labels from
  * the single side, metricsql parser.go:1959 JoinModifier) and the optional
  * `prefix "p"` applied to copied label names (JoinModifierPrefix).
  */
sealed trait JoinModifier { def labels: Seq[String]; def prefix: Option[String] }
final case class GroupLeft(labels: Seq[String], prefix: Option[String] = None) extends JoinModifier
final case class GroupRight(labels: Seq[String], prefix: Option[String] = None) extends JoinModifier

/** Binary operator with vector-matching modifiers (binary_op.go:15-43,
  * matching rules binary_op.go:271-393). `fillLeft`/`fillRight` are the
  * MetricsQL `fill(N)`/`fill_left(N)`/`fill_right(N)` modifiers
  * (metricsql parser.go:520-556): when one side is NaN/absent at a point
  * (but not both), substitute the fill value on that side.
  */
final case class BinaryOpExpr(
    op: String,
    left: Expr,
    right: Expr,
    boolModifier: Boolean = false,
    groupModifier: Option[GroupModifier] = None,
    joinModifier: Option[JoinModifier] = None,
    keepMetricNames: Boolean = false,
    fillLeft: Option[Double] = None,
    fillRight: Option[Double] = None) extends Expr

/** `(e1, e2, …)` — union list; single-element parens are unwrapped at parse
  * time (parser.go:117 removeParensExpr).
  */
final case class ParensExpr(exprs: Seq[Expr]) extends Expr

/** `WITH (a = …, f(x) = …) body` — template bindings, expanded at parse
  * time (parser.go:742); never reaches the evaluator.
  */
final case class WithArg(name: String, params: Seq[String], body: Expr)

object BinaryOp {
  /** precedence table (higher binds tighter) + right-associativity of `^`;
    * mirrors metricsql/binary_op.go.
    */
  val priority: Map[String, Int] = Map(
    "^" -> 7,
    "*" -> 6, "/" -> 6, "%" -> 6, "atan2" -> 6,
    "+" -> 5, "-" -> 5,
    "==" -> 4, "!=" -> 4, "<" -> 4, ">" -> 4, "<=" -> 4, ">=" -> 4,
    "and" -> 3, "unless" -> 3,
    "or" -> 2,
    "if" -> 1, "ifnot" -> 1,
    "default" -> 0)

  val comparisons = Set("==", "!=", "<", ">", "<=", ">=")
  val setOps = Set("and", "or", "unless", "if", "ifnot", "default")
  def isRightAssociative(op: String): Boolean = op == "^"

  /** scalar kernel for arithmetic/comparison ops — the semantics of
    * metricsql/binaryop/funcs.go (comparisons here return the raw boolean;
    * filter-vs-bool handling lives in the evaluator).
    */
  def applyScalar(op: String, l: Double, r: Double): Double = op match {
    case "+" => l + r
    case "-" => l - r
    case "*" => l * r
    case "/" => l / r
    case "%" => l % r
    case "^" => math.pow(l, r)
    case "atan2" => math.atan2(l, r)
    case "==" => if (l == r) 1 else 0
    case "!=" => if (l != r) 1 else 0
    case ">" => if (l > r) 1 else 0
    case "<" => if (l < r) 1 else 0
    case ">=" => if (l >= r) 1 else 0
    case "<=" => if (l <= r) 1 else 0
    case "default" => if (l.isNaN) r else l
    case "if" => if (r.isNaN) Double.NaN else l
    case "ifnot" => if (r.isNaN) l else Double.NaN
    case _ => Double.NaN
  }
}
