package graft.lang

import scala.collection.mutable

final class ParseError(msg: String, val pos: Int) extends RuntimeException(s"$msg (at $pos)")

/** MetricsQL recursive-descent parser with precedence climbing.
  *
  * Independent re-implementation of the grammar accepted by the reference
  * parser (vendor/github.com/VictoriaMetrics/metricsql/parser.go:15):
  * selectors with or-ed filter lists, rollup windows `[w:s]` + `offset` +
  * `@`, function calls, aggregates with by/without/limit, binary operators
  * with bool/on/ignoring/group_left/right modifiers, WITH templates
  * (expanded at parse time, parser.go:742), and parse-time constant
  * folding (parser.go:164).
  */
object Parser {
  import TokenKind._

  private val aggrFuncs: Set[String] = Set(
    "sum", "min", "max", "avg", "stddev", "stdvar", "count", "count_values",
    "bottomk", "topk", "quantile", "quantiles", "group", "median", "mad",
    "distinct", "limitk", "any", "mode", "share", "zscore", "geomean",
    "histogram", "outliers_iqr", "outliers_mad", "outliersk", "sum2",
    "topk_min", "topk_max", "topk_avg", "topk_last", "topk_median",
    "bottomk_min", "bottomk_max", "bottomk_avg", "bottomk_last", "bottomk_median")

  /** Reserved binary-op words — rejected as bare metric names, like the
    * reference (metricsql lexer.go isReservedBinaryOpIdent usage).
    */
  private val reservedOps: Set[String] =
    Set("and", "or", "unless", "if", "ifnot", "default", "atan2")

  def parse(input: String): Expr = {
    val p = new P(Lexer.tokenize(input), input)
    val e = p.parseExpr(0)
    p.expectEof()
    Folder.fold(e)
  }

  /** Default WITH templates every query sees, verbatim from the reference
    * (metricsql/parser.go:56 getDefaultWithArgExprs); alias/range_median
    * are native transforms here, so only ru/ttf need expansion. Bodies are
    * parsed once with defaults disabled (params appear as bare selectors,
    * substituted at call expansion like any WITH template).
    */
  private val defaultScope: Map[String, WithArg] = {
    def mk(name: String, params: Seq[String], src: String): (String, WithArg) = {
      val p = new P(Lexer.tokenize(src), src, useDefaults = false)
      val body = p.parseExpr(0)
      p.expectEof()
      name -> WithArg(name, params, body)
    }
    Map(
      mk("ru", Seq("freev", "maxv"),
        "clamp_min(maxv - clamp_min(freev, 0), 0) / clamp_min(maxv, 0) * 100"),
      mk("ttf", Seq("freev"),
        "smooth_exponential(" +
          "clamp_max(clamp_max(-freev, 0) / clamp_max(deriv_fast(freev), 0), 365*24*3600), " +
          "clamp_max(step()/300, 1))"))
  }

  /** Parser state: token cursor + WITH scopes (name → (params, body)).
    * Scopes are mutable maps so each WITH binding becomes visible while
    * parsing SUBSEQUENT bindings of the same list (parser.go:1193-1206
    * expandWithExprExt exposes all prior withArgExprs the same way).
    */
  private final class P(tokens: Vector[Token], input: String,
      useDefaults: Boolean = true) {
    private var pos = 0
    private val scopes = mutable.Stack[mutable.Map[String, WithArg]]()

    private def cur: Token = tokens(pos)
    private def peek: Token = tokens(math.min(pos + 1, tokens.size - 1))
    private def advance(): Token = { val t = cur; pos += 1; t }
    private def isKw(t: Token, kw: String): Boolean =
      t.kind == Ident && t.text.equalsIgnoreCase(kw)
    private def expectPunct(s: String): Unit = {
      if (cur.kind != Punct || cur.text != s)
        throw new ParseError(s"expected '$s' but got '${cur.text}'", cur.pos)
      pos += 1
    }
    private def lookup(name: String): Option[WithArg] =
      scopes.iterator.flatMap(_.get(name)).nextOption()
        .orElse(if (useDefaults) defaultScope.get(name) else None)

    def expectEof(): Unit =
      if (cur.kind != Eof) throw new ParseError(s"unexpected trailing '${cur.text}'", cur.pos)

    // ---- precedence climbing over binary ops ----
    def parseExpr(minPrec: Int): Expr = {
      var left = parseUnary()
      var continue = true
      while (continue) {
        val opTok = cur
        val opName: Option[String] =
          if (opTok.kind == Op && BinaryOp.priority.contains(opTok.text)) Some(opTok.text)
          else if (opTok.kind == Ident && BinaryOp.priority.contains(opTok.text.toLowerCase)
            && !isKw(opTok, "with")) Some(opTok.text.toLowerCase)
          else None
        opName match {
          case Some(op) if BinaryOp.priority(op) >= minPrec =>
            advance()
            var boolMod = false
            var groupMod: Option[GroupModifier] = None
            var joinMod: Option[JoinModifier] = None
            var keepNames = false
            // modifiers in any reference-allowed order: bool, then on/ignoring, then group_*
            if (isKw(cur, "bool")) { boolMod = true; advance() }
            if (isKw(cur, "on")) { advance(); groupMod = Some(On(parseLabelList())) }
            else if (isKw(cur, "ignoring")) { advance(); groupMod = Some(Ignoring(parseLabelList())) }
            if (isKw(cur, "group_left")) { advance(); joinMod = Some(GroupLeft(parseOptLabelList(), parseJoinPrefix())) }
            else if (isKw(cur, "group_right")) { advance(); joinMod = Some(GroupRight(parseOptLabelList(), parseJoinPrefix())) }
            // fill()/fill_left()/fill_right() function-form modifiers
            // (metricsql parser.go:520-556) — only when followed by `(`,
            // so a metric actually named fill_left still parses
            var fillL: Option[Double] = None
            var fillR: Option[Double] = None
            while ((isKw(cur, "fill") || isKw(cur, "fill_left") || isKw(cur, "fill_right")) &&
                peek.kind == Punct && peek.text == "(") {
              val which = advance().text.toLowerCase
              expectPunct("(")
              val neg = cur.kind == Op && cur.text == "-"
              if (neg) advance()
              val t = advance()
              val v0 = t.kind match {
                case Number => parseNumber(t.text)
                case Ident if t.text.equalsIgnoreCase("nan") => Double.NaN
                case Ident if t.text.equalsIgnoreCase("inf") => Double.PositiveInfinity
                case _ => throw new ParseError(s"cannot parse $which fill value '${t.text}'", t.pos)
              }
              val v = if (neg) -v0 else v0
              expectPunct(")")
              which match {
                case "fill" => fillL = Some(v); fillR = Some(v)
                case "fill_left" => fillL = Some(v)
                case "fill_right" => fillR = Some(v)
              }
            }
            val nextMin = if (BinaryOp.isRightAssociative(op)) BinaryOp.priority(op) else BinaryOp.priority(op) + 1
            val right = parseExpr(nextMin)
            if (isKw(cur, "keep_metric_names")) { keepNames = true; advance() }
            left = BinaryOpExpr(op, left, right, boolMod, groupMod, joinMod, keepNames, fillL, fillR)
          case _ => continue = false
        }
      }
      left
    }

    private def parseUnary(): Expr = {
      if (cur.kind == Op && cur.text == "-") {
        advance()
        // `^` binds tighter than unary minus (exec_test.go `-4^0.5` = -2,
        // not NaN), so the operand absorbs any power chain first
        val e = parseExpr(BinaryOp.priority("^"))
        e match {
          case NumberExpr(v) => NumberExpr(-v)
          case other => BinaryOpExpr("*", NumberExpr(-1), other)
        }
      } else if (cur.kind == Op && cur.text == "+") { advance(); parseUnary() }
      else parsePostfix(parsePrimary())
    }

    // rollup suffixes: [w], [w:s], offset d, @ t, keep_metric_names
    private def parsePostfix(e0: Expr): Expr = {
      val e = e0
      var window: Option[Dur] = None
      var step: Option[Dur] = None
      var offset: Option[Dur] = None
      var at: Option[AtSpec] = None
      var sawRollup = false
      var inherit = false
      var keepNames = false
      var continue = true
      while (continue) {
        if (cur.kind == Punct && cur.text == "[") {
          advance()
          sawRollup = true
          if (cur.kind == Punct && cur.text == ":") { inherit = true }
          else window = Some(parseDurationToken())
          if (cur.kind == Punct && cur.text == ":") {
            advance()
            if (!(cur.kind == Punct && cur.text == "]")) step = Some(parseDurationToken())
            else inherit = true
          }
          expectPunct("]")
        } else if (isKw(cur, "offset")) {
          advance(); sawRollup = true
          offset = Some(parseSignedDurationToken())
        } else if (cur.kind == Punct && cur.text == "@") {
          advance(); sawRollup = true
          at = Folder.fold(parseUnary()) match {
            case NumberExpr(v) => Some(AtTimestamp(v))
            case FuncExpr("start", Seq(), _) => Some(AtStart)
            case FuncExpr("end", Seq(), _) => Some(AtEnd)
            // start()/end()-relative expressions (`@ (end()-10m)`,
            // `@ end() offset 10m`) resolve against the grid at eval time
            case other => Some(AtExpr(other))
          }
        } else if (isKw(cur, "keep_metric_names")) {
          advance(); keepNames = true
        } else continue = false
      }
      if (sawRollup)
        RollupExpr(e, window, step, offset, at, inherit, keepNames)
      else if (keepNames) e match {
        // bare `keep_metric_names` on a call: attach to the call itself
        // instead of wrapping in a windowless rollup (which would change
        // evaluation to a default_rollup over the inner grid)
        case f: FuncExpr => f.copy(keepMetricNames = true)
        case b: BinaryOpExpr => b.copy(keepMetricNames = true)
        case other => RollupExpr(other, None, None, None, None, false, true)
      } else e
    }

    private def parseDurationToken(): Dur = {
      val t = advance()
      t.kind match {
        case Duration => Dur(t.text)
        case Number => Dur(t.text) // bare number = seconds
        case Ident =>
          lookup(t.text) match {
            case Some(WithArg(_, Seq(), NumberExpr(v))) => Dur(v.toString)
            case _ => throw new ParseError(s"expected duration, got '${t.text}'", t.pos)
          }
        case _ => throw new ParseError(s"expected duration, got '${t.text}'", t.pos)
      }
    }

    private def parseSignedDurationToken(): Dur = {
      if (cur.kind == Op && cur.text == "-") { advance(); Dur("-" + parseDurationToken().text) }
      else parseDurationToken()
    }

    private def parsePrimary(): Expr = {
      val t = cur
      t.kind match {
        case Number => advance(); NumberExpr(parseNumber(t.text))
        case Duration => advance(); NumberExpr(Lexer.durationMs(t.text, stepMsPlaceholder) / 1000.0)
        case Str => advance(); StringExpr(Lexer.unquote(t.text))
        case Punct if t.text == "(" => parseParens()
        case Punct if t.text == "{" => parseMetricExpr(None)
        case Ident if isKw(t, "with") => parseWith()
        case Ident =>
          val name = t.text
          val lower = name.toLowerCase
          if (lower == "inf") { advance(); NumberExpr(Double.PositiveInfinity) }
          else if (lower == "nan") { advance(); NumberExpr(Double.NaN) }
          else if (reservedOps.contains(lower)) // `and`, `or`, … are not metric names
            throw new ParseError(s"unexpected reserved word '$name'", t.pos)
          else {
            advance()
            if (cur.kind == Punct && cur.text == "(") {
              lookup(name) match {
                case Some(wa) if wa.params.nonEmpty => expandWithCall(wa, parseArgList())
                case _ =>
                  if (aggrFuncs.contains(lower)) parseAggr(lower)
                  else FuncExpr(lower, parseArgList())
              }
            } else if ((cur.kind == Ident && (isKw(cur, "by") || isKw(cur, "without"))) && aggrFuncs.contains(lower)) {
              // sum by (a) (expr) — modifier before args
              parseAggr(lower)
            } else if (cur.kind == Punct && cur.text == "{") {
              parseMetricExpr(Some(name))
            } else {
              lookup(name) match {
                case Some(WithArg(_, Seq(), body)) => body
                case Some(_) => throw new ParseError(s"WITH template '$name' needs arguments", t.pos)
                case None => MetricExpr.named(name)
              }
            }
          }
        case _ => throw new ParseError(s"unexpected token '${t.text}'", t.pos)
      }
    }

    /** comma-separated exprs up to ')'; trailing comma allowed, as in the
      * reference parser (exec_test.go multiline union literals end `,)`)
      */
    private def parseExprList(): Seq[Expr] = {
      expectPunct("(")
      val items = mutable.Buffer[Expr]()
      if (!(cur.kind == Punct && cur.text == ")")) {
        items += parseExpr(0)
        while (cur.kind == Punct && cur.text == ",") {
          advance()
          if (!(cur.kind == Punct && cur.text == ")")) items += parseExpr(0)
        }
      }
      expectPunct(")")
      items.toSeq
    }

    private def parseParens(): Expr = {
      val items = parseExprList()
      if (items.size == 1) items.head else ParensExpr(items)
    }

    private def parseArgList(): Seq[Expr] = parseExprList()

    private def parseAggr(name: String): Expr = {
      var modifier: Option[AggrModifier] = None
      var limit = 0
      def tryModifier(): Unit = {
        if (isKw(cur, "by")) { advance(); modifier = Some(By(parseLabelList())) }
        else if (isKw(cur, "without")) { advance(); modifier = Some(Without(parseLabelList())) }
      }
      tryModifier() // prefix form: sum by (a) (...)
      val args = parseArgList()
      if (modifier.isEmpty) tryModifier() // suffix form: sum(...) by (a)
      if (isKw(cur, "limit")) {
        advance()
        val lt = advance()
        if (lt.kind != Number) throw new ParseError("limit needs an integer", lt.pos)
        limit = parseNumber(lt.text).toInt
      }
      AggrFuncExpr(name, args, modifier, limit)
    }

    private def parseLabelList(): Seq[String] = {
      expectPunct("(")
      val items = mutable.Buffer[String]()
      if (!(cur.kind == Punct && cur.text == ")")) {
        items += expectIdentOrString()
        while (cur.kind == Punct && cur.text == ",") { advance(); items += expectIdentOrString() }
      }
      expectPunct(")")
      items.toSeq
    }

    /** group_left/group_right label list is optional; `(*)` copies every
      * label from the single side (metricsql parser.go:1959).
      */
    private def parseOptLabelList(): Seq[String] =
      if (cur.kind == Punct && cur.text == "(") {
        if (peek.kind == Op && peek.text == "*") {
          advance(); advance(); expectPunct(")"); Seq("*")
        } else parseLabelList()
      } else Nil

    /** optional `prefix "p"` after a group_left/right label list. */
    private def parseJoinPrefix(): Option[String] =
      if (isKw(cur, "prefix") && peek.kind == Str) {
        advance(); Some(Lexer.unquote(advance().text))
      } else None

    private def expectIdentOrString(): String = {
      val t = advance()
      t.kind match {
        case Ident => t.text
        case Str => Lexer.unquote(t.text)
        case _ => throw new ParseError(s"expected label name, got '${t.text}'", t.pos)
      }
    }

    /** `{f1, f2 or f3}` with optional metric name prefix; a WITH-bound
      * filter set referenced by bare ident merges into the conjunction.
      */
    private def parseMetricExpr(name: Option[String]): Expr = {
      expectPunct("{")
      val orGroups = mutable.Buffer[Seq[LabelFilter]]()
      var conj = mutable.Buffer[LabelFilter]()
      var continue = !(cur.kind == Punct && cur.text == "}")
      while (continue) {
        val strOp = cur.kind == Str && peek.kind == Op &&
          Set("=", "!=", "=~", "!~").contains(peek.text)
        if (cur.kind == Str && !strOp) {
          // {"metric name", ...}: quoted metric-name filter (UTF-8 names)
          val v = Lexer.unquote(advance().text)
          conj += LabelFilter("__name__", v, isNegative = false, isRegexp = false)
        } else {
          // a quoted string followed by a match op is a quoted LABEL NAME
          // ({"3👋tfにちは"="漢©®€£"}, the UTF-8 proposal)
          val label = expectIdentOrString()
          if (cur.kind == Op && Set("=", "!=", "=~", "!~").contains(cur.text)) {
            val op = advance().text
            val vTok = advance()
            if (vTok.kind != Str) throw new ParseError("label value must be a string", vTok.pos)
            val v = Lexer.unquote(vTok.text)
            conj += LabelFilter(label, v, op == "!=" || op == "!~", op == "=~" || op == "!~")
          } else {
            // bare ident inside {}: WITH filter-template reference
            lookup(label) match {
              case Some(WithArg(_, Seq(), MetricExpr(Seq(fs)))) => conj ++= fs
              case _ => throw new ParseError(s"unknown filter template '$label'", cur.pos)
            }
          }
        }
        if (cur.kind == Punct && cur.text == ",") { advance() }
        else if (isKw(cur, "or")) { advance(); orGroups += conj.toSeq; conj = mutable.Buffer() }
        else continue = false
      }
      expectPunct("}")
      orGroups += conj.toSeq
      val nameF = name.map(n => LabelFilter("__name__", n, isNegative = false, isRegexp = false))
      MetricExpr(orGroups.toSeq.map(g => nameF.toSeq ++ g))
    }

    // ---- WITH templates: scope is pushed BEFORE the binding loop so each
    // binding can reference earlier ones in the same list
    // (`WITH (a = 1, b = a * 2) b` — parser.go:1193-1206).
    private def parseWith(): Expr = {
      advance() // 'with'
      expectPunct("(")
      val bindings = mutable.Map[String, WithArg]()
      scopes.push(bindings)
      var continue = !(cur.kind == Punct && cur.text == ")")
      while (continue) {
        val nameTok = advance()
        if (nameTok.kind != Ident) throw new ParseError("WITH binding needs a name", nameTok.pos)
        if (bindings.contains(nameTok.text))
          throw new ParseError(s"duplicate WITH binding '${nameTok.text}'", nameTok.pos)
        val params: Seq[String] =
          if (cur.kind == Punct && cur.text == "(") parseLabelList() else Nil
        if (!(cur.kind == Op && cur.text == "=")) throw new ParseError("expected '=' in WITH", cur.pos)
        advance()
        // params shadow outer scope while parsing the body only for lookup
        // protection; actual substitution happens at call expansion
        val body = parseExpr(0)
        bindings(nameTok.text) = WithArg(nameTok.text, params, body)
        if (cur.kind == Punct && cur.text == ",") { advance(); continue = !(cur.kind == Punct && cur.text == ")") }
        else continue = false
      }
      expectPunct(")")
      val body = parseExpr(0)
      scopes.pop()
      body
    }

    /** Expand f(x,y)=body at call site: substitute param refs in body. */
    private def expandWithCall(wa: WithArg, args: Seq[Expr]): Expr = {
      if (args.size != wa.params.size)
        throw new ParseError(s"WITH template '${wa.name}' wants ${wa.params.size} args, got ${args.size}", cur.pos)
      val env = wa.params.zip(args).toMap
      Subst.substitute(wa.body, env)
    }

    private def parseNumber(text: String): Double = {
      val t = text.replace("_", "") // Go-style digit separators
      if (t.startsWith("0x") || t.startsWith("0X"))
        java.lang.Long.parseLong(t.substring(2), 16).toDouble
      else {
        // byte/metric multiplier suffixes (metricsql: 123M = 123e6,
        // 1.23Mib = 1.23·2^20, KB/MB/… decimal, Ki/KiB/… binary)
        val lower = t.toLowerCase
        val mults: Seq[(String, Double)] = Seq(
          "kib" -> 1024d, "mib" -> math.pow(2, 20), "gib" -> math.pow(2, 30),
          "tib" -> math.pow(2, 40), "ki" -> 1024d, "mi" -> math.pow(2, 20),
          "gi" -> math.pow(2, 30), "ti" -> math.pow(2, 40),
          "kb" -> 1e3, "mb" -> 1e6, "gb" -> 1e9, "tb" -> 1e12,
          "k" -> 1e3, "m" -> 1e6, "g" -> 1e9, "t" -> 1e12)
        mults.find { case (suf, _) =>
          lower.endsWith(suf) && lower.length > suf.length &&
            lower.charAt(lower.length - suf.length - 1).isDigit
        } match {
          case Some((suf, mult)) => t.dropRight(suf.length).toDouble * mult
          case None => t.toDouble
        }
      }
    }

    // `[5i]` steps can only resolve at eval; parse-time uses 1s placeholder
    // and the evaluator re-derives i-units from the raw text when needed.
    private val stepMsPlaceholder = 1000L
  }

  /** AST substitution for WITH param expansion. */
  private object Subst {
    def substitute(e: Expr, env: Map[String, Expr]): Expr = e match {
      case MetricExpr(Seq(Seq(LabelFilter("__name__", n, false, false)))) if env.contains(n) => env(n)
      case m: MetricExpr => m
      case RollupExpr(inner, w, s, o, a, i, k) => RollupExpr(substitute(inner, env), w, s, o, a, i, k)
      case FuncExpr(n, args, k) => FuncExpr(n, args.map(substitute(_, env)), k)
      case AggrFuncExpr(n, args, m, l) => AggrFuncExpr(n, args.map(substitute(_, env)), m, l)
      case BinaryOpExpr(op, l, r, b, g, j, k, fl, fr) =>
        BinaryOpExpr(op, substitute(l, env), substitute(r, env), b, g, j, k, fl, fr)
      case ParensExpr(es) => ParensExpr(es.map(substitute(_, env)))
      case other => other
    }
  }

  /** Parse-time constant folding (parser.go:164): numeric binary ops on two
    * literals, string concatenation, single-arg transform funcs of literals.
    */
  object Folder {
    def fold(e: Expr): Expr = e match {
      case BinaryOpExpr(op, l, r, boolMod, g, j, k, fl, fr) =>
        (fold(l), fold(r)) match {
          case (NumberExpr(a), NumberExpr(b)) if !BinaryOp.setOps.contains(op) || op == "default" || op == "if" || op == "ifnot" =>
            val v = BinaryOp.applyScalar(op, a, b)
            if (BinaryOp.comparisons.contains(op) && !boolMod)
              NumberExpr(if (v != 0) a else Double.NaN) // filter semantics on scalars
            else NumberExpr(v)
          case (StringExpr(a), StringExpr(b)) if op == "+" => StringExpr(a + b)
          case (l2, r2) => BinaryOpExpr(op, l2, r2, boolMod, g, j, k, fl, fr)
        }
      case RollupExpr(inner, w, s, o, a, i, k) => RollupExpr(fold(inner), w, s, o, a, i, k)
      case FuncExpr(n, args, k) => FuncExpr(n, args.map(fold), k)
      case AggrFuncExpr(n, args, m, l) => AggrFuncExpr(n, args.map(fold), m, l)
      case ParensExpr(es) =>
        val folded = es.map(fold)
        if (folded.size == 1) folded.head else ParensExpr(folded)
      case other => other
    }
  }
}
