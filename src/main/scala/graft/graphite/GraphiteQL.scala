package graft.graphite

/** Graphite render-API target expression language.
  *
  * Grammar per the reference's graphiteql package
  * (app/vmselect/graphiteql/{lexer,parser}.go): a target is a metric
  * path expression (with `*` / `{a,b}` / `[x-z]` globs and `\`-escapes),
  * a function call with positional and `name=value` args, or a chained
  * pipe call `expr|func(args)`. Literals: single/double-quoted strings,
  * numbers (decimal, 0x/0o/0b/0NNN integers), True/False, None.
  * Function names are case-sensitive; bools and None are not.
  */
object GraphiteQL {

  sealed trait Expr { def render: String }

  final case class MetricExpr(query: String) extends Expr {
    def render: String = escapeIdent(query)
  }
  final case class FuncExpr(name: String, args: Seq[Arg], chained: Boolean = false)
      extends Expr {
    def render: String =
      if (chained && args.nonEmpty) {
        val tail =
          if (args.size > 1) args.tail.map(_.render).mkString("(", ",", ")") else ""
        s"${args.head.render}|${escapeIdent(name)}$tail"
      } else s"${escapeIdent(name)}(${args.map(_.render).mkString(",")})"
  }
  final case class StringExpr(s: String) extends Expr {
    def render: String =
      "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
  }
  final case class NumberExpr(n: Double) extends Expr {
    def render: String =
      if (n == n.toLong.toDouble && math.abs(n) < 1e15) n.toLong.toString
      else n.toString
  }
  final case class BoolExpr(b: Boolean) extends Expr {
    def render: String = if (b) "True" else "False"
  }
  case object NoneExpr extends Expr { def render: String = "None" }

  /** function arg, optionally named (`name=expr`) */
  final case class Arg(name: String, expr: Expr) {
    def render: String =
      if (name.nonEmpty) s"${escapeIdent(name)}=${expr.render}" else expr.render
  }

  final case class ParseException(msg: String) extends Exception(msg)

  def parse(target: String): Expr = {
    val lex = new Lexer(target)
    lex.next()
    val e = parseExpr(lex)
    if (lex.token.nonEmpty)
      throw ParseException(s"unexpected tail after parsing ${e.render}: '${lex.context}'")
    e
  }

  // ---- parser ------------------------------------------------------

  private def parseExpr(lex: Lexer): Expr = {
    val t = lex.token
    var e: Expr =
      if (isPositiveNumberPrefix(t) || t == "+" || t == "-") parseNumber(lex)
      else if (t.nonEmpty && (t(0) == '"' || t(0) == '\'')) parseString(lex)
      else if (isIdentPrefix(t)) parseMetricOrCall(lex)
      else throw ParseException(s"unexpected token '$t'")
    while (lex.token == "|") e = parseChained(lex, Arg("", e))
    e
  }

  private def parseNumber(lex: Lexer): NumberExpr = {
    var t = lex.token
    var minus = false
    if (t == "-" || t == "+") { minus = t == "-"; lex.next(); t = lex.token }
    val n =
      if (t.startsWith("0x") || t.startsWith("0X"))
        java.lang.Long.parseLong(t.drop(2), 16).toDouble
      else if (t.startsWith("0o") || t.startsWith("0O"))
        java.lang.Long.parseLong(t.drop(2), 8).toDouble
      else if (t.startsWith("0b") || t.startsWith("0B"))
        java.lang.Long.parseLong(t.drop(2), 2).toDouble
      else if (t.length > 1 && t(0) == '0' && t.forall(_.isDigit))
        java.lang.Long.parseLong(t, 8).toDouble
      else
        try t.toDouble
        catch { case _: NumberFormatException => throw ParseException(s"cannot parse number '$t'") }
    lex.next()
    NumberExpr(if (minus) -n else n)
  }

  private def parseString(lex: Lexer): StringExpr = {
    val t = lex.token
    if (t.length < 2 || t(0) != t.last)
      throw ParseException(s"string literal contains unexpected trailing char: '$t'")
    val q = t(0).toString
    val s = t.substring(1, t.length - 1).replace("\\" + q, q).replace("\\\\", "\\")
    lex.next()
    StringExpr(s)
  }

  private def parseMetricOrCall(lex: Lexer): Expr = {
    val ident = unescapeIdent(lex.token)
    lex.next()
    if (lex.token == "(") {
      FuncExpr(ident, parseArgs(lex))
    } else if (ident.equalsIgnoreCase("true") || ident.equalsIgnoreCase("false")) {
      BoolExpr(ident.equalsIgnoreCase("true"))
    } else if (ident.equalsIgnoreCase("none")) {
      NoneExpr
    } else MetricExpr(ident)
  }

  private def parseChained(lex: Lexer, firstArg: Arg): FuncExpr = {
    var first = firstArg
    while (true) {
      lex.next() // past '|'
      if (!isIdentPrefix(lex.token))
        throw ParseException(s"expecting function name after '|', got '${lex.token}'")
      val fname = unescapeIdent(lex.token)
      lex.next()
      val args =
        if (lex.token != "(") Seq(first)
        else first +: parseArgs(lex)
      val fe = FuncExpr(fname, args, chained = true)
      if (lex.token != "|") return fe
      first = Arg("", fe)
    }
    sys.error("unreachable")
  }

  private def parseArgs(lex: Lexer): Seq[Arg] = {
    val args = Seq.newBuilder[Arg]
    var done = false
    while (!done) {
      lex.next()
      if (lex.token == ")") { lex.next(); return args.result() }
      val e = parseExpr(lex)
      if (lex.token == "=") {
        val argName = e match {
          case MetricExpr(q) => q
          case other => throw ParseException(s"expecting a name for named expression; got ${other.render}")
        }
        lex.next()
        args += Arg(argName, parseExpr(lex))
      } else args += Arg("", e)
      lex.token match {
        case "," => // continue
        case ")" => lex.next(); done = true
        case other => throw ParseException(s"unexpected token in func args: '$other'")
      }
    }
    args.result()
  }

  // ---- lexer -------------------------------------------------------

  /** tokenizer with the reference's exact char classes
    * (graphiteql/lexer.go): idents may contain letters, digits,
    * `-_$:*{[`, dot-separated path groups, `[..]` / `{..}` spans, and
    * `\`-escapes; strings are `'`/`"`-quoted with backslash escapes.
    */
  private final class Lexer(s: String) {
    var token: String = ""
    private var tail: String = s
    def context: String = token + tail

    def next(): Unit = {
      var t = tail
      var i = 0
      while (i < t.length && t(i).isWhitespace) i += 1
      t = t.substring(i)
      tail = t
      if (t.isEmpty) { token = ""; return }
      val tok = t(0) match {
        case '(' | ')' | ',' | '|' | '=' | '+' | '-' => t.substring(0, 1)
        case '"' | '\'' => scanString(t)
        case c if c.isDigit || (c == '.' && t.length > 1 && t(1).isDigit) =>
          scanNumber(t)
        case _ => scanIdent(t)
      }
      token = tok
      tail = t.substring(tok.length)
    }

    private def scanString(t: String): String = {
      val quote = t(0)
      var i = 1
      while (true) {
        val n = t.indexOf(quote, i)
        if (n < 0) throw ParseException(s"cannot find closing quote for $t")
        var bs = 0
        while (bs < n && t(n - bs - 1) == '\\') bs += 1
        if (bs % 2 == 0) return t.substring(0, n + 1)
        i = n + 1
      }
      sys.error("unreachable")
    }

    private def scanNumber(t: String): String = {
      var i = 0
      // special integer prefixes: 0x hex, 0o/0b, 0NNN octal
      if (t(0) == '0' && t.length > 1) {
        val c1 = t(1).toLower
        if (c1 == 'x') {
          i = 2
          while (i < t.length && isHex(t(i))) i += 1
          if (i == 2) throw ParseException("number cannot be empty")
          return t.substring(0, i)
        } else if (c1 == 'o' || c1 == 'b') i = 2
        else if (t(1).isDigit) i = 1
      }
      while (i < t.length && t(i).isDigit) i += 1
      if (i >= t.length || (t(i) != '.' && t(i) != 'e' && t(i) != 'E'))
        return t.substring(0, i)
      if (t(i) == '.') {
        i += 1
        val j = i
        while (i < t.length && t(i).isDigit) i += 1
        if (i == j) throw ParseException(s"missing fractional part in '$t'")
        if (i == t.length) return t
      }
      if (i >= t.length || (t(i) != 'e' && t(i) != 'E')) return t.substring(0, i)
      i += 1
      if (i < t.length && (t(i) == '-' || t(i) == '+')) i += 1
      val j = i
      while (i < t.length && t(i).isDigit) i += 1
      if (i == j) throw ParseException(s"missing exponent part in '$t'")
      t.substring(0, i)
    }

    private def scanIdent(t: String): String = {
      var i = 0
      var done = false
      while (i < t.length && !done) {
        t(i) match {
          case '\\' =>
            i += 2
            if (i > t.length) throw ParseException(s"missing escaped char in the end of '$t'")
          case '[' =>
            val n = t.indexOf(']', i + 1)
            if (n < 0) throw ParseException(s"missing ']' char in '$t'")
            i = n + 1
          case '{' =>
            val n = t.indexOf('}', i + 1)
            if (n < 0) throw ParseException(s"missing '}' char in '$t'")
            i = n + 1
          case '*' | '.' => i += 1
          case c if isIdentChar(c) => i += 1
          case _ => done = true
        }
      }
      if (i == 0) throw ParseException(s"cannot find a single ident char in '$t'")
      t.substring(0, i)
    }
  }

  private def isHex(c: Char): Boolean =
    c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def isIdentChar(c: Char): Boolean =
    c.isLetterOrDigit && c < 128 || c == '-' || c == '_' || c == '$' || c == ':' ||
      c == '*' || c == '{' || c == '['

  private def isFirstIdentChar(c: Char): Boolean = isIdentChar(c) && !c.isDigit

  private def isIdentPrefix(t: String): Boolean =
    t.nonEmpty && (t(0) == '\\' || isFirstIdentChar(t(0)))

  private def isPositiveNumberPrefix(t: String): Boolean =
    t.nonEmpty && (t(0).isDigit || (t(0) == '.' && t.length > 1 && t(1).isDigit))

  /** strip backslash escapes; `\xNN` decodes a hex byte (lexer.go:220) */
  def unescapeIdent(s: String): String = {
    if (!s.contains('\\')) return s
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        if (s(i + 1) == 'x' && i + 3 < s.length && isHex(s(i + 2)) && isHex(s(i + 3))) {
          sb.append(Integer.parseInt(s.substring(i + 2, i + 4), 16).toChar)
          i += 4
        } else { sb.append(s(i + 1)); i += 2 }
      } else { sb.append(s(i)); i += 1 }
    }
    sb.toString
  }

  /** inverse of unescapeIdent for rendering (lexer.go:282) */
  def escapeIdent(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s(i)
      val isMetricChar = ".*[]{},".indexOf(c.toInt) >= 0
      if (isIdentChar(c) || isMetricChar) {
        if (i == 0 && !isFirstIdentChar(c) && !isMetricChar) sb.append(f"\\x${c.toInt}%02x")
        else sb.append(c)
      } else if (c >= 0x20 && c < 0x7f) sb.append('\\').append(c)
      else sb.append(f"\\x${c.toInt}%02x")
      i += 1
    }
    sb.toString
  }

  /** graphite glob → anchored regex, the storage-side matching rules
    * (lib/storage/index_db.go:1167 getRegexpForGraphiteQuery):
    * `*` → `[^.]*`, `{a,b}` → `(?:a|b)`, `[x-z]` → char class, all else
    * quoted.
    */
  def globToRegex(q: String): String = "^" + globPart(q) + "$"

  private def globPart(q: String): String = {
    val sb = new StringBuilder
    var s = q
    while (s.nonEmpty) {
      s(0) match {
        case '*' => sb.append("[^.]*"); s = s.substring(1)
        case '{' =>
          val n = s.indexOf('}')
          val body = if (n < 0) s.substring(1) else s.substring(1, n)
          sb.append(body.split(",", -1).map(globPart).mkString("(?:", "|", ")"))
          s = if (n < 0) "" else s.substring(n + 1)
        case '[' =>
          val n = s.indexOf(']')
          if (n < 0) { sb.append(java.util.regex.Pattern.quote(s)); s = "" }
          else { sb.append(s.substring(0, n + 1)); s = s.substring(n + 1) }
        case _ =>
          val n = s.indexWhere(c => "*{[".indexOf(c.toInt) >= 0)
          val lit = if (n < 0) s else s.substring(0, n)
          sb.append(java.util.regex.Pattern.quote(lit))
          s = if (n < 0) "" else s.substring(n)
      }
    }
    sb.toString
  }

  /** parse a graphite interval string like `1min`, `-1.5h`, `30s`, `1mon`
    * into millis (render_api.go:208 parseInterval)
    */
  def parseInterval(s0: String): Long = {
    val s = s0.trim
    var i = 0
    while (i < s.length && (s(i) == '-' || s(i) == '+' || s(i) == '.' || s(i).isDigit)) i += 1
    val prefix = s.substring(0, i)
    val suffix = s.substring(i).trim
    val n =
      try prefix.toDouble
      catch { case _: NumberFormatException => throw ParseException(s"cannot parse interval '$s0'") }
    if (suffix.isEmpty)
      throw ParseException(s"missing suffix for interval '$s0'; expecting s, min, h, d, w, mon or y")
    val m: Double =
      if (suffix.startsWith("ms")) 1
      else if (suffix.startsWith("s")) 1000
      else if (suffix.startsWith("mi") || (suffix.startsWith("m") && !suffix.startsWith("mo"))) 60 * 1000
      else if (suffix.startsWith("h")) 3600 * 1000
      else if (suffix.startsWith("d")) 24 * 3600 * 1000
      else if (suffix.startsWith("w")) 7 * 24 * 3600 * 1000
      else if (suffix.startsWith("mo")) 30L * 24 * 3600 * 1000
      else if (suffix.startsWith("y")) 365L * 24 * 3600 * 1000
      else throw ParseException(s"unsupported interval '$s0'")
    (n * m).toLong
  }
}
