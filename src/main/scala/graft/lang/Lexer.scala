package graft.lang

/** MetricsQL tokenizer. Token classes follow the reference lexer
  * (vendor/github.com/VictoriaMetrics/metricsql/lexer.go): identifiers may
  * contain `:` (recording-rule names) and `.` (graphite names); numbers
  * accept hex/inf/nan and duration suffixes (s, m, h, d, w, y, ms, i);
  * strings are single/double-quoted with Go escape rules (subset).
  */
final case class Token(kind: TokenKind, text: String, pos: Int)

sealed trait TokenKind
object TokenKind {
  case object Ident extends TokenKind
  case object Number extends TokenKind // plain numeric literal
  case object Duration extends TokenKind // number with duration unit, or `Ni`
  case object Str extends TokenKind
  case object Op extends TokenKind // + - * / % ^ == != =~ !~ < > <= >= =
  case object Punct extends TokenKind // ( ) { } [ ] , @ :
  case object Eof extends TokenKind
}

final class LexError(msg: String, val pos: Int) extends RuntimeException(s"$msg at position $pos")

object Lexer {
  import TokenKind._

  def tokenize(input: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = input.length
    def peek(k: Int = 0): Char = if (i + k < n) input.charAt(i + k) else '\u0000'

    while (i < n) {
      val c = input.charAt(i)
      if (c.isWhitespace) { i += 1 }
      else if (c == '#') { // comment to end of line
        while (i < n && input.charAt(i) != '\n') i += 1
      } else if (isIdentStart(c)) {
        val start = i
        while (i < n && isIdentPart(input.charAt(i))) i += 1
        out += Token(Ident, input.substring(start, i), start)
      } else if (c.isDigit || (c == '.' && peek(1).isDigit)) {
        val start = i
        i = scanNumberOrDuration(input, i)
        val text = input.substring(start, i)
        val kind = if (hasDurationSuffix(text)) Duration else Number
        out += Token(kind, text, start)
      } else if (c == '"' || c == '\'' || c == '`') {
        val start = i
        i = scanString(input, i)
        out += Token(Str, input.substring(start, i), start)
      } else {
        val start = i
        val two = if (i + 1 < n) input.substring(i, i + 2) else ""
        two match {
          case "==" | "!=" | "<=" | ">=" | "=~" | "!~" =>
            out += Token(Op, two, start); i += 2
          case _ =>
            c match {
              case '+' | '-' | '*' | '/' | '%' | '^' | '<' | '>' | '=' =>
                out += Token(Op, c.toString, start); i += 1
              case '(' | ')' | '{' | '}' | '[' | ']' | ',' | '@' | ':' =>
                out += Token(Punct, c.toString, start); i += 1
              case _ => throw new LexError(s"unexpected character '$c'", i)
            }
        }
      }
    }
    out += Token(Eof, "", n)
    out.result()
  }

  // ':' is allowed mid-identifier (recording-rule names like
  // job:foo:rate5m) but not as a start — a leading ':' is subquery
  // punctuation ([30m:1m]).
  private def isIdentStart(c: Char): Boolean =
    c.isLetter || c == '_'
  private def isIdentPart(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c == ':' || c == '.'

  /** number forms: 123, 1.5, .5, 1e-3, 0x1f, Inf, NaN (lexed as idents),
    * plus duration tails: 1h30m, 1.5d, 5m, 300ms, 2w, 1y, 3i.
    */
  private def scanNumberOrDuration(s: String, start: Int): Int = {
    var i = start
    val n = s.length
    if (s.charAt(i) == '0' && i + 1 < n && (s.charAt(i + 1) == 'x' || s.charAt(i + 1) == 'X')) {
      i += 2
      while (i < n && isHex(s.charAt(i))) i += 1
      return i
    }
    // Go-style underscore separators inside digit runs: 123_456_789
    def digits(): Unit =
      while (i < n && (s.charAt(i).isDigit ||
        (s.charAt(i) == '_' && i + 1 < n && s.charAt(i + 1).isDigit))) i += 1
    def scanDecimal(): Unit = {
      digits()
      if (i < n && s.charAt(i) == '.') {
        i += 1
        digits()
      }
      if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E') && i + 1 < n &&
        (s.charAt(i + 1).isDigit || ((s.charAt(i + 1) == '+' || s.charAt(i + 1) == '-') && i + 2 < n && s.charAt(i + 2).isDigit))) {
        i += 1
        if (s.charAt(i) == '+' || s.charAt(i) == '-') i += 1
        digits()
      }
    }
    scanDecimal()
    // byte/metric multiplier suffix (metricsql lexer.go:304 scanNumMultiplier):
    // Ki/KiB/KB/K/Mi/… — checked BEFORE duration tails so `1.23mib` is a
    // number; a bare lowercase `m`/`s` stays a duration (5m = 5 minutes)
    val rest = s.substring(i, math.min(n, i + 3)).toLowerCase
    val multi = Seq("kib", "mib", "gib", "tib", "kb", "ki", "mb", "mi", "gb", "gi", "tb", "ti")
      .find(m => rest.startsWith(m) &&
        (i + m.length >= n || !s.charAt(i + m.length).isLetterOrDigit))
    multi match {
      case Some(m) => return i + m.length
      case None =>
        // single-char multipliers: lowercase m/s stay duration units
        if (i < n && "kKMGTgt".contains(s.charAt(i)) &&
          (i + 1 >= n || !s.charAt(i + 1).isLetterOrDigit))
          return i + 1
    }
    // duration tail: one or more <num><unit> groups
    var more = true
    while (more && i < n && isDurationUnitStart(s.charAt(i))) {
      // consume unit (ms is two chars)
      if ((s.charAt(i) == 'm' || s.charAt(i) == 'M') && i + 1 < n &&
        (s.charAt(i + 1) == 's' || s.charAt(i + 1) == 'S')) i += 2
      else i += 1
      if (i < n && s.charAt(i).isDigit) scanDecimal() else more = false
    }
    i
  }

  private def isHex(c: Char): Boolean = c.isDigit || ('a' <= c && c <= 'f') || ('A' <= c && c <= 'F')
  /** duration units are case-insensitive in the reference (`1h23m5S`),
    * EXCEPT uppercase `M` which is the mega multiplier, not minutes.
    */
  private def isDurationUnitStart(c: Char): Boolean =
    "smhdwyiSHDWYI".indexOf(c.toInt) >= 0

  // multi-char multipliers only: a bare lowercase `m` stays minutes while
  // `mb`/`mib`/`Mi` are byte multipliers (metricsql lexer.go:304)
  private val multiplierRe = "(?i).*\\d(kib|kb|ki|mib|mb|mi|gib|gb|gi|tib|tb|ti)".r
  private def hasDurationSuffix(text: String): Boolean =
    text.exists(c => isDurationUnitStart(c)) &&
      !text.startsWith("0x") && !text.startsWith("0X") &&
      !multiplierRe.matches(text) // 1.23Mib is a number, not a duration

  private def scanString(s: String, start: Int): Int = {
    val quote = s.charAt(start)
    var i = start + 1
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\\' && quote != '`' && i + 1 < n) i += 2
      else if (c == quote) return i + 1
      else i += 1
    }
    throw new LexError("unterminated string", start)
  }

  /** Unquote a string literal (subset of Go escape rules). */
  def unquote(tok: String): String = {
    val quote = tok.charAt(0)
    val body = tok.substring(1, tok.length - 1)
    if (quote == '`') return body
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\\' && i + 1 < body.length) {
        body.charAt(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'r' => sb += '\r'; i += 2
          case '\\' => sb += '\\'; i += 2
          case '"' => sb += '"'; i += 2
          case '\'' => sb += '\''; i += 2
          case 'x' if i + 3 < body.length =>
            sb += Integer.parseInt(body.substring(i + 2, i + 4), 16).toChar; i += 4
          case other => sb += other; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Parse a duration literal to milliseconds; `i` units are step
    * multiples resolved against stepMs. Bare numbers are seconds
    * (metricsql PositiveDurationValue semantics).
    */
  def durationMs(text: String, stepMs: Long): Long = {
    val t = text.trim
    val neg = t.startsWith("-")
    val body = if (neg) t.substring(1) else t
    var i = 0
    var total = 0.0
    val n = body.length
    while (i < n) {
      val numStart = i
      while (i < n && (body.charAt(i).isDigit || body.charAt(i) == '.' ||
        body.charAt(i) == 'e' || body.charAt(i) == 'E' ||
        ((body.charAt(i) == '+' || body.charAt(i) == '-') && i > numStart &&
          (body.charAt(i - 1) == 'e' || body.charAt(i - 1) == 'E')))) i += 1
      val num = body.substring(numStart, i).toDouble
      if (i >= n) { total += num * 1000 } // bare number = seconds
      else {
        val unit = // units are case-insensitive (`1h23m5S`)
          if ((body.charAt(i) == 'm' || body.charAt(i) == 'M') && i + 1 < n &&
            (body.charAt(i + 1) == 's' || body.charAt(i + 1) == 'S')) { i += 2; "ms" }
          else { val u = body.charAt(i).toLower.toString; i += 1; u }
        total += (unit match {
          case "ms" => num
          case "s" => num * 1000
          case "m" => num * 60000
          case "h" => num * 3600000
          case "d" => num * 86400000
          case "w" => num * 7 * 86400000
          case "y" => num * 365 * 86400000
          case "i" => num * stepMs
          case u => throw new LexError(s"unknown duration unit '$u'", 0)
        })
      }
    }
    val ms = math.round(total)
    if (neg) -ms else ms
  }

  // ---- flag-value scanning shared by `{selector}:duration` style flags
  // (-downsampling.period, -retentionFilter). Both need QUOTE-AWARE
  // scanning: a selector like {path=~"a{1}:.*"} carries braces, colons
  // and commas inside quoted label values.

  /** split on top-level commas: commas inside `{...}` or inside
    * double-quoted strings don't split; braces inside quotes don't nest
    */
  private[graft] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) {
        cur += c
        if (c == '\\' && i + 1 < s.length) { cur += s.charAt(i + 1); i += 1 }
        else if (c == '"') inQ = false
      } else c match {
        case '"' => inQ = true; cur += c
        case '{' => depth += 1; cur += c
        case '}' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.result(); cur.clear()
        case other => cur += other
      }
      i += 1
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** index of the `}` closing a LEADING `{selector}` (quote-aware), or -1
    * if the string doesn't start with `{` / the braces don't balance
    */
  private[graft] def selectorEnd(s: String): Int = {
    if (s.isEmpty || s.head != '{') return -1
    var depth = 0
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) {
        if (c == '\\') i += 1
        else if (c == '"') inQ = false
      } else c match {
        case '"' => inQ = true
        case '{' => depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) return i
        case _ => ()
      }
      i += 1
    }
    -1
  }
}
