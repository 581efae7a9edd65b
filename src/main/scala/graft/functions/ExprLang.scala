package graft.functions

/** Translator for vaex's Python-expression strings -> Spark SQL.
  *
  * The reference parses expression strings with a whitelisted Python
  * grammar (reference: packages/vaex-core/vaex/expresso.py:33-41 —
  * `**`, `//`, `%`, `&`, `|`, `^`, shifts, unary `~`, comparisons,
  * boolean ops), so vaex state files carry expressions like
  * `z = x**2 // 3` or `(x > 3) & (y < 2)` that Spark's SQL parser
  * rejects. This is a tiny recursive-descent parser over exactly that
  * operator set, emitting Spark SQL text:
  *
  *   - `a ** b`   -> `POWER(a, b)`
  *   - `a // b`   -> `FLOOR(a / b)`
  *   - `a % b`    -> `PMOD(a, b)` — Python/numpy mod takes the
  *                   DIVISOR's sign in every sign combination, and so
  *                   does PMOD; plain SQL `%` follows the dividend and
  *                   disagrees on negatives. A string valid in both
  *                   grammars therefore gets vaex's semantics (the API
  *                   being reproduced), not SQL's — deliberate.
  *   - `&`/`|`/`^`/`~` — numpy ops that are LOGICAL on boolean
  *                   operands and BITWISE on integers. Boolean-ness is
  *                   decided structurally (comparisons, and/or/not,
  *                   true/false, known predicate functions, caller-
  *                   supplied boolean column names); boolean operands
  *                   emit `AND`/`OR`/`!=`/`NOT`, anything else emits
  *                   Spark's bitwise `&`/`|`/`^`/`~` and Catalyst
  *                   types it. (Round-2 bug: integer `a ^ b` silently
  *                   became boolean `!=`.)
  *   - `<<`/`>>`  -> `SHIFTLEFT`/`SHIFTRIGHT`
  *   - `==`       -> `=`
  *   - numpy call names -> SQL names (arctan2 -> atan2, maximum ->
  *     greatest, where -> if, ...)
  *
  * `translate` returns None when the input is not a valid expression of
  * this grammar (e.g. it is already Spark SQL with CASE/CAST/IS NULL),
  * letting the caller fall back to the raw string.
  */
object ExprLang {

  private val fnMap = Map(
    "arccos" -> "acos", "arcsin" -> "asin", "arctan" -> "atan",
    "arctan2" -> "atan2", "arccosh" -> "acosh", "arcsinh" -> "asinh",
    "arctanh" -> "atanh", "maximum" -> "greatest", "minimum" -> "least",
    "where" -> "if", "fabs" -> "abs", "absolute" -> "abs",
    "deg2rad" -> "radians", "rad2deg" -> "degrees", "power" -> "pow")

  /** Functions known to return booleans (for the logical-vs-bitwise
    * dispatch of `&`/`|`/`^`/`~` when no comparison is in sight). */
  private val boolFns = Set(
    "isnan", "isnull", "isna", "ismissing", "isfinite", "isinf", "isnotnull",
    "notna", "startswith", "endswith", "contains", "rlike", "like", "if")

  // ------------------------------------------------------------ lexer

  private sealed trait Tok
  private case class Num(s: String) extends Tok
  private case class Str(s: String) extends Tok
  private case class Ident(s: String) extends Tok
  private case class Op(s: String) extends Tok

  private def lex(in: String): Option[Vector[Tok]] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = in.length
    while (i < n) {
      val c = in(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < n && in(i + 1).isDigit)) {
        val start = i
        while (i < n && (in(i).isDigit || in(i) == '.' || in(i) == 'e' || in(i) == 'E' ||
          ((in(i) == '+' || in(i) == '-') && i > start && (in(i - 1) == 'e' || in(i - 1) == 'E')))) i += 1
        out += Num(in.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (in(i).isLetterOrDigit || in(i) == '_')) i += 1
        out += Ident(in.substring(start, i))
      } else if (c == '\'' || c == '"') {
        val q = c; val start = i; i += 1
        while (i < n && in(i) != q) i += 1
        if (i >= n) return None // unterminated
        out += Str(in.substring(start + 1, i)); i += 1
      } else {
        val two = if (i + 1 < n) in.substring(i, i + 2) else ""
        if (Set("**", "//", "<<", ">>", "==", "!=", "<=", ">=").contains(two)) {
          out += Op(two); i += 2
        } else if ("+-*/%&|^~<>(),".indexOf(c) >= 0) {
          out += Op(c.toString); i += 1
        } else return None // not in the grammar (e.g. '=', ';', '[')
      }
    }
    Some(out.result())
  }

  // ----------------------------------------------------------- parser

  /** Emitted SQL + structural boolean-ness (drives &/|/^/~ dispatch). */
  private final case class R(sql: String, bool: Boolean)

  private final class P(toks: Vector[Tok], boolIdents: Set[String]) {
    var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def expectOp(s: String): Boolean = peek match {
      case Some(Op(`s`)) => pos += 1; true
      case _ => false
    }
    def fail(): Nothing = throw new IllegalArgumentException("parse error")

    def parseOr(): R = {
      var l = parseAnd()
      var done = false
      while (!done) peek match {
        case Some(Op("|")) =>
          next(); val r = parseAnd()
          l = if (l.bool || r.bool) R(s"(${l.sql} OR ${r.sql})", bool = true)
              else R(s"(${l.sql} | ${r.sql})", bool = false)
        case Some(Ident(k)) if k.equalsIgnoreCase("or") =>
          next(); l = R(s"(${l.sql} OR ${parseAnd().sql})", bool = true)
        case _ => done = true
      }
      l
    }
    def parseAnd(): R = {
      var l = parseNot()
      var done = false
      while (!done) peek match {
        case Some(Op("&")) =>
          next(); val r = parseNot()
          l = if (l.bool || r.bool) R(s"(${l.sql} AND ${r.sql})", bool = true)
              else R(s"(${l.sql} & ${r.sql})", bool = false)
        case Some(Ident(k)) if k.equalsIgnoreCase("and") =>
          next(); l = R(s"(${l.sql} AND ${parseNot().sql})", bool = true)
        case _ => done = true
      }
      l
    }
    def parseNot(): R = peek match {
      case Some(Ident(k)) if k.equalsIgnoreCase("not") =>
        next(); R(s"(NOT ${parseNot().sql})", bool = true)
      case _ => parseCmp()
    }
    def parseCmp(): R = {
      var l = parseXor()
      var done = false
      while (!done) peek match {
        case Some(Op(o)) if Set("==", "!=", "<", "<=", ">", ">=").contains(o) =>
          next()
          val sql = if (o == "==") "=" else o
          l = R(s"(${l.sql} $sql ${parseXor().sql})", bool = true)
        case _ => done = true
      }
      l
    }
    def parseXor(): R = {
      var l = parseShift()
      while (peek.contains(Op("^"))) {
        next(); val r = parseShift()
        l = if (l.bool || r.bool) R(s"((${l.sql}) != (${r.sql}))", bool = true)
            else R(s"(${l.sql} ^ ${r.sql})", bool = false)
      }
      l
    }
    def parseShift(): R = {
      var l = parseAdd()
      var done = false
      while (!done) peek match {
        case Some(Op("<<")) => next(); l = R(s"SHIFTLEFT(${l.sql}, ${parseAdd().sql})", bool = false)
        case Some(Op(">>")) => next(); l = R(s"SHIFTRIGHT(${l.sql}, ${parseAdd().sql})", bool = false)
        case _ => done = true
      }
      l
    }
    def parseAdd(): R = {
      var l = parseMul()
      var done = false
      while (!done) peek match {
        case Some(Op("+")) => next(); l = R(s"(${l.sql} + ${parseMul().sql})", bool = false)
        case Some(Op("-")) => next(); l = R(s"(${l.sql} - ${parseMul().sql})", bool = false)
        case _ => done = true
      }
      l
    }
    def parseMul(): R = {
      var l = parseUnary()
      var done = false
      while (!done) peek match {
        case Some(Op("*")) => next(); l = R(s"(${l.sql} * ${parseUnary().sql})", bool = false)
        case Some(Op("/")) => next(); l = R(s"(${l.sql} / ${parseUnary().sql})", bool = false)
        case Some(Op("//")) => next(); l = R(s"FLOOR(${l.sql} / ${parseUnary().sql})", bool = false)
        case Some(Op("%")) => next(); l = R(s"PMOD(${l.sql}, ${parseUnary().sql})", bool = false)
        case _ => done = true
      }
      l
    }
    def parseUnary(): R = peek match {
      case Some(Op("-")) => next(); val r = parseUnary(); R(s"(- ${r.sql})", bool = false)
      case Some(Op("+")) => next(); parseUnary()
      case Some(Op("~")) =>
        next(); val r = parseUnary()
        if (r.bool) R(s"(NOT (${r.sql}))", bool = true)
        else R(s"(~ ${r.sql})", bool = false)
      case _ => parsePow()
    }
    // ** is right-associative and binds tighter than unary minus on its
    // left (Python: -x**2 == -(x**2), 2**-1 == 0.5)
    def parsePow(): R = {
      val base = parseAtom()
      if (expectOp("**")) R(s"POWER(${base.sql}, ${parseUnary().sql})", bool = false) else base
    }
    def parseAtom(): R = next() match {
      case Num(s) => R(s, bool = false)
      case Str(s) => R("'" + s.replace("'", "''") + "'", bool = false)
      case Ident(name) =>
        if (peek.contains(Op("("))) {
          next()
          val args = scala.collection.mutable.ArrayBuffer[String]()
          if (!peek.contains(Op(")"))) {
            args += parseOr().sql
            while (expectOp(",")) args += parseOr().sql
          }
          if (!expectOp(")")) fail()
          // numpy clip(x, lo, hi) has no SQL builtin — compose it
          if (name.equalsIgnoreCase("clip") && args.length == 3)
            R(s"least(greatest(${args(0)}, ${args(1)}), ${args(2)})", bool = false)
          else {
            val fn = fnMap.getOrElse(name.toLowerCase, name)
            R(s"$fn(${args.mkString(", ")})", bool = boolFns.contains(fn.toLowerCase))
          }
        } else R(name, bool =
          name.equalsIgnoreCase("true") || name.equalsIgnoreCase("false") ||
            boolIdents.contains(name))
      case Op("(") =>
        val e = parseOr()
        if (!expectOp(")")) fail()
        R(s"(${e.sql})", e.bool)
      case _ => fail()
    }
  }

  /** Some(sql) when `s` parses as a vaex/Python expression; None when
    * it doesn't (caller should treat the input as Spark SQL).
    * `boolIdents`: column names known to be boolean-typed, so bare
    * boolean columns combined with `&`/`|`/`^`/`~` get logical ops. */
  def translate(s: String, boolIdents: Set[String] = Set.empty): Option[String] =
    lex(s).flatMap { toks =>
      if (toks.isEmpty) None
      else try {
        val p = new P(toks, boolIdents)
        val sql = p.parseOr()
        if (p.pos == toks.length) Some(sql.sql) else None
      } catch { case _: Exception => None }
    }
}
