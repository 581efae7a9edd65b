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
  *   - `a % b`    -> `PMOD(a, b)`  (numpy mod follows the divisor's
  *                   sign; PMOD matches it for the positive divisors
  *                   that occur in practice — plain SQL `%` follows the
  *                   dividend and disagrees on negatives)
  *   - `&`/`|`    -> `AND`/`OR` (vaex uses them as mask algebra)
  *   - `~a`       -> `NOT (a)`
  *   - `a ^ b`    -> `(a) != (b)` (boolean xor)
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
    "where" -> "if", "fabs" -> "abs", "absolute" -> "abs")

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

  private final class P(toks: Vector[Tok]) {
    var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def expectOp(s: String): Boolean = peek match {
      case Some(Op(`s`)) => pos += 1; true
      case _ => false
    }
    def fail(): Nothing = throw new IllegalArgumentException("parse error")

    def parseOr(): String = {
      var l = parseAnd()
      while (peek.exists { case Op("|") => true; case Ident(k) if k.equalsIgnoreCase("or") => true; case _ => false }) {
        next(); l = s"($l OR ${parseAnd()})"
      }
      l
    }
    def parseAnd(): String = {
      var l = parseNot()
      while (peek.exists { case Op("&") => true; case Ident(k) if k.equalsIgnoreCase("and") => true; case _ => false }) {
        next(); l = s"($l AND ${parseNot()})"
      }
      l
    }
    def parseNot(): String = peek match {
      case Some(Ident(k)) if k.equalsIgnoreCase("not") => next(); s"(NOT ${parseNot()})"
      case _ => parseCmp()
    }
    def parseCmp(): String = {
      var l = parseXor()
      var done = false
      while (!done) peek match {
        case Some(Op(o)) if Set("==", "!=", "<", "<=", ">", ">=").contains(o) =>
          next()
          val sql = if (o == "==") "=" else o
          l = s"($l $sql ${parseXor()})"
        case _ => done = true
      }
      l
    }
    def parseXor(): String = {
      var l = parseShift()
      while (peek.contains(Op("^"))) { next(); l = s"(($l) != (${parseShift()}))" }
      l
    }
    def parseShift(): String = {
      var l = parseAdd()
      var done = false
      while (!done) peek match {
        case Some(Op("<<")) => next(); l = s"SHIFTLEFT($l, ${parseAdd()})"
        case Some(Op(">>")) => next(); l = s"SHIFTRIGHT($l, ${parseAdd()})"
        case _ => done = true
      }
      l
    }
    def parseAdd(): String = {
      var l = parseMul()
      var done = false
      while (!done) peek match {
        case Some(Op("+")) => next(); l = s"($l + ${parseMul()})"
        case Some(Op("-")) => next(); l = s"($l - ${parseMul()})"
        case _ => done = true
      }
      l
    }
    def parseMul(): String = {
      var l = parseUnary()
      var done = false
      while (!done) peek match {
        case Some(Op("*")) => next(); l = s"($l * ${parseUnary()})"
        case Some(Op("/")) => next(); l = s"($l / ${parseUnary()})"
        case Some(Op("//")) => next(); l = s"FLOOR($l / ${parseUnary()})"
        case Some(Op("%")) => next(); l = s"PMOD($l, ${parseUnary()})"
        case _ => done = true
      }
      l
    }
    def parseUnary(): String = peek match {
      case Some(Op("-")) => next(); s"(- ${parseUnary()})"
      case Some(Op("+")) => next(); parseUnary()
      case Some(Op("~")) => next(); s"(NOT (${parseUnary()}))"
      case _ => parsePow()
    }
    // ** is right-associative and binds tighter than unary minus on its
    // left (Python: -x**2 == -(x**2), 2**-1 == 0.5)
    def parsePow(): String = {
      val base = parseAtom()
      if (expectOp("**")) s"POWER($base, ${parseUnary()})" else base
    }
    def parseAtom(): String = next() match {
      case Num(s) => s
      case Str(s) => "'" + s.replace("'", "''") + "'"
      case Ident(name) =>
        if (peek.contains(Op("("))) {
          next()
          val args = scala.collection.mutable.ArrayBuffer[String]()
          if (!peek.contains(Op(")"))) {
            args += parseOr()
            while (expectOp(",")) args += parseOr()
          }
          if (!expectOp(")")) fail()
          val fn = fnMap.getOrElse(name.toLowerCase, name)
          s"$fn(${args.mkString(", ")})"
        } else name
      case Op("(") =>
        val e = parseOr()
        if (!expectOp(")")) fail()
        s"($e)"
      case _ => fail()
    }
  }

  /** Some(sql) when `s` parses as a vaex/Python expression; None when
    * it doesn't (caller should treat the input as Spark SQL). */
  def translate(s: String): Option[String] =
    lex(s).flatMap { toks =>
      if (toks.isEmpty) None
      else try {
        val p = new P(toks)
        val sql = p.parseOr()
        if (p.pos == toks.length) Some(sql) else None
      } catch { case _: Exception => None }
    }
}
