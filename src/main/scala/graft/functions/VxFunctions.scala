package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function inventory mirroring the reference's registered
  * functions (reference: packages/vaex-core/vaex/functions.py, 2752 LoC)
  * as pure `Column` compositions — everything stays inside Catalyst
  * whole-stage codegen; no UDFs on the hot path.
  *
  * Null/NaN trichotomy (reference: core/functions.py:205-268,
  * SURVEY.md §1.2): vaex distinguishes float NaN, "missing"
  * (masked/Arrow null) and their union NA. Mapping here:
  * missing -> SQL null, NaN -> Double.NaN, NA -> isnull OR isnan.
  */
object VxFunctions {

  // ---------------------------------------------------------------- null/NaN
  /** reference: core/functions.py:205 `ismissing` (masked/null only). */
  def ismissing(c: Column): Column = c.isNull
  def notmissing(c: Column): Column = c.isNotNull
  /** reference: core/functions.py:238 `isnan` — true only for float NaN,
    * never for null (Spark's isnan(null) is null -> coalesce to false). */
  def isnan_(c: Column): Column = coalesce(isnan(c), lit(false))
  def notnan(c: Column): Column = !isnan_(c)
  /** reference: core/functions.py:262 `isna` = NaN OR missing. */
  def isna(c: Column): Column = c.isNull || isnan_(c)
  def notna(c: Column): Column = !isna(c)
  /** reference: core/functions.py:147 `fillmissing` — nulls only. */
  def fillmissing(c: Column, value: Column): Column = coalesce(c, value)
  /** reference: core/functions.py:163 `fillnan` — NaN only. */
  def fillnan(c: Column, value: Column): Column =
    when(isnan_(c), value).otherwise(c)
  /** reference: core/functions.py:181 `fillna` — NaN and missing. */
  def fillna(c: Column, value: Column): Column =
    when(isna(c), value).otherwise(c)

  /** reference: core/expression.py `map` — remap values through a
    * literal dictionary; unmapped values get `default` (null when not
    * given). Lowered to element_at on a map literal (broadcast as part
    * of the plan, codegen-friendly, no UDF) — at scale this beats a
    * join for small dictionaries exactly like vaex's in-memory mapper. */
  def mapValues[K: scala.reflect.runtime.universe.TypeTag,
                V: scala.reflect.runtime.universe.TypeTag](
      c: Column, mapping: Map[K, V], default: Column = lit(null)): Column = {
    require(mapping.nonEmpty, "mapValues: empty mapping")
    coalesce(element_at(typedLit(mapping), c), default)
  }

  // ---------------------------------------------------------------- math
  /** reference: core/functions.py math list (numpy passthrough :53-106).
    * Most are 1:1 Spark built-ins; only the gaps are defined here. */
  /** numpy.sinc(x) = sin(pi x)/(pi x), sinc(0)=1. */
  def sinc(c: Column): Column = {
    val px = c * lit(math.Pi)
    when(c === 0.0, lit(1.0)).otherwise(sin(px) / px)
  }
  /** numpy.clip. reference: core/functions.py (clip in math list). */
  def clip(c: Column, lo: Column, hi: Column): Column = least(greatest(c, lo), hi)
  /** numpy.digitize(x, bins) with increasing bins: index of the first
    * bin edge > x (right=False). Static edge list -> a codegen'd CASE
    * chain, no UDF. reference: core/functions.py (digitize). */
  def digitize(c: Column, edges: Seq[Double]): Column =
    edges.zipWithIndex.foldRight(lit(edges.length)) { case ((e, i), acc) =>
      when(c < e, lit(i)).otherwise(acc)
    }
  /** numpy.searchsorted(sorted, v, side='left'). */
  def searchsorted(edges: Seq[Double], c: Column): Column =
    edges.zipWithIndex.foldRight(lit(edges.length)) { case ((e, i), acc) =>
      when(c <= e, when(c === e, lit(i + 1)).otherwise(lit(i))).otherwise(acc)
    }
  /** numpy.where. reference: core/functions.py:2657. */
  def where_(cond: Column, ifTrue: Column, ifFalse: Column): Column =
    when(cond, ifTrue).otherwise(ifFalse)
  def deg2rad(c: Column): Column = radians(c)
  def rad2deg(c: Column): Column = degrees(c)
  def expm1_(c: Column): Column = expm1(c)
  def log1p_(c: Column): Column = log1p(c)
  def isfinite(c: Column): Column = !isna(c) && abs(c) =!= lit(Double.PositiveInfinity)
  def isinf(c: Column): Column = abs(c) === lit(Double.PositiveInfinity)

  // ---------------------------------------------------------------- strings
  // reference scope `str`, core/functions.py:963-2402. Arrow-kernel
  // semantics re-expressed over Spark's UTF8String built-ins.
  object str {
    def capitalize(c: Column): Column =
      concat(upper(substring(c, 1, 1)), lower(expr_substr_from(c, 2)))
    def cat(a: Column, b: Column): Column = concat(a, b)
    /** str.center: pad both sides to width (extra char on the right,
      * matching Python's str.center). */
    def center(c: Column, width: Int, fill: String = " "): Column = {
      val len = length(c)
      val leftTarget = (len + floor((lit(width) - len) / 2)).cast("int")
      when(len >= width, c).otherwise(rpad(lpad(c, leftTarget, lit(fill)), lit(width), lit(fill)))
    }
    def contains(c: Column, pat: String, regex: Boolean = false): Column =
      if (regex) c.rlike(pat) else c.contains(pat)
    /** count of non-overlapping occurrences of a literal pattern. */
    def count(c: Column, pat: String): Column =
      ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(pat), ""))) / pat.length).cast("long")
    def endswith(c: Column, s: String): Column = c.endsWith(s)
    def startswith(c: Column, s: String): Column = c.startsWith(s)
    /** Python str.find: 0-based, -1 when absent (Spark instr is 1-based, 0 absent). */
    def find(c: Column, sub: String): Column = instr(c, sub).cast("long") - 1
    /** str.get(i): one char at 0-based index; negative counts from the
      * end (Spark substring already supports negative positions). */
    def get(c: Column, i: Int): Column =
      if (i >= 0) substring(c, i + 1, 1) else substring(c, i, 1)
    def join(sep: String, c: Column): Column = array_join(c, sep)
    def len(c: Column): Column = length(c).cast("long")
    def byteLength(c: Column): Column = octet_length(c).cast("long")
    def ljust(c: Column, width: Int, fill: String = " "): Column =
      when(length(c) >= width, c).otherwise(rpad(c, width, fill))
    def rjust(c: Column, width: Int, fill: String = " "): Column =
      when(length(c) >= width, c).otherwise(lpad(c, width, fill))
    def lower(c: Column): Column = org.apache.spark.sql.functions.lower(c)
    def upper(c: Column): Column = org.apache.spark.sql.functions.upper(c)
    def lstrip(c: Column): Column = ltrim(c)
    def rstrip(c: Column): Column = rtrim(c)
    def strip(c: Column): Column = trim(c)
    def matchPattern(c: Column, pat: String): Column = c.rlike("^(?:" + pat + ")")
    def repeat(c: Column, n: Int): Column = org.apache.spark.sql.functions.repeat(c, n)
    def replace(c: Column, pat: String, repl: String, regex: Boolean = false): Column =
      if (regex) regexp_replace(c, pat, repl)
      else regexp_replace(c, java.util.regex.Pattern.quote(pat),
        java.util.regex.Matcher.quoteReplacement(repl))
    /** Python-style slice [start, stop) with 0-based indices. */
    def slice(c: Column, start: Int, stop: Int): Column =
      substring(c, start + 1, math.max(stop - start, 0))
    def split(c: Column, sep: String): Column =
      org.apache.spark.sql.functions.split(c, java.util.regex.Pattern.quote(sep))
    def extractRegex(c: Column, pat: String, group: Int = 1): Column =
      regexp_extract(c, pat, group)
    def title(c: Column): Column = initcap(c)
    /** str.zfill with Python sign handling: -12 -> -0012.
      * reference: core/functions.py:2157; flagged in SURVEY §4.2. */
    def zfill(c: Column, width: Int): Column = {
      val sign = when(c.startsWith("-") || c.startsWith("+"), substring(c, 1, 1)).otherwise(lit(""))
      val body = when(c.startsWith("-") || c.startsWith("+"), expr_substr_from(c, 2)).otherwise(c)
      when(length(c) >= width, c)
        .otherwise(concat(sign, lpad(body, lit(width) - length(sign), lit("0"))))
    }
    /** Python str.rfind: LAST occurrence, 0-based, -1 when absent
      * (reference: core/functions.py:1757). No native rinstr — search
      * the reversed pattern in the reversed string (pure codegen'd
      * builtins, no UDF). */
    def rfind(c: Column, sub: String): Column = {
      val revpos = locate(sub.reverse, org.apache.spark.sql.functions.reverse(c))
      when(revpos === 0, lit(-1L))
        .otherwise((length(c) - revpos + 1 - sub.length).cast("long"))
    }
    /** Python str.index: like find but errors when absent
      * (reference: core/functions.py:1376). */
    def index(c: Column, sub: String): Column =
      when(instr(c, sub) > 0, instr(c, sub).cast("long") - 1)
        .otherwise(raise_error(concat(lit(s"substring '$sub' not found in: "), c)))
        .cast("long")
    /** Python str.rindex (reference: core/functions.py:1793). */
    def rindex(c: Column, sub: String): Column =
      when(locate(sub.reverse, org.apache.spark.sql.functions.reverse(c)) > 0, rfind(c, sub))
        .otherwise(raise_error(concat(lit(s"substring '$sub' not found in: "), c)))
        .cast("long")
    /** Python str.rsplit(sep, maxsplit) (reference: core/functions.py:
      * 1943): split from the RIGHT, at most maxsplit splits. Same
      * reverse trick: split the reversed string with Spark's limit,
      * then un-reverse elements and order. */
    def rsplit(c: Column, sep: String, maxsplit: Int = -1): Column = {
      val rev = (x: Column) => org.apache.spark.sql.functions.reverse(x)
      if (maxsplit < 0) split(c, sep)
      else rev(transform(
        org.apache.spark.sql.functions.split(
          rev(c), java.util.regex.Pattern.quote(sep.reverse), maxsplit + 1),
        x => rev(x)))
    }
    def isalnum(c: Column): Column = c.rlike("^[\\p{L}\\p{N}]+$")
    def isalpha(c: Column): Column = c.rlike("^\\p{L}+$")
    def isdigit(c: Column): Column = c.rlike("^\\p{Nd}+$")
    def isspace(c: Column): Column = c.rlike("^\\s+$")
    def islower(c: Column): Column = c.rlike("^[^\\p{Lu}]*\\p{Ll}[^\\p{Lu}]*$")
    def isupper(c: Column): Column = c.rlike("^[^\\p{Ll}]*\\p{Lu}[^\\p{Ll}]*$")
    def istitle(c: Column): Column = c.rlike("^(?:\\p{Lu}\\p{Ll}*(?:[^\\p{L}]+|$))+$")
  }

  /** substring from 1-based position `pos` to end. */
  private def expr_substr_from(c: Column, pos: Int): Column =
    substring(c, pos, Int.MaxValue)

  // ---------------------------------------------------------------- datetime
  // reference scope `dt`, core/functions.py:302-808.
  object dt {
    def date(c: Column): Column = to_date(c)
    /** Monday=0 .. Sunday=6 (numpy/pandas convention) — Spark's
      * dayofweek is Sunday=1 (reference: core/functions.py:331,
      * shift flagged in SURVEY §4.2). */
    def dayofweek(c: Column): Column =
      ((org.apache.spark.sql.functions.dayofweek(c) + 5) % 7).cast("long")
    def dayofyear(c: Column): Column = org.apache.spark.sql.functions.dayofyear(c).cast("long")
    def isLeapYear(c: Column): Column = {
      val y = org.apache.spark.sql.functions.year(c)
      (y % 4 === 0) && ((y % 100 =!= 0) || (y % 400 === 0))
    }
    def year(c: Column): Column = org.apache.spark.sql.functions.year(c).cast("long")
    def month(c: Column): Column = org.apache.spark.sql.functions.month(c).cast("long")
    def monthName(c: Column): Column = date_format(c, "MMMM")
    def dayName(c: Column): Column = date_format(c, "EEEE")
    def quarter(c: Column): Column = org.apache.spark.sql.functions.quarter(c).cast("long")
    def halfyear(c: Column): Column = (((org.apache.spark.sql.functions.quarter(c) + 1) / 2)).cast("long")
    def day(c: Column): Column = dayofmonth(c).cast("long")
    /** ISO week number — Spark's weekofyear is already ISO 8601. */
    def weekofyear(c: Column): Column = org.apache.spark.sql.functions.weekofyear(c).cast("long")
    def hour(c: Column): Column = org.apache.spark.sql.functions.hour(c).cast("long")
    def minute(c: Column): Column = org.apache.spark.sql.functions.minute(c).cast("long")
    def second(c: Column): Column = org.apache.spark.sql.functions.second(c).cast("long")
    /** strftime -> date_format; caller supplies a Java pattern. */
    def strftime(c: Column, fmt: String): Column = date_format(c, fmt)
    /** dt.floor(freq) -> date_trunc. freq: "D","H","W","M","Y"... */
    def floor(c: Column, freq: String): Column = {
      val unit = freq.toUpperCase match {
        case "D" => "day"; case "H" => "hour"; case "T" | "MIN" => "minute"
        case "S" => "second"; case "W" => "week"; case "M" => "month"
        case "Q" => "quarter"; case "Y" | "A" => "year"; case other => other
      }
      date_trunc(unit, c)
    }
  }

  // ---------------------------------------------------------------- timedelta
  // reference scope `td`, core/functions.py:810-962. We standardize on
  // long microseconds between two timestamps (DayTimeIntervalType is
  // awkward across parquet/oracle boundaries).
  object td {
    /** microseconds between two timestamps (b - a); accepts NTZ. */
    def between(a: Column, b: Column): Column =
      unix_micros(b.cast("timestamp")) - unix_micros(a.cast("timestamp"))
    def days(micros: Column): Column = floor(micros / lit(86400000000L)).cast("long")
    def seconds(micros: Column): Column =
      floor((micros - days(micros) * lit(86400000000L)) / lit(1000000L)).cast("long")
    def microseconds(micros: Column): Column =
      (micros - floor(micros / lit(1000000L)) * lit(1000000L) ).cast("long")
    def nanoseconds(micros: Column): Column = microseconds(micros) * lit(1000L)
    def totalSeconds(micros: Column): Column = micros.cast("double") / lit(1e6)
  }

  // ---------------------------------------------------------------- arrays
  /** list_sum (reference: core/functions.py:110) — fold with a double
    * accumulator so float32 embeddings sum deterministically. */
  def listSum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x.cast("double"))

  /** Dot product of two equal-length float arrays
    * (reference: core/functions.py:2741 dot_product), via zip_with —
    * stays in codegen, no UDF. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity of two float arrays; 0 when either norm is 0. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dotProduct(a, b) / denom)
  }

  /** Symmetric int8 quantization scale (127/max|x|, 0 for a zero
    * vector) — the standard 4x embedding-storage compressor for
    * ANN at scale. Pure double Column math, identical FP ops in the
    * DuckDB oracle. */
  def int8Scale(e: Column): Column = {
    val m = array_max(transform(e, x => abs(x.cast("double"))))
    when(m === 0.0, lit(0.0)).otherwise(lit(127.0) / m)
  }

  /** Quantized codes floor(x·scale + 0.5) ∈ [-127, 127] (explicit
    * half-up rounding: ROUND() ties differ between engines; FLOOR
    * doesn't). Emitted as int for arithmetic safety; cast to tinyint
    * at the storage boundary. */
  def quantizeInt8(e: Column, scale: Column): Column =
    transform(e, x => floor(x.cast("double") * scale + lit(0.5)).cast("int"))

  /** Reconstruction x' = q/scale (zero vector stays zero). */
  def dequantizeInt8(q: Column, scale: Column): Column =
    when(scale === 0.0, transform(q, _ => lit(0.0)))
      .otherwise(transform(q, v => v.cast("double") / scale))

  // ---------------------------------------------------------------- mapping
  /** expr.map(mapper, default) (reference: core/expression.py:1298) as a
    * codegen'd CASE chain for small dictionaries; for large dictionaries
    * use a broadcast join instead. */
  def mapValues(c: Column, mapper: Map[Any, Any], default: Column): Column =
    mapper.foldLeft(default) { case (acc, (k, v)) =>
      when(c === lit(k), lit(v)).otherwise(acc)
    }
}
