package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: rewrites an inner join whose condition is
  * a pure RANGE predicate (no equality key spanning the sides) into
  * the binned equi-join of [[graft.operators.RangeJoin]] — so a user
  * writing plain `points.join(intervals, p >= s && p <= e)` (or the
  * SQL `ON d BETWEEN ws AND we`) gets a shuffled equi-join on bin
  * ordinals instead of the BroadcastNestedLoopJoin/CartesianProduct
  * Spark alone can plan for that shape.
  *
  * Opt-in by configuration, mirroring the hint-driven design of
  * engine range-join support (the right bin width is data knowledge
  * only the user has):
  *
  *   SET spark.graft.rangeJoin.binWidth = 16        -- enables the rule
  *   SET spark.graft.rangeJoin.maxBinsPerInterval = 4096   -- optional
  *
  * Fires only when ALL hold:
  *  - inner join — or a LEFT/RIGHT OUTER join whose PRESERVED side is
  *    the point side (the "attach the validity window, keep unmatched
  *    events" enrich; the reference's default join is left,
  *    core/join.py:135). Outer shapes preserving the INTERVAL side
  *    are left untouched: the rewrite explodes intervals, so an
  *    unmatched interval would null-extend once per covered bin;
  *  - the join has a condition and NO cross-side equality conjunct
  *    (if an equi key exists Spark already hash-joins; and the rewrite
  *    itself introduces one, which makes the rule a natural fixed
  *    point);
  *  - some conjunct pair bounds one side's expression `p` below by
  *    `s` and above by `e` from the other side (>=/> and <=/<; strict
  *    bounds bin the same — the exact predicate is kept); p/s/e must
  *    share a binnable family: numeric (binWidth in value units),
  *    timestamp/timestamp_ntz (binWidth in SECONDS — the SCD2 /
  *    validity-interval shape), or date (binWidth in DAYS);
  *  - binWidth is a positive long (a present-but-invalid value fails
  *    loudly rather than silently serving the quadratic plan).
  *
  * The rewrite: the point side gains a `__graft_rj_bin` projection;
  * the interval side filters `e >= s` (such rows cannot match, and
  * `sequence()` would reject a descending range), then explodes
  * `sequence(floor(s/W), floor(e/W))` — guarded by
  * maxBinsPerInterval with `raise_error`, so a mis-sized width fails
  * loudly instead of silently exploding the shuffle. The new join
  * carries bin equality AND the original condition; a final Project
  * restores the original output attributes, so parent operators are
  * untouched. Each candidate pair meets in exactly one bin (the
  * point's), so no dedup is needed. Semantics: NULL endpoints or
  * points satisfy no range predicate in the original plan and are
  * dropped by the bin machinery the same way.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val WidthKey = "spark.graft.rangeJoin.binWidth"
  private val MaxBinsKey = "spark.graft.rangeJoin.maxBinsPerInterval"
  private val BinName = "__graft_rj_bin"

  /** One recognized bound: the point expression and the other-side
    * endpoint. */
  private case class Bound(p: Expression, endpoint: Expression)

  /** Binnable families: 'n' numeric (binWidth in value units),
    * 't' timestamp/timestamp_ntz (binWidth in SECONDS), 'd' date
    * (binWidth in DAYS). The point and both endpoints must share a
    * family (the analyzer's comparison coercions normally guarantee
    * it). */
  private def family(e: Expression): Option[Char] = e.dataType match {
    case _: NumericType => Some('n')
    case TimestampType | TimestampNTZType => Some('t')
    case DateType => Some('d')
    case _ => None
  }

  /** A PRESENT-but-invalid conf value fails loudly (the user believes
    * the rewrite is active; silently serving the quadratic plan is the
    * exact hazard this module exists to prevent). An absent binWidth
    * simply disables the rule. */
  private def longConf(key: String, default: Option[Long]): Option[Long] = {
    val raw = conf.getConfString(key, "").trim
    if (raw.isEmpty) default
    else {
      val v = try raw.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$key must be a positive long, got '$raw'")
      }
      require(v >= 1, s"$key must be a positive long, got '$raw'")
      Some(v)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    longConf(WidthKey, None) match {
      case None => plan
      case Some(w) =>
        val maxBins = longConf(MaxBinsKey, Some(4096L)).get
        plan.transformUp {
          case j @ Join(left, right, jt @ (Inner | LeftOuter | RightOuter),
              Some(cond), hint) if eligible(j, cond) =>
            rewrite(j, left, right, jt, cond, hint, w, maxBins).getOrElse(j)
        }
    }

  private def eligible(j: Join, cond: Expression): Boolean = {
    val conjuncts = splitConjunctivePredicates(cond)
    // an existing cross-side equality means Spark already has an
    // equi-join (and marks our own rewritten joins, terminating the
    // fixed point)
    !conjuncts.exists {
      case EqualTo(a, b) => crossSide(j, a, b)
      case EqualNullSafe(a, b) => crossSide(j, a, b)
      case _ => false
    }
  }

  private def crossSide(j: Join, a: Expression, b: Expression): Boolean = {
    def side(e: Expression): Int =
      if (e.references.isEmpty) 0
      else if (e.references.subsetOf(j.left.outputSet)) 1
      else if (e.references.subsetOf(j.right.outputSet)) 2
      else 3
    val (sa, sb) = (side(a), side(b))
    (sa == 1 && sb == 2) || (sa == 2 && sb == 1)
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      joinType: JoinType, cond: Expression, hint: JoinHint,
                      w: Long, maxBins: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    def sideOf(e: Expression): Option[Boolean] = // Some(true)=left
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None

    // a cross-side bound where both halves are single-side binnable
    // expressions; returns (point, endpoint) canonicalized
    def bound(a: Expression, b: Expression): Option[(Bound, Boolean)] =
      (sideOf(a), sideOf(b)) match {
        case (Some(x), Some(y)) if x != y &&
            family(a).isDefined && family(b).isDefined =>
          Some((Bound(a, b), x))
        case _ => None
      }

    // lower bounds: p >= s / p > s / s <= p / s < p
    val lowers = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) => bound(a, b)
      case GreaterThan(a, b) => bound(a, b)
      case LessThanOrEqual(a, b) => bound(b, a)
      case LessThan(a, b) => bound(b, a)
      case _ => None
    }
    // upper bounds: p <= e / p < e / e >= p / e > p
    val uppers = conjuncts.flatMap {
      case LessThanOrEqual(a, b) => bound(a, b)
      case LessThan(a, b) => bound(a, b)
      case GreaterThanOrEqual(a, b) => bound(b, a)
      case GreaterThan(a, b) => bound(b, a)
      case _ => None
    }

    // Outer-join soundness: the rewrite explodes the INTERVAL side,
    // so it is exact only when the PRESERVED side is the point side —
    // matches still meet in exactly one bin, and an unmatched
    // preserved point null-extends exactly once. (Preserved-interval
    // shapes would null-extend once per covered bin; not rewritten.)
    def sound(pOnLeft: Boolean): Boolean = joinType match {
      case Inner => true
      case LeftOuter => pOnLeft
      case RightOuter => !pOnLeft
      case _ => false
    }

    val pair = (for {
      (lo, pOnLeft) <- lowers.iterator
      (hi, pOnLeft2) <- uppers.iterator
      if pOnLeft == pOnLeft2 && sound(pOnLeft) && lo.p.semanticEquals(hi.p) &&
        family(lo.p) == family(lo.endpoint) &&
        family(lo.p) == family(hi.endpoint)
    } yield (lo.p, lo.endpoint, hi.endpoint, pOnLeft)).nextOption()

    pair.map { case (p, s, e, pOnLeft) =>
      val fam = family(p).get
      // binWidth is in the column's natural unit: value units for
      // numerics, SECONDS for timestamps, DAYS for dates. Monotone
      // per-family normalization keeps the containment argument: all
      // three expressions shift/scale identically, so a point inside
      // [s, e] always lands in [binOf(s), binOf(e)].
      def binOf(x: Expression): Expression = {
        val (num, scale) = fam match {
          case 'n' => (x, w.toDouble)
          case 't' =>
            val ts = if (x.dataType == TimestampType) x else Cast(x, TimestampType)
            (UnixMicros(ts), w.toDouble * 1000000.0)
          case 'd' => (DateDiff(x, Literal(0, DateType)), w.toDouble)
        }
        // stamp the session zone on any tz-needing node in here (the
        // ntz->timestamp cast of the 't' family) — same requirement
        // as the Sequence below
        Cast(Floor(Divide(Cast(num, DoubleType), Literal(scale))), LongType)
          .transform {
            case tz: TimeZoneAwareExpression if tz.timeZoneId.isEmpty =>
              tz.withTimeZone(conf.sessionLocalTimeZone)
          }
      }

      val binAlias = Alias(binOf(p), BinName)()
      val pSide0 = if (pOnLeft) left else right
      val iSide0 = if (pOnLeft) right else left
      val pSide = Project(pSide0.output :+ binAlias, pSide0)

      val lo = binOf(s)
      val hi = binOf(e)
      val arrT = ArrayType(LongType, containsNull = false)
      val guarded = If(
        GreaterThanOrEqual(Subtract(hi, lo), Literal(maxBins)),
        Cast(new RaiseError(Concat(Seq(
          Literal(s"range join rewrite: interval covers more than $maxBins " +
            s"bins of width $w (adjust $WidthKey or $MaxBinsKey); start="),
          Cast(s, StringType), Literal(" end="), Cast(e, StringType)))), arrT),
        Cast(new Sequence(lo, hi, Literal(1L)), arrT))
      // Sequence (and some Casts) are TimeZoneAwareExpressions whose
      // `resolved` demands a zone — the analyzer normally stamps it,
      // but optimizer-built expressions must do it themselves
      val guardedTz = guarded.transform {
        case tz: TimeZoneAwareExpression if tz.timeZoneId.isEmpty =>
          tz.withTimeZone(conf.sessionLocalTimeZone)
      }
      val elemAttr = AttributeReference(BinName + "_i", LongType, nullable = false)()
      val iSide = Generate(Explode(guardedTz), Nil, outer = false, None,
        Seq(elemAttr), Filter(GreaterThanOrEqual(e, s), iSide0))

      val joinCond = And(EqualTo(binAlias.toAttribute, elemAttr), cond)
      val newJoin =
        if (pOnLeft) Join(pSide, iSide, joinType, Some(joinCond), hint)
        else Join(iSide, pSide, joinType, Some(joinCond), hint)
      Project(j.output, newJoin)
    }
  }
}
