package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType}

/** Optimizer rule rewriting a NAIVE interval-containment join into the
  * bucketed equi-join shape of [[graft.operators.RangeJoin]] — the one
  * place in this engine where a custom Catalyst `Rule` genuinely buys
  * what the DataFrame API cannot: a user who writes the textbook
  *
  * {{{ points.join(intervals, $"p" >= $"s" && $"p" <= $"e") }}}
  *
  * gets BroadcastNestedLoopJoin from Spark (there is no inequality
  * join strategy), i.e. O(|points|·|intervals|) comparisons and a
  * whole-side broadcast — the classic 100 TB scale-killer. The
  * operator method solves it for callers who know to use it; this
  * rule fixes the PLANS OF QUERIES THE USER ALREADY WROTE, which no
  * library function can reach. SURVEY.md §4's stance ("no custom Rule
  * REQUIRED for reference parity") stands — this is an optimization
  * of user-written plans, not a parity need.
  *
  * Fires on: `Join(Inner)` whose condition's conjuncts contain a
  * cross-side containment pair `lo ≤ p ∧ p ≤ hi` (any comparison
  * orientation; strict `<` also accepted — the residual keeps the
  * original strictness) where `p` is an integral-typed deterministic
  * expression over ONE side and `lo`/`hi` are integral expressions
  * over the OTHER side, and the condition has NO cross-side equality
  * conjunct (an equi key would already hash-join fine — rewriting
  * would only add replication; this also makes the rule a fixpoint:
  * its own output contains a bucket equality and never re-fires).
  *
  * Rewrite (exactly [[graft.operators.RangeJoin.joinPointsInIntervals]]'s
  * math, so semantics inherit that operator's oracled pins): the point
  * side projects `floorDiv(p, W)`; the interval side filters
  * `lo ≤ hi` (Sequence COUNTS DOWN on inverted bounds — the repo
  * lesson) then generates one row per overlapped bucket via
  * `explode(sequence(floorDiv(lo, W), floorDiv(hi, W)))`; the new join
  * is an EQUI join on the bucket with the ORIGINAL condition as the
  * residual; a final Project restores the original output attributes.
  * Each matched pair emits exactly once (a point lies in exactly one
  * bucket). `W` = `spark.graft.rangeJoin.bucketWidth` (default 1000
  * position units).
  *
  * Registered via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or per-session
  * with `spark.experimental.extraOptimizations`; disable with
  * `spark.graft.rangeJoin.enabled=false`.
  *
  * The interval-OVERLAP pattern (`ls ≤ re ∧ rs ≤ le`) is rewritten
  * ONLY behind the opt-in
  * `spark.graft.rangeJoin.assumeWellFormedIntervals` (default false):
  * the bucketed overlap rewrite
  * ([[graft.operators.RangeJoin.joinOverlappingIntervals]]'s shape —
  * both sides replicate to their overlapped buckets, equi join on the
  * bucket, each pair emitted exactly once in its canonical
  * max-start bucket) requires real intervals — it drops
  * `end < start` rows — while the naive condition matches some
  * INVERTED rows too (ls=5, le=3 against rs=2, re=6 satisfies both
  * conjuncts). A rule can't assume the user's columns are well-formed
  * intervals, so by default it leaves the plan alone and the operator
  * method (whose contract states interval semantics) is the surface;
  * a user who flips the conf asserts the invariant and buys the
  * rewrite for queries already written as naive conditions.
  * Inner joins only: an outer/semi preserved side is REPLICATED here
  * (unlike the containment rewrite's point side), so non-matching
  * rows would null-extend/emit once per replica. */
object ContainmentJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val EnabledKey = "spark.graft.rangeJoin.enabled"
  private val WidthKey = "spark.graft.rangeJoin.bucketWidth"
  private val WellFormedKey =
    "spark.graft.rangeJoin.assumeWellFormedIntervals"

  /** Axis types the bucket math is EXACT for: integrals, plus
    * timestamps — `Cast(timestamp, long)` (seconds) is a MONOTONE
    * mapping applied identically to the point and both bounds, which
    * is all bucket coverage needs (p ∈ [lo, hi] ⇒ sec(p) ∈ [sec(lo),
    * sec(hi)] ⇒ the point's bucket is among the interval's generated
    * buckets); the residual keeps the original sub-second comparison
    * exact. `bucketWidth` is in the axis's long-cast units — SECONDS
    * for timestamp axes. TIMESTAMP_NTZ has NO direct long cast in
    * Spark 4 (`Cast.castToLong` has no NTZ arm — a post-analysis
    * injected cast dies in a MatchError at execution, the round-11
    * ADVICE crash), so NTZ routes through [[toLongAxis]]'s two-step
    * NTZ→TIMESTAMP(UTC)→long chain instead: with the zone pinned to
    * UTC the wall-clock micros ARE the instant micros, making the
    * mapping the same micros-to-seconds floor as TimestampType —
    * monotone, deterministic, DST-free. Fractional types stay
    * excluded (their cast rounds toward zero, breaking the tiling for
    * negatives, and a double axis has no exact bucket anyway). */
  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case org.apache.spark.sql.types.TimestampType => true
    case org.apache.spark.sql.types.TimestampNTZType => true
    case _ => false
  }

  /** The monotone axis-to-long mapping shared by the point projection,
    * the interval bucket generator, and the non-empty filter — every
    * bucket comparison must go through the SAME mapping or tiling
    * breaks. NTZ cannot cast straight to long (see [[integral]]); the
    * explicit UTC zone on the intermediate cast is REQUIRED because
    * this rule runs post-analysis where ResolveTimeZone never fires —
    * a zone-less Cast would NPE on evaluation. */
  private def toLongAxis(e: Expression): Expression = e.dataType match {
    case LongType => e
    case org.apache.spark.sql.types.TimestampNTZType =>
      Cast(Cast(e, org.apache.spark.sql.types.TimestampType, Some("UTC")),
        LongType)
    case _ => Cast(e, LongType)
  }

  /** Floor division tiling negative positions correctly, in PURE LONG
    * arithmetic (the analyzer's coercions don't run in the optimizer,
    * and overflow must be impossible for every long input): truncate
    * toward zero, then step down when the remainder is negative.
    * Unlike a `(x - pmod(x, w)) / w` form this cannot overflow even at
    * Long.MinValue (pmod's non-negative remainder would push MinValue
    * below the long range and throw under ANSI — review catch):
    * |q·w| ≤ |x| and the q−1 step only fires when r < 0, which needs
    * w ≥ 2 and keeps q − 1 in range. Both rewritten sides use this
    * same expression, so buckets agree by construction. */
  private def floorDiv(x: Expression, w: Long): Expression = {
    val xl = toLongAxis(x)
    val wl = Literal(w, LongType)
    val q = IntegralDivide(xl, wl)
    val r = Subtract(xl, Multiply(q, wl))
    If(LessThan(r, Literal(0L, LongType)),
      Subtract(q, Literal(1L, LongType)), q)
  }

  /** Interpretations of one inequality conjunct as a cross-side bound:
    * `a ≤ b` is BOTH "a lower-bounds point b" and "b upper-bounds
    * point a" — the caller pairs a lower and an upper on the same
    * point expression. Only single-sided, integral, deterministic
    * operands on OPPOSITE sides qualify. Each entry is
    * (pointExpr, boundExpr, isLower). */
  private def boundsOf(c: Expression, left: LogicalPlan,
      right: LogicalPlan): Seq[(Expression, Expression, Boolean)] = {
    def singleSided(e: Expression): Boolean = {
      val refs = e.references
      refs.nonEmpty && (refs.subsetOf(left.outputSet) ||
        refs.subsetOf(right.outputSet))
    }
    def oppositeSides(a: Expression, b: Expression): Boolean =
      a.references.subsetOf(left.outputSet) !=
        b.references.subsetOf(left.outputSet)
    def le(lo: Expression, hi: Expression)
        : Seq[(Expression, Expression, Boolean)] =
      if (singleSided(lo) && singleSided(hi) && oppositeSides(lo, hi) &&
          integral(lo) && integral(hi) &&
          lo.deterministic && hi.deterministic)
        Seq((hi, lo, true), (lo, hi, false)) // lo bounds point hi; hi bounds point lo
      else Nil
    c match {
      case LessThanOrEqual(a, b) => le(a, b)
      case LessThan(a, b) => le(a, b)
      case GreaterThanOrEqual(a, b) => le(b, a)
      case GreaterThan(a, b) => le(b, a)
      case _ => Nil
    }
  }

  private def hasCrossEquality(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        val (ra, rb) = (a.references, b.references)
        (ra.nonEmpty && rb.nonEmpty &&
          ((ra.subsetOf(left.outputSet) && rb.subsetOf(right.outputSet)) ||
           (ra.subsetOf(right.outputSet) && rb.subsetOf(left.outputSet))))
      case EqualNullSafe(a, b) =>
        val (ra, rb) = (a.references, b.references)
        (ra.nonEmpty && rb.nonEmpty &&
          ((ra.subsetOf(left.outputSet) && rb.subsetOf(right.outputSet)) ||
           (ra.subsetOf(right.outputSet) && rb.subsetOf(left.outputSet))))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val conf = SQLConf.get
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    val width = conf.getConfString(WidthKey, "1000").toLong
    if (width <= 0) return plan

    plan.transformUp {
      case j @ Join(left, right, jt, Some(cond), hint)
          if (jt match {
            case Inner | LeftOuter | RightOuter | LeftSemi | LeftAnti => true
            case _ => false
          }) && !hasCrossEquality(splitConjunctivePredicates(cond),
            left, right) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val bounds = conjuncts.flatMap(c => boundsOf(c, left, right))
        // A containment pair: a lower and an upper bound on the SAME
        // point expression (semanticEquals across the two conjuncts).
        // Each bound's operands are single-sided on opposite sides, so
        // lo and hi automatically live opposite the shared point.
        // Multiplicity safety beyond Inner: the POINT side keeps one
        // row per input row (one bucket each) while the interval side
        // is REPLICATED per bucket, so the rewrite is only valid when
        // the preserved / per-row-deduplicated side is the point side:
        //  - LeftOuter / LeftSemi / LeftAnti need the point on the
        //    LEFT (a replicated preserved side would null-extend or
        //    semi-emit once PER REPLICA, and the empty-interval filter
        //    would delete rows an anti join must keep);
        //  - RightOuter needs the point on the RIGHT (symmetric).
        // The orientation predicate filters INSIDE the search (review
        // catch): a condition can hold pairs in both orientations, and
        // taking the first pair before filtering would reject a join
        // whose OTHER pair is a legal rewrite.
        def orientationOk(p: Expression): Boolean = {
          val pOnLeft = p.references.subsetOf(left.outputSet)
          jt match {
            case Inner => true
            case LeftOuter | LeftSemi | LeftAnti => pOnLeft
            case RightOuter => !pOnLeft
            case _ => false
          }
        }
        val pair = (for {
          (p1, lo, isLo) <- bounds if isLo
          (p2, hi, isLo2) <- bounds if !isLo2
          if p1.semanticEquals(p2)
          if orientationOk(p1)
        } yield (p1, lo, hi)).headOption

        // Fan-out guard (review catch): the rule applies to ARBITRARY
        // user data, and an open-ended interval (a Long.MaxValue
        // sentinel, epoch-micros at a too-fine width) would make
        // Sequence build millions of replicas or exceed Spark's array
        // cap. A silent cap would drop matches, so the guard fails
        // LOUDLY per offending row with an actionable message instead.
        // The guard compare runs in DOUBLE: a long subtraction could
        // itself overflow for full-range sentinel bounds (the exact
        // case the guard exists for); ±1-bucket double imprecision is
        // irrelevant against a threshold. The bound is ≥ because the
        // replica COUNT is hiB−loB+1: a span of exactly maxBuckets+1
        // buckets has hiB−loB = maxBuckets and must fail too, matching
        // the "more than maxBuckets" message (the round-11 ADVICE
        // off-by-one).
        val maxBuckets = conf.getConfString(
          "spark.graft.rangeJoin.maxBuckets", "1048576").toLong
        val msg = s"graft ContainmentJoinRule: an interval spans " +
          s"more than $maxBuckets buckets at bucketWidth=$width; " +
          "raise spark.graft.rangeJoin.bucketWidth or " +
          ".maxBuckets, or set spark.graft.rangeJoin.enabled=false"
        // One interval side bucketed: drop empty intervals (Sequence
        // COUNTS DOWN on inverted bounds — the repo lesson), guard the
        // span, explode one row per overlapped bucket.
        def bucketed(child: LogicalPlan, lo: Expression, hi: Expression,
            attrName: String): (LogicalPlan, AttributeReference) = {
          val nonEmpty = Filter(LessThanOrEqual(
            toLongAxis(lo), toLongAxis(hi)), child)
          val loB = floorDiv(lo, width)
          val hiB = floorDiv(hi, width)
          val seq0 = Sequence(loB, hiB, None,
            Option(conf.sessionLocalTimeZone))
          val seq = If(
            GreaterThanOrEqual(
              Subtract(Cast(hiB, DoubleType), Cast(loB, DoubleType)),
              Literal(maxBuckets.toDouble, DoubleType)),
            Cast(new RaiseError(Literal.create(msg,
              org.apache.spark.sql.types.StringType)), seq0.dataType),
            seq0)
          val attr = AttributeReference(attrName, LongType,
            nullable = false)()
          (Generate(Explode(seq), unrequiredChildIndex = Nil,
            outer = false, qualifier = None,
            generatorOutput = Seq(attr), child = nonEmpty), attr)
        }

        pair match {
          case Some((p, lo, hi)) =>
            val pOnLeft = p.references.subsetOf(left.outputSet)
            val (pointPlan, intervalPlan) =
              if (pOnLeft) (left, right) else (right, left)
            // point side: project the bucket
            val pBkt = Alias(floorDiv(p, width), "__graft_pbkt")()
            val pointProj = Project(pointPlan.output :+ pBkt, pointPlan)
            val (gen, iBktAttr) =
              bucketed(intervalPlan, lo, hi, "__graft_ibkt")
            val (newL, newR) =
              if (pOnLeft) (pointProj, gen) else (gen, pointProj)
            val newCond = And(EqualTo(pBkt.toAttribute, iBktAttr), cond)
            Project(j.output, Join(newL, newR, jt, Some(newCond), hint))
          case None if jt == Inner && conf.getConfString(
              WellFormedKey, "false").toBoolean =>
            // Interval-OVERLAP rewrite, OPT-IN (see the object
            // scaladoc): find two conjuncts with opposite cross-side
            // orientations — `ls ≤ re` (left expr ≤ right expr) and
            // `rs ≤ le` (right expr ≤ left expr). Both sides
            // replicate to their buckets; each matched pair is
            // emitted ONLY in its canonical max-start bucket (the
            // op_interval_overlap exactly-once trick — that bucket
            // lies in both spans whenever the intervals overlap), so
            // no downstream dedup is needed. Inverted rows
            // (end < start) are DROPPED by the non-empty filter —
            // the divergence the conf's name makes the user assert
            // away.
            val ineqs: Seq[(Expression, Expression, Boolean)] =
              conjuncts.flatMap { c =>
                def tag(a: Expression, b: Expression)
                    : Option[(Expression, Expression, Boolean)] = {
                  val ok = a.references.nonEmpty && b.references.nonEmpty &&
                    integral(a) && integral(b) &&
                    a.deterministic && b.deterministic
                  if (!ok) None
                  else if (a.references.subsetOf(left.outputSet) &&
                      b.references.subsetOf(right.outputSet))
                    Some((a, b, true)) // leftExpr ≤ rightExpr
                  else if (a.references.subsetOf(right.outputSet) &&
                      b.references.subsetOf(left.outputSet))
                    Some((b, a, false)) // rightExpr ≤ leftExpr
                  else None
                }
                c match {
                  case LessThanOrEqual(a, b) => tag(a, b)
                  case LessThan(a, b) => tag(a, b)
                  case GreaterThanOrEqual(a, b) => tag(b, a)
                  case GreaterThan(a, b) => tag(b, a)
                  case _ => None
                }
              }
            // Pairing safety (round-12 ADVICE): with MORE than one
            // inequality per orientation (a 2D box intersection:
            // l.xlo≤r.xhi ∧ r.xlo≤l.xhi ∧ l.ylo≤r.yhi ∧ r.ylo≤l.yhi)
            // a first-match pairing can couple the x low-bound with
            // the y high-bound; the derived [ls,le]/[rs,re] intervals
            // then mix axes, the non-empty filter compares bounds of
            // unrelated axes, and genuinely matching rows drop — wrong
            // results even on well-formed intervals. The condition
            // gives no way to know which bounds form an axis, so the
            // rewrite fires ONLY when the pairing is unambiguous:
            // exactly one cross-side inequality of each orientation.
            val ov = (ineqs.filter(_._3), ineqs.filterNot(_._3)) match {
              case (Seq((ls, re, _)), Seq((le, rs, _))) =>
                Some((ls, le, rs, re))
              case _ => None
            }
            ov match {
              case Some((ls, le, rs, re)) =>
                val (lGen, lAttr) = bucketed(left, ls, le, "__graft_lbkt")
                val (rGen, rAttr) = bucketed(right, rs, re, "__graft_rbkt")
                val canonical = EqualTo(lAttr,
                  Greatest(Seq(floorDiv(ls, width), floorDiv(rs, width))))
                val newCond = And(And(EqualTo(lAttr, rAttr), canonical),
                  cond)
                Project(j.output, Join(lGen, rGen, jt, Some(newCond), hint))
              case None => j
            }
          case None => j
        }
    }
  }
}

/** `spark.sql.extensions` entry point registering the graft Catalyst
  * extensions: [[ContainmentJoinRule]] plus the SQL-callable
  * `graft_*` native functions
  * ([[graft.functions.GraftFunctions.functions]] — the same triples a
  * live session registers via `GraftFunctions.register`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => ContainmentJoinRule)
    graft.functions.GraftFunctions.functions.foreach(ext.injectFunction)
  }
}
