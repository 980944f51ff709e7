package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: rewrite an interval-overlap theta join into a binned
  * equi-join.
  *
  * Spark has no range-join strategy, so `a JOIN b ON a.start <= b.end AND
  * b.start <= a.end [AND k-equality]` plans as a BroadcastNestedLoopJoin
  * (no equi keys) or as a sort-merge join on the equi keys alone with the
  * overlap as a per-key residual — either way the per-key work is the
  * cross product, quadratic in recording length. This rule overlays both
  * sides onto a fixed time-bin grid (`Generate(Explode(Sequence(start/W,
  * end/W)))`), equi-joins on the bin (plus any original equi keys), keeps
  * the exact overlap predicate as the residual, and keeps each matched
  * pair exactly once by accepting it only in the FIRST overlapping bin —
  * `bin = greatest(a.start, b.start) / W`, a point both intervals contain,
  * so no distinct pass is needed and multiplicity is preserved for any
  * downstream aggregate.
  *
  * Scope guards, checked structurally: INNER joins whose condition carries
  * the two overlap conjuncts — LONG-typed (binned directly) or
  * TIMESTAMP-typed (binned on epoch micros via UnixMicros; event-time
  * overlap joins are written on timestamps and previously kept the nested
  * loop silently) — with each bound fully on one side; strict (`<`) and
  * non-strict (`<=`) bounds both qualify, in either spelling
  * (`a.start < b.end` or `b.end > a.start`), because the exact original
  * conjuncts always remain as the residual predicate and strict matches
  * are a subset of the inclusive bins; fires only when
  * `spark.graft.rangeJoin.binWidth` (same unit as the bounds — epoch
  * MICROSECONDS for timestamp bounds; pick ~ the typical interval span)
  * is set positive;
  * skips joins already carrying the first-bin marker so the fixed-point
  * optimizer batch stays idempotent. Bin count per row is
  * span/W + 1 — a pathologically wide interval costs explode rows, never
  * wrong answers (TemporalOpsSpec pins rewritten == unrewritten).
  *
  * The hand-built q72 (TemporalOps.overlapJoin) is this same shape spelled
  * out with the dedup fused into its count-distinct aggregate; the rule
  * gives every ad-hoc theta-overlap query that plan for free.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  private val widthKey = "spark.graft.rangeJoin.binWidth"

  private def width: Long =
    SQLConf.get.getConfString(widthKey, "0").toLong

  /** Conjunct list of an expression. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** The first-bin marker conjunct we add — its presence means the join is
    * already rewritten (survives plan copies, unlike node tags). */
  private def isFirstBinMarker(e: Expression): Boolean = e match {
    case EqualTo(_, IntegralDivide(_: Greatest, _, _)) => true
    case EqualTo(IntegralDivide(_: Greatest, _, _), _) => true
    case _                                             => false
  }

  /** A join already equi-keyed on a hand-binned grid (an attribute born
    * from `explode(sequence(x div w, ...))`, q72's explicit shape) gains
    * nothing from a second bin layer — leave it alone. */
  private def joinsOnExistingBins(j: Join): Boolean = {
    val binAttrs = (j.left.collect { case g: Generate => g } ++
      j.right.collect { case g: Generate => g }).collect {
        case g if (g.generator match {
          case Explode(_: Sequence) => true
          case _                    => false
        }) => g.generatorOutput
      }.flatten.map(_.exprId).toSet
    binAttrs.nonEmpty &&
      j.condition.exists(_.references.exists(a => binAttrs.contains(a.exprId)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) plan else rewrite(plan, w)
  }

  /** Conf-independent entry point: rewrite with an explicit bin width.
    * Callers applying the rule eagerly to one plan (q72b) use this — no
    * shared session conf, so concurrent callers can't race each other
    * into a dropped or leaked rewrite. */
  def rewrite(plan: LogicalPlan, w: Long): LogicalPlan = {
    require(w > 0, s"bin width must be positive, got $w")
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && !conjuncts(cond).exists(isFirstBinMarker) &&
            !joinsOnExistingBins(j) =>
        val cs = conjuncts(cond)
        // overlap pair: (aStart <= bEnd, bStart <= aEnd) with each bound
        // referencing exactly one side, all LongType
        def sideOf(e: Expression): Option[Boolean] = {
          val refs = e.references
          if (refs.nonEmpty && refs.subsetOf(left.outputSet)) Some(true)
          else if (refs.subsetOf(right.outputSet) && refs.nonEmpty) Some(false)
          else None
        }
        // a bound conjunct normalized to (lo ≤/< hi): strict and non-strict
        // both qualify — on longs `lo < hi` implies `lo <= hi`, so binning
        // on the inclusive span is a superset of the strict matches and the
        // ORIGINAL conjunct stays in the residual, keeping semantics exact.
        // The flipped spellings (hi >= lo, hi > lo) are the same bounds.
        def asBound(c: Expression): Option[(Expression, Expression)] = c match {
          case LessThanOrEqual(lo, hi)    => Some((lo, hi))
          case LessThan(lo, hi)           => Some((lo, hi))
          case GreaterThanOrEqual(hi, lo) => Some((lo, hi))
          case GreaterThan(hi, lo)        => Some((lo, hi))
          case _                          => None
        }
        // long-typed bounds bin directly; TIMESTAMP bounds bin on their
        // epoch micros (UnixMicros — the internal value, monotonic, no
        // timezone dependence), with binWidth then read in MICROSECONDS.
        // The exact original conjuncts still form the residual either way.
        def binnable(e: Expression): Boolean =
          e.dataType == LongType || e.dataType == TimestampType
        def asMicros(e: Expression): Expression =
          if (e.dataType == TimestampType) UnixMicros(e) else e
        val bounds = cs.flatMap { c =>
          asBound(c).collect {
            case (lo, hi)
                if binnable(lo) && lo.dataType == hi.dataType &&
                  sideOf(lo).isDefined && sideOf(hi).isDefined &&
                  sideOf(lo) != sideOf(hi) && lo.deterministic && hi.deterministic =>
              (c, lo, hi, sideOf(lo).get)
          }
        }
        // need EXACTLY one left-bound-vs-right and one right-bound-vs-left
        // conjunct — with several candidates on a side the overlap pair is
        // structurally ambiguous (e.g. a dedup guard `a.id < b.id` next to
        // the real time bounds), and a mis-pick bins id-vs-timestamp spans
        // into billions of rows. Preference order, applied SYMMETRICALLY:
        // the unique non-strict pick on BOTH sides first (ids are
        // idiomatically strict, time bounds idiomatically <=), else the
        // unique pick overall on both sides, else DON'T rewrite. Symmetric
        // matters: mixing tiers would let a lone NON-strict dedup guard
        // (`a.id <= b.id`) win one axis while the other comes from a
        // strict time bound — the inverse hijack, binning an id-vs-time
        // span. A kept nested loop is slow, a wrong bin axis is fatal.
        def pick(side: Boolean, nonStrictOnly: Boolean): Option[(Expression, Expression, Expression)] = {
          val all = bounds.filter(_._4 == side)
          val cands = if (!nonStrictOnly) all else all.filter(_._1 match {
            case _: LessThanOrEqual | _: GreaterThanOrEqual => true
            case _                                          => false
          })
          if (cands.size == 1) Some((cands.head._1, cands.head._2, cands.head._3)) else None
        }
        val picked = (pick(true, nonStrictOnly = true), pick(false, nonStrictOnly = true)) match {
          case (Some(lp), Some(rp)) => Some((lp, rp))
          case _ => (pick(true, nonStrictOnly = false), pick(false, nonStrictOnly = false)) match {
            case (Some(lp), Some(rp)) => Some((lp, rp))
            case _                    => None
          }
        }
        picked match {
          // both axes must live on the same type: a long bound paired with
          // a timestamp bound is not an interval overlap
          case Some(((f, aStart, bEnd), (b, bStart, aEnd)))
              if f != b && aStart.dataType == bStart.dataType &&
                aStart.dataType == aEnd.dataType =>
            val wLit = Literal(w, LongType)
            def binsOf(lo: Expression, hi: Expression, name: String, child: LogicalPlan) = {
              // Sequence is TimeZoneAwareExpression: the analyzer's
              // ResolveTimeZone has already run, so set the zone here or
              // the plan goes back to unresolved
              val seq = Sequence(
                IntegralDivide(asMicros(lo), wLit), IntegralDivide(asMicros(hi), wLit),
                None, Some(SQLConf.get.sessionLocalTimeZone))
              val attr = AttributeReference(name, LongType, nullable = false)()
              (Generate(Explode(seq), Nil, outer = false, None, Seq(attr), child), attr)
            }
            val (lGen, binL) = binsOf(aStart, aEnd, "graft_bin_l", left)
            val (rGen, binR) = binsOf(bStart, bEnd, "graft_bin_r", right)
            val firstBin = EqualTo(binL,
              IntegralDivide(Greatest(Seq(asMicros(aStart), asMicros(bStart))), wLit))
            val newCond = (EqualTo(binL, binR) +: cs :+ firstBin).reduce(And)
            Project(j.output, Join(lGen, rGen, Inner, Some(newCond), hint))
          case _ => j
        }
    }
  }
}
