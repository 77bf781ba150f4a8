package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a pure point-in-interval join into a
  * binned equi-join.
  *
  * A join whose ONLY cross-side predicates are range bounds —
  *
  *   events.join(intervals, $"ts" >= $"lo" && $"ts" <= $"hi")
  *
  * — has no equi-key, so Spark plans a nested-loop join: every
  * point×interval pair is tested, O(|P|·|I|), and one side must fit
  * in memory. The standard fix (the hand-written q47/q83 shape) is
  * binning: chop the domain into width-W bins, explode each interval
  * to the bins it overlaps, tag each point with its bin, equi-join on
  * the bin, and re-check the exact bounds as a residual. Cost drops to
  * O(|P| + Σ interval_width/W) shuffled rows — a plan that scales out
  * instead of up. This rule performs that rewrite automatically:
  *
  *  - trigger: session conf `spark.graft.rangejoin.bin` set to a
  *    positive bin width (in the unit of the join columns); unset/0
  *    disables the rule. The width is a physical-layout decision
  *    (interval span vs point density), deliberately a conf, not an
  *    estimate — the same contract as AQE's advisory sizes.
  *  - match: INNER join, no usable equi-predicate (those already
  *    shuffle fine), and a conjunction containing `x ≥/> lo` and
  *    `x ≤/< hi` where x is integral and references one side only,
  *    lo/hi the other side only.
  *  - soundness: truncating division is monotone, so x ∈ [lo, hi]
  *    implies bin(x) ∈ [bin(lo), bin(hi)]; the interval side emits
  *    every bin in that range exactly once, so each qualifying pair
  *    meets on EXACTLY one bin (no dedup needed) and the residual
  *    original condition drops non-qualifying bin cohabitants.
  *    Strict bounds only widen the exploded range — still sound.
  *  - idempotence: the rewritten join HAS an equi-predicate (bin =
  *    bin), so the rule never matches its own output.
  */
object RangeJoinBinning extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rangejoin.bin"

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType => true
    case _ => false
  }

  /** (point, lo, hi, pointOnLeft) for the first usable range pattern. */
  private def rangePattern(conjuncts: Seq[Expression],
                           left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }
    // normalize every comparison to (smaller, larger)
    val lowerBounds = conjuncts.collect {
      case GreaterThanOrEqual(a, b) => (b, a) // b <= a
      case LessThanOrEqual(a, b) => (a, b)
      case GreaterThan(a, b) => (b, a)
      case LessThan(a, b) => (a, b)
    }
    // a point expr x bounded below by lo (other side) and above by hi
    // (other side): (lo, x) and (x, hi)
    val candidates = for {
      (lo, x1) <- lowerBounds
      (x2, hi) <- lowerBounds
      if x1.semanticEquals(x2) && integral(x1)
      xSide <- sideOf(x1)
      loSide <- sideOf(lo)
      hiSide <- sideOf(hi)
      if loSide != xSide && hiSide != xSide
    } yield (x1, lo, hi, xSide)
    candidates.headOption
  }

  private def hasEquiKey(conjuncts: Seq[Expression],
                         left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet) && a.references.nonEmpty &&
          b.references.nonEmpty) ||
        (a.references.subsetOf(right.outputSet) &&
          b.references.subsetOf(left.outputSet) && a.references.nonEmpty &&
          b.references.nonEmpty)
      case _ => false
    }

  private def binOf(e: Expression, w: Long): Expression =
    IntegralDivide(Cast(e, LongType), Literal(w))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width =
      try conf.getConfString(ConfKey, "0").toLong
      catch { case _: NumberFormatException => 0L }
    if (width <= 0L) plan
    else plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && {
            val cj = splitConjuncts(cond)
            !hasEquiKey(cj, left, right) &&
              rangePattern(cj, left, right).isDefined
          } =>
        val Some((x, lo, hi, pointOnLeft)) =
          rangePattern(splitConjuncts(cond), left, right)
        val (pointPlan, intervalPlan) =
          if (pointOnLeft) (left, right) else (right, left)
        // interval side: explode sequence(bin(lo), bin(hi)). Sequence
        // is TimeZoneAware — an optimizer-injected instance must carry
        // the session zone itself (ResolveTimeZone ran long ago).
        // Inverted/dirty intervals (lo > hi) match NOTHING in the
        // original nested-loop plan, but would make Sequence throw
        // "Illegal sequence boundaries" here — drop them up front.
        // (NULL bounds fall out the same way: the <= filter is
        // null-rejecting, matching the original predicate's behavior.)
        // Intervals wider than ~128M bins would still exceed Spark's
        // max array length: the conf width is a layout decision and
        // must be sized to the data's interval span (PLANS.md).
        val loBin = binOf(lo, width)
        val hiBin = binOf(hi, width)
        val cleaned = Filter(LessThanOrEqual(loBin, hiBin), intervalPlan)
        val seq = Sequence(loBin, hiBin,
          Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
        val gen = Explode(seq)
        val binI = AttributeReference("__graft_bin_i", LongType,
          nullable = false)()
        val generated = Generate(gen, unrequiredChildIndex = Nil,
          outer = false, qualifier = None,
          generatorOutput = Seq(binI), child = cleaned)
        // point side: project bin(x) alongside
        val binP = Alias(binOf(x, width), "__graft_bin_p")()
        val projected = Project(pointPlan.output :+ binP, pointPlan)
        val (newLeft, newRight) =
          if (pointOnLeft) (projected, generated) else (generated, projected)
        val newCond = And(EqualTo(binP.toAttribute, binI), cond)
        Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}
