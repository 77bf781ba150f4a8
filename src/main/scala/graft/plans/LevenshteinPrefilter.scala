package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: guard `levenshtein(a, b) <= k` predicates with the
  * free lower bound `abs(length(a) - length(b)) <= k`.
  *
  * Levenshtein is O(|a|·|b|) per row; the length prefilter is O(1) and
  * sound (edit distance is at least the length difference), so rows
  * outside the band skip the quadratic computation entirely — and the
  * cheap predicate is eligible for further pushdown (e.g. ahead of a
  * join) where the Levenshtein call itself is not. The same guard that
  * q70 writes by hand, applied automatically to any user query once
  * [[GraftExtensions]] is installed.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def bound(l: Expression, r: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(l), Length(r))), k)

  /** Already-guarded conditions are left alone (idempotence). The check
    * must survive constant folding: `length('lit')` in an injected
    * guard folds to an integer literal on the next optimizer pass, so a
    * guard side counts as matching when it equals one of the expected
    * length expressions OR is foldable (the folded remnant of one).
    */
  private def hasGuard(cond: Expression, l: Expression, r: Expression): Boolean = {
    val la = Length(l)
    val lb = Length(r)
    def sideMatches(e: Expression): Boolean =
      e.semanticEquals(la) || e.semanticEquals(lb) || e.foldable
    cond.exists {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), _) =>
        sideMatches(x) && sideMatches(y)
      case _ => false
    }
  }

  /** Guards to add for a predicate tree (empty when none needed). */
  private def guardsFor(cond: Expression): Seq[Expression] = {
    var added = Seq.empty[Expression]
    cond.foreach {
      case LessThanOrEqual(Levenshtein(l, r, None), k @ Literal(_, IntegerType))
          if !hasGuard(cond, l, r) =>
        added +:= bound(l, r, k)
      case LessThan(Levenshtein(l, r, None), k @ Literal(_, IntegerType))
          if !hasGuard(cond, l, r) =>
        added +:= bound(l, r, k)
      case _ => ()
    }
    added.distinct
  }

  /** The cheap guard goes FIRST in the conjunction: And evaluates left
    * to right, so out-of-band rows never pay the O(n·m) call.
    */
  private def guarded(cond: Expression): Expression =
    guardsFor(cond).foldLeft(cond)((acc, g) => And(g, acc))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val g = guarded(cond)
      if (g fastEquals cond) f else Filter(g, child)
    case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.isDefined =>
      val g = guarded(j.condition.get)
      if (g fastEquals j.condition.get) j else j.copy(condition = Some(g))
  }
}
