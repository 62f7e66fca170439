package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: a Jaccard threshold implies a set-size ratio bound
  * — j(A,B) >= t  ⟹  min(|A|,|B|) >= t * max(|A|,|B|) — so prepend
  * that O(1) cardinality check before the O(|A|+|B|) merge scan. Pure
  * strength-reduction: the added conjunct is implied, results are
  * unchanged (spec-verified), but non-candidates are rejected without
  * touching array contents.
  *
  * Registered through GraftExtensions (injectOptimizerRule) or on a
  * live session via experimental.extraOptimizations.
  */
object JaccardPrefilterRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) if !alreadyGuarded(cond) =>
      val rewritten = guard(cond)
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
    // predicate pushdown may have folded the filter into a join condition
    case j @ Join(_, _, _, Some(cond), _) if !alreadyGuarded(cond) =>
      val rewritten = guard(cond)
      if (rewritten fastEquals cond) j else j.copy(condition = Some(rewritten))
  }

  private def guard(cond: Expression): Expression = cond transformUp {
    case ge @ GreaterThanOrEqual(j: JaccardSortedExpr, t @ Literal(_, DoubleType)) =>
      And(sizeBound(j, t), ge)
  }

  /** Fixpoint guard: don't re-add the bound on later optimizer runs. */
  private def alreadyGuarded(cond: Expression): Boolean = cond.exists {
    case GreaterThanOrEqual(Least(_), Multiply(_, _, _)) => true
    case _ => false
  }

  private def sizeBound(j: JaccardSortedExpr, t: Literal): Expression = {
    val sa = Cast(Size(j.left, legacySizeOfNull = false), DoubleType)
    val sb = Cast(Size(j.right, legacySizeOfNull = false), DoubleType)
    GreaterThanOrEqual(Least(Seq(sa, sb)), Multiply(t, Greatest(Seq(sa, sb))))
  }
}
