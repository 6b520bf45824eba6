package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the custom operator: Catalyst's own
  * PushDownPredicates knows nothing about AsOfJoin, so a
  * `Filter(cond, AsOfJoin(l, r))` would evaluate after the join.
  * Any conjunct that references only left-side columns is
  * join-invariant (the as-of match of a left row is independent of
  * other left rows), so it can run below the join — before the
  * exchange, and from there Catalyst pushes it on into the scan.
  *
  * Right-side conjuncts must NOT be pushed: dropping a right row can
  * change which row is "the last at-or-before" for a left row.
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, j: AsOfJoin) =>
      val leftAttrs = j.left.outputSet
      // mirror Catalyst's own pushdown guard: a non-deterministic
      // predicate (e.g. a rand()-based sampling filter) must not move
      // below the join, where it would see a different row stream
      val (pushable, kept) = splitConjuncts(cond)
        .partition(c => c.deterministic && c.references.subsetOf(leftAttrs))
      if (pushable.isEmpty) f
      else {
        val newLeft = Filter(pushable.reduce(And), j.left)
        val newJoin = j.copy(left = newLeft)
        kept.reduceOption(And).map(Filter(_, newJoin)).getOrElse(newJoin)
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
