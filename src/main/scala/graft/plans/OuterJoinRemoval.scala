package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.{LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Removable-outer-join elimination: a LEFT (RIGHT) outer join whose
  * null-generating side
  *   (a) contributes NO columns to the projection above the join, and
  *   (b) is joined on a declared UNIQUE key
  * is the identity on the preserved side — every preserved row appears
  * exactly once (unique key ⇒ at most one match; outer ⇒ at least once)
  * — so the join, its second scan, and its shuffle can all be dropped.
  *
  * Re-expression of the reference's removable-outer-join machinery
  * (MyLoptOptimizeJoinRule.findRemovableOuterJoins:157-279 — candidates
  * are null-generating factors with empty projFields whose outer-join
  * conjuncts equate a unique key, checked via
  * areSelfJoinKeysUnique-style metadata; replacement at
  * createReplacementJoin:1645). Catalyst's own EliminateOuterJoin only
  * CONVERTS outer→inner under null-rejecting filters; it never removes
  * the join, so this is a genuine parity rule.
  *
  * Only the equality conjuncts are inspected for the unique key; extra
  * conjuncts can only reduce matches, never duplicate preserved rows,
  * so they don't block removal (the reference likewise skips non-equi
  * conjuncts when collecting join keys, :192-224).
  *
  * At 100 TB: dropping one outer join against a dimension removes a
  * full scan + broadcast/shuffle of that dimension from every query the
  * view layer generates — the second-biggest logical-rewrite win after
  * self-join removal. */
case class OuterJoinRemoval() extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.outerJoinElim.enabled", "true").toBoolean) plan
    else plan.transformUp {
      case p @ Project(pl, Join(l, r, LeftOuter, Some(cond), _))
          if pl.forall(_.references.subsetOf(l.outputSet)) &&
            joinedOnUniqueKey(cond, r) =>
        Project(pl, l)
      case p @ Project(pl, Join(l, r, RightOuter, Some(cond), _))
          if pl.forall(_.references.subsetOf(r.outputSet)) &&
            joinedOnUniqueKey(cond, l) =>
        Project(pl, r)
    }

  /** Some equality conjunct equates a declared unique key on the
    * null-generating side with a column of the preserved side. */
  private def joinedOnUniqueKey(cond: Expression, nullGen: LogicalPlan): Boolean =
    splitConjuncts(cond).exists {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        val (ngKey, other) =
          if (nullGen.outputSet.contains(a)) (a, b) else (b, a)
        nullGen.outputSet.contains(ngKey) && !nullGen.outputSet.contains(other) &&
          RelationKeys.isUniqueKey(nullGen, ngKey)
      case _ => false
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
      splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }
}
