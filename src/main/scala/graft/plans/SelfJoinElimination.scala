package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Expression, IsNotNull, NamedExpression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Self-join removal: an inner self-join of a table with itself on a
  * UNIQUE key is the identity — each row pairs exactly with itself — so
  * the join (and its second scan + shuffle) can be replaced by one scan
  * with both sides' filters AND-ed and the right side's columns aliased
  * to the left side's.
  *
  * Re-expression of the reference's removable-self-join machinery
  * (MyLoptOptimizeJoinRule.java:314-415 findRemovableSelfJoins,
  * :2043 isRemovableSelfJoin, :2080 areSelfJoinKeysUnique) as a Catalyst
  * `Rule[LogicalPlan]` — the reference proves key uniqueness from
  * catalog metadata; Spark has no unique constraints, so uniqueness is
  * declared via [[RelationKeys.uniqueKeys]], keyed by (relation, column)
  * and resolved against the leaf's actual relation.
  *
  * At 100 TB this saves an entire scan+shuffle of the largest table in
  * the query — the single biggest win a logical rewrite can deliver.
  */
case class SelfJoinElimination() extends Rule[LogicalPlan] {

  import RelationKeys.{strip, tableOf, uniqueKeys}

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.selfJoinElim.enabled", "true").toBoolean) plan
    else plan.transformUp {
      case j @ Join(l, r, Inner, Some(EqualTo(la: AttributeReference,
          ra: AttributeReference)), _) =>
        eliminate(j, l, r, la, ra).getOrElse(j)
    }

  private def eliminate(
      j: Join, l: LogicalPlan, r: LogicalPlan,
      la: AttributeReference, ra: AttributeReference): Option[LogicalPlan] = {
    if (la.name != ra.name) return None
    val lout = l.outputSet
    val (keyL, keyR) = if (lout.contains(la)) (la, ra) else (ra, la)
    for {
      (leafL, filtersL) <- strip(l)
      (leafR, filtersR) <- strip(r)
      if leafL.sameResult(leafR)
      // uniqueness is declared per (relation, column) — a coincidentally
      // named column in some OTHER table never matches (the reference
      // proves this from catalog metadata, areSelfJoinKeysUnique:2080)
      table <- tableOf(leafL)
      if uniqueKeys.contains((table, la.name))
      // left side must still expose every column the right side outputs
      byName = leafL.output.map(a => a.name -> a).toMap
      if r.output.forall(a => byName.contains(a.name))
      if l.outputSet.contains(keyL) && r.outputSet.contains(keyR)
    } yield {
      // rewrite right-side attrs to the left leaf's, keeping exprIds via
      // aliases so the parent plan's references stay valid
      val rightRewritten: Seq[NamedExpression] = r.output.map { a =>
        Alias(byName(a.name), a.name)(exprId = a.exprId)
      }
      val rightFiltersOnLeft = filtersR.map(_.transform {
        case a: AttributeReference if byName.contains(a.name) => byName(a.name)
      })
      val allFilters = (filtersL ++ rightFiltersOnLeft) :+
        IsNotNull(byName(keyL.name)) // inner join drops null keys
      val filtered = Filter(allFilters.reduce(And), leafL)
      Project((l.output: Seq[NamedExpression]) ++ rightRewritten, filtered)
    }
  }
}

