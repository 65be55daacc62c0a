package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Expression, IsNotNull, NamedExpression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
  * declared via [[SelfJoinElimination.uniqueKeys]], keyed by
  * (relation, column) and resolved against the leaf's actual relation.
  *
  * At 100 TB this saves an entire scan+shuffle of the largest table in
  * the query — the single biggest win a logical rewrite can deliver.
  */
case class SelfJoinElimination() extends Rule[LogicalPlan] {

  import SelfJoinElimination._

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.selfJoinElim.enabled", "true").toBoolean) plan
    else plan.transformUp {
      case j @ Join(l, r, Inner, Some(EqualTo(la: AttributeReference,
          ra: AttributeReference)), _) =>
        eliminate(j, l, r, la, ra).getOrElse(j)
    }

  /** plan = attr-only-Project* / Filter* over a leaf; returns (leaf,
    * conjunctive filters). */
  private def strip(plan: LogicalPlan): Option[(LogicalPlan, Seq[Expression])] =
    plan match {
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        strip(child)
      case Filter(cond, child) =>
        strip(child).map { case (leaf, fs) => (leaf, fs :+ cond) }
      case leaf if leaf.children.isEmpty => Some((leaf, Nil))
      case _ => None
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

object SelfJoinElimination {

  /** (table, column) pairs known to be unique keys. Spark has no unique
    * constraints, so this is the declared stand-in for the reference's
    * catalog uniqueness proof; extend per deployment schema. */
  @volatile var uniqueKeys: Set[(String, String)] = Set(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "events" -> "event_id", "documents" -> "doc_id",
    "embeddings" -> "vec_id")

  /** Identify the relation behind a leaf: catalog table name if present,
    * else the file-source root path's basename (Tables.load reads
    * `<sfDir>/<table>.parquet`). Unknown leaf shapes get no name and are
    * never eliminated. */
  private def tableOf(leaf: LogicalPlan): Option[String] = leaf match {
    case lr: LogicalRelation =>
      lr.catalogTable.map(_.identifier.table).orElse(lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.headOption.map { p =>
            val base = p.getName
            if (base.endsWith(".parquet")) base.dropRight(".parquet".length)
            else base
          }
        case _ => None
      })
    case _ => None
  }
}
