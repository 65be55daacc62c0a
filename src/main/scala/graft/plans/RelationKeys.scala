package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Declared key metadata + leaf-shape helpers shared by the join-removal
  * rules ([[SelfJoinElimination]], [[OuterJoinRemoval]]).
  *
  * Spark has no unique constraints, so uniqueness is DECLARED per
  * (relation, column) — the stand-in for the reference's catalog
  * uniqueness proof (MyLoptOptimizeJoinRule.areSelfJoinKeysUnique:2080,
  * which asks the metadata query whether the join keys form a unique
  * key). A coincidentally-named column on some other table never
  * matches: the declaration is resolved against the leaf's actual
  * relation identity. */
object RelationKeys {

  /** (table, column) pairs known to be unique keys. Extend per
    * deployment schema. */
  @volatile var uniqueKeys: Set[(String, String)] = Set(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "events" -> "event_id", "documents" -> "doc_id",
    "embeddings" -> "vec_id")

  /** Identify the relation behind a leaf: catalog table name if present,
    * else the file-source root path's basename (Tables.load reads
    * `<sfDir>/<table>.parquet`). Unknown leaf shapes get no name and are
    * never treated as unique. */
  def tableOf(leaf: LogicalPlan): Option[String] = leaf match {
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

  /** plan = attr-only-Project* / Filter* over a leaf; returns (leaf,
    * conjunctive filters). */
  def strip(plan: LogicalPlan): Option[(LogicalPlan, Seq[Expression])] =
    plan match {
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        strip(child)
      case Filter(cond, child) =>
        strip(child).map { case (leaf, fs) => (leaf, fs :+ cond) }
      case leaf if leaf.children.isEmpty => Some((leaf, Nil))
      case _ => None
    }

  /** Is `attr` a declared unique key of the relation behind `plan`
    * (looking through attr-only projects and filters)? */
  def isUniqueKey(plan: LogicalPlan, attr: AttributeReference): Boolean =
    strip(plan).flatMap { case (leaf, _) => tableOf(leaf) }
      .exists(t => uniqueKeys.contains((t, attr.name)))
}
