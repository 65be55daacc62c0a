package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, Divide, Expression, Literal, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType, ShortType, ByteType}

/** EAGER AGGREGATION (Yan & Larson, VLDB 1995): push a partial
  * aggregate BELOW a chain of inner joins, grouping the fact leaf by
  * its join keys + its group-by columns, and re-aggregate above.
  * Semantics-preserving for inner joins with SUM/COUNT/MIN/MAX/AVG
  * (non-distinct, unfiltered; AVG decomposed into partial sum +
  * partial count): the partial group-by collapses only rows with
  * identical values for every attribute ANY spine condition and the
  * final grouping can see, so each collapsed group joins exactly the
  * rows each of its members would have — through the WHOLE chain —
  * SUM/MIN/MAX pass through re-aggregation, COUNT becomes SUM of
  * partial counts (and a joined-pair count is exactly the sum of
  * fact-side partial counts across matches). No uniqueness assumption
  * on the other side is needed. The chain (snowflake) form is the
  * reference's actual query shape: ungrouped MIN over 5–17 joins with
  * the aggregate many joins above the fact scan (runtime_test.sh).
  *
  * This is the transform that matters at 100 TB: a fact→dim join
  * whose final aggregate groups by a low-NDV key currently shuffles
  * EVERY fact row into the join; pre-aggregation shrinks the shuffle
  * to the key-group count before any join bytes move. Spark's
  * optimizer does not do this (no CollapseProject analog exists for
  * aggregates below joins).
  *
  * Deployment posture: estimate-backed, ON by default (flipped after
  * a 361-entry differential check — rule on vs off over the whole
  * gate corpus: 2 entries fired, 0 result diffs, tools/
  * EagerAggReadiness), disabled via `spark.graft.eagerAgg.enabled`.
  * The rule fires only when the
  * measured profile of the fact side's scan predicts at least
  * `spark.graft.eagerAgg.minReduction` (default 4×) row reduction
  * from the partial grouping (group NDV bound = Π per-column NDV,
  * capped at the filtered row count — the Selinger bound). No
  * profile → no rewrite: a blind pre-aggregation on a near-unique
  * key would ADD a shuffle.
  *
  * Reference anchor: the reference optimizes join ORDER only
  * (MyLoptOptimizeJoinRule et al.); eager aggregation is the
  * complementary logical transform its workload (ungrouped MIN over
  * snowflake joins, Query.java) would benefit from at scale.
  */
case class EagerAggregation() extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.eagerAgg.enabled", "true").toBoolean)
      plan
    else plan.transformDown {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  /** Types whose SUM re-aggregates losslessly (decimal widens its
    * precision per level and would change the result type). */
  private def sumSafe(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType => true
    case _ => false
  }

  /** The r15 extension (VERDICT r14 item 4): descend the PRESERVED
    * side of left/right outer joins too — Yan & Larson's general form.
    * Gated for A/B; default ON after the full-gate on/off differential
    * (tools/EagerAggReadiness) showed 0 result diffs with the outer
    * descent enabled. */
  private def outerEnabled: Boolean =
    conf.getConfString("spark.graft.eagerAgg.outer", "true").toBoolean

  /** A node that flattens into the join spine: inner joins (always),
    * left/right outer joins (when the outer descent is on),
    * attribute-only Projects, and Filters over such. */
  private def isSpine(p: LogicalPlan): Boolean = p match {
    case Join(_, _, Inner, _, _) => true
    case Join(_, _, LeftOuter | RightOuter, _, _) => outerEnabled
    case Project(es, c) if es.forall(_.isInstanceOf[Attribute]) => isSpine(c)
    case Filter(_, c) => isSpine(c)
    case _ => false
  }

  /** Flatten the join chain under the aggregate into (leaves tagged
    * PRESERVED?, all join + spine-filter conditions) — Yan & Larson's
    * general form: the fact scan may sit MANY joins below the
    * aggregate (the reference's snowflake shape, ungrouped MIN over
    * 5–17 joins, runtime_test.sh). Attribute-only Projects are looked
    * through; a Filter above a join contributes its conjuncts (its
    * fact-side references become partial keys, which is what keeps
    * the rewrite exact). A LEFT/RIGHT OUTER join's preserved side
    * keeps flattening while its null-generating side stays ONE opaque
    * non-preserved leaf: the partial aggregate may only land on a
    * preserved leaf (its rows are never null-extended away, so the
    * inner-join multiplicity argument carries over unchanged — a
    * partial group's members share every join-visible attribute,
    * hence the same match set, matched k≥1 times or null-extended
    * exactly once, both of which re-aggregation reproduces). FULL
    * outer joins and everything else stay leaves — a FULL join
    * null-extends BOTH sides, and a null partial-count row would
    * vanish from SUM where the unrewritten count(*) still sees its
    * row. */
  private def flattenSpine(
      plan: LogicalPlan): (Seq[(LogicalPlan, Boolean)], Seq[Expression]) =
    plan match {
      case Join(l, r, Inner, cond, _) =>
        val (ll, lc) = flattenSpine(l)
        val (rl, rc) = flattenSpine(r)
        (ll ++ rl,
          lc ++ rc ++ cond.toSeq.flatMap(splitConjunctivePredicates))
      case Join(l, r, LeftOuter, cond, _) if outerEnabled =>
        val (ll, lc) = flattenSpine(l)
        (ll :+ (r, false),
          lc ++ cond.toSeq.flatMap(splitConjunctivePredicates))
      case Join(l, r, RightOuter, cond, _) if outerEnabled =>
        val (rl, rc) = flattenSpine(r)
        ((l, false) +: rl,
          rc ++ cond.toSeq.flatMap(splitConjunctivePredicates))
      case Project(es, child)
          if es.forall(_.isInstanceOf[Attribute]) && isSpine(child) =>
        flattenSpine(child)
      case Filter(cond, child) if isSpine(child) =>
        val (ls, cs) = flattenSpine(child)
        (ls, cs ++ splitConjunctivePredicates(cond))
      case other => (Seq((other, true)), Nil)
    }

  /** Rebuild the spine with `target` (identity-compared) swapped for
    * `repl`. Attribute-only Projects on the spine are dropped — the
    * partial aggregate's alias columns must flow up to the final
    * aggregate, and the next fixpoint iteration re-prunes. Outer
    * joins are rebuilt descending their PRESERVED side only — the
    * target is always a preserved leaf, and the null-generating side
    * must survive byte-identical. */
  private def replaceLeaf(plan: LogicalPlan, target: LogicalPlan,
      repl: LogicalPlan): LogicalPlan =
    if (plan eq target) repl
    else plan match {
      case j @ Join(_, _, Inner, _, _) =>
        j.copy(left = replaceLeaf(j.left, target, repl),
          right = replaceLeaf(j.right, target, repl))
      case j @ Join(_, _, LeftOuter, _, _) if outerEnabled =>
        j.copy(left = replaceLeaf(j.left, target, repl))
      case j @ Join(_, _, RightOuter, _, _) if outerEnabled =>
        j.copy(right = replaceLeaf(j.right, target, repl))
      case Project(es, child)
          if es.forall(_.isInstanceOf[Attribute]) && isSpine(child) =>
        replaceLeaf(child, target, repl)
      case f @ Filter(_, child) if isSpine(child) =>
        f.copy(child = replaceLeaf(child, target, repl))
      case other => other
    }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (leaves, conds) = flattenSpine(agg.child)
    if (leaves.size < 2) return None
    if (!conds.forall(_.deterministic)) return None

    val aes = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    }).distinct
    if (aes.isEmpty || aes.exists(!_.deterministic)) return None
    if (aes.exists(ae => ae.isDistinct || ae.filter.isDefined)) return None
    val supported = aes.forall(_.aggregateFunction match {
      case s: Sum => sumSafe(s.child)
      // avg decomposes to Σpartial-sum / Σpartial-count (null-safe:
      // a null numerator propagates, matching avg-of-empty)
      case a: Average => sumSafe(a.child) && a.dataType == DoubleType
      case _: Count | _: Min | _: Max => true
      case _ => false
    })
    if (!supported) return None
    // grouping must be plain attributes (pass-through above the join)
    if (!agg.groupingExpressions.forall(_.isInstanceOf[Attribute]))
      return None

    // the fact side: every aggregated expression's references must sit
    // on ONE PRESERVED leaf (an aggregate over a null-generating
    // side's columns counts matches, not collapsed groups — the
    // rewrite would undercount); ref-free aggs (count(*)) are
    // side-agnostic but still need a preserved landing spot
    val refs = aes.flatMap(_.references)
    val side =
      if (refs.isEmpty) leaves.collectFirst { case (l, true) => l }
        .getOrElse(return None)
      else leaves.find { case (l, preserved) =>
        preserved && refs.forall(l.outputSet.contains)
      }.map(_._1).getOrElse(return None)
    if (side.isInstanceOf[Aggregate]) return None // idempotence guard

    // partial group-by: every fact-side attribute ANY spine condition
    // or the final grouping observes — within a partial group all of
    // them are constant, so every member row behaves identically
    // through the whole join chain (the multiplicity argument
    // unchanged from the single-join case)
    val needed = (conds.flatMap(_.references) ++
      agg.groupingExpressions.flatMap(_.references))
      .filter(side.outputSet.contains).map(_.asInstanceOf[Attribute])
    val partialKeys = needed.groupBy(_.exprId).map(_._2.head).toSeq
      .sortBy(_.exprId.id)
    if (partialKeys.isEmpty) return None

    // estimate-backed profitability from the fact scan's profile
    if (!profitable(side, partialKeys)) return None

    // partial aggregate: one alias per distinct aggregate call (two
    // for avg: its partial sum and partial non-null count)
    val partialAliases: Map[AggregateExpression, Seq[Alias]] =
      aes.zipWithIndex.map { case (ae, i) =>
        def mk(f: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction,
            suffix: String) =
          Alias(AggregateExpression(f, Complete, isDistinct = false),
            s"_eager_$i$suffix")()
        ae -> (ae.aggregateFunction match {
          case a: Average =>
            // partial sum in DOUBLE, matching native Average's
            // accumulator — Sum over an integral child accumulates in
            // LongType, which can overflow at scale where the
            // unrewritten plan would not (ADVICE r13)
            Seq(mk(Sum(Cast(a.child, DoubleType)), "s"),
              mk(Count(Seq(a.child)), "c"))
          case other => Seq(mk(other, ""))
        })
      }.toMap
    val partial = Aggregate(partialKeys,
      partialKeys ++ aes.flatMap(partialAliases), side)

    val newJoin = replaceLeaf(agg.child, side, partial)

    // final aggregate: SUM/MIN/MAX re-aggregate their partial column;
    // COUNT becomes coalesce(SUM(partial count), 0) — the coalesce
    // matters for the ungrouped-over-empty-join case, where count(*)
    // is 0 but sum() is null
    val rewritten = agg.aggregateExpressions.map(_.transform {
      case ae: AggregateExpression if partialAliases.contains(ae) =>
        val cols = partialAliases(ae).map(_.toAttribute)
        def rewrap(f: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction) =
          AggregateExpression(f, Complete, isDistinct = false)
        ae.aggregateFunction match {
          case _: Count =>
            Coalesce(Seq(rewrap(Sum(cols.head)), Literal(0L)))
          case _: Sum => rewrap(Sum(cols.head))
          case _: Min => rewrap(Min(cols.head))
          case _: Max => rewrap(Max(cols.head))
          case _: Average =>
            Divide(Cast(rewrap(Sum(cols.head)), DoubleType),
              Cast(rewrap(Sum(cols(1))), DoubleType))
          case _ => ae // unreachable: filtered above
        }
    }.asInstanceOf[NamedExpression])
    Some(Aggregate(agg.groupingExpressions, rewritten, newJoin))
  }

  /** True when the fact side resolves to a plain (possibly filtered)
    * parquet scan whose measured profile predicts ≥ minReduction
    * rows-per-group (group NDV = Π per-column NDV capped at filtered
    * rows — the Selinger bound). */
  private def profitable(side: LogicalPlan, keys: Seq[Attribute]): Boolean =
    try {
      val spark = org.apache.spark.sql.SparkSession.active
      val minReduction = conf.getConfString(
        "spark.graft.eagerAgg.minReduction", "4").toDouble
      baseScan(side) match {
        case None => false
        case Some(path) =>
          val slash = path.lastIndexOf('/')
          val p = StatsEstimator.profileTable(spark,
            path.substring(0, slash),
            path.substring(slash + 1).stripSuffix(".parquet"))
          val sel = side.collect {
            case Filter(c, _) => splitConjunctivePredicates(c)
          }.flatten.map(StatsEstimator.selectivityOfCatalyst(p)).product
          val rows = math.max(p.rows * sel, 1.0)
          val groupNdv = keys.foldLeft(1.0) { (acc, k) =>
            p.cols.get(k.name).map(c => acc * math.max(c.ndv, 1.0))
              .getOrElse(return false)
          }
          rows / math.min(groupNdv, rows) >= minReduction
      }
    } catch { case scala.util.control.NonFatal(_) => false }

  @annotation.tailrec
  private def baseScan(plan: LogicalPlan): Option[String] = plan match {
    case p: Project => baseScan(p.child)
    case f: Filter => baseScan(f.child)
    case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.toList match {
            case one :: Nil if one.toString.endsWith(".parquet") =>
              Some(one.toString)
            case _ => None
          }
        case _ => None
      }
    case _ => None
  }
}
