package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, JoinHint, LogicalPlan, Project, SHUFFLE_HASH}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

/** In-optimizer join reordering: the engine's DPccp enumerator applied to
  * ANY Spark SQL / DataFrame query, injected as a Catalyst optimizer rule
  * (`SparkSessionExtensions.injectOptimizerRule` via
  * [[graft.functions.GraftExtensions]]).
  *
  * This is the Spark-native analog of the reference's planner rules
  * firing on MultiJoin (SURVEY.md §2b): Catalyst keeps joins binary, so
  * the flatten step is ExtractFiltersAndInnerJoins (the same pattern
  * Spark's own ReorderJoin consumes), the search is our [[Enumerators]],
  * and the "cardinality dictionary" is logical-plan statistics
  * (`sizeInBytes`, available bottom-up without CBO).
  *
  * Scale note: join order is THE dominant cost factor for multiway joins
  * at 100 TB — a bad order materializes huge intermediates. DPccp over
  * the join graph (≤ [[GraftJoinReorder.maxDpRelations]] relations,
  * greedy-bushy GOO beyond — the measured-best cheap fallback on the
  * JOB corpus) minimizes the modeled intermediate volume; physical
  * join selection (broadcast/SMJ/SHJ) stays Spark's, and AQE can still
  * re-plan at runtime. Filters remain where Catalyst pushed them — only
  * the join shape changes.
  */
case class GraftJoinReorder() extends Rule[LogicalPlan] with PredicateHelper {

  import GraftJoinReorder._

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.joinReorder.enabled", "true").toBoolean) plan
    else plan.transformDown {
      // catch the shape both pre-pushdown (conditions in a Filter above
      // condition-less joins — the freshly-analyzed `FROM a, b, c WHERE`
      // form) and post-pushdown (conditions on the joins)
      case f @ Filter(_, j: Join)
          if j.joinType == Inner && j.getTagValue(REORDERED).isEmpty =>
        tryReorder(f).getOrElse(f)
      case j @ Join(_, _, Inner, _, _) if j.getTagValue(REORDERED).isEmpty =>
        tryReorder(j).getOrElse(j)
    }

  private def tryReorder(root: LogicalPlan): Option[LogicalPlan] = {
    val (rels, conditions, shape) = root match {
      case Filter(cond, j: Join) =>
        val (p, c, t) = flatten(j)
        (p, c ++ splitConjunctivePredicates(cond), t)
      case other => flatten(other)
    }
    if (GraftJoinReorder.debug)
      println(s"[graft-reorder] rels=${rels.size} conds=${conditions.size} " +
        s"det=${conditions.forall(_.deterministic)}")
    if (rels.size >= 3 && conditions.nonEmpty &&
        conditions.forall(_.deterministic))
      reorder(root, rels.toVector, conditions, shape)
    else None
  }

  /** Flatten a tree of inner joins into (base plans, all conditions, the
    * CURRENT join shape over base indices), looking through the
    * alias-free Projects that ColumnPruning interleaves between joins
    * (ExtractFiltersAndInnerJoins stops at them, which is why Spark's
    * own ReorderJoin runs before pruning; an injected rule runs after).
    * Dropped Projects cost nothing: the top-level Project we emit
    * restores the original output and the next fixpoint iteration
    * re-prunes. The shape feeds the strict-improvement gate in
    * [[reorder]]. */
  private def flatten(
      plan: LogicalPlan): (Seq[LogicalPlan], Seq[Expression], JoinTree) =
    plan match {
      case Join(l, r, Inner, cond, hint) if hint == JoinHint.NONE =>
        val (lp, lc, lt) = flatten(l)
        val (rp, rc, rt) = flatten(r)
        (lp ++ rp, lc ++ rc ++ cond.toSeq.flatMap(splitConjunctivePredicates),
          Node(lt, shift(rt, lp.size)))
      case Project(pl, child: Join) if pl.forall(_.isInstanceOf[Attribute]) =>
        flatten(child)
      case Filter(cond, child: Join) =>
        val (p, c, t) = flatten(child)
        (p, c ++ splitConjunctivePredicates(cond), t)
      // leaves keep their own Filter/Project: the filter's selectivity
      // flows into leaf stats, which is exactly what the cost model wants
      case other => (Seq(other), Nil, Leaf(0))
    }

  private def shift(t: JoinTree, by: Int): JoinTree = t match {
    case Leaf(i)    => Leaf(i + by)
    case Node(l, r) => Node(shift(l, by), shift(r, by))
  }

  private def reorder(
      original: LogicalPlan,
      rels: Vector[LogicalPlan],
      conditions: Seq[Expression],
      currentShape: JoinTree): Option[LogicalPlan] = {
    if (rels.size > 63) return None

    // which relation does each attribute come from? (keyed by exprId —
    // Attribute case-class equality is qualifier-sensitive and misses)
    val relOf: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Int] =
      (for {
        (r, i) <- rels.zipWithIndex
        a <- r.output
      } yield a.exprId -> i).toMap

    def relsOf(e: Expression): Set[Int] =
      e.references.toSeq.flatMap(a => relOf.get(a.exprId)).toSet

    // equi-conditions between exactly two relations become graph edges;
    // everything else is re-applied as a post-join filter
    val (edgeConds, filterConds) = conditions.partition { c =>
      c.isInstanceOf[EqualTo] && relsOf(c).size == 2
    }
    if (GraftJoinReorder.debug)
      println(s"[graft-reorder] edgeConds=${edgeConds.size} " +
        s"filterConds=${filterConds.size} " +
        s"condRels=${conditions.map(relsOf).mkString(",")}")
    if (edgeConds.isEmpty) return None

    val edgeMap = edgeConds
      .groupBy(c => { val s = relsOf(c); (s.min, s.max) })
    val edges = edgeMap.toVector.sortBy(_._1).map { case ((a, b), cs) =>
      JoinEdge(a, b, cs.flatMap(condCols(a, b, relOf.get)))
    }
    val g = QueryGraph(rels.indices.map(i => s"r$i").toVector, edges)
    if (!g.connected(g.full)) return None // cross-product component: leave it

    // statistics source: "plan" (default) costs from logical-plan
    // stats; "measured" runs the deployed stats → estimate loop — the
    // SAME memoized TableStats profiles and Selinger estimator p10
    // plans with, resolved from the leaves' parquet scans, so
    // arbitrary spark.sql text gets measured-cardinality join
    // ordering (reference anchor: MyMetadataQuery.java:81-162 —
    // injected cards driving in-planner reordering; here they are
    // measured, not injected); "hist" is "measured" plus equi-depth
    // histogram range selectivity (the p18 tier); "sample" estimates
    // from driver-held join-sample synopses ([[SampleEstimator]] —
    // the only tier that sees cross-relation correlation; sample
    // values are keyed (vertex, column) driver-side, so JOB-style
    // repeated tables and shared column names are safe — the p21
    // gate). Falls back to plan stats whenever a leaf isn't a plain
    // filtered parquet scan or an edge lacks extractable key columns.
    val statsMode =
      conf.getConfString("spark.graft.joinReorder.stats", "plan")
    val keyed = edges.forall(_.conds.nonEmpty)
    // "auto" routes per query: histogram estimates by default,
    // escalated to sample synopses when the AutoEstimator trigger
    // detects cross-relation correlation (a ≤3-subset whose sample
    // and independence estimates disagree ≥10×) — the measured
    // default-vs-insurance split from EXPERIMENT_r12 §2, now a
    // decision instead of a knob
    // "feedback" is the LEO tier: observed row counts harvested from
    // previously EXECUTED plans (ExecutionFeedback.harvest) override
    // the histogram estimates subset-by-subset — the reference's
    // execute→record-true-cards→re-plan loop (pg.json →
    // MyMetadataQuery.java:81-162) closed inside the engine.
    val cardOpt = statsMode match {
      case "measured" if keyed => measuredCardinality(g, rels)
      case "hist" if keyed => measuredCardinality(g, rels, hist = true)
      case "sample" if keyed => sampleCardinality(g, rels)
      case "auto" if keyed => autoCardinality(g, rels)
      case "feedback" if keyed => feedbackCardinality(g, rels, edges)
      case _ => None
    }
    val card = cardOpt.getOrElse {
      // rowCount when the plan supplies it, sizeInBytes proxy
      // otherwise — bytes are monotone-consistent but skew the PK–FK
      // selectivity toward WIDE tables (a 40-column dim can
      // out-"weigh" a narrow fact); rows are the quantity the cost
      // model actually means
      HeuristicCardinality.uniform(g, rels.map(leafRows).toArray)
    }

    // past the exact-search budget, GOO (greedy-bushy) is the measured
    // fallback: on the JOB-scale corpus under truth cardinalities it
    // plans at geomean 1.04× / max 1.5× of exact vs Greedy-Lopt's
    // 1.48× / 7.4× and IKKBZ's 2.1× / 23×, stays ≤1.05 under every
    // estimator tier, and is the cheapest planner measured (1.1 ms
    // median, SCALE_r12 §2). Enumerators.Auto keeps its IKKBZ route —
    // it mirrors the REFERENCE's refusal-boundary policy; this
    // fallback is our deployment choice, so it follows the data.
    val planner: JoinOrderPlanner =
      if (rels.size <= maxDpRelations) Enumerators.DPccp else Enumerators.Bushy
    val tree = planner.plan(g, card, CostModel.Cout).tree

    // STRICT-improvement gate: rewrite only when the chosen order beats
    // the plan's current order under the same model. This is what makes
    // the rule a fixpoint: other rules (filter pushdown, pruning) copy
    // join nodes and drop the REORDERED tag, so without it the rule
    // re-fires every optimizer iteration — re-running DPccp up to
    // maxIterations times per query and ping-ponging between equal-cost
    // orders (observed: ~0.5 s planning overhead on d02). Cost strictly
    // decreases on every rewrite, so the batch converges immediately.
    val chosenCost = CostModel.treeCost(tree, CostModel.Cout, card)
    val currentCost = CostModel.treeCost(currentShape, CostModel.Cout, card)
    if (GraftJoinReorder.debug)
      println(s"[graft-reorder] statsMode=$statsMode chosen=$chosenCost " +
        s"current=$currentCost tree=${tree.describe(g)}")
    if (chosenCost >= currentCost) return None

    // PHYSICAL steering from the ladder's estimates (the MM cost
    // model's hash-vs-INL choice has this role in the reference,
    // MyMetadataQuery.java:164-196): when a side's ESTIMATED bytes
    // (estimated rows × measured per-row width) fit under the
    // broadcast threshold, attach a BROADCAST hint — plan-stats sizes
    // can't see filter selectivity without CBO, so a tiny-after-filter
    // side would otherwise sort-merge. Only estimate-backed modes
    // qualify; an estimate is strictly better information than the
    // byte-proxy Spark would use.
    val widths: Option[Array[Double]] =
      if (cardOpt.isEmpty || conf.autoBroadcastJoinThreshold <= 0 ||
          !conf.getConfString(
            "spark.graft.joinReorder.broadcastHints", "true").toBoolean) None
      else leafWidths(rels)

    def build(t: JoinTree): LogicalPlan = t match {
      case Leaf(i) => rels(i)
      case Node(l, r) =>
        val lp = build(l); val rp = build(r)
        def in(s: Long, i: Int) = ((s >> i) & 1L) == 1L
        val conds = edgeMap.collect {
          case ((a, b), cs)
              if (in(l.set, a) && in(r.set, b)) ||
                (in(l.set, b) && in(r.set, a)) => cs
        }.flatten.toSeq
        val cond = conds.reduceOption(And)
        val hint = widths.map { w =>
          def estBytes(s: Long): Double = {
            var width = 0.0; var rest = s
            while (rest != 0) {
              width += w(java.lang.Long.numberOfTrailingZeros(rest))
              rest &= rest - 1
            }
            card(s) * width
          }
          val (bl, br) = (estBytes(l.set), estBytes(r.set))
          val th = conf.autoBroadcastJoinThreshold.toDouble
          val (mn, mx) = (math.min(bl, br), math.max(bl, br))
          // SHUFFLE_HASH tier below BROADCAST (the rest of the MM
          // model's hash-vs-sort choice): too big to ship to every
          // executor, small enough per shuffle partition to hash —
          // Spark's OWN local-hash-map criteria (size ≤ threshold ×
          // shuffle partitions, ≥3× smaller than the probe side),
          // evaluated on the ladder's estimates instead of the
          // filter-blind plan-stats bytes, skipping both sorts.
          val strat =
            if (mn <= th) Some(BROADCAST)
            else if (mn <= th * conf.numShufflePartitions && mn * 3 <= mx &&
                conf.getConfString(
                  "spark.graft.joinReorder.shuffleHashHints", "true").toBoolean)
              Some(SHUFFLE_HASH)
            else None
          strat.map { s =>
            val info = HintInfo(strategy = Some(s))
            if (bl <= br) JoinHint(Some(info), None)
            else JoinHint(None, Some(info))
          }.getOrElse(JoinHint.NONE)
        }.getOrElse(JoinHint.NONE)
        val join = Join(lp, rp, Inner, cond, hint)
        join.setTagValue(REORDERED, true)
        join
    }

    val joined = build(tree)
    val filtered = filterConds.reduceOption(And)
      .map(Filter(_, joined)).getOrElse(joined)
    // preserve the original output attribute order (the reference's
    // createTopProject, MyLoptOptimizeJoinRule.java:517-580)
    Some(Project(original.output, filtered))
  }

  /** The equi-condition's key column on each endpoint — (col on `a`,
    * col on `b`), looking through casts; None when either side isn't
    * a (possibly cast) base-table attribute. */
  private def condCols(a: Int, b: Int,
      relOf: org.apache.spark.sql.catalyst.expressions.ExprId => Option[Int])(
      c: Expression): Option[(String, String)] = {
    def side(e: Expression): Option[(Int, String)] = e match {
      case at: Attribute => relOf(at.exprId).map(i => (i, at.name))
      case ct: org.apache.spark.sql.catalyst.expressions.Cast => side(ct.child)
      case _ => None
    }
    c match {
      case EqualTo(l, r) =>
        (side(l), side(r)) match {
          case (Some((il, nl)), Some((ir, nr))) if il == a && ir == b =>
            Some((nl, nr))
          case (Some((il, nl)), Some((ir, nr))) if il == b && ir == a =>
            Some((nr, nl))
          case _ => None
        }
      case _ => None
    }
  }

  /** A flattened leaf's backing parquet scan as (dir, table) — STRICT
    * shape match (Project/Filter chain over a v1 file relation whose
    * root is a single `<table>.parquet` path): a leaf that is itself
    * an aggregate or subquery must NOT have an inner scan's stats
    * attributed to it. */
  @annotation.tailrec
  private def baseScanOf(plan: LogicalPlan): Option[String] = plan match {
    case p: Project => baseScanOf(p.child)
    case f: Filter => baseScanOf(f.child)
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

  /** stats=auto in the optimizer: resolve leaves like the other
    * modes, estimate from HISTOGRAM profiles by default, and escalate
    * to [[sampleCardinality]] only when [[AutoEstimator]]'s
    * correlation trigger fires on the query — evaluated driver-side
    * against the amortized unfiltered full-width synopses, so an
    * unflagged query never pays a sample-collection scan. None (→
    * plan stats) only when a leaf isn't a plain filtered scan. */
  private def autoCardinality(
      g: QueryGraph, rels: Vector[LogicalPlan]): Option[Cardinality] =
    try {
      val spark = org.apache.spark.sql.SparkSession.active
      val names = Vector.newBuilder[String]
      val dirs = Vector.newBuilder[String]
      val conjs = Vector.newBuilder[Seq[Expression]]
      val profiles = Vector.newBuilder[StatsEstimator.Profile]
      rels.foreach { leaf =>
        baseScanOf(leaf) match {
          case None => return None
          case Some(path) =>
            val slash = path.lastIndexOf('/')
            val dir = path.substring(0, slash)
            names += path.substring(slash + 1).stripSuffix(".parquet")
            dirs += dir
            conjs += leaf.collect {
              case Filter(c, _) => splitConjunctivePredicates(c)
            }.flatten
            profiles += StatsEstimator.profileTableHist(spark, dir,
              path.substring(slash + 1).stripSuffix(".parquet"))
        }
      }
      val (ns, ds, cs, ps) =
        (names.result(), dirs.result(), conjs.result(), profiles.result())
      val sels = Vector.tabulate(g.n)(i =>
        cs(i).map(conjSel(spark, ds(i), ns(i), ps(i))).product)
      val hist = StatsEstimator.cardinalityWithSel(g, ps, sels)
      if (ds.distinct.size != 1) return Some(hist) // no synopsis dir: stay hist
      val vf = Vector.tabulate(g.n)(i => AutoEstimator.fromCatalyst(cs(i), ps(i)))
      val flags = AutoEstimator.escalationFlags(spark, ds.head,
        g.copy(relations = ns), vf, hist)
      if (GraftJoinReorder.debug && flags.nonEmpty)
        println(s"[graft-reorder] auto escalated: ${flags.size} flagged subsets")
      if (flags.isEmpty) Some(hist)
      else sampleCardinality(g, rels).orElse(Some(hist))
    } catch {
      case scala.util.control.NonFatal(e) =>
        if (GraftJoinReorder.debug)
          println(s"[graft-reorder] auto fallback: $e")
        None
    }

  /** stats=feedback: the histogram-tier estimates with every subset
    * the workload has ALREADY EXECUTED overridden by its observed row
    * count ([[ExecutionFeedback]]) — LEO's adjustment-with-fallback.
    * Leaf keys use the leaves' own Catalyst conjuncts, normalized by
    * the same function the harvest side uses, so a repeated table
    * under different filters gets distinct observations (the
    * reference's filter-qualified keys, MyMetadataQuery.java:134-146).
    * None (→ plan stats) when a leaf isn't a plain filtered scan. */
  private def feedbackCardinality(
      g: QueryGraph, rels: Vector[LogicalPlan],
      edges: Vector[JoinEdge]): Option[Cardinality] =
    measuredCardinality(g, rels, hist = true).map { fallback =>
      val leafKeys = rels.map { leaf =>
        // FULL path (not just the table name), matching the harvest
        // side's key — cross-catalog table-name collisions must miss
        val table = baseScanOf(leaf) match {
          case Some(path) => path.stripSuffix(".parquet")
          case None => return None // unreachable: measured already resolved
        }
        val conj = leaf.collect {
          case Filter(c, _) => splitConjunctivePredicates(c)
        }.flatten
        ExecutionFeedback.leafKey(table, conj)
      }
      // edge endpoints qualified by the owning leaf's key — the same
      // qualification the harvest side derives from scan outputs, so
      // identically-named columns of different leaves (self-joins)
      // can never collapse to one edge string (ADVICE r13)
      val edgeStrs = edges.map(e => (e.a, e.b) ->
        e.conds.map { case (ca, cb) => ExecutionFeedback.edgeKey(
          s"${leafKeys(e.a)}.$ca", s"${leafKeys(e.b)}.$cb") })
        .toMap
      new ExecutionFeedback.FeedbackCardinality(g, leafKeys, edgeStrs, fallback)
    }

  /** Per-leaf bytes-per-row for the broadcast-hint arithmetic: the
    * leaf's plan-stats sizeInBytes (column pruning already applied by
    * Catalyst's size visitor) over the table's MEASURED row count —
    * the profile is memoized, so this re-reads a cached number. None
    * when any leaf isn't a plain scan (no hints rather than wrong
    * ones). */
  private def leafWidths(rels: Vector[LogicalPlan]): Option[Array[Double]] =
    try {
      val spark = org.apache.spark.sql.SparkSession.active
      val out = Array.ofDim[Double](rels.size)
      var i = 0
      while (i < rels.size) {
        baseScanOf(rels(i)) match {
          case None => return None
          case Some(path) =>
            val slash = path.lastIndexOf('/')
            val p = StatsEstimator.profileTable(spark,
              path.substring(0, slash),
              path.substring(slash + 1).stripSuffix(".parquet"))
            out(i) = math.max(
              rels(i).stats.sizeInBytes.toDouble / math.max(p.rows, 1.0), 1.0)
        }
        i += 1
      }
      Some(out)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-conjunct selectivity for the measured/hist tiers: the shapes
    * the per-column ladder cannot price — LIKE (incl. the StartsWith/
    * EndsWith/Contains forms LikeSimplification produces), IN/NOT IN
    * lists, and OR-disjunctions of atomic predicates — are priced by
    * row-wise evaluation over the table's AMORTIZED full-width
    * synopsis ([[AutoEstimator.clauseSelectivity]] — the same cached
    * 2,000 rows the auto trigger filters; the FIRST like/in-bearing
    * query per table pays that one collection scan at PLANNING time —
    * every later query reads the memo. Deployments that care can warm
    * it off the query path: one [[AutoEstimator.fullSynopsis]] call
    * per table at ANALYZE time populates the same cache —
    * ADVICE r14). Everything else keeps
    * [[StatsEstimator.selectivityOfCatalyst]]'s ladder. This
    * completes the reference's JOB predicate language in the
    * estimator (the reference string-parses =, ranges, LIKE, IN,
    * BETWEEN, OR — MyUtils.java:152-180; BETWEEN reaches us as its
    * two range conjuncts, already histogram-priced). A/B gates:
    * `spark.graft.joinReorder.likeSel` (LIKE, p25) and
    * `spark.graft.joinReorder.inSel` (IN/OR, p27). */
  private def conjSel(spark: org.apache.spark.sql.SparkSession,
      dir: String, table: String, p: StatsEstimator.Profile)(
      c: Expression): Double = {
    def gate(name: String) =
      conf.getConfString(s"spark.graft.joinReorder.$name", "true").toBoolean
    val clause = AutoEstimator.convClause(c) match {
      case Some(Some(cl)) if AutoEstimator.synopsisPriced(cl) =>
        val isLike = cl.alts.size == 1 &&
          (cl.alts.head.op == "like" || cl.alts.head.op == "notlike")
        if (if (isLike) gate("likeSel") else gate("inSel")) Some(cl) else None
      case _ => None
    }
    clause.flatMap { cl =>
      try AutoEstimator.clauseSelectivity(spark, dir, table, cl)
      catch { case scala.util.control.NonFatal(_) => None }
    }.getOrElse(StatsEstimator.selectivityOfCatalyst(p)(c))
  }

  /** The measured-stats [[Cardinality]]: per-leaf [[TableStats]]
    * profiles (memoized — ANALYZE runs once per table, plans are made
    * many times) with filter selectivities estimated from the leaves'
    * own Catalyst predicates. None when any leaf isn't a plain
    * filtered parquet scan, or profiling fails — the caller falls
    * back to plan statistics, so the rule can never make a query
    * unplannable. */
  private def measuredCardinality(
      g: QueryGraph, rels: Vector[LogicalPlan],
      hist: Boolean = false): Option[Cardinality] =
    try {
      val spark = org.apache.spark.sql.SparkSession.active
      val profiles = Vector.newBuilder[StatsEstimator.Profile]
      val sels = Vector.newBuilder[Double]
      rels.foreach { leaf =>
        baseScanOf(leaf) match {
          case None => return None
          case Some(path) =>
            val slash = path.lastIndexOf('/')
            val dir = path.substring(0, slash)
            val table = path.substring(slash + 1).stripSuffix(".parquet")
            val p =
              if (hist) StatsEstimator.profileTableHist(spark, dir, table)
              else StatsEstimator.profileTable(spark, dir, table)
            val conj = leaf.collect {
              case Filter(c, _) => splitConjunctivePredicates(c)
            }.flatten
            profiles += p
            sels += conj.map(conjSel(spark, dir, table, p)).product
        }
      }
      Some(StatsEstimator.cardinalityWithSel(g, profiles.result(),
        sels.result()))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The join-sample synopsis [[Cardinality]] for in-optimizer use:
    * leaves resolved to (dir, table), Catalyst filter conjuncts
    * rendered back to SQL text for the sample collector. Repeated
    * tables (JOB self-joins) are fine: [[SampleEstimator]] keys
    * sample values by (vertex, column) and prices a tuple by its
    * DISTINCT base rows. None (→ plan stats) when a leaf isn't a
    * plain filtered scan, leaves span different directories, or a
    * predicate doesn't render — the rule can never make a query
    * unplannable. */
  private def sampleCardinality(
      g: QueryGraph, rels: Vector[LogicalPlan]): Option[Cardinality] =
    try {
      val spark = org.apache.spark.sql.SparkSession.active
      val names = Vector.newBuilder[String]
      val dirs = Vector.newBuilder[String]
      val filters = Vector.newBuilder[Option[String]]
      val profiles = Vector.newBuilder[StatsEstimator.Profile]
      rels.foreach { leaf =>
        baseScanOf(leaf) match {
          case None => return None
          case Some(path) =>
            val slash = path.lastIndexOf('/')
            val dir = path.substring(0, slash)
            val table = path.substring(slash + 1).stripSuffix(".parquet")
            val conj = leaf.collect {
              case Filter(c, _) => splitConjunctivePredicates(c)
            }.flatten
            names += table
            dirs += dir
            // render UNQUALIFIED: the leaf's attributes carry the SQL
            // alias as qualifier (`e1.event_type`), which can't resolve
            // against the bare table the sample collector loads
            val bare = conj.map(_.transform {
              case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
                a.withQualifier(Seq.empty)
            })
            filters += (if (bare.isEmpty) None
              else Some(bare.map(_.sql).mkString(" AND ")))
            profiles += StatsEstimator.profileTable(spark, dir, table)
        }
      }
      val (ns, ds) = (names.result(), dirs.result())
      if (ds.distinct.size != 1) return None
      if (GraftJoinReorder.debug)
        println(s"[graft-reorder] sample rels=$ns filters=${filters.result()}")
      Some(SampleEstimator.cardinality(spark, ds.head,
        g.copy(relations = ns), filters.result(), profiles.result()))
    } catch {
      case scala.util.control.NonFatal(e) =>
        if (GraftJoinReorder.debug)
          println(s"[graft-reorder] sample fallback: $e")
        None
    }
}

object GraftJoinReorder {
  /** Planner statistics for one flattened leaf: `rowCount` when stats
    * carry it (CBO / ANALYZE'd tables / Range), else `sizeInBytes`. */
  def leafRows(plan: LogicalPlan): Double =
    plan.stats.rowCount.map(_.toDouble).filter(_ > 0)
      .getOrElse(plan.stats.sizeInBytes.toDouble).max(1.0)

  /** joins with more relations than this use greedy instead of DPccp */
  val maxDpRelations = 12
  /** scratch debug switch (tools/ReorderDebug*) */
  @volatile var debug = false
  val REORDERED: TreeNodeTag[Boolean] = TreeNodeTag[Boolean]("graft.reordered")
}
