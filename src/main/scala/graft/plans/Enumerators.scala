package graft.plans

import scala.collection.mutable

/** A chosen join order with its cost breakdown — the per-planner record
  * the reference keeps per query (reference: Query.java:9-46 —
  * costs/joinOrders/planningTimes per planner). */
final case class PlannedOrder(
    planner: String,
    tree: JoinTree,
    cost: Double,
    perJoinCosts: Vector[Double],
    planningNanos: Long) {
  def joinStr(g: QueryGraph): String = tree.describe(g)
}

/** A join-order search strategy over a [[QueryGraph]] — the Spark-first
  * analog of the reference's five `RelOptRule`s firing on MultiJoin
  * (SURVEY.md §2b). Instead of mutating a Volcano planner we emit a
  * [[JoinTree]]; [[JoinTreeExecutor]] then constructs the DataFrame join
  * tree in exactly that order. */
/** A planner DECLINING a query it considers out of budget (the
  * reference's ≥12-edge refusal, ExhaustiveJoinOrderRule.java:107-109)
  * — a policy decision, not a bug. Distinct from the
  * IllegalArgumentException a genuine invariant violation raises, so
  * the experiment loop can record refusals without swallowing real
  * failures (estimator/cost-model `require`s must propagate). */
final class PlanningRefused(msg: String) extends IllegalArgumentException(msg)

trait JoinOrderPlanner {
  def name: String
  protected def search(g: QueryGraph, card: Cardinality, cm: CostModel): JoinTree

  final def plan(g: QueryGraph, card: Cardinality, cm: CostModel): PlannedOrder = {
    val t0 = System.nanoTime()
    val tree = search(g, card, cm)
    val dt = System.nanoTime() - t0
    PlannedOrder(name, tree, CostModel.treeCost(tree, cm, card),
      CostModel.perJoinCosts(tree, cm, card), dt)
  }
}

object Enumerators {

  /** Iterate non-empty subsets of `mask` (standard sub = (sub-1)&mask). */
  @inline private def foreachSubset(mask: Long)(f: Long => Unit): Unit = {
    var sub = mask
    while (sub != 0) { f(sub); sub = (sub - 1) & mask }
  }

  /** DPccp — dynamic programming over connected-subgraph / connected-
    * complement pairs (Moerkotte & Neumann, "Analysis of Two Existing
    * and One New Dynamic Programming Algorithm …", VLDB'06 — the same
    * algorithm the reference implements in
    * ExhaustiveDPJoinOrderRule.java:86-211 with the csg-cmp iterator in
    * QueryGraph.java:607-741). Optimal over bushy trees without cross
    * products. */
  case object DPccp extends JoinOrderPlanner {
    val name = "dpccp"

    protected def search(g: QueryGraph, card: Cardinality, cm: CostModel): JoinTree = {
      require(g.connected(g.full), "DPccp requires a connected join graph")

      // Phase 1: enumerate every csg-cmp pair exactly once (paper §4.2).
      // Connectivity checks are unnecessary by construction: growing a
      // connected set by any subset of its neighborhood stays connected.
      val pairs = mutable.ArrayBuffer.empty[(Long, Long)]
      def bMask(i: Int): Long = (1L << (i + 1)) - 1 // B_i = {0..i}

      def enumerateCmpRec(s1: Long, s2: Long, x: Long): Unit = {
        val ns = g.neighbors(s2) & ~x
        if (ns == 0) return
        foreachSubset(ns) { sub => pairs += ((s1, s2 | sub)) }
        foreachSubset(ns) { sub => enumerateCmpRec(s1, s2 | sub, x | ns) }
      }

      def emitCmp(s1: Long): Unit = {
        val minV = java.lang.Long.numberOfTrailingZeros(s1)
        val x = s1 | bMask(minV)
        val ns = g.neighbors(s1) & ~x
        var i = g.n - 1
        while (i >= 0) {
          if ((ns & (1L << i)) != 0) {
            pairs += ((s1, 1L << i))
            enumerateCmpRec(s1, 1L << i, x | (bMask(i) & ns))
          }
          i -= 1
        }
      }

      def enumerateCsgRec(s: Long, x: Long): Unit = {
        val ns = g.neighbors(s) & ~x
        if (ns == 0) return
        foreachSubset(ns) { sub => emitCmp(s | sub) }
        foreachSubset(ns) { sub => enumerateCsgRec(s | sub, x | ns) }
      }

      var i = g.n - 1
      while (i >= 0) {
        emitCmp(1L << i)
        enumerateCsgRec(1L << i, bMask(i))
        i -= 1
      }

      // Phase 2: DP over the pairs in increasing union-size order — every
      // proper connected subplan is strictly smaller, so its memo entry
      // exists by the time a pair consuming it is priced.
      val best = mutable.LongMap.empty[(JoinTree, Double)]
      (0 until g.n).foreach { j => best(1L << j) = (Leaf(j), 0.0) }

      def tryJoin(s1: Long, s2: Long): Unit = {
        val (t1, c1) = best(s1); val (t2, c2) = best(s2)
        val union = s1 | s2
        // both operand orders, like the reference (ExhaustiveDPJoinOrderRule.java:151-156)
        var bestHere = best.getOrElse(union, (null: JoinTree, Double.PositiveInfinity))
        // the `bestHere._1 == null` arms: costs can be INFINITE (a
        // checkpointed/RDD-backed leaf defaults to sizeInBytes =
        // Long.MaxValue and Cout's products overflow), and `inf < inf`
        // is false — without them the memo stores (null, ∞) and a later
        // tryJoin NPEs on the null operand (found by g19's gate run
        // under the injected rule). A valid tree at infinite cost is
        // still a plan; the strict-improvement gate upstream then
        // simply declines to rewrite.
        val cA = c1 + c2 + cm.joinCost(t1, t2, card)
        if (cA < bestHere._2 || bestHere._1 == null)
          bestHere = (Node(t1, t2), cA)
        val cB = c1 + c2 + cm.joinCost(t2, t1, card)
        if (cB < bestHere._2) bestHere = (Node(t2, t1), cB)
        best(union) = bestHere
      }

      pairs.sortInPlaceBy(p => java.lang.Long.bitCount(p._1 | p._2))
      pairs.foreach { case (s1, s2) => tryJoin(s1, s2) }

      require(best.contains(g.full),
        "DPccp memo missing full set — enumeration bug") // analog of ExhaustiveDPJoinOrderRule.java:176-181
      best(g.full)._1
    }
  }

  /** Naive optimal bushy DP over connected subsets (O(3^n)) — simple and
    * obviously correct; used as the test oracle for DPccp, and as the
    * small-n fallback. */
  case object NaiveDP extends JoinOrderPlanner {
    val name = "naivedp"
    protected def search(g: QueryGraph, card: Cardinality, cm: CostModel): JoinTree = {
      val memo = mutable.LongMap.empty[(JoinTree, Double)]
      def solve(s: Long): (JoinTree, Double) = memo.getOrElseUpdate(s, {
        if (java.lang.Long.bitCount(s) == 1)
          (Leaf(java.lang.Long.numberOfTrailingZeros(s)), 0.0)
        else {
          var bestT: JoinTree = null; var bestC = Double.PositiveInfinity
          foreachSubset(s) { s1 =>
            val s2 = s & ~s1
            if (s1 != s && s1 != 0 && s1 > s2 && g.connected(s1) &&
                g.connected(s2) && g.crossEdges(s1, s2).nonEmpty) {
              val (t1, c1) = solve(s1); val (t2, c2) = solve(s2)
              Seq((t1, t2), (t2, t1)).foreach { case (a, b) =>
                val c = c1 + c2 + cm.joinCost(a, b, card)
                // accept the first candidate even at infinite cost
                // (inf < inf is false — see DPccp.tryJoin)
                if (c < bestC || bestT == null) { bestC = c; bestT = Node(a, b) }
              }
            }
          }
          require(bestT != null, s"subset $s not joinable without cross product")
          (bestT, bestC)
        }
      })
      solve(g.full)._1
    }
  }

  /** Selinger-style left-deep DP (reference:
    * LeftDeepJoinOrderRule.java:68-204 — extend the best (k−1)-subset
    * plan by one factor reachable over a join edge, exactly as the
    * reference's getSubsets/extend loop at :209-225). Optimal within the
    * left-deep space.
    *
    * Enumeration is frontier-driven: level k is generated by extending
    * level k−1's dp entries with their graph neighbors, so only
    * reachable CONNECTED subsets are ever touched — a 20-relation chain
    * visits O(n²) subsets, not 2^20 (the round-1 version scanned
    * 0..2^n longs per level). */
  case object LeftDeepDP extends JoinOrderPlanner {
    val name = "leftdeep"
    protected def search(g: QueryGraph, card: Cardinality, cm: CostModel): JoinTree = {
      val dp = mutable.LongMap.empty[(JoinTree, Double)]
      var level = new Array[Long](g.n)
      (0 until g.n).foreach { i =>
        dp(1L << i) = (Leaf(i), 0.0); level(i) = 1L << i
      }
      for (_ <- 2 to g.n) {
        val next = mutable.LongMap.empty[(JoinTree, Double)]
        level.foreach { s =>
          val (t, c) = dp(s)
          var cand = g.neighbors(s)
          while (cand != 0) {
            val i = java.lang.Long.numberOfTrailingZeros(cand)
            val grown = s | (1L << i)
            val cost = c + cm.joinCost(t, Leaf(i), card)
            // the null arm admits infinite-cost extensions (see
            // DPccp.tryJoin) — otherwise the frontier empties and the
            // "disconnected" require fires on a connected graph
            val cur = next.getOrElse(grown, (null: JoinTree, Double.PositiveInfinity))
            if (cost < cur._2 || cur._1 == null)
              next(grown) = (Node(t, Leaf(i)), cost)
            cand &= cand - 1
          }
        }
        next.foreach { case (s, v) => dp(s) = v }
        level = next.keys.toArray
      }
      require(dp.contains(g.full), "leftdeep: graph disconnected")
      dp(g.full)._1
    }
  }

  /** Greedy heuristic — the behavioral core of the reference's 2113-line
    * MyLoptOptimizeJoinRule (SURVEY.md §2b), re-expressed faithfully:
    *
    *  - per first factor, build an ordering and keep the best-by-cost
    *    full tree (findBestOrderings, MyLoptOptimizeJoinRule.java:462-504)
    *  - next factor = highest edge WEIGHT to the placed factors, ties
    *    broken by HIGHER join-key NDV (getBestNextFactor, :788-863 —
    *    `factorWeights` then `computeJoinCardinality` which is
    *    getDistinctRowCount of the join keys, :638). Every direct
    *    two-factor filter scores the CONSTANT 3 (Calcite's
    *    setFactorWeight), so among directly-connected candidates the
    *    NDV tie-break does all the discrimination.
    *  - each addition prices add-to-top AGAINST push-down into the
    *    deepest subtree covering the factor's join partners and keeps
    *    the cheaper (addFactorToTree/addToTop/pushDownFactor, :899-1012;
    *    cost ties go to top — we model no row widths, :1024-1037).
    *
    * Unlike the round-1 version this explores bushy shapes via
    * push-down, so on star/bushy graphs it tracks the reference's
    * choices instead of the cheapest-next-edge left-deep chain. */
  case object Greedy extends JoinOrderPlanner {
    val name = "greedy"

    /** Calcite's LoptMultiJoin.setFactorWeight constant for a direct
      * two-factor filter. */
    private val DirectEdgeWeight = 3

    /** Edge weight between the placed set and candidate `f`: the MAX
      * pairwise factor weight over the cross edges — the reference's
      * `findBestOrderings` reads a per-factor-pair `factorWeights` matrix
      * where any direct two-factor filter scores the CONSTANT 3
      * (Calcite's LoptMultiJoin.setFactorWeight) regardless of how many
      * conditions the filter carries, so neither a cycle-closing
      * candidate (2 edges — the round-2 SUM bug) nor a composite-key
      * candidate (1 edge, 2 conds — the round-3 `conds.size` bug)
      * outweighs a single-key candidate; the NDV tie-break does all the
      * discrimination among directly-connected candidates. */
    private def weight(g: QueryGraph, placed: Long, f: Int): Int =
      if (g.crossEdges(placed, 1L << f).nonEmpty) DirectEdgeWeight else 0

    /** NDV of the candidate's join-key columns w.r.t. the placed set
      * (reference computeJoinCardinality, :594-641). */
    private def joinKeyNdv(
        g: QueryGraph, card: Cardinality, placed: Long, f: Int): Double = {
      val cols = g.crossEdges(placed, 1L << f).flatMap { e =>
        e.conds.map(c => if (e.a == f) c._1 else c._2)
      }.distinct
      card.ndv(f, cols)
    }

    /** Deepest subtree whose relation set covers every placed join
      * partner of `f`; replacing it with Node(subtree, f) is the
      * push-down alternative (pushDownFactor, :1090-1293). Returns None
      * when only the whole tree covers them (push-down == add-to-top). */
    private def pushDown(g: QueryGraph, tree: JoinTree, f: Int): Option[JoinTree] = {
      val needed = g.neighbors(1L << f) & tree.set
      def insert(t: JoinTree): Option[JoinTree] = t match {
        case Node(l, r) if (needed & ~l.set) == 0 =>
          Some(Node(insert(l).getOrElse(Node(l, Leaf(f))), r))
        case Node(l, r) if (needed & ~r.set) == 0 =>
          Some(Node(l, insert(r).getOrElse(Node(r, Leaf(f)))))
        case _ => None
      }
      insert(tree)
    }

    protected def search(g: QueryGraph, card: Cardinality, cm: CostModel): JoinTree = {
      var bestT: JoinTree = null; var bestC = Double.PositiveInfinity
      (0 until g.n).foreach { first =>
        var tree: JoinTree = Leaf(first)
        var ok = true
        while (ok && java.lang.Long.bitCount(tree.set) < g.n) {
          // getBestNextFactor: max weight, then max join-key NDV
          var bi = -1; var bw = 0; var bndv = -1.0
          var rest = g.neighbors(tree.set)
          if (rest == 0) ok = false // disconnected graph
          while (rest != 0) {
            val i = java.lang.Long.numberOfTrailingZeros(rest)
            val w = weight(g, tree.set, i)
            val ndv = joinKeyNdv(g, card, tree.set, i)
            if (w > bw || (w == bw && ndv > bndv)) { bi = i; bw = w; bndv = ndv }
            rest &= rest - 1
          }
          if (ok) {
            // addFactorToTree: top vs push-down by cumulative cost
            val top = Node(tree, Leaf(bi))
            tree = pushDown(g, tree, bi) match {
              case Some(pushed)
                if CostModel.treeCost(pushed, cm, card) <
                   CostModel.treeCost(top, cm, card) => pushed
              case _ => top
            }
          }
        }
        if (ok) {
          val c = CostModel.treeCost(tree, cm, card)
          // accept the first complete tree even at infinite cost
          if (c < bestC || bestT == null) { bestC = c; bestT = tree }
        }
      }
      require(bestT != null, "greedy: graph disconnected")
      bestT
    }
  }

  /** Branch-and-bound over edge sequences (reference:
    * ExhaustiveJoinOrderRule.java:88-157 — recursively apply every join
    * edge to the collapsed graph, prune when costSoFar ≥ best; refuses
    * ≥ `maxEdges` edges, :107-109). Exact (bushy) — the cross-check
    * oracle for DPccp. */
  final case class BranchAndBound(maxEdges: Int = 12) extends JoinOrderPlanner {
    val name = "bnb"
    protected def search(g: QueryGraph, card: Cardinality, cm: CostModel): JoinTree = {
      if (g.edges.size >= maxEdges)
        throw new PlanningRefused(
          s"branch-and-bound refuses ≥$maxEdges edges (got ${g.edges.size})")
      // Seed the incumbent with Greedy's complete tree (textbook B&B
      // practice): pruning is active from the first branch instead of
      // only after the search stumbles onto its own first complete
      // tree. Without this the JOB-scale corpus exposed pure
      // enumeration: 10-12 relation trees under the edge bound ran
      // past the 600 s planning timeout (round-12 finding); with the
      // greedy bound they plan in milliseconds-to-seconds. The
      // incumbent is only a BOUND — any strictly better tree found
      // below replaces it, and correctness is unchanged (the greedy
      // tree is itself a valid complete join tree).
      val seed = Greedy.plan(g, card, cm)
      var bestC = seed.cost
      var bestT: JoinTree = if (bestC.isInfinite) null else seed.tree
      // Dominance memo on the remaining-factor partition (sorted
      // masks): permutations of the same merges reach the same state,
      // and on tie-heavy shapes (a PK star: every spoke order costs
      // the same) incumbent pruning alone never fires before the last
      // level — the second half of the round-12 blowup. A state
      // revisited at ≥ its best-known partial cost cannot improve.
      val seen = scala.collection.mutable.HashMap.empty[List[Long], Double]
      def rec(factors: List[JoinTree], costSoFar: Double): Unit = {
        // prune only once SOME complete tree exists: with all-infinite
        // costs (checkpointed leaves, see DPccp.tryJoin) `inf >= inf`
        // would otherwise prune every branch and return null
        if (bestT != null && costSoFar >= bestC) return // prune
        val key = factors.map(_.set).sorted
        if (seen.get(key).exists(_ <= costSoFar)) return
        seen(key) = costSoFar
        if (factors.size == 1) {
          if (java.lang.Long.bitCount(factors.head.set) == g.n) {
            bestC = costSoFar; bestT = factors.head
          }
          return
        }
        for {
          a <- factors; b <- factors
          if (a ne b) && g.crossEdges(a.set, b.set).nonEmpty && a.set < b.set
        } {
          val joinedAB = Node(a, b)
          val joinedBA = Node(b, a)
          val restF = factors.filter(f => (f ne a) && (f ne b))
          rec(joinedAB :: restF, costSoFar + cm.joinCost(a, b, card))
          rec(joinedBA :: restF, costSoFar + cm.joinCost(b, a, card))
        }
      }
      rec((0 until g.n).map(Leaf(_): JoinTree).toList, 0.0)
      require(bestT != null, "bnb: no complete join tree (graph disconnected?)")
      bestT
    }
  }

  /** Greedy-bushy heuristic — greedy operator ordering (GOO, Fegaras,
    * "A New Heuristic for Optimizing Large Queries", DEXA'98): repeatedly
    * merge the edge-connected component pair whose join RESULT is
    * smallest, growing a bushy forest bottom-up with no left-deep bias.
    * This is the reference's stock BUSHY planner variant — its enum maps
    * Calcite's MultiJoinOptimizeBushyRule, the same greedy-bushy family
    * (QueryOptExperiment.java:101-109; commented out of the reference's
    * Main but part of its planner vocabulary). Unlike [[Greedy]] (the
    * Lopt behavioral core: per-first-factor orderings, weight/NDV next-
    * factor choice, top-vs-push-down) this is symmetric in the pair and
    * needs no per-factor restarts. O(n·e) merges. */
  case object Bushy extends JoinOrderPlanner {
    val name = "bushy"
    protected def search(g: QueryGraph, card: Cardinality, cm: CostModel): JoinTree = {
      var comps: Vector[JoinTree] = Vector.tabulate(g.n)(Leaf(_))
      while (comps.size > 1) {
        val joinable = for {
          i <- comps.indices; j <- comps.indices
          if i < j && g.crossEdges(comps(i).set, comps(j).set).nonEmpty
        } yield (i, j)
        require(joinable.nonEmpty, "bushy: graph disconnected")
        // smallest join result; ties by smaller combined inputs, then by
        // lowest vertex sets for determinism
        val (bi, bj) = joinable.minBy { case (i, j) =>
          (card(comps(i).set | comps(j).set),
            card(comps(i).set) + card(comps(j).set),
            comps(i).set.min(comps(j).set))
        }
        // orientation by the cost model (build side choice), like the DP
        // planners price both operand orders
        val (l, r) = (comps(bi), comps(bj))
        val merged =
          if (cm.joinCost(l, r, card) <= cm.joinCost(r, l, card)) Node(l, r)
          else Node(r, l)
        comps = comps.zipWithIndex.collect {
          case (c, k) if k != bi && k != bj => c
        } :+ merged
      }
      comps.head
    }
  }

  /** Random valid order with a fixed seed (reference: the RL rule's
    * `reset` path picks random edges, RLJoinOrderRule.java:167-170, and
    * JoinOrderTest.java:85-174 shuffles factors). Deterministic given the
    * seed — usable as a query planner and as the RL env's behavior
    * baseline. */
  final case class RandomOrder(seed: Long = 42L) extends JoinOrderPlanner {
    val name = "random"
    protected def search(g: QueryGraph, card: Cardinality, cm: CostModel): JoinTree = {
      val rnd = new scala.util.Random(seed)
      var factors = Vector.tabulate(g.n)(Leaf(_): JoinTree)
      while (factors.size > 1) {
        val joinable = for {
          i <- factors.indices; j <- factors.indices
          if i < j && g.crossEdges(factors(i).set, factors(j).set).nonEmpty
        } yield (i, j)
        require(joinable.nonEmpty, "random: graph disconnected")
        val (i, j) = joinable(rnd.nextInt(joinable.size))
        val merged = Node(factors(i), factors(j))
        factors = factors.zipWithIndex.collect {
          case (f, k) if k != i && k != j => f
        } :+ merged
      }
      factors.head
    }
  }

  /** Simulated-annealing join-order search (the Ioannidis & Kang 1990
    * 2PO family's stochastic half — the classic enumerator between
    * the reference's random baseline and its learned policy: local
    * moves + a cooling schedule instead of uniform shuffles or a
    * trained Q-table). State = a left-deep permutation; start = the
    * BFS-from-relation-0 order (always cross-product-free on a
    * connected graph); move = swap two positions, REJECTED outright
    * if any prefix of the new permutation would need a cross product
    * (validity is structural, never priced); accept improvements
    * always and regressions with probability exp(−Δ/T) under a
    * geometric schedule T ← 0.95·T from T₀ = the start cost. Fully
    * deterministic given the seed; the best-ever valid order is
    * returned. Beats [[RandomOrder]] by construction (it starts
    * valid and only ever improves the incumbent best) and is the
    * cheap non-exhaustive fallback when n is past DPccp's range
    * ([[BranchAndBound]]'s refusal zone). */
  final case class Annealing(seed: Long = 17L, steps: Int = 200)
      extends JoinOrderPlanner {
    val name = "anneal"
    protected def search(g: QueryGraph, card: Cardinality, cm: CostModel): JoinTree = {
      require(g.connected(g.full), "anneal requires a connected join graph")
      // BFS order from relation 0: each appended relation touches the
      // visited set, so every prefix is connected
      val start = {
        val seen = mutable.ArrayBuffer(0)
        while (seen.size < g.n) {
          val next = (0 until g.n).find(i => !seen.contains(i) &&
            g.crossEdges(seen.map(1L << _).reduce(_ | _), 1L << i).nonEmpty)
          seen += next.getOrElse(
            sys.error("anneal: graph disconnected"))
        }
        seen.toVector
      }
      Enumerators.annealFrom(g, card, cm, start, seed, steps)
    }
  }

  /** 2PO — TWO-PHASE OPTIMIZATION (Ioannidis & Kang, SIGMOD'90): a
    * good deterministic heuristic seed, then simulated-annealing
    * refinement around it. Phase 1 here is [[Ikkbz]] (exact on
    * acyclic graphs, spanning-tree heuristic on cyclic — the paper
    * used iterative improvement; IKKBZ is the stronger published
    * seed), phase 2 is [[Annealing]]'s swap/accept schedule started
    * FROM that order instead of the BFS order. Never worse than its
    * seed (best-ever incumbent), usually the optimum on cyclic
    * graphs where IKKBZ alone drops edges from its spanning tree. */
  final case class TwoPhase(seed: Long = 17L, steps: Int = 200)
      extends JoinOrderPlanner {
    val name = "2po"
    protected def search(g: QueryGraph, card: Cardinality, cm: CostModel): JoinTree = {
      require(g.connected(g.full), "2po requires a connected join graph")
      val start = Ikkbz.plan(g, card, cm).tree.leaves
      Enumerators.annealFrom(g, card, cm, start, seed, steps)
    }
  }

  /** The annealing core shared by [[Annealing]] and [[TwoPhase]]:
    * left-deep permutation state from `start`, structural
    * cross-product rejection, exp(−Δ/T) acceptance, geometric
    * cooling, best-ever incumbent returned. */
  private def annealFrom(
      g: QueryGraph, card: Cardinality, cm: CostModel,
      start: Vector[Int], seed: Long, steps: Int): JoinTree = {
    {
      def treeOf(perm: Vector[Int]): Option[JoinTree] = {
        var acc: JoinTree = Leaf(perm.head)
        for (i <- perm.tail) {
          if (g.crossEdges(acc.set, 1L << i).isEmpty) return None
          acc = Node(acc, Leaf(i))
        }
        Some(acc)
      }
      def costOf(perm: Vector[Int]): Option[(JoinTree, Double)] =
        treeOf(perm).map(t => t -> CostModel.treeCost(t, cm, card))
      val rnd = new scala.util.Random(seed)
      var (curTree, curCost) = costOf(start).get
      var cur = start
      var (bestTree, bestCost) = (curTree, curCost)
      var temp = math.max(curCost, 1.0)
      for (_ <- 0 until steps) {
        val i = rnd.nextInt(g.n)
        val j = rnd.nextInt(g.n)
        if (i != j) {
          val prop = cur.updated(i, cur(j)).updated(j, cur(i))
          costOf(prop) match {
            case Some((t, c)) =>
              val accept = c <= curCost ||
                rnd.nextDouble() < math.exp((curCost - c) / temp)
              if (accept) {
                cur = prop; curTree = t; curCost = c
                if (c < bestCost) { bestTree = t; bestCost = c }
              }
            case None => // cross-product move: structurally rejected
          }
        }
        temp = math.max(temp * 0.95, 1e-9)
      }
      bestTree
    }
  }

  /** IKKBZ — the polynomial-time OPTIMAL left-deep enumerator for
    * acyclic query graphs under ASI cost functions (Ibaraki & Kameda,
    * TODS'84; Krishnamurthy, Boral & Zaniolo, VLDB'86; the
    * rank/normalize presentation follows Moerkotte, "Building Query
    * Compilers" §3.2.3). The classical third pole of the enumerator
    * space next to exponential exact DP (p01/p02) and unguaranteed
    * local search (p03/p11): O(n²) with a proof, on tree graphs, for
    * exactly the C_out metric the reference's MyCostFactory prices
    * (MyCostFactory.java:64-69).
    *
    * Per root: build the precedence tree, recursively normalize each
    * subtree into a rank-ascending chain of modules (merging a module
    * into its successor whenever rank(pred) > rank(succ) — the ASI
    * exchange argument makes the merged order locally forced), merge
    * sibling chains by ascending rank, and emit root ∷ chain; the best
    * root wins. rank(S) = (T(S)−1)/C(S) with T(i) = s_i·n_i,
    * C(i) = T(i), T(AB) = T(A)·T(B), C(AB) = C(A)+T(A)·C(B).
    *
    * CYCLIC graphs get the standard generalization (Steinbrunn,
    * Moerkotte & Kemper, VLDB J.'97 §4.1): run IKKBZ on the
    * maximum-selectivity-first spanning tree (Kruskal over ascending
    * edge selectivity). Exact on trees, heuristic on cycles; every
    * emitted prefix is connected in the spanning tree and therefore in
    * the full graph, so no cross products either way. Final candidate
    * trees are priced with the SESSION cost model, so under MM/CM2 the
    * ranks act as a (good) heuristic while the root choice stays
    * honest. */
  case object Ikkbz extends JoinOrderPlanner {
    val name = "ikkbz"

    /** A maximal run of relations forced into adjacency by
      * normalization, with its aggregate T (selectivity·rows product)
      * and C (ASI cost) values. */
    private final case class Module(rels: Vector[Int], t: Double, c: Double) {
      def rank: Double = if (c <= 0.0) 0.0 else (t - 1.0) / c
    }

    private def combine(a: Module, b: Module): Module =
      Module(a.rels ++ b.rels, a.t * b.t, a.c + a.t * b.c)

    /** Merge two rank-ascending chains into one (stable: ties keep the
      * left chain first, so the result is deterministic). */
    private def mergeByRank(a: List[Module], b: List[Module]): List[Module] =
      (a, b) match {
        case (Nil, ys) => ys
        case (xs, Nil) => xs
        case (x :: xs, y :: ys) =>
          if (x.rank <= y.rank) x :: mergeByRank(xs, y :: ys)
          else y :: mergeByRank(x :: xs, ys)
      }

    /** Prepend `head` to an ascending chain, folding it into successive
      * heads while the rank inversion persists (IKKBZ-Normalize). */
    private def normalize(head: Module, rest: List[Module]): List[Module] = {
      var h = head; var r = rest
      while (r.nonEmpty && h.rank > r.head.rank) { h = combine(h, r.head); r = r.tail }
      h :: r
    }

    protected def search(g: QueryGraph, card: Cardinality, cm: CostModel): JoinTree = {
      require(g.connected(g.full), "ikkbz requires a connected join graph")
      val n = g.n
      val nRows = Array.tabulate(n)(i => card(1L << i))
      def sel(e: JoinEdge): Double =
        card(e.mask) / math.max(nRows(e.a) * nRows(e.b), Double.MinPositiveValue)

      // Kruskal spanning tree, most selective edges first (identity on
      // an already-acyclic graph — sel order then never drops an edge)
      val uf = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x; while (uf(r) != r) r = uf(r)
        var c = x; while (uf(c) != r) { val nx = uf(c); uf(c) = r; c = nx }
        r
      }
      val adj = Array.fill(n)(List.empty[(Int, Double)])
      g.edges.sortBy(e => (sel(e), e.a, e.b)).foreach { e =>
        val (ra, rb) = (find(e.a), find(e.b))
        if (ra != rb) {
          uf(ra) = rb
          val s = sel(e)
          adj(e.a) ::= (e.b, s); adj(e.b) ::= (e.a, s)
        }
      }

      def orderFor(root: Int): Vector[Int] = {
        def sub(v: Int, parent: Int, sParent: Double): List[Module] = {
          val kidChains = adj(v).filter(_._1 != parent).sortBy(_._1)
            .map { case (u, s) => sub(u, v, s) }
          val merged = kidChains.foldLeft(List.empty[Module])(mergeByRank)
          val tv = sParent * nRows(v)
          normalize(Module(Vector(v), tv, tv), merged)
        }
        val chains = adj(root).sortBy(_._1).map { case (u, s) => sub(u, root, s) }
        root +: chains.foldLeft(List.empty[Module])(mergeByRank)
          .flatMap(_.rels).toVector
      }

      var bestT: JoinTree = null
      var bestC = Double.PositiveInfinity
      (0 until n).foreach { r =>
        val ord = orderFor(r)
        val tree = ord.tail.foldLeft(Leaf(ord.head): JoinTree)(
          (t, i) => Node(t, Leaf(i)))
        val c = CostModel.treeCost(tree, cm, card)
        // first candidate accepted even at infinite cost (inf < inf is
        // false — see DPccp.tryJoin)
        if (c < bestC || bestT == null) { bestC = c; bestT = tree }
      }
      bestT
    }
  }

  /** Adaptive enumerator selection — the deployment policy every real
    * optimizer ships (and the reference's Main encodes as per-run rule
    * flags, Main.java:38-74): exhaustive DPccp while the graph is
    * small enough to afford it, the polynomial IKKBZ heuristic past
    * the exact-search budget. The boundary reuses BranchAndBound's
    * documented refusal zone (≥ 12 edges) so "affordable" is defined
    * once in the file. */
  final case class Auto(maxExactEdges: Int = 12) extends JoinOrderPlanner {
    val name = "auto"
    protected def search(g: QueryGraph, card: Cardinality, cm: CostModel): JoinTree =
      if (g.edges.size < maxExactEdges) DPccp.plan(g, card, cm).tree
      else Ikkbz.plan(g, card, cm).tree
  }

  val all: Seq[JoinOrderPlanner] =
    Seq(DPccp, NaiveDP, LeftDeepDP, Greedy, Bushy, BranchAndBound(),
      RandomOrder(), Annealing(), Ikkbz, Auto(), TwoPhase())
}
