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
        val cA = c1 + c2 + cm.joinCost(t1, t2, card)
        if (cA < bestHere._2) bestHere = (Node(t1, t2), cA)
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
                if (c < bestC) { bestC = c; bestT = Node(a, b) }
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
    * plan by one factor reachable over a join edge). Optimal within the
    * left-deep space. */
  case object LeftDeepDP extends JoinOrderPlanner {
    val name = "leftdeep"
    protected def search(g: QueryGraph, card: Cardinality, cm: CostModel): JoinTree = {
      val dp = mutable.LongMap.empty[(JoinTree, Double)]
      (0 until g.n).foreach { i => dp(1L << i) = (Leaf(i), 0.0) }
      for (k <- 2 to g.n) {
        // iterate all subsets of size k that are connected
        def subsets(mask: Long, size: Int): Iterator[Long] =
          (0L to mask).iterator.filter(s =>
            (s & ~mask) == 0 && java.lang.Long.bitCount(s) == size)
        subsets(g.full, k).foreach { s =>
          if (g.connected(s)) {
            var bestT: JoinTree = null; var bestC = Double.PositiveInfinity
            var rest = s
            while (rest != 0) {
              val i = java.lang.Long.numberOfTrailingZeros(rest)
              val prev = s & ~(1L << i)
              dp.get(prev).foreach { case (t, c) =>
                if (g.crossEdges(prev, 1L << i).nonEmpty) {
                  val cost = c + cm.joinCost(t, Leaf(i), card)
                  if (cost < bestC) { bestC = cost; bestT = Node(t, Leaf(i)) }
                }
              }
              rest &= rest - 1
            }
            if (bestT != null) dp(s) = (bestT, bestC)
          }
        }
      }
      dp(g.full)._1
    }
  }

  /** Greedy heuristic — the behavioral core of the reference's 2113-line
    * MyLoptOptimizeJoinRule (SURVEY.md §2b): try every first factor; from
    * the current left-deep prefix repeatedly append the edge-connected
    * factor with the cheapest incremental join cost (ties → smaller
    * resulting cardinality, then smaller index — the rule's
    * edge-weight/NDV tie-break, MyLoptOptimizeJoinRule.java:788-863);
    * keep the best full ordering
    * (findBestOrderings, MyLoptOptimizeJoinRule.java:462-504). */
  case object Greedy extends JoinOrderPlanner {
    val name = "greedy"
    protected def search(g: QueryGraph, card: Cardinality, cm: CostModel): JoinTree = {
      var bestT: JoinTree = null; var bestC = Double.PositiveInfinity
      (0 until g.n).foreach { first =>
        var tree: JoinTree = Leaf(first)
        var cost = 0.0
        var ok = true
        while (ok && java.lang.Long.bitCount(tree.set) < g.n) {
          val cand = g.neighbors(tree.set)
          if (cand == 0) ok = false // disconnected graph
          else {
            var bi = -1; var bc = Double.PositiveInfinity; var bcard = Double.PositiveInfinity
            var rest = cand
            while (rest != 0) {
              val i = java.lang.Long.numberOfTrailingZeros(rest)
              val c = cm.joinCost(tree, Leaf(i), card)
              val rc = card(tree.set | (1L << i))
              if (c < bc || (c == bc && rc < bcard)) { bi = i; bc = c; bcard = rc }
              rest &= rest - 1
            }
            tree = Node(tree, Leaf(bi)); cost += bc
          }
        }
        if (ok && cost < bestC) { bestC = cost; bestT = tree }
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
      require(g.edges.size < maxEdges,
        s"branch-and-bound refuses ≥$maxEdges edges (got ${g.edges.size})")
      var bestC = Double.PositiveInfinity
      var bestT: JoinTree = null
      def rec(factors: List[JoinTree], costSoFar: Double): Unit = {
        if (costSoFar >= bestC) return // prune
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

  val all: Seq[JoinOrderPlanner] =
    Seq(DPccp, NaiveDP, LeftDeepDP, Greedy, BranchAndBound(), RandomOrder())
}
