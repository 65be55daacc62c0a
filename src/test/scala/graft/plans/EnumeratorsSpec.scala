package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Planner correctness properties (SURVEY.md §5 strategy (a)):
  * on random graphs with random cardinalities, the exact search
  * strategies (DPccp, naive DP, branch-and-bound) must agree on optimal
  * cost; heuristics (left-deep, greedy) must be ≥ optimal; every emitted
  * tree must be valid (covers all relations, every join has an edge). */
class EnumeratorsSpec extends AnyFunSuite {

  /** random connected graph: spanning tree + extra edges */
  private def randomGraph(n: Int, extraEdges: Int, rnd: Random): QueryGraph = {
    val names = Vector.tabulate(n)(i => s"t$i")
    val tree = (1 until n).map { i => JoinEdge(rnd.nextInt(i), i) }
    val treeMasks = tree.map(_.mask).toSet
    val candidates = for {
      a <- 0 until n; b <- a + 1 until n
      if !treeMasks(JoinEdge(a, b).mask)
    } yield JoinEdge(a, b)
    val extra = rnd.shuffle(candidates.toVector).take(extraEdges)
    QueryGraph(names, tree.toVector ++ extra)
  }

  private def randomCard(g: QueryGraph, rnd: Random): Cardinality = {
    val base = Array.fill(g.n)(math.pow(10, 1 + rnd.nextDouble() * 4))
    HeuristicCardinality.uniform(g, base)
  }

  private def assertValid(t: JoinTree, g: QueryGraph): Unit = {
    assert(t.set == g.full, "tree must cover all relations")
    assert(t.leaves.sorted == (0 until g.n).toVector, "each leaf exactly once")
    JoinTree.internalNodes(t).foreach { n =>
      assert(g.crossEdges(n.l.set, n.r.set).nonEmpty,
        s"join without connecting edge: ${n.l.set} ⋈ ${n.r.set}")
    }
  }

  test("exact planners agree; heuristics are bounded below by optimum") {
    val rnd = new Random(7)
    for (trial <- 1 to 40) {
      val n = 2 + rnd.nextInt(6) // 2..7 relations
      val g = randomGraph(n, rnd.nextInt(3), rnd)
      val card = randomCard(g, rnd)
      for (cm <- Seq[CostModel](CostModel.Cout, CostModel.MM(), CostModel.CM2())) {
        val dp = Enumerators.DPccp.plan(g, card, cm)
        val naive = Enumerators.NaiveDP.plan(g, card, cm)
        val bnb = Enumerators.BranchAndBound().plan(g, card, cm)
        val ld = Enumerators.LeftDeepDP.plan(g, card, cm)
        val gr = Enumerators.Greedy.plan(g, card, cm)
        val bu = Enumerators.Bushy.plan(g, card, cm)
        val rd = Enumerators.RandomOrder().plan(g, card, cm)
        val an = Enumerators.Annealing().plan(g, card, cm)
        val ik = Enumerators.Ikkbz.plan(g, card, cm)
        val tp = Enumerators.TwoPhase().plan(g, card, cm)
        val au = Enumerators.Auto().plan(g, card, cm)
        Seq(dp, naive, bnb, ld, gr, bu, rd, an, ik, tp, au)
          .foreach(p => assertValid(p.tree, g))
        val eps = 1e-6 * math.max(1.0, naive.cost)
        assert(math.abs(dp.cost - naive.cost) <= eps,
          s"trial $trial ${cm.name}: DPccp ${dp.cost} != naive ${naive.cost}")
        assert(math.abs(bnb.cost - naive.cost) <= eps,
          s"trial $trial ${cm.name}: BnB ${bnb.cost} != naive ${naive.cost}")
        assert(ld.cost >= naive.cost - eps, "left-deep below optimum?!")
        assert(gr.cost >= naive.cost - eps, "greedy below optimum?!")
        assert(bu.cost >= naive.cost - eps, "bushy below optimum?!")
        assert(rd.cost >= naive.cost - eps, "random below optimum?!")
        // annealing searches the left-deep space: bounded below by the
        // left-deep OPTIMUM (and so by the global optimum)
        assert(an.cost >= ld.cost - eps && an.cost >= naive.cost - eps,
          s"trial $trial ${cm.name}: anneal ${an.cost} beat exhaustive?!")
        // ikkbz searches the left-deep space (possibly on a spanning
        // tree when the graph is cyclic): bounded below by both optima
        assert(ik.cost >= ld.cost - eps && ik.cost >= naive.cost - eps,
          s"trial $trial ${cm.name}: ikkbz ${ik.cost} beat exhaustive?!")
        // 2PO refines its IKKBZ seed: never worse than the seed (the
        // incumbent-best rule) and never below the left-deep optimum
        assert(tp.cost <= ik.cost + eps,
          s"trial $trial ${cm.name}: 2po ${tp.cost} worse than seed ${ik.cost}")
        assert(tp.cost >= ld.cost - eps && tp.cost >= naive.cost - eps)
        // auto under the edge budget IS DPccp on these small graphs
        assert(math.abs(au.cost - dp.cost) <= eps || g.edges.size >= 12)
      }
    }
  }

  test("left-deep DP is optimal among left-deep trees (chain sanity)") {
    // chain a-b-c with cards making (a⋈b) first cheaper
    val g = QueryGraph(Vector("a", "b", "c"),
      Vector(JoinEdge(0, 1), JoinEdge(1, 2)))
    val base = Array(10.0, 100.0, 1000.0)
    val card = HeuristicCardinality.uniform(g, base)
    val p = Enumerators.LeftDeepDP.plan(g, card, CostModel.Cout)
    val opt = Enumerators.NaiveDP.plan(g, card, CostModel.Cout)
    assert(p.cost == opt.cost) // chain: optimal IS left-deep
  }

  /** Explicit per-subset cardinalities (mask → rows); throws on a subset
    * no planner should ever price. */
  private class MapCard(
      m: Map[Long, Double],
      ndvs: Map[Int, Double] = Map.empty) extends Cardinality {
    def apply(s: Long): Double =
      m.getOrElse(s, sys.error(s"unexpected subset priced: $s"))
    override def ndv(vertex: Int, cols: Seq[String]): Double =
      ndvs.getOrElse(vertex, apply(1L << vertex))
  }

  test("greedy push-down matches DPccp on a bushy chain where left-deep is 80x worse") {
    // a-b-c-d chain: (a⋈b) and (c⋈d) are tiny, b⋈c explodes — the
    // optimal tree is bushy. The round-1 greedy (cheapest next edge,
    // left-deep only) is forced through |abc| = 10^4.
    val g = QueryGraph(Vector("a", "b", "c", "d"),
      Vector(JoinEdge(0, 1), JoinEdge(1, 2), JoinEdge(2, 3)))
    val card = new MapCard(Map(
      1L -> 1000.0, 2L -> 1000.0, 4L -> 1000.0, 8L -> 1000.0,
      3L -> 10.0, 6L -> 1e6, 12L -> 10.0,
      7L -> 1e4, 14L -> 1e4, 15L -> 100.0))
    val dp = Enumerators.DPccp.plan(g, card, CostModel.Cout)
    val gr = Enumerators.Greedy.plan(g, card, CostModel.Cout)
    assert(dp.cost == 120.0) // |ab| + |cd| + |abcd|
    assert(gr.cost == dp.cost,
      s"greedy ${gr.joinStr(g)} (${gr.cost}) should match DPccp via push-down")

    // the round-1 strategy, reproduced: always append the cheapest
    // edge-connected next factor (left-deep), best over first factors
    val oldCost = (0 until g.n).map { first =>
      var tree: JoinTree = Leaf(first); var cost = 0.0
      while (java.lang.Long.bitCount(tree.set) < g.n) {
        val next = (0 until g.n)
          .filter(i => (g.neighbors(tree.set) & (1L << i)) != 0)
          .minBy(i => CostModel.Cout.joinCost(tree, Leaf(i), card))
        cost += CostModel.Cout.joinCost(tree, Leaf(next), card)
        tree = Node(tree, Leaf(next))
      }
      cost
    }.min
    assert(oldCost > 80 * dp.cost,
      s"fixture should punish left-deep chaining, old greedy cost $oldCost")
  }

  test("bushy GOO finds the bushy optimum where left-deep chaining is 80x worse") {
    // same fixture as the greedy push-down test: (a⋈b) and (c⋈d) tiny,
    // b⋈c explodes — GOO's smallest-result merges are exactly ab, cd,
    // then the top join, with no per-factor restart needed
    val g = QueryGraph(Vector("a", "b", "c", "d"),
      Vector(JoinEdge(0, 1), JoinEdge(1, 2), JoinEdge(2, 3)))
    val card = new MapCard(Map(
      1L -> 1000.0, 2L -> 1000.0, 4L -> 1000.0, 8L -> 1000.0,
      3L -> 10.0, 6L -> 1e6, 12L -> 10.0,
      7L -> 1e4, 14L -> 1e4, 15L -> 100.0))
    val bu = Enumerators.Bushy.plan(g, card, CostModel.Cout)
    assert(bu.cost == 120.0,
      s"GOO should build ((a b) (c d)), got ${bu.joinStr(g)} at ${bu.cost}")
  }

  test("greedy next-factor tie-break prefers the higher join-key NDV") {
    // star: equal edge weights F-D1 / F-D2, equal join cardinalities —
    // only the join-key NDV discriminates (reference picks the HIGHER,
    // MyLoptOptimizeJoinRule.java:848-863)
    val g = QueryGraph(Vector("f", "d1", "d2"),
      Vector(JoinEdge(0, 1, Seq("k1" -> "d1k")),
             JoinEdge(0, 2, Seq("k2" -> "d2k"))))
    val cards = Map(1L -> 1e6, 2L -> 100.0, 4L -> 100.0,
      3L -> 1e4, 5L -> 1e4, 7L -> 1e3)
    val high1 = new MapCard(cards, Map(1 -> 100.0, 2 -> 10.0))
    val high2 = new MapCard(cards, Map(1 -> 10.0, 2 -> 100.0))
    val t1 = Enumerators.Greedy.plan(g, high1, CostModel.Cout).tree
    val t2 = Enumerators.Greedy.plan(g, high2, CostModel.Cout).tree
    assert(t1.leaves == Vector(0, 1, 2), s"expected d1 first, got $t1")
    assert(t2.leaves == Vector(0, 2, 1), s"expected d2 first, got $t2")
  }

  test("greedy factor weight is MAX over cross edges, not SUM") {
    // triangle a-b-c plus pendant d: from placed {a,b}, candidate c
    // closes the cycle with TWO single-condition edges while d connects
    // with one. Calcite's factorWeights scores any direct two-factor
    // filter the same constant (the reference tie-breaks on NDV,
    // MyLoptOptimizeJoinRule.java:788-863), so with a higher NDV d must
    // win; summing edge counts (the round-2 bug) would pick c
    // regardless of NDV.
    val g = QueryGraph(Vector("a", "b", "c", "d"), Vector(
      JoinEdge(0, 1, Seq("ak" -> "bk")),
      JoinEdge(0, 2, Seq("ak2" -> "ck")),
      JoinEdge(1, 2, Seq("bk2" -> "ck2")),
      JoinEdge(0, 3, Seq("ak3" -> "dk"))))
    val card = new Cardinality {
      def apply(s: Long): Double = 100.0 // flat: cost never discriminates
      override def ndv(vertex: Int, cols: Seq[String]): Double =
        Map(1 -> 50.0, 2 -> 10.0, 3 -> 40.0).getOrElse(vertex, 1.0)
    }
    val t = Enumerators.Greedy.plan(g, card, CostModel.Cout).tree
    // from {a}: b (NDV 50); from {a,b}: d (40) over cycle-closing c (10)
    assert(t.leaves == Vector(0, 1, 3, 2),
      s"expected a,b,d,c (NDV tie-break), got ${t.leaves}")
  }

  test("greedy factor weight is a constant per direct connection, not conds.size") {
    // star: from placed {a}, candidate b connects over ONE composite-key
    // edge (2 conditions) and candidate c over a single-key edge. Calcite
    // scores both the constant 3 (LoptMultiJoin.setFactorWeight — weight
    // counts CONNECTIONS, not condition arity), so the higher-NDV c must
    // win; scoring conds.size (the round-3 bug) would pick b regardless
    // of NDV.
    val g = QueryGraph(Vector("a", "b", "c"), Vector(
      JoinEdge(0, 1, Seq("ak1" -> "bk1", "ak2" -> "bk2")), // composite key
      JoinEdge(0, 2, Seq("ak3" -> "ck"))))
    val card = new Cardinality {
      def apply(s: Long): Double = 100.0 // flat: cost never discriminates
      override def ndv(vertex: Int, cols: Seq[String]): Double =
        Map(1 -> 10.0, 2 -> 50.0).getOrElse(vertex, 1.0)
    }
    val t = Enumerators.Greedy.plan(g, card, CostModel.Cout).tree
    assert(t.leaves == Vector(0, 2, 1),
      s"expected a,c,b (constant weight, NDV tie-break), got ${t.leaves}")
  }

  test("left-deep DP plans a 20-relation chain in well under a second") {
    val rnd = new Random(13)
    val g = QueryGraph(Vector.tabulate(20)(i => s"t$i"),
      Vector.tabulate(19)(i => JoinEdge(i, i + 1)))
    val card = randomCard(g, rnd)
    val p = Enumerators.LeftDeepDP.plan(g, card, CostModel.Cout)
    assertValid(p.tree, g)
    assert(p.planningNanos < 1e9,
      s"20-chain took ${p.planningNanos / 1e6} ms")
    val opt = Enumerators.DPccp.plan(g, card, CostModel.Cout)
    assert(p.cost >= opt.cost - 1e-6)
  }

  test("random order is deterministic under a fixed seed") {
    val rnd = new Random(11)
    val g = randomGraph(6, 2, rnd)
    val card = randomCard(g, rnd)
    val a = Enumerators.RandomOrder(99).plan(g, card, CostModel.Cout)
    val b = Enumerators.RandomOrder(99).plan(g, card, CostModel.Cout)
    assert(a.tree == b.tree)
    assert(a.joinStr(g) == b.joinStr(g))
  }

  test("branch-and-bound refuses oversized graphs") {
    val rnd = new Random(3)
    val g = randomGraph(14, 0, rnd) // 13 edges ≥ default max 12
    val card = randomCard(g, rnd)
    // the DEDICATED refusal type — the experiment loop records exactly
    // this as PLANNING-REFUSED and lets every other failure propagate
    assertThrows[PlanningRefused] {
      Enumerators.BranchAndBound().plan(g, card, CostModel.Cout)
    }
  }

  test("per-join costs sum to total cost") {
    val rnd = new Random(5)
    val g = randomGraph(5, 2, rnd)
    val card = randomCard(g, rnd)
    val p = Enumerators.DPccp.plan(g, card, CostModel.Cout)
    assert(math.abs(p.perJoinCosts.sum - p.cost) < 1e-9)
  }

  test("annealing is deterministic under a fixed seed") {
    val rnd = new Random(13)
    val g = randomGraph(7, 3, rnd)
    val card = randomCard(g, rnd)
    val a = Enumerators.Annealing(seed = 5).plan(g, card, CostModel.Cout)
    val b = Enumerators.Annealing(seed = 5).plan(g, card, CostModel.Cout)
    assert(a.tree == b.tree && a.cost == b.cost)
  }

  test("annealing converges to the left-deep optimum on small graphs") {
    // with 200 proposals over <= 7 relations the swap neighborhood is
    // covered many times over — on 20 random graphs the incumbent best
    // must reach the left-deep optimum in at least 15
    val rnd = new Random(21)
    val hits = (1 to 20).count { _ =>
      val g = randomGraph(2 + rnd.nextInt(5), rnd.nextInt(3), rnd)
      val card = randomCard(g, rnd)
      val an = Enumerators.Annealing().plan(g, card, CostModel.Cout)
      val ld = Enumerators.LeftDeepDP.plan(g, card, CostModel.Cout)
      an.cost <= ld.cost + 1e-6 * math.max(1.0, ld.cost)
    }
    assert(hits >= 15, s"annealing hit the left-deep optimum $hits/20")
  }

  test("annealing refuses a disconnected graph instead of crossing") {
    val g = QueryGraph(Vector("a", "b", "c"), Vector(JoinEdge(0, 1)))
    val rnd = new Random(9)
    val card = randomCard(g, rnd)
    assertThrows[IllegalArgumentException] {
      Enumerators.Annealing().plan(g, card, CostModel.Cout)
    }
  }
}
