package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** IKKBZ's defining property: on an ACYCLIC query graph with a
  * multiplicative (independence-assumption, unclamped) cardinality
  * model, its left-deep order is OPTIMAL among cross-product-free
  * left-deep orders under C_out — i.e. it matches [[Enumerators.LeftDeepDP]]
  * exactly, in O(n²) instead of exponential time. The exchange-argument
  * proof needs the ASI property, which clamped estimators break, so the
  * spec prices with a raw Π·Π model rather than HeuristicCardinality.
  */
class IkkbzSpec extends AnyFunSuite {

  /** Unclamped independence model: |S| = Π_{i∈S} n_i · Π_{e⊆S} s_e. */
  private final class MultCard(
      g: QueryGraph, n: Array[Double], s: Map[Long, Double]) extends Cardinality {
    def apply(set: Long): Double = {
      var rows = 1.0
      var rest = set
      while (rest != 0) {
        val i = java.lang.Long.numberOfTrailingZeros(rest)
        rows *= n(i); rest &= rest - 1
      }
      g.edges.foreach(e => if ((e.mask & set) == e.mask) rows *= s(e.mask))
      rows
    }
  }

  private def randomTree(n: Int, rnd: Random): QueryGraph =
    QueryGraph(Vector.tabulate(n)(i => s"t$i"),
      (1 until n).map(i => JoinEdge(rnd.nextInt(i), i)).toVector)

  test("ikkbz == left-deep optimum on random acyclic graphs under Cout") {
    val rnd = new Random(31)
    for (trial <- 1 to 120) {
      val n = 2 + rnd.nextInt(8) // 2..9 relations — chains, stars, brooms
      val g = randomTree(n, rnd)
      val rows = Array.fill(n)(math.pow(10, 1 + rnd.nextDouble() * 3))
      val sels = g.edges.map(e => e.mask -> math.pow(10, -rnd.nextDouble() * 3)).toMap
      val card = new MultCard(g, rows, sels)
      val ik = Enumerators.Ikkbz.plan(g, card, CostModel.Cout)
      val ld = Enumerators.LeftDeepDP.plan(g, card, CostModel.Cout)
      val eps = 1e-9 * math.max(1.0, ld.cost)
      assert(math.abs(ik.cost - ld.cost) <= eps,
        s"trial $trial (n=$n): ikkbz ${ik.cost} != left-deep optimum ${ld.cost}" +
          s"\n ikkbz: ${ik.joinStr(g)}\n ldopt: ${ld.joinStr(g)}")
    }
  }

  test("ikkbz resolves a star where greedy-by-size order is wrong") {
    // hub h with satellites a (tiny but unselective) and b (bigger but
    // highly selective): rank order puts b first even though a is the
    // smaller relation — the classic rank-vs-size separation.
    val g = QueryGraph(Vector("h", "a", "b"),
      Vector(JoinEdge(0, 1), JoinEdge(0, 2)))
    val rows = Array(1000.0, 10.0, 100.0)
    val sels = Map(JoinEdge(0, 1).mask -> 0.5, JoinEdge(0, 2).mask -> 0.001)
    val card = new MultCard(g, rows, sels)
    val ik = Enumerators.Ikkbz.plan(g, card, CostModel.Cout)
    // T(a) = 5, rank 4/5 = 0.8; T(b) = 0.1, rank −0.9/0.1 < 0 → b first
    // cost(h,b,a) = |hb| + |hba| = 100 + 500 = 600
    // cost(h,a,b) = |ha| + |hab| = 5000 + 500 = 5500
    assert(ik.cost == 600.0, s"got ${ik.joinStr(g)} @ ${ik.cost}")
    assert(ik.tree == Node(Node(Leaf(0), Leaf(2)), Leaf(1)))
  }

  test("ikkbz on a cyclic graph falls back to the selective spanning tree, stays valid") {
    // triangle a-b-c; the least selective edge (a,b) is dropped by
    // Kruskal, the emitted tree is still a valid join order of the FULL
    // graph and never below the global optimum
    val g = QueryGraph(Vector("a", "b", "c"),
      Vector(JoinEdge(0, 1), JoinEdge(1, 2), JoinEdge(0, 2)))
    val rows = Array(100.0, 200.0, 300.0)
    val sels = Map(JoinEdge(0, 1).mask -> 0.9,
      JoinEdge(1, 2).mask -> 0.01, JoinEdge(0, 2).mask -> 0.02)
    val card = new MultCard(g, rows, sels)
    val ik = Enumerators.Ikkbz.plan(g, card, CostModel.Cout)
    val opt = Enumerators.NaiveDP.plan(g, card, CostModel.Cout)
    assert(ik.tree.set == g.full)
    JoinTree.internalNodes(ik.tree).foreach(nd =>
      assert(g.crossEdges(nd.l.set, nd.r.set).nonEmpty))
    assert(ik.cost >= opt.cost - 1e-9)
  }
}
