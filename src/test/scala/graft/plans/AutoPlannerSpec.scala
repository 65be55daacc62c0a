package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** p13 Auto: exact DPccp inside the edge budget, IKKBZ past it. */
class AutoPlannerSpec extends AnyFunSuite {

  test("small graphs get the exact DPccp optimum") {
    val rnd = new Random(5)
    for (_ <- 1 to 10) {
      val n = 2 + rnd.nextInt(6)
      val g = QueryGraph(Vector.tabulate(n)(i => s"t$i"),
        (1 until n).map(i => JoinEdge(rnd.nextInt(i), i)).toVector)
      val base = Array.fill(n)(math.pow(10, 1 + rnd.nextDouble() * 3))
      val card = HeuristicCardinality.uniform(g, base)
      val auto = Enumerators.Auto().plan(g, card, CostModel.Cout)
      val dp = Enumerators.DPccp.plan(g, card, CostModel.Cout)
      assert(math.abs(auto.cost - dp.cost) <= 1e-9 * math.max(1.0, dp.cost))
    }
  }

  test("a 20-relation chain routes to IKKBZ and plans fast") {
    val n = 20
    val g = QueryGraph(Vector.tabulate(n)(i => s"t$i"),
      (1 until n).map(i => JoinEdge(i - 1, i)).toVector)
    val card = HeuristicCardinality.uniform(
      g, Array.fill(n)(1000.0))
    val t0 = System.nanoTime()
    val auto = Enumerators.Auto().plan(g, card, CostModel.Cout)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 1000, s"auto on a 20-chain took ${ms}ms")
    val ik = Enumerators.Ikkbz.plan(g, card, CostModel.Cout)
    assert(auto.cost == ik.cost)
    assert(auto.tree.set == g.full)
  }
}
