package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Semijoin selection behavior (reference loop shape:
  * MyLoptOptimizeJoinRule.java:121-141). */
class SemiJoinSelectionSpec extends AnyFunSuite {

  private val (g, filters) = PlannerQueries.flagshipGraph
  private def card(sel: Array[Double]) = {
    val base = Array(5.0, 25.0, 1500.0, 15000.0, 60000.0)
    new HeuristicCardinality(g, base, sel)
  }

  test("filtered dimensions pre-filter their fact neighbors") {
    val sel = Array(0.2, 1.0, 1.0, 0.33, 0.9)
    val chosen = SemiJoinSelection.choose(
      g, card(sel), i => filters(i).isDefined)
    // nation (idx 1) gets the filtered region (idx 0) semijoin
    assert(chosen.contains(1), s"nation should be semijoin-filtered: $chosen")
    assert(chosen(1).exists(e => e.mask == ((1L << 0) | (1L << 1))))
    // every chosen dim actually carries a filter
    chosen.foreach { case (fact, edges) =>
      edges.foreach { e =>
        val dim = if (e.a == fact) e.b else e.a
        assert(filters(dim).isDefined, s"unfiltered dim $dim chosen for $fact")
      }
    }
  }

  test("no filters, no semijoins") {
    assert(SemiJoinSelection.choose(g, card(Array.fill(5)(1.0)), _ => false).isEmpty)
  }

  test("iteration cap holds even when every edge qualifies") {
    // cycle of filtered relations — without the cap this could stack
    // semijoins forever as effective sizes shrink
    val cyc = QueryGraph(Vector("a", "b", "c"),
      Vector(JoinEdge(0, 1), JoinEdge(1, 2), JoinEdge(0, 2)))
    val c = HeuristicCardinality.uniform(cyc, Array(1e6, 1e6, 1e6))
    val chosen = SemiJoinSelection.choose(cyc, c, _ => true, maxIterations = 10)
    assert(chosen.values.map(_.size).sum <= 10)
  }
}
