package graft.plans

import scala.collection.mutable

/** Semijoin selection — the pre-pass the reference's greedy rule runs
  * before ordering (MyLoptOptimizeJoinRule.java:121-141: Calcite's
  * LoptSemiJoinOptimizer.makePossibleSemiJoins, then chooseBestSemiJoin
  * applied iteratively, ≤10 rounds, each round re-costing scans with the
  * semijoins already chosen).
  *
  * A semijoin opportunity is an equi-edge (fact, dim) where the dimension
  * side carries a local filter: pre-filtering the fact scan by the
  * filtered dim's join keys shrinks the fact before ANY join runs. At
  * 100 TB this is the difference between shuffling the whole fact table
  * and shuffling the fraction that can survive — the executor realizes a
  * chosen semijoin as `fact LEFT SEMI JOIN broadcast(filtered dim)`,
  * which never changes results for the inner-join query class (the dim
  * is joined again on the same keys later).
  *
  * Each round picks the single (fact, dim) pair with the largest
  * estimated scan-row reduction, updates the fact's effective size, and
  * repeats — so stacked semijoins on one fact are priced against the
  * already-reduced scan, exactly the reference's accumulation comment
  * ("the cost of scanning a factor will decrease in accordance with the
  * semijoins selected").
  */
object SemiJoinSelection {

  /** Chosen semijoins per fact vertex. `hasFilter(i)` = relation i has a
    * local predicate; `minReduction` = required surviving-fraction
    * improvement (a dim that keeps ≥90% of the fact isn't worth the
    * probe). */
  def choose(
      g: QueryGraph,
      card: Cardinality,
      hasFilter: Int => Boolean,
      maxIterations: Int = 10,
      minReduction: Double = 0.1): Map[Int, Seq[JoinEdge]] = {
    val chosen = mutable.Map.empty[Int, Vector[JoinEdge]]
    val eff = Array.tabulate(g.n)(i => card(1L << i))
    var iterations = 0
    var progress = true
    while (progress && iterations < maxIterations) {
      progress = false
      var bestFact = -1
      var bestEdge: JoinEdge = null
      var bestSaved = 0.0
      var bestFrac = 1.0
      g.edges.foreach { e =>
        Seq((e.a, e.b), (e.b, e.a)).foreach { case (fact, dim) =>
          if (hasFilter(dim) && !chosen.getOrElse(fact, Vector.empty).contains(e)) {
            // fraction of the fact's rows that survive a join with the
            // (filtered) dim — the dictionary/heuristic card of the pair
            // over the fact alone
            val frac = math.min(
              card(e.mask) / math.max(card(1L << fact), 1.0), 1.0)
            val saved = eff(fact) * (1.0 - frac)
            if (frac <= 1.0 - minReduction && saved > bestSaved) {
              bestFact = fact; bestEdge = e; bestSaved = saved; bestFrac = frac
            }
          }
        }
      }
      if (bestFact >= 0) {
        chosen(bestFact) = chosen.getOrElse(bestFact, Vector.empty) :+ bestEdge
        eff(bestFact) *= bestFrac
        progress = true
        iterations += 1
      }
    }
    chosen.toMap
  }
}
