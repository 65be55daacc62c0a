package graft.plans

/** Pluggable join cost models, re-expressed from the reference's
  * MyMetadataQuery (SURVEY.md §4.2). A model prices ONE join node; plan
  * cost is the sum over internal nodes ([[CostModel.treeCost]]), exactly
  * how the reference accumulates `costSoFar += nonCumulativeCost(join)`
  * (reference: QueryGraph.java:407-417).
  */
trait CostModel {
  def name: String
  /** Cost contribution of joining `l` and `r` (does NOT include the
    * subtrees' own costs). */
  def joinCost(l: JoinTree, r: JoinTree, card: Cardinality): Double
}

object CostModel {

  /** C_out — the reference's effective default: each join node costs its
    * (injected) output cardinality, so the plan metric is the sum of
    * intermediate result sizes (reference: MyCostFactory.java:64-69 sets
    * cost = rowCount; comparisons use only `cost`, :95-115). */
  case object Cout extends CostModel {
    val name = "cout"
    def joinCost(l: JoinTree, r: JoinTree, card: Cardinality): Double =
      card(l.set | r.set)
  }

  /** MM — min(hash, index-nested-loops):
    * hash = |L| + |R|; index-NL = 2·|L| and only applies when the right
    * side is a single base relation (the "index exists on the inner"
    * assumption) (reference: MyMetadataQuery.java:164-196,203-234;
    * `useIndexNestedLJ` flag Main.java:38,74).
    *
    * Deliberately NOT modeled: the reference's scan/filter term
    * (`scanCostFactor`·rows per base scan and filter node,
    * MyMetadataQuery.java:227-230). Scan cost is a constant across all
    * join orders of the SAME query — every enumerator consumes only
    * the argmin over orders, which the constant cannot move — so
    * pricing joins alone is decision-equivalent and keeps the model a
    * pure function of the join tree. */
  final case class MM(useIndexNLJ: Boolean = true) extends CostModel {
    val name = "mm"
    def joinCost(l: JoinTree, r: JoinTree, card: Cardinality): Double = {
      val hash = card(l.set) + card(r.set)
      val inl = r match {
        case _: Leaf if useIndexNLJ => 2.0 * card(l.set)
        case _                      => Double.PositiveInfinity
      }
      math.min(hash, inl)
    }
  }

  /** CM2 — memory-aware hash join with a row budget M (default 10^6,
    * reference: MyMetadataQuery.java:57,235-252):
    *  - both sides fit in memory        → C_out (output rows)
    *  - one side fits                   → 2(|L|+|R|) + out
    *  - neither fits (Grace partitioned)→ |R| + ceil(|R|/M)·|L| + out,
    *    with R the smaller (build) side. */
  final case class CM2(memLimit: Double = 1e6) extends CostModel {
    val name = "cm2"
    def joinCost(l: JoinTree, r: JoinTree, card: Cardinality): Double = {
      val cl = card(l.set); val cr = card(r.set)
      val out = card(l.set | r.set)
      val small = math.min(cl, cr); val big = math.max(cl, cr)
      if (big <= memLimit) out
      else if (small <= memLimit) 2.0 * (cl + cr) + out
      else small + math.ceil(small / memLimit) * big + out
    }
  }

  def treeCost(t: JoinTree, cm: CostModel, card: Cardinality): Double =
    JoinTree.internalNodes(t).map(n => cm.joinCost(n.l, n.r, card)).sum

  def perJoinCosts(t: JoinTree, cm: CostModel, card: Cardinality): Vector[Double] =
    JoinTree.internalNodes(t).map(n => cm.joinCost(n.l, n.r, card))
}
