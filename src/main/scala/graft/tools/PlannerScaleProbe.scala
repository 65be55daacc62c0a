package graft.tools

import graft.plans._
import scala.util.Random

/** Planning-time scaling of the enumerators:
  *
  *  - CHAINS (the JOB shape): connected-subgraph count is O(n²), so
  *    exact DP stays cheap at any realistic n and IKKBZ's exactness
  *    (cost == left-deep optimum, the IkkbzSpec property) is verified
  *    per row.
  *  - CLIQUES (the worst case): csg-cmp pairs grow ~3ⁿ and DPccp's
  *    wall-clock explodes, while IKKBZ (on the most-selective
  *    spanning tree) stays polynomial — the measured basis for p13's
  *    exact-under-budget / heuristic-past-it policy, with the
  *    heuristic's cost gap vs the left-deep optimum reported
  *    honestly.
  *
  * Pure driver-side (no Spark). */
object PlannerScaleProbe {
  private val rnd = new Random(11)

  private def time(p: JoinOrderPlanner, g: QueryGraph,
      card: Cardinality): (Double, Double) = {
    p.plan(g, card, CostModel.Cout) // warm
    val t0 = System.nanoTime()
    val r = p.plan(g, card, CostModel.Cout)
    ((System.nanoTime() - t0) / 1e6, r.cost)
  }

  def main(args: Array[String]): Unit = {
    println("== chains (exact DP cheap; ikkbz must equal the LD optimum)")
    println(f"${"n"}%4s ${"dpccp(ms)"}%10s ${"leftdeep(ms)"}%12s " +
      f"${"ikkbz(ms)"}%10s ${"ikkbz==ld_opt"}%14s")
    for (n <- Seq(8, 16, 24, 32)) {
      val g = QueryGraph(Vector.tabulate(n)(i => s"t$i"),
        (1 until n).map(i => JoinEdge(i - 1, i)).toVector)
      val card = HeuristicCardinality.uniform(g,
        Array.fill(n)(math.pow(10, 1 + rnd.nextDouble() * 3)))
      val (tdp, _) = time(Enumerators.DPccp, g, card)
      val (tld, cld) = time(Enumerators.LeftDeepDP, g, card)
      val (tik, cik) = time(Enumerators.Ikkbz, g, card)
      val agree = math.abs(cik - cld) <= 1e-9 * math.max(1.0, cld)
      println(f"$n%4d $tdp%10.2f $tld%12.2f $tik%10.2f " +
        f"${agree.toString}%14s")
    }

    println("== cliques (csg-cmp blows up; ikkbz stays polynomial)")
    println(f"${"n"}%4s ${"dpccp(ms)"}%10s ${"ikkbz(ms)"}%10s " +
      f"${"auto(ms)"}%9s ${"ikkbz/ld_opt"}%13s")
    for (n <- Seq(8, 10, 12, 14, 16, 20, 28)) {
      val edges = for {
        a <- 0 until n; b <- a + 1 until n
      } yield JoinEdge(a, b)
      val g = QueryGraph(Vector.tabulate(n)(i => s"t$i"), edges.toVector)
      val card = HeuristicCardinality.uniform(g,
        Array.fill(n)(math.pow(10, 1 + rnd.nextDouble() * 3)))
      val (tdp, _) =
        if (n <= 14) time(Enumerators.DPccp, g, card)
        else (Double.NaN, Double.NaN)
      val (tik, cik) = time(Enumerators.Ikkbz, g, card)
      val (tau, _) = time(Enumerators.Auto(), g, card)
      val (_, cld) =
        if (n <= 16) time(Enumerators.LeftDeepDP, g, card)
        else (Double.NaN, Double.NaN)
      val gap = if (cld.isNaN) Double.NaN else cik / cld
      println(f"$n%4d $tdp%10.2f $tik%10.2f $tau%9.2f $gap%13.3f")
    }
  }
}
