// Cost-model validation — the question under the reference's whole
// enterprise (its cost models exist to PREDICT runtime; the
// experiment loop times every planned tree, QueryOptExperiment
// .java:596-613): across the planners' different trees for the SAME
// query, does each cost model's predicted cost RANK the measured
// runtimes correctly? Computed from the experiment artifacts we
// already record (cost + runtimesMs per query × planner × costModel)
// — no new cluster work. Reports per cost model: mean Spearman rank
// correlation across queries (queries with ≥3 distinct-cost planned
// trees), the share of queries where the cost-cheapest tree is also
// the runtime-fastest (top-1 agreement), and the runtime penalty of
// trusting the model (cost-cheapest tree's runtime / fastest
// runtime, geomean).
//
// Usage: runMain graft.tools.CostModelValidation [experimentJson ...]
package graft.tools

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

object CostModelValidation {

  /** Spearman rank correlation with average ranks for ties. */
  private[tools] def spearman(xs: Seq[Double], ys: Seq[Double]): Double = {
    require(xs.size == ys.size && xs.size >= 2)
    def ranks(v: Seq[Double]): Seq[Double] = {
      val sorted = v.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](v.size)
      var i = 0
      while (i < sorted.size) {
        var j = i
        while (j + 1 < sorted.size && sorted(j + 1)._1 == sorted(i)._1) j += 1
        val avg = (i + j + 2) / 2.0 // ranks are 1-based
        (i to j).foreach(k => out(sorted(k)._2) = avg)
        i = j + 1
      }
      out.toSeq
    }
    val (rx, ry) = (ranks(xs), ranks(ys))
    val mx = rx.sum / rx.size
    val my = ry.sum / ry.size
    val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val sx = math.sqrt(rx.map(a => (a - mx) * (a - mx)).sum)
    val sy = math.sqrt(ry.map(b => (b - my) * (b - my)).sum)
    if (sx == 0 || sy == 0) 0.0 else cov / (sx * sy)
  }

  final case class Tree(cost: Double, runtime: Double)

  /** Pairwise discrimination at a cost-separation floor: over all
    * within-query tree pairs whose costs differ ≥ `ratio`×, the
    * fraction where the costlier tree is also the slower one. The
    * r16 refinement of the Spearman view: rank correlation charges
    * the model for mis-ordering near-tied trees whose runtime gap
    * sits under the scheduler-noise floor, but the planner's real
    * job is avoiding trees that are MATERIALLY worse — measured
    * exactly by this curve's high-separation end. */
  def pairAgreement(
      byQuery: Iterable[Seq[Tree]], ratio: Double): (Int, Int) = {
    var agree = 0; var total = 0
    byQuery.foreach { ts =>
      for {
        i <- ts.indices; j <- (i + 1) until ts.size
        a = ts(i); b = ts(j)
        if a.cost != b.cost && a.runtime != b.runtime
        if math.max(a.cost, b.cost) /
          math.max(math.min(a.cost, b.cost), 1e-9) >= ratio
      } {
        total += 1
        if ((a.cost > b.cost) == (a.runtime > b.runtime)) agree += 1
      }
    }
    (agree, total)
  }

  def main(args: Array[String]): Unit = {
    val paths = if (args.nonEmpty) args.toSeq
      else Seq("fixtures/experiment_core_r13.json",
        "fixtures/experiment_job_r13.json")
    val mapper = new ObjectMapper()
    // (costModel, query) -> distinct planned trees with measured runtimes
    val byKey = scala.collection.mutable.Map
      .empty[(String, String), scala.collection.mutable.Map[String, Tree]]
    paths.foreach { p =>
      val root = mapper.readTree(
        java.nio.file.Files.readString(java.nio.file.Paths.get(p)))
      root.get("records").elements().asScala.foreach { r =>
        val runtimes = r.get("runtimesMs").elements().asScala
          .map(_.asDouble()).toSeq
        if (!r.get("cost").isNull && runtimes.nonEmpty) {
          val key = (r.get("costModel").asText(), r.get("query").asText())
          // dedupe by join order: planners that chose the SAME tree are
          // one data point, not an artificially correlated cluster
          byKey.getOrElseUpdate(key, scala.collection.mutable.Map.empty)
            .update(r.get("joinOrder").asText(),
              Tree(r.get("cost").asDouble(), runtimes.min))
        }
      }
    }
    println("costModel  subset      queries  meanSpearman  top1Agree  " +
      "trustPenaltyGeo")
    byKey.keys.map(_._1).toSeq.distinct.sorted.foreach { cm =>
      val all = byKey.collect {
        case ((`cm`, _), trees) if trees.size >= 3 => trees.values.toSeq
      }.toSeq
      // the high-signal subset: queries where tree choice moves runtime
      // ≥2× — below that, sub-second scheduler noise owns the ranking
      // and a near-zero correlation says nothing about the model
      val spread = all.filter(ts =>
        ts.map(_.runtime).max >= 2 * ts.map(_.runtime).min)
      Seq(("all", all), ("spread>=2x", spread)).foreach { case (label, qs) =>
        if (qs.nonEmpty) {
          val rhos = qs.map(ts => spearman(ts.map(_.cost), ts.map(_.runtime)))
          val top1 = qs.count { ts =>
            // agreement within 10%: runtimes carry scheduler noise
            ts.minBy(_.cost).runtime <= ts.map(_.runtime).min * 1.10
          }
          val geo = math.exp(qs.map(ts =>
            math.log(math.max(
              ts.minBy(_.cost).runtime / ts.map(_.runtime).min,
              1e-12))).sum / qs.size)
          println(f"$cm%-9s  $label%-10s  ${qs.size}%7d  " +
            f"${rhos.sum / rhos.size}%12.3f  " +
            f"${top1.toDouble / qs.size}%9.2f  $geo%15.3f")
        }
      }
      // the discrimination ladder (r16): agreement as a function of
      // cost separation — the decision-relevant view of the same data
      val all2 = byKey.collect {
        case ((`cm`, _), trees) if trees.size >= 3 => trees.values.toSeq
      }
      val ladder = Seq(1.0, 2.0, 5.0, 10.0).map { r =>
        val (a, t) = pairAgreement(all2, r)
        if (t == 0) f">=${r}%.0fx n/a"
        else f">=${r}%.0fx $a/$t=${a.toDouble / t}%.2f"
      }
      println(s"$cm  pairwise discrimination: ${ladder.mkString("  ")}")
    }
  }
}
