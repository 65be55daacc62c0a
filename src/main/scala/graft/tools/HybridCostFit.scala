// The hybrid cost-model question (VERDICT r14 item 8 → r15 item 5):
// does runtime ≈ α·(#join stages) + β·C_out beat C_out alone once the
// high-spread corpus is big enough to fit on (n ≥ 5 queries whose tree
// choice moves runtime ≥2×)? Within ONE query every tree has the same
// stage count, so the constant term can never change within-query
// ranking — the hybrid's claim lives ACROSS queries (predicting
// absolute runtimes, Leis et al.'s "cost models matter less than
// cardinalities" decomposition). This tool pools every C_out record
// from the given experiment artifacts, least-squares fits both forms
// on log-runtime, and reports per-form pooled Spearman + R² plus the
// high-spread query count that gates the fit decision.
//
// Usage: runMain graft.tools.HybridCostFit [experimentJson ...]
package graft.tools

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

object HybridCostFit {

  final case class Pt(query: String, stages: Int, cost: Double,
      runtimeMs: Double)

  /** C_out records pooled from experiment artifacts, deduped to
    * distinct (query, tree) with the fastest observed runtime. */
  def loadPoints(paths: Seq[String]): Seq[Pt] = {
    val mapper = new ObjectMapper()
    val byKey = scala.collection.mutable.Map.empty[(String, String), Pt]
    paths.foreach { p =>
      val root = mapper.readTree(
        java.nio.file.Files.readString(java.nio.file.Paths.get(p)))
      root.get("records").elements().asScala.foreach { r =>
        val runtimes = r.get("runtimesMs").elements().asScala
          .map(_.asDouble()).toSeq
        if (!r.get("cost").isNull && runtimes.nonEmpty &&
            r.get("costModel").asText() == "cout") {
          val order = r.get("joinOrder").asText()
          // one '(' per binary join in joinStr's nested form
          val stages = order.count(_ == '(')
          val key = (r.get("query").asText(), order)
          val pt = Pt(key._1, stages, r.get("cost").asDouble(), runtimes.min)
          // dedupe identical trees (several planners choose the same
          // order); keep the fastest observed runtime
          byKey.get(key) match {
            case Some(old) if old.runtimeMs <= pt.runtimeMs =>
            case _ => byKey(key) = pt
          }
        }
      }
    }
    byKey.values.toSeq
  }

  /** Queries whose tree choice moves runtime ≥2× across ≥3 distinct
    * trees — the regime where a cost model has something to rank. */
  def highSpread(pts: Seq[Pt]): Map[String, Seq[Pt]] =
    pts.groupBy(_.query).filter { case (_, ts) =>
      ts.size >= 3 &&
        ts.map(_.runtimeMs).max >= 2 * ts.map(_.runtimeMs).min
    }

  /** Least squares on log runtime over 1+features; returns
    * (coefficients incl. intercept, R²). */
  def fit(pts: Seq[Pt], features: Pt => Seq[Double])
      : (Seq[Double], Double) = {
    val x = pts.map(p => 1.0 +: features(p))
    val y = pts.map(p => math.log(math.max(p.runtimeMs, 0.1)))
    val d = x.head.size
    // normal equations (d ≤ 3: a closed Gaussian elimination is fine)
    val a = Array.ofDim[Double](d, d + 1)
    for (i <- 0 until d) {
      for (j <- 0 until d)
        a(i)(j) = x.map(r => r(i) * r(j)).sum
      a(i)(d) = x.zip(y).map { case (r, v) => r(i) * v }.sum
    }
    for (i <- 0 until d) {
      val piv = (i until d).maxBy(r => math.abs(a(r)(i)))
      val t = a(i); a(i) = a(piv); a(piv) = t
      for (r <- 0 until d if r != i && a(i)(i) != 0) {
        val f = a(r)(i) / a(i)(i)
        for (c <- 0 to d) a(r)(c) -= f * a(i)(c)
      }
    }
    val coef = (0 until d).map(i =>
      if (a(i)(i) == 0) 0.0 else a(i)(d) / a(i)(i))
    val pred = x.map(r => r.zip(coef).map { case (v, c) => v * c }.sum)
    val my = y.sum / y.size
    val ssTot = y.map(v => (v - my) * (v - my)).sum
    val ssRes = y.zip(pred).map { case (v, p) => (v - p) * (v - p) }.sum
    (coef, if (ssTot == 0) 0.0 else 1.0 - ssRes / ssTot)
  }

  def main(args: Array[String]): Unit = {
    val paths = if (args.nonEmpty) args.toSeq
      else Seq("fixtures/experiment_wide_sf01_r15.json",
        "fixtures/experiment_core_sf01_r14.json")
    val pts = loadPoints(paths)
    val byQuery = pts.groupBy(_.query)
    val spread = highSpread(pts)
    println(s"pooled points=${pts.size} queries=${byQuery.size} " +
      s"highSpread(>=2x, >=3 trees)=${spread.size} " +
      s"[${spread.keys.toSeq.sorted.mkString(", ")}]")

    def pooledRho(score: Pt => Double): Double =
      CostModelValidation.spearman(pts.map(score), pts.map(_.runtimeMs))

    // log(rt) ~ c0 + c1·log(max(cost,1)) [cout-only] vs
    // log(rt) ~ c0 + c1·log(cost) + c2·stages [hybrid]
    val (cCoef, cR2) = fit(pts, p => Seq(math.log(math.max(p.cost, 1.0))))
    val (hCoef, hR2) = fit(pts, p =>
      Seq(math.log(math.max(p.cost, 1.0)), p.stages.toDouble))
    println(f"cout-only : logrt ~ ${cCoef(0)}%.3f + ${cCoef(1)}%.3f*logcost" +
      f"  R2=$cR2%.3f  pooledSpearman=${pooledRho(_.cost)}%.3f")
    println(f"hybrid    : logrt ~ ${hCoef(0)}%.3f + ${hCoef(1)}%.3f*logcost " +
      f"+ ${hCoef(2)}%.3f*stages  R2=$hR2%.3f  pooledSpearman=" +
      f"${pooledRho(p => hCoef(1) * math.log(math.max(p.cost, 1.0)) +
        hCoef(2) * p.stages)}%.3f")
    println(f"deltaR2=${hR2 - cR2}%.3f  " +
      s"fitGate=${if (spread.size >= 5) "n>=5: FIT ADMISSIBLE"
      else s"n=${spread.size} < 5: record the negative, do not ship a hybrid"}")
  }
}
