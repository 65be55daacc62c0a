package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

import graft.plans.ExperimentCorpus

/** Cost-model validation pinned against the COMMITTED experiment
  * artifacts (deterministic — the fixtures are data, not reruns):
  * at sf0.001 C_out does not rank sub-second runtimes (constants
  * dominate), and at sf0.1 the one query whose tree choice moves
  * runtime ≥2× (kite6, 4.3× spread) is exactly where the ranking
  * recovers — the Leis et al. direction (EXPERIMENT_r14 §6). */
class CostModelValidationSpec extends AnyFunSuite {

  /** (query → distinct trees (cost, minRuntime)) for one artifact,
    * C_out records only — the same extraction the tool performs. */
  private def load(paths: String*): Map[String, Seq[(Double, Double)]] = {
    val mapper = new ObjectMapper()
    val byQuery = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[String, (Double, Double)]]
    paths.foreach { path =>
      val root = mapper.readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(path)))
      root.get("records").elements().asScala.foreach { r =>
        val runtimes = r.get("runtimesMs").elements().asScala
          .map(_.asDouble()).toSeq
        if (!r.get("cost").isNull && runtimes.nonEmpty &&
            r.get("costModel").asText() == "cout") {
          byQuery.getOrElseUpdate(r.get("query").asText(),
            scala.collection.mutable.Map.empty)
            .update(r.get("joinOrder").asText(),
              (r.get("cost").asDouble(), runtimes.min))
        }
      }
    }
    byQuery.view.mapValues(_.values.toSeq).toMap
      .filter(_._2.size >= 3)
  }

  private def rho(ts: Seq[(Double, Double)]): Double =
    CostModelValidation.spearman(ts.map(_._1), ts.map(_._2))

  test("spearman kernel: ties, reversal, constant side") {
    assert(math.abs(CostModelValidation.spearman(
      Seq(1.0, 2.0, 3.0), Seq(10.0, 20.0, 30.0)) - 1.0) < 1e-9)
    assert(math.abs(CostModelValidation.spearman(
      Seq(1.0, 2.0, 3.0), Seq(30.0, 20.0, 10.0)) + 1.0) < 1e-9)
    assert(CostModelValidation.spearman(
      Seq(1.0, 1.0, 1.0), Seq(1.0, 2.0, 3.0)) == 0.0)
  }

  test("sf0.001 artifact: C_out does not rank sub-second runtimes") {
    // both r13 artifacts — the tool's own default input set
    val qs = load("fixtures/experiment_core_r13.json",
      "fixtures/experiment_job_r13.json")
    assert(qs.size >= 20)
    val mean = qs.values.map(rho).sum / qs.size
    assert(math.abs(mean) < 0.15,
      f"sf0.001 mean rho $mean%.3f should be ~0 (constants dominate)")
  }

  test("r15 wide corpus: n=5 high-spread queries; C_out ranks 4 of 5; " +
      "the hybrid's per-stage constant fits NEGATIVE (record the negative)") {
    val paths = Seq("fixtures/experiment_wide_sf01_r15.json",
      "fixtures/experiment_core_sf01_r14.json")
    val pts = HybridCostFit.loadPoints(paths)
    val spread = HybridCostFit.highSpread(pts)
    // the corpus did its job: the high-spread set grew 1 → 5
    assert(spread.keySet ==
      Set("cycle4w", "dcycle8", "kite6", "kite6w", "kite7"),
      s"high-spread set: ${spread.keySet}")
    // within-query C_out ranking on that set: the Leis direction holds
    // on 4 of 5 (cycle4w .78, kite6w .57, kite6 .53, kite7 .27) with
    // dcycle8 the documented counterexample — pin mean and the outlier
    val rhos = spread.view.mapValues(ts =>
      CostModelValidation.spearman(ts.map(_.cost), ts.map(_.runtimeMs)))
      .toMap
    val mean = rhos.values.sum / rhos.size
    assert(mean >= 0.3, f"mean spread-set rho $mean%.3f")
    assert(rhos("cycle4w") >= 0.5 && rhos("kite6w") >= 0.4 &&
      rhos("kite6") >= 0.4, s"per-query rhos: $rhos")
    assert(rhos("dcycle8") < 0.2,
      s"dcycle8 is the recorded counterexample: ${rhos("dcycle8")}")
    // the hybrid (per-stage constant + C_out) is ADMISSIBLE at n=5 but
    // REJECTED on physics: the stage coefficient fits NEGATIVE — a
    // per-stage cost cannot be, so the term is absorbing cross-query
    // bias, not measuring a constant. Structural reason: every tree of
    // one query has the SAME stage count, so the term cannot help the
    // within-query ranking that is the planner's actual job. The
    // strengthened negative: C_out stays the in-planner model.
    val (hCoef, hR2) = HybridCostFit.fit(pts, p =>
      Seq(math.log(math.max(p.cost, 1.0)), p.stages.toDouble))
    val (_, cR2) = HybridCostFit.fit(pts, p =>
      Seq(math.log(math.max(p.cost, 1.0))))
    assert(hCoef(2) < 0, s"stage coefficient: ${hCoef(2)}")
    assert(hR2 - cR2 < 0.05, f"deltaR2 ${hR2 - cR2}%.3f is noise-level")
  }

  test("cross-SF durability (r16, VERDICT r15 next #7): dcycle8's " +
      "negative rho is a SHAPE property; kite6w's positive rho is a " +
      "SCALE property") {
    // the same five wide shapes, truth-dumped and re-run at sf0.01
    // (fixtures/experiment_wide_sf001_r16.json + cards_wide_sf0.01):
    // dcycle8 — the shuffle-dominated counterexample — stays NEGATIVE
    // at both SFs (sf0.1 −0.128, sf0.01 −0.204): C_out's blindness to
    // input volume is structural, it does not wash out at smaller
    // data. kite6w's +0.565 collapses to +0.074 at sf0.01, where its
    // runtimes sit at 120–280 ms: the ranking POWER of C_out needs
    // intermediates that dwarf per-stage constants (the r13 sf0.001
    // null result, reproduced inside one corpus). Boundary claim:
    // C_out's failure mode is scale-robust, its success mode is not.
    val small = load("fixtures/experiment_wide_sf001_r16.json")
    val big = load("fixtures/experiment_wide_sf01_r15.json")
    assert(small.contains("dcycle8") && big.contains("dcycle8"))
    assert(rho(small("dcycle8")) < 0,
      f"dcycle8 sf0.01 rho ${rho(small("dcycle8"))}%.3f must stay negative")
    assert(rho(big("dcycle8")) < 0,
      f"dcycle8 sf0.1 rho ${rho(big("dcycle8"))}%.3f must stay negative")
    assert(rho(big("kite6w")) >= 0.4,
      f"kite6w ranks in the volume regime: ${rho(big("kite6w"))}%.3f")
    assert(math.abs(rho(small("kite6w"))) < 0.3,
      f"kite6w out of regime at sf0.01: ${rho(small("kite6w"))}%.3f")
  }

  test("exchange-structure calibration (r16, VERDICT r15 next #5): " +
      "the shuffle constant is identifiable, the composite is " +
      "REJECTED on sign and held-out transfer — the negative, located") {
    // The exch corpus produced what the wide corpus never had:
    // within-query EXCHANGE variation (exff5/extri4's fact-fact meets
    // flip broadcast<->shuffle with join order under the tight
    // 200k-row executor gate). On it the shuffle coefficient fits
    // POSITIVE (~1.2 s/Mrow — a measurable per-row shuffle cost,
    // which the r15 per-stage-constant hybrid could never see). But:
    // (a) the probe coefficient fits NEGATIVE (collinear with output
    // volume) — the r15 sign gate rejects the composite; (b) dcycle8,
    // the motivating counterexample, has ZERO exchange variation even
    // under the tight gate — its filters cut both fact arms below any
    // realizable gate, so every tree's every join owns a broadcastable
    // min side; its rho<0 is NOT exchange blindness; (c) held-out
    // transfer is WORSE than C_out. C_out stays the in-planner model.
    val gate = 200000.0
    val cal = ExchangeCostFit.pointsOf(
      "fixtures/experiment_exch_sf01_r16.json",
      "fixtures/cards_exch_sf0.1.json", ExperimentCorpus.exch, gate)
    assert(cal.size >= 20, s"calibration points: ${cal.size}")
    // (0) the corpus did its job: within-query shuffle-count variation
    val byQ = cal.groupBy(_.query)
    Seq("exff5", "extri4").foreach { q =>
      val ns = byQ(q).map(_.nShuffleJoins)
      assert(ns.min == 0 && ns.max >= 1,
        s"$q must flip exchange structure across trees: $ns")
    }
    def feats(p: ExchangeCostFit.Pt) = Seq(p.shufRows / 1e6,
      p.buildRows / 1e6, p.probeRows / 1e6, p.outRows / 1e6)
    val (coef, r2) = ExchangeCostFit.lsq(
      cal.map(feats), cal.map(_.runtimeMs / 1000.0))
    // (1) the shuffle constant is real and positive
    assert(coef(1) > 0, s"shuffle coefficient: ${coef(1)}")
    assert(r2 > 0.4, f"calibration R2 $r2%.3f")
    // (2) the sign gate rejects the composite (probe fits negative)
    assert(coef.drop(1).exists(_ < 0),
      s"expected the collinear negative that rejects the fit: $coef")
    // (3) dcycle8 has no exchange variation even under the tight gate
    val evTight = ExchangeCostFit.pointsOf(
      "fixtures/experiment_wide_tight_sf01_r16.json",
      "fixtures/cards_wide_sf0.1.json", ExperimentCorpus.wide, gate)
    val d8 = evTight.filter(_.query == "dcycle8")
    assert(d8.nonEmpty && d8.forall(_.nShuffleJoins == 0),
      s"dcycle8 shuffle counts: ${d8.map(_.nShuffleJoins)}")
    // (4) held-out within-query transfer: composite <= C_out
    def score(p: ExchangeCostFit.Pt) =
      coef(1) * p.shufRows / 1e6 + coef(2) * p.buildRows / 1e6 +
        coef(3) * p.probeRows / 1e6 + coef(4) * p.outRows / 1e6
    val rhoC = ExchangeCostFit.perQueryRho(evTight, _.couts)
    val rhoE = ExchangeCostFit.perQueryRho(evTight, score)
    val meanC = rhoC.values.sum / rhoC.size
    val meanE = rhoE.values.sum / rhoE.size
    assert(meanE <= meanC + 1e-9,
      f"held-out: exch $meanE%.3f must not beat cout $meanC%.3f " +
        "(else the recorded negative is stale — re-run the fit)")
  }

  test("discrimination ladder (r16): C_out orders every tree pair " +
      "separated >=5x in cost — dcycle8's negative rho is a " +
      "noise-floor artifact, not a counterexample") {
    // Feature analysis of dcycle8's nine executed trees: eight are
    // near-equivalent (output volumes 0.09-0.22M, runtimes 430-780 ms
    // — a 1.4x spread reproduced on trees with IDENTICAL features,
    // i.e. pure scheduler noise at the sub-second floor) and the one
    // genuinely bad tree (2.73M output, 30x cost) runs 2x slower and
    // is ranked LAST by C_out, correctly. Spearman charges the model
    // for mis-ordering the noise cluster; pairwise discrimination at
    // a cost-separation floor measures the planner's actual job —
    // avoiding materially worse trees — and there C_out is perfect on
    // this corpus at >=5x (all 8 such pairs are dcycle8's own), in
    // BOTH execution regimes.
    def treesOf(path: String) = load(path).values.map(_.map {
      case (c, r) => CostModelValidation.Tree(c, r) })
    Seq("fixtures/experiment_wide_sf01_r15.json",
        "fixtures/experiment_wide_tight_sf01_r16.json").foreach { p =>
      val ts = treesOf(p)
      val (a5, t5) = CostModelValidation.pairAgreement(ts, 5.0)
      assert(t5 >= 8 && a5 == t5,
        s"$p: >=5x-separated pairs must all agree ($a5/$t5)")
      val (a1, t1) = CostModelValidation.pairAgreement(ts, 1.0)
      val (a2, t2) = CostModelValidation.pairAgreement(ts, 2.0)
      assert(a1.toDouble / t1 < a2.toDouble / t2 + 1e-9 &&
        a2.toDouble / t2 < a5.toDouble / t5 + 1e-9,
        s"$p: agreement must rise with separation " +
          s"($a1/$t1, $a2/$t2, $a5/$t5)")
    }
    // MATERIAL pairs — cost >=2x AND runtime >=2x apart, the pairs a
    // planner could actually regret: 20/21 agree pooled across the
    // four committed sf0.1 artifacts; the single miss is one
    // sub-second dcycle8 pair in the r15 artifact (331 vs 708 ms)
    // that does NOT reproduce in the tight-gate re-run of the same
    // corpus (7/7 there) — consistent with min-of-2 sampling noise,
    // not a model defect.
    def material(paths: String*): (Int, Int) = {
      var agree = 0; var total = 0
      paths.foreach { p =>
        load(p).values.foreach { ts =>
          for {
            i <- ts.indices; j <- (i + 1) until ts.size
            (c1, r1) = ts(i); (c2, r2) = ts(j)
            if math.min(c1, c2) > 0 && math.min(r1, r2) > 0
            if math.max(c1, c2) / math.min(c1, c2) >= 2 &&
              math.max(r1, r2) / math.min(r1, r2) >= 2
          } {
            total += 1
            if ((c1 > c2) == (r1 > r2)) agree += 1
          }
        }
      }
      (agree, total)
    }
    val (aT, tT) = material("fixtures/experiment_wide_tight_sf01_r16.json")
    assert(tT >= 5 && aT == tT, s"tight-gate material pairs: $aT/$tT")
    val (aP, tP) = material(
      "fixtures/experiment_wide_sf01_r15.json",
      "fixtures/experiment_wide_tight_sf01_r16.json",
      "fixtures/experiment_exch_sf01_r16.json",
      "fixtures/experiment_core_sf01_r14.json")
    assert(tP >= 15 && aP.toDouble / tP >= 0.95,
      s"pooled material agreement: $aP/$tP")
  }

  test("sf0.1 artifact: the high-spread query recovers the ranking") {
    val qs = load("fixtures/experiment_core_sf01_r14.json")
    assert(qs.size == 7, s"core corpus is 7 queries, got ${qs.keySet}")
    val spread = qs.filter { case (_, ts) =>
      ts.map(_._2).max >= 2 * ts.map(_._2).min }
    assert(spread.keySet == Set("kite6"),
      s"exactly kite6 has >=2x runtime spread at sf0.1: ${spread.keySet}")
    val r = rho(spread("kite6"))
    assert(r >= 0.4,
      f"kite6's C_out ranking must recover at sf0.1 (rho=$r%.3f)")
    // and the out-of-regime remainder still doesn't rank
    val rest = qs -- spread.keySet
    val mean = rest.values.map(rho).sum / rest.size
    assert(math.abs(mean) < 0.3,
      f"sub-2x-spread queries stay constant-dominated (rho=$mean%.3f)")
  }
}
