package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import graft.plans._

/** The warm-start fine-tune path (tools/RlWarmStart): determinism,
  * zero-shot anchoring, and the curve/threshold accounting — all on a
  * synthetic corpus so no Spark session or fixture file is needed. */
class RlWarmStartSpec extends AnyFunSuite {

  private val g = QueryGraph(Vector("a", "b", "c", "d"),
    Vector(JoinEdge(0, 1), JoinEdge(1, 2), JoinEdge(2, 3)))
  private val card =
    HeuristicCardinality.uniform(g, Array(6000.0, 1500.0, 200.0, 10.0))
  private val reg = new AttributeRegistry(
    g.relations.map(n => n -> Seq(s"${n}_k1", s"${n}_k2")))
  private val opt = Enumerators.DPccp.plan(g, card, CostModel.Cout).cost

  private def env() = new JoinOrderEnv(g, card, CostModel.Cout, Some(reg))
  private def greedy(): Double = {
    val e = env(); JoinOrderEnv.greedyRollout(e); e.totalCost
  }

  test("fine-tune curves are deterministic, warm and cold") {
    val shared = new MlpQPolicy(reg.attrCount)
    shared.train(env(), episodes = 50)
    val snap = shared.weightSnapshot
    val w1 = RlWarmStart.fineTuneCurve(reg.attrCount, Some(snap),
      env(), opt, greedy(), budget = 30)
    val w2 = RlWarmStart.fineTuneCurve(reg.attrCount, Some(snap),
      env(), opt, greedy(), budget = 30)
    assert(w1 == w2, "warm fine-tune must be a pure function of inputs")
    val c1 = RlWarmStart.fineTuneCurve(reg.attrCount, None,
      env(), opt, greedy(), budget = 30)
    val c2 = RlWarmStart.fineTuneCurve(reg.attrCount, None,
      env(), opt, greedy(), budget = 30)
    assert(c1 == c2, "cold fine-tune must be a pure function of inputs")
  }

  test("warm curve's zero-shot point IS the shared policy's rollout") {
    val shared = new MlpQPolicy(reg.attrCount)
    shared.train(env(), episodes = 40)
    val snap = shared.weightSnapshot
    val curve = RlWarmStart.fineTuneCurve(reg.attrCount, Some(snap),
      env(), opt, greedy(), budget = 5)
    assert(curve.length == 6, "budget+1 points: zero-shot + per-episode")
    assert(curve.head == shared.rollout(env()) / opt)
  }

  test("fine-tuning the shared weights never mutates the snapshot") {
    val shared = new MlpQPolicy(reg.attrCount)
    shared.train(env(), episodes = 40)
    val snap = shared.weightSnapshot
    val before = shared.rollout(env())
    RlWarmStart.fineTuneCurve(reg.attrCount, Some(snap),
      env(), opt, greedy(), budget = 20)
    shared.restoreWeights(snap)
    assert(shared.rollout(env()) == before,
      "fine-tune must train a CLONE, not the shared policy")
  }

  test("shrink-and-perturb interpolates: λ=1 is shared, λ=0 is fresh") {
    val shared = new MlpQPolicy(reg.attrCount)
    shared.train(env(), episodes = 40)
    val s = shared.weightSnapshot
    val f = new MlpQPolicy(reg.attrCount).weightSnapshot
    def rollout(snap: RlWarmStart.MlpSnap): Double = {
      val p = new MlpQPolicy(reg.attrCount)
      p.restoreWeights(snap)
      p.rollout(env())
    }
    assert(rollout(RlWarmStart.shrinkPerturb(s, f, 1.0)) == rollout(s))
    assert(rollout(RlWarmStart.shrinkPerturb(s, f, 0.0)) == rollout(f))
    // the blend is deterministic
    val b1 = RlWarmStart.shrinkPerturb(s, f, 0.5)
    val b2 = RlWarmStart.shrinkPerturb(s, f, 0.5)
    assert(rollout(b1) == rollout(b2))
    assert(b1._3.zip(b2._3).forall { case (a, b) => a == b })
  }

  test("episodesTo finds the first threshold crossing or -1") {
    assert(RlWarmStart.episodesTo(Vector(2.0, 1.2, 1.0, 1.0), 1.001) == 2)
    assert(RlWarmStart.episodesTo(Vector(1.0, 2.0), 1.001) == 0)
    assert(RlWarmStart.episodesTo(Vector(2.0, 1.5), 1.001) == -1)
  }

  test("a 4-chain fine-tune reaches the optimum within a small budget") {
    val cold = RlWarmStart.fineTuneCurve(reg.attrCount, None,
      env(), opt, greedy(), budget = 120)
    val hit = RlWarmStart.episodesTo(cold, 1.001)
    assert(hit >= 0, s"cold fine-tune never reached optimum: ${cold.last}")
  }
}
