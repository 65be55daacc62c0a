package graft.plans

import org.scalatest.funsuite.AnyFunSuite

class JoinOrderEnvSpec extends AnyFunSuite {

  private val g = QueryGraph(Vector("a", "b", "c", "d"),
    Vector(JoinEdge(0, 1), JoinEdge(1, 2), JoinEdge(2, 3)))
  private val card =
    HeuristicCardinality.uniform(g, Array(10.0, 100.0, 1000.0, 10000.0))

  test("episode runs to completion and accumulates cost") {
    val env = new JoinOrderEnv(g, card, CostModel.Cout)
    var steps = 0
    while (!env.isDone) {
      assert(env.actions.nonEmpty)
      val r = env.step(0)
      assert(r == env.reward)
      steps += 1
    }
    assert(steps == g.n - 1)
    assert(env.finalTree.set == g.full)
    assert(env.totalCost > 0)
  }

  test("greedy rollout never beats the exact optimum") {
    val env = new JoinOrderEnv(g, card, CostModel.Cout)
    val greedy = JoinOrderEnv.greedyRollout(env)
    val opt = Enumerators.NaiveDP.plan(g, card, CostModel.Cout).cost
    assert(greedy >= opt - 1e-9)
  }

  test("random rollout is reproducible and bounded below by optimum") {
    val env = new JoinOrderEnv(g, card, CostModel.Cout)
    val a = JoinOrderEnv.randomRollout(env, 7)
    val b = JoinOrderEnv.randomRollout(env, 7)
    assert(a == b)
    val opt = Enumerators.NaiveDP.plan(g, card, CostModel.Cout).cost
    assert(a >= opt - 1e-9)
  }

  test("preview matches step reward") {
    val env = new JoinOrderEnv(g, card, CostModel.Cout)
    val preview = env.previewCost(0)
    val r = env.step(0)
    assert(r == -preview)
  }

  test("merged edges: parallel edges between factor pairs collapse") {
    // square with a diagonal: after joining a-b, edges (a,c) and (b,c)
    // must merge into ONE action to the {a,b} factor
    val sq = QueryGraph(Vector("a", "b", "c"),
      Vector(JoinEdge(0, 1), JoinEdge(0, 2), JoinEdge(1, 2)))
    val env = new JoinOrderEnv(sq, HeuristicCardinality.uniform(sq,
      Array(10.0, 10.0, 10.0)), CostModel.Cout)
    assert(env.actions.size == 3)
    env.step(0) // join a,b
    assert(env.actions.size == 1, "parallel edges must merge")
  }

  test("DQ featurization: bitsets over the global attribute space") {
    val reg = new AttributeRegistry(Seq(
      "a" -> Seq("x", "y"), "b" -> Seq("z"), "c" -> Seq("w"), "d" -> Seq("v")))
    assert(reg.attrCount == 5)
    val env = new JoinOrderEnv(g, card, CostModel.Cout, Some(reg))
    assert(env.stateFeatures.size == 4)
    env.step(0)
    val feats = env.stateFeatures
    assert(feats.size == 3)
    // the merged {a,b} factor carries a's and b's attributes
    assert(feats.exists(f => f == (reg.tableAttrs("a") | reg.tableAttrs("b"))))
    val (lf, rf) = env.actionFeatures(0)
    assert(lf.nonEmpty && rf.nonEmpty)
  }
}
