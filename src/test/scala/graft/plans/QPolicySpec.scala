package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** The in-process Q-learner must actually LEARN: after training on a
  * graph, its greedy rollout beats the random baseline and lands within
  * striking distance of the exact optimum. */
class QPolicySpec extends AnyFunSuite {

  /** synthetic registry: a few columns per relation of the graph */
  private def registryFor(g: QueryGraph): AttributeRegistry =
    new AttributeRegistry(g.relations.map(n =>
      n -> Seq(s"${n}_k1", s"${n}_k2")))

  private def setup(cq: ExperimentCorpus.CorpusQuery, base: Array[Double]) = {
    val g = cq.graph
    val card = HeuristicCardinality.uniform(g, base)
    val env = new JoinOrderEnv(g, card, CostModel.Cout, Some(registryFor(g)))
    val opt = Enumerators.DPccp.plan(g, card, CostModel.Cout).cost
    (env, card, opt)
  }

  private def randomBaseline(env: JoinOrderEnv, n: Int): Double =
    (0 until n).map(s => JoinOrderEnv.randomRollout(env, s.toLong)).sum / n

  test("trained policy beats the random baseline on every corpus graph") {
    val bases = Map(
      "flagship" -> Array(5.0, 25.0, 150.0, 1500.0, 6000.0),
      "star4" -> Array(6000.0, 1500.0, 200.0, 10.0),
      "cycle5" -> Array(25.0, 150.0, 1500.0, 6000.0, 10.0),
      "bushy6" -> Array(6000.0, 1500.0, 200.0, 10.0, 150.0, 25.0),
      "chain3" -> Array(25.0, 150.0, 1500.0),
      "kite6" -> Array(25.0, 150.0, 1500.0, 6000.0, 10.0, 200.0),
      "cycle4" -> Array(150.0, 1500.0, 6000.0, 10.0))
    ExperimentCorpus.all.foreach { cq =>
      val (env, _, opt) = setup(cq, bases(cq.name))
      val rand = randomBaseline(env, 20)
      val policy = new QPolicy(env.attrCount)
      policy.train(env, episodes = 300)
      val learned = policy.rollout(env)
      assert(learned <= rand,
        s"${cq.name}: learned $learned worse than random avg $rand")
      assert(learned >= opt, s"${cq.name}: cost below exact optimum?!")
      assert(learned <= opt * 3.0,
        s"${cq.name}: learned $learned not within 3x of optimum $opt")
    }
  }

  test("learning curve improves: late episodes cheaper than early ones") {
    val (env, _, _) = setup(ExperimentCorpus.star4,
      Array(6000.0, 1500.0, 200.0, 10.0))
    val curve = new QPolicy(env.attrCount).train(env, episodes = 300)
    val early = curve.take(50).sum / 50
    val late = curve.takeRight(50).sum / 50
    assert(late <= early,
      s"no learning: late avg $late vs early avg $early")
  }

  test("learned final tree is a valid complete join order") {
    val (env, _, _) = setup(ExperimentCorpus.chain3, Array(25.0, 150.0, 1500.0))
    val policy = new QPolicy(env.attrCount)
    policy.train(env, episodes = 100)
    policy.rollout(env)
    val tree = env.finalTree
    assert(java.lang.Long.bitCount(tree.set) == 3)
  }
}
