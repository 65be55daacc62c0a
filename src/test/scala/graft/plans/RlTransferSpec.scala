package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.BitSet

/** The cross-query transfer surfaces added for tools/RlGeneralization:
  * alias-resolving attribute features, discretized selectivity-bucket
  * bits, the non-tabular/normalized QPolicy mode, and the MLP Q-model. */
class RlTransferSpec extends AnyFunSuite {

  test("registry resolves aliased relations to base-table attributes") {
    val reg = new AttributeRegistry(Seq(
      "orders" -> Seq("o_orderkey", "o_custkey"), "customer" -> Seq("c_custkey")))
    assert(reg.tableAttrs("orders@2") == reg.tableAttrs("orders"))
    assert(reg.offset("orders@3", "o_custkey") == reg.offset("orders", "o_custkey"))
  }

  test("selBuckets extend the attribute space per base table") {
    val plain = new AttributeRegistry(Seq("a" -> Seq("x"), "b" -> Seq("y", "z")))
    val bucketed = new AttributeRegistry(
      Seq("a" -> Seq("x"), "b" -> Seq("y", "z")), selBuckets = 4)
    assert(plain.attrCount == 3)
    assert(bucketed.attrCount == 3 + 2 * 4)
    val offs = for (t <- Seq("a", "b"); k <- 0 until 4)
      yield bucketed.selBucketOffset(t, k)
    assert(offs.distinct.size == 8 && offs.forall(o => o >= 3 && o < 11))
    // bucket slots are shared by aliases of the same base table
    assert(bucketed.selBucketOffset("b@2", 1) == bucketed.selBucketOffset("b", 1))
    assertThrows[IllegalArgumentException](bucketed.selBucketOffset("a", 4))
  }

  private val g = QueryGraph(Vector("a", "b", "c"),
    Vector(JoinEdge(0, 1), JoinEdge(1, 2)))
  private val card =
    HeuristicCardinality.uniform(g, Array(10.0, 100.0, 1000.0))

  test("selOf sets the matching bucket bit; unfiltered leaves set none") {
    val reg = new AttributeRegistry(Seq(
      "a" -> Seq("x"), "b" -> Seq("y"), "c" -> Seq("z")), selBuckets = 3)
    // a: unfiltered (sel 1.0) -> no bucket bit; b: sel 0.2 -> bucket 0
    // (0.05, 0.5]; c: sel 1e-9 -> clamps to the last bucket (2)
    val sels = Array(1.0, 0.2, 1e-9)
    val env = new JoinOrderEnv(g, card, CostModel.Cout, Some(reg),
      selOf = Some(sels(_)))
    val feats = env.stateFeatures
    assert(feats(0) == reg.tableAttrs("a"))
    assert(feats(1) == (reg.tableAttrs("b") + reg.selBucketOffset("b", 0)))
    assert(feats(2) == (reg.tableAttrs("c") + reg.selBucketOffset("c", 2)))
    // without selOf, bucketed registry behaves exactly like the
    // historical encoding (schema bits only)
    val envNoSel = new JoinOrderEnv(g, card, CostModel.Cout, Some(reg))
    assert(envNoSel.stateFeatures == Vector(
      reg.tableAttrs("a"), reg.tableAttrs("b"), reg.tableAttrs("c")))
  }

  private def synthRegistry(g: QueryGraph): AttributeRegistry =
    new AttributeRegistry(g.relations.map(n => n -> Seq(s"${n}_k1", s"${n}_k2")))

  test("tabular=false keeps Q purely linear (no cross-query memo)") {
    val reg = synthRegistry(g)
    val env = new JoinOrderEnv(g, card, CostModel.Cout, Some(reg))
    val p = new QPolicy(reg.attrCount, tabular = false)
    p.train(env, episodes = 50)
    // every q value must equal the linear dot product of its features
    env.reset()
    (0 until env.actions.size).foreach { a =>
      val (l, r) = env.actionFeatures(a)
      var lin = 0.0
      l.foreach(i => lin += p.w(i))
      r.foreach(i => lin += p.w(reg.attrCount + i))
      assert(math.abs(p.q(l, r) - lin) < 1e-12)
    }
  }

  test("returnScale divides the learned weights, preserving the policy") {
    val reg = synthRegistry(g)
    def weights(scale: Double): Array[Double] = {
      val env = new JoinOrderEnv(g, card, CostModel.Cout, Some(reg))
      val p = new QPolicy(reg.attrCount, tabular = false)
      p.train(env, episodes = 40, returnScale = scale)
      p.w.clone()
    }
    val w1 = weights(1.0)
    val w100 = weights(100.0)
    // uniform scaling preserves every argmax, so trajectories are
    // identical and weights scale exactly
    w1.indices.foreach(i => assert(math.abs(w1(i) / 100.0 - w100(i)) < 1e-9))
  }

  test("QPolicy snapshot/restore round-trips the linear weights") {
    val reg = synthRegistry(g)
    val env = new JoinOrderEnv(g, card, CostModel.Cout, Some(reg))
    val p = new QPolicy(reg.attrCount, tabular = false)
    p.train(env, episodes = 30)
    val snap = p.weightSnapshot
    val frozen = p.w.clone()
    p.train(env, episodes = 30)
    assert(!p.w.sameElements(frozen), "further training must move weights")
    p.restoreWeights(snap)
    assert(p.w.sameElements(frozen))
  }

  test("MLP policy learns star4 and is seed-deterministic") {
    val cq = ExperimentCorpus.star4
    val base = Array(6000.0, 1500.0, 200.0, 10.0)
    val cardS = HeuristicCardinality.uniform(cq.graph, base)
    val reg = synthRegistry(cq.graph)
    val opt = Enumerators.DPccp.plan(cq.graph, cardS, CostModel.Cout).cost
    def trained(): (MlpQPolicy, Double) = {
      val env = new JoinOrderEnv(cq.graph, cardS, CostModel.Cout, Some(reg))
      val p = new MlpQPolicy(reg.attrCount)
      p.train(env, episodes = 300)
      (p, p.rollout(env))
    }
    val (p1, c1) = trained()
    val (_, c2) = trained()
    assert(c1 == c2, "same seed, same training, same rollout")
    val env = new JoinOrderEnv(cq.graph, cardS, CostModel.Cout, Some(reg))
    val rand = (0 until 20).map(s =>
      JoinOrderEnv.randomRollout(env, s.toLong)).sum / 20
    assert(c1 <= rand, s"MLP $c1 worse than random avg $rand")
    assert(c1 >= opt && c1 <= opt * 3.0, s"MLP $c1 vs opt $opt")
    // snapshot/restore round-trip
    val snap = p1.weightSnapshot
    val envR = new JoinOrderEnv(cq.graph, cardS, CostModel.Cout, Some(reg))
    val before = p1.rollout(envR)
    p1.train(envR, episodes = 100)
    p1.restoreWeights(snap)
    assert(p1.rollout(envR) == before)
  }
}
