package graft.plans

import scala.collection.immutable.BitSet

/** The trainer half of the reference's learned-join-order loop: the
  * reference exposes the environment over ZMQ and leaves the Q-learning
  * to an external Python client that is NOT in its snapshot (README
  * "Python: Used for all the learning stuff"; RLJoinOrderRule.java
  * drives the episode, ZeroMQServer serves state/reward; the
  * featurization is "based on the DQ paper", QueryGraph.java:189). This
  * is that
  * trainer, in-process: a linear Q-function over the DQ one-hot
  * featurization (Krishnan et al., "Learning to Optimize Join Queries
  * With Deep Reinforcement Learning", arXiv:1808.03196 — the paper the
  * reference's featurization follows), trained by first-visit
  * Monte-Carlo control with ε-greedy exploration.
  *
  * Q(action) = w · [left-factor attrs ⧺ right-factor attrs]; the return
  * G_t = Σ future rewards = −(remaining plan cost), so greedy-by-Q
  * rollouts minimize predicted remaining cost. Linear-over-one-hots is
  * the DQ baseline model — enough to specialize to a workload's join
  * graph, which is exactly what the reference's per-workload training
  * loop does.
  */
final class QPolicy(attrCount: Int, lr: Double = 0.05, seed: Long = 7L,
    tabular: Boolean = true) {

  private val dim = 2 * attrCount
  private[plans] val w = new Array[Double](dim)
  private val rnd = new scala.util.Random(seed)

  /** Snapshot / restore of the linear weights — lets a cross-query
    * trainer keep the best-on-validation checkpoint (tabular state is
    * intentionally NOT snapshotted: checkpointing only makes sense in
    * the shared `tabular = false` mode). */
  def weightSnapshot: Array[Double] = w.clone()
  def restoreWeights(snap: Array[Double]): Unit =
    System.arraycopy(snap, 0, w, 0, dim)

  // Tabular refinement over the SAME featurization: the linear part
  // generalizes across factor pairs (shared attribute weights), but a
  // purely linear Q cannot separate contexts where one pair's value
  // depends on what else has been joined (cyclic graphs). The table
  // keeps the BEST return observed per visited (left, right) feature
  // pair — sound in this DETERMINISTIC environment (a pair's best-seen
  // continuation is achievable again), and immune to the sample-average
  // trap where returns collected under a bad early policy poison a good
  // pair forever. Per-workload memorization is what the reference's
  // per-query training loop effectively performs. Unseen pairs fall
  // back to the linear estimate.
  //
  // CROSS-QUERY training must pass `tabular = false`: the keys are
  // SCHEMA-attribute bitsets, so two different queries joining the same
  // tables share keys while their true continuation values differ
  // (different filters/cardinalities) — a "best seen across queries"
  // max is meaningless for any one of them.
  private val table =
    scala.collection.mutable.Map.empty[(BitSet, BitSet), Double]

  /** Q-value of joining (left, right): best observed return when the
    * pair has been visited, linear dot product otherwise. */
  def q(l: BitSet, r: BitSet): Double =
    (if (tabular) table.get((l, r)) else None) match {
      case Some(v) => v
      case None =>
        var s = 0.0
        l.foreach(i => s += w(i))
        r.foreach(i => s += w(attrCount + i))
        s
    }

  private def qOfAction(env: JoinOrderEnv, a: Int): Double = {
    val (l, r) = env.actionFeatures(a)
    q(l, r)
  }

  /** One ε-greedy episode; returns the visited (features, return) pairs
    * and the episode cost. */
  private def episode(
      env: JoinOrderEnv, epsilon: Double): (Vector[((BitSet, BitSet), Double)], Double) = {
    env.reset()
    val steps = Vector.newBuilder[((BitSet, BitSet), Double)]
    val rewards = Vector.newBuilder[Double]
    while (!env.isDone) {
      val n = env.actions.size
      val a =
        if (rnd.nextDouble() < epsilon) rnd.nextInt(n)
        else (0 until n).maxBy(qOfAction(env, _))
      val feats = env.actionFeatures(a)
      val r = env.step(a)
      steps += ((feats, 0.0)) // return filled in below
      rewards += r
    }
    // Monte-Carlo returns: G_t = Σ_{u ≥ t} r_u (undiscounted — episodes
    // are short and the objective is total plan cost)
    val rs = rewards.result()
    val gs = rs.scanRight(0.0)(_ + _).init
    (steps.result().zip(gs).map { case ((f, _), g) => (f, g) }, env.totalCost)
  }

  /** Train for `episodes` episodes with linearly-decaying ε. Returns the
    * per-episode costs (the learning curve).
    *
    * `returnScale` divides every Monte-Carlo return before the update —
    * cross-query training MUST normalize (e.g. by the query's greedy
    * rollout cost) so a large query's raw costs don't drown every other
    * query's gradient; per-query training can leave it at 1. */
  def train(env: JoinOrderEnv, episodes: Int,
      epsilonStart: Double = 0.5, epsilonEnd: Double = 0.02,
      returnScale: Double = 1.0): Vector[Double] =
    (0 until episodes).map { ep =>
      val eps = epsilonStart +
        (epsilonEnd - epsilonStart) * ep / math.max(episodes - 1, 1)
      val (visited, cost) = episode(env, eps)
      visited.foreach { case ((l, r), g0) =>
        val g = g0 / returnScale
        // tabular: best return seen for the pair (deterministic env)
        val k = (l, r)
        if (tabular && !table.get(k).exists(_ >= g)) table(k) = g
        // linear: normalized-LMS step toward the return (used for
        // unseen pairs) — dividing by the active-feature count keeps
        // the per-update movement of the PREDICTION (err · ‖x‖²/‖x‖²
        // scale) uniform whether a factor pair activates 4 one-hots
        // or 40, which is what keeps cross-query training stable
        val err = (g - { var s = 0.0
          l.foreach(i => s += w(i)); r.foreach(i => s += w(attrCount + i)); s
        }) / math.max(l.size + r.size, 1)
        l.foreach(i => w(i) += lr * err)
        r.foreach(i => w(attrCount + i) += lr * err)
      }
      cost
    }.toVector

  /** Greedy-by-Q rollout (ε = 0), returning the episode cost; the
    * env's finalTree afterwards is the learned plan. */
  def rollout(env: JoinOrderEnv): Double = {
    env.reset()
    while (!env.isDone) {
      val n = env.actions.size
      env.step((0 until n).maxBy(qOfAction(env, _)))
    }
    env.totalCost
  }
}

object QPolicy {
  /** The learned policy as a [[JoinOrderPlanner]]: train on the query's
    * own graph at plan time (the reference's per-workload loop), then
    * emit the greedy rollout's tree. Deterministic given the fixed
    * seeds. Used by PlannerQueries (p07) and ExperimentMain. */
  case object Planner extends JoinOrderPlanner {
    val name = "qlearn"
    protected def search(g: QueryGraph, card: Cardinality, cm: CostModel): JoinTree = {
      // registry keys are BASE tables (deduped): aliased repeats of a
      // table share its synthetic attributes, matching the
      // alias-resolving AttributeRegistry lookup
      val registry = new AttributeRegistry(
        g.relations.map(AliasedRels.baseOf).distinct.map(n =>
          n -> Seq(s"${n}_k1", s"${n}_k2")))
      val env = new JoinOrderEnv(g, card, cm, Some(registry))
      val policy = new QPolicy(env.attrCount)
      policy.train(env, episodes = 300)
      policy.rollout(env)
      env.finalTree
    }
  }

  /** The env's trivial 1-step-lookahead policy as a planner (the RL
    * rule's behavior baseline) — see PlannerQueries p06. */
  case object RolloutPlanner extends JoinOrderPlanner {
    val name = "rl_greedy_rollout"
    protected def search(g: QueryGraph, card: Cardinality, cm: CostModel): JoinTree = {
      val env = new JoinOrderEnv(g, card, cm)
      JoinOrderEnv.greedyRollout(env)
      env.finalTree
    }
  }
}
