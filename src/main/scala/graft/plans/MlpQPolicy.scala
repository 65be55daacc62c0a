package graft.plans

import scala.collection.immutable.BitSet

/** The "deep" half of the reference's RL story: its featurization is
  * "based on the DQ paper" (QueryGraph.java:189) and its learner is an
  * out-of-snapshot Python client (README "Python: Used for all the
  * learning stuff"); DQ itself (Krishnan et al., arXiv:1808.03196 §4.2)
  * trains a 2-layer MLP over the one-hot featurization. [[QPolicy]] is
  * the linear DQ baseline; this
  * is the faithful model class — one tanh hidden layer over the same
  * (left ⧺ right) one-hot input, trained on the same normalized
  * Monte-Carlo returns with plain SGD backprop. No external deps: the
  * network is two weight arrays and forward/backward is ~30 lines over
  * sparse bitsets.
  *
  * Unlike [[QPolicy]] there is deliberately NO tabular memo: the MLP
  * exists for the CROSS-QUERY experiment (tools/RlGeneralization) where
  * schema-keyed memorization is unsound; per-query training keeps using
  * QPolicy.
  */
final class MlpQPolicy(attrCount: Int, hidden: Int = 24,
    lr: Double = 0.02, seed: Long = 7L) {

  private val dim = 2 * attrCount
  private val rnd = new scala.util.Random(seed)
  // Glorot-ish init: small symmetric weights so tanh starts linear
  private val w1 = Array.fill(hidden, dim)((rnd.nextDouble() - 0.5) * 0.2)
  private val b1 = new Array[Double](hidden)
  private val w2 = Array.fill(hidden)((rnd.nextDouble() - 0.5) * 0.2)
  private var b2 = 0.0

  def weightSnapshot: (Array[Array[Double]], Array[Double], Array[Double], Double) =
    (w1.map(_.clone()), b1.clone(), w2.clone(), b2)
  def restoreWeights(
      s: (Array[Array[Double]], Array[Double], Array[Double], Double)): Unit = {
    var j = 0
    while (j < hidden) {
      System.arraycopy(s._1(j), 0, w1(j), 0, dim); j += 1
    }
    System.arraycopy(s._2, 0, b1, 0, hidden)
    System.arraycopy(s._3, 0, w2, 0, hidden)
    b2 = s._4
  }

  /** Hidden activations for the sparse (left, right) one-hot input. */
  private def hiddenOf(l: BitSet, r: BitSet): Array[Double] = {
    val h = new Array[Double](hidden)
    var j = 0
    while (j < hidden) {
      var s = b1(j)
      val row = w1(j)
      l.foreach(i => s += row(i))
      r.foreach(i => s += row(attrCount + i))
      h(j) = math.tanh(s)
      j += 1
    }
    h
  }

  def q(l: BitSet, r: BitSet): Double = {
    val h = hiddenOf(l, r)
    var s = b2
    var j = 0
    while (j < hidden) { s += w2(j) * h(j); j += 1 }
    s
  }

  /** One SGD backprop step toward target `g` for the pair (l, r);
    * gradient scaled by the active-feature count (the NLMS discipline
    * QPolicy uses) so dense late-episode factors don't take outsized
    * steps. */
  private def update(l: BitSet, r: BitSet, g: Double): Unit = {
    val h = hiddenOf(l, r)
    var pred = b2
    var j = 0
    while (j < hidden) { pred += w2(j) * h(j); j += 1 }
    val err = (g - pred) / math.max(l.size + r.size, 1)
    j = 0
    while (j < hidden) {
      val dOut = lr * err
      val delta = dOut * w2(j) * (1.0 - h(j) * h(j))
      w2(j) += dOut * h(j)
      val row = w1(j)
      l.foreach(i => row(i) += delta)
      r.foreach(i => row(attrCount + i) += delta)
      b1(j) += delta
      j += 1
    }
    b2 += lr * err
  }

  private def qOfAction(env: JoinOrderEnv, a: Int): Double = {
    val (l, r) = env.actionFeatures(a)
    q(l, r)
  }

  /** ε-greedy Monte-Carlo training, same protocol and knobs as
    * [[QPolicy.train]]. */
  def train(env: JoinOrderEnv, episodes: Int,
      epsilonStart: Double = 0.5, epsilonEnd: Double = 0.02,
      returnScale: Double = 1.0): Vector[Double] =
    (0 until episodes).map { ep =>
      val eps = epsilonStart +
        (epsilonEnd - epsilonStart) * ep / math.max(episodes - 1, 1)
      env.reset()
      val steps = Vector.newBuilder[(BitSet, BitSet)]
      val rewards = Vector.newBuilder[Double]
      while (!env.isDone) {
        val n = env.actions.size
        val a =
          if (rnd.nextDouble() < eps) rnd.nextInt(n)
          else (0 until n).maxBy(qOfAction(env, _))
        steps += env.actionFeatures(a)
        rewards += env.step(a)
      }
      val rs = rewards.result()
      val gs = rs.scanRight(0.0)(_ + _).init
      steps.result().zip(gs).foreach { case ((l, r), g) =>
        update(l, r, g / returnScale)
      }
      env.totalCost
    }.toVector

  /** Greedy-by-Q rollout (ε = 0), returning the episode cost. */
  def rollout(env: JoinOrderEnv): Double = {
    env.reset()
    while (!env.isDone) {
      val n = env.actions.size
      env.step((0 until n).maxBy(qOfAction(env, _)))
    }
    env.totalCost
  }
}
