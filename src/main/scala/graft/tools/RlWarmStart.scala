// RL warm-start — the PRACTICAL payoff of cross-query generalization
// that zero-shot transfer failed to show (EXPERIMENT_r12: the shared
// policy only beat random on held-out queries, which is WHY the
// reference retrains per workload, QueryOptExperiment.java:534-547):
// even a weak shared prior should cut the episodes a per-query
// fine-tune needs to reach the exact-DP optimum. This tool trains the
// shared MlpQPolicy under the RlGeneralization protocol, then for
// each held-out query runs three otherwise-IDENTICAL fine-tunes —
// initialized from the shared weights (warm), from shrink-and-perturb
// blended weights (shrunk — see [[shrinkPerturb]]), and from fresh
// Glorot init (cold) — measuring the greedy-rollout plan-cost ratio
// vs the DPccp optimum after every episode. Reported per query: the
// full curves, best ratio within budget, episodes-to-optimum and
// episodes-to-1.5×.
//
// Determinism (pinned in RlWarmStartSpec): both fine-tunes construct
// a fresh MlpQPolicy with its fixed seed (warm then restores the
// shared snapshot — weights change, the exploration stream doesn't),
// so the whole experiment is a pure function of the corpus fixture.
//
// Usage: runMain graft.tools.RlWarmStart [sfDir [outJson]]
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.plans._

object RlWarmStart {

  type MlpSnap = (Array[Array[Double]], Array[Double], Array[Double], Double)

  /** Fine-tune a per-query policy for `budget` episodes, measuring the
    * greedy-rollout cost ratio vs `opt` BEFORE training (index 0 =
    * zero-shot) and after every episode — curve length budget + 1.
    * `init = None` is the cold arm, `Some(shared)` the warm arm; both
    * use the same fresh-seed exploration stream and the same one-shot
    * ε-decay schedule as the per-query qlearn planner (p07). */
  private[tools] def fineTuneCurve(
      attrCount: Int, init: Option[MlpSnap], env: JoinOrderEnv,
      opt: Double, greedy: Double, budget: Int): Vector[Double] = {
    val p = new MlpQPolicy(attrCount)
    init.foreach(p.restoreWeights)
    def ratio: Double = if (opt > 0) p.rollout(env) / opt else 1.0
    val curve = Vector.newBuilder[Double]
    curve += ratio
    (0 until budget).foreach { ep =>
      val eps = 0.4 + (0.02 - 0.4) * ep / math.max(budget - 1, 1)
      p.train(env, episodes = 1, epsilonStart = eps, epsilonEnd = eps,
        returnScale = math.max(greedy, 1.0))
      curve += ratio
    }
    curve.result()
  }

  /** First index (episodes trained) whose ratio is ≤ `thresh`; -1 if
    * the budget never reaches it. */
  private[tools] def episodesTo(curve: Vector[Double],
      thresh: Double): Int = curve.indexWhere(_ <= thresh)

  /** Shrink-and-perturb (Ash & Adams 2020, arXiv:1910.08475): blend
    * the shared weights toward a fresh init, θ ← λ·θ_shared +
    * (1−λ)·θ_fresh — the published remedy for warm-start plasticity
    * loss (an opinionated, tanh-saturated network takes gradient
    * steps too small to ever flip its argmax; a fresh net is plastic
    * but ignorant). Deterministic: the fresh component is
    * MlpQPolicy's fixed-seed Glorot init. */
  private[tools] def shrinkPerturb(
      shared: MlpSnap, fresh: MlpSnap, lam: Double): MlpSnap = (
    shared._1.zip(fresh._1).map { case (s, f) =>
      s.zip(f).map { case (a, b) => lam * a + (1 - lam) * b } },
    shared._2.zip(fresh._2).map { case (a, b) => lam * a + (1 - lam) * b },
    shared._3.zip(fresh._3).map { case (a, b) => lam * a + (1 - lam) * b },
    lam * shared._4 + (1 - lam) * fresh._4)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("fixtures/rl_warmstart_r13.json")
    val budget = 120
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val (registry, qs) = RlGeneralization.prepare(spark, sfDir)
    val (test, rest) = qs.partition(q => RlGeneralization.TestNames(q.name))
    val (valid, train) =
      rest.partition(q => RlGeneralization.ValNames(q.name))

    // the shared prior: identical protocol to the generalization run,
    // best-on-validation checkpoint held on exit
    val mlp = new MlpQPolicy(registry.attrCount)
    RlGeneralization.runFit[MlpSnap](train, valid, test,
      (q, eps) => { mlp.train(q.env, episodes = 5,
        epsilonStart = eps, epsilonEnd = eps,
        returnScale = math.max(q.greedy, 1.0)); () },
      q => mlp.rollout(q.env),
      () => mlp.weightSnapshot, mlp.restoreWeights)
    val shared = mlp.weightSnapshot
    val fresh = new MlpQPolicy(registry.attrCount).weightSnapshot

    final case class Arm(curve: Vector[Double]) {
      def toOpt: Int = episodesTo(curve, 1.001)
      def to105: Int = episodesTo(curve, 1.05)
      def to150: Int = episodesTo(curve, 1.5)
      def best: Double = curve.min
    }
    // λ sweep: warm is λ=1, cold is λ=0; if NO intermediate blend
    // beats cold, the shared prior carries no per-query signal at any
    // mixing strength — the decisive form of the negative
    val lambdas = Seq(0.75, 0.5, 0.25, 0.1)
    val arms = (("warm" -> Some(shared)) +:
      lambdas.map(l => s"s${(l * 100).round}" ->
        Some(shrinkPerturb(shared, fresh, l)))) :+
      ("cold" -> (None: Option[MlpSnap]))
    val rows = test.sortBy(_.name).map { q =>
      q.name -> arms.map { case (label, init) =>
        label -> Arm(fineTuneCurve(registry.attrCount, init,
          q.env, q.opt, q.greedy, budget))
      }
    }

    def arr(v: Vector[Double]) =
      v.map(x => f"$x%.4f").mkString("[", ",", "]")
    val perQuery = rows.map { case (name, byArm) =>
      val fields = byArm.map { case (label, a) =>
        s""""${label}_zero_shot":${f"${a.curve.head}%.4f"},
            |"${label}_best":${f"${a.best}%.4f"},
            |"${label}_to_opt":${a.toOpt},"${label}_to_150":${a.to150},
            |"${label}_curve":${arr(a.curve)}""".stripMargin
      }.mkString(",\n")
      s""""$name":{$fields}"""
    }.mkString(",\n")
    // aggregates: per-arm geomean of best-in-budget ratio (always
    // defined), and mean episodes-to-1.5× over queries EVERY arm
    // solves (a -1 anywhere excludes the query — censored means would
    // flatter whichever arm times out)
    def geo(vs: Seq[Double]) =
      math.exp(vs.map(v => math.log(math.max(v, 1e-12))).sum / vs.size)
    val aggBest = arms.map { case (label, _) =>
      s""""geomean_best_$label":${
        f"${geo(rows.map(_._2.find(_._1 == label).get._2.best))}%.4f"}"""
    }.mkString(",")
    val solved = rows.filter(_._2.forall(_._2.to150 >= 0))
    val aggTo150 = arms.map { case (label, _) =>
      val v = if (solved.isEmpty) -1.0
        else solved.map(_._2.find(_._1 == label).get._2.to150)
          .sum.toDouble / solved.size
      s""""mean_episodes_to_150_$label":${f"$v%.1f"}"""
    }.mkString(",")
    val json =
      s"""{"budget":$budget,
          |"shrink_lambdas":${lambdas.mkString("[", ",", "]")},
          |"queries":{$perQuery},
          |$aggBest,
          |"solved_all_arms":${solved.size},$aggTo150}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(json)
    spark.stop()
  }
}
