// Cross-query RL generalization — the reference's ACTUAL research
// loop: its experiment round-robins TRAIN and TEST query sets through
// the RL rule (QueryOptExperiment.java:534-547 "round-robin over
// train/test queries") so the learned policy is evaluated on queries
// it never trained on. The per-query qlearn planner (p07) trains on
// the query's own graph; this tool trains ONE shared policy over a
// train split of the JOB corpus and reports held-out plan quality
// vs the exact-DP optimum.
//
// Cross-query protocol (each point matters — the naive lift of the
// per-query trainer transfers catastrophically, see EXPERIMENT_r12):
//  - features: alias-resolving AttributeRegistry (DQ one-hots over
//    BASE-table schema attributes), so "orders@2" in one query and
//    "orders" in another share weights;
//  - `tabular = false`: the per-workload best-return memo is keyed by
//    schema-attribute bitsets, which COLLIDE across queries with
//    different filters/cardinalities — shared training must stay in
//    the generalizing linear part;
//  - returns normalized per query by its greedy-rollout cost, so one
//    big query's raw costs don't drown every other query's gradient;
//  - early stopping on a VALIDATION split (disjoint from test):
//    the best-on-validation weight snapshot is what test sees.
// TRUE cardinalities are injected from the CardDump fixture, exactly
// as the reference's Python client injects ./pg.json.
//
// Usage: runMain graft.tools.RlGeneralization [sfDir [outJson]]
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.plans._

object RlGeneralization {

  /** One held-out query per shape family — the policy never sees
    * these graphs during training. */
  private[tools] val TestNames =
    Set("chain12_sel", "star10_sel", "tree12", "cycle10_sel", "kite10")

  /** Early-stopping split: excluded from gradient updates, used only
    * to pick the checkpoint that test evaluation gets. */
  private[tools] val ValNames = Set("chain8_sel", "star12", "cycle8", "tree13")

  final case class Q(name: String, g: QueryGraph,
      env: JoinOrderEnv, opt: Double, greedy: Double)

  /** JOB-corpus envs with true-cardinality stores, DPccp optima, and
    * greedy-rollout baselines — the shared substrate of the
    * generalization and warm-start experiments. */
  private[tools] def prepare(
      spark: SparkSession, sfDir: String,
      fixture: String = "fixtures/cards_job_sf0.001.json")
      : (AttributeRegistry, Seq[Q]) = {
    val dict = CardinalityStore.parseJson(
      java.nio.file.Files.readString(java.nio.file.Paths.get(fixture)))
    // 4 selectivity buckets per base table: the discretized form of
    // DQ's selectivity-scaled one-hots — WITHOUT them, the _sel corpus
    // twins are feature-identical to their unfiltered shapes and no
    // policy can transfer across them
    val registry = new AttributeRegistry(
      graft.sources.Tables.names.map { t =>
        t -> graft.sources.Tables.load(spark, sfDir, t).schema.fieldNames.toSeq
      }, selBuckets = 4)
    val cm: CostModel = CostModel.Cout
    val qs = JobCorpus.all.map { cq =>
      val base = cq.graph.relations.map(n =>
        AliasedRels.rowCount(spark, sfDir, n).toDouble).toArray
      val est = HeuristicCardinality.uniform(cq.graph, base)
      val card = new CardinalityStore(
        cq.graph, dict(cq.name), est, cq.filters)
      val opt = Enumerators.DPccp.plan(cq.graph, card, cm).cost
      val selOf = (i: Int) =>
        math.min(card(1L << i) / math.max(base(i), 1.0), 1.0)
      val env = new JoinOrderEnv(cq.graph, card, cm, Some(registry),
        selOf = Some(selOf))
      JoinOrderEnv.greedyRollout(env)
      Q(cq.name, cq.graph, env, opt, env.totalCost)
    }
    (registry, qs)
  }

  // plan-quality ratios are multiplicative — geometric mean, so one
  // outlier query can't own checkpoint selection
  private[tools] def geomean(m: Map[String, Double]): Double =
    math.exp(m.values.map(v => math.log(math.max(v, 1e-12))).sum / m.size)

  final case class Fit(
      trainR: Map[String, Double], validR: Map[String, Double],
      testR: Map[String, Double], bestValRound: Int,
      valCurve: Seq[Double], testCurve: Seq[Double])

  /** Train one model (linear QPolicy or MLP) under the shared
    * protocol: interleaved rounds — per round, a few episodes on
    * EVERY train query at the round's ε (per-query ε-decay would
    * overfit the last-trained graph), returns scaled by each query's
    * greedy cost, best-on-validation (geomean) checkpoint kept for
    * test. On exit the model HOLDS the best-on-validation weights. */
  private[tools] def runFit[S](
      train: Seq[Q], valid: Seq[Q], test: Seq[Q],
      trainQ: (Q, Double) => Unit, rollout: Q => Double,
      snapshot: () => S, restore: S => Unit, rounds: Int = 60): Fit = {
    def evalSplit(split: Seq[Q]): Map[String, Double] =
      split.map(q => q.name ->
        (if (q.opt > 0) rollout(q) / q.opt else 1.0)).toMap
    var bestVal = Double.MaxValue
    var bestSnap = snapshot()
    val curve = (0 until rounds).map { r =>
      val eps = 0.5 + (0.02 - 0.5) * r / (rounds - 1)
      train.foreach(q => trainQ(q, eps))
      val vm = geomean(evalSplit(valid))
      if (vm < bestVal) { bestVal = vm; bestSnap = snapshot() }
      (vm, geomean(evalSplit(test)))
    }
    restore(bestSnap) // test sees the best-on-validation policy
    Fit(evalSplit(train), evalSplit(valid), evalSplit(test),
      curve.map(_._1).zipWithIndex.minBy(_._1)._2,
      curve.map(_._1), curve.map(_._2))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("fixtures/rl_generalization_r12.json")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val (registry, qs) = prepare(spark, sfDir)
    val (test, rest) = qs.partition(q => TestNames(q.name))
    val (valid, train) = rest.partition(q => ValNames(q.name))
    require(test.size == TestNames.size && valid.size == ValNames.size,
      "held-out split incomplete")

    val linear = new QPolicy(registry.attrCount, tabular = false)
    val linFit = runFit[Array[Double]](train, valid, test,
      (q, eps) => { linear.train(q.env, episodes = 5,
        epsilonStart = eps, epsilonEnd = eps,
        returnScale = math.max(q.greedy, 1.0)); () },
      q => linear.rollout(q.env),
      () => linear.weightSnapshot, linear.restoreWeights)

    val mlp = new MlpQPolicy(registry.attrCount)
    val mlpFit = runFit[(Array[Array[Double]], Array[Double], Array[Double], Double)](
      train, valid, test,
      (q, eps) => { mlp.train(q.env, episodes = 5,
        epsilonStart = eps, epsilonEnd = eps,
        returnScale = math.max(q.greedy, 1.0)); () },
      q => mlp.rollout(q.env),
      () => mlp.weightSnapshot, mlp.restoreWeights)

    // baselines on the same held-out split: the untrained
    // 1-step-lookahead greedy rollout, and the seeded random order
    val greedyBase = test.map(q =>
      q.name -> (if (q.opt > 0) q.greedy / q.opt else 1.0)).toMap
    val randomBase = test.map(q =>
      q.name -> (if (q.opt > 0)
        JoinOrderEnv.randomRollout(q.env, seed = 11L) / q.opt
      else 1.0)).toMap

    def fmt(m: Map[String, Double]) = m.toSeq.sortBy(_._1)
      .map { case (k, v) => f""""$k":$v%.4f""" }.mkString("{", ",", "}")
    def fitJson(f: Fit) =
      s"""{"train_ratio_vs_opt":${fmt(f.trainR)},
          |"valid_ratio_vs_opt":${fmt(f.validR)},
          |"test_ratio_vs_opt":${fmt(f.testR)},
          |"best_val_round":${f.bestValRound},
          |"curve_mean_val_ratio":${f.valCurve.map(v =>
              f"$v%.4f").mkString("[", ",", "]")},
          |"curve_mean_test_ratio":${f.testCurve.map(v =>
              f"$v%.4f").mkString("[", ",", "]")}}""".stripMargin
    val json =
      s"""{"linear":${fitJson(linFit)},
          |"mlp":${fitJson(mlpFit)},
          |"test_baseline_greedy":${fmt(greedyBase)},
          |"test_baseline_random":${fmt(randomBase)}}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(json)
    spark.stop()
  }
}
