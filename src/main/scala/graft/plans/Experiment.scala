package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's experiment loop, Spark-native: for each (query,
  * planner) record cost, join-order string, planning time, and optionally
  * execution runtime; plus the est-vs-true cardinality regret experiment
  * (reference: QueryOptExperiment.planAndExecuteQuery:616-699 and
  * startTestCardinalities:437-505; output analog of
  * allQueryRuntimes.json read by analyze_runtimes.py).
  */
object Experiment {

  /** One query in the experiment corpus: its graph, per-relation filters,
    * and the DataFrame inputs builder. */
  final case class ExperimentQuery(
      name: String,
      graph: QueryGraph,
      filters: Vector[Option[String]],
      trueCard: Cardinality,
      estCard: Cardinality)

  final case class PlannerRecord(
      query: String,
      planner: String,
      cost: Double,
      joinOrder: String,
      planningMs: Double,
      runtimeMs: Double)

  /** Cost/plan/runtime per planner per query — the core loop. */
  def run(
      spark: SparkSession,
      sfDir: String,
      queries: Seq[ExperimentQuery],
      planners: Seq[JoinOrderPlanner],
      cm: CostModel,
      execute: Boolean): Seq[PlannerRecord] =
    for {
      q <- queries
      p <- planners
    } yield {
      val planned = p.plan(q.graph, q.trueCard, cm)
      val runtimeMs =
        if (!execute) -1.0
        else {
          val inputs = q.graph.relations.zip(
            q.graph.relations.map(n => graft.sources.Tables.load(spark, sfDir, n)))
            .zip(q.filters).map { case ((n, df), f) =>
              RelInput(n, df, f.map(org.apache.spark.sql.functions.expr))
            }
          val df = JoinTreeExecutor.build(planned.tree, q.graph, inputs, q.trueCard)
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e6
        }
      PlannerRecord(q.name, p.name, planned.cost, planned.joinStr(q.graph),
        planned.planningNanos / 1e6, runtimeMs)
    }

  /** Cardinality-regret: cost of the plan chosen under ESTIMATED
    * cardinalities vs the plan chosen under TRUE ones, both priced with
    * true cardinalities — the reference's headline experiment
    * (est-vs-opt cost maps, QueryOptExperiment.java:481-498). */
  final case class RegretRecord(
      query: String, planner: String,
      estPlanCost: Double, optPlanCost: Double, regret: Double)

  def cardinalityRegret(
      queries: Seq[ExperimentQuery],
      planners: Seq[JoinOrderPlanner],
      cm: CostModel): Seq[RegretRecord] =
    for {
      q <- queries
      p <- planners
    } yield {
      val estPlan = p.plan(q.graph, q.estCard, cm)   // planned with estimates
      val optPlan = p.plan(q.graph, q.trueCard, cm)  // planned with truth
      val estCostTrue = CostModel.treeCost(estPlan.tree, cm, q.trueCard)
      val optCostTrue = CostModel.treeCost(optPlan.tree, cm, q.trueCard)
      RegretRecord(q.name, p.name, estCostTrue, optCostTrue,
        if (optCostTrue > 0) estCostTrue / optCostTrue else 1.0)
    }

  def recordsToJson(rs: Seq[PlannerRecord]): String =
    rs.map { r =>
      s"""{"query":"${r.query}","planner":"${r.planner}",""" +
        s""""cost":${r.cost},"joinOrder":"${r.joinOrder}",""" +
        s""""planningMs":${r.planningMs},"runtimeMs":${r.runtimeMs}}"""
    }.mkString("[", ",", "]")

  def regretsToJson(rs: Seq[RegretRecord]): String =
    rs.map { r =>
      s"""{"query":"${r.query}","planner":"${r.planner}",""" +
        s""""estPlanCost":${r.estPlanCost},"optPlanCost":${r.optPlanCost},""" +
        s""""regret":${r.regret}}"""
    }.mkString("[", ",", "]")
}

/** Runnable experiment over the testdata: the flagship graph + a
  * star-shaped 6-relation query, all planners, Cout model; writes
  * planner records + regret table as JSON (analog of
  * allQueryRuntimes.json).
  *
  * Usage: runMain graft.plans.ExperimentMain [sfDir [outJson]]
  */
object ExperimentMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("/tmp/experiment.json")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // TRUE cardinalities from the injected dictionary (the reference's
    // core mechanism: ./pg.json, MyMetadataQuery.java:81-162), generated
    // by tools/CardDump; estimates = the textbook independence heuristic
    // over unfiltered base counts — the classic estimation error whose
    // plan-quality cost the regret experiment measures.
    val fixture = sys.env.getOrElse("GRAFT_CARDS_JSON",
      "fixtures/cards_sf0.001.json")
    val dict: Map[String, Map[String, Double]] =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(fixture)))
        CardinalityStore.parseJson(
          java.nio.file.Files.readString(java.nio.file.Paths.get(fixture)))
      else Map.empty

    def mkQuery(
        name: String, g: QueryGraph,
        filters: Vector[Option[String]]): Experiment.ExperimentQuery = {
      val base = g.relations.map(n =>
        graft.sources.Tables.rowCount(spark, sfDir, n).toDouble).toArray
      val est = HeuristicCardinality.uniform(g, base)
      val trueC = dict.get(name) match {
        case Some(m) => new CardinalityStore(g, m, est)
        case None => est
      }
      Experiment.ExperimentQuery(name, g, filters, trueC, est)
    }

    val (g1, f1) = PlannerQueries.flagshipGraph
    val q1 = mkQuery("flagship", g1, f1)

    // star: lineitem at the center joined to orders, part, supplier
    val g2 = QueryGraph(
      Vector("lineitem", "orders", "part", "supplier"),
      Vector(
        JoinEdge(0, 1, Seq("l_orderkey" -> "o_orderkey")),
        JoinEdge(0, 2, Seq("l_partkey" -> "p_partkey")),
        JoinEdge(0, 3, Seq("l_suppkey" -> "s_suppkey"))))
    val q2 = mkQuery("star4", g2,
      Vector(None, Some("o_orderstatus = 'F'"), Some("p_type = 'PROMO'"), None))

    val planners = Enumerators.all
    val records = Experiment.run(spark, sfDir, Seq(q1, q2), planners,
      CostModel.Cout, execute = true)
    records.foreach { r =>
      println(f"${r.query}%-10s ${r.planner}%-10s cost=${r.cost}%12.1f " +
        f"plan=${r.planningMs}%7.2fms run=${r.runtimeMs}%8.1fms  ${r.joinOrder}")
    }
    val regrets = Experiment.cardinalityRegret(Seq(q1, q2), planners, CostModel.Cout)
    regrets.foreach { r =>
      println(f"${r.query}%-10s ${r.planner}%-10s est-plan-cost=${r.estPlanCost}%12.1f " +
        f"opt-plan-cost=${r.optPlanCost}%12.1f regret=${r.regret}%6.3f")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      s"""{"records":${Experiment.recordsToJson(records)},""" +
        s""""regrets":${Experiment.regretsToJson(regrets)}}""")
    println(s"wrote $out")
    spark.stop()
  }
}
