package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** p28: the reference's WIDTH CEILING — JOB's largest queries join
  * ~17 relations (README.md:6-9), and the reference's exhaustive rule
  * refuses ≥12 edges (ExhaustiveJoinOrderRule.java:107-109). tree17
  * pins all three behaviors at that width on one graph: DPccp plans
  * it exactly (tree-shaped — 1,737 connected subgraphs, not 2^17),
  * BnB refuses it (serialized as null cost, the r13 JSON lesson), and
  * Auto routes to IKKBZ past its budget. Planner choice never changes
  * the 17-way answer. */
class Tree17Spec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def card(cq: ExperimentCorpus.CorpusQuery): Cardinality = {
    val base = cq.graph.relations.map(n =>
      AliasedRels.rowCount(spark, sf, n).toDouble).toArray
    HeuristicCardinality.uniform(cq.graph, base)
  }

  test("tree17 shape: 17 relations, 16 edges, connected, tree-sparse") {
    val g = JobCorpus.tree17.graph
    assert(g.relations.size == 17 && g.edges.size == 16)
    assert(g.connected(g.full))
    // tree-shaped: the exact-search space is the connected-subgraph
    // count, and for this tree it is 1,737 — the reason DPccp stays
    // cheap where a 17-clique's 2^17 would not
    val csg = (1L to g.full).count(g.connected)
    assert(csg == 1737, s"connected subgraphs: $csg")
  }

  test("DPccp plans the ceiling exactly; never beaten by the heuristics") {
    val cq = JobCorpus.tree17
    val c = card(cq)
    val exact = Enumerators.DPccp.plan(cq.graph, c, CostModel.Cout)
    assert(java.lang.Double.isFinite(exact.cost) && exact.cost > 0)
    assert(exact.tree.set == cq.graph.full, "plan must cover all 17 leaves")
    for (p <- Seq(Enumerators.Bushy, Enumerators.Greedy, Enumerators.Ikkbz,
        Enumerators.LeftDeepDP)) {
      val h = p.plan(cq.graph, c, CostModel.Cout)
      assert(CostModel.treeCost(h.tree, CostModel.Cout, c) >=
        exact.cost - 1e-6, s"${p.name} beat exact DP?")
    }
  }

  test("BnB refuses 16 edges; the refusal serializes as null, not Infinity") {
    val cq = JobCorpus.tree17
    val c = card(cq)
    intercept[PlanningRefused] {
      Enumerators.BranchAndBound().plan(cq.graph, c, CostModel.Cout)
    }
    // the r13 lesson: a refusal's Infinity cost must leave the
    // experiment artifact as a null JSON token, never `Infinity`
    val json = Experiment.recordsToJson(Seq(Experiment.PlannerRecord(
      "tree17", "bnb", "cout", Double.PositiveInfinity,
      "PLANNING-REFUSED(16 edges)", 0.0, Vector.empty)))
    assert(json.contains("\"cost\":null") && !json.contains("Infinity"))
  }

  test("Auto routes IKKBZ past its exact budget on the ceiling graph") {
    val cq = JobCorpus.tree17
    val c = card(cq)
    assert(Enumerators.Auto().plan(cq.graph, c, CostModel.Cout).tree ==
      Enumerators.Ikkbz.plan(cq.graph, c, CostModel.Cout).tree,
      "tree17 (16 edges) must route to IKKBZ")
  }

  test("ceiling regret artifact: DPccp optimal, BnB null, estimator " +
      "ladder converges (committed fixture — no rerun)") {
    import com.fasterxml.jackson.databind.ObjectMapper
    import scala.jdk.CollectionConverters._
    val mapper = new ObjectMapper()
    val root = mapper.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get("fixtures/experiment_ceiling_r15.json")))
    val cout = root.get("records").elements().asScala
      .filter(_.get("costModel").asText() == "cout").toSeq
    // DPccp's truth-planned tree is the GLOBAL optimum at 17 relations
    val dp = cout.find(_.get("planner").asText() == "dpccp").get
    val finiteCosts = cout.filterNot(_.get("cost").isNull)
      .map(_.get("cost").asDouble())
    assert(dp.get("cost").asDouble() == finiteCosts.min)
    // BnB's refusal is a null-cost row, never Infinity (the r13 lesson)
    val bnb = cout.find(_.get("planner").asText() == "bnb").get
    assert(bnb.get("cost").isNull &&
      bnb.get("joinOrder").asText().startsWith("PLANNING-REFUSED"))
    // the estimator ladder lands inside the regret table: naive pays
    // 3.3x under DPccp, hist shrinks it to <=1.15, the auto trigger
    // ESCALATES tree17 (events-correlation at width 17) and the
    // sample tier recovers the optimum exactly
    def regret(tier: String): Double =
      root.get(tier).elements().asScala
        .find(r => r.get("planner").asText() == "dpccp" &&
          r.get("costModel").asText() == "cout").get
        .get("regret").asDouble()
    assert(regret("regrets") > 3.0)
    assert(regret("regrets_histest") <= 1.15)
    assert(regret("regrets_samplest") == 1.0)
    assert(root.get("auto_escalated").elements().asScala
      .exists(_.asText() == "tree17"))
    assert(regret("regrets_auto") == 1.0)
  }

  test("planner choice never changes the 17-way answer (p28 contract)") {
    def rows(p: JoinOrderPlanner) =
      PlannerQueries.runJob(JobCorpus.tree17, p)(spark, sf)
        .collect().map(_.toSeq).toSet
    val exact = rows(Enumerators.DPccp)
    assert(exact.nonEmpty)
    assert(rows(Enumerators.Ikkbz) == exact)
    assert(rows(Enumerators.Bushy) == exact)
  }
}
