package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Cross-planner result-hash verification (the reference's
  * Query.verifyResults, Query.java:71-80): every executed planner must
  * produce the same result set per query; a planner emitting a
  * wrong-but-runnable tree must fail the experiment loudly. */
class ExperimentHashSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

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

  private def chain3Query: Experiment.ExperimentQuery = {
    val cq = ExperimentCorpus.chain3
    val base = cq.graph.relations.map(n =>
      graft.sources.Tables.rowCount(spark, sfDir, n).toDouble).toArray
    val card = HeuristicCardinality.uniform(cq.graph, base)
    Experiment.ExperimentQuery(cq.name, cq.graph, cq.filters, card, card)
  }

  /** Wrong-but-runnable: silently drops the last relation — the tree
    * executes fine but joins only 2 of the 3 tables. */
  private object DroppedRelationPlanner extends JoinOrderPlanner {
    val name = "broken"
    protected def search(g: QueryGraph, card: Cardinality, cm: CostModel): JoinTree =
      Node(Leaf(0), Leaf(1))
  }

  test("agreeing planners share one result hash and pass verification") {
    val records = Experiment.run(spark, sfDir, Seq(chain3Query),
      Seq(Enumerators.DPccp, Enumerators.LeftDeepDP, Enumerators.RandomOrder()),
      CostModel.Cout, execute = true, runsPerQuery = 1)
    val hashes = records.map(_.resultHash).distinct
    assert(hashes.size == 1 && hashes.head.nonEmpty,
      s"expected one shared hash, got $hashes")
  }

  test("a planner dropping a relation trips cross-planner verification") {
    val ex = intercept[IllegalStateException] {
      Experiment.run(spark, sfDir, Seq(chain3Query),
        Seq(Enumerators.DPccp, DroppedRelationPlanner),
        CostModel.Cout, execute = true, runsPerQuery = 1)
    }
    assert(ex.getMessage.contains("result divergence"))
    assert(ex.getMessage.contains("broken"))
  }

  test("execution timeout records the sentinel and leaves the hash unverified") {
    // maxExecutionSecs = 0: the run is cancelled immediately, recorded
    // as the reference's maxExecutionTime*1000 sentinel, and the hash —
    // which runs under the SAME timeout — stays "" (unverified) instead
    // of re-executing the plan unboundedly or tripping the divergence
    // check against other planners
    val records = Experiment.run(spark, sfDir, Seq(chain3Query),
      Seq(Enumerators.DPccp), CostModel.Cout, execute = true,
      runsPerQuery = 1, maxExecutionSecs = 0)
    val r = records.head
    assert(r.runtimesMs == Vector(0.0), s"expected sentinel, got ${r.runtimesMs}")
    assert(r.resultHash == "", "timed-out hash must stay unverified")
    Experiment.verifyResultHashes(records) // unverified != divergent
  }

  test("verifyResultHashes ignores non-executed records") {
    val rs = Seq(
      Experiment.PlannerRecord("q", "a", "cout", 1, "(a b)", 1, Vector.empty),
      Experiment.PlannerRecord("q", "b", "cout", 1, "(b a)", 1, Vector.empty))
    Experiment.verifyResultHashes(rs) // empty hashes: no divergence
  }
}
