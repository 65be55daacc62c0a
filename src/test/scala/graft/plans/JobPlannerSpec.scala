package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The JOB-scale workload contract: every corpus graph is connected
  * and sized 8-14 relations (clique6 is the 15-edge density extreme),
  * the corpus straddles the 12-edge exact-search boundary, Auto's
  * routing is exercised BOTH ways on these real graphs (p15/p16's
  * claim), and planner choice never changes the 11-way answer. */
class JobPlannerSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("corpus: 21 connected queries, 8-14 relations, boundary straddled") {
    val qs = JobCorpus.all
    assert(qs.size == 21)
    assert(qs.map(_.name).distinct.size == qs.size)
    qs.foreach { cq =>
      assert(cq.graph.connected(cq.graph.full), s"${cq.name} disconnected")
      assert(cq.filters.size == cq.graph.relations.size)
      if (cq.name != "clique6")
        assert(cq.graph.relations.size >= 8 && cq.graph.relations.size <= 14,
          s"${cq.name}: ${cq.graph.relations.size} relations")
    }
    assert(qs.count(_.graph.relations.size >= 8) == 20)
    // both routing regimes present: under and at/past the 12-edge line
    assert(qs.count(_.graph.edges.size < 12) >= 10)
    assert(qs.count(_.graph.edges.size >= 12) >= 4)
    // aliases really repeat tables
    assert(qs.exists(_.graph.relations.exists(_.contains('@'))))
  }

  private def card(cq: ExperimentCorpus.CorpusQuery): Cardinality = {
    val base = cq.graph.relations.map(n =>
      AliasedRels.rowCount(spark, sf, n).toDouble).toArray
    HeuristicCardinality.uniform(cq.graph, base)
  }

  test("Auto routes DPccp under the boundary, IKKBZ at it — for real") {
    val t11 = JobCorpus.tree11; val t13 = JobCorpus.tree13
    assert(t11.graph.edges.size == 10 && t13.graph.edges.size == 12)
    val c11 = card(t11); val c13 = card(t13)
    assert(Enumerators.Auto().plan(t11.graph, c11, CostModel.Cout).tree ==
      Enumerators.DPccp.plan(t11.graph, c11, CostModel.Cout).tree,
      "tree11 must route to exact DP")
    assert(Enumerators.Auto().plan(t13.graph, c13, CostModel.Cout).tree ==
      Enumerators.Ikkbz.plan(t13.graph, c13, CostModel.Cout).tree,
      "tree13 must route to IKKBZ")
  }

  test("aliased relations load with suffixed columns") {
    val df = AliasedRels.load(spark, sf, "orders@2")
    assert(df.columns.contains("o_orderkey_a2"))
    assert(!df.columns.contains("o_orderkey"))
    assert(AliasedRels.rowCount(spark, sf, "orders@2") ==
      AliasedRels.rowCount(spark, sf, "orders"))
    val p = AliasedRels.profile(spark, sf, "orders@2")
    assert(p.cols.contains("o_totalprice_a2"))
  }

  test("planner choice never changes the 11-way answer") {
    def rows(p: JoinOrderPlanner) =
      PlannerQueries.runJob(JobCorpus.tree11, p)(spark, sf)
        .collect().map(_.toSeq).toSet
    val a = rows(Enumerators.Auto())
    assert(a == rows(Enumerators.Ikkbz), "auto vs ikkbz diverged")
    assert(a == rows(Enumerators.Greedy), "auto vs greedy diverged")
    val cnt = PlannerQueries.runJob(JobCorpus.tree11, Enumerators.Auto())(
      spark, sf).collect().head.getLong(2)
    assert(cnt > 0, "the 11-way join must be non-degenerate")
  }
}
