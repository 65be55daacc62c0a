package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The measured-stats estimator must (a) profile exactly (rows, NDVs,
  * min/max vs direct queries), (b) produce the Selinger selectivities
  * its model promises, and (c) estimate the flagship join chain within
  * a sane q-error of the true cardinality — on TPC-H-shaped data the
  * PK-FK containment assumption is nearly exact, so a blowout here
  * means the formula (not the data) is wrong. */
class StatsEstimatorSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("profile matches direct measurement on orders") {
    val p = StatsEstimator.profileTable(spark, sfDir, "orders", approx = false)
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    assert(p.rows == orders.count().toDouble)
    val statuses = orders.select("o_orderstatus").distinct().count()
    assert(p.cols("o_orderstatus").ndv == statuses.toDouble)
    val keys = p.cols("o_orderkey")
    assert(keys.ndv == p.rows, "o_orderkey is a PK — NDV must equal rows")
    assert(keys.minN.contains(0.0))
    assert(keys.maxN.contains(p.rows - 1))
    assert(p.cols("o_orderstatus").minN.isEmpty, "strings carry no min_num")
  }

  test("Selinger selectivities: 1/NDV equality, span ranges, clamped") {
    val p = StatsEstimator.profileTable(spark, sfDir, "orders", approx = false)
    val sel = StatsEstimator.selectivityOf(p) _
    assert(sel("o_orderstatus = 'F'") ==
      1.0 / p.cols("o_orderstatus").ndv)
    val mx = p.cols("o_orderkey").maxN.get
    assert(math.abs(sel(s"o_orderkey > ${mx / 2}") - 0.5) < 0.01)
    assert(sel(s"o_orderkey > ${mx * 2}") == 0.0, "beyond max clamps to 0")
    assert(sel("some_weird_pred IS NOT NULL") == 1.0 / 3)
  }

  test("flagship chain estimate lands within q-error 5 of the truth") {
    val (g, filters) = PlannerQueries.flagshipGraph
    val profiles = g.relations.map(n =>
      StatsEstimator.profileTable(spark, sfDir, n)).toVector
    val card = StatsEstimator.cardinality(g, profiles, filters)
    graft.sources.Tables.registerAll(spark, sfDir)
    val truth = spark.sql(
      """SELECT count(*) FROM region, nation, customer, orders, lineitem
         WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
           AND c_custkey = o_custkey AND o_orderkey = l_orderkey
           AND r_name = 'ASIA' AND o_orderstatus = 'F' AND l_quantity > 5"""
    ).head().getLong(0).toDouble
    val est = card((1L << g.n) - 1)
    val q = math.max(est / truth, truth / est)
    assert(q < 5.0, s"q-error $q (est $est vs true $truth)")
  }

  test("approx (deployed-default) profiles keep the q-error bound and the plan") {
    val (g, filters) = PlannerQueries.flagshipGraph
    def cardWith(approx: Boolean) = StatsEstimator.cardinality(g,
      g.relations.map(n =>
        StatsEstimator.profileTable(spark, sfDir, n, approx)).toVector,
      filters)
    val exact = cardWith(approx = false)
    val appr = cardWith(approx = true) // the default profileTable path
    // HLL NDV error must stay noise against the estimate itself
    val full = (1L << g.n) - 1
    val q = math.max(appr(full) / exact(full), exact(full) / appr(full))
    assert(q < 1.5, s"approx-vs-exact estimate q-error $q — HLL error " +
      "should be ~2%, not a model change")
    // and the ARGMIN the enumerator consumes must be unchanged: the
    // deployed switch to approx ANALYZE may not alter the chosen order
    val planExact = Enumerators.DPccp.plan(g, exact, CostModel.Cout)
    val planAppr = Enumerators.DPccp.plan(g, appr, CostModel.Cout)
    assert(PlanCache.treeToString(planAppr.tree) ==
      PlanCache.treeToString(planExact.tree),
      "approx profiles changed the chosen join order on testdata")
    // the truth-relative bound of the previous test must survive too
    graft.sources.Tables.registerAll(spark, sfDir)
    val truth = spark.sql(
      """SELECT count(*) FROM region, nation, customer, orders, lineitem
         WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
           AND c_custkey = o_custkey AND o_orderkey = l_orderkey
           AND r_name = 'ASIA' AND o_orderstatus = 'F' AND l_quantity > 5"""
    ).head().getLong(0).toDouble
    val qt = math.max(appr(full) / truth, truth / appr(full))
    assert(qt < 5.0, s"q-error $qt under approx profiles")
  }

  test("p10 plans and returns the flagship answer") {
    val row = PlannerQueries.runFlagshipStats(spark, sfDir).head()
    assert(row.getLong(2) > 0, "flagship count must be positive")
  }
}
