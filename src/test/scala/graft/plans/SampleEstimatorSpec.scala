package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Join-sample synopses (the fourth estimator tier): at p = 1 the
  * estimator must be EXACT (it executes the subset join on the whole
  * table), empty correlated intersections must estimate ~1 where
  * per-column stats compound to 100×, cyclic closing edges must
  * filter, and the whole thing must be deterministic (hash sampling,
  * no RNG). */
class SampleEstimatorSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def profilesOf(g: QueryGraph) =
    g.relations.map(n => AliasedRels.profile(spark, sfDir, n)).toVector

  test("p=1 samples make the estimator exact on a filtered chain") {
    // region-nation-customer-orders: every table under the 2000 cap at
    // sf0.001, so every p = 1 and the estimate IS the executed count
    val g = QueryGraph(
      Vector("region", "nation", "customer", "orders"),
      Vector(
        JoinEdge(0, 1, Seq("r_regionkey" -> "n_regionkey")),
        JoinEdge(1, 2, Seq("n_nationkey" -> "c_nationkey")),
        JoinEdge(2, 3, Seq("c_custkey" -> "o_custkey"))))
    val filters = Vector(Some("r_name = 'ASIA'"), None, None,
      Some("o_orderstatus = 'F'"))
    val card = SampleEstimator.cardinality(
      spark, sfDir, g, filters, profilesOf(g))
    val r = graft.sources.Tables.load(spark, sfDir, "region")
      .where("r_name = 'ASIA'")
    val n = graft.sources.Tables.load(spark, sfDir, "nation")
    val c = graft.sources.Tables.load(spark, sfDir, "customer")
    val o = graft.sources.Tables.load(spark, sfDir, "orders")
      .where("o_orderstatus = 'F'")
    val truthFull = r.join(n, r("r_regionkey") === n("n_regionkey"))
      .join(c, n("n_nationkey") === c("c_nationkey"))
      .join(o, c("c_custkey") === o("o_custkey")).count().toDouble
    assert(card(15L) == math.max(truthFull, 1.0))
    val truthRN = r.join(n, r("r_regionkey") === n("n_regionkey"))
      .count().toDouble
    assert(card(3L) == math.max(truthRN, 1.0))
  }

  test("empty correlated intersection estimates ~1 (per-column stats cannot)") {
    // tree9_sel's trap: NATION_3 customers have zero 'error'-event rows
    // at this SF — true cardinality 0 across every superset
    val cq = JobCorpus.all.find(_.name == "tree9_sel").get
    val g = cq.graph
    val profiles = g.relations.map(n =>
      AliasedRels.profile(spark, sfDir, n, hist = true)).toVector
    val sample = SampleEstimator.cardinality(
      spark, sfDir, g, cq.filters, profiles)
    val hist = StatsEstimator.cardinality(g, profiles, cq.filters)
    // customer+nation+events = vertices 2,3,8
    val s = (1L << 2) | (1L << 3) | (1L << 8)
    assert(sample(s) <= 2.0,
      s"sampled empty intersection must floor near 1, got ${sample(s)}")
    assert(hist(s) > 5.0,
      "per-column stats should overestimate here; if not, the fixture changed")
  }

  test("cyclic closing edge filters the sampled join") {
    // triangle nation-customer-supplier: the closing supplier-nation
    // edge must cut the count vs the open chain
    val open = QueryGraph(
      Vector("nation", "customer", "supplier"),
      Vector(
        JoinEdge(0, 1, Seq("n_nationkey" -> "c_nationkey")),
        JoinEdge(1, 2, Seq("c_nationkey" -> "s_nationkey"))))
    val closed = QueryGraph(open.relations,
      open.edges :+ JoinEdge(2, 0, Seq("s_nationkey" -> "n_nationkey")))
    val none = Vector(None, None, None)
    val openEst = SampleEstimator.cardinality(
      spark, sfDir, open, none, profilesOf(open))(7L)
    val closedEst = SampleEstimator.cardinality(
      spark, sfDir, closed, none, profilesOf(closed))(7L)
    // the closing predicate is implied here (both joins pin the same
    // nationkey), so closed == open — the filter ran and dropped nothing
    assert(closedEst == openEst)
    // a genuinely cutting closing edge: supplier joined to customer by
    // KEY EQUALITY (s_suppkey = c_custkey) then closed over nation
    val cutting = QueryGraph(open.relations,
      open.edges :+ JoinEdge(2, 1, Seq("s_suppkey" -> "c_custkey")))
    val cutEst = SampleEstimator.cardinality(
      spark, sfDir, cutting, none, profilesOf(cutting))(7L)
    assert(cutEst < openEst,
      s"cutting closing edge must reduce the estimate: $cutEst vs $openEst")
  }

  test("deterministic: same inputs, same estimates") {
    val cq = JobCorpus.all.find(_.name == "tree9").get
    val profiles = profilesOf(cq.graph)
    val a = SampleEstimator.cardinality(
      spark, sfDir, cq.graph, cq.filters, profiles)
    val b = SampleEstimator.cardinality(
      spark, sfDir, cq.graph, cq.filters, profiles)
    (1L to cq.graph.full).filter(cq.graph.connected).take(50).foreach(s =>
      assert(a(s) == b(s)))
  }

  test("incremental refresh == full rebuild (threshold subset property)") {
    // split lineitem into base (first 2/3) and delta (last 1/3) by key;
    // refresh(sample(base), delta) must be SET-EQUAL to sample(base ∪
    // delta) — same deterministic hash, same threshold, base unscanned
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    val total = li.count().toDouble
    val cut = li.selectExpr("percentile(l_orderkey, 0.66)").head.getDouble(0)
    val base = li.where(s"l_orderkey <= $cut")
    val delta = li.where(s"l_orderkey > $cut")
    val keyCols = Seq("l_orderkey", "l_partkey")
    val cap = 1500 // below total so thresholds actually bind
    val baseSample = SampleEstimator.sampleOf(
      base, base.count().toDouble, keyCols, cap)
    val refreshed = SampleEstimator.refresh(
      baseSample, delta, total, keyCols, cap)
    val rebuilt = SampleEstimator.sampleOf(li, total, keyCols, cap)
    assert(refreshed.p == rebuilt.p)
    def keySet(s: SampleEstimator.RelSample) =
      s.rows.map(_.toSeq.sortBy(_._1).mkString("|")).sorted
    assert(keySet(refreshed) == keySet(rebuilt))
    // the append SHRANK the threshold (rows dropped, none invented —
    // the set-equality above is what proves no invention)
    assert(refreshed.p < baseSample.p)
  }

  test("repeated table: near-unique self-join prices distinct rows once") {
    // lineitem ⋈ lineitem on (l_orderkey, l_partkey) — a near-unique
    // composite, so the truth is diagonal-dominated (≈|A|). Both
    // vertices sample the SAME rows (one deterministic hash over
    // values), so a diagonal pair (r, r) survives with probability p,
    // not p²: the naive Π 1/p-over-VERTICES estimator would land near
    // (1/p)·truth ≈ 3× here (p ≈ 1/3 at sf0.001). Distinct-row
    // weighting must keep it near truth.
    val g = QueryGraph(Vector("lineitem", "lineitem@2"),
      Vector(JoinEdge(0, 1, Seq(
        "l_orderkey" -> "l_orderkey_a2", "l_partkey" -> "l_partkey_a2"))))
    val none = Vector(None, None)
    val est = SampleEstimator.cardinality(
      spark, sfDir, g, none, profilesOf(g))(3L)
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    import org.apache.spark.sql.functions.{col, sum}
    val truth = li.groupBy("l_orderkey", "l_partkey").count()
      .agg(sum(col("count") * col("count"))).head.getLong(0).toDouble
    assert(est / truth < 1.25 && truth / est < 1.25,
      s"self-join estimate $est vs truth $truth (naive vertex scaling " +
        "would land near 3× truth)")
  }

  test("repeated table: fanning self-join estimate tracks Σc² truth") {
    // the grouped form (many rows per order): truth = Σ per-key c².
    // The naive vertex scaling's bias is +|A|·(1/p−1) ≈ +12,000 on a
    // ≈24,000 truth (~1.5×) — the distinct-row weight must not pay it.
    val g = QueryGraph(Vector("lineitem", "lineitem@2"),
      Vector(JoinEdge(0, 1, Seq("l_orderkey" -> "l_orderkey_a2"))))
    val none = Vector(None, None)
    val est = SampleEstimator.cardinality(
      spark, sfDir, g, none, profilesOf(g))(3L)
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    import org.apache.spark.sql.functions.{col, sum}
    val truth = li.groupBy("l_orderkey").count()
      .agg(sum(col("count") * col("count"))).head.getLong(0).toDouble
    assert(est / truth < 1.3 && truth / est < 1.3,
      s"grouped self-join estimate $est vs truth $truth")
  }

  test("sampled facts scale by 1/p: lineitem singleton within 25% of truth") {
    val g = QueryGraph(Vector("lineitem"), Vector.empty)
    // no edges -> no key columns; the sample is count-only
    val card = SampleEstimator.cardinality(
      spark, sfDir, g, Vector(Some("l_quantity > 30")), profilesOf(g))
    val truth = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .where("l_quantity > 30").count().toDouble
    val est = card(1L)
    assert(est / truth < 1.25 && truth / est < 1.25,
      s"scaled singleton $est vs truth $truth")
  }
}
