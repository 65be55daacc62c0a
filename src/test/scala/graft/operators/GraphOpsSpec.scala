package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the graph family: PageRank mass conservation /
  * symmetry / degree ordering on hand-built graphs, and exact triangle
  * enumeration (once per triangle, credited to all corners) plus the
  * mutual-kNN filter dropping one-directional neighbor pairs. */
class GraphOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

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

  private def undirected(pairs: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  test("pagerank: star center outranks leaves; mass sums to ~1") {
    // star: 0 - {1,2,3,4}
    val pr = GraphOps.pagerankOn(
        undirected(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(pr(0L) > pr(1L) * 2)
    assert(Set(1L, 2L, 3L, 4L).map(pr).size == 1) // leaves identical
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)  // stochastic: mass kept
  }

  test("pagerank: 4-cycle is uniform at exactly 1/n") {
    val pr = GraphOps.pagerankOn(
        undirected(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))))
      .collect().map(_.getDouble(1)).toSet
    assert(pr == Set(0.25)) // regular graph: the fixpoint from it0 on
  }

  test("personalized pagerank: mass flows from the seed, unreachable = 0") {
    val s = spark
    import s.implicits._
    // a triangle {0,1,2} (odd cycle -> aperiodic, converges) plus a
    // disjoint pair {8,9}; seed = node 0. (A bare 2-clique is
    // bipartite: the rank oscillates with period 2 and the seed can
    // legitimately hold LESS mass on odd phases.)
    val edges = undirected(Seq((0L, 1L), (1L, 2L), (0L, 2L), (8L, 9L)))
    val seeds = Seq(Tuple1(0L)).toDF("node")
    val pr = GraphOps.personalizedPagerankOn(edges, seeds)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(0L) > pr(1L) && pr(1L) > 0.0) // seed holds teleport mass
    assert(pr(1L) == pr(2L))                // symmetric non-seeds
    assert(pr(8L) == 0.0 && pr(9L) == 0.0)  // unreachable component
    assert(pr.values.sum <= 1.0 + 1e-6)
  }

  test("triangles: one triangle plus a dangling edge, counted once each") {
    val s = spark
    import s.implicits._
    // oriented low->high: triangle {1,2,3} + edge (3,9)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 9L)).toDF("a", "b")
    val out = GraphOps.trianglesOn(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L)) // 9 not in any
  }

  test("triangles: K4 has 3 per node (4 triangles, each corner in 3)") {
    val s = spark
    import s.implicits._
    val k4 = (for { a <- 0L to 3L; b <- a + 1 to 3L } yield (a, b))
      .toDF("a", "b")
    val out = GraphOps.trianglesOn(k4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("g03i edge-artifact serving equals the inline gate form") {
    val sf = "/root/testdata/sf0.001"
    val inline = GraphOps.queries("g03_knn_components")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val served = GraphOps.componentsFromEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inline.nonEmpty && inline == served)
  }

  test("g15i artifact serving equals the inline incremental gate form") {
    val sf = "/root/testdata/sf0.001"
    val inline = GraphOps.queries("g15_components_incremental")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val served = GraphOps.incrementalComponentsFromArtifacts(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inline.nonEmpty && inline == served)
  }

  test("g06i/g09i/g10i/g12i artifact serving equals inline forms") {
    val sf = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(GraphOps.queries("g06_pagerank_dangling")(spark, sf)) ==
      rows(GraphOps.pagerankDanglingFromEdges(spark, sf)))
    assert(rows(GraphOps.queries("g09_hits")(spark, sf)) ==
      rows(GraphOps.hitsFromEdges(spark, sf)))
    assert(rows(GraphOps.queries("g10_khop_bfs")(spark, sf)) ==
      rows(GraphOps.bfsFromEdges(spark, sf)))
    assert(rows(GraphOps.queries("g12_components_star")(spark, sf)) ==
      rows(GraphOps.starComponentsFromEdges(spark, sf)))
    assert(rows(GraphOps.queries("g24_harmonic_landmarks")(spark, sf)) ==
      rows(GraphOps.harmonicFromEdges(spark, sf)))
    assert(rows(GraphOps.queries("g26_diameter_sweep")(spark, sf)) ==
      rows(GraphOps.diameterFromEdges(spark, sf)))
    assert(rows(GraphOps.queries("g27_link_prediction")(spark, sf)) ==
      rows(GraphOps.linkPredictionFromEdges(spark, sf)))
    assert(rows(GraphOps.queries("g28_random_walks")(spark, sf)) ==
      rows(GraphOps.randomWalksFromEdges(spark, sf)))
    assert(rows(GraphOps.queries("g29_skipgram_pairs")(spark, sf)) ==
      rows(GraphOps.skipGramFromWalks(spark, sf)))
    assert(rows(GraphOps.queries("g30_ppmi_scores")(spark, sf)) ==
      rows(GraphOps.ppmiFromWalks(spark, sf)))
  }

  test("unfloored-kNN artifact serving equals the six inline forms") {
    val sf = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val pairs = Seq(
      "g02_knn_triangles" -> GraphOps.trianglesFromEdges(spark, sf),
      "g07_triangles_degree" ->
        GraphOps.trianglesDegreeFromEdges(spark, sf),
      "g13_clustering_coeff" -> GraphOps.clusteringFromEdges(spark, sf),
      "g14_assortativity" -> GraphOps.assortativityFromEdges(spark, sf),
      "g16_kcore" -> GraphOps.kcoreFromEdges(spark, sf),
      "g18_label_spread" -> GraphOps.labelSpreadFromEdges(spark, sf),
      "g25_ktruss" -> GraphOps.ktrussFromEdges(spark, sf),
      "g31_linkpred_auc" -> GraphOps.linkPredAucFromEdges(spark, sf))
    pairs.foreach { case (name, served) =>
      assert(rows(GraphOps.queries(name)(spark, sf)) == rows(served),
        s"$name served != inline")
    }
  }

  test("g19i/g20i artifact serving equals the inline SCC forms") {
    val sf = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(GraphOps.queries("g19_scc_knn")(spark, sf)) ==
      rows(GraphOps.sccFromEdges(spark, sf)))
    assert(rows(GraphOps.queries("g20_components_scc")(spark, sf)) ==
      rows(GraphOps.componentsSccFromEdges(spark, sf)))
    assert(rows(GraphOps.queries("g21_modularity")(spark, sf)) ==
      rows(GraphOps.modularityFromEdges(spark, sf)))
    assert(rows(GraphOps.queries("g22_community_merge")(spark, sf)) ==
      rows(GraphOps.communityMergeFromEdges(spark, sf)))
    assert(rows(GraphOps.queries("g23_louvain_move")(spark, sf)) ==
      rows(GraphOps.louvainFromEdges(spark, sf)))
  }

  test("mutual-kNN cosine floor drops weak reciprocated pairs") {
    val s = spark
    import s.implicits._
    // 0,1 near-identical (cosine ~1); 2,3 mutually nearest with
    // cosine(2,3) = 0.4/1.04 ≈ 0.3846 < 0.4, orthogonal to 0,1
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(1.0, 0.01, 0.0)),
      (2L, Seq(0.0, 1.0, 0.2)), (3L, Seq(0.0, 0.2, 1.0)))
      .toDF("vec_id", "v")
    val strong = GraphOps.mutualKnnEdgesOn(vecs, k = 1, minCosine = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = GraphOps.mutualKnnEdgesOn(vecs, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strong == Set((0L, 1L)))
    assert((all -- strong).nonEmpty) // the weak pair existed unfloored
  }

  test("pagerank: checkpointEvery cadence is bit-identical to no cadence") {
    val edges = undirected(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L),
      (0L, 2L)))
    val plain = GraphOps.pagerankOn(edges, iters = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cadenced = GraphOps.pagerankOn(edges, iters = 12, checkpointEvery = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain == cadenced) // checkpoint only materializes — bit-equal
  }

  test("dangling pagerank: no sinks ⇒ identical to the base operator") {
    val edges = undirected(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    val base = GraphOps.pagerankOn(edges)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dang = GraphOps.pagerankDanglingOn(edges)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(base == dang) // sink_mass = 0 every iteration ⇒ same update
  }

  test("dangling pagerank: sinks keep total mass at 1, no node dropped") {
    val s = spark
    import s.implicits._
    // directed: 0→1, 0→2, 1→2; 2 is a sink, 0 a pure source — the
    // shape pagerankOn leaks on (its update would drop node 0 after
    // one superstep and lose 2's mass every round)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("src", "dst")
    for (iters <- Seq(1, 3, 5)) {
      val pr = GraphOps.pagerankDanglingOn(edges, iters = iters)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(pr.keySet == Set(0L, 1L, 2L)) // every node present
      // per-node 9-dp rounding bounds the drift at n·5e-10 per pass
      assert(math.abs(pr.values.sum - 1.0) <= 1e-9 + 3 * 5e-10,
        s"mass at iters=$iters was ${pr.values.sum}")
    }
    val pr = GraphOps.pagerankDanglingOn(edges)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(2L) > pr(1L) && pr(1L) > pr(0L)) // rank flows downstream
  }

  test("g01i/g05i edge-artifact serving equals the inline gate forms") {
    val sf = "/root/testdata/sf0.001"
    val inlinePr = GraphOps.queries("g01_pagerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val servedPr = GraphOps.pagerankFromEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(inlinePr.nonEmpty && inlinePr == servedPr)
    val inlinePpr = GraphOps.queries("g05_personalized_pagerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val servedPpr = GraphOps.personalizedPagerankFromEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(inlinePpr.nonEmpty && inlinePpr == servedPpr)
  }

  test("degree orientation: same per-node triangle counts as id order") {
    val s = spark
    import s.implicits._
    // skew fixture: hub 0 connected to everyone (max degree), plus a
    // K4 {1,2,3,4} — id-orientation gives the hub a huge forward
    // neighborhood, degree-orientation points edges AT it instead
    val edges = ((1L to 9L).map(v => (0L, v)) ++
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
      .toDF("a", "b")
    val byId = GraphOps.trianglesOn(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDeg = GraphOps.trianglesOn(GraphOps.orientByDegree(edges))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.nonEmpty && byId == byDeg)
    // and the hub's forward degree actually shrank under (deg, id)
    val fwd = GraphOps.orientByDegree(edges)
      .collect().map(r => r.getLong(0)).count(_ == 0L)
    assert(fwd == 0L, s"hub kept $fwd forward edges under degree order")
  }

  test("g08: warm-started re-convergence matches cold, in ≤ half steps") {
    val sf = "/root/testdata/sf0.001"
    val full = GraphOps.queries("g01_pagerank")(spark, sf)
      .select("node") // touch to ensure tables are registered
    full.count()
    val edges = {
      // the same full co-purchase graph g08 re-converges on
      val orders = graft.sources.Tables.load(spark, sf, "orders")
      val lineitem = graft.sources.Tables.load(spark, sf, "lineitem")
      val pairs = orders.join(lineitem,
          orders("o_orderkey") === lineitem("l_orderkey"))
        .selectExpr("o_custkey * 2 AS cn", "l_suppkey * 2 + 1 AS sn")
        .distinct()
      pairs.selectExpr("cn AS src", "sn AS dst")
        .unionAll(pairs.selectExpr("sn AS src", "cn AS dst"))
    }
    val (cold, coldIters) = GraphOps.pagerankConverged(edges)
    val init = spark.read.parquet(GraphOps.pagerankRanksPath(spark, sf))
    val (warm, warmIters) = GraphOps.pagerankConverged(edges, Some(init))
    // measured (PrConvergeProbe): warm ≈ 4 vs cold ≈ 75 supersteps at
    // the default tol — the contract pins ≤ half, with big margin
    assert(warmIters * 2 <= coldIters,
      s"warm=$warmIters cold=$coldIters — delta too disruptive?")
    val c = cold.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = warm.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(c.keySet == w.keySet)
    // both fixed points agree within the 6-dp serving grid (measured
    // ~1e-7; the bound is 2·tol — each run stops once per-step motion
    // is under tol, so each sits within tol/(1-damping)·damping of the
    // true fixed point, conservatively bounded here)
    val maxDiff = c.keys.map(k => math.abs(c(k) - w(k))).max
    assert(maxDiff <= 1e-6, s"fixed points differ by $maxDiff")
  }

  test("mutual-kNN keeps only reciprocated pairs") {
    val s = spark
    import s.implicits._
    // 2-d points: 0,1 coincident (mutual top-1); 2 far away, whose
    // nearest is 0 but 0's top-1 is 1 -> (0,2) must NOT survive k=1
    val vecs = Seq(
      (0L, Seq(0.0, 1.0)), (1L, Seq(0.0, 1.0)), (2L, Seq(1.0, 0.1)))
      .toDF("vec_id", "v")
    val edges = GraphOps.mutualKnnEdgesOn(vecs, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((0L, 1L)))
  }

  test("HITS: hub/auth sides each L1-normalize to 1; ordering correct") {
    val s = spark
    import s.implicits._
    // 1 -> {2,4}, 3 -> {4}: node 4 is the stronger authority (two
    // hubs point at it), node 1 the stronger hub (points at both
    // authorities, including the strong one)
    val edges = Seq((1L, 2L), (1L, 4L), (3L, 4L)).toDF("src", "dst")
    val rows = GraphOps.hitsOn(edges)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val hubs = rows.filter(_._2 == "hub").map(r => r._1 -> r._3).toMap
    val auths = rows.filter(_._2 == "auth").map(r => r._1 -> r._3).toMap
    assert(hubs.keySet == Set(1L, 3L)) // sources only
    assert(auths.keySet == Set(2L, 4L)) // sinks only
    assert(math.abs(hubs.values.sum - 1.0) <= 1e-6)
    assert(math.abs(auths.values.sum - 1.0) <= 1e-6)
    assert(hubs(1L) > hubs(3L))
    assert(auths(4L) > auths(2L))
  }

  test("bfsHops: frontier distances, out-of-graph seeds, hop cap") {
    val s = spark
    import s.implicits._
    // path 1-2-3-4-5 plus isolated-from-seed node pair 8-9, undirected
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    // seed 1 in-graph; seed 99 absent from the graph (must carry no dist)
    val seeds = Seq(1L, 99L).toDF("node")
    val got = GraphOps.bfsHopsOn(edges, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 5 is 4 hops out: beyond the cap, absent; 8/9 unreachable, absent
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("bfsHops: a node keeps its FIRST discovery distance") {
    val s = spark
    import s.implicits._
    // triangle 1-2-3: node 3 reachable at hop 1 (direct) and hop 2
    // (via 2) — must report 1
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.bfsHopsOn(edges, Seq(1L).toDF("node"), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 1))
  }

  test("pagerankWeighted: uniform weights reproduce unweighted PR") {
    val s = spark
    import s.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val ew = e.withColumn("w",
      org.apache.spark.sql.functions.lit(1L))
    val base = GraphOps.pagerankOn(e).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w1 = GraphOps.pagerankWeightedOn(ew).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(base == w1) // bit-identical: same arithmetic, w/wdeg = 1/deg
  }

  test("clustering coefficient: clique = 1, path = 0, mixed exact") {
    val s = spark
    import s.implicits._
    // K4 on {1,2,3,4} (cc = 1 everywhere) plus a pendant 4-5 edge:
    // node 5 has deg 1 -> cc 0; node 4 has deg 4, still 3 triangles ->
    // cc = 2*3/(4*3) = 0.5
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = GraphOps.clusteringCoefficientOn(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got(1L) == (3L, 3L, 1.0))
    assert(got(2L) == (3L, 3L, 1.0))
    assert(got(3L) == (3L, 3L, 1.0))
    assert(got(4L) == (4L, 3L, 0.5))
    assert(got(5L) == (1L, 0L, 0.0))
  }

  test("feature propagation: exact fixed-point means on a 3-path") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    def feats(xs: (Long, Double)*) =
      xs.map { case (n, x) => (n, Seq(x)) }.toDF("node", "v")
    // offsets: 2.0→2_000_000 µ-units; layer = (self + Σnb) div (1+deg)
    val l1 = GraphOps.featurePropagationOn(edges,
      feats(1L -> 0.0, 2L -> 0.6, 3L -> 0.0), layers = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(l1 == Map(1L -> 0.3, 2L -> 0.2, 3L -> 0.3))
    val l2 = GraphOps.featurePropagationOn(edges,
      feats(1L -> 0.0, 2L -> 0.6, 3L -> 0.0), layers = 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // node 2 layer 2: (2_200_000 + 2·2_300_000) div 3 = 2_266_666 µ
    assert(l2 == Map(1L -> 0.25, 2L -> 0.266666, 3L -> 0.25))
    // negative inputs ride the offset: isolated pair averages exactly
    val neg = GraphOps.featurePropagationOn(
      Seq((7L, 8L)).toDF("a", "b"),
      feats(7L -> -0.5, 8L -> 0.1), layers = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(neg == Map(7L -> -0.2, 8L -> -0.2))
  }

  test("betweenness: path-graph dependencies and diamond path splitting") {
    val s = spark
    import s.implicits._
    def sym(pairs: Seq[(Long, Long)]) =
      (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    // path 1-2-3-4-5, pivots {1,2,3,4}: hand-summed Brandes deltas
    val path = GraphOps.betweennessOn(
      sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))),
      nPivots = 4, maxHops = 4).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(path(1L) == ((0.0, 3L)))
    assert(path(2L) == ((5.0, 3L)))
    assert(path(3L) == ((6.0, 3L)))
    assert(path(4L) == ((3.0, 3L)))
    assert(path(5L) == ((0.0, 4L)))
    // diamond 1-2-4, 1-3-4: two equal shortest paths split sigma —
    // every node gets 4 * 0.25 = 1.0 with all four pivots
    val diamond = GraphOps.betweennessOn(
      sym(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))),
      nPivots = 4, maxHops = 4).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(diamond == Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0, 4L -> 1.0))
  }

  test("rich club: clique-plus-pendant profile is exact at every cutoff") {
    val s = spark
    import s.implicits._
    // K4 on {1,2,3,4} plus pendant 4-5: degs = (3,3,3,4,1)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = GraphOps.richClubOn(edges, maxK = 10).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    // k=1,2: club = {1,2,3,4}, all 6 K4 edges -> phi = 12/12 = 1
    assert(got(1) == (4L, 6L, 1.0))
    assert(got(2) == (4L, 6L, 1.0))
    // k=3: club = {4} alone -> 0 edges, phi null (denominator 0)
    assert(got(3) == (1L, 0L, null))
    // k >= 4: no node clears the cutoff -> no row at all
    assert(!got.contains(4) && got.size == 3)
  }

  test("assortativity: star = -1, hand fixture = -0.5, regular = null") {
    val s = spark
    import s.implicits._
    def r(edges: Seq[(Long, Long)]): (Long, Any) = {
      val row = GraphOps.degreeAssortativityOn(edges.toDF("a", "b"))
        .collect().head
      (row.getLong(0), if (row.isNullAt(1)) null else row.getDouble(1))
    }
    // K1,4 star: deg(center)=4, deg(leaf)=1 — perfectly disassortative
    assert(r(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))) == (8L, -1.0))
    // hand fixture: edges (1,2),(3,4),(1,3) — degrees 1:2, 2:1, 3:2,
    // 4:1; symmetrized endpoint-degree pairs give r = -0.5 exactly
    assert(r(Seq((1L, 2L), (3L, 4L), (1L, 3L))) == (6L, -0.5))
    // 4-cycle: every degree 2 — zero variance, corr undefined
    assert(r(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))) == (8L, null))
  }

  test("bipartite projection: weights exact, median floor, hub cap") {
    val s = spark
    import s.implicits._
    // left 1 connects r{1,2,3}; left 2 connects r{1,2}; left 3
    // connects r{1,2}: w(1,2)=3, w(1,3)=1, w(2,3)=1 -> p90 of
    // [1,1,3] interpolates to 2.6 -> only (1,2,3) survives
    val inc = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L)).toDF("l", "r")
    val got = GraphOps.bipartiteProjectOn(inc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 3L)))
    // hub cap: dropping left node 1 (deg 3 > cap 2) removes r3
    // entirely; the floor self-recalibrates on the capped
    // distribution (p90 of the single weight {2} = 2, kept)
    val capped = GraphOps.bipartiteProjectOn(inc, maxLeftDeg = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(capped.toSeq == Seq((1L, 2L, 2L)))
  }

  test("label spread: majority vote, tie to smaller, clamped rounds") {
    val s = spark
    import s.implicits._
    // path 1-2-3-4-5 with seeds 1->7 and 5->9: round 1 labels 2 (7)
    // and 4 (9); round 2 labels 3 — neighbors 2 (7) and 4 (9) tie at
    // one vote each -> smaller label 7 wins; seeds never change
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val seeds = Seq((1L, 7), (5L, 9)).toDF("node", "label")
    val got = GraphOps.labelSpreadOn(edges, seeds)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 7, 2L -> 7, 3L -> 7, 4L -> 9, 5L -> 9))
  }

  test("k-core peel: dense core survives, chains peel, idempotent") {
    val s = spark
    import s.implicits._
    // K4 on {1,2,3,4} (3-core) + a chain 4-5-6-7 hanging off it: the
    // chain peels end-inward over sweeps, the clique survives intact
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L)).toDF("a", "b")
    def run(rounds: Int) = GraphOps.kcorePeelOn(edges, k = 3, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run(6)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // monotone: once converged, extra sweeps are no-ops
    assert(run(8) == got)
  }

  test("warm-started components: same fixed point, fewer rounds") {
    val s = spark
    import s.implicits._
    // base: a diameter-7 path 1..8 (labels converge to 1) plus an
    // isolated pair (10, 11); delta: edge (8, 9) extends the path and
    // (20, 21) arrives as a brand-new component
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L), (10L, 11L)).toDF("id_a", "id_b")
    val delta = Seq((8L, 9L), (20L, 21L)).toDF("id_a", "id_b")
    val full = base.unionAll(delta)
    def labelMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val labels0 = DedupOps.connectedComponents(base)
    val (warm, warmRounds) =
      DedupOps.connectedComponentsWarmCounted(full, labels0)
    val (cold, coldRounds) = DedupOps.connectedComponentsCounted(full)
    assert(labelMap(warm) == labelMap(cold)) // identical fixed point
    // cold pays the full diameter-8 path; warm only propagates the
    // single merge at the path's tail plus the new pair
    assert(coldRounds >= 8 && warmRounds <= 3,
      s"cold=$coldRounds warm=$warmRounds")
    assert(labelMap(warm)(9L) == 1L && labelMap(warm)(21L) == 20L)
  }

  test("star-contraction components equal label propagation") {
    val s = spark
    import s.implicits._
    // the adversarial topology for label-prop (O(diameter) rounds):
    // a 40-node path, plus a star, plus singleton pairs, plus a cycle
    val path = (0L until 39L).map(i => (i, i + 1))
    val star = (101L to 108L).map(i => (100L, i))
    val cycle = Seq((200L, 201L), (201L, 202L), (202L, 200L))
    val pairs = (path ++ star ++ cycle ++ Seq((300L, 301L)))
      .toDF("id_a", "id_b")
    val viaStar = GraphOps.connectedComponentsStar(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaProp = DedupOps.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStar == viaProp)
    assert(viaStar(39L) == 0L && viaStar(108L) == 100L &&
      viaStar(202L) == 200L && viaStar(301L) == 300L)
  }

  test("star-contraction components equal label prop on random graphs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 300).map(_ =>
      (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter(p => p._1 != p._2).toDF("id_a", "id_b")
    val viaStar = GraphOps.connectedComponentsStar(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaProp = DedupOps.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStar == viaProp)
  }

  test("pagerankWeighted: rank follows the heavy edge; mass conserved") {
    val s = spark
    import s.implicits._
    // 1 splits its rank 9:1 between 2 and 3 (undirected, all nodes
    // also point back so no dangling mass)
    val und = Seq((1L, 2L, 9L), (1L, 3L, 1L))
    val e = (und ++ und.map(t => (t._2, t._1, t._3)))
      .toDF("src", "dst", "w")
    val got = GraphOps.pagerankWeightedOn(e).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(2L) > got(3L))
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
  }

  test("g24 harmonic: labeled BFS sums 1/d over reachable landmarks") {
    val s = spark
    import s.implicits._
    // path 1-2-3-4-5; landmarks = the 2 lowest ids {1, 2}; 3 hops
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.harmonicCentralityOn(e, nLandmarks = 2,
        maxHops = 3).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // self-distances are excluded; 5 is beyond hop 3 from landmark 1
    assert(got(1L) == (1.0, 1L) && got(2L) == (1.0, 1L))
    assert(got(3L) == (1.5, 2L))
    assert(got(4L) == (0.8333, 2L))
    assert(got(5L) == (0.3333, 1L))
  }

  test("g26 double sweep: path graph yields the exact diameter") {
    val s = spark
    import s.implicits._
    // path 1-2-3-4: start = 1, far1 = 4 (dist 3), sweep 2 from 4
    // reaches 1 at dist 3 = the true diameter
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.diameterEstimateOn(e, maxHops = 4).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
      r.getInt(4)) == (1L, 4L, 3, 1L, 3))
    // a star: diameter 2, found from any leaf
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val se = (star ++ star.map(_.swap)).toDF("src", "dst")
    val sr = GraphOps.diameterEstimateOn(se, maxHops = 4).collect().head
    assert(sr.getInt(4) == 2)
  }

  test("g27 link prediction: scores, anti-join, and center cap bind") {
    val s = spark
    import s.implicits._
    // triangle 1-2-3 plus pendant 4-1: wedges propose (2,3),(2,4),
    // (3,4) at center 1 and (1,3)/(1,2) at centers 2/3; the anti-join
    // drops the three existing edges, keeping (2,4),(3,4) — cn=1
    // via center 1 (deg 3), aa=1/ln3, jac=1/(2+1-1)
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.linkPredictionOn(e, maxDeg = 10, k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val aa = math.round(1.0 / math.log(3) * 1e4) / 1e4
    assert(got == Set((2L, 4L, 1L, aa, 0.5), (3L, 4L, 1L, aa, 0.5)))
    // cap at 2: node 1 (deg 3) is no longer a wedge center; the only
    // surviving proposals are existing edges -> empty
    assert(GraphOps.linkPredictionOn(e, maxDeg = 2, k = 100).count() == 0)
    // 4-cycle 1-2-3-4-1: the two diagonals, cn=2, jac=1 (shared
    // neighborhood IS the union), aa=2/ln2
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val ce = (cyc ++ cyc.map(_.swap)).toDF("src", "dst")
    val cg = GraphOps.linkPredictionOn(ce, maxDeg = 10, k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val aa2 = math.round(2.0 / math.log(2) * 1e4) / 1e4
    assert(cg == Set((1L, 3L, 2L, aa2, 1.0), (2L, 4L, 2L, aa2, 1.0)))
  }

  test("g28 walks: edge-respecting, deterministic, dead-ends end early") {
    val s = spark
    import s.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val rows = GraphOps.randomWalksOn(e, steps = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // one walk per node, each full length (no dead ends when doubled)
    assert(rows.count(_._2 == 0) == 4 && rows.length == 16)
    assert(rows.filter(_._2 == 0).forall(r => r._1 == r._3))
    // every consecutive hop is a real edge
    val edgeSet = (und ++ und.map(_.swap)).toSet
    val byWalk = rows.groupBy(_._1).values
    byWalk.foreach { w =>
      w.sortBy(_._2).sliding(2).foreach { case Array(a, b) =>
        assert(edgeSet.contains((a._3, b._3)), s"$a -> $b not an edge") }
    }
    // determinism: a second run reproduces bit-identically
    val again = GraphOps.randomWalksOn(e, steps = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.toSet == again.toSet)
    // a directed dead-end ends the walk early instead of failing
    val dir = Seq((1L, 2L)).toDF("src", "dst")
    val d = GraphOps.randomWalksOn(dir, steps = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(d == Set((1L, 0, 1L), (1L, 1, 2L)))
  }

  test("g29 skipgram: windowed pairs, revisits self-pair, walk-local") {
    val s = spark
    import s.implicits._
    // walk 1 revisits node 10 (A B A); walk 2 is disjoint (C D)
    val corpus = Seq(
      (1L, 0, 10L), (1L, 1, 20L), (1L, 2, 10L),
      (2L, 0, 30L), (2L, 1, 40L))
      .toDF("walk_id", "step", "node")
    def pairs(win: Int) =
      GraphOps.skipGramPairsOn(corpus, window = win).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs(2) == Map(
      (10L, 20L) -> 2L, (20L, 10L) -> 2L, (10L, 10L) -> 2L,
      (30L, 40L) -> 1L, (40L, 30L) -> 1L))
    // window 1 drops the distance-2 self-pair, keeps adjacency
    assert(pairs(1) == Map(
      (10L, 20L) -> 2L, (20L, 10L) -> 2L,
      (30L, 40L) -> 1L, (40L, 30L) -> 1L))
  }

  test("g30 ppmi: marginals, total, and the zero clamp") {
    val s = spark
    import s.implicits._
    // N=38; (1,2)/(2,1) are rare between common tokens -> negative
    // PMI, clamped; the strong (x,3) links land at ln(1.9)
    val pairs = Seq(
      (1L, 2L, 1L), (2L, 1L, 1L), (1L, 3L, 9L), (3L, 1L, 9L),
      (2L, 3L, 9L), (3L, 2L, 9L)).toDF("center", "context", "n")
    val got = GraphOps.ppmiScoresOn(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val strong = math.round(math.log(9.0 * 38 / (10 * 18)) * 1e4) / 1e4
    assert(got == Map(
      (1L, 2L) -> 0.0, (2L, 1L) -> 0.0,
      (1L, 3L) -> strong, (3L, 1L) -> strong,
      (2L, 3L) -> strong, (3L, 2L) -> strong))
  }

  test("g25 ktruss: 4-clique survives, lone triangle and bridge peel") {
    val s = spark
    import s.implicits._
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    // a lone triangle (each edge support 1 < 2) and a bridge edge
    // hanging off the clique (support 0)
    val e = (k4 ++ Seq((5L, 6L), (5L, 7L), (6L, 7L), (4L, 8L)))
      .toDF("a", "b")
    val got = GraphOps.ktrussOn(e, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == k4.toSet)
  }
}
