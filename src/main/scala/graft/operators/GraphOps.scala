package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Graph analytics over relation-derived graphs — the link-structure
  * signals a large-scale curation pipeline computes beside its content
  * signals (domain authority for crawl corpora, neighborhood density
  * for embedding spaces). Five entries: PageRank (g01), mutual-kNN
  * triangle counting (g02), strong-graph connected components (g03,
  * via the shared dedup label-propagation kernel), the LSH candidate
  * graph builder (g04) that replaces the exact all-pairs stage at
  * corpus scale, and personalized PageRank from a trusted seed set
  * (g05). The first two in detail:
  *
  *  - PageRank (fixed-iteration power method) on the bipartite
  *    customer↔supplier co-purchase graph. Each iteration is ONE
  *    shuffle: edges ⋈ ranks on src (ranks is the node-sized small
  *    side), then a partial-aggregated groupBy(dst). Edges and degrees
  *    are computed once and persisted; the iteration count is fixed, so
  *    the whole run is `iters` shuffles of the node table plus the
  *    edge-scan joins — the standard distributed PR shape (Pregel's
  *    superstep = this join+agg). At 100 TB the edge table is the big
  *    side and stays put (hash-partitioned by src, reused every
  *    iteration); only the node-sized rank vector moves.
  *
  *  - Triangle counting on the mutual-kNN graph of the embedding
  *    corpus (k=5 by rounded cosine): the local-clustering signal that
  *    separates dense near-duplicate neighborhoods from isolated
  *    points. Edges are oriented low-id→high-id, so each triangle is
  *    enumerated exactly once by the two-hop join e1(a,b)⋈e2(b,c)⋈
  *    e3(a,c) — the classic compact-forward algorithm. At fixture scale
  *    the kNN stage is exact all-pairs (oracle-checkable); at corpus
  *    scale the all-pairs stage swaps for the LSH/IVF candidate
  *    generators ([[SimilarityOps]]) — the mutual filter, orientation,
  *    and triangle join are unchanged, and the triangle join's cost is
  *    bounded by the k-regular degree cap (each node has ≤k out-edges,
  *    so the two-hop fan-out is ≤k² per node). Id-orientation is the
  *    oracle-fixed choice; degree-orientation is the skew-robust
  *    variant for power-law graphs (same joins, different order key).
  *
  * Float determinism follows the repo's oracle convention
  * ([[SimilarityOps.bruteOracle]]): cast to double first, fold in array
  * order, round BEFORE any rank/compare. PageRank additionally rounds
  * the rank vector to 9 dp each iteration, so both engines re-enter
  * every iteration from identical doubles and aggregation-order noise
  * (~1e-16) never compounds across iterations.
  */
object GraphOps {

  private val Damping = 0.85
  private val PrIters = 5
  private val KnnK = 5
  private val StrongCos = 0.4

  /** Fixed-iteration PageRank over a directed edge list (`src`,
    * `dst`). Nodes are the distinct edge endpoints (every node of an
    * undirected graph has both in- and out-edges, so no dangling-mass
    * term is needed — callers feeding directed graphs with sinks must
    * add one). Returns (node, pr) with pr rounded to 9 dp. */
  /** The shared PR prologue: degree folded INTO the persisted edge
    * frame once — each superstep is then a single ranks join instead
    * of re-joining the degree table every round. Returns (folded
    * edges, degree frame), both barriered. */
  private def degreeFoldedEdges(
      edges: DataFrame): (DataFrame, DataFrame) = {
    val e0 = edges.select("src", "dst")
    val deg = Persists.barrier(
      e0.groupBy("src").agg(count(lit(1)).as("deg")))
    (Persists.barrier(e0.join(deg, "src")), deg)
  }

  def pagerankOn(edges: DataFrame, iters: Int = PrIters,
      damping: Double = Damping): DataFrame = {
    val (e, deg) = degreeFoldedEdges(edges)
    // node count: one driver-side long — the same bounded scalar fetch
    // every PR implementation does to size the teleport term
    val n = deg.count().toDouble
    val teleport = (1.0 - damping) / n
    var pr = deg.select(col("src").as("node"),
      round(lit(1.0 / n), 9).as("pr"))
    for (_ <- 1 to iters) {
      pr = e.join(pr, e("src") === pr("node"))
        .groupBy(col("dst"))
        .agg(round(lit(teleport) +
          lit(damping) * sum(col("pr") / col("deg")), 9).as("pr"))
        .withColumnRenamed("dst", "node")
    }
    pr
  }

  /** PERSONALIZED PageRank: teleport mass restricted to a seed set —
    * the trusted-seed authority signal (seed known-good domains, rank
    * flows to what they co-occur with; the crawl-curation use of PR).
    * Same superstep shape as [[pagerankOn]] — one ranks join + one
    * partial-agg groupBy per iteration over the degree-folded
    * persisted edges — plus a node-sized seed-flag broadcast join per
    * iteration for the teleport CASE. Seeds outside the graph carry no
    * mass (intersected with the node set first, both engines).
    * Unreachable nodes legitimately hold pr = 0. */
  def personalizedPagerankOn(edges: DataFrame, seeds: DataFrame,
      iters: Int = PrIters, damping: Double = Damping): DataFrame = {
    val (e, deg) = degreeFoldedEdges(edges)
    val nodes = deg.select(col("src").as("node"))
    val s = Persists.barrier(
      nodes.join(seeds.select(col("node")).distinct(), "node")
        .withColumn("seed", lit(1)))
    val nS = s.count().toDouble
    require(nS > 0,
      "personalizedPagerankOn: no seed intersects the graph's node " +
        "set — teleport mass would be 0/0 (Inf/NaN ranks)")
    val teleport = (1.0 - damping) / nS
    def withSeedFlag(df: DataFrame): DataFrame =
      df.join(broadcast(s), Seq("node"), "left")
    var pr = withSeedFlag(nodes)
      .select(col("node"), round(when(col("seed") === 1,
        lit(1.0 / nS)).otherwise(lit(0.0)), 9).as("pr"))
    for (_ <- 1 to iters) {
      val m = e.join(pr, e("src") === pr("node"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") / col("deg")).as("m"))
        .withColumnRenamed("dst", "node")
      pr = withSeedFlag(m)
        .select(col("node"), round(
          when(col("seed") === 1, lit(teleport)).otherwise(lit(0.0)) +
            lit(damping) * col("m"), 9).as("pr"))
    }
    pr
  }

  /** Mutual-kNN edges over a (vec_id, v: array&lt;double&gt;) frame:
    * (a, b) with a &lt; b iff each is in the other's top-`k` by rounded
    * cosine (ties broken by neighbor id — the s01 rank convention).
    * `minCosine` additionally floors the edge strength (g03's
    * strong-neighbor graph); cosine is exactly symmetric (same
    * index-ordered fold both directions), so each unordered pair is
    * scored ONCE and mirrored — half the kernel evaluations of the
    * naive q≠c cross score, same ranks. */
  def mutualKnnEdgesOn(vecs: DataFrame, k: Int = KnnK,
      minCosine: Double = -1.0): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    // barriered: the mirror union references it twice, and without the
    // persist the 2M-kernel cosine pass would run once per reference
    val half = Persists.barrier(vecs.as("q").join(vecs.as("c"),
        col("q.vec_id") < col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        round(expr("graft_cosine(q.v, c.v)"), 4).as("cosine")))
    mutualFromHalfScored(half, k, minCosine)
  }

  /** Approximate mutual-kNN: candidate pairs from banded LSH buckets
    * (the [[DedupOps]] blocking machinery — hot buckets capped, pair
    * scored once) instead of the all-pairs cross score; ranks, the
    * reciprocity filter, and the strength floor are the shared tail,
    * so exact and approximate graphs differ ONLY in which pairs get
    * scored. Recall is the standard LSH trade (grows with `tables`);
    * missing a candidate can also PROMOTE a farther neighbor into a
    * node's top-k, so near-1 recall still isn't identity — gate form
    * is rows-only with [[KnnGraphRecallSpec]] pinning the bound. At
    * corpus scale this is THE graph-construction shape: candidate
    * work tracks bucket populations, never n². */
  def mutualKnnEdgesApproxOn(vecs: DataFrame, corpusRows: Long,
      k: Int = KnnK, minCosine: Double = -1.0,
      tables: Int = 8, planes: Int = 8,
      maxBucketFreq: Long = 5000): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val bucketed = Persists.barrier(vecs
      .withColumn("sigs", expr(s"graft_lsh_sigs(v, $tables, $planes)"))
      .select(col("vec_id"), col("v"),
        posexplode(col("sigs")).as(Seq("t", "sig"))))
    val cold = DedupOps.dropHotBuckets(bucketed, Seq("t", "sig"),
      maxBucketFreq, Some(corpusRows))
    val half = Persists.barrier(cold.as("q").join(cold.as("c"),
        col("q.t") === col("c.t") && col("q.sig") === col("c.sig") &&
          col("q.vec_id") < col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"))
      .distinct()
      .join(vecs.select(col("vec_id"), col("v").as("qv")),
        col("query_id") === col("vec_id")).drop("vec_id")
      .join(vecs.select(col("vec_id"), col("v").as("cv")),
        col("neighbor_id") === col("vec_id")).drop("vec_id")
      .select(col("query_id"), col("neighbor_id"),
        round(expr("graft_cosine(qv, cv)"), 4).as("cosine")))
    mutualFromHalfScored(half, k, minCosine)
  }

  /** Shared tail of the exact and approximate graph builders: mirror
    * the once-scored half pairs, rank per query (rounded cosine desc,
    * id tie-break — the s01 convention), keep reciprocated top-`k`
    * pairs at least `minCosine` strong, oriented low→high. */
  private def mutualFromHalfScored(
      half: DataFrame, k: Int, minCosine: Double): DataFrame = {
    val scored = half.unionAll(half.select(
      col("neighbor_id").as("query_id"), col("query_id").as("neighbor_id"),
      col("cosine")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val topk = Persists.barrier(scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine"))
    topk.as("f").join(topk.as("b"),
        col("f.query_id") === col("b.neighbor_id") &&
          col("f.neighbor_id") === col("b.query_id") &&
          col("f.query_id") < col("f.neighbor_id"))
      .filter(col("f.cosine") >= minCosine)
      .select(col("f.query_id").as("a"), col("f.neighbor_id").as("b"))
  }

  /** Per-node triangle participation over low→high oriented edges
    * (`a` &lt; `b`): each triangle {a&lt;b&lt;c} found once, credited to
    * all three corners. Returns (node, n_tri), nodes in ≥1 triangle. */
  def trianglesOn(edges: DataFrame): DataFrame = {
    val e = Persists.barrier(edges.select("a", "b"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"), col("e3.a") === col("e1.a") &&
        col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"),
        col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }

  /** The co-purchase bipartite graph: distinct (customer, supplier)
    * pairs linked through an order's lineitems, node-encoded
    * customer→2k, supplier→2k+1, both edge directions emitted. */
  private def coPurchaseEdges(
      spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    val pairs = orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey"))
      .select((col("o_custkey") * 2).as("cn"),
        (col("l_suppkey") * 2 + 1).as("sn"))
      .distinct()
    pairs.select(col("cn").as("src"), col("sn").as("dst"))
      .unionAll(pairs.select(col("sn").as("src"), col("cn").as("dst")))
  }

  /** The s-family's shared double-cast projection — one definition,
    * so graph-family cosines can never drift from s01's. */
  private def embVecs(spark: SparkSession, sfDir: String): DataFrame =
    SimilarityOps.vecs(spark, sfDir)

  /** The strong mutual-kNN edge list materialized as an ingest
    * artifact (the [[DedupOps.signatureTablePath]] discipline,
    * idempotent per sfDir): at corpus scale the kNN graph is built
    * once at ingest — via the LSH/IVF candidate generators — and every
    * downstream graph analytic (components, triangles, per-node
    * density) serves from the stored edges. Benched as `g03i`. */
  def knnEdgesPath(spark: SparkSession, sfDir: String): String = {
    val n = Tables.rowCount(spark, sfDir, "embeddings")
    val dir = graft.sources.FsUtil.qualified("target/tmp/graph/knn_" +
      graft.sources.FsUtil.sanitize(sfDir) + s"_n$n")
    if (!graft.sources.FsUtil.exists(spark, dir + "/_SUCCESS"))
      mutualKnnEdgesOn(embVecs(spark, sfDir), minCosine = StrongCos)
        .write.mode("overwrite").parquet(dir)
    dir
  }

  /** [[queries]]' g03 serving from the pre-built edge artifact —
    * result-identical (same edges), benched so the r9 series isn't
    * dominated by rebuilding the kNN graph inside every run. */
  def componentsFromEdges(spark: SparkSession, sfDir: String): DataFrame =
    DedupOps.connectedComponents(
      spark.read.parquet(knnEdgesPath(spark, sfDir))
        .select(col("a").as("id_a"), col("b").as("id_b")))
      .select(col("doc_id").as("vec_id"), col("cluster_id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_pagerank" -> ((spark: SparkSession, sfDir: String) => {
      pagerankOn(coPurchaseEdges(spark, sfDir))
        .select(col("node"), round(col("pr"), 6).as("pr"))
    }),
    "g02_knn_triangles" -> ((spark: SparkSession, sfDir: String) =>
      trianglesOn(mutualKnnEdgesOn(embVecs(spark, sfDir)))),
    // g03: connected components of the same mutual-kNN graph — the
    // cluster structure of the embedding space (near-dup neighborhoods,
    // topic islands). Reuses the dedup family's label-propagation
    // kernel ([[DedupOps.connectedComponents]]: iterate-to-fixpoint
    // min-label with per-round lineage truncation), so the graph family
    // and the dedup family can never drift on component semantics.
    // the 0.4 cosine floor keeps only STRONG mutual neighbors: the
    // unfloored k=5 graph on this corpus is one giant component
    // (answer: trivially flat, label-prop rounds = graph diameter);
    // floored, the components are the similarity neighborhoods (42
    // clusters ≤8 wide at sf0.01) and propagation converges in
    // O(cluster diameter) rounds
    "g03_knn_components" -> ((spark: SparkSession, sfDir: String) => {
      val edges = mutualKnnEdgesOn(embVecs(spark, sfDir),
          minCosine = StrongCos)
        .select(col("a").as("id_a"), col("b").as("id_b"))
      DedupOps.connectedComponents(edges)
        .select(col("doc_id").as("vec_id"), col("cluster_id"))
    }),
    // g05: personalized PageRank from nation-0 customers — authority
    // flowing from a trusted seed set through co-purchase links; the
    // supplier ranks answer "which suppliers do trusted customers
    // concentrate on" (the crawl-curation domain-authority shape)
    "g05_personalized_pagerank" -> ((spark: SparkSession, sfDir: String) => {
      val seeds = Tables.load(spark, sfDir, "customer")
        .filter(col("c_nationkey") === 0)
        .select((col("c_custkey") * 2).as("node"))
      personalizedPagerankOn(coPurchaseEdges(spark, sfDir), seeds)
        .select(col("node"), round(col("pr"), 6).as("pr"))
    }),
    // g04: the LSH-candidate graph builder — the shape that replaces
    // g02/g03's exact all-pairs stage at corpus scale, targeting the
    // STRONG graph (g03's consumer): hyperplane collision probability
    // decays with angle, so a θ≈66° (cosine 0.4) edge collides in a
    // 4-plane table with p≈0.16 and across 16 tables with p≈0.94,
    // while the sub-floor edges the strong graph discards anyway are
    // the ones LSH loses. Approximate → rows-only;
    // KnnGraphRecallSpec pins strong-edge recall ≥ 0.8.
    "g04_knn_graph_lsh" -> ((spark: SparkSession, sfDir: String) =>
      mutualKnnEdgesApproxOn(embVecs(spark, sfDir),
        Tables.rowCount(spark, sfDir, "embeddings"),
        minCosine = StrongCos, tables = 16, planes = 4))
  )

  /** The PageRank oracle unrolls the fixed iterations as chained CTEs
    * (standard SQL bars aggregates inside a recursive term); every
    * arithmetic step — cast, divide, damp, round — mirrors the Spark
    * expression order so the doubles agree before each 9-dp round. */
  private def pagerankOracle(iters: Int): String = {
    val base =
      """WITH pairs AS (
           SELECT DISTINCT o_custkey * 2 AS cn, l_suppkey * 2 + 1 AS sn
           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         edges AS (
           SELECT cn AS src, sn AS dst FROM pairs
           UNION ALL
           SELECT sn AS src, cn AS dst FROM pairs),
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
         it0 AS (
           SELECT deg.src AS node,
                  round(CAST(1.0 AS DOUBLE) / nn.n, 9) AS pr
           FROM deg, nn)"""
    val its = (1 to iters).map { i =>
      s"""it$i AS (
           SELECT e.dst AS node,
                  round((CAST(1.0 AS DOUBLE) - CAST($Damping AS DOUBLE))
                          / max(nn.n) +
                        CAST($Damping AS DOUBLE) * sum(p.pr / d.deg),
                        9) AS pr
           FROM edges e
           JOIN it${i - 1} p ON e.src = p.node
           JOIN deg d ON e.src = d.src, nn
           GROUP BY e.dst)"""
    }.mkString(",\n")
    s"$base,\n$its\nSELECT node, round(pr, 6) AS pr FROM it$iters"
  }

  /** The mutual-kNN edge CTE block shared by the g02 and g03 oracles
    * (one definition, the [[DedupOps.clusterCtes]] discipline): cosine
    * per the s01 convention, rank over the rounded value, reciprocity
    * filter, low→high orientation, optional strength floor (g03). */
  private def knnEdgeCtes(minCosine: Option[Double]): String = {
    val floor = minCosine.map(c => s" AND f.cosine >= $c").getOrElse("")
    s"""v AS (
           SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  round(list_dot_product(q.v, c.v) /
                        sqrt(list_sum(list_transform(q.v, x -> x * x)) *
                             list_sum(list_transform(c.v, x -> x * x))),
                        4) AS cosine
           FROM v q, v c WHERE q.vec_id <> c.vec_id),
         topk AS (
           SELECT query_id, neighbor_id, cosine FROM (
             SELECT query_id, neighbor_id, cosine,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id) AS rank
             FROM scored) WHERE rank <= $KnnK),
         mutual AS (
           SELECT f.query_id AS a, f.neighbor_id AS b
           FROM topk f JOIN topk b
             ON f.query_id = b.neighbor_id AND f.neighbor_id = b.query_id
           WHERE f.query_id < f.neighbor_id$floor)"""
  }

  /** g05's oracle: the g01 CTE prefix plus a seed set and a CASE
    * teleport — every arithmetic step mirrors the Spark expression
    * order (the [[pagerankOracle]] discipline). */
  private def personalizedPagerankOracle(iters: Int): String = {
    val base =
      """WITH pairs AS (
           SELECT DISTINCT o_custkey * 2 AS cn, l_suppkey * 2 + 1 AS sn
           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         edges AS (
           SELECT cn AS src, sn AS dst FROM pairs
           UNION ALL
           SELECT sn AS src, cn AS dst FROM pairs),
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         nodes AS (SELECT src AS node FROM deg),
         seeds AS (
           SELECT n.node FROM nodes n
           JOIN customer c ON n.node = c.c_custkey * 2
           WHERE c.c_nationkey = 0),
         ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM seeds),
         it0 AS (
           SELECT n.node,
                  round(CASE WHEN s.node IS NOT NULL
                             THEN CAST(1.0 AS DOUBLE) / ns.n
                             ELSE CAST(0.0 AS DOUBLE) END, 9) AS pr
           FROM nodes n LEFT JOIN seeds s ON s.node = n.node, ns)"""
    val its = (1 to iters).map { i =>
      s"""m$i AS (
           SELECT e.dst AS node, sum(p.pr / d.deg) AS m
           FROM edges e
           JOIN it${i - 1} p ON e.src = p.node
           JOIN deg d ON e.src = d.src
           GROUP BY e.dst),
         it$i AS (
           SELECT m.node,
                  round(CASE WHEN s.node IS NOT NULL
                             THEN (CAST(1.0 AS DOUBLE) -
                                   CAST($Damping AS DOUBLE)) / ns.n
                             ELSE CAST(0.0 AS DOUBLE) END +
                        CAST($Damping AS DOUBLE) * m.m, 9) AS pr
           FROM m$i m LEFT JOIN seeds s ON s.node = m.node, ns)"""
    }.mkString(",\n")
    s"$base,\n$its\nSELECT node, round(pr, 6) AS pr FROM it$iters"
  }

  def oracleSql: Map[String, String] = Map(
    "g01_pagerank" -> pagerankOracle(PrIters),
    "g05_personalized_pagerank" -> personalizedPagerankOracle(PrIters),
    "g02_knn_triangles" ->
      s"""WITH ${knnEdgeCtes(None)},
         tri AS (
           SELECT e1.a AS x, e1.b AS y, e2.b AS z
           FROM mutual e1
           JOIN mutual e2 ON e1.b = e2.a
           JOIN mutual e3 ON e3.a = e1.a AND e3.b = e2.b)
         SELECT node, count(*) AS n_tri
         FROM (SELECT x AS node FROM tri
               UNION ALL SELECT y FROM tri
               UNION ALL SELECT z FROM tri)
         GROUP BY node""",
    "g03_knn_components" ->
      s"""WITH RECURSIVE ${knnEdgeCtes(Some(StrongCos))},
         ge AS (SELECT a AS v, b AS u FROM mutual
                UNION ALL SELECT b, a FROM mutual),
         cc(v, lbl) AS (
           SELECT v, v FROM (SELECT DISTINCT v FROM ge)
           UNION
           SELECT e.v, cc.lbl FROM ge e JOIN cc ON cc.v = e.u)
         SELECT v AS vec_id, min(lbl) AS cluster_id FROM cc GROUP BY v"""
  )
}
