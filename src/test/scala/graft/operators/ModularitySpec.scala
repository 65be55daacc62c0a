package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** g21/g22 modularity + CNM agglomeration: hand-computed Q on a
  * two-triangle bridge graph, the exact integer merge sequence, and
  * the negative-score past-the-peak signal. */
class ModularitySpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** Two triangles {1,2,3} and {4,5,6} joined by the bridge (3,4):
    * m = 7, degrees 1:2 2:2 3:3 4:3 5:2 6:2. */
  private def bridgeGraph = {
    val s = spark
    import s.implicits._
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)).toDF("a", "b")
  }

  test("modularity of the two-triangle partition is exactly 2(3/7 - 1/4)") {
    val s = spark
    import s.implicits._
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("node", "community")
    val got = GraphOps.modularityOn(bridgeGraph, labels).collect().head
    assert(got.getLong(0) === 7L)
    assert(got.getLong(1) === 2L)
    // Q = Σ_c (e_c/m − (d_c/2m)²) = 2·(3/7 − (7/14)²) = 0.357142857…
    assert(got.getDouble(2) === 0.357143)
  }

  test("one-community and singleton partitions bracket the good split") {
    val s = spark
    import s.implicits._
    val good = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("node", "community")
    val one = Seq.tabulate(6)(i => (i + 1L, 1L)).toDF("node", "community")
    val singl = Seq.tabulate(6)(i => (i + 1L, i + 1L))
      .toDF("node", "community")
    def q(l: org.apache.spark.sql.DataFrame) =
      GraphOps.modularityOn(bridgeGraph, l).collect().head.getDouble(2)
    assert(q(one) === 0.0) // everything in one community: Q is always 0
    assert(q(singl) < 0.0) // singletons: only the -(d/2m)² terms
    assert(q(good) > q(one))
  }

  test("CNM merges follow the exact integer-score sequence and flag the peak") {
    // scores = 2·m·e_cd − d_c·d_d, hand-unrolled:
    // r1: best 14−4=10, tie (1,2) vs (5,6) → (1,2)
    // r2: ({1,2},3): e=2 → 28−12=16
    // r3: (5,6) → 10 (the cross-bridge merge scores −7)
    // r4: (4,{5,6}): e=2 → 28−12=16
    // r5: only the bridge remains: 14−49=−35 — past the modularity peak
    val got = GraphOps.communityMergeOn(bridgeGraph, rounds = 5)
      .orderBy("merge_round").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === Seq(
      (1, 1L, 2L, 10L),
      (2, 1L, 3L, 16L),
      (3, 5L, 6L, 10L),
      (4, 4L, 5L, 16L),
      (5, 1L, 4L, -35L)))
  }

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("g23 Louvain moves converge to the exact triangle partition in 3 rounds") {
    // Hand-walked parity-alternating sequence (m = 7):
    //   r1 (odd movers 1,3,5): 1→2 (score 14−4=10), 3→1 (tie 8 between
    //      c1/c2 → c asc), 5→6 (10); even nodes untouched
    //   r2 (even movers 2,4,6): 2 stays c2 (own 10 vs c1 8), 4→6
    //      (k=2 into {5,6}: 28−12=16), 6 stays c6 (own 10 vs c4 8)
    //   r3 (odd movers): 3→2 (k=2 into {1,2}: 28−12=16, bridge −7),
    //      1 and 5 stay (own scores 10 and 18 dominate)
    val got = labelsOf(GraphOps.louvainMoveOn(bridgeGraph, rounds = 3))
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L,
      4L -> 6L, 5L -> 6L, 6L -> 6L))
  }

  test("g23 round 1 moves only odd nodes (the parity discipline)") {
    val got = labelsOf(GraphOps.louvainMoveOn(bridgeGraph, rounds = 1))
    // odd nodes moved to their best neighbor community; even nodes are
    // still singletons — the conflict-avoidance rule a naive
    // synchronous sweep lacks (1 and 2 would adopt EACH OTHER's label
    // and flip forever)
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 1L,
      4L -> 4L, 5L -> 6L, 6L -> 6L))
  }

  test("g23's final partition scores the known modularity peak") {
    val s = spark
    import s.implicits._
    val labels = GraphOps.louvainMoveOn(bridgeGraph, rounds = 3)
      .select(org.apache.spark.sql.functions.col("vec_id").as("node"),
        org.apache.spark.sql.functions.col("community"))
    val q = GraphOps.modularityOn(bridgeGraph, labels)
      .collect().head.getDouble(2)
    assert(q === 0.357143) // the two-triangle optimum g21 hand-pins
  }
}
