package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** s18 iterated Lloyd training: the convergence contract (the g08
  * discipline applied to k-means) — on clusterable data the centroids
  * must MOVE less each round and the assignment must reach a fixpoint;
  * round 1 must equal the gated single step (s14). */
class KmeansTrainSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** 40 vectors in two tight 64-dim blobs around +1 and −1 (jitter
    * deterministic from the id), seeded DELIBERATELY badly: the two
    * lowest ids both sit in the +1 blob, so round 1 must actually move
    * a centroid across to the −1 blob for the loop to converge. */
  private def blobs = {
    val s = spark
    import s.implicits._
    (0 until 40).map { i =>
      val base = if (i < 20) 1.0 else -1.0
      val v = (0 until 64).map(j => base + ((i * 31 + j * 7) % 10) / 100.0)
      (i.toLong, v)
    }.toDF("vec_id", "v")
  }

  private def centsOf(df: org.apache.spark.sql.DataFrame)
      : Map[(Long, Int), Double] =
    df.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(3))
      .toMap

  test("centroid movement shrinks per round and assignment reaches a fixpoint") {
    val d = blobs
    val r1 = centsOf(SimilarityOps.kmeansTrainOn(d, k = 2, rounds = 1))
    val r2 = centsOf(SimilarityOps.kmeansTrainOn(d, k = 2, rounds = 2))
    val r3 = centsOf(SimilarityOps.kmeansTrainOn(d, k = 2, rounds = 3))
    def move(a: Map[(Long, Int), Double], b: Map[(Long, Int), Double]) =
      a.keySet.intersect(b.keySet).toSeq
        .map(k => math.abs(a(k) - b(k))).max
    val m12 = move(r1, r2)
    val m23 = move(r2, r3)
    assert(m12 > 0.0, "round 2 must move centroids off the bad seeds")
    assert(m23 <= m12, s"movement must shrink: $m12 -> $m23")
    // two tight blobs converge by round 3: the round-3 means equal the
    // round-2 means exactly (assignment fixpoint at the 6-dp grid)
    assert(m23 === 0.0, s"blobs must converge by round 3, moved $m23")
  }

  test("round 1 equals the gated single Lloyd step (s14)") {
    val d = blobs
    val one = SimilarityOps.kmeansTrainOn(d, k = 8, rounds = 1)
      .orderBy("cent_id", "dim").collect().toSeq
    val step = SimilarityOps.kmeansStepOn(d, k = 8)
      .orderBy("cent_id", "dim").collect().toSeq
    assert(one === step)
  }

  test("PQ training round 1 equals the gated single step (s16)") {
    val d = blobs
    val one = SimilarityOps.pqTrainFullOn(d, m = 2, k = 4, dim = 64,
        rounds = 1)
      .orderBy("subspace", "cent_id", "dim").collect().toSeq
    val step = SimilarityOps.pqTrainStepOn(d, m = 2, k = 4, dim = 64)
      .orderBy("subspace", "cent_id", "dim").collect().toSeq
    assert(one === step)
  }

  test("PQ training converges per subspace on the blob fixture") {
    val d = blobs
    def cents(rounds: Int) =
      SimilarityOps.pqTrainFullOn(d, m = 2, k = 2, dim = 64,
          rounds = rounds)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))
          -> r.getDouble(4)).toMap
    val r2 = cents(2); val r3 = cents(3)
    val keys = r2.keySet.intersect(r3.keySet)
    val move = keys.toSeq.map(k => math.abs(r2(k) - r3(k))).max
    assert(move === 0.0,
      s"two ±1 blobs must fixpoint per subspace by round 3, moved $move")
  }

  test("cluster sizes cover the corpus every round") {
    val d = blobs
    val out = SimilarityOps.kmeansTrainOn(d, k = 2, rounds = 3)
    // each dim row carries the cell occupancy; summed over cells at any
    // one dim it must equal the corpus size (no vector lost or double-
    // assigned across rounds)
    val perDim = out.filter(col("dim") === 0)
      .agg(sum("n")).collect().head.getLong(0)
    assert(perDim === 40L)
  }
}
