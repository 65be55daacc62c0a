package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** s22 JL sign projection: frozen-matrix stability, linearity, and
  * the distance-preservation contract on the real corpus. */
class JlProjectionSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("the frozen sign matrix has the pinned +1 population") {
    val m = SimilarityOps.jlMatrix(spark).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(m.size === 512)
    assert(m.values.forall(s => s == 1.0 || s == -1.0))
    // pinned population: md5 parity over the 512 cells — a change
    // here means the frozen model drifted and every serving consumer
    // of the projection silently re-projects differently
    assert(m.values.count(_ == 1.0) === 257)
  }

  test("projection is linear: P(a) - P(b) == P(a - b) on the 6-dp grid") {
    val s = spark
    import s.implicits._
    val a = Seq.tabulate(64)(i => (i % 7).toDouble)
    val b = Seq.tabulate(64)(i => (i % 3).toDouble)
    val diff = a.zip(b).map { case (x, y) => x - y }
    val proj = SimilarityOps.randomProjectionOn(spark,
      Seq((0L, a), (1L, b), (2L, diff)).toDF("vec_id", "v"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    val lhs = proj(0L).zip(proj(1L)).map { case (x, y) => x - y }
    lhs.zip(proj(2L)).foreach { case (l, r) =>
      assert(math.abs(l - r) < 2e-6) // two 6-dp grids of slack
    }
  }

  test("s24 with fetchN >= corpus IS exact brute top-k (identity contract)") {
    val sf = "/root/testdata/sf0.001"
    val brute = SimilarityOps.bruteForceTopK(spark, sf)
      .collect().map(_.toSeq).toSet
    val full = SimilarityOps.projectedTopK(spark, sf, fetchN = 600)
      .collect().map(_.toSeq).toSet
    assert(brute.nonEmpty && full === brute)
  }

  test("s24 compressed first pass keeps useful recall at fetchN = 50") {
    val sf = "/root/testdata/sf0.001"
    def top(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = top(SimilarityOps.bruteForceTopK(spark, sf))
    val proj = top(SimilarityOps.projectedTopK(spark, sf))
    val recall = (brute & proj).size.toDouble / brute.size
    // 8 of 64 dims, 50 of 500 candidates: the structureless synthetic
    // corpus is the HARD case for JL (all pairwise distances nearly
    // equal), so the floor is modest; measured ~0.3-0.5
    assert(recall >= 0.2, s"recall@10 $recall")
  }

  test("pairwise distances survive 64 -> 8 in expectation (JL contract)") {
    val proj = SimilarityOps.randomProjection(spark, "/root/testdata/sf0.001")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    val orig = SimilarityOps.vecs(spark, "/root/testdata/sf0.001")
      .selectExpr("vec_id", "v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted.take(40)
    val ratios = for {
      (a, ix) <- ids.zipWithIndex; b <- ids.drop(ix + 1)
      den = d2(orig(a), orig(b)) if den > 1e-9
    } yield d2(proj(a).toArray, proj(b).toArray) / den
    val mean = ratios.sum / ratios.size
    // sign-JL is unbiased (E[ratio] = 1); per-pair sd ~ sqrt(2/k) but
    // the mean over ~780 pairs concentrates hard
    assert(ratios.nonEmpty)
    assert(mean > 0.8 && mean < 1.2, s"mean distance ratio $mean")
  }
}
