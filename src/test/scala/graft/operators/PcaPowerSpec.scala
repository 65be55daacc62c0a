package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** s23 power-iteration PCA: exact hand values on a rank-1 fixture,
  * the 1-round fixpoint, and the unit-norm contract. */
class PcaPowerSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** ±(3,4) and ±(6,8): zero means, covariance exactly
    * [[22.5, 30], [30, 40]] = 2.5·[[9,12],[12,16]] — rank 1 with
    * principal direction (0.6, 0.8) and eigenvalue 62.5. */
  private def rank1Corpus = {
    val s = spark
    import s.implicits._
    Seq((0L, Seq(3.0, 4.0)), (1L, Seq(-3.0, -4.0)),
      (2L, Seq(6.0, 8.0)), (3L, Seq(-6.0, -8.0))).toDF("vec_id", "v")
  }

  test("s23 lands the exact principal component and Rayleigh eigenvalue") {
    val got = SimilarityOps.pcaPowerOn(rank1Corpus, n = 4.0)
      .orderBy("dim").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq
    // C·(1,1)/√2 ∝ (52.5, 70) — the common 0.707107 factor cancels in
    // the normalize, so round 1 already lands (52.5, 70)/87.5 = (0.6,
    // 0.8) on the 6-dp grid; λ = vᵀCv = 8.1 + 28.8 + 25.6 = 62.5
    assert(got === Seq((0, 0.6, 62.5), (1, 0.8, 62.5)))
  }

  test("s23 rank-1 fixture fixpoints after one round") {
    def run(r: Int) = SimilarityOps.pcaPowerOn(rank1Corpus, 4.0, rounds = r)
      .orderBy("dim").collect().map(_.toSeq).toSeq
    assert(run(1) === run(5)) // normalize(C·v) is already the fixpoint
  }

  test("s23 component is unit-norm on the real corpus") {
    val comp = SimilarityOps.pcaPower(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(comp.length === 64) // the embedding dim
    val norm2 = comp.map { case (_, x, _) => x * x }.sum
    assert(math.abs(norm2 - 1.0) < 1e-4) // 6-dp grid noise only
    // the top eigenvalue bounds every diagonal variance entry
    assert(comp.head._3 > 0.0)
  }
}
