package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** s12 contract: the distributed outer-product aggregation reproduces
  * the hand-computed covariance matrix, symmetrically, with variances
  * on the diagonal. */
class CovarianceSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("covariance matches the closed form on a tiny corpus") {
    val s = spark
    import s.implicits._
    // three 2-d points: x = (1,2,3), y = (2,4,6) -> y = 2x exactly.
    // E[x]=2, E[x²]=14/3 -> var(x)=14/3-4=2/3; cov(x,y)=2·var(x)=4/3;
    // var(y)=4·var(x)=8/3.
    val vecs = Seq(
      (0L, Seq(1.0, 2.0)), (1L, Seq(2.0, 4.0)), (2L, Seq(3.0, 6.0)))
      .toDF("vec_id", "v")

    // the gate's own pipeline via the fixture-injectable form
    val cov = SimilarityOps.covarianceOn(vecs, n = 3.0)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap

    assert(cov.size == 4)
    assert(math.abs(cov((0, 0)) - 2.0 / 3) < 1e-6)
    assert(math.abs(cov((1, 1)) - 8.0 / 3) < 1e-6)
    assert(math.abs(cov((0, 1)) - 4.0 / 3) < 1e-6)
    assert(cov((0, 1)) == cov((1, 0))) // symmetry
  }

  test("gate entry emits d² rows with a symmetric PSD-consistent diagonal") {
    val df = SimilarityOps.covariance(spark, "/root/testdata/sf0.001")
    val rows = df.collect().map(r =>
      (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val d = math.sqrt(rows.size.toDouble).toInt
    assert(d * d == rows.size)
    for (i <- 0 until d) assert(rows((i, i)) >= 0.0) // variances
    for (i <- 0 until d; j <- i + 1 until d)
      assert(rows((i, j)) == rows((j, i)))
  }
}
