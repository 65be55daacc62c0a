package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** s30 farthest-first seeding: hand-traced maxmin walk, tie-breaks,
  * the non-increasing-radius invariant, and the duplicate guard. */
class FarthestFirstSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def run(pts: Seq[(Long, Seq[Double])], k: Int) = {
    val s = spark
    import s.implicits._
    SimilarityOps.farthestFirstOn(spark, pts.toDF("vec_id", "v"), k)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
  }

  test("maxmin walk matches the hand trace, ties to the lower id") {
    // line positions 0, 1, 10, 11, 20 (ids 0..4): seed 0, then 20
    // (d2 400), then 10 (min-d2 100), then ids 1 and 3 tie at 1 ->
    // lower id wins
    val pts = Seq(0L -> 0.0, 1L -> 1.0, 2L -> 10.0, 3L -> 11.0,
      4L -> 20.0).map { case (id, x) => (id, Seq(x, 0.0)) }
    assert(run(pts, 4).toSeq === Seq(
      (0, 0L, 0.0), (1, 4L, 400.0), (2, 2L, 100.0), (3, 1L, 1.0)))
  }

  test("selection radii are non-increasing (the k-center certificate)") {
    val out = SimilarityOps.farthestFirst(spark, "/root/testdata/sf0.001")
      .collect().sortBy(_.getInt(0))
    val radii = out.drop(1).map(_.getDouble(2))
    assert(radii.nonEmpty)
    radii.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
    assert(out.map(_.getLong(1)).distinct.length === out.length)
  }

  test("an all-identical corpus still yields k distinct centers") {
    val pts = (0L until 6L).map(id => (id, Seq(1.0, 2.0)))
    val out = run(pts, 3)
    assert(out.map(_._2).distinct.length === 3)
    out.drop(1).foreach { case (_, _, d) => assert(d === 0.0) }
  }

  test("seeds spread across well-separated clusters before refining") {
    // three tight clusters at 0, 100, 200: the first three picks must
    // hit three different clusters (the property modular sampling
    // lacks)
    val pts = for {
      (c, base) <- Seq(0.0, 100.0, 200.0).zipWithIndex.map(_.swap)
      j <- 0 until 4
    } yield ((c * 4 + j).toLong, Seq(base + j * 0.1, 0.0))
    val picked = run(pts, 3).map(_._2 / 4) // cluster of each pick
    assert(picked.distinct.length === 3)
  }
}
