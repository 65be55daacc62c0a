package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the two-phase distributed skyline: equality with
  * an in-test brute-force dominance filter (the oracle's NOT EXISTS,
  * computed in Scala) on adversarial fixtures — ties on one dimension,
  * exact duplicates (both survive: dominance needs one strict
  * inequality), single-price degenerate input (bucket width 0), and a
  * randomized fixture wide enough that bucket boundaries land between
  * frontier points. */
class SkylineOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** minimize price, maximize size; dominance needs one strict edge */
  private def brute(rows: Seq[(Long, Double, Int)]): Set[Long] =
    rows.filter { a =>
      !rows.exists(b => b._2 <= a._2 && b._3 >= a._3 &&
        (b._2 < a._2 || b._3 > a._3))
    }.map(_._1).toSet

  private def run(rows: Seq[(Long, Double, Int)]): Set[Long] = {
    val s = spark
    import s.implicits._
    SkylineOps.skyline2D(rows.toDF("id", "price", "size"), "price", "size")
      .collect().map(_.getAs[Long]("id")).toSet
  }

  test("skyline: hand fixture with ties and duplicates") {
    val rows = Seq(
      (1L, 10.0, 5), // frontier: cheapest overall
      (2L, 10.0, 5), // exact duplicate of 1 — both survive
      (3L, 10.0, 4), // same price as 1 but smaller: dominated
      (4L, 20.0, 9), // frontier: pays more, gets more
      (5L, 20.0, 9), // duplicate of 4 — survives
      (6L, 25.0, 9), // same size as 4, pricier: dominated
      (7L, 30.0, 12), // frontier
      (8L, 30.0, 2), // dominated by 1 (cheaper AND bigger)
      (9L, 40.0, 12) // same size as 7, pricier: dominated
    )
    val want = brute(rows)
    assert(want == Set(1L, 2L, 4L, 5L, 7L))
    assert(run(rows) == want)
  }

  test("skyline: single distinct price (bucket width 0)") {
    val rows = Seq((1L, 5.0, 3), (2L, 5.0, 7), (3L, 5.0, 7))
    assert(run(rows) == brute(rows))
    assert(run(rows) == Set(2L, 3L))
  }

  test("skyline: strictly increasing frontier keeps everything") {
    val rows = (1 to 50).map(i => (i.toLong, i.toDouble, i))
    assert(run(rows) == rows.map(_._1).toSet)
  }

  test("skyline: randomized fixture matches brute force") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 400).map(i =>
      (i.toLong, (rnd.nextInt(1000) / 7.0), rnd.nextInt(100)))
    assert(run(rows) == brute(rows))
  }
}
