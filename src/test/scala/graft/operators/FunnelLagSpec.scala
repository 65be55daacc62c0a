package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q131 funnel conversion lag: hand-computed percentiles over a
  * crafted stage-times frame, and consistency with q60's counts. */
class FunnelLagSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("lags, counts, and interpolated percentiles by hand") {
    val s = spark
    import s.implicits._
    val f = Seq(
      (1L, Some(0L), Some(100L), Some(400L), 3),
      (2L, Some(0L), Some(300L), None, 2),
      (3L, Some(0L), None, None, 1))
      .toDF("user_id", "view_us", "click_us", "purchase_us", "stage")
    val m = EventOps.funnelLagOn(f).collect()
      .map(r => r.getInt(0) -> r).toMap
    val s1 = m(1)
    assert(s1.getString(1) === "view->click")
    assert(s1.getLong(2) === 2L)
    assert(s1.getDouble(3) === 200.0) // interp of {100, 300}
    assert(s1.getDouble(4) === 280.0) // 100 + 0.9*200
    assert(s1.getDouble(5) === 200.0)
    val s2 = m(2)
    assert(s2.getString(1) === "click->purchase")
    assert(s2.getLong(2) === 1L)
    assert(s2.getDouble(3) === 300.0 && s2.getDouble(4) === 300.0)
  }

  test("gate corpus: counts match q60's stage counts, lags positive") {
    val sf = "/root/testdata/sf0.001"
    val funnel = EventOps.funnel(spark, sf).collect()
    val lag = EventOps.funnelLag(spark, sf).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(lag(1).getLong(2) ===
      funnel.count(_.getAs[Int]("stage") >= 2).toLong)
    assert(lag(2).getLong(2) ===
      funnel.count(_.getAs[Int]("stage") === 3).toLong)
    lag.values.foreach(r => assert(r.getDouble(3) > 0.0))
  }
}
