package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** q128 Holt linear-trend smoothing: hand-stepped recursion, constant
  * and ramp series behavior, and first-row/singleton edges. */
class HoltTrendSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def series(tpe: String, ys: Seq[Double]) =
    ys.zipWithIndex.map { case (y, i) =>
      (tpe, Date.valueOf(f"2024-01-${i + 1}%02d"), y)
    }

  private def run(rows: Seq[(String, Date, Double)]) = {
    val s = spark
    import s.implicits._
    EventOps.holtOn(rows.toDF("event_type", "day", "v"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r)
      .toMap
  }

  test("recursion matches the hand-stepped updates (alpha=.5 beta=.3)") {
    val m = run(series("t", Seq(10.0, 12.0, 14.0)))
    val r1 = m(("t", "2024-01-01"))
    assert(r1.getDouble(3) === 10.0 && r1.getDouble(4) === 0.0)
    assert(r1.isNullAt(5)) // no forecast for the first day
    val r2 = m(("t", "2024-01-02"))
    // l2 = .5*12 + .5*10 = 11; b2 = .3*(11-10) = 0.3; fitted = 10
    assert(r2.getDouble(3) === 11.0 && r2.getDouble(4) === 0.3)
    assert(r2.getDouble(5) === 10.0)
    val r3 = m(("t", "2024-01-03"))
    // l3 = .5*14 + .5*11.3 = 12.65; b3 = .3*1.65 + .7*.3 = 0.705
    assert(r3.getDouble(3) === 12.65 && r3.getDouble(4) === 0.705)
    assert(r3.getDouble(5) === 11.3)
  }

  test("constant series: level sticks, trend stays zero, fitted exact") {
    val m = run(series("c", Seq.fill(6)(7.5)))
    m.values.foreach { r =>
      assert(r.getDouble(3) === 7.5)
      assert(r.getDouble(4) === 0.0)
    }
    assert(m(("c", "2024-01-06")).getDouble(5) === 7.5)
  }

  test("linear ramp: trend converges toward the slope") {
    val m = run(series("r", (1 to 20).map(_ * 2.0)))
    val last = m(("r", "2024-01-20"))
    assert(math.abs(last.getDouble(4) - 2.0) < 0.3,
      s"trend ${last.getDouble(4)} far from slope 2")
    // one-step forecast tracks the ramp within a level-lag margin
    assert(math.abs(last.getDouble(5) - 40.0) < 2.5)
  }

  test("single-day series emits one row with zero trend, null forecast") {
    val m = run(series("s", Seq(3.0)))
    assert(m.size === 1)
    val r = m(("s", "2024-01-01"))
    assert(r.getDouble(3) === 3.0 && r.getDouble(4) === 0.0)
    assert(r.isNullAt(5))
  }

  test("types fold independently (no cross-series leakage)") {
    val m = run(series("a", Seq(10.0, 20.0)) ++ series("b", Seq(100.0, 100.0)))
    assert(m(("a", "2024-01-02")).getDouble(3) === 15.0)
    assert(m(("b", "2024-01-02")).getDouble(3) === 100.0)
    assert(m(("b", "2024-01-02")).getDouble(4) === 0.0)
  }
}
