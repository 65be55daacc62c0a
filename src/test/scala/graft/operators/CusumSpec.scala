package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** q137 CUSUM changepoints: hand-stepped one-sided sums, a level shift
  * that must alarm on the high side (and only there), reset-to-zero
  * behavior, and the zero-variance / singleton edges. */
class CusumSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    EventOps.cusumOn(rows.toDF("event_type", "day", "v"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r)
      .toMap
  }

  test("a persistent level shift accumulates on the high side and alarms") {
    // 10 quiet days at ~0 then 10 shifted days: each shifted z ≈ +1σ
    // adds z − 0.5 ≈ +0.4+ per step — s_hi must cross h = 4 before the
    // end while s_lo stays pinned at 0 throughout the shift
    val m = run(series("t", Seq.fill(10)(10.0) ++ Seq.fill(10)(30.0)))
    val last = m(("t", "2024-01-20"))
    assert(last.getDouble(4) > 4.0, s"s_hi ${last.getDouble(4)} should alarm")
    assert(last.getBoolean(6), "alarm flag must be set")
    assert(last.getDouble(5) === 0.0, "low side must not accumulate")
    // the early quiet days sit below threshold
    val early = m(("t", "2024-01-05"))
    assert(!early.getBoolean(6))
  }

  test("hand-stepped sums on a 3-point series") {
    // ys = 0, 10, 20: mean 10, sd 10 → z = −1, 0, 1 exactly
    val m = run(series("h", Seq(0.0, 10.0, 20.0)))
    // day1: hi = max(0, −1 − .5) = 0; lo = max(0, 1 − .5) = 0.5
    val r1 = m(("h", "2024-01-01"))
    assert(r1.getDouble(4) === 0.0 && r1.getDouble(5) === 0.5)
    // day2: z = 0 → hi = 0; lo = max(0, .5 − 0 − .5) = 0
    val r2 = m(("h", "2024-01-02"))
    assert(r2.getDouble(4) === 0.0 && r2.getDouble(5) === 0.0)
    // day3: z = 1 → hi = .5; lo = 0
    val r3 = m(("h", "2024-01-03"))
    assert(r3.getDouble(4) === 0.5 && r3.getDouble(5) === 0.0)
    assert(m.values.forall(!_.getBoolean(6)))
  }

  test("constant series: zero variance, z = 0, both sums stay 0") {
    val m = run(series("c", Seq.fill(5)(7.0)))
    m.values.foreach { r =>
      assert(r.getDouble(3) === 0.0) // z
      assert(r.getDouble(4) === 0.0 && r.getDouble(5) === 0.0)
      assert(!r.getBoolean(6))
    }
  }

  test("singleton series survives (null stddev path) with z = 0") {
    val m = run(series("s", Seq(42.0)))
    val r = m(("s", "2024-01-01"))
    assert(r.getDouble(3) === 0.0 && !r.getBoolean(6))
  }

  test("types fold independently") {
    val m = run(series("a", Seq(1.0, 2.0, 3.0)) ++
      series("b", Seq(100.0, 100.0, 100.0)))
    assert(m.size === 6)
    assert(m(("b", "2024-01-02")).getDouble(3) === 0.0)
    assert(m(("a", "2024-01-01")).getDouble(3) === -1.0)
  }
}
