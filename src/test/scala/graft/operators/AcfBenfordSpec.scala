package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** q138 ACF (hand-computed lags, alternating-series closed form) and
  * q139 Benford audit (digit partition, closed-form expectations). */
class AcfBenfordSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def acf(rows: Seq[(String, Date, Double)]) = {
    val s = spark
    import s.implicits._
    EventOps.acfOn(rows.toDF("event_type", "day", "v")).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
  }

  test("acf: hand-computed ramp 1,2,3,4") {
    // devs −1.5,−.5,.5,1.5; den 5; num1 1.25, num2 −1.5, num3 −2.25
    val m = acf(series("t", Seq(1.0, 2.0, 3.0, 4.0)))
    assert(m(("t", 1)) == (3L, 0.25))
    assert(m(("t", 2)) == (2L, -0.3))
    assert(m(("t", 3)) == (1L, -0.45))
    assert(!m.contains(("t", 4)), "no pairs past n-1")
  }

  test("acf: alternating series has acf(1) = -(n-1)/n, acf(2) = +(n-2)/n") {
    val n = 10
    val m = acf(series("alt", Seq.tabulate(n)(i => if (i % 2 == 0) 1.0 else -1.0)))
    assert(m(("alt", 1))._2 == math.rint(-(n - 1.0) / n * 1e4) / 1e4)
    assert(m(("alt", 2))._2 == math.rint((n - 2.0) / n * 1e4) / 1e4)
  }

  test("acf: types are independent and pair counts drop by one per lag") {
    val m = acf(series("a", Seq(1.0, 5.0, 2.0, 8.0, 3.0)) ++
      series("b", Seq(9.0, 1.0)))
    (1 to 4).foreach(l => assert(m(("a", l))._1 == 5L - l))
    assert(m(("b", 1))._1 == 1L)
    assert(!m.contains(("b", 2)))
  }

  test("benford: digits partition the rows and expectations are closed-form") {
    val rows = AuditOps.benfordAudit(spark, "/root/testdata/sf0.001")
      .collect()
    val digits = rows.map(_.getInt(0)).sorted
    assert(digits.forall(d => d >= 1 && d <= 9))
    val total = rows.map(_.getLong(1)).sum
    val positive = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "orders")
      .filter("o_totalprice > 0").count()
    assert(total == positive, "every positive price lands in one digit bin")
    rows.foreach { r =>
      val d = r.getInt(0)
      val exp = math.rint(math.log10(1.0 + 1.0 / d) * 1e6) / 1e6
      assert(r.getDouble(3) == exp, s"expected share for digit $d")
      assert(math.abs(r.getDouble(4) - (r.getDouble(2) - exp)) < 1e-9)
    }
    val shareSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
  }
}
