package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** q130 forecast-residual anomalies: the spike-day flag, the zero-MAD
  * exclusion, and flag/score consistency on the gate corpus. */
class HoltAnomalySpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def run(rows: Seq[(String, Date, Double)]) = {
    val s = spark
    import s.implicits._
    EventOps.holtAnomaliesOn(
      EventOps.holtOn(rows.toDF("event_type", "day", "v")))
      .collect()
      .map(r => (r.getString(1), r.getDate(0).toString) -> r).toMap
  }

  private def series(tpe: String, ys: Seq[Double]) =
    ys.zipWithIndex.map { case (y, i) =>
      (tpe, Date.valueOf(f"2024-01-${i + 1}%02d"), y)
    }

  test("a spike day is flagged; steady days around it are not") {
    // near-constant series with jitter (so MAD > 0) and one 100x day
    val ys = Seq(10.0, 10.2, 9.8, 10.1, 9.9, 1000.0, 10.0, 10.2,
      9.8, 10.1)
    val m = run(series("t", ys))
    assert(m(("t", "2024-01-06")).getInt(6) === 1)
    assert(m(("t", "2024-01-04")).getInt(6) === 0)
    assert(m(("t", "2024-01-03")).getInt(6) === 0)
  }

  test("a zero-MAD series (perfectly constant) emits no rows") {
    val m = run(series("c", Seq.fill(8)(5.0)))
    assert(m.isEmpty)
  }

  test("a clean linear ramp is anomaly-free after the first step") {
    // level+trend tracking: residuals shrink geometrically, so the
    // robust z of any single day stays modest
    val m = run(series("r", (1 to 15).map(_ * 3.0)))
    val flagged = m.values.count(_.getInt(6) === 1)
    assert(flagged === 0, s"$flagged ramp days flagged")
  }

  test("gate corpus: flag equals the 3.5 cut on rz, row for row") {
    val out = EventOps.holtAnomalies(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert((math.abs(r.getDouble(5)) > 3.5) === (r.getInt(6) === 1))
    }
  }
}
