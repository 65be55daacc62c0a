package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** q133 weekday seasonality: the portable epoch-day weekday anchor,
  * hand-computed indexes, and the zero-mean guard. */
class SeasonalitySpec extends AnyFunSuite with BeforeAndAfterAll {

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
    EventOps.seasonalityIndexOn(rows.toDF("event_type", "day", "v"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r).toMap
  }

  test("weekday anchor: 2024-01-01 (a Monday) lands on dow 0") {
    val m = run(Seq(("t", Date.valueOf("2024-01-01"), 1.0)))
    assert(m.keySet === Set(("t", 0)))
  }

  test("indexes match hand arithmetic over a two-week series") {
    // Mondays 10, 10; Tuesdays 20, 20 -> type mean 15
    val m = run(Seq(
      ("t", Date.valueOf("2024-01-01"), 10.0),
      ("t", Date.valueOf("2024-01-08"), 10.0),
      ("t", Date.valueOf("2024-01-02"), 20.0),
      ("t", Date.valueOf("2024-01-09"), 20.0)))
    assert(m(("t", 0)).getLong(2) === 2L)
    assert(m(("t", 0)).getDouble(3) === 10.0)
    assert(m(("t", 0)).getDouble(4) === 0.6667)
    assert(m(("t", 1)).getDouble(4) === 1.3333)
  }

  test("an all-zero series yields NULL indexes, not Infinity") {
    val m = run(Seq(("z", Date.valueOf("2024-01-01"), 0.0),
      ("z", Date.valueOf("2024-01-02"), 0.0)))
    m.values.foreach(r => assert(r.isNullAt(4)))
  }

  test("gate corpus: every type covers all seven weekdays") {
    val out = EventOps.seasonalityIndex(spark, "/root/testdata/sf0.001")
      .collect()
    val byType = out.groupBy(_.getString(0))
    assert(byType.nonEmpty)
    byType.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).toSet === (0 to 6).toSet)
    }
  }
}
