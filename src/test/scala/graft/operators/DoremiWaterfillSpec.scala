package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** c32 weighted water-filling: hand-traced capped allocation, the
  * uniform-weight reduction to c30, and conservation bounds. */
class DoremiWaterfillSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def run(rows: Seq[(String, Long, Double)]) = {
    val s = spark
    import s.implicits._
    CurationOps.weightedWaterfillOn(
      rows.map { case (src, a, _) => (src, a) }.toDF("source", "avail"),
      rows.map { case (src, _, w) => (src, w) }.toDF("source", "weight"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3),
        r.getInt(4))).toMap
  }

  test("supply-capped domain yields its surplus to the others") {
    // budget = 210/2 = 105; A wants .6*105 = 63 but HAS 10 -> capped;
    // rate = (105-10)/0.4 = 237.5; B and C get floor(47.5) = 47 each
    val m = run(Seq(("A", 10L, 0.6), ("B", 100L, 0.2), ("C", 100L, 0.2)))
    assert(m("A") === ((10L, 10L, 1)))
    assert(m("B") === ((100L, 47L, 0)))
    assert(m("C") === ((100L, 47L, 0)))
  }

  test("uncapped allocation is proportional to weight") {
    // plenty of supply everywhere: alloc ~ budget * weight
    val m = run(Seq(("A", 1000L, 0.5), ("B", 1000L, 0.3),
      ("C", 1000L, 0.2)))
    // budget 1500: 750 / 450 / 300
    assert(m("A")._2 === 750L && m("B")._2 === 450L && m("C")._2 === 300L)
    assert(m.values.forall(_._3 === 0))
  }

  test("uniform weights reduce to c30's max-min allocation (±1 floor)") {
    val rows = Seq(("A", 10L), ("B", 50L), ("C", 200L), ("D", 700L))
    val s = spark
    import s.implicits._
    val c30 = CurationOps.waterfillOn(rows.toDF("source", "avail"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val c32 = run(rows.map { case (src, a) => (src, a, 0.25) })
    rows.foreach { case (src, _) =>
      assert(math.abs(c32(src)._2 - c30(src)) <= 1L,
        s"$src: c32 ${c32(src)._2} vs c30 ${c30(src)}")
    }
  }

  test("conservation: alloc <= avail, total within floor loss of budget") {
    val rows = Seq(("A", 37L, 0.45), ("B", 911L, 0.05), ("C", 400L, 0.3),
      ("D", 129L, 0.2))
    val m = run(rows)
    val budget = rows.map(_._2).sum / 2
    rows.foreach { case (src, a, _) => assert(m(src)._2 <= a) }
    val total = m.values.map(_._2).sum
    assert(total <= budget && budget - total < rows.size)
  }

  test("gate entry: weights arrive from c31 and the mix allocates") {
    val out = CurationOps.doremiWaterfill(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length === 20)
    val budget = out.map(_.getLong(1)).sum / 2
    val total = out.map(_.getLong(3)).sum
    assert(total <= budget && budget - total < out.length)
  }
}
