package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** c33 mixture annealing: endpoint identities, per-epoch simplex
  * conservation, and monotone interpolation. */
class MixAnnealSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def run(ws: Seq[(String, Double)], epochs: Int = 4) = {
    val s = spark
    import s.implicits._
    CurationOps.mixAnnealOn(ws.toDF("source", "weight"), epochs)
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getDouble(2)).toMap
  }

  test("epoch 0 is the input mix, the final epoch is uniform") {
    val m = run(Seq("A" -> 0.7, "B" -> 0.2, "C" -> 0.1))
    assert(m((0, "A")) === 0.7 && m((0, "C")) === 0.1)
    Seq("A", "B", "C").foreach(s => assert(m((3, s)) === 0.333333))
  }

  test("every epoch stays on the simplex (sum 1 on the grid)") {
    val m = run(Seq("A" -> 0.5, "B" -> 0.35, "C" -> 0.15), epochs = 5)
    (0 until 5).foreach { e =>
      val tot = Seq("A", "B", "C").map(s => m((e, s))).sum
      assert(math.abs(tot - 1.0) < 5e-6, s"epoch $e sums to $tot")
    }
  }

  test("an above-uniform weight anneals DOWN monotonically") {
    val m = run(Seq("A" -> 0.7, "B" -> 0.2, "C" -> 0.1))
    val as = (0 to 3).map(e => m((e, "A")))
    as.sliding(2).foreach { case Seq(x, y) => assert(x > y) }
    val cs = (0 to 3).map(e => m((e, "C")))
    cs.sliding(2).foreach { case Seq(x, y) => assert(x < y) }
  }

  test("gate entry: 4 epochs x 20 sources, each epoch on the simplex") {
    val out = CurationOps.mixAnneal(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length === 80)
    out.groupBy(_.getInt(0)).foreach { case (e, rows) =>
      val tot = rows.map(_.getDouble(2)).sum
      assert(math.abs(tot - 1.0) < 2e-5, s"epoch $e sums to $tot")
    }
  }
}
