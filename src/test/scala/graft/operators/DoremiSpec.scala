package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** c31 DoReMi weight step: hand-computed EG update, uniform fixpoint,
  * monotone upweighting, and clamp binding on the gate corpus. */
class DoremiSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def run(rows: Seq[(String, Double)]) = {
    val s = spark
    import s.implicits._
    CurationOps.doremiStepOn(rows.toDF("source", "nll"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
  }

  test("weights match the hand-computed EG update") {
    // docs: A 2.0 ×2, B 1.0, C 5.0 -> baseline (2+2+1+5)/4 = 2.5
    // excess: A 0, B 0, C 2.5; softmax over exp([0, 0, 2.5])
    val m = run(Seq("A" -> 2.0, "A" -> 2.0, "B" -> 1.0, "C" -> 5.0))
    assert(m("A")._1 === 2.0 && m("B")._1 === 1.0 && m("C")._1 === 5.0)
    assert(m("A")._2 === 0.0 && m("B")._2 === 0.0 && m("C")._2 === 2.5)
    val z = 2.0 + math.exp(2.5)
    def w(e: Double) = 0.9 * math.exp(e) / z + 0.1 / 3
    assert(math.abs(m("A")._3 - w(0.0)) < 2e-6)
    assert(math.abs(m("C")._3 - w(2.5)) < 2e-6)
    assert(math.abs(m.values.map(_._3).sum - 1.0) < 1e-5)
  }

  test("equal losses are a fixpoint: uniform 1/D regardless of scale") {
    val m = run(Seq("A" -> 3.0, "B" -> 3.0, "C" -> 3.0, "D" -> 3.0))
    m.values.foreach { case (_, excess, weight) =>
      assert(excess === 0.0)
      assert(weight === 0.25)
    }
  }

  test("upweighting is monotone in the domain loss") {
    // baseline (1+5+6)/3 = 4 -> excesses 0, 1, 2: strictly increasing
    // above the clamp, so the ordering is strict
    val m = run(Seq("lo" -> 1.0, "mid" -> 5.0, "hi" -> 6.0))
    assert(m("lo")._3 < m("mid")._3)
    assert(m("mid")._3 < m("hi")._3)
    // the below-baseline domain floors at the clamp
    assert(m("lo")._2 === 0.0)
  }

  test("the clamp binds on the gate corpus and weights sum to one") {
    val out = CurationOps.doremiStep(spark, "/root/testdata/sf0.001")
      .collect()
    val zeros = out.count(_.getDouble(2) == 0.0)
    assert(zeros > 0 && zeros < out.length,
      s"clamp no longer binds: $zeros of ${out.length} at zero excess")
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-4)
  }
}
