package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** t22 model-based quality filter: natural stopword-rich text must
  * pass the gate, degenerate repetition must fail it, and the score
  * must equal the logistic link applied to the already-gated t01/t08
  * features under the frozen weight table (the dot-product contract —
  * the spec recomputes it from the feature frames independently). */
class QualityClassifierSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def fixture = {
    val s = spark
    import s.implicits._
    Seq(
      // stopword-rich varied prose: the keep side
      (1L, "the cat is on the mat and a dog is in the house for fun " +
        "with joy"),
      // degenerate repetition: the drop side
      (2L, "spam spam spam spam spam spam"),
      // stopword-free but varied: between the two
      (3L, "quick brown fox jumps over lazy dogs near quiet rivers"))
      .toDF("doc_id", "text")
  }

  test("t22 keeps natural text, drops degenerate repetition") {
    val got = TextOps.qualityClassifierOn(fixture).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(got(1L)._2 && !got(2L)._2)
    assert(got(1L)._1 > got(3L)._1 && got(3L)._1 > got(2L)._1)
    got.values.foreach { case (s, _) => assert(s > 0.0 && s < 1.0) }
  }

  test("t22 score is the logistic dot product of the t01/t08 features") {
    val q = TextOps.qualityStatsOn(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Map("avg_word_len" -> r.getAs[Double]("avg_word_len"),
          "stopword_ratio" -> r.getAs[Double]("stopword_ratio"))).toMap
    val rep = TextOps.repetitionOn(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Map("rep_ratio" -> r.getAs[Double]("rep_ratio"),
          "top_word_frac" -> r.getAs[Double]("top_word_frac"))).toMap
    val w = TextOps.qualityLrModel.toMap
    val got = TextOps.qualityClassifierOn(fixture).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    fixture.collect().map(_.getLong(0)).foreach { id =>
      val x = q(id) ++ rep(id)
      val z = 2.0 + x.map { case (f, v) => v * w(f) }.sum
      val score = BigDecimal(1.0 / (1.0 + math.exp(-z)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id)._1 == score, s"doc $id")
      assert(got(id)._2 == (score >= 0.5), s"doc $id kept")
    }
  }

  test("t23 tiers: equi-depth terciles, left edge, ties stay together") {
    val s = spark
    import s.implicits._
    def run(rows: (Long, Double)*) =
      TextOps.qualityTiersOn(rows.toDF("doc_id", "logprob"))
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // 9 distinct values: exact terciles by ascending logprob
    val nine = run((1L to 9L).map(i => i -> (i.toDouble - 10)): _*)
    assert((1L to 3L).forall(nine(_) == "tail"))
    assert((4L to 6L).forall(nine(_) == "middle"))
    assert((7L to 9L).forall(nine(_) == "head"))
    // duplicated values land in ONE band (left-edge convention)
    val dup = run(1L -> -5.0, 2L -> -5.0, 3L -> -5.0,
      4L -> -2.0, 5L -> -2.0, 6L -> -1.0)
    assert(dup == Map(1L -> "tail", 2L -> "tail", 3L -> "tail",
      4L -> "middle", 5L -> "middle", 6L -> "head"))
  }
}
