package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q135 RFM segmentation and q136 basket rules against the sf0.001
  * testdata: internal consistency of the quartile-threshold scores
  * (monotone in the underlying metric, all four bins populated, CASE
  * labels consistent with the scores) and exact rule algebra on a
  * hand-checkable support/confidence/lift identity. */
class RfmBasketSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

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

  test("rfm: scores are monotone in their metric and all labels are legal") {
    val rows = RelationalQueries.queries("q135_rfm_segments")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // r_score is ANTI-monotone in recency_days (fresher = higher)
    val byR = rows.groupBy(_.getAs[Int]("r_score"))
      .view.mapValues(_.map(_.getAs[Int]("recency_days"))).toMap
    for (hi <- 2 to 4; lo <- 1 until hi)
      if (byR.contains(hi) && byR.contains(lo))
        assert(byR(hi).max <= byR(lo).min ||
          byR(hi).forall(v => byR(lo).forall(v <= _)),
          s"r_score $hi recencies must not exceed score-$lo recencies")
    // m_score is monotone in monetary
    val byM = rows.groupBy(_.getAs[Int]("m_score"))
      .view.mapValues(_.map(_.getAs[Double]("monetary"))).toMap
    for (hi <- 2 to 4; lo <- 1 until hi)
      if (byM.contains(hi) && byM.contains(lo))
        assert(byM(hi).min >= byM(lo).max - 1e-9)
    // quartile thresholds must populate every bin on 150 customers
    assert(byM.keySet === Set(1, 2, 3, 4))
    val legal = Set("champion", "loyal", "at_risk", "hibernating", "regular")
    assert(rows.forall(r => legal(r.getAs[String]("segment"))))
    // label/scores consistency: champions are exactly the CASE's first arm
    rows.foreach { r =>
      val (rs, fs, ms) = (r.getAs[Int]("r_score"),
        r.getAs[Int]("f_score"), r.getAs[Int]("m_score"))
      if (r.getAs[String]("segment") == "champion")
        assert(rs == 4 && fs >= 3 && ms >= 3)
    }
  }

  test("basket rules: support/confidence/lift identities hold exactly") {
    val s = spark
    import s.implicits._
    val rules = RelationalQueries.queries("q136_basket_rules")(spark, sf)
      .collect()
    assert(rules.nonEmpty, "sf0.001 must contain co-occurring pairs")
    // recompute N and per-part basket counts independently
    val items = graft.sources.Tables.load(spark, sf, "lineitem")
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    val n = items.select("ok").distinct().count().toDouble
    val cnt = items.groupBy("pk").count().as[(Long, Long)]
      .collect().toMap
    rules.foreach { r =>
      val (a, c) = (r.getAs[Long]("antecedent"), r.getAs[Long]("consequent"))
      val sc = r.getAs[Long]("support_cnt").toDouble
      assert(sc >= 2, "support floor")
      assert(math.abs(r.getAs[Double]("support") - sc / n) < 1e-6)
      assert(math.abs(r.getAs[Double]("confidence") - sc / cnt(a)) < 1e-6)
      assert(math.abs(r.getAs[Double]("lift") -
        sc * n / (cnt(a) * cnt(c))) < 1e-6)
    }
    // both directions of every pair are present
    val dirs = rules.map(r => (r.getAs[Long]("antecedent"),
      r.getAs[Long]("consequent"))).toSet
    assert(dirs.forall { case (a, c) => dirs((c, a)) })
  }
}
