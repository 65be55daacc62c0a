package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Equi-depth histogram range selectivity (the third estimator tier):
  * the bucket math must be exact on constructed cuts, the measured
  * histogram must beat uniform span interpolation on a skewed real
  * column's tail predicate, and the p18 plan-under-histograms entry
  * must return the identical flagship answer (plan choice may move,
  * results may not). */
class HistogramEstimatorSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("histFracBelow: uniform cuts reduce to span interpolation") {
    // 4 equal-mass buckets over [0,100] with uniform data: cuts 25/50/75
    val cuts = Vector(25.0, 50.0, 75.0)
    Seq(0.0 -> 0.0, 10.0 -> 0.1, 25.0 -> 0.25, 60.0 -> 0.6,
        100.0 -> 1.0, -5.0 -> 0.0, 120.0 -> 1.0).foreach { case (v, want) =>
      assert(math.abs(
        StatsEstimator.histFracBelow(0.0, 100.0, cuts, v) - want) < 1e-12)
    }
  }

  test("histFracBelow: skewed cuts resolve the tail span cannot") {
    // 4 buckets, 75% of mass below 10, long tail to 1000:
    // cuts at 2/5/10 — span says P(> 500) ≈ 0.5; histogram knows the
    // last bucket holds only 25% of rows and interpolates inside it
    val cuts = Vector(2.0, 5.0, 10.0)
    val below500 = StatsEstimator.histFracBelow(0.0, 1000.0, cuts, 500.0)
    val pGt = 1.0 - below500
    assert(math.abs(pGt - 0.25 * (1.0 - 490.0 / 990.0)) < 1e-12)
    assert(pGt < 0.13, s"tail estimate $pGt must be far below span's 0.5")
    // zero-width bucket (constant value region) counts fully below
    assert(StatsEstimator.histFracBelow(0.0, 10.0, Vector(5.0, 5.0, 5.0),
      5.0) == 0.75)
  }

  test("measured histogram beats span interpolation on the events.value tail") {
    // events.value is the one genuinely skewed numeric column in the
    // testdata: P(value > 294) ≈ 0.1% while uniform span interpolation
    // over [0, ~328] says ≈ 10% — a ~100× misestimate the 32-bucket
    // equi-depth histogram must cut by well over an order of magnitude
    val events = graft.sources.Tables.load(spark, sfDir, "events")
    val p = StatsEstimator.profileTableHist(spark, sfDir, "events")
    assert(p.bounds.contains("value"))
    assert(p.bounds("value").size == 31, "32 buckets -> 31 cuts")
    val n = events.count().toDouble
    val lit = 294.0
    val truth = events.filter(s"value > $lit").count() / n
    assert(truth > 0, "fixture drift: tail predicate selects nothing")
    val hist = StatsEstimator.selectivityOf(p)(s"value > $lit")
    val span = StatsEstimator.selectivityOf(
      p.copy(bounds = Map.empty))(s"value > $lit")
    def qerr(est: Double) =
      math.max(est / truth, truth / math.max(est, 1e-12))
    assert(qerr(hist) * 10 <= qerr(span),
      s"hist $hist (q=${qerr(hist)}) must cut span $span (q=${qerr(span)}) " +
        s"10x vs truth $truth")
  }

  test("string and Catalyst predicate paths agree on the histogram") {
    val p = StatsEstimator.profileTableHist(spark, sfDir, "orders")
    val fromString = StatsEstimator.selectivityOf(p)("o_totalprice > 450000")
    val e = spark.sessionState.sqlParser
      .parseExpression("o_totalprice > 450000")
    import org.apache.spark.sql.catalyst.expressions._
    val bound = e.transformUp {
      case UnresolvedAttributeLike(name) => AttributeReference(
        name, org.apache.spark.sql.types.DoubleType)()
    }
    val fromCatalyst = StatsEstimator.selectivityOfCatalyst(p)(bound)
    assert(math.abs(fromString - fromCatalyst) < 1e-12)
  }

  // matcher for whatever unresolved-attribute node the parser emits
  private object UnresolvedAttributeLike {
    def unapply(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Option[String] = e match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        Some(a.name)
      case _ => None
    }
  }

  test("p18 (histogram stats) returns the identical flagship answer") {
    val histRows = PlannerQueries.runFlagshipStats(spark, sfDir, hist = true)
      .collect().map(_.toString).sorted
    val plainRows = PlannerQueries.runFlagshipStats(spark, sfDir)
      .collect().map(_.toString).sorted
    assert(histRows.sameElements(plainRows))
  }

  test("aliased profile re-suffixes histogram bounds too") {
    val p = AliasedRels.profile(spark, sfDir, "orders@2", hist = true)
    assert(p.bounds.contains("o_totalprice_a2"))
    assert(!p.bounds.contains("o_totalprice"))
    val base = AliasedRels.profile(spark, sfDir, "orders", hist = true)
    assert(p.bounds("o_totalprice_a2") == base.bounds("o_totalprice"))
  }
}
