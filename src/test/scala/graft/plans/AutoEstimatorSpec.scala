package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** stats=auto: histograms by default, sample synopses when the
  * driver-side trigger detects cross-relation correlation. The trigger
  * must flag the two known correlation traps (tree9_sel's true-zero
  * 3-subset, star10_sel's anti-correlated price bands), must NOT flag
  * the plain shapes (those stay on the cheap tier and never pay a
  * sample-collection scan), and must be deterministic. */
class AutoEstimatorSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def autoOf(name: String): (Cardinality, Boolean) = {
    val cq = JobCorpus.all.find(_.name == name).get
    val profiles = cq.graph.relations.map(n =>
      AliasedRels.profile(spark, sfDir, n, hist = true)).toVector
    AutoEstimator.cardinality(spark, sfDir, cq.graph, cq.filters, profiles)
  }

  test("predicate grammar: parse + eval") {
    import AutoEstimator._
    assert(parsePred("n_name = 'NATION_3'") ===
      Some(Pred("n_name", "=", Some("NATION_3"), None)))
    assert(parsePred("(value > 294.0)") ===
      Some(Pred("value", ">", None, Some(294.0))))
    assert(parsePred("label = 3").isDefined)
    // LIKE is evaluable since r14 (synopsis-priced, p25)
    assert(parsePred("n_name LIKE 'NAT%'") ===
      Some(Pred("n_name", "like", Some("NAT%"), None)))
    assert(parsePred("n_name > 'A'").isEmpty) // string ranges: residual
    val row = Map[String, Any]("n_name" -> "NATION_3", "value" -> 300.0)
    assert(eval(row, parsePred("n_name = 'NATION_3'").get))
    assert(!eval(row, parsePred("n_name = 'NATION_4'").get))
    assert(eval(row, parsePred("value > 294.0").get))
    assert(!eval(row, parsePred("value <= 294.0").get))
    assert(!eval(Map[String, Any]("value" -> null), parsePred("value > 1").get))
  }

  test("unevaluable conjuncts become residual selectivity, not errors") {
    val p = AliasedRels.profile(spark, sfDir, "nation")
    // string RANGES stay residual (LIKE became evaluable in r14)
    val vf = AutoEstimator.parseFilter(
      Some("n_name = 'NATION_3' AND n_comment > 'x'"), p)
    assert(vf.preds.size == 1)
    assert(vf.residualSel > 0.0 && vf.residualSel < 1.0)
  }

  test("tree9_sel escalates: the true-zero 3-subset is invisible to histograms") {
    val (_, escalated) = autoOf("tree9_sel")
    assert(escalated,
      "NATION_3 customers x 'error' events must trip the trigger")
  }

  test("star10_sel escalates: anti-correlated price bands on the same key") {
    val (_, escalated) = autoOf("star10_sel")
    assert(escalated)
  }

  test("plain shapes stay on the histogram tier (no sample scans paid)") {
    for (name <- Seq("chain8", "star8")) {
      val (_, escalated) = autoOf(name)
      assert(!escalated, s"$name must not escalate")
    }
  }

  test("escalation flags are deterministic") {
    val cq = JobCorpus.all.find(_.name == "tree9_sel").get
    val profiles = cq.graph.relations.map(n =>
      AliasedRels.profile(spark, sfDir, n, hist = true)).toVector
    val hist = StatsEstimator.cardinality(cq.graph, profiles, cq.filters)
    val vf = Vector.tabulate(cq.graph.n)(i =>
      AutoEstimator.parseFilter(cq.filters.lift(i).flatten, profiles(i)))
    val a = AutoEstimator.escalationFlags(spark, sfDir, cq.graph, vf, hist)
    val b = AutoEstimator.escalationFlags(spark, sfDir, cq.graph, vf, hist)
    assert(a == b && a.nonEmpty)
  }

  test("escalated estimator sees the empty intersection histograms cannot") {
    val cq = JobCorpus.all.find(_.name == "tree9_sel").get
    val (card, escalated) = autoOf("tree9_sel")
    assert(escalated)
    // customer+nation+events = vertices 2,3,8 (SampleEstimatorSpec's pin)
    val s = (1L << 2) | (1L << 3) | (1L << 8)
    assert(card(s) <= 2.0, s"auto must estimate ~1 here, got ${card(s)}")
  }
}
