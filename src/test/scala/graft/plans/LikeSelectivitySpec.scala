package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** p25: LIKE predicates priced from the amortized full-width synopsis
  * instead of the 1/3 default — the pattern grammar round-trips
  * (string + Catalyst incl. the LikeSimplification rewrites), the
  * synopsis fraction matches ground truth, pricing FLIPS the chosen
  * join order on the gate query, and answers never change. */
class LikeSelectivitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.ReorderJoin")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.registerAll(spark, sfDir)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("likeRegex: anchored, %/_ wildcards, regex metachars literal") {
    assert(AutoEstimator.likeRegex("large%").matcher("large rod").matches())
    assert(!AutoEstimator.likeRegex("large%").matcher("xlarge rod").matches())
    assert(AutoEstimator.likeRegex("%bolt").matcher("small bolt").matches())
    assert(AutoEstimator.likeRegex("b_lt").matcher("bolt").matches())
    assert(!AutoEstimator.likeRegex("b_lt").matcher("boolt").matches())
    // regex metacharacters in the pattern are literal text
    assert(AutoEstimator.likeRegex("a.c%").matcher("a.cd").matches())
    assert(!AutoEstimator.likeRegex("a.c%").matcher("abcd").matches())
  }

  test("parsePred and eval handle LIKE / NOT LIKE strings") {
    val p = AutoEstimator.parsePred("p_name LIKE 'large%'")
    assert(p.contains(AutoEstimator.Pred("p_name", "like", Some("large%"), None)))
    val np = AutoEstimator.parsePred("p_name NOT LIKE 'large%'")
    assert(np.exists(_.op == "notlike"))
    val row = Map[String, Any]("p_name" -> "large bolt")
    assert(AutoEstimator.eval(row, p.get))
    assert(!AutoEstimator.eval(row, np.get))
    // nulls match neither form
    val nullRow = Map[String, Any]("p_name" -> null)
    assert(!AutoEstimator.eval(nullRow, p.get))
    assert(!AutoEstimator.eval(nullRow, np.get))
  }

  test("likeShape sees Like AND the LikeSimplification rewrites") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.StringType
    val a = AttributeReference("c", StringType)()
    def lit(s: String) = Literal.create(s, StringType)
    assert(AutoEstimator.likeShape(Like(a, lit("x%y"), '\\'))
      .contains(("c", "x%y", false)))
    assert(AutoEstimator.likeShape(Not(Like(a, lit("x"), '\\')))
      .contains(("c", "x", true)))
    assert(AutoEstimator.likeShape(StartsWith(a, lit("ab")))
      .contains(("c", "ab%", false)))
    assert(AutoEstimator.likeShape(EndsWith(a, lit("ab")))
      .contains(("c", "%ab", false)))
    assert(AutoEstimator.likeShape(Contains(a, lit("ab")))
      .contains(("c", "%ab%", false)))
    assert(AutoEstimator.likeShape(Not(Contains(a, lit("ab"))))
      .contains(("c", "%ab%", true)))
  }

  test("synopsis pricing matches ground truth (cap covers the table)") {
    val truth = spark.sql(
      "SELECT count(*) FROM part WHERE p_name LIKE 'large%'")
      .collect()(0).getLong(0).toDouble /
      spark.table("part").count().toDouble
    val est = AutoEstimator.likeSelectivity(
      spark, sfDir, "part", "p_name", "large%", negate = false)
    assert(est.isDefined)
    // 200-row table under a 2,000-row cap: the synopsis IS the table
    assert(math.abs(est.get - truth) < 1e-9,
      s"synopsis ${est.get} != truth $truth")
    val neg = AutoEstimator.likeSelectivity(
      spark, sfDir, "part", "p_name", "large%", negate = true)
    assert(math.abs(neg.get - (1.0 - truth)) < 1e-9)
  }

  /** Optimized plan's join structure. */
  private def joinSignature(sql: String): Set[Set[String]] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def leafName(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
        Option[String] = p match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.headOption.map { r =>
            val s = r.toString
            s.substring(s.lastIndexOf('/') + 1).stripSuffix(".parquet")
          }
        case _ => None
      }
      case _ => None
    }
    spark.sql(sql).queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.collectLeaves().flatMap(leafName).toSet
    }.toSet
  }

  test("pricing the LIKE flips the chosen join order; answers unchanged") {
    spark.conf.set("spark.graft.joinReorder.stats", "hist")
    try {
      val priced = joinSignature(PlannerQueries.likeSql)
      spark.conf.set("spark.graft.joinReorder.likeSel", "false")
      val defaulted = try joinSignature(PlannerQueries.likeSql)
      finally spark.conf.unset("spark.graft.joinReorder.likeSel")
      assert(priced != defaulted,
        s"synopsis-priced LIKE did not move the plan: $priced")
      // the priced plan joins the (truly small) filtered part side
      // before the full 4-way — part appears in a 2-relation join
      assert(priced.exists(s => s.size == 2 && s.contains("part")),
        s"priced plan should join part early: $priced")
      val withSel = spark.sql(PlannerQueries.likeSql)
        .collect().map(_.toSeq).toSeq
      spark.conf.set("spark.graft.joinReorder.enabled", "false")
      val direct = try spark.sql(PlannerQueries.likeSql)
        .collect().map(_.toSeq).toSeq
      finally spark.conf.set("spark.graft.joinReorder.enabled", "true")
      assert(withSel == direct)
    } finally spark.conf.unset("spark.graft.joinReorder.stats")
  }

  test("p25 gate body returns the oracle's answer") {
    val got = PlannerQueries.runLikeSql(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.joinReorder.enabled", "false")
    val direct = try spark.sql(PlannerQueries.likeSql)
      .collect().map(_.toSeq).toSeq
    finally spark.conf.set("spark.graft.joinReorder.enabled", "true")
    assert(got == direct && got.nonEmpty)
  }
}
