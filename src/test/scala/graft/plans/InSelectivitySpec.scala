package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** p27: IN-lists and OR-disjunctions priced from the amortized
  * full-width synopsis instead of the 1/3 default — completing the
  * reference's JOB predicate grammar (=, ranges, LIKE, IN, BETWEEN,
  * OR — MyUtils.java:152-180) in the estimator. The grammar
  * round-trips (string + Catalyst In/InSet/Or), BETWEEN splits into
  * its two ladder-priced range conjuncts, the synopsis fraction
  * matches ground truth, pricing FLIPS the chosen join order on the
  * gate query, and answers never change. Also pins the r14 ADVICE
  * items on the LIKE machinery this generalizes: escape-char
  * handling and the bounded pattern memo. */
class InSelectivitySpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("parsePred and eval handle IN / NOT IN string and numeric lists") {
    val p = AutoEstimator.parsePred("p_brand IN ('Brand#4', 'Brand#19')")
    assert(p.exists(x => x.op == "in" &&
      x.strs == Seq("Brand#4", "Brand#19")))
    val np = AutoEstimator.parsePred("p_brand NOT IN ('Brand#4')")
    assert(np.exists(_.op == "notin"))
    val nums = AutoEstimator.parsePred("p_size IN (1, 2, 3)")
    assert(nums.exists(x => x.op == "in" && x.nums == Seq(1.0, 2.0, 3.0)))
    val row = Map[String, Any]("p_brand" -> "Brand#4", "p_size" -> 2)
    assert(AutoEstimator.eval(row, p.get))
    assert(!AutoEstimator.eval(row, np.get))
    assert(AutoEstimator.eval(row, nums.get))
    // nulls match neither IN nor NOT IN
    val nullRow = Map[String, Any]("p_brand" -> null)
    assert(!AutoEstimator.eval(nullRow, p.get))
    assert(!AutoEstimator.eval(nullRow, np.get))
  }

  test("splitConjuncts rewrites BETWEEN into its two range conjuncts") {
    val cs = AutoEstimator.splitConjuncts(
      "l_quantity BETWEEN 10 AND 20 AND o_orderstatus = 'F'")
    assert(cs == Seq("l_quantity >= 10", "l_quantity <= 20",
      "o_orderstatus = 'F'"))
    // both halves parse and evaluate
    val ps = cs.take(2).flatMap(AutoEstimator.parsePred)
    assert(ps.size == 2)
    val in = Map[String, Any]("l_quantity" -> 15.0)
    val out = Map[String, Any]("l_quantity" -> 25.0)
    assert(ps.forall(AutoEstimator.eval(in, _)))
    assert(!ps.forall(AutoEstimator.eval(out, _)))
  }

  test("BETWEEN entangled with OR falls to residual, not a torn " +
      "stitch (ADVICE r15)") {
    // the old stitch turned `a BETWEEN 1 AND 2 OR b = 3` into
    // `a >= 1` AND `a <= 2 OR b = 3` — dropping `OR b = 3` from the
    // first conjunct, an over-tight estimate. Now the torn halves
    // re-join into ONE conjunct that parseClause rejects (falls to
    // the residual heuristic); estimates never change answers either
    // way, but the clause must not price tighter than its semantics.
    val cs = AutoEstimator.splitConjuncts(
      "l_quantity BETWEEN 10 AND 20 OR o_orderstatus = 'F'")
    assert(cs == Seq("l_quantity BETWEEN 10 AND 20 OR o_orderstatus = 'F'"))
    assert(AutoEstimator.parseClause(cs.head).isEmpty)
    // OR on the BETWEEN's own side also refuses the stitch
    val cs2 = AutoEstimator.splitConjuncts(
      "o_orderstatus = 'F' OR l_quantity BETWEEN 10 AND 20")
    assert(cs2.size == 1 && AutoEstimator.parseClause(cs2.head).isEmpty)
    // and a clean BETWEEN beside an OR-conjunct still stitches
    val cs3 = AutoEstimator.splitConjuncts(
      "l_quantity BETWEEN 10 AND 20 AND (a = 1 OR b = 2)")
    assert(cs3.take(2) == Seq("l_quantity >= 10", "l_quantity <= 20"))
  }

  test("quoted literals are not torn at embedded AND/OR (ADVICE r15)") {
    val cs = AutoEstimator.splitConjuncts(
      "title LIKE '%black and white%' AND n_chars > 10")
    assert(cs == Seq("title LIKE '%black and white%'", "n_chars > 10"))
    val c = AutoEstimator.parseClause("lang = 'this or that'")
    assert(c.exists(_.alts.size == 1))
    assert(AutoEstimator.eval(
      Map[String, Any]("lang" -> "this or that"), c.get))
  }

  test("parseClause handles OR-disjunctions; unevaluable alt rejects") {
    val c = AutoEstimator.parseClause(
      "p_brand = 'Brand#4' OR p_size > 40")
    assert(c.exists(_.alts.size == 2))
    assert(AutoEstimator.eval(Map[String, Any]("p_brand" -> "x",
      "p_size" -> 45.0), c.get))
    assert(!AutoEstimator.eval(Map[String, Any]("p_brand" -> "x",
      "p_size" -> 5.0), c.get))
    // a disjunct outside the grammar poisons the whole clause
    assert(AutoEstimator.parseClause(
      "p_brand = 'Brand#4' OR p_name ~ 'rod'").isEmpty)
  }

  test("Catalyst convClause sees In, InSet, Not(In), and Or-of-atomics") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.StringType
    val a = AttributeReference("c", StringType)()
    def lit(s: String) = Literal.create(s, StringType)
    val in = In(a, Seq(lit("x"), lit("y")))
    assert(AutoEstimator.convClause(in).flatten.exists(
      _.alts.head.strs == Seq("x", "y")))
    assert(AutoEstimator.convClause(Not(in)).flatten.exists(
      _.alts.head.op == "notin"))
    val inset = InSet(a, Set[Any](
      org.apache.spark.unsafe.types.UTF8String.fromString("x"),
      org.apache.spark.unsafe.types.UTF8String.fromString("y")))
    assert(AutoEstimator.convClause(inset).flatten.exists(
      _.alts.head.strs.sorted == Seq("x", "y")))
    val or = Or(EqualTo(a, lit("x")), StartsWith(a, lit("pre")))
    assert(AutoEstimator.convClause(or).flatten.exists(_.alts.size == 2))
    // Or with an unevaluable disjunct → None (residual pricing)
    val bad = Or(EqualTo(a, lit("x")), IsNull(a))
    assert(AutoEstimator.convClause(bad).isEmpty)
  }

  test("likeRegex honors the escape character (ADVICE r14)") {
    // '\%' is a literal percent, not a wildcard
    val re = AutoEstimator.likeRegex("100\\%")
    assert(re.matcher("100%").matches())
    assert(!re.matcher("100x").matches())
    // escaped underscore and escaped escape
    assert(AutoEstimator.likeRegex("a\\_b").matcher("a_b").matches())
    assert(!AutoEstimator.likeRegex("a\\_b").matcher("axb").matches())
    assert(AutoEstimator.likeRegex("a\\\\%").matcher("a\\xyz").matches())
    // a custom escape char normalizes through likeShape
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.StringType
    val a = AttributeReference("c", StringType)()
    val shaped = AutoEstimator.likeShape(
      Like(a, Literal.create("100#%", StringType), '#'))
    assert(shaped.contains(("c", "100\\%", false)))
    // reconstructed StartsWith fragments escape literal wildcards
    val sw = AutoEstimator.likeShape(
      StartsWith(a, Literal.create("50%", StringType)))
    assert(sw.contains(("c", "50\\%%", false)))
    assert(AutoEstimator.likeRegex(sw.get._2).matcher("50% off").matches())
    assert(!AutoEstimator.likeRegex(sw.get._2).matcher("505 off").matches())
  }

  test("synopsis pricing matches ground truth (cap covers the table)") {
    val truth = spark.sql(
      "SELECT count(*) FROM part WHERE p_brand IN ('Brand#4','Brand#19')")
      .collect()(0).getLong(0).toDouble /
      spark.table("part").count().toDouble
    val clause = AutoEstimator.parseClause(
      "p_brand IN ('Brand#4','Brand#19')").get
    val est = AutoEstimator.clauseSelectivity(spark, sfDir, "part", clause)
    assert(est.isDefined)
    assert(math.abs(est.get - truth) < 1e-9,
      s"synopsis ${est.get} != truth $truth")
    // the OR spelling prices identically (row-wise, same rows)
    val orClause = AutoEstimator.parseClause(
      "p_brand = 'Brand#4' OR p_brand = 'Brand#19'").get
    val orEst = AutoEstimator.clauseSelectivity(spark, sfDir, "part", orClause)
    assert(orEst == est)
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

  test("pricing the IN flips the chosen join order; answers unchanged") {
    spark.conf.set("spark.graft.joinReorder.stats", "hist")
    try {
      val priced = joinSignature(PlannerQueries.inSql)
      spark.conf.set("spark.graft.joinReorder.inSel", "false")
      val defaulted = try joinSignature(PlannerQueries.inSql)
      finally spark.conf.unset("spark.graft.joinReorder.inSel")
      assert(priced != defaulted,
        s"synopsis-priced IN did not move the plan: $priced")
      // the priced plan joins the (truly small) filtered part side
      // before the full 4-way — part appears in a 2-relation join
      assert(priced.exists(s => s.size == 2 && s.contains("part")),
        s"priced plan should join part early: $priced")
      val withSel = spark.sql(PlannerQueries.inSql)
        .collect().map(_.toSeq).toSeq
      spark.conf.set("spark.graft.joinReorder.enabled", "false")
      val direct = try spark.sql(PlannerQueries.inSql)
        .collect().map(_.toSeq).toSeq
      finally spark.conf.set("spark.graft.joinReorder.enabled", "true")
      assert(withSel == direct)
    } finally spark.conf.unset("spark.graft.joinReorder.stats")
  }

  test("p27 gate body returns the oracle's answer") {
    val got = PlannerQueries.runInSql(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.joinReorder.enabled", "false")
    val direct = try spark.sql(PlannerQueries.inSql)
      .collect().map(_.toSeq).toSeq
    finally spark.conf.set("spark.graft.joinReorder.enabled", "true")
    assert(got == direct && got.nonEmpty)
  }
}
