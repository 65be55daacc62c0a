package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{ExecutionFeedback, PlannerQueries}

/** p24: the hands-free LEO loop. The QueryExecutionListener registered
  * by GraftExtensions harvests every successful execution when
  * spark.graft.feedback.auto is set — the dictionary it populates must
  * be IDENTICAL to an explicit harvest of the same plan, it must stay
  * empty when the gate is off, and stats=feedback planning must
  * actually consult it (a poisoned listener-harvested observation
  * moves the plan). */
class FeedbackListenerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.ReorderJoin")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.registerAll(spark, sfDir)
  }

  override def afterAll(): Unit = {
    ExecutionFeedback.clear()
    if (spark != null) spark.stop()
  }

  private def runFlagshipUnderHist(): Unit = {
    spark.conf.set("spark.graft.joinReorder.stats", "hist")
    try spark.sql(PlannerQueries.flagshipSqlText).collect()
    finally spark.conf.unset("spark.graft.joinReorder.stats")
  }

  test("listener-populated dictionary equals an explicit harvest's") {
    // explicit harvest (auto OFF — the p23 path)
    ExecutionFeedback.clear()
    spark.conf.set("spark.graft.joinReorder.stats", "hist")
    val df = try {
      val d = spark.sql(PlannerQueries.flagshipSqlText); d.collect(); d
    } finally spark.conf.unset("spark.graft.joinReorder.stats")
    ExecutionFeedback.harvest(df)
    val manual = ExecutionFeedback.all
    assert(manual.nonEmpty)

    // listener harvest (auto ON, no explicit call); brief drain so a
    // late delivery from the auto-off execution can't race the window
    Thread.sleep(300)
    ExecutionFeedback.clear()
    spark.conf.set("spark.graft.feedback.auto", "true")
    try {
      val before = FeedbackListener.harvestCount
      runFlagshipUnderHist()
      FeedbackListener.awaitHarvests(before)
    } finally spark.conf.unset("spark.graft.feedback.auto")
    val auto = ExecutionFeedback.all
    assert(auto == manual,
      s"listener dictionary diverged: auto=${auto.keySet} manual=${manual.keySet}")
  }

  test("gate off: no observations harvested") {
    ExecutionFeedback.clear()
    runFlagshipUnderHist()
    // delivery is async: give the bus a moment to drain, then assert
    Thread.sleep(500)
    assert(ExecutionFeedback.size == 0,
      s"harvested with the gate off: ${ExecutionFeedback.all.keySet}")
  }

  /** Optimized plan's join structure. */
  private def joinSignature(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      Set[Set[String]] = {
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
    plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.collectLeaves().flatMap(leafName).toSet
    }.toSet
  }

  test("feedback planning consults the LISTENER-harvested keys") {
    ExecutionFeedback.clear()
    spark.conf.set("spark.graft.feedback.auto", "true")
    try {
      val before = FeedbackListener.harvestCount
      runFlagshipUnderHist()
      FeedbackListener.awaitHarvests(before)
    } finally spark.conf.unset("spark.graft.feedback.auto")
    assert(ExecutionFeedback.size > 0)
    spark.conf.set("spark.graft.joinReorder.stats", "hist")
    val histSig = try joinSignature(
      spark.sql(PlannerQueries.flagshipSqlText).queryExecution.optimizedPlan)
    finally spark.conf.unset("spark.graft.joinReorder.stats")
    // poison a listener-harvested 2-leaf subset: if feedback planning
    // consults the listener's keys, the plan must move off histSig
    val pair = ExecutionFeedback.all.keys.find(k =>
      k.contains("||") && k.split("\\|\\|")(0).split("\\|").length == 2)
    assert(pair.isDefined, "listener exposed no 2-leaf subset")
    ExecutionFeedback.record(pair.get, 1e12)
    spark.conf.set("spark.graft.joinReorder.stats", "feedback")
    try {
      val fbSig = joinSignature(
        spark.sql(PlannerQueries.flagshipSqlText).queryExecution.optimizedPlan)
      assert(fbSig != histSig,
        s"poisoned listener key ${pair.get} did not move the plan")
    } finally spark.conf.unset("spark.graft.joinReorder.stats")
  }

  test("p24 gate body: hands-free loop returns the oracle's answer") {
    val auto = PlannerQueries.runAutoFeedbackSql(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val plain = spark.sql(PlannerQueries.flagshipSqlText)
      .collect().map(_.toSeq).toSeq
    assert(auto == plain)
    assert(ExecutionFeedback.size > 0, "the listener never harvested")
  }

  test("application-end persistence writes the configured path") {
    val path = "target/tmp/feedback_listener_end.json"
    new java.io.File(path).delete()
    val local = SparkSession.builder()
      .master("local[2]")
      .appName("feedback-end-spec")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .config("spark.graft.feedback.path", path)
      .getOrCreate()
    try {
      ExecutionFeedback.clear()
      ExecutionFeedback.record("t[]", 5.0)
      // building any query forces the optimizer (and the registration)
      local.sql("SELECT 1").collect()
    } finally local.stop()
    ExecutionFeedback.clear()
    assert(ExecutionFeedback.load(path) >= 1,
      "application end did not persist the dictionary")
    assert(ExecutionFeedback.lookup("t[]").contains(5.0))

    // ...and the durable loop closes: a NEW session with the same
    // path PRE-POPULATES the dictionary at registration — no explicit
    // load call (the reference's pg.json-between-runs shape)
    ExecutionFeedback.clear()
    val next = SparkSession.builder()
      .master("local[2]")
      .appName("feedback-load-spec")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .config("spark.graft.feedback.path", path)
      .getOrCreate()
    try {
      next.sql("SELECT 1").collect() // forces optimizer → registration
      assert(ExecutionFeedback.lookup("t[]").contains(5.0),
        "registration must pre-populate from the configured path")
    } finally next.stop()
    ExecutionFeedback.clear()
  }
}
