package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The LEO loop (p23): harvested observations are EXACT (they are the
  * executed plan's own metrics), the feedback cardinality serves them
  * with estimator fallback, and a changed observation moves the in-SQL
  * plan without ever changing answers. */
class ExecutionFeedbackSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  override def afterAll(): Unit = {
    ExecutionFeedback.clear()
    if (spark != null) spark.stop()
  }

  private def harvestFlagship(): Unit = {
    ExecutionFeedback.clear()
    spark.conf.set("spark.graft.joinReorder.stats", "hist")
    try {
      val df = spark.sql(PlannerQueries.flagshipSqlText)
      df.collect()
      assert(ExecutionFeedback.harvest(df) > 0, "harvest found nothing")
    } finally spark.conf.unset("spark.graft.joinReorder.stats")
  }

  test("harvested leaf and join observations equal directly-counted truth") {
    harvestFlagship()
    val obs = ExecutionFeedback.all
    // leaf: the filtered orders scan
    val ordersLeaf = obs.filter { case (k, _) =>
      k.contains("/orders@") && !k.contains("||") }
    assert(ordersLeaf.size == 1, s"orders leaf keys: ${ordersLeaf.keys}")
    val ordersTruth = spark.sql(
      "SELECT count(*) FROM orders WHERE o_orderstatus = 'F'")
      .collect()(0).getLong(0).toDouble
    assert(ordersLeaf.head._2 == ordersTruth)
    // subset: the full 5-way join (always observed — it's the root join)
    val full = obs.filter { case (k, _) =>
      k.contains("||") && k.split("\\|\\|")(0).split("\\|").length == 5 }
    assert(full.size == 1, s"full-subset keys: ${full.keys}")
    val joinTruth = spark.sql(
      """SELECT count(*) FROM region, nation, customer, orders, lineitem
         WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
           AND c_custkey = o_custkey AND o_orderkey = l_orderkey
           AND r_name = 'ASIA' AND o_orderstatus = 'F' AND l_quantity > 5""")
      .collect()(0).getLong(0).toDouble
    assert(full.head._2 == joinTruth,
      s"observed ${full.head._2} != counted $joinTruth")
  }

  test("FeedbackCardinality serves observations, falls back elsewhere") {
    ExecutionFeedback.clear()
    val g = QueryGraph(Vector("a", "b", "c"),
      Vector(JoinEdge(0, 1, Seq("x" -> "y")), JoinEdge(1, 2, Seq("y" -> "z"))))
    val leafKeys = Vector("a[]", "b[(f = 1)]", "c[]")
    val fallback = HeuristicCardinality.uniform(g, Array(10.0, 20.0, 30.0))
    val card = new ExecutionFeedback.FeedbackCardinality(g, leafKeys,
      Map((0, 1) -> Seq(ExecutionFeedback.edgeKey("x", "y")),
        (1, 2) -> Seq(ExecutionFeedback.edgeKey("y", "z"))), fallback)
    // nothing recorded: pure fallback
    assert(card(1L) == fallback(1L) && card(3L) == fallback(3L))
    // record a leaf and the {a,b} subset
    ExecutionFeedback.record("b[(f = 1)]", 7.0)
    ExecutionFeedback.record(ExecutionFeedback.subsetKey(
      Seq("a[]", "b[(f = 1)]"), Seq("x=y")), 123.0)
    assert(card(2L) == 7.0, "observed leaf must override")
    assert(card(3L) == 123.0, "observed subset must override")
    assert(card(6L) == fallback(6L), "unobserved subset stays estimated")
    assert(card.hits == 2)
  }

  /** Optimized plan's join structure (the GraftJoinReorderSpec helper). */
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

  test("a changed observation moves the in-SQL plan; answers never change") {
    harvestFlagship()
    spark.conf.set("spark.graft.joinReorder.stats", "hist")
    val histSig = try joinSignature(
      spark.sql(PlannerQueries.flagshipSqlText).queryExecution.optimizedPlan)
    finally spark.conf.unset("spark.graft.joinReorder.stats")
    // poison the hist tree's FIRST pair: any 2-leaf observed subset is
    // a pair the executed tree materialized; pricing it absurdly makes
    // every tree that avoids materializing that pair cheaper
    val pair = ExecutionFeedback.all.keys.find(k =>
      k.contains("||") && k.split("\\|\\|")(0).split("\\|").length == 2)
    assert(pair.isDefined, "executed tree exposed no 2-leaf subset")
    ExecutionFeedback.record(pair.get, 1e12)
    spark.conf.set("spark.graft.joinReorder.stats", "feedback")
    try {
      val qe = spark.sql(PlannerQueries.flagshipSqlText).queryExecution
      val fbSig = joinSignature(qe.optimizedPlan)
      assert(fbSig != histSig,
        s"poisoned pair ${pair.get} did not move the plan: $fbSig")
      val withFb = spark.sql(PlannerQueries.flagshipSqlText)
        .collect().map(_.toSeq).toSeq
      spark.conf.set("spark.graft.joinReorder.enabled", "false")
      val without = try spark.sql(PlannerQueries.flagshipSqlText)
        .collect().map(_.toSeq).toSeq
      finally spark.conf.set("spark.graft.joinReorder.enabled", "true")
      assert(withFb == without)
    } finally spark.conf.unset("spark.graft.joinReorder.stats")
  }

  test("save/load round-trips; live observations win over stale files") {
    ExecutionFeedback.clear()
    ExecutionFeedback.record("""t["weird \" key"]""", 42.0)
    ExecutionFeedback.record("a[]|b[]||x=y", 7.0)
    val path = "target/tmp/feedback_spec.json"
    ExecutionFeedback.save(path)
    ExecutionFeedback.clear()
    assert(ExecutionFeedback.load(path) == 2)
    assert(ExecutionFeedback.lookup("""t["weird \" key"]""").contains(42.0))
    assert(ExecutionFeedback.lookup("a[]|b[]||x=y").contains(7.0))
    // a fresher live value is not overwritten by a stale file
    ExecutionFeedback.record("a[]|b[]||x=y", 9.0)
    assert(ExecutionFeedback.load(path) == 0)
    assert(ExecutionFeedback.lookup("a[]|b[]||x=y").contains(9.0))
    ExecutionFeedback.clear()
  }

  test("format-version tag: untagged (pre-r16) and mismatched files " +
      "are rejected whole, loudly, not silently merged (VERDICT r15)") {
    ExecutionFeedback.clear()
    val dir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("target/tmp"))
    // an r14-era file: valid grammar, no version tag — its keys were
    // minted under a different epoch scheme and can never match
    val legacy = dir.resolve("feedback_legacy_spec.json")
    java.nio.file.Files.writeString(legacy,
      """{"lineitem[]||l_ok=o_ok":1234.0}""")
    assert(ExecutionFeedback.load(legacy.toString) == 0)
    assert(ExecutionFeedback.size == 0, "legacy keys must not merge")
    // a future-format file is rejected the same way
    val future = dir.resolve("feedback_future_spec.json")
    java.nio.file.Files.writeString(future,
      s"""{"__graft_feedback_format":${ExecutionFeedback.FormatVersion + 1},"k":1.0}""")
    assert(ExecutionFeedback.load(future.toString) == 0)
    assert(ExecutionFeedback.size == 0)
    // a fresh save carries the tag and round-trips; the tag itself
    // never lands in the dictionary
    ExecutionFeedback.record("t@abc[x=1]", 5.0)
    val fresh = dir.resolve("feedback_tagged_spec.json")
    ExecutionFeedback.save(fresh.toString)
    val text = java.nio.file.Files.readString(fresh)
    assert(text.contains(
      s""""__graft_feedback_format":${ExecutionFeedback.FormatVersion}"""))
    ExecutionFeedback.clear()
    assert(ExecutionFeedback.load(fresh.toString) == 1)
    assert(ExecutionFeedback.lookup("t@abc[x=1]").contains(5.0))
    assert(ExecutionFeedback.lookup("__graft_feedback_format").isEmpty)
    ExecutionFeedback.clear()
  }

  test("repeated-table scans harvest DISTINCT leaf keys by filter") {
    ExecutionFeedback.clear()
    spark.conf.set("spark.graft.joinReorder.stats", "hist")
    try {
      val df = spark.sql(PlannerQueries.repeatSql) // events × 2 filters
      df.collect()
      ExecutionFeedback.harvest(df)
      val eventLeaves = ExecutionFeedback.all.keys.filter(k =>
        k.contains("/events@") && !k.contains("||"))
      assert(eventLeaves.size == 2,
        s"two filtered events scans must harvest two keys: $eventLeaves")
      assert(eventLeaves.exists(_.contains("purchase")) &&
        eventLeaves.exists(_.contains("error")))
    } finally spark.conf.unset("spark.graft.joinReorder.stats")
  }

  test("a filter above an aggregate records NO leaf observation") {
    ExecutionFeedback.clear()
    val df = spark.sql(
      """SELECT * FROM (SELECT o_custkey, count(*) AS c FROM orders
         GROUP BY o_custkey) WHERE c > 2""")
    df.collect()
    ExecutionFeedback.harvest(df)
    // the post-aggregate filter's output metric is not a scan-filter
    // cardinality: only the BARE orders scan may be observed
    val ordersKeys = ExecutionFeedback.all.keys.filter(_.contains("/orders@"))
    assert(ordersKeys.forall(_.endsWith("[]")),
      s"post-agg filter leaked a leaf observation: $ordersKeys")
    ordersKeys.headOption.flatMap(ExecutionFeedback.lookup).foreach { v =>
      val truth = spark.table("orders").count().toDouble
      assert(v == truth)
    }
  }

  test("identically-named join columns qualify by leaf: edges stay distinct") {
    ExecutionFeedback.clear()
    val df = spark.sql(PlannerQueries.repeatSql) // c_custkey=user_id TWICE
    df.collect()
    ExecutionFeedback.harvest(df)
    val full = ExecutionFeedback.all.keys.find(k =>
      k.contains("||") && k.split("\\|\\|")(0).split("\\|").length == 4)
    assert(full.isDefined, "4-leaf subset not harvested")
    val edgePart = full.get.split("\\|\\|")(1)
    val userIdEdges = edgePart.split(",").filter(_.contains("user_id"))
    assert(userIdEdges.length == 2 && userIdEdges.distinct.length == 2,
      s"the two user_id edges must stay distinct under leaf " +
        s"qualification: $edgePart")
    assert(userIdEdges.exists(_.contains("purchase")) &&
      userIdEdges.exists(_.contains("error")))
  }

  test("an outer join's metric is never recorded as an inner subset") {
    ExecutionFeedback.clear()
    val df = spark.sql(
      """SELECT count(*) AS cnt FROM nation LEFT JOIN customer
         ON n_nationkey = c_nationkey""")
    df.collect()
    ExecutionFeedback.harvest(df)
    val subsets = ExecutionFeedback.all.keys.filter(_.contains("||"))
    assert(subsets.isEmpty,
      s"outer-join output must not pose as an inner subset: $subsets")
  }

  test("re-planning under feedback reaches a structure fixpoint") {
    harvestFlagship()
    spark.conf.set("spark.graft.joinReorder.stats", "feedback")
    try {
      def sig() = joinSignature(
        spark.sql(PlannerQueries.flagshipSqlText).queryExecution.optimizedPlan)
      val s1 = sig()
      // execute the feedback-planned tree and harvest ITS subsets too
      val df = spark.sql(PlannerQueries.flagshipSqlText)
      df.collect()
      ExecutionFeedback.harvest(df)
      assert(sig() == s1,
        "a second harvest of the chosen tree must not move the plan")
    } finally spark.conf.unset("spark.graft.joinReorder.stats")
  }

  test("cross-catalog isolation: sf0.001 observations never move an sf0.01 plan") {
    // keys carry the scan's FULL path, so a second catalog sharing
    // table NAMES must miss every observation — poisoning an sf0.001
    // subset cannot move the sf0.01 plan (the same poison DOES move
    // the sf0.001 plan, proven above)
    harvestFlagship()
    assert(ExecutionFeedback.all.keySet.forall(_.contains("sf0.001")))
    val pair = ExecutionFeedback.all.keys.find(k =>
      k.contains("||") && k.split("\\|\\|")(0).split("\\|").length == 2)
    assert(pair.isDefined)
    ExecutionFeedback.record(pair.get, 1e12)
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.01")
    try {
      spark.conf.set("spark.graft.joinReorder.stats", "hist")
      val histSig = joinSignature(
        spark.sql(PlannerQueries.flagshipSqlText).queryExecution.optimizedPlan)
      spark.conf.set("spark.graft.joinReorder.stats", "feedback")
      val fbSig = joinSignature(
        spark.sql(PlannerQueries.flagshipSqlText).queryExecution.optimizedPlan)
      assert(fbSig == histSig,
        "another catalog's poisoned observation leaked into this plan")
    } finally {
      spark.conf.unset("spark.graft.joinReorder.stats")
      graft.sources.Tables.registerAll(spark, sfDir)
      ExecutionFeedback.clear()
    }
  }

  test("p23 gate body: harvest + re-plan returns the oracle's answer") {
    ExecutionFeedback.clear()
    val fb = PlannerQueries.runFeedbackSql(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val plain = spark.sql(PlannerQueries.flagshipSqlText)
      .collect().map(_.toSeq).toSeq
    assert(fb == plain)
    assert(ExecutionFeedback.size > 0)
  }
}
