package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule must (a) fire on multiway inner joins,
  * (b) preserve results exactly, (c) stay out of the way when disabled. */
class GraftJoinReorderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  private val flagshipSql =
    """SELECT min(o_totalprice) AS min_total, count(*) AS cnt
       FROM region, nation, customer, orders, lineitem
       WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
         AND c_custkey = o_custkey AND o_orderkey = l_orderkey
         AND r_name = 'ASIA' AND l_quantity > 5"""

  override def beforeAll(): Unit = {
    // a session from another suite (without our extensions) would be
    // silently returned by getOrCreate — make sure none is live
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      // take Spark's own join reordering out of the picture so the test
      // observes OUR rule's effect in isolation
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.ReorderJoin")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.registerAll(spark, sfDir)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // written in a deliberately bad FROM order: lineitem × region first has
  // no join condition — without reordering that's a cross product
  private val badOrderSql =
    """SELECT count(*) AS cnt
       FROM lineitem, region, nation, customer, orders
       WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
         AND c_custkey = o_custkey AND o_orderkey = l_orderkey"""

  private def crossJoins(sql: String): Int =
    spark.sql(sql).queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.isEmpty => j
    }.size

  test("p17: the rule reorders the 11-relation JOB snowflake in-SQL") {
    // the p17 gate proves result correctness; this pins that the rule
    // actually FIRED at 11 relations: written fact-first, the naive
    // syntactic order joins lineitem to region with no condition —
    // a cross product unless OUR rule (Spark's ReorderJoin excluded
    // above) rebuilds the join graph
    val sql =
      """SELECT count(*) AS cnt
         FROM lineitem, region, nation, customer, orders, part,
              documents, supplier, events, embeddings, nation_2
         WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND l_partkey = p_partkey AND p_partkey = doc_id
           AND l_suppkey = s_suppkey AND c_custkey = user_id
           AND doc_id = vec_id AND s_nationkey = n_nationkey_a2"""
    AliasedRels.load(spark, sfDir, "nation@2")
      .createOrReplaceTempView("nation_2")
    assert(crossJoins(sql) == 0, "11-relation reorder must connect joins")
    // and the reordered plan still answers exactly (vs rule disabled)
    val on = spark.sql(sql).collect().head.getLong(0)
    spark.conf.set("spark.graft.joinReorder.enabled", "false")
    try {
      assert(crossJoins(sql) > 0, "fixture must be cross-joined naively")
      assert(spark.sql(sql).collect().head.getLong(0) == on)
    }
    finally spark.conf.set("spark.graft.joinReorder.enabled", "true")
    assert(on > 0)
  }

  test("rule fires: bad FROM order loses its cross product (Spark's ReorderJoin excluded)") {
    assert(crossJoins(badOrderSql) == 0,
      "graft reorder should connect all joins")
    spark.conf.set("spark.graft.joinReorder.enabled", "false")
    try assert(crossJoins(badOrderSql) > 0,
      "with graft reorder off, the bad order must keep a cross join " +
        "(otherwise this test proves nothing)")
    finally spark.conf.set("spark.graft.joinReorder.enabled", "true")
  }

  test("results identical with and without reordering") {
    val with_ = spark.sql(flagshipSql).collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.joinReorder.enabled", "false")
    try {
      val without = spark.sql(flagshipSql).collect().map(_.toSeq).toSeq
      assert(with_ == without)
    } finally spark.conf.set("spark.graft.joinReorder.enabled", "true")
  }

  test("extension functions are registered through spark.sql.extensions path") {
    val r = spark.sql("SELECT graft_cosine(array(1D, 1D), array(1D, 1D))")
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("two-relation joins are left untouched") {
    val plan = spark.sql(
      """SELECT count(*) FROM customer JOIN orders ON c_custkey = o_custkey""")
      .queryExecution.optimizedPlan
    val tagged = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.getTagValue(GraftJoinReorder.REORDERED).contains(true) => j
    }
    assert(tagged.isEmpty)
  }

  test("leaf statistics prefer rowCount over sizeInBytes") {
    // Range supplies rowCount (1000) even without CBO; its sizeInBytes is
    // 8x that — a bytes-based proxy would inflate narrow tables 8x and
    // wide tables far more, skewing the PK-FK selectivity denominator
    val r = spark.range(1000).queryExecution.optimizedPlan
    assert(GraftJoinReorder.leafRows(r) == 1000.0)
    assert(r.stats.sizeInBytes.toDouble > 1000.0)
    // a bare parquet scan carries no rowCount -> sizeInBytes fallback
    val scan = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "nation")
      .queryExecution.optimizedPlan
    if (scan.stats.rowCount.isEmpty)
      assert(GraftJoinReorder.leafRows(scan) == scan.stats.sizeInBytes.toDouble)
  }

  // the full flagship predicate set (p10's), written in an adversarial
  // FROM order — big tables first, the order a naive left-deep
  // execution would be worst at
  private val adversarialFlagshipSql =
    """SELECT min(o_totalprice) AS min_total, count(*) AS cnt
       FROM lineitem, orders, customer, nation, region
       WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
         AND c_custkey = o_custkey AND o_orderkey = l_orderkey
         AND r_name = 'ASIA' AND o_orderstatus = 'F' AND l_quantity > 5"""

  /** The optimized plan's join structure as a set of per-join leaf-name
    * sets — invariant to build/probe swaps, so "same join order" means
    * the same sequence of intermediate results. */
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

  test("measured stats mode plans arbitrary SQL with p10's join order") {
    // p10's choice: DPccp over the measured-profile Selinger estimator
    val (g, filters) = PlannerQueries.flagshipGraph
    val profiles = g.relations.map(n =>
      StatsEstimator.profileTable(spark, sfDir, n)).toVector
    val card = StatsEstimator.cardinality(g, profiles, filters)
    val planned = Enumerators.DPccp.plan(g, card, CostModel.Cout)
    def treeSig(t: JoinTree): Set[Set[String]] = t match {
      case Leaf(_) => Set.empty
      case n @ Node(l, r) =>
        def names(s: Long): Set[String] =
          (0 until g.n).filter(i => ((s >> i) & 1L) == 1L)
            .map(g.relations).toSet
        treeSig(l) ++ treeSig(r) + names(n.set)
    }
    val expected = treeSig(planned.tree)

    spark.conf.set("spark.graft.joinReorder.stats", "measured")
    try {
      val qe = spark.sql(adversarialFlagshipSql).queryExecution
      val got = joinSignature(qe.optimizedPlan)
      assert(got == expected,
        s"in-optimizer order $got != p10's DPccp order $expected")
      // and the measured-mode plan must produce the identical result
      val measured = qe.toRdd // force nothing; compare via fresh runs
      val withStats = spark.sql(adversarialFlagshipSql)
        .collect().map(_.toSeq).toSeq
      spark.conf.set("spark.graft.joinReorder.enabled", "false")
      val without = try spark.sql(adversarialFlagshipSql)
        .collect().map(_.toSeq).toSeq
      finally spark.conf.set("spark.graft.joinReorder.enabled", "true")
      assert(withStats == without)
    } finally spark.conf.unset("spark.graft.joinReorder.stats")
  }

  test("past maxDpRelations the GOO fallback still reorders (13 relations)") {
    // tree13's shape as SQL: 13 relations > maxDpRelations = 12, so
    // the rule routes to Enumerators.Bushy (the measured-best cheap
    // fallback) instead of DPccp; written fact-first the naive order
    // cross-joins, so a connected plan proves the fallback fired
    Seq("nation@2", "region@2", "documents@2").foreach { r =>
      AliasedRels.load(spark, sfDir, r)
        .createOrReplaceTempView(r.replace('@', '_'))
    }
    val sql =
      """SELECT count(*) AS cnt
         FROM lineitem, region, nation, customer, orders, part,
              documents, supplier, events, embeddings, nation_2,
              region_2, documents_2
         WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND l_partkey = p_partkey AND p_partkey = doc_id
           AND l_suppkey = s_suppkey AND c_custkey = user_id
           AND doc_id = vec_id AND s_nationkey = n_nationkey_a2
           AND n_regionkey_a2 = r_regionkey_a2
           AND p_partkey = doc_id_a2"""
    assert(crossJoins(sql) == 0, "13-relation GOO reorder must connect joins")
    val on = spark.sql(sql).collect().head.getLong(0)
    spark.conf.set("spark.graft.joinReorder.enabled", "false")
    try {
      assert(crossJoins(sql) > 0, "fixture must be cross-joined naively")
      assert(spark.sql(sql).collect().head.getLong(0) == on)
    } finally spark.conf.set("spark.graft.joinReorder.enabled", "true")
  }

  test("hist, sample, and auto stats modes answer identically and reorder") {
    val plain = spark.sql(flagshipSql).collect().map(_.toSeq).toSeq
    Seq("hist", "sample", "auto").foreach { mode =>
      spark.conf.set("spark.graft.joinReorder.stats", mode)
      try {
        assert(crossJoins(badOrderSql) == 0,
          s"$mode mode must still connect the bad-order join graph")
        val got = spark.sql(flagshipSql).collect().map(_.toSeq).toSeq
        assert(got == plain, s"$mode mode changed answers")
      } finally spark.conf.unset("spark.graft.joinReorder.stats")
    }
  }

  test("sample mode plans repeated-table SQL from synopses, answers exactly") {
    // two lineitem scans used to force a fallback to plan stats (key
    // columns collided in the synopsis join); SampleEstimator now
    // keys values by (vertex, column), so the self-join plans from
    // synopses — and must still answer exactly
    val sql =
      """SELECT count(*) AS c
         FROM lineitem a, lineitem b, orders
         WHERE a.l_orderkey = b.l_orderkey
           AND b.l_orderkey = o_orderkey AND a.l_quantity > 45
           AND b.l_quantity > 45"""
    spark.conf.set("spark.graft.joinReorder.stats", "sample")
    try {
      val cnt = spark.sql(sql).collect().head.getLong(0)
      spark.conf.unset("spark.graft.joinReorder.stats")
      val expect = spark.sql(sql).collect().head.getLong(0)
      assert(cnt == expect)
    } finally spark.conf.unset("spark.graft.joinReorder.stats")
  }

  /** [[joinSignature]] with MULTIPLICITY: per-join member lists keep
    * repeated leaf names (a repeated-table tree's members would
    * collapse in a Set). */
  private def joinSignatureMulti(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      Vector[List[String]] = {
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
        j.collectLeaves().flatMap(leafName).sorted.toList
    }.toVector.sortBy(_.mkString(","))
  }

  test("p21: repeated-table SQL under stats=sample picks the DataFrame-path DPccp structure") {
    // plan p21's aliased twin graph directly (DPccp over the sample-
    // synopsis estimator) — the in-SQL rule must choose the same join
    // structure for the same query, repeated table and all
    val (g, filters) = PlannerQueries.repeatGraph
    val profiles = g.relations.map(n =>
      AliasedRels.profile(spark, sfDir, n)).toVector
    val card = SampleEstimator.cardinality(spark, sfDir, g, filters, profiles)
    val planned = Enumerators.DPccp.plan(g, card, CostModel.Cout)
    def treeSig(t: JoinTree): Vector[List[String]] = t match {
      case Leaf(_) => Vector.empty
      case n @ Node(l, r) =>
        def names(s: Long): List[String] =
          (0 until g.n).filter(i => ((s >> i) & 1L) == 1L)
            .map(i => AliasedRels.baseOf(g.relations(i))).sorted.toList
        treeSig(l) ++ treeSig(r) :+ names(n.set)
    }
    val expected = treeSig(planned.tree).sortBy(_.mkString(","))
    spark.conf.set("spark.graft.joinReorder.stats", "sample")
    try {
      val qe = spark.sql(PlannerQueries.repeatSql).queryExecution
      val got = joinSignatureMulti(qe.optimizedPlan)
      assert(got == expected,
        s"in-SQL repeated-table order $got != DataFrame-path DPccp $expected")
      val withStats = spark.sql(PlannerQueries.repeatSql)
        .collect().map(_.toSeq).toSeq
      spark.conf.set("spark.graft.joinReorder.enabled", "false")
      val without = try spark.sql(PlannerQueries.repeatSql)
        .collect().map(_.toSeq).toSeq
      finally spark.conf.set("spark.graft.joinReorder.enabled", "true")
      assert(withStats == without)
    } finally spark.conf.unset("spark.graft.joinReorder.stats")
  }

  test("broadcast hints: ladder estimates force BHJ where plan-stats sizes sort-merge") {
    // threshold 500 B sits BETWEEN the filtered region side's
    // estimated bytes (1 row × ~190 B/row measured width after the
    // r_name = 'ASIA' filter) and every leaf's plan-stats sizeInBytes
    // (the PRUNED region scan still sizes ~940 B; non-CBO Filter stats
    // pass the child size through) — so without the hint nothing
    // broadcasts statically, and with it the region join becomes a BHJ
    val prevTh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "500")
    spark.conf.set("spark.graft.joinReorder.stats", "measured")
    try {
      def bhjCount() = spark.sql(adversarialFlagshipSql).queryExecution
        .sparkPlan.toString.sliding("BroadcastHashJoin".length)
        .count(_ == "BroadcastHashJoin")
      val hinted = bhjCount()
      assert(hinted > 0, "estimate-backed hint must produce a static BHJ")
      val withHints = spark.sql(adversarialFlagshipSql)
        .collect().map(_.toSeq).toSeq
      spark.conf.set("spark.graft.joinReorder.broadcastHints", "false")
      assert(bhjCount() == 0,
        "without hints, plan-stats sizes must pick SMJ at this threshold " +
          "(otherwise this test proves nothing)")
      val without = spark.sql(adversarialFlagshipSql)
        .collect().map(_.toSeq).toSeq
      assert(withHints == without, "hints may steer physics, never answers")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevTh)
      spark.conf.unset("spark.graft.joinReorder.stats")
      spark.conf.unset("spark.graft.joinReorder.broadcastHints")
    }
  }

  test("shuffle-hash hints: the tier between broadcast and sort-merge") {
    // threshold 100 B: the filtered region side estimates ~190 B —
    // ABOVE broadcast (190 > 100) but inside the local-hash-map bound
    // (190 ≤ 100 × 4 partitions) and ≥3× smaller than its probe side,
    // so the estimate-backed hint picks ShuffledHashJoin where both
    // defaults (no hint / hints off) sort-merge
    val prevTh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "100")
    spark.conf.set("spark.graft.joinReorder.stats", "measured")
    try {
      def count(op: String) = spark.sql(adversarialFlagshipSql)
        .queryExecution.sparkPlan.toString.sliding(op.length)
        .count(_ == op)
      assert(count("ShuffledHashJoin") > 0,
        "estimate-backed hint must produce a static SHJ")
      assert(count("BroadcastHashJoin") == 0,
        "at 100 B nothing may broadcast — SHJ must be the hint tier")
      val withHints = spark.sql(adversarialFlagshipSql)
        .collect().map(_.toSeq).toSeq
      spark.conf.set("spark.graft.joinReorder.shuffleHashHints", "false")
      assert(count("ShuffledHashJoin") == 0,
        "without the hint, plan-stats sizes must sort-merge here")
      val without = spark.sql(adversarialFlagshipSql)
        .collect().map(_.toSeq).toSeq
      assert(withHints == without, "hints may steer physics, never answers")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevTh)
      spark.conf.unset("spark.graft.joinReorder.stats")
      spark.conf.unset("spark.graft.joinReorder.shuffleHashHints")
    }
  }

  test("feedback observations steer physical hints: poisoning flips BHJ off") {
    // under stats=feedback the hint arithmetic prices bytes from the
    // SAME FeedbackCardinality that serves observed counts — strictly
    // better information than plan-stats bytes. Harvest the flagship,
    // verify the 1-row observed region leaf broadcasts at a 500 B
    // threshold, then POISON that observation to 10^6 rows: the hint
    // must disappear (estimated bytes ≫ every tier) while answers
    // never change.
    val prevTh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "500")
    try {
      ExecutionFeedback.clear()
      spark.conf.set("spark.graft.joinReorder.stats", "hist")
      val df = spark.sql(adversarialFlagshipSql)
      df.collect()
      ExecutionFeedback.harvest(df)
      spark.conf.set("spark.graft.joinReorder.stats", "feedback")
      def bhjCount() = spark.sql(adversarialFlagshipSql).queryExecution
        .sparkPlan.toString.sliding("BroadcastHashJoin".length)
        .count(_ == "BroadcastHashJoin")
      assert(bhjCount() > 0,
        "observed 1-row region leaf must hint BHJ at 500 B")
      val before = spark.sql(adversarialFlagshipSql)
        .collect().map(_.toSeq).toSeq
      val regionLeaf = ExecutionFeedback.all.keys.find(k =>
        k.contains("/region@") && !k.contains("||"))
      assert(regionLeaf.isDefined, s"no region leaf observed")
      ExecutionFeedback.record(regionLeaf.get, 1e6)
      assert(bhjCount() == 0,
        "a poisoned observed count must withdraw the broadcast hint")
      val after = spark.sql(adversarialFlagshipSql)
        .collect().map(_.toSeq).toSeq
      assert(before == after, "observations steer physics, never answers")
    } finally {
      ExecutionFeedback.clear()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevTh)
      spark.conf.unset("spark.graft.joinReorder.stats")
    }
  }

  test("p26: inner islands around a LEFT JOIN reorder; the outer join survives") {
    import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
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
    def analyze(enabled: Boolean) = {
      spark.conf.set("spark.graft.joinReorder.enabled", enabled.toString)
      try {
        val plan = spark.sql(PlannerQueries.mixedOuterSql)
          .queryExecution.optimizedPlan
        val outer = plan.collect {
          case j: LJoin if j.joinType == LeftOuter => j }
        val innerPairs = plan.collect {
          case j: LJoin if j.joinType == Inner =>
            j.collectLeaves().flatMap(leafName).toSet }
        (outer, innerPairs.toSet)
      } finally spark.conf.set("spark.graft.joinReorder.enabled", "true")
    }
    val (outerOn, sigOn) = analyze(enabled = true)
    val (outerOff, sigOff) = analyze(enabled = false)
    // exactly ONE LeftOuter join either way, supplier on its right
    assert(outerOn.size == 1 && outerOff.size == 1,
      "the LEFT JOIN must survive reordering, exactly once")
    assert(outerOn.head.right.collectLeaves().flatMap(leafName)
      .toSet == Set("supplier"))
    // the rule moved the UPPER island: the tiny nation⋈region pair
    // joins first (FROM order would bind nation to the big left side)
    assert(sigOn.contains(Set("nation", "region")),
      s"upper island not reordered: $sigOn")
    assert(!sigOff.contains(Set("nation", "region")),
      "without the rule the FROM order must not produce nation⋈region " +
        "(otherwise this pin proves nothing)")
    // answers identical with and without the rule
    val on = spark.sql(PlannerQueries.mixedOuterSql)
      .collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.joinReorder.enabled", "false")
    val off = try spark.sql(PlannerQueries.mixedOuterSql)
      .collect().map(_.toSeq).toSeq
    finally spark.conf.set("spark.graft.joinReorder.enabled", "true")
    assert(on == off && on.nonEmpty)
    // the ON-clause filter keeps null extension observable: some rows
    // must be unmatched (supp_cnt < cnt), else the LEFT JOIN is
    // vacuously inner and the preservation pin is weak
    assert(on.head(2).asInstanceOf[Long] < on.head(1).asInstanceOf[Long],
      s"LEFT JOIN must leave unmatched rows: ${on.head}")
  }

  test("non-equi multiway join does not break") {
    val rows = spark.sql(
      """SELECT count(*) AS c FROM region a, region b, region c
         WHERE a.r_regionkey < b.r_regionkey AND b.r_regionkey < c.r_regionkey""")
      .collect()
    assert(rows.head.getLong(0) == 10) // C(5,3)
  }
}
