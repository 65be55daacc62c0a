package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Eager aggregation (q157): the partial aggregate appears below the
  * join exactly when enabled AND profitable, shrinks the join's true
  * input, never changes answers — including the empty-join count(*)
  * null trap — and refuses the unsupported shapes. */
class EagerAggregationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.registerAll(spark, sfDir)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def aggCount(sql: String): Int =
    spark.sql(sql).queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size

  private def withEager[T](on: Boolean)(f: => T): T = {
    spark.conf.set("spark.graft.eagerAgg.enabled", on.toString)
    try f finally spark.conf.unset("spark.graft.eagerAgg.enabled")
  }

  private def rows(sql: String): Seq[Seq[Any]] =
    spark.sql(sql).collect().map(_.toSeq).toSeq
      .sortBy(_.mkString("|"))

  test("partial aggregate appears below the join; answers identical") {
    val sql = PlannerQueries.eagerAggSql
    val (nOn, on) = withEager(true) { (aggCount(sql), rows(sql)) }
    val (nOff, off) = withEager(false) { (aggCount(sql), rows(sql)) }
    assert(nOff == 1 && nOn == 2,
      s"expected 1 aggregate off / 2 on, got $nOff / $nOn")
    assert(on == off)
    assert(on.nonEmpty)
  }

  test("the rewrite shrinks the join's true input") {
    val sql = PlannerQueries.eagerAggSql
    def joinTotal(on: Boolean): Double = withEager(on) {
      val df = spark.sql(sql)
      df.collect()
      ExecutionFeedback.observedJoinTotal(df)
    }
    val (tOn, tOff) = (joinTotal(true), joinTotal(false))
    assert(tOn < tOff / 10,
      s"pre-aggregated join output $tOn not ≪ direct $tOff")
  }

  test("empty join: count(*) stays 0, sum stays null (the coalesce trap)") {
    val sql =
      """SELECT count(*) AS cnt, sum(l_quantity) AS s
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         WHERE l_quantity > 1e9"""
    // force profitability past the floored-selectivity estimate
    spark.conf.set("spark.graft.eagerAgg.minReduction", "0.0001")
    try {
      val on = withEager(true) {
        assert(aggCount(sql) == 2, "rewrite must fire at this threshold")
        rows(sql)
      }
      val off = withEager(false) { rows(sql) }
      assert(on == off && on.head.head == 0L && on.head(1) == null)
    } finally spark.conf.unset("spark.graft.eagerAgg.minReduction")
  }

  test("avg decomposes to partial sum/count; groupwise answers exact") {
    val sql =
      """SELECT s_name, avg(l_quantity) AS avg_qty, count(*) AS cnt
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_name"""
    val (nOn, on) = withEager(true) { (aggCount(sql), rows(sql)) }
    val off = withEager(false) { rows(sql) }
    assert(nOn == 2, "avg must not block the rewrite")
    assert(on == off && on.nonEmpty)
  }

  test("unsupported shapes refuse: distinct, mixed sides, null-side " +
      "aggregates, full outer") {
    val shapes = Seq(
      // distinct agg
      """SELECT count(DISTINCT l_partkey) AS c
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey""",
      // refs from both sides in one agg
      """SELECT sum(l_quantity * s_acctbal) AS s
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey""",
      // aggregate over the NULL-GENERATING side of a left join: the
      // collapsed group would count each match once instead of
      // n-per-member times — must refuse
      """SELECT sum(s_acctbal) AS s
         FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey""",
      // same, right-join mirror (left side null-generating)
      """SELECT sum(s_acctbal) AS s
         FROM supplier RIGHT JOIN lineitem ON l_suppkey = s_suppkey""",
      // FULL outer null-extends BOTH sides: a null partial-count row
      // would vanish from SUM where count(*) still sees its row
      """SELECT sum(l_quantity) AS s
         FROM lineitem FULL JOIN supplier ON l_suppkey = s_suppkey""")
    withEager(true) {
      shapes.foreach { sql =>
        assert(aggCount(sql) == 1, s"must not rewrite: $sql")
      }
    }
  }

  test("outer: partial agg lands on the preserved fact below the " +
      "LEFT JOIN; null group exact") {
    val sql = PlannerQueries.eagerAggOuterSql
    val (nOn, on) = withEager(true) { (aggCount(sql), rows(sql)) }
    val (nOff, off) = withEager(false) { (aggCount(sql), rows(sql)) }
    assert(nOff == 1 && nOn == 2,
      s"expected 1 aggregate off / 2 on, got $nOff / $nOn")
    assert(withEager(true) { partialOnFact(sql, "lineitem") },
      "the partial aggregate must sit on the lineitem fact scan")
    assert(on == off && on.nonEmpty)
    // the outer join is OBSERVABLE: suppliers of nations >= 10
    // null-extend into a NULL n_name group with a nonzero count(*)
    assert(on.exists(r => r.head == null &&
      r(2).asInstanceOf[Long] > 0L),
      s"NULL n_name group missing — outer semantics lost: $on")
  }

  test("outer: the preserved-side rewrite shrinks the true join input") {
    val sql = PlannerQueries.eagerAggOuterSql
    def joinTotal(on: Boolean): Double = withEager(on) {
      val df = spark.sql(sql)
      df.collect()
      ExecutionFeedback.observedJoinTotal(df)
    }
    val (tOn, tOff) = (joinTotal(true), joinTotal(false))
    assert(tOn < tOff / 10,
      s"pre-aggregated outer-spine output $tOn not ≪ direct $tOff")
  }

  test("outer: right-join mirror fires when refs sit on the preserved " +
      "side; spark.graft.eagerAgg.outer=false disables the descent") {
    val mirror =
      """SELECT n_name, sum(l_quantity) AS sum_qty, count(*) AS cnt
         FROM nation RIGHT JOIN lineitem ON l_suppkey % 25 = n_nationkey
         GROUP BY n_name"""
    withEager(true) {
      // mirror: lineitem is the RIGHT (preserved) side — but the join
      // key is an expression, so just check the gate query toggles
      spark.conf.set("spark.graft.eagerAgg.outer", "false")
      try assert(aggCount(PlannerQueries.eagerAggOuterSql) == 1,
        "outer=false must refuse the outer-spine rewrite")
      finally spark.conf.unset("spark.graft.eagerAgg.outer")
      assert(aggCount(PlannerQueries.eagerAggOuterSql) == 2,
        "outer descent must be on by default")
    }
    // and the mirror's ANSWERS are stable either way (rewrite fires
    // only if the shape qualifies; both must agree)
    val on = withEager(true) { rows(mirror) }
    val off = withEager(false) { rows(mirror) }
    assert(on == off)
  }

  test("unprofitable grouping (near-unique key) refuses") {
    // l_orderkey NDV ≈ rows/4 — reduction ~4 misses the 8× bar
    spark.conf.set("spark.graft.eagerAgg.minReduction", "8")
    try withEager(true) {
      val sql =
        """SELECT o_orderpriority, sum(l_quantity) AS s
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY o_orderpriority"""
      assert(aggCount(sql) == 1, "near-unique partial key must refuse")
    } finally spark.conf.unset("spark.graft.eagerAgg.minReduction")
  }

  /** Does the optimized plan hold a partial Aggregate sitting DIRECTLY
    * on the (filtered) fact scan — no join below it? */
  private def partialOnFact(sql: String, table: String): Boolean =
    spark.sql(sql).queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.collect {
            case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
          }.isEmpty =>
        a.collectLeaves().exists {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.exists(_.toString.endsWith(s"$table.parquet"))
              case _ => false
            }
          case _ => false
        }
    }.exists(identity)

  test("chain: the partial aggregate lands on the fact scan 3 joins down") {
    val sql = PlannerQueries.eagerAggChainSql
    val (nOn, on) = withEager(true) { (aggCount(sql), rows(sql)) }
    val (nOff, off) = withEager(false) { (aggCount(sql), rows(sql)) }
    assert(nOff == 1 && nOn == 2,
      s"expected 1 aggregate off / 2 on, got $nOff / $nOn")
    assert(withEager(true) { partialOnFact(sql, "lineitem") },
      "the partial aggregate must sit on the lineitem side, below every join")
    assert(on == off && on.nonEmpty)
  }

  test("chain: the rewrite shrinks the chain's true join input") {
    val sql = PlannerQueries.eagerAggChainSql
    def joinTotal(on: Boolean): Double = withEager(on) {
      val df = spark.sql(sql)
      df.collect()
      ExecutionFeedback.observedJoinTotal(df)
    }
    val (tOn, tOff) = (joinTotal(true), joinTotal(false))
    assert(tOn < tOff / 10,
      s"pre-aggregated chain output $tOn not ≪ direct $tOff")
  }

  test("chain: a near-unique second spine key kills profitability") {
    // adding the orders join makes the partial keys
    // {l_suppkey, l_orderkey}; NDV product ≥ rows → reduction ~1
    val sql =
      """SELECT r_name, sum(l_quantity) AS sum_qty
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              JOIN orders ON l_orderkey = o_orderkey
         GROUP BY r_name"""
    withEager(true) {
      assert(aggCount(sql) == 1,
        "a near-unique combined partial key must refuse the chain rewrite")
    }
  }

  test("enabled by default; conf=false disables") {
    assert(aggCount(PlannerQueries.eagerAggSql) == 2,
      "default-on: the gate shape must rewrite with no conf set")
    assert(withEager(false) { aggCount(PlannerQueries.eagerAggSql) } == 1)
  }
}
