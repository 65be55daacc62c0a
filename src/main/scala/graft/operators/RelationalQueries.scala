package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** Relational operator coverage (SURVEY.md §2a/§2c ✦ rows): scan,
  * filter-predicate language, projection, joins (inner/outer/semi/anti/
  * self/cross), aggregation, distinct, sort/limit, window, set ops,
  * rollup/cube, scalar functions, subqueries.
  *
  * Queries whose text is *identical* ANSI SQL in Spark and DuckDB live in
  * [[sharedSql]] — one string is both the Spark implementation (via
  * `spark.sql` over the registered testdata views) and the DuckDB oracle.
  * That mirrors how the reference validates planners against each other by
  * result hash (reference: Query.verifyResults, Query.java:71-80) — here
  * the "other planner" is a different engine entirely.
  *
  * Determinism notes baked into every query:
  *  - double aggregates are `round()`ed (cross-engine float-sum jitter);
  *  - LIMIT always rides a total order (unique-key tie-break);
  *  - timestamp comparisons go through DATE casts (ntz-vs-ltz safety).
  */
object RelationalQueries {

  // DECLARED FIRST: vals referenced by the queries/oracleSql map vals
  // below — Scala object vals initialize in declaration order, and a
  // forward reference reads null (the EventOps.DayUs landmine).

  /** q95's shared SQL (the d01 exactSql discipline — one string, two
    * engines): each customer's top-2 orders by stored price,
    * order-key tie-break, customers without orders dropped by the
    * lateral's inner-join semantics. */
  private val lateralTopkSql: String =
    """SELECT c_custkey, t.o_orderkey, t.o_totalprice
       FROM customer, LATERAL (
         SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t"""

  /** SQL that runs verbatim on Spark AND DuckDB over the same tables. */
  val sharedSql: Map[String, String] = Map(
    // --- scan / project / filter (reference predicate language:
    //     =, <>, <, >, LIKE, IN, BETWEEN, IS NOT NULL, AND/OR —
    //     MyUtils.java:152-180) ---
    "q01_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    "q02_filter_pred" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
         WHERE l_returnflag <> 'N' AND l_quantity BETWEEN 10 AND 40
           AND l_linestatus IN ('F', 'O') AND l_returnflag IS NOT NULL
           AND (l_discount < 0.05 OR l_tax > 0.04)""",
    "q02b_filter_like" ->
      """SELECT p_partkey, p_name FROM part
         WHERE p_name LIKE '%widget%' AND p_size > 10""",

    // --- flagship: JOB-shaped multiway inner equi-join, conjunctive
    //     base-table predicates, ungrouped MIN select list ---
    "q03_flagship" ->
      """SELECT min(o_totalprice) AS min_total, min(l_extendedprice) AS min_ext,
                count(*) AS cnt
         FROM region, nation, customer, orders, lineitem
         WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
           AND c_custkey = o_custkey AND o_orderkey = l_orderkey
           AND r_name = 'ASIA' AND o_orderstatus = 'F' AND l_quantity > 5""",

    // --- joins ---
    "q04_join_inner" ->
      """SELECT c_mktsegment, count(*) AS cnt, round(sum(o_totalprice), 2) AS total
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY c_mktsegment""",
    "q05_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS order_cnt
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey""",
    "q22_self_join" ->
      """SELECT a.n_nationkey AS nk1, b.n_nationkey AS nk2
         FROM nation a JOIN nation b
           ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey""",
    "q23_cross_join" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation",

    // --- aggregation ---
    "q08_agg_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_base,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
                round(avg(l_quantity), 4) AS avg_qty,
                count(*) AS cnt
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-01'
         GROUP BY l_returnflag, l_linestatus""",
    "q09_min_ungrouped" ->
      """SELECT min(p_retailprice) AS min_price, min(s_acctbal) AS min_bal
         FROM part, lineitem, supplier
         WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
           AND p_type = 'PROMO' AND s_acctbal > 0""",
    "q10_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q11_count_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS ndv_part,
                count(DISTINCT l_suppkey) AS ndv_supp
         FROM lineitem""",
    "q25_having" ->
      """SELECT l_partkey, count(*) AS cnt FROM lineitem
         GROUP BY l_partkey HAVING count(*) > 5""",
    "q18_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",
    "q24_cube" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",

    // --- sort / limit (total order: unique o_orderkey tie-break) ---
    "q12_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",

    // --- window functions ---
    "q13_window_rank" ->
      """SELECT c_custkey, c_nationkey, CAST(rnk AS INTEGER) AS rnk FROM (
           SELECT c_custkey, c_nationkey,
                  row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY c_acctbal DESC, c_custkey) AS rnk
           FROM customer) AS t
         WHERE rnk <= 3""",
    "q14_window_frame" ->
      """SELECT o_custkey, o_orderkey,
                round(sum(o_totalprice) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
         FROM orders""",

    // --- set operations ---
    "q15_union" ->
      """SELECT c_nationkey AS nk FROM customer
         UNION SELECT s_nationkey AS nk FROM supplier""",
    "q16_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
         INTERSECT SELECT s_nationkey AS nk FROM supplier""",
    "q17_except" ->
      """SELECT c_nationkey AS nk FROM customer
         EXCEPT SELECT s_nationkey AS nk FROM supplier""",

    // --- scalar functions (string/date/math/conditional) ---
    "q19_scalar_fns" ->
      """SELECT o_orderkey, upper(substr(o_orderpriority, 3, 6)) AS prio,
                CAST(year(o_orderdate) AS INTEGER) AS yr,
                CAST(month(o_orderdate) AS INTEGER) AS mo,
                round(abs(o_totalprice - 100000.0), 2) AS dist,
                CAST(length(o_orderstatus) AS INTEGER) AS slen
         FROM orders""",
    "q20_case_when" ->
      """SELECT CASE WHEN l_quantity < 10 THEN 'low'
                     WHEN l_quantity < 30 THEN 'mid'
                     ELSE 'high' END AS bucket,
                count(*) AS cnt
         FROM lineitem GROUP BY 1""",

    // --- subqueries ---
    "q21_in_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)""",

    // --- semi-structured: regexp extraction from the events JSON props
    //     ([0-9] avoids cross-engine backslash-escape divergence) ---
    "q27_events_json" ->
      """SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) % 10 AS kb,
                count(*) AS cnt
         FROM events GROUP BY kb""",

    // --- outer-join family beyond LEFT ---
    "q30_full_outer" ->
      """SELECT n_nationkey, s_suppkey
         FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey""",

    // --- removable outer join: no customer columns projected, c_custkey
    // unique → the join is the identity on orders; with GraftExtensions
    // installed graft.plans.OuterJoinRemoval drops it from the plan
    // entirely (OuterJoinRemovalSpec asserts the join node is gone) ---
    "q44_outer_join_removed" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS total
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey""",
    // --- removable self join: customer joined with itself on its unique
    // key is the identity; with GraftExtensions installed (Verify/Bench
    // both install it) graft.plans.SelfJoinElimination rewrites this to a
    // single scan with the b-side filter AND-ed in — one scan + zero
    // shuffles instead of two scans + a join. The oracle proves the
    // rewrite result-neutral; SelfJoinEliminationSpec proves the join
    // node is actually gone from the optimized plan ---
    "q45_self_join_removed" ->
      """SELECT a.c_custkey, a.c_name, round(b.c_acctbal, 2) AS bal
         FROM customer a JOIN customer b ON a.c_custkey = b.c_custkey
         WHERE b.c_mktsegment = 'BUILDING'""",
    "q31_right_join" ->
      """SELECT o_orderkey, c_name
         FROM orders RIGHT JOIN customer ON c_custkey = o_custkey
         WHERE c_acctbal > 9000""",

    // --- set op without dedup ---
    "q32_union_all" ->
      """SELECT c_nationkey AS nk FROM customer
         UNION ALL SELECT s_nationkey AS nk FROM supplier""",

    // --- NOT IN with a guaranteed-non-null subquery (3VL parity) ---
    "q33_not_in" ->
      """SELECT o_orderkey FROM orders
         WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                                 WHERE c_acctbal > 5000)""",

    // --- scalar subquery ---
    "q34_scalar_subquery" ->
      """SELECT o_orderkey,
                round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 2)
                  AS diff_from_avg
         FROM orders""",

    // --- analytic window functions beyond rank/frames ---
    "q35_lead_lag" ->
      """SELECT o_custkey, o_orderkey,
                round(o_totalprice -
                      lag(o_totalprice, 1, 0.0) OVER (
                        PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey), 2) AS delta_prev
         FROM orders""",
    "q36_ntile_pctrank" ->
      """SELECT o_orderkey, CAST(ntile(4) OVER w AS INTEGER) AS quartile,
                round(percent_rank() OVER w, 4) AS pr
         FROM orders WINDOW w AS (ORDER BY o_totalprice, o_orderkey)""",

    // --- explicit grouping sets ---
    "q37_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""",

    // --- date arithmetic (interval + extraction) ---
    "q38_date_arith" ->
      """SELECT o_orderkey,
                CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due,
                CAST(quarter(o_orderdate) AS INTEGER) AS q
         FROM orders""",

    // --- correlated scalar subquery ---
    "q40_correlated_scalar" ->
      """SELECT c_custkey, round(c_acctbal, 2) AS bal
         FROM customer c
         WHERE c_acctbal * 500 > (SELECT coalesce(sum(o_totalprice), 0)
                                  FROM orders o WHERE o.o_custkey = c.c_custkey)""",

    // --- exact order statistics (percentile_cont interpolates,
    //     percentile_disc picks an actual row value — both deterministic,
    //     unlike approx_percentile which stays engine-specific) ---
    "q49_percentiles" ->
      """SELECT l_returnflag,
                round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 4)
                  AS p50_qty,
                round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity), 4)
                  AS p90_qty,
                round(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 2)
                  AS p25_price
         FROM lineitem GROUP BY l_returnflag""",

    // --- pivot as conditional aggregation (engine-portable form) ---
    "q42_pivot_conditional" ->
      """SELECT l_returnflag,
                round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
                round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
         FROM lineitem GROUP BY l_returnflag"""
  )

  /** DataFrame-API queries (operators Spark expresses natively but whose
    * SQL differs from DuckDB, or that showcase the Dataset API). */
  /** q108's build step over any (event_type, day, value) frame: one
    * partial-agg pass to per-(group, shard) dense bin-count arrays —
    * the MERGEABLE histogram column. Bins are fixed-width with clamped
    * tails (`least(greatest(floor(v/width),0),nbins-1)`), so the
    * sketch is a pure function of the value and merging two shards'
    * arrays elementwise-adds EXACTLY the histogram of their union —
    * unlike q105's HLL this stored stat has no estimation error, which
    * is what lets the gate hash-check the whole
    * build→store→merge→serve path against a direct GROUP BY. */
  def histogramSketch(shards: DataFrame, nbins: Int,
      width: Double): DataFrame = {
    import org.apache.spark.sql.functions._
    shards
      .filter(col("value").isNotNull)
      .withColumn("bin", least(greatest(
        floor(col("value") / width), lit(0.0)), lit(nbins - 1.0)).cast("int"))
      .groupBy("event_type", "day", "bin")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("event_type", "day")
      .agg(collect_list(struct(col("bin"), col("cnt"))).as("parts"))
      .select(col("event_type"), col("day"),
        expr(s"""aggregate(parts, array_repeat(0L, $nbins),
                  (acc, p) -> transform(acc,
                    (x, i) -> x + IF(i = p.bin, p.cnt, 0L)))""").as("hist"))
  }

  /** q108's MERGE + SERVE: elementwise-sum the shard arrays per group
    * (`zip_with` fold — sketch-merge, no row re-scan) and explode the
    * merged array to (group, bin, cnt) rows. The rollup a 100 TB store
    * runs nightly: per-day histogram columns land with each ingest
    * batch; per-month / global serving merges O(shards · nbins) longs. */
  def histogramMergeServe(hists: DataFrame, nbins: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    hists.groupBy("event_type")
      .agg(collect_list(col("hist")).as("hs"))
      .select(col("event_type"),
        posexplode(expr(s"""aggregate(hs, array_repeat(0L, $nbins),
          (acc, h) -> zip_with(acc, h, (x, y) -> x + y))"""))
          .as(Seq("bin", "cnt")))
  }

  /** q135: RFM SEGMENTATION — the classic customer-value triage
    * (Hughes 1994): per customer, Recency = days from last order to
    * the corpus anchor (max order date), Frequency = order count,
    * Monetary = 2-dp spend; each scored 1–4 by EXACT quartile
    * THRESHOLDS, then a CASE segment label. Deliberately NOT ntile():
    * a global ntile is one unpartitioned sort — the 100 TB
    * anti-pattern — and its tie assignments are engine-dependent.
    * Threshold scoring needs only two 1-row broadcast scalars (anchor,
    * then the 9 quartile bounds) and a map-side CASE; ties land
    * deterministically on the same side of each bound in both engines
    * because bounds and metrics are rounded to the shared 4-dp grid
    * (quartile interpolation fractions are k/4, so integer-metric
    * bounds are exact and 2-dp-sum bounds sit on the 4-dp grid). */
  private def rfmSegments(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val pc = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(max(col("o_orderdate").cast("date")).as("last_order"),
        count(lit(1)).as("frequency"),
        round(sum("o_totalprice"), 2).as("monetary"))
    val anchor = pc.agg(max("last_order").as("anchor"))
    val r = Persists.barrier(pc.crossJoin(broadcast(anchor))
      .withColumn("recency_days", datediff(col("anchor"), col("last_order")))
      .drop("anchor", "last_order"))
    val th = r.agg(
      expr("percentile(recency_days, array(0.25D, 0.5D, 0.75D))").as("rq"),
      expr("percentile(frequency, array(0.25D, 0.5D, 0.75D))").as("fq"),
      expr("percentile(monetary, array(0.25D, 0.5D, 0.75D))").as("mq"))
      .select(
        round(col("rq")(0), 4).as("r1"), round(col("rq")(1), 4).as("r2"),
        round(col("rq")(2), 4).as("r3"),
        round(col("fq")(0), 4).as("f1"), round(col("fq")(1), 4).as("f2"),
        round(col("fq")(2), 4).as("f3"),
        round(col("mq")(0), 4).as("m1"), round(col("mq")(1), 4).as("m2"),
        round(col("mq")(2), 4).as("m3"))
    r.crossJoin(broadcast(th))
      .select(col("c_custkey"), col("recency_days"), col("frequency"),
        col("monetary"),
        expr("""CASE WHEN recency_days <= r1 THEN 4
                     WHEN recency_days <= r2 THEN 3
                     WHEN recency_days <= r3 THEN 2 ELSE 1 END""").as("r_score"),
        expr("""CASE WHEN frequency <= f1 THEN 1
                     WHEN frequency <= f2 THEN 2
                     WHEN frequency <= f3 THEN 3 ELSE 4 END""").as("f_score"),
        expr("""CASE WHEN monetary <= m1 THEN 1
                     WHEN monetary <= m2 THEN 2
                     WHEN monetary <= m3 THEN 3 ELSE 4 END""").as("m_score"))
      .withColumn("segment", expr(RfmSegmentCase))
  }

  /** One segment-label CASE, shared verbatim by both engines. */
  private val RfmSegmentCase: String =
    """CASE WHEN r_score = 4 AND f_score >= 3 AND m_score >= 3
              THEN 'champion'
            WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
            WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
            WHEN r_score <= 2 AND f_score <= 2 AND m_score <= 2
              THEN 'hibernating'
            ELSE 'regular' END"""

  /** Max distinct parts per order admitted to pair generation — the
    * d05/g17 hub-cap discipline: one pathological basket of B items
    * contributes B² candidate pairs, so the cap bounds the self-join
    * blow-up at corpus scale. MIRRORED in the q136 oracle (ADVICE r10:
    * a cap only on the Spark side silently narrows the equivalence). */
  private val MaxBasket = 50

  /** q136: MARKET-BASKET ASSOCIATION RULES — Apriori's 2-itemset level
    * (Agrawal & Srikant, VLDB'94) over order baskets: distinct
    * (order, part) incidences, size-capped baskets ([[MaxBasket]]),
    * pair supports from ONE `p1 < p2` self-join per order, then both
    * rule directions with confidence = sc/|antecedent baskets| and
    * lift = sc·N / (|a|·|c|). Support floor ≥ 2 co-occurrences keeps
    * the rule set signal-bearing at any SF.
    *
    * Scale shape: the self-join is keyed on the order (baskets are
    * bounded by the cap, so per-order work is ≤ B²), item counts and
    * N are partial-agg'd, and the two dimension joins on part counts
    * broadcast at |parts| ≪ |pairs|. Never all-pairs across orders. */
  private def basketRules(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    basketRulesOn(Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct())
  }

  /** [[basketRules]] over any distinct (ok, pk) incidence frame. */
  private[graft] def basketRulesOn(items0: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val sized = items0.groupBy("ok").agg(count(lit(1)).as("bs"))
      .filter(col("bs") <= MaxBasket).select("ok")
    val items = Persists.barrier(items0.join(sized, Seq("ok"), "left_semi"))
    val n = items.agg(
      countDistinct(col("ok")).cast("double").as("n"))
    val cnt = items.groupBy("pk").agg(count(lit(1)).as("c"))
    val pairs = items.as("a").join(items.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
      .agg(count(lit(1)).as("sc"))
      .filter(col("sc") >= 2)
    val rules = pairs.select(col("p1").as("antecedent"),
        col("p2").as("consequent"), col("sc"))
      .unionAll(pairs.select(col("p2").as("antecedent"),
        col("p1").as("consequent"), col("sc")))
    rules.crossJoin(broadcast(n))
      .join(broadcast(cnt.select(col("pk").as("antecedent"),
        col("c").as("ca"))), "antecedent")
      .join(broadcast(cnt.select(col("pk").as("consequent"),
        col("c").as("cc"))), "consequent")
      .select(col("antecedent"), col("consequent"),
        col("sc").as("support_cnt"),
        round(col("sc") / col("n"), 6).as("support"),
        round(col("sc") / col("ca"), 6).as("confidence"),
        round(col("sc") * col("n") / (col("ca") * col("cc")), 6).as("lift"))
  }

  def dfQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q135_rfm_segments" -> (rfmSegments _),
    "q136_basket_rules" -> (basketRules _),
    // q108: the mergeable HISTOGRAM sketch column — q105's stored-stat
    // discipline (build per shard at ingest, roll up by MERGE, serve
    // without re-scanning rows) on a sketch whose merge is EXACT, so
    // the entire path is oracle-checkable: 20 fixed-width bins over
    // events.value, sharded by day, merged per event_type. Integer
    // elementwise adds are order-free — collect_list's
    // nondeterministic shard order cannot change the result.
    "q108_histogram_sketch" -> ((spark, sfDir) => {
      import org.apache.spark.sql.functions._
      val e = Tables.load(spark, sfDir, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"), col("value"))
      histogramMergeServe(
        histogramSketch(e, nbins = 20, width = 5.0), nbins = 20)
    }),
    // q109: per-group top-k through the NATIVE bounded aggregate
    // ([[graft.functions.TopKAgg]]) instead of a window sort — O(k)
    // state per group, map-side partials, k·|groups| rows over the
    // shuffle where the q13/q95 window forms shuffle-and-sort every
    // row. The oracle is the window form: the two must agree row for
    // row (ties broken by payload id).
    "q109_topk_agg" -> ((spark, sfDir) => {
      import org.apache.spark.sql.functions._
      graft.functions.GraftFunctions.register(spark)
      Tables.load(spark, sfDir, "orders")
        .groupBy("o_orderstatus")
        .agg(expr("graft_topk(o_totalprice, o_orderkey, 5)").as("tk"))
        .select(col("o_orderstatus"), explode(col("tk")).as("e"))
        .select(col("o_orderstatus"),
          col("e.payload").as("o_orderkey"),
          col("e.score").as("o_totalprice"))
    }),
    // left-semi join (reference: semijoin selection,
    // MyLoptOptimizeJoinRule.java:121-141)
    "q06_join_semi" -> ((spark, sfDir) => {
      val c = Tables.load(spark, sfDir, "customer")
      val o = Tables.load(spark, sfDir, "orders")
        .filter("o_totalprice > 300000")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),
    "q07_join_anti" -> ((spark, sfDir) => {
      val c = Tables.load(spark, sfDir, "customer")
      val o = Tables.load(spark, sfDir, "orders")
        .filter("o_totalprice > 300000")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),
    "q39_array_ops" -> (arrayOps _),
    "q41_string_agg" -> (stringAgg _),
    "q43_pivot" -> (pivotQty _),
    // UNPIVOT (melt): wide metric columns to (metric, value) rows —
    // pivot's inverse, the reshape feeding per-metric aggregation and
    // the long-format sinks ML feature stores expect. Spark's native
    // unpivot generates rows in the scan projection (no shuffle until
    // the aggregate); the DuckDB oracle reshapes via UNION ALL, so the
    // gate pins the semantics, not the syntax.
    "q81_unpivot" -> ((spark, sfDir) => {
      import org.apache.spark.sql.functions._
      Tables.load(spark, sfDir, "lineitem")
        .unpivot(
          Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "val")
        .groupBy("metric")
        .agg(count(lit(1)).as("n"), round(sum("val"), 2).as("total"))
    }),
    // q100: exact equi-depth decile binning (feature discretization).
    // The naive form — ntile(10) over a GLOBAL window — funnels every
    // row through one partition; the scale form used here groups by
    // VALUE first (shuffle keyed on the value, partial-agg combinable),
    // takes the running count over the value-ordered DISTINCT frame
    // (window over |distinct values| rows, not |rows|), and assigns
    // bin = (10·cum) div n in pure int64 — bit-exact in any engine, no
    // float boundary. For continuous ~all-distinct columns at 100 TB
    // the distinct frame degenerates to the row count; the production
    // fallback is approx_percentile boundaries (q70's sketch) feeding
    // the same bucketize step.
    "q100_equidepth_bins" -> ((spark, sfDir) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val li = Tables.load(spark, sfDir, "lineitem")
      val grouped = li.groupBy(col("l_quantity").as("val"))
        .agg(count(lit(1)).as("cnt"))
      val n = Window.orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grouped
        .withColumn("cum", sum("cnt").over(n))
        .withColumn("total", sum("cnt").over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .withColumn("bin", least(lit(9L), expr("(cum * 10) div total")))
        .groupBy("bin")
        .agg(sum("cnt").as("n_rows"),
          round(min("val"), 2).as("lo"),
          round(max("val"), 2).as("hi"))
    }),
    // LATERAL correlated subquery with ORDER BY + LIMIT — top-k-per-
    // group expressed as the inner query the outer row parameterizes
    // (the form decorrelation rewrites into a ranked window; the gate
    // pins that Spark's rewrite agrees with DuckDB's row-for-row,
    // ties broken by key). Identical SQL text on both engines.
    "q95_lateral_topk" -> ((spark, sfDir) => {
      Tables.registerAll(spark, sfDir)
      spark.sql(lateralTopkSql)
    }),
    // q101: WITH RECURSIVE (Spark 4's UnionLoop execution) — the
    // iterative-closure SQL surface. The hierarchy is derived from the
    // data (parent = s_suppkey div 2, key 0 the root), so the gate
    // needs no extra fixture; depth is bounded by log₂(max key), and
    // each recursion step is one broadcast-sized join — the UNION-loop
    // shape a catalog/BOM/org-chart query runs at any scale. Only the
    // integer-division operator differs between engines (`div` / `//`).
    "q101_recursive_cte" -> ((spark, sfDir) => {
      Tables.registerAll(spark, sfDir)
      spark.sql(
        """WITH RECURSIVE h AS (
             SELECT s_suppkey, 0 AS depth FROM supplier WHERE s_suppkey = 0
             UNION ALL
             SELECT s.s_suppkey, h.depth + 1
             FROM supplier s JOIN h ON s.s_suppkey div 2 = h.s_suppkey
             WHERE s.s_suppkey > 0)
           SELECT depth, count(*) AS n,
                  min(s_suppkey) AS lo, max(s_suppkey) AS hi
           FROM h GROUP BY depth""")
    }),
    // time-bucketed aggregation over the events table (Tables.load
    // normalizes ts to a micros timestamp across testdata generations)
    "q26_events_daily" -> ((spark, sfDir) => {
      import org.apache.spark.sql.functions._
      Tables.load(spark, sfDir, "events")
        .groupBy(
          date_trunc("day", col("ts")).cast("date").as("day"),
          col("event_type"))
        .agg(count("*").as("cnt"), round(sum("value"), 2).as("sv"))
    })
  )

  /** Array-column operators — same semantics, different function names in
    * DuckDB (size/element_at vs len/[]), so DF impl + separate oracle.
    * `+ 0` after round: the engines disagree on IEEE −0.0 for values
    * rounding to zero, and −0.0 + 0 = +0.0 normalizes both. */
  private def arrayOps(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.load(spark, sfDir, "embeddings").select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      (round(element_at(col("embedding"), 1).cast("double"), 4) + 0)
        .as("first_val"),
      (round(expr("aggregate(slice(embedding, 1, 8), 0D, (a, x) -> a + x)"), 4) + 0)
        .as("head_sum"))
  }

  /** Ordered string aggregation (listagg/string_agg — names differ). */
  private def stringAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.load(spark, sfDir, "supplier")
      .groupBy(col("s_nationkey"))
      .agg(array_join(sort_array(collect_list(col("s_name"))), ",")
        .as("suppliers"))
  }

  /** True DataFrame pivot (relational pivot operator). */
  private def pivotQty(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum("l_quantity"), 2))
      .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
  }

  val dfOracleSql: Map[String, String] = Map(
    // q135: same per-customer rollup, same anchor scalar, same exact
    // quartile bounds (quantile_cont = Spark's percentile, both R-7
    // linear interpolation) on the same 4-dp grid, same CASE ladders
    // (segment CASE shared VERBATIM via RfmSegmentCase)
    "q135_rfm_segments" ->
      s"""WITH pc AS (
            SELECT o_custkey AS c_custkey,
                   max(CAST(o_orderdate AS DATE)) AS last_order,
                   count(*) AS frequency,
                   round(sum(o_totalprice), 2) AS monetary
            FROM orders GROUP BY 1),
          a AS (SELECT max(last_order) AS anchor FROM pc),
          r AS (SELECT pc.c_custkey, pc.frequency, pc.monetary,
                       date_diff('day', pc.last_order, a.anchor)
                         AS recency_days
                FROM pc, a),
          th AS (SELECT
              round(quantile_cont(recency_days, 0.25), 4) AS r1,
              round(quantile_cont(recency_days, 0.50), 4) AS r2,
              round(quantile_cont(recency_days, 0.75), 4) AS r3,
              round(quantile_cont(frequency, 0.25), 4) AS f1,
              round(quantile_cont(frequency, 0.50), 4) AS f2,
              round(quantile_cont(frequency, 0.75), 4) AS f3,
              round(quantile_cont(monetary, 0.25), 4) AS m1,
              round(quantile_cont(monetary, 0.50), 4) AS m2,
              round(quantile_cont(monetary, 0.75), 4) AS m3
            FROM r),
          s AS (SELECT c_custkey, recency_days, frequency, monetary,
              CASE WHEN recency_days <= r1 THEN 4
                   WHEN recency_days <= r2 THEN 3
                   WHEN recency_days <= r3 THEN 2 ELSE 1 END AS r_score,
              CASE WHEN frequency <= f1 THEN 1
                   WHEN frequency <= f2 THEN 2
                   WHEN frequency <= f3 THEN 3 ELSE 4 END AS f_score,
              CASE WHEN monetary <= m1 THEN 1
                   WHEN monetary <= m2 THEN 2
                   WHEN monetary <= m3 THEN 3 ELSE 4 END AS m_score
            FROM r, th)
        SELECT s.*, $RfmSegmentCase AS segment FROM s""",
    // q136: same capped incidence frame, same p1<p2 pair join, same
    // ≥2 support floor, both rule directions, same 6-dp metric grid
    "q136_basket_rules" ->
      s"""WITH items0 AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
          sized AS (SELECT ok FROM items0
                    GROUP BY ok HAVING count(*) <= $MaxBasket),
          items AS (SELECT items0.* FROM items0
                    JOIN sized USING (ok)),
          n AS (SELECT CAST(count(DISTINCT ok) AS DOUBLE) AS n
                FROM items),
          cnt AS (SELECT pk, count(*) AS c FROM items GROUP BY pk),
          pairs AS (
            SELECT a.pk AS p1, b.pk AS p2, count(*) AS sc
            FROM items a JOIN items b
              ON a.ok = b.ok AND a.pk < b.pk
            GROUP BY 1, 2 HAVING count(*) >= 2),
          rules AS (
            SELECT p1 AS antecedent, p2 AS consequent, sc FROM pairs
            UNION ALL
            SELECT p2, p1, sc FROM pairs)
        SELECT r.antecedent, r.consequent, r.sc AS support_cnt,
               round(r.sc / n.n, 6) AS support,
               round(r.sc / ca.c, 6) AS confidence,
               round(r.sc * n.n / (ca.c * cc.c), 6) AS lift
        FROM rules r
        JOIN cnt ca ON ca.pk = r.antecedent
        JOIN cnt cc ON cc.pk = r.consequent
        CROSS JOIN n""",
    // q108: the histogram direct from the rows — build/merge/serve on
    // the Spark side must reproduce it exactly. The type × bin grid is
    // dense over bins that occur anywhere in the type's days (the
    // Spark side's merged array covers all 20 positions, but a type
    // whose days never hit a bin still carries 0 there), so the grid
    // is every (event_type, bin in 0..19) pair with coalesced counts.
    "q108_histogram_sketch" ->
      """WITH e AS (
           SELECT event_type,
                  CAST(least(greatest(floor(value / 5.0), 0), 19) AS INTEGER)
                    AS bin
           FROM events WHERE value IS NOT NULL),
         grid AS (
           SELECT t.event_type, b.bin
           FROM (SELECT DISTINCT event_type FROM e) t,
                (SELECT unnest(range(0, 20)) AS bin) b),
         c AS (SELECT event_type, bin, count(*) AS cnt
               FROM e GROUP BY 1, 2)
         SELECT g.event_type, g.bin,
                coalesce(c.cnt, 0) AS cnt
         FROM grid g LEFT JOIN c
           ON g.event_type = c.event_type AND g.bin = c.bin""",
    "q109_topk_agg" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
           SELECT o_orderstatus, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_orderstatus
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 5""",
    "q41_string_agg" ->
      """SELECT s_nationkey, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
         FROM supplier GROUP BY s_nationkey""",
    "q43_pivot" ->
      """SELECT l_returnflag,
                round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
                round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
         FROM lineitem GROUP BY l_returnflag""",
    "q39_array_ops" ->
      """SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
                round(CAST(embedding[1] AS DOUBLE), 4) + 0 AS first_val,
                round(list_sum(list_transform(embedding[1:8],
                      x -> CAST(x AS DOUBLE))), 4) + 0 AS head_sum
         FROM embeddings""",
    "q06_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 300000)""",
    "q07_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 300000)""",
    "q26_events_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
                count(*) AS cnt, round(sum(value), 2) AS sv
         FROM events GROUP BY 1, 2""",
    "q81_unpivot" ->
      """WITH u AS (
           SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
           UNION ALL
           SELECT 'l_extendedprice', l_extendedprice FROM lineitem
           UNION ALL
           SELECT 'l_discount', l_discount FROM lineitem
           UNION ALL
           SELECT 'l_tax', l_tax FROM lineitem)
         SELECT metric, count(*) AS n, round(sum(val), 2) AS total
         FROM u GROUP BY metric""",
    "q95_lateral_topk" -> lateralTopkSql,
    "q100_equidepth_bins" ->
      """WITH g AS (SELECT l_quantity AS val, count(*) AS cnt
                    FROM lineitem GROUP BY 1),
            c AS (SELECT val, cnt,
                         sum(cnt) OVER (ORDER BY val
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum,
                         sum(cnt) OVER () AS total
                  FROM g)
         SELECT CAST(least(9, (cum * 10) // total) AS BIGINT) AS bin,
                CAST(sum(cnt) AS BIGINT) AS n_rows,
                round(min(val), 2) AS lo, round(max(val), 2) AS hi
         FROM c GROUP BY 1""",
    "q101_recursive_cte" ->
      """WITH RECURSIVE h AS (
           SELECT s_suppkey, 0 AS depth FROM supplier WHERE s_suppkey = 0
           UNION ALL
           SELECT s.s_suppkey, h.depth + 1
           FROM supplier s JOIN h ON s.s_suppkey // 2 = h.s_suppkey
           WHERE s.s_suppkey > 0)
         SELECT depth, count(*) AS n,
                min(s_suppkey) AS lo, max(s_suppkey) AS hi
         FROM h GROUP BY depth"""
  )

  /** Rows-only checks: value is engine-specific (approximate sketch). */
  /** The q105 SERVE step over any (event_type, sk: hll-sketch) frame:
    * per-group estimates plus the union-merge rollup — shared with the
    * streaming builder (q106), so batch and stream serve through one
    * definition. */
  def hllServe(sketches: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val perType = sketches.select(col("event_type"),
      hll_sketch_estimate(col("sk")).as("approx_users"))
    val overall = sketches
      .agg(hll_union_agg(col("sk")).as("sk"))
      .select(lit("__all__").as("event_type"),
        hll_sketch_estimate(col("sk")).as("approx_users"))
    perType.unionAll(overall)
  }

  def noOracleQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q105: the MERGEABLE sketch-column NDV pattern (Iceberg/Pinot
    // theta/HLL column stats re-expressed on Spark's DataSketches
    // surface): per-group HLL sketches built in one partial-agg pass,
    // served as per-group estimates AND re-aggregated into a
    // cross-group union estimate WITHOUT touching rows again — at
    // 100 TB the sketches are the stored table stat, and any rollup
    // (per-day → per-month → global) is sketch-merge, not re-scan.
    // Sketch bytes are engine-specific → rows-only; HllSketchSpec
    // pins the estimates against exact distinct counts.
    "q105_hll_sketch_column" -> ((spark, sfDir) => {
      import org.apache.spark.sql.functions._
      hllServe(graft.operators.Persists.barrier(
        Tables.load(spark, sfDir, "events")
          .groupBy("event_type")
          .agg(hll_sketch_agg(col("user_id")).as("sk"))))
    }),
    "q28_approx_ndv" -> ((spark, sfDir) => {
      import org.apache.spark.sql.functions._
      Tables.load(spark, sfDir, "lineitem")
        .agg(approx_count_distinct("l_partkey").as("approx_ndv_part"),
             approx_count_distinct("l_orderkey").as("approx_ndv_order"))
    }),
    // q70: the percentile form a 100 TB user actually runs —
    // approx_percentile's KLL/GK-style sketch merges in one pass with
    // map-side partial aggregation (exact percentile_cont re-sorts the
    // whole group per percentile). The sketch is engine-specific, so
    // rows-only here; q49 is the oracle-gated exact twin, and
    // ApproxPercentileSpec pins the rank-error contract (CDF within
    // 1/accuracy of the target, discrete mass accounted) vs the exact
    // answer on the same data.
    // Scalar columns only: the driver's rows-only harness sorts result
    // rows in pandas before hashing, and an array<double> column is
    // unhashable there. The multi-percentile sketch is still built
    // ONCE per column (array form — two separate aggs on l_quantity
    // would build the sketch twice, measured 2× slower); the scalars
    // are projected out afterward.
    "q70_approx_percentile" -> ((spark, sfDir) => {
      import org.apache.spark.sql.functions._
      Tables.load(spark, sfDir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_quantity"),
            array(lit(0.5), lit(0.9)), lit(10000)).as("aq"),
          percentile_approx(col("l_extendedprice"),
            lit(0.25), lit(10000)).as("approx_p25_price"))
        .select(col("l_returnflag"),
          col("aq").getItem(0).as("approx_p50_qty"),
          col("aq").getItem(1).as("approx_p90_qty"),
          col("approx_p25_price"))
    })
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val shared = sharedSql.map { case (name, sql) =>
      name -> ((spark: SparkSession, sfDir: String) => {
        Tables.registerAll(spark, sfDir)
        spark.sql(sql)
      })
    }
    shared ++ dfQueries ++ noOracleQueries
  }

  def oracleSql: Map[String, String] = sharedSql ++ dfOracleSql
}
