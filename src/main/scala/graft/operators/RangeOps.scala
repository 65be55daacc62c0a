package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Range (interval) join — points matched to the intervals containing
  * them. Spark plans a raw `p BETWEEN lo AND hi` join as a broadcast
  * nested loop (O(|points|·|intervals|) compares); the scale-safe
  * composition is BINNING: quantize time into fixed bins, explode each
  * interval over the bins it overlaps, equi-join points to interval
  * copies on (key, bin), and post-filter the exact range predicate. A
  * point lives in exactly one bin, so every true pair is found exactly
  * once — no dedup — and the equi-join shuffles hash-partitioned like
  * any other join. Bin width should approximate the typical interval
  * length (each interval then explodes to ~2 copies).
  */
object RangeOps {

  /** Points (`ptCol`, micros) joined to intervals ([`loCol`, `hiCol`],
    * micros, inclusive) sharing `key`. Frames must not share column
    * names besides none — caller pre-renames; result = point columns ++
    * interval columns. */
  def rangeJoin(
      points: DataFrame, intervals: DataFrame,
      pointKey: String, intervalKey: String,
      ptCol: String, loCol: String, hiCol: String,
      binMicros: Long): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val p = points.withColumn("_bin", expr(s"$ptCol div $binMicros"))
    val i = intervals.withColumn("_bin",
      explode(expr(s"sequence($loCol div $binMicros, $hiCol div $binMicros)")))
    p.join(i,
        p(pointKey) === i(intervalKey) && p("_bin") === i("_bin") &&
          col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Bin width derived from MEASURED interval statistics — the q80
    * ANALYZE discipline applied to the binning knob: one scalar
    * aggregate (bounded driver fetch) over both sides' spans, bin =
    * the average interval length, so a typical interval explodes to
    * ~2 copies and the explode factor stays O(1) regardless of the
    * time unit the caller's data happens to use. A hand-picked
    * constant that's wrong by 100× at 100 TB either explodes every
    * interval into hundreds of copies (too-fine bins) or degrades the
    * equi-join's selectivity until each bin is a cross join
    * (too-coarse); measuring removes the guess. */
  def deriveBinMicros(
      a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String): Long = {
    val spans = a.select((col(aHi) - col(aLo)).as("s"))
      .unionAll(b.select((col(bHi) - col(bLo)).as("s")))
    val avgSpan = spans.agg(avg(col("s"))).head.getDouble(0)
    math.max(1L, math.round(avgSpan))
  }

  /** INTERVAL-overlap join — both sides are intervals; a pair matches
    * iff [aLo,aHi] ∩ [bLo,bHi] ≠ ∅ (closed ends, touching counts).
    * Same binned equi-join shape as [[rangeJoin]], with the classic
    * dedup refinement the two-sided form needs: overlapping intervals
    * can share MANY bins, so the join keeps only the CANONICAL bin —
    * the one containing the intersection's start, max(aLo,bLo) — and
    * every true pair is emitted exactly once with no distinct. Both
    * sides explode over their covered bins, so the equi-join stays
    * hash-partitioned on (key, bin) — no inequality-driven BNLJ.
    *
    * `binMicros` ≤ 0 (the default) derives the width from measured
    * span statistics ([[deriveBinMicros]]).
    *
    * SKEW GUARD: a long-tail interval (span > `maxBinsPerInterval`
    * bins — a session left open for a month against 1-hour bins)
    * would explode into thousands of copies under binning. Such
    * outliers are split off BEFORE the explode and joined on the key
    * alone with the overlap predicate as a post-filter — at outlier
    * cardinality that residual join is small, and the partition is
    * exact: short×short pairs come from the binned path only,
    * any-long pairs from the residual paths only, so every true pair
    * is still emitted exactly once (TemporalJoinSpec pins it).
    *
    * The two inputs must not share column names (the join condition
    * and the caller's downstream projection would both be ambiguous)
    * — enforced, per ADVICE r9. */
  def intervalOverlapJoin(
      a: DataFrame, b: DataFrame,
      aKey: String, bKey: String,
      aLo: String, aHi: String, bLo: String, bHi: String,
      binMicros: Long = 0L,
      maxBinsPerInterval: Int = 256): DataFrame = {
    val shared = a.columns.intersect(b.columns)
    require(shared.isEmpty,
      s"intervalOverlapJoin inputs share column names ${shared.mkString(",")}" +
        " — pre-rename; the join condition would be ambiguous")
    require(maxBinsPerInterval > 1,
      s"maxBinsPerInterval must be > 1, got $maxBinsPerInterval")
    val bin = if (binMicros > 0) binMicros
      else deriveBinMicros(a, aLo, aHi, b, bLo, bHi)

    def spanBins(lo: String, hi: String) =
      expr(s"$hi div $bin - $lo div $bin")
    val (aShort, aLong) = (
      a.filter(spanBins(aLo, aHi) < maxBinsPerInterval),
      a.filter(spanBins(aLo, aHi) >= maxBinsPerInterval))
    val (bShort, bLong) = (
      b.filter(spanBins(bLo, bHi) < maxBinsPerInterval),
      b.filter(spanBins(bLo, bHi) >= maxBinsPerInterval))

    val ax = aShort.withColumn("_bina",
      explode(expr(s"sequence($aLo div $bin, $aHi div $bin)")))
    val bx = bShort.withColumn("_binb",
      explode(expr(s"sequence($bLo div $bin, $bHi div $bin)")))
    val binned = ax.join(bx,
        ax(aKey) === bx(bKey) && ax("_bina") === bx("_binb") &&
          ax(aLo) <= bx(bHi) && bx(bLo) <= ax(aHi) &&
          ax("_bina") === expr(s"greatest($aLo, $bLo) div $bin"))
      .drop("_bina", "_binb")

    // residual: any pair with a long member — key-equi join (still
    // hash-partitioned), overlap as post-filter; long-a sees ALL of b,
    // short-a sees only long-b, so no pair appears in two paths
    def residual(l: DataFrame, r: DataFrame): DataFrame =
      l.join(r, l(aKey) === r(bKey) &&
        l(aLo) <= r(bHi) && r(bLo) <= l(aHi))
    binned
      .unionByName(residual(aLong, b))
      .unionByName(residual(aShort, bLong))
  }

  /** Harness query: clicks within one hour after a signup, per user —
    * oracle is the plain inequality join DuckDB executes directly. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q104_interval_overlap" -> ((spark: SparkSession, sfDir: String) => {
      val events = Tables.load(spark, sfDir, "events")
      val signups = events.filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user"),
          col("event_id").as("signup_id"),
          unix_micros(col("ts")).as("s_lo"))
        .withColumn("s_hi", col("s_lo") + expr("7200000000"))
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          col("event_id").as("purchase_id"),
          unix_micros(col("ts")).as("p_lo"))
        .withColumn("p_hi", col("p_lo") + expr("3600000000"))
      intervalOverlapJoin(signups, purchases, "s_user", "p_user",
          "s_lo", "s_hi", "p_lo", "p_hi", binMicros = 3600000000L)
        .select(col("signup_id"), col("purchase_id"),
          (least(col("s_hi"), col("p_hi")) -
            greatest(col("s_lo"), col("p_lo"))).as("overlap_us"))
    }),
    // q104a: the same overlap join with the bin width DERIVED from
    // measured span statistics (the intervalOverlapJoin default) —
    // result-identical to q104 (same oracle, hash-checked); what
    // changes is that no caller-supplied constant can be wrong at
    // scale. Benched in the r10 series.
    "q104a_interval_overlap_auto" -> ((spark: SparkSession, sfDir: String) => {
      val events = Tables.load(spark, sfDir, "events")
      val signups = events.filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user"),
          col("event_id").as("signup_id"),
          unix_micros(col("ts")).as("s_lo"))
        .withColumn("s_hi", col("s_lo") + expr("7200000000"))
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          col("event_id").as("purchase_id"),
          unix_micros(col("ts")).as("p_lo"))
        .withColumn("p_hi", col("p_lo") + expr("3600000000"))
      intervalOverlapJoin(signups, purchases, "s_user", "p_user",
          "s_lo", "s_hi", "p_lo", "p_hi")
        .select(col("signup_id"), col("purchase_id"),
          (least(col("s_hi"), col("p_hi")) -
            greatest(col("s_lo"), col("p_lo"))).as("overlap_us"))
    }),
    "q48_range_join" -> ((spark: SparkSession, sfDir: String) => {
      val events = Tables.load(spark, sfDir, "events")
      val signups = events.filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user"),
          col("event_id").as("signup_id"),
          unix_micros(col("ts")).as("lo"))
        .withColumn("hi", col("lo") + expr("3600000000"))
      val clicks = events.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"),
          col("event_id").as("click_id"),
          unix_micros(col("ts")).as("pt"))
      rangeJoin(clicks, signups, "c_user", "s_user",
          "pt", "lo", "hi", binMicros = 3600000000L)
        .select(col("signup_id"), col("click_id"),
          (col("pt") - col("lo")).as("delay_us"))
    })
  )

  /** q104 and q104a share one oracle — binning (and the bin-width
    * source) is an execution detail the declarative overlap join
    * never sees. */
  def oracleSql: Map[String, String] = Map(
    "q104a_interval_overlap_auto" ->
      """WITH s AS (SELECT user_id, event_id AS signup_id,
                           epoch_us(ts) AS s_lo,
                           epoch_us(ts) + 7200000000 AS s_hi
                    FROM events WHERE event_type = 'signup'),
            p AS (SELECT user_id, event_id AS purchase_id,
                         epoch_us(ts) AS p_lo,
                         epoch_us(ts) + 3600000000 AS p_hi
                  FROM events WHERE event_type = 'purchase')
         SELECT s.signup_id, p.purchase_id,
                least(s.s_hi, p.p_hi) - greatest(s.s_lo, p.p_lo)
                  AS overlap_us
         FROM s JOIN p ON s.user_id = p.user_id
          AND s.s_lo <= p.p_hi AND p.p_lo <= s.s_hi""",
    "q104_interval_overlap" ->
      """WITH s AS (SELECT user_id, event_id AS signup_id,
                           epoch_us(ts) AS s_lo,
                           epoch_us(ts) + 7200000000 AS s_hi
                    FROM events WHERE event_type = 'signup'),
            p AS (SELECT user_id, event_id AS purchase_id,
                         epoch_us(ts) AS p_lo,
                         epoch_us(ts) + 3600000000 AS p_hi
                  FROM events WHERE event_type = 'purchase')
         SELECT s.signup_id, p.purchase_id,
                least(s.s_hi, p.p_hi) - greatest(s.s_lo, p.p_lo)
                  AS overlap_us
         FROM s JOIN p ON s.user_id = p.user_id
          AND s.s_lo <= p.p_hi AND p.p_lo <= s.s_hi""",
    "q48_range_join" ->
      """SELECT s.event_id AS signup_id, c.event_id AS click_id,
                epoch_us(c.ts) - epoch_us(s.ts) AS delay_us
         FROM events s JOIN events c
           ON c.user_id = s.user_id
          AND s.event_type = 'signup' AND c.event_type = 'click'
          AND epoch_us(c.ts) >= epoch_us(s.ts)
          AND epoch_us(c.ts) <= epoch_us(s.ts) + 3600000000"""
  )
}
