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

  /** INTERVAL-overlap join — both sides are intervals; a pair matches
    * iff [aLo,aHi] ∩ [bLo,bHi] ≠ ∅ (closed ends, touching counts).
    * Same binned equi-join shape as [[rangeJoin]], with the classic
    * dedup refinement the two-sided form needs: overlapping intervals
    * can share MANY bins, so the join keeps only the CANONICAL bin —
    * the one containing the intersection's start, max(aLo,bLo) — and
    * every true pair is emitted exactly once with no distinct. Both
    * sides explode over their covered bins, so the equi-join stays
    * hash-partitioned on (key, bin) — no inequality-driven BNLJ. */
  def intervalOverlapJoin(
      a: DataFrame, b: DataFrame,
      aKey: String, bKey: String,
      aLo: String, aHi: String, bLo: String, bHi: String,
      binMicros: Long): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val ax = a.withColumn("_bina",
      explode(expr(s"sequence($aLo div $binMicros, $aHi div $binMicros)")))
    val bx = b.withColumn("_binb",
      explode(expr(s"sequence($bLo div $binMicros, $bHi div $binMicros)")))
    ax.join(bx,
        ax(aKey) === bx(bKey) && col("_bina") === col("_binb") &&
          col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
          col("_bina") ===
            expr(s"greatest($aLo, $bLo) div $binMicros"))
      .drop("_bina", "_binb")
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

  def oracleSql: Map[String, String] = Map(
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
