package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Behavioral event analytics: gap-based sessionization (the batch
  * twin of the streaming sessionizer) and ordered funnel conversion —
  * the sequential-pattern operators every event warehouse runs.
  *
  * Both use `unix_micros` arithmetic (the repo's epoch_us oracle
  * convention — events carry micro-aligned timestamps), so the gap and
  * ordering comparisons are exact integer math in both engines.
  */
object EventOps {

  /** Declared FIRST: object vals initialize in declaration order, and
    * [[DefaultPattern]]'s gap windows multiply this — a forward
    * reference would silently read 0 and collapse every window. */
  private[graft] val DayUs = 86400000000L

  private def events(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))

  /** q61: gap-based sessionization — a session breaks when the gap to
    * the previous event of the same user exceeds `gapMinutes`. The
    * classic two-window form: lag → boundary flag → running sum as the
    * session index; both windows share one (user_id)-keyed shuffle and
    * session state never materializes (contrast the streaming twin,
    * which must carry bounded per-user state). Output: per-session
    * stats. Scale: the partition key is user_id — millions of small
    * partitions, no global window anywhere. */
  def sessionize(
      spark: SparkSession, sfDir: String, gapMinutes: Int = 30): DataFrame =
    sessionizeOn(events(spark, sfDir), gapMinutes)

  /** [[sessionize]] over any (event_id, user_id, event_type, us) frame —
    * fixture-injectable (the CurationOps `*On` pattern). */
  def sessionizeOn(e: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val order = Window.partitionBy("user_id").orderBy("us", "event_id")
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("brk",
        when(col("us") - lag("us", 1).over(order) > gapUs, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_idx", sum("brk").over(run))
      .groupBy("user_id", "session_idx").agg(
        count(lit(1)).as("n_events"),
        min("us").as("start_us"),
        max("us").as("end_us"),
        countDistinct("event_type").as("n_types"))
  }

  /** q60: ordered funnel view → click → purchase. Stage n counts only
    * events STRICTLY AFTER the user's stage n−1 time (min-after
    * semantics: the earliest qualifying event at each stage), so a
    * purchase before the first view never converts.
    *
    * Single-pass form: ONE scan and ONE user-keyed shuffle (the naive
    * per-stage filter-join shape scans the event table once per stage —
    * 4 scans and 8 exchanges at 100 TB). Two chained running-min window
    * columns implement the strict-after chain exactly: for any event
    * after a user's first view, `min view so far` IS the user's global
    * first-view time (the minimum only ever decreases to it), so
    * `click AND us > min_view_so_far` qualifies precisely the clicks
    * the join form keeps; same argument one stage up. Equal-timestamp
    * ties can't leak through either: the conditions are strict, so an
    * event never qualifies against a same-µs prior stage regardless of
    * window row order. The final per-user aggregate reuses the window's
    * hash partitioning — no second exchange. */
  def funnel(spark: SparkSession, sfDir: String): DataFrame =
    funnelOn(events(spark, sfDir))

  /** [[funnel]] over any (user_id, event_type, us) frame, for an
    * arbitrary ordered stage chain (default: the q60 oracle's
    * view → click → purchase; output columns are `<stage>_us`). Each
    * stage adds one qualifying-event column (`event is stage i AND
    * strictly after the running min of stage i−1`) and one running-min
    * window column — all over the SAME user-keyed sort, so the chain
    * length never adds shuffles, only expressions. */
  def funnelOn(
      e: DataFrame,
      stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct, got $stages")
    val w = Window.partitionBy("user_id").orderBy("us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // q_i: this event's us if it qualifies for stage i; m_i: running min
    val withQ = stages.zipWithIndex.foldLeft(e) { case (df, (st, i)) =>
      val qual =
        if (i == 0) when(col("event_type") === st, col("us"))
        else when(col("event_type") === st && col("us") > col(s"_m${i - 1}"),
          col("us"))
      val d2 = df.withColumn(s"_q$i", qual)
      if (i < stages.size - 1) d2.withColumn(s"_m$i", min(s"_q$i").over(w))
      else d2
    }
    val stageCols = stages.zipWithIndex.map { case (st, i) =>
      min(col(s"_q$i")).as(s"${st}_us")
    }
    val reached = stages.tail.zipWithIndex.foldLeft(lit(1)) {
      case (acc, (st, _)) =>
        acc + when(col(s"${st}_us").isNotNull, 1).otherwise(0)
    }
    withQ.groupBy("user_id").agg(stageCols.head, stageCols.tail: _*)
      .filter(col(s"${stages.head}_us").isNotNull)
      .select(col("user_id") +: stages.map(st => col(s"${st}_us")) :+
        reached.cast("int").as("stage"): _*)
  }

  /** q131: FUNNEL CONVERSION LAG — how LONG each funnel step takes,
    * the second question every funnel report answers after q60's how
    * MANY: per adjacent stage pair over [[funnelOn]]'s per-user stage
    * timestamps, the converted-user count and the exact
    * p50/p90/mean of (next stage − previous stage) in micros.
    * Integer lags from the q60 chain (strictly-after semantics, so
    * every lag is positive); percentiles interpolate on the exact
    * per-user lag sets (the q117 percentile kernel) and round to the
    * 2-dp grid. Output (step, transition, n_converted, p50_us,
    * p90_us, mean_us).
    *
    * Scale shape: q60's ONE user-keyed shuffle, then a stage-pair
    * union on the users-sized frame into a 2-row grouped percentile
    * — nothing re-touches event volume. */
  def funnelLag(spark: SparkSession, sfDir: String): DataFrame =
    funnelLagOn(funnelOn(events(spark, sfDir)))

  /** [[funnelLag]] over any [[funnelOn]]-shaped stage-times frame. */
  private[graft] def funnelLagOn(
      f0: DataFrame,
      stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val f = graft.operators.Persists.barrier(f0)
    val pairs = stages.sliding(2).toSeq.zipWithIndex.map {
      case (Seq(a, b), i) =>
        f.filter(col(s"${a}_us").isNotNull && col(s"${b}_us").isNotNull)
          .select(lit(i + 1).as("step"),
            lit(s"$a->$b").as("transition"),
            (col(s"${b}_us") - col(s"${a}_us")).as("lag_us"))
      case _ => sys.error("unreachable: sliding(2) on nonempty stages")
    }
    pairs.reduce(_ unionByName _)
      .groupBy("step", "transition")
      .agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(lag_us, 0.5d)"), 2).as("p50_us"),
        round(expr("percentile(lag_us, 0.9d)"), 2).as("p90_us"),
        round(avg("lag_us"), 2).as("mean_us"))
  }

  /** q131's DuckDB twin: q60's funnel CTEs, the same pair union and
    * interpolated percentiles on the same 2-dp grid. */
  private[graft] val funnelLagOracle: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
                  FROM events),
        v AS (SELECT user_id, min(us) AS view_us FROM e
              WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(e.us) AS click_us
              FROM e JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.us > v.view_us
              GROUP BY 1),
        p AS (SELECT e.user_id, min(e.us) AS purchase_us
              FROM e JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.us > c.click_us
              GROUP BY 1),
        lags AS (
          SELECT 1 AS step, 'view->click' AS transition,
                 c.click_us - v.view_us AS lag_us
          FROM v JOIN c ON v.user_id = c.user_id
          UNION ALL
          SELECT 2, 'click->purchase', p.purchase_us - c.click_us
          FROM c JOIN p ON c.user_id = p.user_id)
      SELECT step, transition, count(*) AS n_converted,
             round(quantile_cont(lag_us, 0.5), 2) AS p50_us,
             round(quantile_cont(lag_us, 0.9), 2) AS p90_us,
             round(avg(lag_us), 2) AS mean_us
      FROM lags GROUP BY 1, 2"""

  /** q132: MARKOV REMOVAL-EFFECT ATTRIBUTION (Anderl et al. 2016 —
    * the data-driven attribution model that replaced last-touch in
    * marketing analytics): model user journeys as a first-order
    * Markov chain over session event-type paths (START → … →
    * CONV/NULL absorbing states; q61's 30-min session gap, paths
    * truncated at the first conversion), then score each channel by
    * its REMOVAL EFFECT — how much the absorbing-into-CONV
    * probability from START drops when every visit to that channel
    * is lost: removal_c = 1 − P_c(conv)/P(conv), shares normalized
    * over channels. q115's last-touch and q126's raw matrix are the
    * inputs-level views; this is the counterfactual one.
    *
    * Absorption probabilities run `iters` fixed synchronous
    * Jacobi rounds (p ← P·p with CONV ≡ 1, NULL ≡ 0; a removed
    * channel is read as 0), each round re-gridded at 9 dp in BOTH
    * engines (the s18 re-entry discipline) so the fixed-round form
    * is engine-identical; the spec measures convergence well inside
    * the grid by round 30 on the gate data. The transition matrix is
    * collected to the driver for the solve — a BOUNDED model collect
    * ((|event_types|+1)·(|event_types|+2) ≤ 42 rows on this schema),
    * not data; the corpus-sized work (sessionize + truncate + pair
    * counts) all stays distributed, and the oracle unrolls the same
    * rounds as MATERIALIZED CTEs.
    *
    * Scale shape: one user-keyed session sort + a types²-bounded
    * count agg (the q126 argument); the solve touches ≤ 42 numbers
    * per channel. Output (channel, removal_effect,
    * attribution_share), 6 dp. */
  def markovAttribution(spark: SparkSession, sfDir: String): DataFrame =
    markovAttributionOn(events(spark, sfDir))

  /** [[markovAttribution]] over any (event_id, user_id, event_type,
    * us) frame. */
  private[graft] def markovAttributionOn(e: DataFrame,
      gapUs: Long = 1800000000L, iters: Int = 30,
      conversion: String = "purchase"): DataFrame = {
    val spark = e.sparkSession
    val order = Window.partitionBy("user_id").orderBy("us", "event_id")
    val run = order.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val sessions = e
      .withColumn("brk",
        when(col("us") - lag("us", 1).over(order) > gapUs, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_idx", sum("brk").over(run))
      .groupBy("user_id", "session_idx")
      .agg(expr("""transform(sort_array(collect_list(
             struct(us, event_id, event_type))),
             s -> s.event_type)""").as("types"))
    val counts = sessions.select(explode(expr(
      s"""CASE WHEN array_position(types, '$conversion') > 0
           THEN concat(
             transform(
               sequence(1, int(array_position(types, '$conversion'))),
               i -> struct(
                 IF(i = 1, 'START', element_at(types, i - 1)) AS src,
                 element_at(types, i) AS dst)),
             array(struct('$conversion' AS src, 'CONV' AS dst)))
           ELSE concat(
             transform(sequence(1, size(types)),
               i -> struct(
                 IF(i = 1, 'START', element_at(types, i - 1)) AS src,
                 element_at(types, i) AS dst)),
             array(struct(element_at(types, size(types)) AS src,
                          'NULL' AS dst)))
         END""")).as("t"))
      .groupBy(col("t.src").as("src"), col("t.dst").as("dst"))
      .agg(count(lit(1)).as("n"))
    // BOUNDED collect: the transition matrix of a types-closed chain
    // — ≤ (|types|+1)·(|types|+2) rows, a model not data
    val raw = counts.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val totals = raw.groupBy(_._1).map { case (s, rs) =>
      s -> rs.map(_._3).sum.toDouble }
    // P rows sorted by dst: the fixed summation order the oracle's
    // ≤7-term aggregation agrees with on the 9-dp grid
    val pm = raw.groupBy(_._1).map { case (s, rs) =>
      s -> rs.sortBy(_._2).map { case (_, t, n) =>
        (t, r9(n / totals(s))) }.toSeq
    }
    val states = pm.keySet
    def solve(removed: Option[String]): Double = {
      var p = states.map(_ -> 0.0).toMap
      for (_ <- 1 to iters) {
        val next = states.map { s =>
          s -> r9(pm(s).map { case (t, pr) =>
            val vt =
              if (t == "CONV") 1.0
              else if (t == "NULL") 0.0
              else if (removed.contains(t)) 0.0
              else p.getOrElse(t, 0.0)
            pr * vt
          }.sum)
        }.toMap
        p = removed.fold(next)(c => next.updated(c, 0.0))
      }
      p.getOrElse("START", 0.0)
    }
    val pBase = solve(None)
    val channels = (states - "START" - conversion).toSeq.sorted
    val removals = channels.map(c => c -> r6(1.0 - solve(Some(c)) / pBase))
    val sumRem = removals.map(_._2).sum
    val out =
      if (pBase <= 0.0) Seq.empty[(String, Double, Double)]
      else removals.map { case (c, rem) =>
        (c, rem, if (sumRem == 0.0) Double.NaN else r6(rem / sumRem))
      }
    import spark.implicits._
    out.toDF("channel", "removal_effect", "attribution_share")
  }

  /** q132's DuckDB twin: the q61 session CTEs + truncation, the same
    * pair counts and 9-dp row-normalized matrix, and one unrolled
    * `iters`-round MATERIALIZED chain per (base + channel) with the
    * removed channel read as zero — the gate schema's four
    * non-conversion channels are enumerated statically. */
  private[graft] def markovAttributionOracle(iters: Int): String = {
    val channels = Seq("click", "error", "signup", "view")
    def chain(tag: String, clamp: Option[String]): String = {
      val zero = s"""${tag}0 AS (
        SELECT src, 0.0 AS p FROM (SELECT DISTINCT src FROM pm))"""
      val rounds = (1 to iters).map { k =>
        val clampArm = clamp
          .map(c => s"WHEN p.dst = '$c' THEN 0.0\n                    ")
          .getOrElse("")
        s"""$tag$k AS MATERIALIZED (
           SELECT p.src,
                  round(sum(p.pr * CASE WHEN p.dst = 'CONV' THEN 1.0
                    WHEN p.dst = 'NULL' THEN 0.0
                    ${clampArm}ELSE coalesce(q.p, 0.0) END), 9) AS p
           FROM pm p LEFT JOIN $tag${k - 1} q ON q.src = p.dst
           GROUP BY p.src)"""
      }
      (zero +: rounds).mkString(",\n")
    }
    val chains = (chain("b", None) +:
      channels.map(c => chain(s"r_$c", Some(c)))).mkString(",\n")
    val rem = channels.map { c =>
      s"""SELECT '$c' AS channel,
            round(1.0 - c.p / b.p, 6) AS removal_effect
          FROM (SELECT p FROM b$iters WHERE src = 'START') b,
               (SELECT p FROM r_$c$iters WHERE src = 'START') c
          WHERE b.p > 0"""
    }.mkString("\n          UNION ALL\n          ")
    s"""WITH e AS (SELECT event_id, user_id, event_type,
                          epoch_us(ts) AS us
                   FROM events),
       g AS (SELECT *, CASE WHEN us - lag(us) OVER
                (PARTITION BY user_id ORDER BY us, event_id)
                > 1800000000 THEN 1 ELSE 0 END AS brk FROM e),
       s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
                AS sid FROM g),
       r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
                ORDER BY us, event_id) AS rn FROM s),
       fp AS (SELECT user_id, sid,
                     min(CASE WHEN event_type = 'purchase'
                         THEN rn END) AS prn,
                     max(rn) AS mrn
              FROM r GROUP BY 1, 2),
       kept AS (SELECT r.*, fp.prn, fp.mrn
                FROM r JOIN fp USING (user_id, sid)
                WHERE fp.prn IS NULL OR r.rn <= fp.prn),
       tr1 AS (SELECT CASE WHEN rn = 1 THEN 'START'
                      ELSE lag(event_type) OVER
                        (PARTITION BY user_id, sid ORDER BY rn) END
                        AS src,
                      event_type AS dst
               FROM kept),
       term AS (SELECT CASE WHEN prn IS NOT NULL THEN 'purchase'
                       ELSE event_type END AS src,
                       CASE WHEN prn IS NOT NULL THEN 'CONV'
                       ELSE 'NULL' END AS dst
                FROM kept
                WHERE (prn IS NOT NULL AND rn = prn)
                   OR (prn IS NULL AND rn = mrn)),
       cnt AS (SELECT src, dst, count(*) AS n
               FROM (SELECT * FROM tr1 UNION ALL SELECT * FROM term)
               GROUP BY 1, 2),
       pm AS MATERIALIZED (
         SELECT src, dst,
                round(n / CAST(sum(n) OVER (PARTITION BY src)
                               AS DOUBLE), 9) AS pr
         FROM cnt),
       $chains,
       rem AS ($rem)
     SELECT channel, removal_effect,
            round(removal_effect /
                  nullif(sum(removal_effect) OVER (), 0), 6)
              AS attribution_share
     FROM rem"""
  }

  /** One stage of a [[funnelPatternOn]] sequence pattern. `optional`
    * stages are measured but never gate the chain (the anchor the next
    * stage matches after advances on REQUIRED stages only — the
    * single-assignment semantics that stays arrival-order-invariant
    * and window-computable; a greedy "optional advances the anchor
    * when matched" would let a LATER optional event invalidate an
    * earlier completion). `maxGapUs` bounds the stage to a window
    * after the current anchor: the event must land in
    * (anchor, anchor + maxGapUs]. */
  final case class PatternStage(
      name: String, optional: Boolean = false, maxGapUs: Option[Long] = None)

  /** q67: regex-style sequence patterns over per-user event streams —
    * [[funnelOn]]'s strict-after chain generalized with optional
    * stages and within-T windows (the MATCH_RECOGNIZE-lite every
    * event warehouse grows).
    *
    * Same single-pass shape as q60: ONE scan, ONE user-keyed shuffle,
    * one qualifying-event column + one running-min column per stage —
    * pattern length adds expressions, never shuffles. The q60
    * exactness argument survives both extensions because the running
    * anchor at any row is NULL-or-exact (the anchor event precedes
    * every candidate in the window order), so each row's
    * gap-qualification is evaluated against the true anchor: a
    * required stage out of its window kills the chain (NULL anchor
    * disqualifies everything after), an optional stage records its
    * earliest in-window event without moving the anchor. */
  /** The gated q67 pattern — ALSO the q68 streaming twin's pattern (one
    * constant, so batch and stream can never drift from the shared
    * oracle). */
  val DefaultPattern: Seq[PatternStage] = Seq(
    PatternStage("view"),
    PatternStage("click", maxGapUs = Some(3L * DayUs)),
    PatternStage("signup", optional = true, maxGapUs = Some(3L * DayUs)),
    PatternStage("purchase", maxGapUs = Some(7L * DayUs)))

  /** [[funnelPatternOn]] over the events table with [[DefaultPattern]]:
    * a required stage out of its window kills the chain (NULL anchor
    * disqualifies everything after it), an optional stage records its
    * earliest in-window event without moving the anchor. */
  def funnelPattern(spark: SparkSession, sfDir: String): DataFrame =
    funnelPatternOn(events(spark, sfDir), DefaultPattern)

  /** [[funnelPattern]] over any (user_id, event_type, us) frame for an
    * arbitrary stage pattern (names must be distinct; the first stage
    * anchors the chain and is required). Output: `<stage>_us` per
    * stage plus `matched`, the count of matched stages; users missing
    * the first stage are dropped (q60 convention). */
  def funnelPatternOn(e: DataFrame, pattern: Seq[PatternStage]): DataFrame = {
    require(pattern.nonEmpty, "pattern needs at least one stage")
    require(pattern.map(_.name).distinct.size == pattern.size,
      s"pattern stages must be distinct, got ${pattern.map(_.name)}")
    require(!pattern.head.optional, "the first stage anchors the chain")
    val w = Window.partitionBy("user_id").orderBy("us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // _q_i: this event's us if it matches stage i in its window after
    // the running anchor; _t_i: running min of _q_i (the anchor source)
    var anchorIdx = 0 // index of the last REQUIRED stage before i
    val withQ = pattern.zipWithIndex.foldLeft(e) { case (df, (st, i)) =>
      val qual =
        if (i == 0) when(col("event_type") === st.name, col("us"))
        else {
          val anchor = col(s"_t$anchorIdx")
          val inWindow = st.maxGapUs
            .map(g => col("us") <= anchor + g).getOrElse(lit(true))
          when(col("event_type") === st.name &&
            col("us") > anchor && inWindow, col("us"))
        }
      val d2 = df.withColumn(s"_q$i", qual)
        .withColumn(s"_t$i", min(s"_q$i").over(w))
      if (!st.optional) anchorIdx = i
      d2
    }
    val stageCols = pattern.zipWithIndex.map { case (st, i) =>
      min(col(s"_q$i")).as(s"${st.name}_us")
    }
    val matched = pattern.foldLeft(lit(0)) { case (acc, st) =>
      acc + when(col(s"${st.name}_us").isNotNull, 1).otherwise(0)
    }
    withQ.groupBy("user_id").agg(stageCols.head, stageCols.tail: _*)
      .filter(col(s"${pattern.head.name}_us").isNotNull)
      .select(col("user_id") +:
        pattern.map(st => col(s"${st.name}_us")) :+
        matched.cast("int").as("matched"): _*)
  }

  /** q62: retention cohorts — users grouped by first-seen day, counted
    * on each later active day as an offset from their cohort day (the
    * matrix behind every retention curve). Day arithmetic is integer
    * division on epoch-micros, exact in both engines. Scale: first-seen
    * is a whole-partition window min riding ONE user-keyed shuffle of
    * ONE events scan (the agg-then-self-join form scans and shuffles
    * the events twice — PlanAudit r5 showed scans=2, exchanges=4), then
    * one distinct-count on a bounded (cohort, offset) key space. */
  def retention(spark: SparkSession, sfDir: String): DataFrame =
    retentionOn(events(spark, sfDir))

  /** [[retention]] over any (user_id, us) frame. */
  def retentionOn(e0: DataFrame): DataFrame =
    retentionOnDays(
      e0.select(col("user_id"), expr(s"us div $DayUs").as("day")))

  /** The cohort × offset matrix from a (user_id, day) activity frame —
    * the post-distinct half, shared with the streaming form (q64).
    * `min(day) over (partition by user_id)` attaches the cohort day in
    * the same pass that shuffles on user_id — no second events
    * scan/exchange like the aggregate-plus-join form needed. */
  def retentionOnDays(e: DataFrame): DataFrame =
    e.withColumn("cohort_day", min("day").over(Window.partitionBy("user_id")))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_off"))
      .agg(countDistinct("user_id").as("users"))

  /** q107: time-series RESAMPLE — gap-fill + linear interpolation of
    * the daily value curve per event type, the regularization step
    * before any forecasting / anomaly model trains on event telemetry.
    * Three declarative stages: (1) the observed daily means (one
    * partial-agg pass), (2) the dense day grid per series via
    * `sequence`/`explode` of the series' own [min, max] span —
    * generated in the projection, no row explosion beyond the calendar
    * — left-joined to the observations, (3) interpolation from four
    * ignore-nulls window columns (prev/next observed value and day)
    * sharing ONE series-keyed sort: filled = pv + (nv−pv)·(d−pd)/(nd−pd).
    * Endpoints are always observed (the grid spans observed days), so
    * no boundary extrapolation case exists. Scale: the shuffle key is
    * the series id and a series' grid is bounded by CALENDAR DAYS, not
    * rows — a 100 TB events table still interpolates over |series| ×
    * |days| cells; the heavy side is stage 1's partial agg, which
    * combines map-side. Arithmetic mirrors the DuckDB twin op for op
    * over 6-dp-rounded anchors, so the fill is hash-exact. */
  def gapfillInterpolate(spark: SparkSession, sfDir: String): DataFrame =
    gapfillInterpolateOn(Tables.load(spark, sfDir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr(s"unix_micros(ts) div $DayUs").as("day"), col("value")))

  /** [[gapfillInterpolate]] over any (event_type, day, value) frame —
    * fixture-injectable (the [[sessionizeOn]] pattern). */
  def gapfillInterpolateOn(e: DataFrame): DataFrame = {
    val daily = e.groupBy("event_type", "day")
      .agg(round(avg("value"), 6).as("v"))
    val grid = daily.groupBy("event_type")
      .agg(min("day").as("lo"), max("day").as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"))).as("day"))
    val wb = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(daily, Seq("event_type", "day"), "left")
      .withColumn("pv", last("v", ignoreNulls = true).over(wb))
      .withColumn("pd",
        last(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wb))
      .withColumn("nv", first("v", ignoreNulls = true).over(wf))
      .withColumn("nd",
        first(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wf))
      .select(col("event_type"), col("day"),
        round(when(col("v").isNotNull, col("v")).otherwise(
          col("pv") + ((col("nv") - col("pv")) *
            (col("day") - col("pd")).cast("double")) /
            (col("nd") - col("pd")).cast("double")), 6).as("value_filled"),
        when(col("v").isNull, 1).otherwise(0).cast("int").as("filled"))
  }

  /** q111: rolling z-score anomaly detection — the streaming-telemetry
    * outlier flag every event pipeline computes before a value feeds a
    * model: each event's value scored against the TRAILING window of
    * its series (the current row is excluded from its own baseline, so
    * a spike can't mask itself). One series-keyed sort carries all
    * four window columns (count / sum / sum-of-squares over ROWS
    * [lookback PRECEDING, 1 PRECEDING]); mean and the sample variance
    * derive arithmetically, events with fewer than `minN` predecessors
    * or a degenerate (≤0 after 6-dp rounding) variance are unscored
    * and dropped. Scale: the partition key is the series (event_type
    * here; (entity, metric) in production) — the window never sees
    * more than `lookback` rows per frame and no global sort exists.
    * Determinism: values are 6-dp-rounded at source, every windowed
    * sum and each derived stat is 6-dp-rounded before the next step,
    * and the sort key (us, event_id) is unique — the PR-oracle
    * re-entry discipline applied to sliding frames. */
  def rollingZscore(spark: SparkSession, sfDir: String): DataFrame =
    rollingZscoreOn(Tables.load(spark, sfDir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value")))

  /** [[rollingZscore]] over any (event_id, event_type, us, value)
    * frame — fixture-injectable (the [[sessionizeOn]] pattern). */
  def rollingZscoreOn(e: DataFrame, lookback: Int = 20, minN: Int = 10,
      threshold: Double = 3.0): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("us", "event_id")
      .rowsBetween(-lookback, -1)
    e.withColumn("v", round(col("value"), 6))
      .withColumn("n", count("v").over(w))
      .withColumn("s1", round(sum("v").over(w), 6))
      .withColumn("s2", round(sum(col("v") * col("v")).over(w), 6))
      .filter(col("n") >= minN)
      .withColumn("mean", round(col("s1") / col("n"), 6))
      .withColumn("vr", round(
        (col("s2") - col("s1") * col("s1") / col("n")) /
          (col("n") - lit(1)), 6))
      .filter(col("vr") > 0)
      .withColumn("z",
        round((col("v") - col("mean")) / sqrt(col("vr")), 4))
      .select(col("event_id"), col("event_type"), col("us"),
        col("v").as("value"), col("z"),
        (abs(col("z")) > threshold).cast("int").as("is_anomaly"))
  }

  /** q112: first-order event-transition matrix (the Markov-chain
    * summary of per-user behavior — the sequence prior a behavioral
    * model or session simulator trains on): consecutive event-type
    * bigrams per user, counted globally, with the per-source-state
    * transition probability. One user-keyed sort carries the lag, the
    * bigram count partial-aggregates map-side, and the probability
    * normalizer is a window over the |types|² matrix — bounded by the
    * TYPE VOCABULARY, not the event volume, so the final stage is
    * tiny at any scale. */
  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame =
    eventTransitionsOn(events(spark, sfDir))

  /** [[eventTransitions]] over any (event_id, user_id, event_type, us)
    * frame. */
  def eventTransitionsOn(e: DataFrame): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("us", "event_id")
    e.withColumn("prev_type", lag("event_type", 1).over(order))
      .filter(col("prev_type").isNotNull)
      .select(col("prev_type"), col("event_type").as("next_type"))
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(
        col("n") / sum("n").over(Window.partitionBy("prev_type")), 6))
  }

  /** q115: LAST-TOUCH attribution — each conversion credited to the
    * most recent preceding marketing touch within the lookback
    * window, else 'none' (organic). The funnel family's revenue twin:
    * where q60 asks "did the chain complete", attribution asks "which
    * channel gets the credit". Two ignore-nulls window columns (the
    * last touch's time and type) on ONE user-keyed sort — the q60
    * single-pass discipline; a same-microsecond touch counts as
    * preceding via the (us, event_id) row order, mirrored in the
    * oracle's identical frame. The final rollup is bounded by the
    * touch-type vocabulary. Revenue follows the repo's money
    * discipline: 2-dp at source, summed, 2-dp served (sum-order noise
    * ~1e-10 vs the 2-dp grid — the documented negligible class). */
  def lastTouchAttribution(spark: SparkSession, sfDir: String): DataFrame =
    lastTouchAttributionOn(Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value")))

  /** [[lastTouchAttribution]] over any (event_id, user_id, event_type,
    * us, value) frame. */
  def lastTouchAttributionOn(e: DataFrame,
      touchTypes: Seq[String] = Seq("view", "click"),
      convType: String = "purchase",
      windowUs: Long = 7L * DayUs): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin(touchTypes: _*)
    e.withColumn("t_us",
        last(when(isTouch, col("us")), ignoreNulls = true).over(w))
      .withColumn("t_type",
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === convType)
      .withColumn("touch",
        when(col("t_us").isNotNull &&
          col("us") - col("t_us") <= windowUs, col("t_type"))
          .otherwise(lit("none")))
      .groupBy("touch")
      .agg(count(lit(1)).as("n_conversions"),
        round(sum(round(coalesce(col("value"), lit(0.0)), 2)), 2)
          .as("revenue"))
  }

  /** q116: CONCURRENCY SWEEP — the classic interval-stabbing timeline:
    * each signup opens a half-open 2-hour session `[us, us + 2h)`, and
    * the output is the number of simultaneously-open sessions after
    * every boundary instant (the peak is one `max` away). The sweep is
    * the +1/−1 trick: +1 at each `lo`, −1 at each `hi`, net per
    * instant, running sum. The running sum is the scale problem — a
    * single unpartitioned window serializes the corpus through one
    * task — so it runs as a TWO-LEVEL distributed prefix sum: in-DAY
    * cumulative sums under a day-partitioned window (parallel across
    * days) plus a day-level base offset from a calendar-bounded rollup
    * (|days| rows — the only unpartitioned window, explicitly bounded
    * by the calendar, never by event volume). Exact integer counts
    * end to end; the oracle is the single flat cumulative sum. */
  def concurrency(spark: SparkSession, sfDir: String): DataFrame =
    concurrencyOn(Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "signup")
      .select(unix_micros(col("ts")).as("lo"),
        (unix_micros(col("ts")) + 7200000000L).as("hi")))

  /** [[concurrency]] over any half-open (lo, hi) interval frame. */
  def concurrencyOn(iv: DataFrame): DataFrame = {
    val b = iv.select(col("lo").as("t"), lit(1L).as("d"))
      .unionAll(iv.select(col("hi").as("t"), lit(-1L).as("d")))
    // barriered: net feeds BOTH the day rollup and the final join —
    // unbarriered, the boundary union + agg ran twice (plan audit:
    // scans=4 on the events fixture)
    val net = graft.operators.Persists.barrier(
      b.groupBy("t").agg(sum("d").as("net"))
        .withColumn("day", expr(s"t div $DayUs")))
    // calendar-bounded rollup: one row per day — the unpartitioned
    // window runs over |days| rows, not |events|
    val dayBase = net.groupBy("day").agg(sum("net").as("day_net"))
      .withColumn("base", coalesce(sum("day_net").over(
        Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("day", "base")
    net.join(dayBase, "day")
      .withColumn("conc", col("base") + sum("net").over(
        Window.partitionBy("day").orderBy("t")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("t"), col("net"), col("conc"))
  }

  /** q117: MAD-based robust outlier detection — the heavy-tail
    * complement to q111's rolling z-score: median and median absolute
    * deviation are 50%-breakdown statistics, so a contaminated series
    * can't drag its own threshold the way mean/stddev let it. Two
    * grouped EXACT percentiles (the oracle anchor — a 100 TB run swaps
    * in the q70 approx-percentile sketch, same plan shape), each
    * followed by a |types|-row broadcast join back; robust z =
    * (v − med) / (1.4826 · mad) with every statistic 6-dp-rounded at
    * the re-entry and rz served at 4 dp; zero-MAD series (over half
    * the values at the median) are excluded — a scale-free threshold
    * is meaningless there (both engines). */
  def madOutliers(spark: SparkSession, sfDir: String): DataFrame =
    madOutliersOn(Tables.load(spark, sfDir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 6).as("v")))

  /** [[madOutliers]] over any (event_id, event_type, v) frame. */
  def madOutliersOn(e0: DataFrame): DataFrame =
    madFlag(e0, Seq("event_id"))
      .withColumnRenamed("v", "value")
      .select("event_id", "event_type", "value", "med", "mad", "rz",
        "is_outlier")

  /** The robust-z MAD kernel shared by q117 (raw per-event values)
    * and q130 (Holt forecast residuals per day): per event_type exact
    * median and MAD on the 6-dp grid, |rz| > 3.5 flag; `idCols` ride
    * through untouched. */
  private def madFlag(e0: DataFrame, idCols: Seq[String]): DataFrame = {
    val e = graft.operators.Persists.barrier(e0)
    val med = e.groupBy("event_type")
      .agg(round(expr("percentile(v, 0.5d)"), 6).as("med"))
    val dev = graft.operators.Persists.barrier(
      e.join(broadcast(med), "event_type")
        .withColumn("dev", round(abs(col("v") - col("med")), 6)))
    val mad = dev.groupBy("event_type")
      .agg(round(expr("percentile(dev, 0.5d)"), 6).as("mad"))
    dev.join(broadcast(mad), "event_type")
      .filter(col("mad") > 0)
      .withColumn("rz",
        round((col("v") - col("med")) / (lit(1.4826) * col("mad")), 4))
      .select((idCols.map(col) ++ Seq(col("event_type"), col("v"),
        col("med"), col("mad"), col("rz"),
        (abs(col("rz")) > 3.5).cast("int").as("is_outlier"))): _*)
  }

  /** q130: FORECAST-RESIDUAL ANOMALIES — q128's Holt smoother and
    * q117's robust-z kernel composed into the standard model-based
    * anomaly detector: a day is anomalous when the ACTUAL daily total
    * sits far from the one-step-ahead FORECAST, measured in
    * median/MAD units of that series' own residual distribution.
    * Catches what the primitives alone miss: q111/q117 flag raw
    * outliers (a legitimately growing series trips them), while the
    * residual of a trend-following forecast is level- and
    * trend-invariant. resid = v − fitted on the 6-dp grid (first day
    * per type has no forecast and is excluded in both engines), then
    * the q117 kernel verbatim per event_type. Output (day,
    * event_type, resid, med, mad, rz, is_anomaly).
    *
    * Scale shape: q128's series-frame fold, then two exact grouped
    * percentiles + two broadcast joins on the days×types frame —
    * nothing here ever re-touches event volume. */
  def holtAnomalies(spark: SparkSession, sfDir: String): DataFrame =
    holtAnomaliesOn(holtDaily(spark, sfDir))

  /** [[holtAnomalies]] over any [[holtOn]]-shaped smoother output. */
  private[graft] def holtAnomaliesOn(holt: DataFrame): DataFrame =
    madFlag(holt
      .filter(col("fitted").isNotNull)
      .select(col("event_type"), col("day"),
        round(col("v") - col("fitted"), 6).as("v")), Seq("day"))
      .select(col("day"), col("event_type"), col("v").as("resid"),
        col("med"), col("mad"), col("rz"),
        col("is_outlier").as("is_anomaly"))

  /** q130's DuckDB twin: q128's recursive-CTE oracle as the series
    * CTE, the q117 oracle arithmetic verbatim over the residuals.
    * A `def`, not a val: it interpolates [[holtOracle]], which is
    * declared LATER in this object — a val here would read null at
    * init (the DefaultPattern declaration-order trap at the top of
    * this file). */
  private[graft] def holtAnomalyOracle: String =
    s"""WITH h AS ($holtOracle),
       e AS (SELECT event_type, day, round(v - fitted, 6) AS v
             FROM h WHERE fitted IS NOT NULL),
       m AS (SELECT event_type, round(quantile_cont(v, 0.5), 6) AS med
             FROM e GROUP BY event_type),
       d AS (SELECT e.day, e.event_type, e.v, m.med,
                    round(abs(e.v - m.med), 6) AS dev
             FROM e JOIN m USING (event_type)),
       md AS (SELECT event_type,
                     round(quantile_cont(dev, 0.5), 6) AS mad
              FROM d GROUP BY event_type)
     SELECT d.day, d.event_type, d.v AS resid, d.med, md.mad,
            round((d.v - d.med) / (1.4826 * md.mad), 4) AS rz,
            CAST(abs(round((d.v - d.med) / (1.4826 * md.mad), 4)) > 3.5
                 AS INTEGER) AS is_anomaly
     FROM d JOIN md USING (event_type) WHERE md.mad > 0"""

  /** q119: grouped TREND — ordinary least squares of value on
    * epoch-day per series, from the five classical sums (n, Σx, Σy,
    * Σxy, Σx²) in ONE grouped aggregation pass: slope =
    * (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), intercept = (Σy − slope·Σx)/n.
    * The drift detector that catches slow decay where q111/q117 catch
    * spikes. One partial-agg shuffle of five doubles per series — no
    * window, no second pass, embarrassingly scalable; x is the small
    * integer day index so the x-side sums are integer-exact, slope
    * and intercept are 6-dp-rounded at serve (the scalar arithmetic
    * after the sums is single-rounded IEEE, deterministic given the
    * sums). Zero-variance-x series (single active day) are excluded
    * in both engines. */
  def trendOls(spark: SparkSession, sfDir: String): DataFrame =
    trendOlsOn(Tables.load(spark, sfDir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        round(col("value"), 6).as("v")))

  /** [[trendOls]] over any (event_type, day, v) frame. */
  def trendOlsOn(e: DataFrame): DataFrame =
    e.groupBy("event_type")
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("day").cast("double")).as("sx"),
        sum(col("v")).as("sy"),
        sum(col("day") * col("v")).as("sxy"),
        sum((col("day") * col("day")).cast("double")).as("sxx"))
      .filter(col("n") * col("sxx") - col("sx") * col("sx") > 0)
      .withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
      .select(col("event_type"), col("n").cast("long").as("n"),
        round(col("slope"), 6).as("slope"),
        round((col("sy") - col("slope") * col("sx")) / col("n"), 6)
          .as("intercept"))

  /** q120: session PATH analysis — the product-analytics "what do
    * sessions look like" query: q61's gap-sessionization re-derived
    * on the same single user-keyed sort, each session reduced to the
    * '>'-joined sequence of its FIRST `maxLen` event types, paths
    * counted globally, top `k` served under a (count desc, path)
    * total order so the limit is deterministic. The per-session
    * reduce is `sort_array(collect_list(struct(us, event_id,
    * type)))` — the unique (us, event_id) sort key makes the
    * collected order deterministic despite collect_list's
    * arrival-order freedom (both engines agree; the oracle's
    * `string_agg ... ORDER BY` is the same contract). Paths are
    * capped at `maxLen`, so reduce state is bounded per session. */
  def sessionPaths(spark: SparkSession, sfDir: String): DataFrame =
    sessionPathsOn(events(spark, sfDir))

  /** [[sessionPaths]] over any (event_id, user_id, event_type, us)
    * frame. */
  def sessionPathsOn(e: DataFrame, gapMinutes: Int = 30,
      maxLen: Int = 5, k: Int = 20): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val order = Window.partitionBy("user_id").orderBy("us", "event_id")
    val run = order.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    e.withColumn("brk",
        when(col("us") - lag("us", 1).over(order) > gapUs, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_idx", sum("brk").over(run))
      .groupBy("user_id", "session_idx")
      .agg(expr(
        s"""array_join(transform(
              slice(sort_array(collect_list(
                struct(us, event_id, event_type))), 1, $maxLen),
              s -> s.event_type), '>')""").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  // -------------------------------------------- exponential smoothing
  private val EwmaLookback = 20
  private val EwmaAlpha = 0.25

  /** q122: EWMA TREND over the daily event series — the exponentially
    * weighted moving average (the standard smoother next to q111's
    * rolling z-score and q119's OLS trend), in the FINITE-window
    * normalized form: over the last `lookback` days of each type's
    * series, ewma = Σ x_j·(1−α)^(m−1−j) / Σ (1−α)^(m−1−j), newest
    * weighted heaviest. The frame is a bounded ROWS window, weights
    * come from an indexed transform over the frame-ordered list (both
    * engines index the list explicitly — no fold-order dependence),
    * and the result rounds to 4 dp. The day series is q26's daily
    * aggregation verbatim (sv coalesced so a null never desyncs
    * Spark's null-skipping collect_list from DuckDB's null-keeping
    * list()).
    *
    * Scale shape: one per-type day-ordered window over the DAILY
    * frame (series-sized — days × types, not event volume), frames
    * bounded at `lookback` elements. The event-volume stage is the
    * q26 partial-agg'd groupBy. */
  def ewmaDaily(spark: SparkSession, sfDir: String): DataFrame =
    ewmaOn(Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"),
        col("event_type"))
      .agg(round(coalesce(sum("value"), lit(0.0)), 2).as("v")))

  /** [[ewmaDaily]] over any (event_type, day, v) series frame. */
  private[graft] def ewmaOn(series: DataFrame,
      lookback: Int = EwmaLookback,
      alpha: Double = EwmaAlpha): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-(lookback - 1), 0)
    val decay = 1.0 - alpha
    series
      .withColumn("xs", collect_list(col("v")).over(w))
      .withColumn("ewma", expr(
        s"""round(
              aggregate(transform(sequence(0, size(xs) - 1),
                  i -> element_at(xs, i + 1)
                         * power($decay, size(xs) - 1 - i)),
                0D, (acc, x) -> acc + x) /
              aggregate(transform(sequence(0, size(xs) - 1),
                  i -> power($decay, size(xs) - 1 - i)),
                0D, (acc, x) -> acc + x), 4)"""))
      .select("event_type", "day", "v", "ewma")
  }

  // ------------------------------------------------ q128 Holt trend
  private val HoltAlpha = 0.5
  private val HoltBeta = 0.3

  /** q128: HOLT LINEAR-TREND SMOOTHING over the daily event series —
    * double exponential smoothing (Holt 1957), the level+trend
    * forecaster one step up from q122's EWMA (which tracks level only
    * and lags every ramp): per event_type, over the day-ordered daily
    * totals,
    *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    * with l_1 = y_1, b_1 = 0, and the one-step-ahead in-sample
    * forecast fitted_t = l_{t−1} + b_{t−1} (NULL at t = 1). The
    * recursion is genuinely sequential, so determinism comes from
    * identical inputs and identical op order, not commutativity: both
    * engines fold the SAME 2-dp daily series (q26's aggregation
    * verbatim) through the textually identical update formulas —
    * Spark in a left-to-right `aggregate` over the day-sorted struct
    * array, DuckDB in a row_number-stepped recursive CTE — and emit
    * on a 6-dp grid (the s18 re-entry discipline).
    *
    * Scale shape: the event-volume stage is the q26 partial-agg'd
    * daily groupBy; the fold runs per type on the SERIES frame (days
    * × types, bounded — a year is 365 elements), one row per group
    * through a codegen'd higher-order aggregate. At horizon lengths
    * where a series stops fitting one array, the recursion re-stages
    * as the q127 pattern (chunked prefix folds); the gate form keeps
    * the closed single-fold shape. */
  def holtDaily(spark: SparkSession, sfDir: String): DataFrame =
    holtOn(Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"),
        col("event_type"))
      .agg(round(coalesce(sum("value"), lit(0.0)), 2).as("v")))

  /** [[holtDaily]] over any (event_type, day, v) series frame. */
  private[graft] def holtOn(series: DataFrame,
      alpha: Double = HoltAlpha, beta: Double = HoltBeta): DataFrame = {
    val (a, b) = (alpha, beta)
    val (ca, cb) = (1.0 - alpha, 1.0 - beta)
    // the new level appears inside the trend update too — the lambda
    // cannot bind an intermediate, so the expression is duplicated
    // TEXTUALLY IDENTICALLY (same arithmetic, same result) here and
    // in the oracle's recursive arm
    def newL(y: String) = s"$a * $y + $ca * (acc.l + acc.b)"
    series.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("v"))))
        .as("s"))
      .select(col("event_type"), explode(expr(
        s"""aggregate(
              slice(s, 2, greatest(size(s) - 1, 0)),
              struct(
                CAST(s[0].v AS DOUBLE) AS l,
                CAST(0.0 AS DOUBLE) AS b,
                array(struct(s[0].day AS day, s[0].v AS v,
                  CAST(s[0].v AS DOUBLE) AS level,
                  CAST(0.0 AS DOUBLE) AS trend,
                  CAST(NULL AS DOUBLE) AS fitted)) AS out),
              (acc, x) -> struct(
                ${newL("x.v")} AS l,
                $b * (${newL("x.v")} - acc.l) + $cb * acc.b AS b,
                concat(acc.out, array(struct(x.day AS day, x.v AS v,
                  ${newL("x.v")} AS level,
                  $b * (${newL("x.v")} - acc.l) + $cb * acc.b AS trend,
                  acc.l + acc.b AS fitted))) AS out),
              acc -> acc.out)""")).as("r"))
      .select(col("event_type"), col("r.day").as("day"),
        col("r.v").as("v"),
        round(col("r.level"), 6).as("level"),
        round(col("r.trend"), 6).as("trend"),
        round(col("r.fitted"), 6).as("fitted"))
  }

  /** q128's DuckDB twin: the same 2-dp daily series stepped through
    * the textually identical update formulas by a recursive CTE on
    * the per-type row_number, same 6-dp emission grid. */
  private[graft] val holtOracle: String = {
    val (a, b) = (HoltAlpha, HoltBeta)
    val (ca, cb) = (1.0 - HoltAlpha, 1.0 - HoltBeta)
    val newL = s"$a * i.v + $ca * (h.l + h.b)"
    s"""WITH RECURSIVE d AS (
         SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                round(coalesce(sum(value), 0.0), 2) AS v
         FROM events GROUP BY 1, 2),
       i AS (SELECT *, row_number() OVER (PARTITION BY event_type
                       ORDER BY day) AS rn FROM d),
       h AS (
         SELECT event_type, day, v, rn, CAST(v AS DOUBLE) AS l,
                CAST(0.0 AS DOUBLE) AS b, CAST(NULL AS DOUBLE) AS fitted
         FROM i WHERE rn = 1
         UNION ALL
         SELECT i.event_type, i.day, i.v, i.rn,
                $newL,
                $b * ($newL - h.l) + $cb * h.b,
                h.l + h.b
         FROM h JOIN i ON i.event_type = h.event_type
                      AND i.rn = h.rn + 1)
       SELECT event_type, day, v, round(l, 6) AS level,
              round(b, 6) AS trend, round(fitted, 6) AS fitted
       FROM h"""
  }

  /** Right-censoring horizon for q154 (days before stream end). */
  private val KmCensorGap = 7

  /** q154: KAPLAN–MEIER SURVIVAL (Kaplan & Meier 1958) — the churn
    * curve product analytics actually reports (q62's retention grid
    * is its fixed-cohort cousin): per user, lifetime = days between
    * first and last event; a user whose last event is within
    * [[KmCensorGap]] days of the stream end is RIGHT-CENSORED (still
    * alive as far as the data can say), everyone else churned at
    * their lifetime. The estimator steps only on observed lifetimes:
    * S(t) = Π_{t_i ≤ t} (n_i − d_i)/n_i with n_i = users still at
    * risk at t_i — censored users leave the risk set without forcing
    * a step down, which is the entire point of KM over a naive
    * "fraction retained" curve. Counts are exact integers; the
    * survival recurrence is genuinely sequential, so both engines
    * fold the SAME integers through the textually identical factor
    * (the q128/q137 recurrence discipline: Spark left-to-right
    * `aggregate`, DuckDB row_number-stepped recursive CTE), 6-dp
    * serve. Output (duration, n_risk, n_events, n_censored,
    * survival).
    *
    * Scale shape: one user-keyed min/max partial agg, then
    * everything runs on the durations frame (≤ stream-span days —
    * bounded), one row per step through a codegen'd fold. */
  def kaplanMeier(spark: SparkSession, sfDir: String): DataFrame =
    kaplanMeierOn(Tables.load(spark, sfDir, "events")
      .select(col("user_id"), date_trunc("day", col("ts"))
        .cast("date").as("day")))

  /** [[kaplanMeier]] over any (user_id, day DATE) observation frame. */
  private[graft] def kaplanMeierOn(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ends = e.agg(max("day").as("endd"))
    val users = e.groupBy("user_id")
      .agg(min("day").as("f"), max("day").as("l"))
      .crossJoin(broadcast(ends))
      .select(datediff(col("l"), col("f")).cast("long").as("duration"),
        (col("l") <= date_sub(col("endd"), KmCensorGap)).as("churned"))
    val roll = users.groupBy("duration").agg(
      sum(when(col("churned"), 1L).otherwise(0L)).as("d"),
      sum(when(!col("churned"), 1L).otherwise(0L)).as("c"))
    // at-risk = suffix sum over duration order (no global total needed)
    val wSuffix = Window.orderBy("duration")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val risked = roll.withColumn("n_risk",
      sum(col("d") + col("c")).over(wSuffix))
    risked
      .agg(sort_array(collect_list(
        struct(col("duration"), col("d"), col("c"), col("n_risk"))))
        .as("s"))
      .select(explode(expr(
        """aggregate(
             slice(s, 2, greatest(size(s) - 1, 0)),
             struct(
               (s[0].n_risk - s[0].d) / CAST(s[0].n_risk AS DOUBLE) AS sv,
               array(struct(s[0].duration AS duration,
                 s[0].n_risk AS n_risk, s[0].d AS d, s[0].c AS c,
                 (s[0].n_risk - s[0].d) / CAST(s[0].n_risk AS DOUBLE)
                   AS sv)) AS out),
             (acc, x) -> struct(
               acc.sv * ((x.n_risk - x.d) / CAST(x.n_risk AS DOUBLE))
                 AS sv,
               concat(acc.out, array(struct(x.duration AS duration,
                 x.n_risk AS n_risk, x.d AS d, x.c AS c,
                 acc.sv * ((x.n_risk - x.d) / CAST(x.n_risk AS DOUBLE))
                   AS sv))) AS out),
             acc -> acc.out)""")).as("r"))
      .select(col("r.duration").as("duration"),
        col("r.n_risk").as("n_risk"),
        col("r.d").as("n_events"), col("r.c").as("n_censored"),
        round(col("r.sv"), 6).as("survival"))
  }

  /** q154's DuckDB twin: same lifetimes and censor rule, same suffix
    * n_risk, the identical factor text stepped by a recursive CTE. */
  private[graft] val kaplanMeierOracle: String =
    s"""WITH RECURSIVE e AS (
         SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
         FROM events),
       g AS (SELECT max(day) AS endd FROM e),
       u AS (SELECT user_id, min(day) AS f, max(day) AS l
             FROM e GROUP BY 1),
       du AS (SELECT CAST(date_diff('day', f, l) AS BIGINT) AS duration,
                     (l <= endd - INTERVAL $KmCensorGap DAY) AS churned
              FROM u, g),
       r AS (SELECT duration,
                    CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END)
                      AS BIGINT) AS d,
                    CAST(sum(CASE WHEN churned THEN 0 ELSE 1 END)
                      AS BIGINT) AS c
             FROM du GROUP BY 1),
       k AS (SELECT duration, d, c,
                    CAST(sum(d + c) OVER (ORDER BY duration
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                      AS BIGINT) AS n_risk,
                    row_number() OVER (ORDER BY duration) AS rn
             FROM r),
       h AS (
         SELECT duration, n_risk, d, c, rn,
                (n_risk - d) / CAST(n_risk AS DOUBLE) AS sv
         FROM k WHERE rn = 1
         UNION ALL
         SELECT i.duration, i.n_risk, i.d, i.c, i.rn,
                h.sv * ((i.n_risk - i.d) / CAST(i.n_risk AS DOUBLE))
         FROM h JOIN k i ON i.rn = h.rn + 1)
      SELECT duration, n_risk, d AS n_events, c AS n_censored,
             round(sv, 6) AS survival
      FROM h"""

  /** q133: DAY-OF-WEEK SEASONALITY INDEX — the multiplicative
    * seasonal component at weekly period (the classical-decomposition
    * sibling of q128, whose level+trend smoother deliberately carries
    * NO seasonal term): per event_type, index(dow) = mean observed
    * daily total on that weekday / mean observed daily total overall
    * — index > 1 marks an above-trend weekday; the vector of seven
    * indexes deseasonalizes any of the q122/q128 forecasts by one
    * division. Weekday comes from PORTABLE integer arithmetic on
    * epoch days (pmod(days + 3, 7): 0 = Monday — engine date
    * functions disagree on week anchors, 1970-01-01 was a Thursday),
    * means are over OBSERVED days only (a day with no events is
    * absent, not zero), and the index lands on the 4-dp grid with a
    * nullif'd denominator. Output (event_type, dow, n_days,
    * dow_mean, index).
    *
    * Scale shape: the q26 daily partial-agg, then everything runs on
    * the days×types series frame into a 7×types result. */
  def seasonalityIndex(spark: SparkSession, sfDir: String): DataFrame =
    seasonalityIndexOn(Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"),
        col("event_type"))
      .agg(round(coalesce(sum("value"), lit(0.0)), 2).as("v")))

  /** [[seasonalityIndex]] over any (event_type, day, v) series. */
  private[graft] def seasonalityIndexOn(series: DataFrame): DataFrame = {
    val s = Persists.barrier(series.withColumn("dow",
      pmod(datediff(col("day"), lit("1970-01-01")) + 3, lit(7))))
    val byDow = s.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_days"),
        round(avg("v"), 4).as("dow_mean"))
    val byType = s.groupBy("event_type")
      .agg(round(avg("v"), 4).as("type_mean"))
    byDow.join(byType, "event_type")
      .select(col("event_type"), col("dow"), col("n_days"),
        col("dow_mean"),
        round(col("dow_mean") / expr("nullif(type_mean, 0.0D)"), 4)
          .as("index"))
  }

  /** q142: TIME-WEIGHTED AVERAGE — the irregular-sampling mean every
    * sensor/finance pipeline needs where q26's plain daily mean
    * over-weights bursts: per event_type, each observed value holds
    * until the next observation, so TWA = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_n−t₁)
    * over the type's event sequence (the step-function integral; the
    * final observation carries no interval and duration weights are
    * exact integer MICROSECONDS). Types with one event (zero span)
    * emit NULL, spelled with the same nullif in both engines. Output
    * (event_type, n_events, span_us, twa), 4-dp.
    *
    * Scale shape: one per-type window pass (lead) + one partial-agg'd
    * rollup — weights are exact longs, so only the final Σ v·w is
    * floating point, rounded on the grid. */
  def timeWeightedAvg(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type")
      .orderBy(col("us").asc, col("event_id").asc)
    Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"), col("value"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("dur", lead("us", 1).over(w) - col("us"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        (max("us") - min("us")).as("span_us"),
        round(sum(col("value") * col("dur")) /
          expr("nullif(CAST(max(us) - min(us) AS DOUBLE), 0.0D)"), 4)
          .as("twa"))
  }

  /** q142's DuckDB twin: same (us, event_id) order, same exact
    * integer durations, same nullif'd span divisor on the 4-dp
    * grid. */
  private[graft] val timeWeightedAvgOracle: String =
    """WITH e AS (
         SELECT event_id, event_type, value, epoch_us(ts) AS us
         FROM events),
       d AS (SELECT event_type, value, us,
                    lead(us) OVER (PARTITION BY event_type
                      ORDER BY us, event_id) - us AS dur
             FROM e)
      SELECT event_type, count(*) AS n_events,
             max(us) - min(us) AS span_us,
             round(sum(value * dur) /
                   nullif(CAST(max(us) - min(us) AS DOUBLE), 0.0), 4)
               AS twa
      FROM d GROUP BY event_type"""

  /** q141: ROLLING MEDIAN over the daily event series — the robust
    * trailing-week trend line (q122's EWMA follows every spike;
    * q117's MAD flags outliers pointwise; the rolling median is the
    * smoother that IGNORES them): per event_type, the median of the
    * 7-row trailing window on the day order, with the even-count
    * interpolation spelled out EXPLICITLY in both engines (sorted
    * window list; odd → middle element, even → mean of the two) so
    * no engine-specific median() semantics ever enter. Output
    * (event_type, day, v, n_win, rolling_median), 4-dp.
    *
    * Scale shape: q26's daily rollup, one per-type window pass over
    * the bounded SERIES frame; window state is the constant 7
    * elements. */
  def rollingMedian(spark: SparkSession, sfDir: String): DataFrame =
    rollingMedianOn(Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"),
        col("event_type"))
      .agg(round(coalesce(sum("value"), lit(0.0)), 2).as("v")))

  /** [[rollingMedian]] over any (event_type, day, v) series. */
  private[graft] def rollingMedianOn(series: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-6, Window.currentRow)
    series
      .withColumn("s", sort_array(collect_list(col("v")).over(w)))
      .select(col("event_type"), col("day"), col("v"),
        size(col("s")).as("n_win"),
        round(expr(
          """CASE WHEN size(s) % 2 = 1
                  THEN element_at(s, CAST((size(s) + 1) div 2 AS INT))
                  ELSE (element_at(s, CAST(size(s) div 2 AS INT)) +
                        element_at(s, CAST(size(s) div 2 + 1 AS INT)))
                       / 2.0D END"""),
          4).as("rolling_median"))
  }

  /** q141's DuckDB twin: same window list, same explicit middle
    * selection, same 4-dp grid. */
  private[graft] val rollingMedianOracle: String =
    """WITH d AS (
         SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                round(coalesce(sum(value), 0.0), 2) AS v
         FROM events GROUP BY 1, 2),
       w AS (SELECT event_type, day, v,
                    list_sort(list(v) OVER (PARTITION BY event_type
                      ORDER BY day
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS s
             FROM d)
      SELECT event_type, day, v, len(s) AS n_win,
             round(CASE WHEN len(s) % 2 = 1
                        THEN s[(len(s) + 1) // 2]
                        ELSE (s[len(s) // 2] + s[len(s) // 2 + 1]) / 2.0
                   END, 4) AS rolling_median
      FROM w"""

  /** Max autocorrelation lag for q138 — a week of daily lags. */
  private val AcfMaxLag = 7

  /** q138: AUTOCORRELATION FUNCTION over the daily event series —
    * the Box-Jenkins identification tool that DETECTS the weekly
    * structure q133's seasonality index assumes: per event_type,
    * r_ℓ = Σ_t dev_t·dev_{t−ℓ} / Σ_t dev_t² for ℓ = 1..[[AcfMaxLag]],
    * devs against the type's 6-dp mean, lags by OBSERVED-row offset
    * on the day order (a gap day shifts the index, as in any
    * observed-series ACF; q107's gap-fill restores calendar lags
    * upstream when that matters). A weekly cycle surfaces as the
    * ℓ = 7 peak. Output (event_type, lag, n_pairs, acf), 4-dp.
    *
    * Scale shape: q26's partial-agg'd daily rollup; the lag columns
    * are one window pass over the bounded SERIES frame and the
    * per-lag sums are vocabulary-sized aggs — nothing touches raw
    * events twice. */
  def acfDaily(spark: SparkSession, sfDir: String): DataFrame =
    acfOn(Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"),
        col("event_type"))
      .agg(round(coalesce(sum("value"), lit(0.0)), 2).as("v")))

  /** [[acfDaily]] over any (event_type, day, v) series. */
  private[graft] def acfOn(series: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s0 = Persists.barrier(series)
    val mu = s0.groupBy("event_type").agg(round(avg("v"), 6).as("mu"))
    val dev = Persists.barrier(s0.join(mu, "event_type")
      .withColumn("dev", col("v") - col("mu")))
    val w = Window.partitionBy("event_type").orderBy("day")
    val lagged = dev.select(col("event_type") +: col("dev") +:
      (1 to AcfMaxLag).map(l => lag("dev", l).over(w).as(s"d$l")): _*)
    val den = dev.groupBy("event_type")
      .agg(sum(col("dev") * col("dev")).as("den"))
    val num = lagged.select(col("event_type"),
      posexplode(array((1 to AcfMaxLag).map(l => col(s"d$l")): _*))
        .as(Seq("l0", "dl")), col("dev"))
      .filter(col("dl").isNotNull)
      .groupBy(col("event_type"), (col("l0") + 1).as("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("dev") * col("dl")).as("num"))
    num.join(den, "event_type")
      .select(col("event_type"), col("lag"), col("n_pairs"),
        round(col("num") / expr("nullif(den, 0.0D)"), 4).as("acf"))
  }

  /** q138's DuckDB twin: same 6-dp mean, same observed-row lag
    * windows (7-arm unroll), same Σ·/Σ² quotient on the 4-dp grid. */
  private[graft] val acfOracle: String = {
    val arms = (1 to AcfMaxLag).map { l =>
      s"""SELECT event_type, $l AS lag, count(*) AS n_pairs,
                 sum(dev * d$l) AS num
          FROM lg WHERE d$l IS NOT NULL GROUP BY 1"""
    }.mkString("\nUNION ALL\n")
    s"""WITH d AS (
         SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                round(coalesce(sum(value), 0.0), 2) AS v
         FROM events GROUP BY 1, 2),
       m AS (SELECT event_type, round(avg(v), 6) AS mu
             FROM d GROUP BY 1),
       e AS (SELECT d.event_type, d.day, d.v - m.mu AS dev
             FROM d JOIN m USING (event_type)),
       lg AS (SELECT event_type, dev,
                     ${(1 to AcfMaxLag).map(l =>
                       s"lag(dev, $l) OVER w AS d$l").mkString(", ")}
              FROM e
              WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       den AS (SELECT event_type, sum(dev * dev) AS den
               FROM e GROUP BY 1),
       num AS ($arms)
      SELECT n.event_type, n.lag, n.n_pairs,
             round(n.num / nullif(den.den, 0.0), 4) AS acf
      FROM num n JOIN den USING (event_type)
      WHERE n.n_pairs > 0"""
  }

  /** CUSUM slack (in σ units, subtracted per step) and alarm
    * threshold — Page's classic k = 0.5σ, h = 4σ operating point on
    * the STANDARDIZED series, where they become plain constants. */
  private val CusumK = 0.5
  private val CusumH = 4.0

  /** q137: CUSUM CHANGEPOINT DETECTION (Page 1954) over the daily
    * event series — the sequential drift detector that catches small
    * persistent level shifts q117's pointwise MAD outliers ignore and
    * q130's Holt residuals only see one day at a time: per
    * event_type, standardize the daily totals (6-dp z against the
    * type's mean/stddev), then fold the two one-sided sums
    *   s_hi_t = max(0, s_hi_{t−1} + z_t − k)
    *   s_lo_t = max(0, s_lo_{t−1} − z_t − k)
    * with k = [[CusumK]], alarming when either rounded sum exceeds
    * h = [[CusumH]]. The recursion is sequential, so determinism is
    * the q128 discipline: both engines fold the SAME 6-dp z series
    * through textually identical updates — Spark a left-to-right
    * `aggregate` over the day-sorted array, DuckDB a row_number-
    * stepped recursive CTE — and emit on the 6-dp grid.
    *
    * Scale shape: q26's partial-agg'd daily rollup, one stats agg and
    * one fold per type on the bounded SERIES frame (days × types);
    * the q127 chunked-prefix restage applies if a series outgrows one
    * array. */
  def cusumChangepoints(spark: SparkSession, sfDir: String): DataFrame =
    cusumOn(Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"),
        col("event_type"))
      .agg(round(coalesce(sum("value"), lit(0.0)), 2).as("v")))

  /** [[cusumChangepoints]] over any (event_type, day, v) series. */
  private[graft] def cusumOn(series: DataFrame): DataFrame = {
    val k = CusumK
    val s0 = Persists.barrier(series)
    val st = s0.groupBy("event_type")
      .agg(round(avg("v"), 6).as("m"),
        round(coalesce(nanvl(stddev_samp(col("v")), lit(0.0)),
          lit(0.0)), 6).as("sd"))
    val z = s0.join(st, "event_type")
      .withColumn("z", round(coalesce(
        (col("v") - col("m")) / expr("nullif(sd, 0.0D)"), lit(0.0)), 6))
    z.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("v"), col("z"))))
        .as("s"))
      .select(col("event_type"), explode(expr(
        s"""aggregate(
              slice(s, 2, greatest(size(s) - 1, 0)),
              struct(
                greatest(CAST(0.0 AS DOUBLE), s[0].z - $k) AS hi,
                greatest(CAST(0.0 AS DOUBLE), -s[0].z - $k) AS lo,
                array(struct(s[0].day AS day, s[0].v AS v, s[0].z AS z,
                  greatest(CAST(0.0 AS DOUBLE), s[0].z - $k) AS hi,
                  greatest(CAST(0.0 AS DOUBLE), -s[0].z - $k) AS lo))
                  AS out),
              (acc, x) -> struct(
                greatest(CAST(0.0 AS DOUBLE), acc.hi + x.z - $k) AS hi,
                greatest(CAST(0.0 AS DOUBLE), acc.lo - x.z - $k) AS lo,
                concat(acc.out, array(struct(x.day AS day, x.v AS v,
                  x.z AS z,
                  greatest(CAST(0.0 AS DOUBLE), acc.hi + x.z - $k) AS hi,
                  greatest(CAST(0.0 AS DOUBLE), acc.lo - x.z - $k) AS lo)))
                  AS out),
              acc -> acc.out)""")).as("r"))
      .select(col("event_type"), col("r.day").as("day"),
        col("r.v").as("v"), col("r.z").as("z"),
        round(col("r.hi"), 6).as("s_hi"),
        round(col("r.lo"), 6).as("s_lo"),
        (round(col("r.hi"), 6) > CusumH ||
          round(col("r.lo"), 6) > CusumH).as("alarm"))
  }

  /** q137's DuckDB twin: same 2-dp daily series, same 6-dp z, same
    * fold stepped by a recursive CTE, same rounded alarm compare. */
  private[graft] val cusumOracle: String = {
    val k = CusumK
    s"""WITH RECURSIVE d AS (
         SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                round(coalesce(sum(value), 0.0), 2) AS v
         FROM events GROUP BY 1, 2),
       st AS (SELECT event_type, round(avg(v), 6) AS m,
                     round(coalesce(stddev_samp(v), 0.0), 6) AS sd
              FROM d GROUP BY 1),
       i AS (SELECT d.event_type, d.day, d.v,
                    round(coalesce((d.v - st.m) / nullif(st.sd, 0.0),
                          0.0), 6) AS z,
                    row_number() OVER (PARTITION BY d.event_type
                                       ORDER BY d.day) AS rn
             FROM d JOIN st USING (event_type)),
       c AS (
         SELECT event_type, day, v, z, rn,
                greatest(CAST(0.0 AS DOUBLE), z - $k) AS hi,
                greatest(CAST(0.0 AS DOUBLE), -z - $k) AS lo
         FROM i WHERE rn = 1
         UNION ALL
         SELECT i.event_type, i.day, i.v, i.z, i.rn,
                greatest(CAST(0.0 AS DOUBLE), c.hi + i.z - $k),
                greatest(CAST(0.0 AS DOUBLE), c.lo - i.z - $k)
         FROM c JOIN i ON i.event_type = c.event_type
                      AND i.rn = c.rn + 1)
       SELECT event_type, day, v, z,
              round(hi, 6) AS s_hi, round(lo, 6) AS s_lo,
              (round(hi, 6) > $CusumH OR round(lo, 6) > $CusumH) AS alarm
       FROM c"""
  }

  /** q133's DuckDB twin: the same daily series, epoch-day weekday
    * arithmetic, observed-day means, and 4-dp grids. */
  private[graft] val seasonalityOracle: String =
    """WITH d AS (SELECT event_type,
                         CAST(date_trunc('day', ts) AS DATE) AS day,
                         round(coalesce(sum(value), 0.0), 2) AS v
                  FROM events GROUP BY 1, 2),
        w AS (SELECT *,
                     ((day - DATE '1970-01-01') + 3) % 7 AS dow
              FROM d),
        bd AS (SELECT event_type, dow, count(*) AS n_days,
                      round(avg(v), 4) AS dow_mean
               FROM w GROUP BY 1, 2),
        bt AS (SELECT event_type, round(avg(v), 4) AS type_mean
               FROM w GROUP BY 1)
      SELECT bd.event_type, bd.dow, bd.n_days, bd.dow_mean,
             round(bd.dow_mean / nullif(bt.type_mean, 0.0), 4) AS index
      FROM bd JOIN bt ON bd.event_type = bt.event_type"""

  /** q122's DuckDB twin: same daily series, same frame-ordered list,
    * same indexed weight transform and 4-dp rounding. */
  private[graft] val ewmaOracle: String = {
    val decay = 1.0 - EwmaAlpha
    s"""WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                          event_type,
                          round(coalesce(sum(value), 0.0), 2) AS v
                   FROM events GROUP BY 1, 2),
       w AS (SELECT event_type, day, v,
                    list(v) OVER (PARTITION BY event_type ORDER BY day
                                  ROWS BETWEEN ${EwmaLookback - 1}
                                  PRECEDING AND CURRENT ROW) AS xs
             FROM d)
       SELECT event_type, day, v,
              round(list_sum(list_transform(range(0, len(xs)),
                      i -> xs[i + 1] * pow($decay, len(xs) - 1 - i))) /
                    list_sum(list_transform(range(0, len(xs)),
                      i -> pow($decay, len(xs) - 1 - i))), 4) AS ewma
       FROM w"""
  }

  /** q123: SCD2 VALIDITY INTERVALS — the slowly-changing-dimension
    * history build (Kimball type 2) from an event stream: per user,
    * collapse consecutive equal states into one row and emit
    * (user_id, state, valid_from, valid_to, is_current) where
    * valid_to = the next change's timestamp (NULL on the open
    * current row). Two windows on ONE user-keyed sort (the q112
    * ordering, (us, event_id) tie-broken): lag finds the change
    * points, lead closes the intervals. Integer-exact end to end.
    *
    * Scale shape: one partitionBy(user) sort carries both windows —
    * per-user keys, no global window, no join; the output is
    * change-count-sized, not event-count-sized. */
  def scd2Intervals(spark: SparkSession, sfDir: String): DataFrame =
    scd2IntervalsOn(Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")))

  /** [[scd2Intervals]] over any (event_id, user_id, event_type, us)
    * frame. */
  private[graft] def scd2IntervalsOn(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val changes = e
      .withColumn("prev", lag("event_type", 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    changes
      .withColumn("valid_to", lead("us", 1).over(w))
      .select(col("user_id"), col("event_type").as("state"),
        col("us").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.cast("int").as("is_current"))
  }

  /** q123's DuckDB twin: same change-point lag, same interval lead,
    * same (us, event_id) total order. */
  private[graft] val scd2Oracle: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
                         epoch_us(ts) AS us
                  FROM events),
       c AS (SELECT *,
                    lag(event_type) OVER
                      (PARTITION BY user_id ORDER BY us, event_id)
                      AS prev
             FROM e),
       ch AS (SELECT * FROM c
              WHERE prev IS NULL OR prev <> event_type)
       SELECT user_id, event_type AS state, us AS valid_from,
              lead(us) OVER (PARTITION BY user_id
                             ORDER BY us, event_id) AS valid_to,
              CAST(CASE WHEN lead(us) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) IS NULL
                        THEN 1 ELSE 0 END AS INTEGER) AS is_current
       FROM ch"""

  /** q148: POPULATION STABILITY INDEX — the production drift metric
    * feature-monitoring stacks alert on: PSI = Σ_bins
    * (p_b − q_b)·ln(p_b/q_b) between the REFERENCE window (the
    * stream's first half by event time) and the CURRENT window (the
    * second half), over q108's fixed-width value bins with add-1
    * count smoothing (every bin present in either window scores;
    * the smoothing keeps the log finite exactly as a production
    * monitor must). Per event_type: the per-bin contributions and
    * the one PSI scalar (>0.2 = the classic "investigate" line).
    * Shares t16's divergence discipline — t16 compares SHARDS by JS;
    * this compares TIME WINDOWS by PSI, the drift alert's actual
    * algebra. All counts integer; shares and logs are computed from
    * identical integers in both engines, 6-dp serve.
    *
    * Scale shape: one conditional-agg pass into a types×bins frame;
    * the midpoint scalar is a 1-row broadcast. */
  def psiDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Persists.barrier(Tables.load(spark, sfDir, "events")
      .select(col("event_type"), col("value"),
        expr("unix_micros(ts)").as("us"))
      .filter(col("value").isNotNull))
    val mid = e.agg(expr("(min(us) + max(us)) div 2").as("mid"))
    val binned = e.crossJoin(broadcast(mid))
      .select(col("event_type"),
        expr("CAST(least(greatest(floor(value / 5.0), 0), 19) AS INT)")
          .as("bin"),
        (col("us") <= col("mid")).as("ref"))
    val counts = binned.groupBy("event_type", "bin")
      .agg(sum(when(col("ref"), 1L).otherwise(0L)).as("nr"),
        sum(when(!col("ref"), 1L).otherwise(0L)).as("nc"))
    val totals = counts.groupBy("event_type")
      .agg(sum("nr").as("tr"), sum("nc").as("tc"),
        count(lit(1)).as("nbins"))
    counts.join(totals, "event_type")
      .select(col("event_type"), col("bin"), col("nr"), col("nc"),
        expr("""round(
          ((nr + 1) / CAST(tr + nbins AS DOUBLE)
           - (nc + 1) / CAST(tc + nbins AS DOUBLE)) *
          ln(((nr + 1) / CAST(tr + nbins AS DOUBLE)) /
             ((nc + 1) / CAST(tc + nbins AS DOUBLE))), 6)""")
          .as("contribution"))
  }

  /** q148's DuckDB twin: same midpoint split, same q108 bins, same
    * add-1 smoothed shares and log contributions on the 6-dp grid. */
  private[graft] val psiOracle: String =
    """WITH e AS (
         SELECT event_type, value, epoch_us(ts) AS us
         FROM events WHERE value IS NOT NULL),
       m AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
       b AS (SELECT event_type,
                    CAST(least(greatest(floor(value / 5.0), 0), 19)
                      AS INTEGER) AS bin,
                    (us <= m.mid) AS ref
             FROM e, m),
       c AS (SELECT event_type, bin,
                    CAST(sum(CASE WHEN ref THEN 1 ELSE 0 END)
                      AS BIGINT) AS nr,
                    CAST(sum(CASE WHEN ref THEN 0 ELSE 1 END)
                      AS BIGINT) AS nc
             FROM b GROUP BY 1, 2),
       t AS (SELECT event_type, CAST(sum(nr) AS BIGINT) AS tr,
                    CAST(sum(nc) AS BIGINT) AS tc,
                    count(*) AS nbins
             FROM c GROUP BY 1)
      SELECT c.event_type, c.bin, c.nr, c.nc,
             round(((c.nr + 1) / CAST(t.tr + t.nbins AS DOUBLE)
                    - (c.nc + 1) / CAST(t.tc + t.nbins AS DOUBLE)) *
                   ln(((c.nr + 1) / CAST(t.tr + t.nbins AS DOUBLE)) /
                      ((c.nc + 1) / CAST(t.tc + t.nbins AS DOUBLE))), 6)
               AS contribution
      FROM c JOIN t ON t.event_type = c.event_type"""

  /** q146: CUMULATIVE UNIQUE USERS — the growth curve every product
    * dashboard opens with, computed the scale-right way: a windowed
    * COUNT(DISTINCT) over an expanding frame re-scans all history per
    * day, but "cumulative distinct" ≡ "count of users whose FIRST
    * event is ≤ day" — one user-keyed min, a days-sized new-user
    * rollup, and a running sum over the bounded SERIES frame.
    * All-integer. Output (day, n_new, cum_users).
    *
    * Scale shape: the user min is one partial-agg'd pass; everything
    * after runs on |days| rows (the q122 bounded-frame argument). */
  def cumulativeUsers(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val first = Tables.load(spark, sfDir, "events")
      .groupBy("user_id")
      .agg(min(date_trunc("day", col("ts")).cast("date")).as("day"))
    val byDay = first.groupBy("day").agg(count(lit(1)).as("n_new"))
    byDay.withColumn("cum_users",
      sum("n_new").over(Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** q146's DuckDB twin: same first-seen min, same running sum. */
  private[graft] val cumulativeUsersOracle: String =
    """WITH f AS (
         SELECT user_id,
                min(CAST(date_trunc('day', ts) AS DATE)) AS day
         FROM events GROUP BY user_id),
       d AS (SELECT day, count(*) AS n_new FROM f GROUP BY day)
      SELECT day, n_new,
             CAST(sum(n_new) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_users
      FROM d"""

  /** q145: CONVERSION RATE WITH WILSON BOUNDS — the daily
    * purchase SHARE of view+purchase traffic with the Wilson 95%
    * score interval (Wilson 1927) — a true binomial proportion
    * (purchases over view+purchase trials; raw purchases/views can
    * exceed 1 on purchase-heavy days, which is a ratio, not a
    * proportion, and has no binomial interval), the statistically
    * honest band q124's plain rate lacks: on low-volume days the
    * interval widens instead of the point estimate lying. center = (p + z²/2n)/(1 + z²/n), half-width =
    * z·√(p(1−p)/n + z²/4n²)/(1 + z²/n), z = 1.96 — closed-form
    * arithmetic on exact integer counts, so both engines compute
    * identical doubles onto the 6-dp grid. Output (day, n_views,
    * n_purchases, rate, wilson_lo, wilson_hi); days without views
    * emit NULL bounds via the shared nullif.
    *
    * Scale shape: one conditional-agg pass over the daily rollup —
    * the q26 shape with two more columns. */
  def wilsonConversion(spark: SparkSession, sfDir: String): DataFrame = {
    val z = 1.96
    val z2 = z * z
    Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("n_views"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
      .withColumn("n",
        expr("CAST(nullif(n_views + n_purchases, 0) AS DOUBLE)"))
      .withColumn("p", col("n_purchases") / col("n"))
      .withColumn("center",
        (col("p") + lit(z2) / (lit(2.0) * col("n"))) /
          (lit(1.0) + lit(z2) / col("n")))
      .withColumn("hw",
        lit(z) * sqrt(col("p") * (lit(1.0) - col("p")) / col("n") +
          lit(z2) / (lit(4.0) * col("n") * col("n"))) /
          (lit(1.0) + lit(z2) / col("n")))
      .select(col("day"), col("n_views"), col("n_purchases"),
        round(col("p"), 6).as("rate"),
        round(col("center") - col("hw"), 6).as("wilson_lo"),
        round(col("center") + col("hw"), 6).as("wilson_hi"))
  }

  /** q145's DuckDB twin: same counts, same closed form, same grid. */
  private[graft] val wilsonOracle: String = {
    val z = 1.96
    val z2 = z * z
    s"""WITH d AS (
         SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                CAST(sum(CASE WHEN event_type = 'view'
                              THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_views,
                CAST(sum(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_purchases
         FROM events GROUP BY 1),
       w AS (
         SELECT day, n_views, n_purchases,
                CAST(nullif(n_views + n_purchases, 0) AS DOUBLE) AS n,
                n_purchases /
                  CAST(nullif(n_views + n_purchases, 0) AS DOUBLE) AS p
         FROM d),
       c AS (
         SELECT day, n_views, n_purchases, p,
                (p + $z2 / (2.0 * n)) / (1.0 + $z2 / n) AS center,
                $z * sqrt(p * (1.0 - p) / n + $z2 / (4.0 * n * n)) /
                  (1.0 + $z2 / n) AS hw
         FROM w)
      SELECT day, n_views, n_purchases, round(p, 6) AS rate,
             round(center - hw, 6) AS wilson_lo,
             round(center + hw, 6) AS wilson_hi
      FROM c"""
  }

  /** q144: SCD2 POINT-IN-TIME JOIN — the warehouse dimension join
    * q123's history build exists FOR: every purchase event joined to
    * the user's state interval valid AT its timestamp
    * (valid_from ≤ ts < valid_to, NULL = open tail). Because the
    * intervals derive from the same event stream, a purchase that
    * itself changes state lands in its OWN new interval (≥ is the
    * deterministic convention, mirrored in the oracle). Output
    * (event_id, user_id, us, state) — one row per purchase.
    *
    * Scale shape: the join is keyed on user_id with the interval
    * predicate as a residual — per-user interval counts are bounded
    * by that user's state changes, so the shuffle is fact-sized, the
    * q48/q104 interval-join argument. */
  def scd2PitJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val dim = Persists.barrier(scd2IntervalsOn(e))
    val facts = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"))
    facts.join(dim,
        facts("user_id") === dim("user_id") &&
          facts("us") >= dim("valid_from") &&
          (dim("valid_to").isNull || facts("us") < dim("valid_to")))
      .select(facts("event_id"), facts("user_id"), col("us"),
        col("state"))
  }

  /** q144's DuckDB twin: q123's oracle as the dimension CTE, the
    * same half-open interval predicate. */
  private[graft] val scd2PitOracle: String =
    s"""WITH s AS ($scd2Oracle),
        f AS (SELECT event_id, user_id, epoch_us(ts) AS us
              FROM events WHERE event_type = 'purchase')
      SELECT f.event_id, f.user_id, f.us, s.state
      FROM f JOIN s ON s.user_id = f.user_id
                   AND f.us >= s.valid_from
                   AND (s.valid_to IS NULL OR f.us < s.valid_to)"""

  /** q124: A/B EXPERIMENT REPORT — the conversion read-out every
    * product experiment ships: users split into two variants
    * (user_id parity here — a production run swaps in the c11 seeded
    * hash; the REPORT algebra is what's gated), a user converts if a
    * purchase lands strictly after their first view (the q60 funnel
    * rule), and each variant row carries users, converters, the 4-dp
    * conversion rate, and lift vs the control variant (computed FROM
    * the rounded rates, 1-row broadcast — the HITS norm pattern).
    *
    * Scale shape: one first-view agg + one purchase semi-check per
    * user (both user-keyed partial aggs), a 2-row report, a 1-row
    * broadcast for the lift divisor. */
  def abReport(spark: SparkSession, sfDir: String): DataFrame =
    abReportOn(Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")))

  /** [[abReport]] over any (user_id, event_type, us) frame — ONE
    * per-user agg (exists-purchase-after-first-view ⟺
    * max purchase us > min view us), then the shared tail. */
  private[graft] def abReportOn(e0: DataFrame): DataFrame =
    abReportFromUser(e0.groupBy("user_id").agg(
      min(when(col("event_type") === "view", col("us"))).as("v0"),
      max(when(col("event_type") === "purchase", col("us")))
        .as("pmax")))

  /** q124's report tail over per-user (v0, pmax) aggregates — shared
    * VERBATIM with the streaming twin (q125), whose stateful half
    * produces exactly this frame, so the two forms can never drift. */
  private[graft] def abReportFromUser(u: DataFrame): DataFrame = {
    val agg = u.filter(col("v0").isNotNull)
      .select((col("user_id") % 2).as("variant"),
        (col("pmax").isNotNull && col("pmax") > col("v0"))
          .cast("long").as("c"))
      .groupBy("variant").agg(
        count(lit(1)).as("n_users"),
        sum("c").as("n_converted"))
      .withColumn("conv_rate", round(
        col("n_converted").cast("double") / col("n_users"), 4))
    val ctrl = agg.filter(col("variant") === 0)
      .select(col("conv_rate").as("ctrl_rate"))
    agg.crossJoin(broadcast(ctrl))
      .select(col("variant"), col("n_users"), col("n_converted"),
        col("conv_rate"),
        round(col("conv_rate") / col("ctrl_rate"), 4).as("lift"))
  }

  /** q124's DuckDB twin: same first-view rule, same strict-after
    * conversion, same rounded-rate lift. */
  private[graft] val abReportOracle: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
                  FROM events),
       fv AS (SELECT user_id, min(us) AS v0 FROM e
              WHERE event_type = 'view' GROUP BY user_id),
       conv AS (SELECT DISTINCT e.user_id, 1 AS c
                FROM e JOIN fv ON e.user_id = fv.user_id
                WHERE e.event_type = 'purchase' AND e.us > fv.v0),
       agg AS (SELECT fv.user_id % 2 AS variant,
                      count(*) AS n_users,
                      CAST(sum(coalesce(c, 0)) AS BIGINT) AS n_converted
               FROM fv LEFT JOIN conv ON fv.user_id = conv.user_id
               GROUP BY fv.user_id % 2),
       r AS (SELECT variant, n_users, n_converted,
                    round(n_converted / CAST(n_users AS DOUBLE), 4)
                      AS conv_rate
             FROM agg),
       ctrl AS (SELECT conv_rate AS ctrl_rate FROM r WHERE variant = 0)
       SELECT variant, n_users, n_converted, conv_rate,
              round(conv_rate / ctrl_rate, 4) AS lift
       FROM r, ctrl"""

  /** q126: MARKOV TRANSITION MATRIX over event types — the
    * user-journey model behind q120's raw paths: for every
    * consecutive same-user event pair within a session (gap ≤
    * `gapMinutes`, the q61 boundary rule), count the (src_type →
    * dst_type) transition and serve the row-normalized probability
    * p = n / Σ_dst n (4 dp). First-in-session events have no
    * predecessor and contribute nothing (lag is null or the gap
    * breaks). Output (src_type, dst_type, n, p) — the full matrix is
    * |types|² bounded, no limit needed.
    *
    * Scale shape: ONE user-keyed sort window over events (the q61
    * shuffle), then a types²-sized agg and a types-sized
    * normalization window — nothing wider than the event volume
    * moves, and the served matrix is tiny at any corpus size. */
  def markovTransitions(spark: SparkSession, sfDir: String): DataFrame =
    markovTransitionsOn(events(spark, sfDir))

  /** [[markovTransitions]] over any (event_id, user_id, event_type,
    * us) frame. */
  def markovTransitionsOn(
      e: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val order = Window.partitionBy("user_id").orderBy("us", "event_id")
    val t = e
      .withColumn("src_type", lag("event_type", 1).over(order))
      .withColumn("gap", col("us") - lag("us", 1).over(order))
      .filter(col("src_type").isNotNull && col("gap") <= gapUs)
    t.groupBy(col("src_type"), col("event_type").as("dst_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n") * lit(1.0) /
        sum("n").over(Window.partitionBy("src_type")), 4))
      .orderBy("src_type", "dst_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q126_markov_transitions" -> (markovTransitions _),
    "q128_holt_trend" -> (holtDaily _),
    "q130_holt_anomalies" -> (holtAnomalies _),
    "q124_ab_report" -> (abReport _),
    "q123_scd2_intervals" -> (scd2Intervals _),
    "q122_ewma_daily" -> (ewmaDaily _),
    "q120_session_paths" -> (sessionPaths _),
    "q119_trend_ols" -> (trendOls _),
    "q117_mad_outliers" -> (madOutliers _),
    "q116_concurrency" -> (concurrency _),
    "q107_gapfill_interpolate" -> (gapfillInterpolate _),
    "q111_rolling_zscore" -> (rollingZscore _),
    "q112_event_transitions" -> (eventTransitions _),
    "q115_attribution" -> (lastTouchAttribution _),
    "q60_funnel" -> (funnel _),
    "q131_funnel_lag" -> (funnelLag _),
    "q132_markov_attribution" -> (markovAttribution _),
    "q133_seasonality_index" -> (seasonalityIndex _),
    "q137_cusum_changepoints" -> (cusumChangepoints _),
    "q138_acf_daily" -> (acfDaily _),
    "q141_rolling_median" -> (rollingMedian _),
    "q142_time_weighted_avg" -> (timeWeightedAvg _),
    "q144_scd2_pit_join" -> (scd2PitJoin _),
    "q145_wilson_conversion" -> (wilsonConversion _),
    "q146_cumulative_users" -> (cumulativeUsers _),
    "q148_psi_drift" -> (psiDrift _),
    "q154_kaplan_meier" -> (kaplanMeier _),
    "q61_sessionize" -> ((s: SparkSession, d: String) => sessionize(s, d)),
    "q62_retention" -> (retention _),
    "q67_funnel_pattern" -> (funnelPattern _)
  )

  def oracleSql: Map[String, String] = Map(
    "q128_holt_trend" -> holtOracle,
    "q130_holt_anomalies" -> holtAnomalyOracle,
    "q131_funnel_lag" -> funnelLagOracle,
    "q132_markov_attribution" -> markovAttributionOracle(30),
    "q133_seasonality_index" -> seasonalityOracle,
    "q137_cusum_changepoints" -> cusumOracle,
    "q138_acf_daily" -> acfOracle,
    "q141_rolling_median" -> rollingMedianOracle,
    "q142_time_weighted_avg" -> timeWeightedAvgOracle,
    "q144_scd2_pit_join" -> scd2PitOracle,
    "q145_wilson_conversion" -> wilsonOracle,
    "q146_cumulative_users" -> cumulativeUsersOracle,
    "q148_psi_drift" -> psiOracle,
    "q154_kaplan_meier" -> kaplanMeierOracle,
    // q126: the same lagged pair extraction on the same unique sort,
    // the same session-gap filter, the same row-normalized 4-dp p
    "q126_markov_transitions" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                           epoch_us(ts) AS us
                    FROM events),
          t AS (SELECT event_type,
                       lag(event_type) OVER w AS src_type,
                       us - lag(us) OVER w AS gap
                FROM e
                WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
          n AS (SELECT src_type, event_type AS dst_type, count(*) AS n
                FROM t
                WHERE src_type IS NOT NULL AND gap <= 1800000000
                GROUP BY src_type, event_type)
        SELECT src_type, dst_type, n,
               round(n * 1.0 / sum(n) OVER (PARTITION BY src_type), 4)
                 AS p
        FROM n""",
    "q124_ab_report" -> abReportOracle,
    "q123_scd2_intervals" -> scd2Oracle,
    "q122_ewma_daily" -> ewmaOracle,
    // q120: the same gap windows on the same unique sort,
    // string_agg ORDER BY as the deterministic path reduce, the same
    // (count desc, path) total order under the limit
    "q120_session_paths" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                           epoch_us(ts) AS us
                    FROM events),
          s AS (SELECT *, CASE WHEN us - lag(us) OVER w > 1800000000
                               THEN 1 ELSE 0 END AS brk
                FROM e
                WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
          s2 AS (SELECT *, sum(brk) OVER
                        (PARTITION BY user_id ORDER BY us, event_id
                         ROWS UNBOUNDED PRECEDING) AS session_idx
                 FROM s),
          r AS (SELECT *, row_number() OVER
                       (PARTITION BY user_id, session_idx
                        ORDER BY us, event_id) AS rn
                FROM s2),
          p AS (SELECT user_id, session_idx,
                       string_agg(event_type, '>'
                                  ORDER BY us, event_id) AS path
                FROM r WHERE rn <= 5 GROUP BY user_id, session_idx)
        SELECT path, count(*) AS n_sessions
        FROM p GROUP BY path
        ORDER BY n_sessions DESC, path LIMIT 20""",
    // q119: the same five sums, the same closed-form slope/intercept
    // arithmetic, the same zero-x-variance gate and 6-dp serve
    "q119_trend_ols" ->
      """WITH e AS (SELECT event_type,
                           epoch_us(ts) // 86400000000 AS day,
                           round(value, 6) AS v
                    FROM events WHERE value IS NOT NULL),
          s AS (SELECT event_type,
                       CAST(count(*) AS DOUBLE) AS n,
                       sum(CAST(day AS DOUBLE)) AS sx,
                       sum(v) AS sy,
                       sum(day * v) AS sxy,
                       sum(CAST(day * day AS DOUBLE)) AS sxx
                FROM e GROUP BY event_type),
          t AS (SELECT *,
                       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
                FROM s WHERE n * sxx - sx * sx > 0)
        SELECT event_type, CAST(n AS BIGINT) AS n,
               round(slope, 6) AS slope,
               round((sy - slope * sx) / n, 6) AS intercept
        FROM t""",
    // q117: quantile_cont is the same exact interpolating median as
    // Spark's percentile; every statistic 6-dp-rounded at re-entry,
    // rz at 4 dp, the same constants and zero-MAD gate
    "q117_mad_outliers" ->
      """WITH e AS (SELECT event_id, event_type, round(value, 6) AS v
                    FROM events WHERE value IS NOT NULL),
          m AS (SELECT event_type, round(quantile_cont(v, 0.5), 6) AS med
                FROM e GROUP BY event_type),
          d AS (SELECT e.event_id, e.event_type, e.v, m.med,
                       round(abs(e.v - m.med), 6) AS dev
                FROM e JOIN m USING (event_type)),
          md AS (SELECT event_type,
                        round(quantile_cont(dev, 0.5), 6) AS mad
                 FROM d GROUP BY event_type)
        SELECT d.event_id, d.event_type, d.v AS value, d.med, md.mad,
               round((d.v - d.med) / (1.4826 * md.mad), 4) AS rz,
               CAST(abs(round((d.v - d.med) / (1.4826 * md.mad), 4)) > 3.5
                    AS INTEGER) AS is_outlier
        FROM d JOIN md USING (event_type) WHERE md.mad > 0""",
    // q116: the flat single-window cumulative sum the two-level
    // distributed prefix sum must reproduce exactly
    "q116_concurrency" ->
      """WITH iv AS (SELECT epoch_us(ts) AS lo,
                            epoch_us(ts) + 7200000000 AS hi
                     FROM events WHERE event_type = 'signup'),
          b AS (SELECT lo AS t, 1 AS d FROM iv
                UNION ALL SELECT hi, -1 FROM iv),
          net AS (SELECT t, CAST(sum(d) AS BIGINT) AS net
                  FROM b GROUP BY t)
        SELECT t, net,
               CAST(sum(net) OVER (ORDER BY t) AS BIGINT) AS conc
        FROM net""",
    // q111: the same trailing frame (ROWS 20 PRECEDING..1 PRECEDING on
    // the unique (us, event_id) sort), the same 6-dp rounding after
    // every windowed sum and derived stat, the same minN / positive-
    // variance gates — arithmetic mirrored op for op
    "q111_rolling_zscore" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS us,
                           round(value, 6) AS v
                    FROM events WHERE value IS NOT NULL),
          w AS (SELECT event_id, event_type, us, v,
                       count(v) OVER win AS n,
                       round(sum(v) OVER win, 6) AS s1,
                       round(sum(v * v) OVER win, 6) AS s2
                FROM e
                WINDOW win AS (PARTITION BY event_type ORDER BY us, event_id
                               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
          d AS (SELECT *, round(s1 / n, 6) AS mean,
                       round((s2 - s1 * s1 / n) / (n - 1), 6) AS vr
                FROM w WHERE n >= 10)
        SELECT event_id, event_type, us, v AS value,
               round((v - mean) / sqrt(vr), 4) AS z,
               CAST(abs(round((v - mean) / sqrt(vr), 4)) > 3.0 AS INTEGER)
                 AS is_anomaly
        FROM d WHERE vr > 0""",
    // q115: the same trailing ignore-nulls windows on the same unique
    // (us, event_id) sort; 7-day window in exact micros; revenue on
    // the 2-dp grid at source and serve
    "q115_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
                           value
                    FROM events),
          t AS (SELECT *,
                       last_value(CASE WHEN event_type IN ('view', 'click')
                                       THEN us END IGNORE NULLS)
                         OVER w AS t_us,
                       last_value(CASE WHEN event_type IN ('view', 'click')
                                       THEN event_type END IGNORE NULLS)
                         OVER w AS t_type
                FROM e
                WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING)),
          p AS (SELECT CASE WHEN t_us IS NOT NULL
                             AND us - t_us <= 604800000000
                            THEN t_type ELSE 'none' END AS touch,
                       round(coalesce(value, 0.0), 2) AS v
                FROM t WHERE event_type = 'purchase')
        SELECT touch, count(*) AS n_conversions,
               round(sum(v), 2) AS revenue
        FROM p GROUP BY touch""",
    // q112: lag over the same unique per-user sort, global bigram
    // counts, window-normalized per source state
    "q112_event_transitions" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
                    FROM events),
          b AS (SELECT lag(event_type) OVER
                         (PARTITION BY user_id ORDER BY us, event_id)
                         AS prev_type,
                       event_type AS next_type
                FROM e),
          c AS (SELECT prev_type, next_type, count(*) AS n
                FROM b WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        SELECT prev_type, next_type, n,
               round(n / sum(n) OVER (PARTITION BY prev_type), 6) AS p
        FROM c""",
    // q107: same three stages — observed daily means, per-series day
    // grid, prev/next ignore-nulls windows — with the interpolation
    // arithmetic spelled op for op like the Spark side (6-dp anchors,
    // integer day distances cast to double before the divide)
    "q107_gapfill_interpolate" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                           value
                    FROM events WHERE value IS NOT NULL),
          daily AS (SELECT event_type, day, round(avg(value), 6) AS v
                    FROM e GROUP BY 1, 2),
          span AS (SELECT event_type, min(day) AS lo, max(day) AS hi
                   FROM daily GROUP BY 1),
          grid AS (SELECT event_type, unnest(range(lo, hi + 1)) AS day
                   FROM span),
          j AS (SELECT g.event_type, g.day, d.v
                FROM grid g LEFT JOIN daily d
                  ON d.event_type = g.event_type AND d.day = g.day),
          f AS (SELECT event_type, day, v,
                       last_value(v IGNORE NULLS) OVER wb AS pv,
                       last_value(CASE WHEN v IS NOT NULL THEN day END
                                  IGNORE NULLS) OVER wb AS pd,
                       first_value(v IGNORE NULLS) OVER wf AS nv,
                       first_value(CASE WHEN v IS NOT NULL THEN day END
                                   IGNORE NULLS) OVER wf AS nd
                FROM j
                WINDOW wb AS (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW),
                       wf AS (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN CURRENT ROW
                                       AND UNBOUNDED FOLLOWING))
        SELECT event_type, day,
               round(CASE WHEN v IS NOT NULL THEN v
                          ELSE pv + ((nv - pv) * CAST(day - pd AS DOUBLE))
                                    / CAST(nd - pd AS DOUBLE) END,
                     6) AS value_filled,
               CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS INTEGER)
                 AS filled
        FROM f""",
    "q60_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
                    FROM events),
          v AS (SELECT user_id, min(us) AS view_us FROM e
                WHERE event_type = 'view' GROUP BY 1),
          c AS (SELECT e.user_id, min(e.us) AS click_us
                FROM e JOIN v ON e.user_id = v.user_id
                WHERE e.event_type = 'click' AND e.us > v.view_us
                GROUP BY 1),
          p AS (SELECT e.user_id, min(e.us) AS purchase_us
                FROM e JOIN c ON e.user_id = c.user_id
                WHERE e.event_type = 'purchase' AND e.us > c.click_us
                GROUP BY 1)
        SELECT v.user_id, v.view_us, c.click_us, p.purchase_us,
               CAST(1 + CASE WHEN c.click_us IS NOT NULL THEN 1 ELSE 0 END
                      + CASE WHEN p.purchase_us IS NOT NULL THEN 1 ELSE 0 END
                    AS INTEGER) AS stage
        FROM v LEFT JOIN c ON v.user_id = c.user_id
               LEFT JOIN p ON v.user_id = p.user_id""",
    "q61_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
                    FROM events),
          g AS (SELECT *,
                       CASE WHEN us - lag(us) OVER
                              (PARTITION BY user_id ORDER BY us, event_id)
                            > 1800000000 THEN 1 ELSE 0 END AS brk
                FROM e),
          s AS (SELECT *,
                       CAST(sum(brk) OVER
                         (PARTITION BY user_id ORDER BY us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS BIGINT) AS session_idx
                FROM g)
        SELECT user_id, session_idx, count(*) AS n_events,
               min(us) AS start_us, max(us) AS end_us,
               count(DISTINCT event_type) AS n_types
        FROM s GROUP BY 1, 2""",
    "q62_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day
                    FROM events),
          f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1)
        SELECT f.cohort_day, e.day - f.cohort_day AS day_off,
               count(DISTINCT e.user_id) AS users
        FROM e JOIN f ON e.user_id = f.user_id
        GROUP BY 1, 2""",
    // the q67 pattern, stage by stage as sequential CTEs: each stage's
    // time is the min event inside its window after the chain's anchor
    // (anchors advance on required stages only — signup is measured
    // but never gates purchase)
    "q67_funnel_pattern" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
                    FROM events),
          v AS (SELECT user_id, min(us) AS view_us FROM e
                WHERE event_type = 'view' GROUP BY 1),
          c AS (SELECT e.user_id, min(e.us) AS click_us
                FROM e JOIN v ON e.user_id = v.user_id
                WHERE e.event_type = 'click' AND e.us > v.view_us
                  AND e.us <= v.view_us + 259200000000
                GROUP BY 1),
          g AS (SELECT e.user_id, min(e.us) AS signup_us
                FROM e JOIN c ON e.user_id = c.user_id
                WHERE e.event_type = 'signup' AND e.us > c.click_us
                  AND e.us <= c.click_us + 259200000000
                GROUP BY 1),
          p AS (SELECT e.user_id, min(e.us) AS purchase_us
                FROM e JOIN c ON e.user_id = c.user_id
                WHERE e.event_type = 'purchase' AND e.us > c.click_us
                  AND e.us <= c.click_us + 604800000000
                GROUP BY 1)
        SELECT v.user_id, v.view_us, c.click_us, g.signup_us, p.purchase_us,
               CAST(1 + CASE WHEN c.click_us IS NOT NULL THEN 1 ELSE 0 END
                      + CASE WHEN g.signup_us IS NOT NULL THEN 1 ELSE 0 END
                      + CASE WHEN p.purchase_us IS NOT NULL THEN 1 ELSE 0 END
                    AS INTEGER) AS matched
        FROM v LEFT JOIN c ON v.user_id = c.user_id
               LEFT JOIN g ON v.user_id = g.user_id
               LEFT JOIN p ON v.user_id = p.user_id"""
  )
}
