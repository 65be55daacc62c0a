package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** AS-OF join — the time-series operator Spark has no native form of
  * (DuckDB: `ASOF JOIN`; Pandas: `merge_asof`): for every left row,
  * attach the single right row with the same key and the LATEST
  * right.ts ≤ left.ts.
  *
  * Composed from native operators per the custom-operator preference
  * order (compose > custom Expression > custom plan node): tag both
  * sides, union by name, pack the right side's columns into ONE
  * never-null struct, and carry it forward with a single
  * `last(..., ignoreNulls) OVER (PARTITION BY key ORDER BY ts, side
  * ROWS UNBOUNDED PRECEDING)` window, extracting fields afterwards.
  * That is ONE shuffle on the key and one sort — the same physical
  * shape a dedicated as-of operator would produce — and every step is
  * whole-stage-codegen native. Right rows sort before left rows at
  * equal ts (side 0 < 1), giving the standard inclusive `≥` semantics.
  *
  * The struct is the ROW-level carrier: ignoreNulls skips only left
  * rows (whose struct is null by the union), never a genuinely-NULL
  * value INSIDE the latest right row — carrying columns individually
  * (the round-3 form) skipped such a value and surfaced an older
  * non-null one, diverging from DuckDB's ASOF LEFT JOIN (which joins
  * the latest row and emits its NULL as-is).
  *
  * Deterministic whenever (key, ts) is unique per side (duplicates are
  * the same ambiguity DuckDB's ASOF leaves unspecified). This covers
  * ALL variants — backward, forward, and tolerance alike inherit the
  * tie ambiguity, and the q102/q103 `LATERAL ... LIMIT 1` oracles are
  * equally tie-nondeterministic; cross-engine parity holds because the
  * events fixture keeps (user_id, ts) unique per event type, which
  * TemporalJoinSpec asserts as a precondition rather than trusting.
  */
object AsofOps {

  /** Left as-of right on `key`/`ts`; the right columns `rightCols`
    * arrive as `_asof_<name>` (null when no right row precedes —
    * ASOF LEFT JOIN semantics).
    *
    * `forward` flips the direction: attach the EARLIEST right row with
    * right.ts ≥ left.ts (pandas `merge_asof(direction='forward')`) —
    * the same one-shuffle carry, traversed in descending ts (right
    * still sorts before left at equal ts, keeping equality inclusive).
    *
    * `toleranceMicros` (with a micros-typed `ts`) bounds the match
    * gap: a carried row farther than the tolerance is nulled AFTER the
    * carry — per-row arithmetic, no second window. Pass ≤0 for
    * unbounded. */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, rightCols: Seq[String],
      forward: Boolean = false,
      toleranceMicros: Long = 0L): DataFrame = {
    val carryCols =
      if (toleranceMicros > 0 && !rightCols.contains(ts)) rightCols :+ ts
      else rightCols
    val rightAligned = right
      .select(col(key), col(ts),
        struct(carryCols.map(c => col(c)): _*).as("_asof_row"))
      .withColumn("_side", lit(0))
    val leftAligned = left.withColumn("_side", lit(1))
    val unioned = leftAligned.unionByName(rightAligned,
      allowMissingColumns = true)
    val tsOrd = if (forward) col(ts).desc else col(ts).asc
    val w = Window.partitionBy(key)
      .orderBy(tsOrd, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried0 = unioned.withColumn("_asof_row",
      last(col("_asof_row"), ignoreNulls = true).over(w))
    val carried =
      if (toleranceMicros <= 0) carried0
      else {
        val gap =
          if (forward) col("_asof_row").getField(ts) - col(ts)
          else col(ts) - col("_asof_row").getField(ts)
        carried0.withColumn("_asof_row",
          when(gap <= toleranceMicros, col("_asof_row")))
      }
    val extracted = rightCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"_asof_$c", col("_asof_row").getField(c))
    }
    extracted.filter(col("_side") === 1).drop("_side", "_asof_row")
  }

  /** Harness query: every purchase joined to the user's latest prior
    * view — oracle is DuckDB's NATIVE `ASOF LEFT JOIN`, so the composed
    * implementation is checked against a first-class reference
    * implementation of the operator. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_asof_join" -> ((spark: SparkSession, sfDir: String) => {
      val events = Tables.load(spark, sfDir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val views = events.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      asofJoin(purchases, views, "user_id", "ts", Seq("value", "ts"))
        .select(
          col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("purchase_us"),
          round(col("_asof_value"), 2).as("last_view_value"),
          (unix_micros(col("ts")) - unix_micros(col("_asof_ts")))
            .as("gap_us"))
    }),
    // q102: as-of within a 1-day tolerance — a stale quote/view is no
    // match (merge_asof(tolerance=...)); ts pre-projected to micros so
    // the gap bound is integer arithmetic in both engines
    "q102_asof_tolerance" -> ((spark: SparkSession, sfDir: String) => {
      val events = Tables.load(spark, sfDir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"))
      val views = events.filter(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("value"))
      asofJoin(purchases, views, "user_id", "us", Seq("value"),
          toleranceMicros = DayUs)
        .select(col("event_id"), col("user_id"),
          col("us").as("purchase_us"),
          round(col("_asof_value"), 2).as("last_view_value"))
    }),
    // q103: FORWARD as-of — the next view at-or-after each purchase
    // (post-purchase engagement), the direction DuckDB's ASOF doesn't
    // ship; the oracle is the explicit LATERAL next-row subquery
    "q103_asof_forward" -> ((spark: SparkSession, sfDir: String) => {
      val events = Tables.load(spark, sfDir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"))
      val views = events.filter(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("value"))
      asofJoin(purchases, views, "user_id", "us", Seq("value", "us"),
          forward = true)
        .select(col("event_id"), col("user_id"),
          col("us").as("purchase_us"),
          round(col("_asof_value"), 2).as("next_view_value"),
          (col("_asof_us") - col("us")).as("gap_us"))
    })
  )

  private def DayUs = EventOps.DayUs

  def oracleSql: Map[String, String] = Map(
    "q47_asof_join" ->
      """WITH p AS (SELECT user_id, ts, event_id FROM events
                    WHERE event_type = 'purchase'),
            v AS (SELECT user_id, ts, value FROM events
                  WHERE event_type = 'view')
         SELECT p.event_id, p.user_id,
                epoch_us(p.ts) AS purchase_us,
                round(v.value, 2) AS last_view_value,
                epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
         FROM p ASOF LEFT JOIN v
           ON p.user_id = v.user_id AND p.ts >= v.ts""",
    "q102_asof_tolerance" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS us, event_id
                    FROM events WHERE event_type = 'purchase'),
            v AS (SELECT user_id, epoch_us(ts) AS us, value
                  FROM events WHERE event_type = 'view')
         SELECT p.event_id, p.user_id, p.us AS purchase_us,
                round(l.value, 2) AS last_view_value
         FROM p LEFT JOIN LATERAL (
           SELECT v.value FROM v
           WHERE v.user_id = p.user_id AND v.us <= p.us
             AND p.us - v.us <= 86400000000
           ORDER BY v.us DESC LIMIT 1) l ON TRUE""",
    "q103_asof_forward" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS us, event_id
                    FROM events WHERE event_type = 'purchase'),
            v AS (SELECT user_id, epoch_us(ts) AS us, value
                  FROM events WHERE event_type = 'view')
         SELECT p.event_id, p.user_id, p.us AS purchase_us,
                round(l.value, 2) AS next_view_value,
                l.us - p.us AS gap_us
         FROM p LEFT JOIN LATERAL (
           SELECT v.value, v.us FROM v
           WHERE v.user_id = p.user_id AND v.us >= p.us
           ORDER BY v.us ASC LIMIT 1) l ON TRUE"""
  )
}
