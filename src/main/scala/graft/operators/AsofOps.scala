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
  * the same ambiguity DuckDB's ASOF leaves unspecified).
  */
object AsofOps {

  /** Left as-of right on `key`/`ts`; the right columns `rightCols`
    * arrive as `_asof_<name>` (null when no right row precedes —
    * ASOF LEFT JOIN semantics). */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, rightCols: Seq[String]): DataFrame = {
    val rightAligned = right
      .select(col(key), col(ts),
        struct(rightCols.map(c => col(c)): _*).as("_asof_row"))
      .withColumn("_side", lit(0))
    val leftAligned = left.withColumn("_side", lit(1))
    val unioned = leftAligned.unionByName(rightAligned,
      allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_asof_row",
      last(col("_asof_row"), ignoreNulls = true).over(w))
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
    })
  )

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
           ON p.user_id = v.user_id AND p.ts >= v.ts"""
  )
}
