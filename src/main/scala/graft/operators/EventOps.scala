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
    val run = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
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
    * purchase before the first view never converts. Per-user output
    * with the reached stage and stage times. Scale: three filtered
    * aggregates and two joins, all keyed on user_id; event_type
    * filters push into the scan. */
  def funnel(spark: SparkSession, sfDir: String): DataFrame =
    funnelOn(events(spark, sfDir))

  /** [[funnel]] over any (user_id, event_type, us) frame. */
  def funnelOn(e: DataFrame): DataFrame = {
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("view_us"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("us") > col("view_us"))
      .groupBy("user_id").agg(min("us").as("click_us"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("us") > col("click_us"))
      .groupBy("user_id").agg(min("us").as("purchase_us"))
    v.join(c.select(col("user_id"), col("click_us")), Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("view_us"), col("click_us"),
        col("purchase_us"),
        (lit(1) + when(col("click_us").isNotNull, 1).otherwise(0) +
          when(col("purchase_us").isNotNull, 1).otherwise(0))
          .cast("int").as("stage"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_funnel" -> (funnel _),
    "q61_sessionize" -> ((s: SparkSession, d: String) => sessionize(s, d))
  )

  def oracleSql: Map[String, String] = Map(
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
        FROM s GROUP BY 1, 2"""
  )
}
