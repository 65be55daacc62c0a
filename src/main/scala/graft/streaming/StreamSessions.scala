package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization under the hash gate — the exact-replay
  * twin of [[EventStream.sessionize]].
  *
  * Gap-merge sessionization is ARRIVAL-ORDER INVARIANT: the final
  * interval set is the connected components of events on the time
  * line (points within `gap` connect), independent of delivery order —
  * so, like the funnel, the operator can run with NO timeout and emit
  * a sequenced per-user snapshot of its interval set whenever it
  * changes; the last snapshot explodes into exactly the batch q61
  * sessions, hash-checked by the shared DuckDB oracle.
  *
  * State = the user's gap-separated intervals. In THIS gate form that
  * is all of the user's sessions (exact replay, nothing evicted); the
  * production form is [[EventStream.sessionize]], which carries only
  * watermark-open intervals and flushes closed ones — same merge
  * kernel semantics (EventOpsSpec proves batch q61 equals that kernel;
  * this entry puts the equality under the driver's hash gate). */
object StreamSessions {

  final case class SEvent(user_id: Long, event_type: String, tsMicros: Long)
  final case class SInterval(
      start: Long, last: Long, events: Long, types: Seq[String])
  final case class SState(intervals: Seq[SInterval], seq: Long)
  final case class Snapshot(
      user_id: Long, intervals: Seq[SInterval], seq: Long)

  /** Merge one typed event into the interval set — the SHARED
    * [[EventStream.mergeEvent]] kernel (same gap-connectivity rule as
    * the production sessionizer) with an event-type-set payload
    * (bounded by the event-type vocabulary). An event can bridge two
    * intervals; counts add, type sets union. */
  private[streaming] def addEvent(
      iv: List[SInterval], ts: Long, tpe: String, gapUs: Long): List[SInterval] =
    EventStream.mergeEvent[SInterval](iv, ts, gapUs, _.start, _.last,
      SInterval(ts, ts, 1L, Seq(tpe)),
      (a, b) => SInterval(math.min(a.start, b.start),
        math.max(a.last, b.last), a.events + b.events,
        (a.types ++ b.types).distinct.sorted))

  private[streaming] def step(
      user: Long, events: Iterator[SEvent], old: Option[SState],
      gapUs: Long): (SState, Option[Snapshot]) = {
    val s0 = old.getOrElse(SState(Nil, 0L))
    var ivs = s0.intervals.toList
    var changed = false
    events.foreach { e =>
      ivs = addEvent(ivs, e.tsMicros, e.event_type, gapUs)
      changed = true
    }
    if (changed) {
      val seq = s0.seq + 1
      (SState(ivs, seq), Some(Snapshot(user, ivs, seq)))
    } else (s0, None)
  }

  def sessionStream(
      spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30): Dataset[Snapshot] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[SEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SState, Snapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[SEvent], state: GroupState[SState]) =>
          val (next, snap) = step(user, it, state.getOption, gapUs)
          state.update(next)
          snap.iterator
      }
  }

  /** q65: run to completion, keep each user's last snapshot, explode
    * its intervals into q61's session rows (session_idx = rank by
    * start — each batch break adds exactly one session, so the time
    * order IS the break count). */
  def sessionsStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    val snaps = StreamRun.toCompletion(
      sessionStream(spark,
        EventStream.readEvents(spark, sfDir, glob = "events.parquet")).toDF(),
      "graft_stream_sessions")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("seq").desc)
    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("iv.start"))
    snaps.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), explode(col("intervals")).as("iv"))
      .select(col("user_id"),
        (row_number().over(rank) - 1).cast("long").as("session_idx"),
        col("iv.events").as("n_events"),
        col("iv.start").as("start_us"),
        col("iv.last").as("end_us"),
        size(col("iv.types")).cast("long").as("n_types"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q65_stream_sessions" -> (sessionsStreamed _),
    "q73_stream_sessions_native" -> (sessionsNative _)
  )

  /** q73: gap-based sessions via Spark's NATIVE `session_window`
    * aggregation — the built-in form of what q65 implements with
    * custom state. Spark-first division of labor: where the built-in
    * expresses the semantics (fixed gap, standard aggregates, final
    * answer per session), USE it — state store, merge logic, and
    * watermark finalization come for free and survive engine upgrades;
    * q65's flatMapGroupsWithState kernel remains for what the built-in
    * cannot produce (sequenced per-user snapshots DURING the stream,
    * not just finalized sessions after the watermark).
    *
    * Boundary semantics: `session_window` merges events whose
    * [ts, ts+gap) windows OVERLAP, so a session breaks at gap ≥ 30 min
    * — q61/q65 break strictly-greater. The two coincide unless an
    * event lands at EXACTLY the gap (none at any gate SF, verified);
    * the oracle below uses the ≥ semantics so this entry stays correct
    * if one ever appears. */
  def sessionsNative(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val sessions = EventStream.readEvents(spark, sfDir, glob = "events.parquet")
      .withColumn("us", unix_micros(col("ts")))
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        min("us").as("start_us"), max("us").as("end_us"),
        size(collect_set("event_type")).cast("bigint").as("n_types"))
      .select("user_id", "start_us", "end_us", "n_events", "n_types")
    // complete mode (the q50/q56 gate discipline): a finite replay must
    // emit EVERY session — append mode only releases a session once the
    // watermark passes its end, which permanently withholds the last
    // horizon's sessions when the stream simply stops (measured: 24 of
    // 9549 sessions at sf0.01). A production run would use append and
    // accept that pending tail as the price of finalized-only output.
    StreamRun.toCompletion(sessions, "graft_stream_sessions_native",
      outputMode = "complete")
  }

  /** The batch sessionize oracle verbatim (q65); q73's twin emits
    * per-session rows keyed by start time with the ≥-gap break. */
  def oracleSql: Map[String, String] = Map(
    "q65_stream_sessions" ->
      graft.operators.EventOps.oracleSql("q61_sessionize"),
    "q73_stream_sessions_native" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
                    FROM events),
          g AS (SELECT *,
                       CASE WHEN us - lag(us) OVER
                              (PARTITION BY user_id ORDER BY us, event_type)
                            >= 1800000000 THEN 1 ELSE 0 END AS brk
                FROM e),
          s AS (SELECT *,
                       sum(brk) OVER
                         (PARTITION BY user_id ORDER BY us, event_type
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS session_idx
                FROM g)
        SELECT user_id, min(us) AS start_us, max(us) AS end_us,
               count(*) AS n_events,
               count(DISTINCT event_type) AS n_types
        FROM s GROUP BY user_id, session_idx"""
  )
}
