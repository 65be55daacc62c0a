package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel: per-user stage tracking over an arbitrary ordered
  * event chain as events arrive — the real-time twin of the batch q60
  * operator (EventOps.funnelOn, same default chain), under the SAME
  * oracle.
  *
  * The funnel frontier (t0 = min first-stage time, t_i = min stage-i
  * time > t_{i-1}) is ARRIVAL-ORDER INVARIANT given the right state:
  * t0 only ever decreases as events arrive, so each stage's qualifying
  * set only grows and every t_i only decreases — which means (a) no
  * watermark is needed for correctness (no flush-at-end problem: every
  * arrival immediately yields the exact frontier for the events seen
  * so far), and (b) candidates STRICTLY above the current frontier can
  * never become a minimum and are pruned from state; the frontier
  * values themselves must stay (a later, earlier-timestamped
  * first-stage event lowers t0 and the recomputation needs them).
  * State per user = min first-stage time + per-later-stage candidates
  * at or below that stage's frontier: bounded by the user's
  * PRE-CONVERSION event count (a converted user holds one time per
  * stage; production trackers carry the same candidate buffers).
  *
  * Every frontier change emits a sequenced snapshot (append mode); the
  * gate query keeps each user's last snapshot — which must equal the
  * batch q60 row, hash-checked by the shared DuckDB oracle. */
object StreamFunnel {

  val DefaultStages: Seq[String] = Seq("view", "click", "purchase")

  final case class FEvent(user_id: Long, event_type: String, tsMicros: Long)
  /** candidates(i) backs stage i+1 (stage 0 keeps only its min). */
  final case class FState(
      minFirst: Long, candidates: Seq[Seq[Long]], seq: Long)
  final case class Snapshot(
      user_id: Long, times: Seq[Option[Long]], stage: Int, seq: Long)

  private val None_ = Long.MaxValue

  /** Frontier vector from candidates: t(0) = minFirst, t(i) = min
    * stage-i candidate strictly after t(i-1); None_ once undefined. */
  private[streaming] def frontier(
      n: Int, minFirst: Long, candidates: Seq[Seq[Long]]): Seq[Long] = {
    val ts = Array.fill(n)(None_)
    ts(0) = minFirst
    var i = 1
    while (i < n) {
      ts(i) = if (ts(i - 1) == None_) None_
        else candidates(i - 1).filter(_ > ts(i - 1))
          .minOption.getOrElse(None_)
      i += 1
    }
    ts.toSeq
  }

  /** Fold a batch of events into the state; emit a snapshot iff the
    * frontier moved. Shared by the streaming query and the spec's
    * shuffled-order replays. */
  private[streaming] def step(
      user: Long, events: Iterator[FEvent], old: Option[FState],
      stages: Seq[String] = DefaultStages): (FState, Option[Snapshot]) = {
    val n = stages.size
    val idx = stages.zipWithIndex.toMap
    val s0 = old.getOrElse(FState(None_, Seq.fill(n - 1)(Nil), 0L))
    val before = frontier(n, s0.minFirst, s0.candidates)
    var minFirst = s0.minFirst
    val cands = s0.candidates.map(_.toList).toArray
    events.foreach { e =>
      idx.get(e.event_type) match {
        case Some(0) => if (e.tsMicros < minFirst) minFirst = e.tsMicros
        case Some(i) => cands(i - 1) = e.tsMicros :: cands(i - 1)
        case None => ()
      }
    }
    val ts = frontier(n, minFirst, cands.toSeq)
    // prune candidates STRICTLY above the (only-decreasing) frontier
    var i = 1
    while (i < n) {
      if (ts(i) != None_) cands(i - 1) = cands(i - 1).filter(_ <= ts(i))
      i += 1
    }
    val moved = ts != before
    val seq = if (moved) s0.seq + 1 else s0.seq
    val snap = if (moved && ts.head != None_) {
      Some(Snapshot(user,
        ts.map(t => if (t == None_) None else Some(t)),
        ts.count(_ != None_), seq))
    } else None
    (FState(minFirst, cands.toSeq, seq), snap)
  }

  /** The streaming query: flatMapGroupsWithState with NO timeout — the
    * operator is exact at every point in the stream, so nothing waits
    * on a watermark. */
  def funnelStream(
      spark: SparkSession, events: DataFrame,
      stages: Seq[String] = DefaultStages): Dataset[Snapshot] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[FEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FState, Snapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[FEvent], state: GroupState[FState]) =>
          val (next, snap) = step(user, it, state.getOption, stages)
          state.update(next)
          snap.iterator
      }
  }

  /** q63: the file-source stream run to completion; each user's LAST
    * snapshot (max seq — frontier moves only ever improve it) is the
    * final funnel row and must equal batch q60's. */
  def funnelStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    val snaps = StreamRun.toCompletion(
      funnelStream(spark,
        EventStream.readEvents(spark, sfDir, glob = "events.parquet")).toDF(),
      "graft_stream_funnel")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("seq").desc)
    snaps.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"),
        col("times").getItem(0).as("view_us"),
        col("times").getItem(1).as("click_us"),
        col("times").getItem(2).as("purchase_us"),
        col("stage"))
  }

  /** q64: streaming retention — the stateful stage is a per-(user, day)
    * streaming DISTINCT (`dropDuplicates`: one state row per active
    * user-day, the event stream's activity matrix built incrementally,
    * arrival-order invariant by construction); the cohort × offset math
    * is batch post-processing on the completed sink, shared verbatim
    * with batch q62 (the q56 pattern: stream the heavy reduction, read
    * the bounded result). No watermark: exact-by-construction for the
    * gate's finite replay; a production deployment adds
    * `dropDuplicatesWithinWatermark` to bound state by the reorder
    * horizon at the cost of dropping beyond-horizon stragglers. */
  def retentionStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.EventOps
    val days = StreamRun.toCompletion(
      EventStream.readEvents(spark, sfDir, glob = "events.parquet")
        .select(col("user_id"),
          expr(s"unix_micros(ts) div ${EventOps.DayUs}").as("day"))
        .dropDuplicates("user_id", "day"),
      "graft_stream_retention")
    // re-baseline the completed sink (fresh attribute ids): the cohort
    // aggregate self-joins this frame, and a memory-sink VIEW on both
    // join sides trips the analyzer's conflicting-reference check
    val fresh = spark.createDataFrame(days.rdd, days.schema)
    EventOps.retentionOnDays(fresh)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_stream_funnel" -> (funnelStreamed _),
    "q64_stream_retention" -> (retentionStreamed _)
  )

  /** The batch oracles verbatim — the streams' final answers must
    * reproduce them. */
  def oracleSql: Map[String, String] = Map(
    "q63_stream_funnel" ->
      graft.operators.EventOps.oracleSql("q60_funnel"),
    "q64_stream_retention" ->
      graft.operators.EventOps.oracleSql("q62_retention")
  )
}
