package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel: per-user view → click → purchase stage tracking as
  * events arrive — the real-time twin of the batch q60 operator, under
  * the SAME oracle.
  *
  * The funnel frontier (t1 = min view, t2 = min click > t1, t3 = min
  * purchase > t2) is ARRIVAL-ORDER INVARIANT given the right state: t1
  * only ever decreases as views arrive, so the qualifying-click set
  * only grows and t2 only decreases (same one stage up) — which means
  * (a) no watermark is needed for correctness (no flush-at-end problem:
  * every arrival immediately yields the exact frontier for the events
  * seen so far), and (b) candidates at or above the current frontier
  * can never become the answer and are pruned from state. State per
  * user = min view + clicks below t2 + purchases below t3: bounded by
  * the user's PRE-CONVERSION event count (a converted user's state is
  * three longs; production trackers carry the same candidate buffers).
  *
  * Every frontier change emits a sequenced snapshot (append mode); the
  * gate query keeps each user's last snapshot — which must equal the
  * batch q60 row, hash-checked by the shared DuckDB oracle. */
object StreamFunnel {

  final case class FEvent(user_id: Long, event_type: String, tsMicros: Long)
  final case class FState(
      minView: Long, clicks: List[Long], purchases: List[Long], seq: Long)
  final case class Snapshot(
      user_id: Long, view_us: Long, click_us: Option[Long],
      purchase_us: Option[Long], stage: Int, seq: Long)

  private val None_ = Long.MaxValue

  /** Frontier from a state: (t1, t2, t3) with None_ for unset. */
  private[streaming] def frontier(
      minView: Long, clicks: Seq[Long], purchases: Seq[Long]): (Long, Long, Long) = {
    val t1 = minView
    val t2 = if (t1 == None_) None_
      else clicks.filter(_ > t1).minOption.getOrElse(None_)
    val t3 = if (t2 == None_) None_
      else purchases.filter(_ > t2).minOption.getOrElse(None_)
    (t1, t2, t3)
  }

  /** Fold a batch of events into the state; emit a snapshot iff the
    * frontier moved. Shared by the streaming query and the spec's
    * shuffled-order replays. */
  private[streaming] def step(
      user: Long, events: Iterator[FEvent], old: Option[FState]): (FState, Option[Snapshot]) = {
    val s0 = old.getOrElse(FState(None_, Nil, Nil, 0L))
    val before = frontier(s0.minView, s0.clicks, s0.purchases)
    var minView = s0.minView
    var clicks = s0.clicks
    var purchases = s0.purchases
    events.foreach { e =>
      e.event_type match {
        case "view" => if (e.tsMicros < minView) minView = e.tsMicros
        case "click" => clicks = e.tsMicros :: clicks
        case "purchase" => purchases = e.tsMicros :: purchases
        case _ => ()
      }
    }
    val (t1, t2, t3) = frontier(minView, clicks, purchases)
    // prune candidates STRICTLY above the (only-decreasing) frontier —
    // they can never become the minimum. The frontier value itself must
    // stay: a later, earlier-timestamped view lowers t1 and the
    // recomputation still needs the current t2 among its candidates
    // (dropping it would un-qualify a converted stage)
    val keptClicks = if (t2 == None_) clicks else clicks.filter(_ <= t2)
    val keptPurch = if (t3 == None_) purchases else purchases.filter(_ <= t3)
    val moved = (t1, t2, t3) != before
    val seq = if (moved) s0.seq + 1 else s0.seq
    val snap = if (moved && t1 != None_) {
      val stage = 1 + (if (t2 != None_) 1 else 0) + (if (t3 != None_) 1 else 0)
      Some(Snapshot(user, t1,
        if (t2 == None_) None else Some(t2),
        if (t3 == None_) None else Some(t3), stage, seq))
    } else None
    (FState(minView, keptClicks, keptPurch, seq), snap)
  }

  /** The streaming query: flatMapGroupsWithState with NO timeout — the
    * operator is exact at every point in the stream, so nothing waits
    * on a watermark. */
  def funnelStream(spark: SparkSession, events: DataFrame): Dataset[Snapshot] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[FEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FState, Snapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[FEvent], state: GroupState[FState]) =>
          val (next, snap) = step(user, it, state.getOption)
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
      .select(col("user_id"), col("view_us"), col("click_us"),
        col("purchase_us"), col("stage"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_stream_funnel" -> (funnelStreamed _)
  )

  /** The batch funnel oracle verbatim — the stream's final snapshots
    * must reproduce it. */
  def oracleSql: Map[String, String] = Map(
    "q63_stream_funnel" ->
      graft.operators.EventOps.oracleSql("q60_funnel")
  )
}
