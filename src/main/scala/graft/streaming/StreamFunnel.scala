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
  /** [[FEvent]] still carrying the watermarked timestamp column — the
    * event-time tag must survive into the stateful operator or Spark
    * refuses `getCurrentWatermarkMs`. */
  final case class FEventW(
      user_id: Long, event_type: String, tsMicros: Long,
      ts: java.sql.Timestamp)
  /** candidates(i) backs stage i+1 (stage 0 keeps only its min). */
  final case class FState(
      minFirst: Long, candidates: Seq[Seq[Long]], seq: Long)
  final case class Snapshot(
      user_id: Long, times: Seq[Option[Long]], stage: Int, seq: Long)

  private val None_ = Long.MaxValue

  import graft.operators.EventOps.PatternStage

  /** A plain funnel chain as a pattern: every stage required, no gap. */
  private def plainPattern(stages: Seq[String]): Seq[PatternStage] =
    stages.map(PatternStage(_))

  /** anchors(i) = index of the last REQUIRED stage before i — the stage
    * whose frontier time stage i's window hangs off (the batch
    * funnelPatternOn anchor rule: optional stages never advance the
    * anchor). anchors(0) is unused (-1). */
  private[streaming] def anchorsOf(pattern: Seq[PatternStage]): Array[Int] = {
    val a = new Array[Int](pattern.size)
    a(0) = -1
    var last = 0
    var i = 1
    while (i < pattern.size) {
      a(i) = last
      if (!pattern(i).optional) last = i
      i += 1
    }
    a
  }

  /** Frontier vector from candidates: t(0) = minFirst, t(i) = min
    * stage-i candidate strictly after its ANCHOR time (the last
    * required stage before i) and inside that anchor's gap window when
    * the stage declares one; None_ once the anchor is undefined or no
    * candidate qualifies. With an all-required no-gap pattern this is
    * exactly the plain funnel chain t(i) = min candidate > t(i-1). */
  private[streaming] def patternFrontier(
      pattern: Seq[PatternStage], minFirst: Long,
      candidates: Seq[Seq[Long]]): Seq[Long] = {
    val n = pattern.size
    val anchors = anchorsOf(pattern)
    val ts = Array.fill(n)(None_)
    ts(0) = minFirst
    var i = 1
    while (i < n) {
      val a = ts(anchors(i))
      ts(i) = if (a == None_) None_
        else candidates(i - 1)
          .filter(t => t > a && pattern(i).maxGapUs.forall(t <= a + _))
          .minOption.getOrElse(None_)
      i += 1
    }
    ts.toSeq
  }

  private[streaming] def frontier(
      n: Int, minFirst: Long, candidates: Seq[Seq[Long]]): Seq[Long] = {
    require(n > 0)
    patternFrontier(plainPattern(Seq.tabulate(n)(_.toString)),
      minFirst, candidates)
  }

  /** Fold a batch of events into the state; emit a snapshot iff the
    * frontier moved. Shared by the streaming query and the spec's
    * shuffled-order replays.
    *
    * `watermarkUs` (the event-time watermark, in the events' µs
    * domain) enables the bounded form: once the watermark passes t, no
    * event with ts ≤ t can arrive, which finalizes the frontier prefix
    * at or below it and licenses two evictions that the exact form
    * (default `Long.MinValue` = no watermark) cannot take:
    *
    *  - ts(i−1) ≤ wm ⇒ ts(i−1) is FINAL (frontier times are strictly
    *    increasing, so the whole prefix ≤ wm is; a decrease would need
    *    a new event below the watermark). Stage i's buffer collapses
    *    to the single current minimum above it — everything else can
    *    never be `min > ts(i−1)` again.
    *  - otherwise ts(i−1), now and forever, is > wm (it is either
    *    already > wm and only decreases toward future events' ts > wm,
    *    or undefined and waits on a future event), so a candidate at
    *    or below the watermark can never qualify and is dropped. THIS
    *    is what bounds the click-only bot that never produces a
    *    first-stage event: its candidates age out of the horizon
    *    instead of accumulating forever.
    *
    * `maxCandidates` caps each buffer as a defense for adversarial
    * users inside the horizon, keeping the smallest values — the
    * retained set is then exactly the k smallest candidates ever seen,
    * so a capped funnel either reports the exact stage time or fails
    * to qualify the stage (under-reporting, never inventing a
    * conversion); it binds only for a user with more than k
    * same-stage pre-conversion events inside one watermark horizon. */
  private[streaming] def step(
      user: Long, events: Iterator[FEvent], old: Option[FState],
      stages: Seq[String] = DefaultStages,
      watermarkUs: Long = Long.MinValue,
      maxCandidates: Int = Int.MaxValue): (FState, Option[Snapshot]) =
    patternStep(user, events, old, plainPattern(stages),
      watermarkUs, maxCandidates)

  /** [[step]] generalized to a [[PatternStage]] chain (optional stages,
    * per-stage maxGap windows) — the streaming kernel behind both q63
    * (plain chain) and q68 (the q67 pattern).
    *
    * Why the funnel's arrival-order-invariance argument survives the
    * two extensions: each stage's DEFINED frontier values still form a
    * non-increasing sequence over arrivals. Anchors only decrease
    * (induction up the required chain), and when an anchor drops from A
    * to A', any candidate newly qualifying in (A', A'+g] is < the old
    * minimum m (m > A > A', and if a candidate c > m qualified then
    * m ≤ c ≤ A'+g would qualify too) — so a stage time never increases,
    * though a gap window CAN un-define it (the old minimum slides past
    * the lowered window's right edge with nothing else inside). Hence
    * the plain evictions generalize verbatim:
    *
    *  - candidates strictly above a defined stage time can never be a
    *    future minimum (the retained minimum qualifies in any future
    *    window they do, and is smaller);
    *  - with a defined anchor and a gap, candidates above anchor+gap
    *    can never enter any future (only-shrinking-rightward) window;
    *  - an anchor at/below the watermark is FINAL (its whole required
    *    prefix is below the horizon, and events ≤ wm are dropped), so
    *    the window is fixed forever: collapse the buffer to the
    *    current minimum (or nothing);
    *  - under a non-final anchor every future anchor value is > wm
    *    (a value ≤ wm would make its own prefix final), so candidates
    *    at/below the watermark can never qualify: age them out. */
  private[streaming] def patternStep(
      user: Long, events: Iterator[FEvent], old: Option[FState],
      pattern: Seq[PatternStage],
      watermarkUs: Long = Long.MinValue,
      maxCandidates: Int = Int.MaxValue): (FState, Option[Snapshot]) = {
    val n = pattern.size
    require(n > 0 && !pattern.head.optional,
      "the first stage anchors the chain")
    val idx = pattern.map(_.name).zipWithIndex.toMap
    val anchors = anchorsOf(pattern)
    val s0 = old.getOrElse(FState(None_, Seq.fill(n - 1)(Nil), 0L))
    val before = patternFrontier(pattern, s0.minFirst, s0.candidates)
    var minFirst = s0.minFirst
    val cands = s0.candidates.map(_.toList).toArray
    // Spark does NOT filter late rows before flatMapGroupsWithState: a
    // straggler BELOW the watermark could still lower minFirst AFTER
    // downstream buffers were collapsed under the old anchor, yielding a
    // snapshot inconsistent with the finalized-frontier contract. Drop
    // strictly-late events (ts < wm — Spark's "older than the
    // watermark" convention); an event AT the watermark stays
    // deliverable and is safe for every eviction: it can never
    // strictly lower a frontier value that is ≤ wm (lowering needs a
    // candidate < the current value ≤ wm), and under a non-final
    // anchor it can never qualify (anchors stay > wm, qualification is
    // strict). No-op for the exact form (wm = Long.MinValue).
    events.filter(_.tsMicros >= watermarkUs).foreach { e =>
      idx.get(e.event_type) match {
        case Some(0) => if (e.tsMicros < minFirst) minFirst = e.tsMicros
        case Some(i) => cands(i - 1) = e.tsMicros :: cands(i - 1)
        case None => ()
      }
    }
    val ts = patternFrontier(pattern, minFirst, cands.toSeq)
    var i = 1
    while (i < n) {
      val a = ts(anchors(i))
      // prune candidates STRICTLY above the (never-increasing) stage
      // time; when the stage is undefined but its window is known,
      // prune above the window's maximal future right edge
      if (ts(i) != None_) cands(i - 1) = cands(i - 1).filter(_ <= ts(i))
      else pattern(i).maxGapUs.foreach { g =>
        if (a != None_) cands(i - 1) = cands(i - 1).filter(_ <= a + g)
      }
      if (a <= watermarkUs) // None_=MaxValue never ≤ a real wm
        cands(i - 1) = if (ts(i) == None_) Nil else List(ts(i))
      else
        cands(i - 1) = cands(i - 1).filter(_ > watermarkUs)
      if (cands(i - 1).sizeIs > maxCandidates)
        cands(i - 1) = cands(i - 1).sorted.take(maxCandidates)
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

  /** The PRODUCTION funnel: [[funnelStream]]'s semantics under an
    * event-time watermark, with per-user state bounded by the reorder
    * horizon instead of the user's pre-conversion history. Events more
    * than `lag` behind the stream's max event time are declared
    * undeliverable; [[step]]'s watermark evictions then (a) collapse
    * each stage buffer to one value once the prior stage's frontier
    * time falls behind the watermark, and (b) age out candidates a
    * first-stage event can no longer precede — so a click-only bot
    * holds O(horizon) state, not O(history) (the exact gate form q63
    * keeps everything, which is fine for finite replay but unbounded
    * on an endless stream). `maxCandidates` additionally caps each
    * buffer inside the horizon; when it binds the funnel under-reports
    * (misses a stage), never invents a conversion. The trade every
    * watermark buys: a straggler beyond `lag` arrives too late to
    * lower a finalized frontier — same contract as
    * [[EventStream.sessionize]] and hourly windows. */
  def funnelStreamBounded(
      spark: SparkSession, events: DataFrame,
      stages: Seq[String] = DefaultStages,
      lag: String = "1 hour", maxCandidates: Int = 10000): Dataset[Snapshot] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsMicros"), col("ts"))
      .withWatermark("ts", lag)
      .as[FEventW]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FState, Snapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[FEventW], state: GroupState[FState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (next, snap) = step(user,
            it.map(e => FEvent(e.user_id, e.event_type, e.tsMicros)),
            state.getOption, stages, wmUs, maxCandidates)
          state.update(next)
          snap.iterator
      }
  }

  /** The streaming PATTERN funnel (q67's real-time twin): [[funnelStream]]
    * with the generalized [[patternStep]] kernel — optional stages and
    * per-stage gap windows, exact at every point of the stream. */
  def funnelPatternStream(
      spark: SparkSession, events: DataFrame,
      pattern: Seq[PatternStage]): Dataset[Snapshot] = {
    require(pattern.nonEmpty, "pattern needs at least one stage")
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[FEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FState, Snapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[FEvent], state: GroupState[FState]) =>
          val (next, snap) = patternStep(user, it, state.getOption, pattern)
          state.update(next)
          snap.iterator
      }
  }

  /** [[funnelPatternStream]] under an event-time watermark — the
    * production form whose per-user state is bounded by the reorder
    * horizon, exactly [[funnelStreamBounded]]'s contract: the
    * generalized evictions in [[patternStep]] collapse finalized-anchor
    * buffers and age out candidates no anchor can precede any more;
    * gap windows additionally drop candidates past their anchor's
    * maximal future window. `maxCandidates` caps each buffer inside
    * the horizon (binding ⇒ under-reports a stage, never invents). */
  def funnelPatternStreamBounded(
      spark: SparkSession, events: DataFrame,
      pattern: Seq[PatternStage],
      lag: String = "1 hour", maxCandidates: Int = 10000): Dataset[Snapshot] = {
    require(pattern.nonEmpty, "pattern needs at least one stage")
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsMicros"), col("ts"))
      .withWatermark("ts", lag)
      .as[FEventW]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FState, Snapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[FEventW], state: GroupState[FState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (next, snap) = patternStep(user,
            it.map(e => FEvent(e.user_id, e.event_type, e.tsMicros)),
            state.getOption, pattern, wmUs, maxCandidates)
          state.update(next)
          snap.iterator
      }
  }

  /** q68: the q67 pattern (view → click ≤3d → signup? ≤3d → purchase
    * ≤7d of click) streamed to completion; each user's last snapshot
    * must equal batch q67's row — gated by q67's DuckDB oracle
    * VERBATIM, and the pattern constant is shared
    * (EventOps.DefaultPattern), so the two forms cannot drift. */
  def funnelPatternStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    val pattern = graft.operators.EventOps.DefaultPattern
    val snaps = StreamRun.toCompletion(
      funnelPatternStream(spark,
        EventStream.readEvents(spark, sfDir, glob = "events.parquet"),
        pattern).toDF(),
      "graft_stream_funnel_pattern")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("seq").desc)
    snaps.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id") +:
        pattern.zipWithIndex.map { case (st, i) =>
          col("times").getItem(i).as(s"${st.name}_us")
        } :+ col("stage").as("matched"): _*)
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
    * gate's finite replay; [[retentionDaysBounded]] is the production
    * twin whose state is bounded by the reorder horizon. */
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

  /** The PRODUCTION activity-matrix stage of q64:
    * `dropDuplicatesWithinWatermark` keeps one state row per active
    * (user, day) only while the watermark can still deliver a
    * duplicate, then EVICTS it — state is bounded by the horizon's
    * key-arrival rate, never by stream length (the gate form's
    * `dropDuplicates` + NoTimeout retains every user-day forever,
    * which only a finite replay can afford). A (user, day) redelivered
    * beyond `lag` re-emits and counts twice downstream — the standard
    * within-watermark-exactly-once contract, same as
    * [[EventStream.dedupEvents]]. The cohort × offset aggregate
    * over the emitted days is batch post-processing, shared verbatim
    * with q62. */
  def retentionDaysBounded(events: DataFrame, lag: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lag)
      .select(col("user_id"),
        expr(s"unix_micros(ts) div ${graft.operators.EventOps.DayUs}").as("day"),
        col("ts"))
      .dropDuplicatesWithinWatermark("user_id", "day")
      .select("user_id", "day")

  /** Horizon for the bounded-twin GATE entries: wider than the whole
    * fixture's event-time span, so the watermark never passes an event
    * still able to change an answer — every eviction the bounded
    * kernels may take is semantics-preserving and the result must be
    * IDENTICAL to the exact form's. That is the point of the gate row:
    * the production O(horizon)-state code path runs under the batch
    * oracle, not just under its unit spec. (In production `lag` is the
    * real reorder horizon — "1 hour" — and the same argument bounds
    * state instead of preserving history.) */
  val FixtureHorizon = "3650 days"

  /** q85: [[funnelStreamBounded]] — the watermarked production funnel —
    * over the finite fixture at [[FixtureHorizon]], gated by q60's
    * DuckDB oracle VERBATIM (q63 proves the exact kernel; this row
    * proves the bounded one). */
  def funnelStreamedBounded(spark: SparkSession, sfDir: String): DataFrame = {
    val snaps = StreamRun.toCompletion(
      funnelStreamBounded(spark,
        EventStream.readEvents(spark, sfDir, glob = "events.parquet"),
        lag = FixtureHorizon).toDF(),
      "graft_stream_funnel_bounded")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("seq").desc)
    snaps.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"),
        col("times").getItem(0).as("view_us"),
        col("times").getItem(1).as("click_us"),
        col("times").getItem(2).as("purchase_us"),
        col("stage"))
  }

  /** q86: [[funnelPatternStreamBounded]] at [[FixtureHorizon]] — the
    * watermarked pattern funnel under q67's oracle VERBATIM (q68
    * proves the exact pattern kernel; this row the bounded one). */
  def funnelPatternStreamedBounded(
      spark: SparkSession, sfDir: String): DataFrame = {
    val pattern = graft.operators.EventOps.DefaultPattern
    val snaps = StreamRun.toCompletion(
      funnelPatternStreamBounded(spark,
        EventStream.readEvents(spark, sfDir, glob = "events.parquet"),
        pattern, lag = FixtureHorizon).toDF(),
      "graft_stream_funnel_pattern_bounded")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("seq").desc)
    snaps.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id") +:
        pattern.zipWithIndex.map { case (st, i) =>
          col("times").getItem(i).as(s"${st.name}_us")
        } :+ col("stage").as("matched"): _*)
  }

  /** q87: [[retentionDaysBounded]] at [[FixtureHorizon]] — the
    * within-watermark-dedup activity matrix under q62's oracle VERBATIM
    * (q64 proves the keep-forever `dropDuplicates` form; this row the
    * evicting production one). */
  def retentionStreamedBounded(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.EventOps
    val days = StreamRun.toCompletion(
      retentionDaysBounded(
        EventStream.readEvents(spark, sfDir, glob = "events.parquet"),
        lag = FixtureHorizon),
      "graft_stream_retention_bounded")
    // re-baseline the completed sink (fresh attribute ids) — same
    // self-join hazard as [[retentionStreamed]]
    val fresh = spark.createDataFrame(days.rdd, days.schema)
    EventOps.retentionOnDays(fresh)
  }

  /** q125: q124's A/B report as events LAND — the experiment read-out
    * computed at ingest time instead of a nightly batch. The stateful
    * half is ONE per-user aggregation (min view us, max purchase us —
    * both commutative, so the stream must reproduce the batch answer
    * EXACTLY regardless of arrival order; complete mode here, state =
    * one row per user; the production watermarked form evicts on the
    * decision horizon). The report tail is q124's
    * [[graft.operators.EventOps.abReportFromUser]] VERBATIM on the
    * completed sink (the q64 pattern), gated by q124's oracle. */
  def abReportStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.EventOps
    val u = StreamRun.toCompletion(
      EventStream.readEvents(spark, sfDir, glob = "events.parquet")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
        .groupBy("user_id").agg(
          min(when(col("event_type") === "view", col("us"))).as("v0"),
          max(when(col("event_type") === "purchase", col("us")))
            .as("pmax")),
      "graft_stream_ab", outputMode = "complete")
    val fresh = spark.createDataFrame(u.rdd, u.schema)
    EventOps.abReportFromUser(fresh)
  }

  /** q127: q126's Markov transition matrix as events LAND. The
    * stateful half is one per-user `collect_list` aggregation — a
    * MULTISET union, commutative, so the completed state is
    * arrival-order independent even though transitions themselves are
    * order-sensitive; `sort_array` at emission plus the batch tail's
    * own (us, event_id) sort make the pairing deterministic. Complete
    * mode, one state row per user (the production watermarked form
    * evicts users on the session horizon — a user silent past the gap
    * can emit no further in-session transition). The tail is q126's
    * [[graft.operators.EventOps.markovTransitionsOn]] VERBATIM on the
    * exploded sink (the q125/q64 pattern), gated by q126's oracle. */
  def markovStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.EventOps
    val u = StreamRun.toCompletion(
      EventStream.readEvents(spark, sfDir, glob = "events.parquet")
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
        .groupBy("user_id")
        .agg(sort_array(collect_list(struct(col("us"), col("event_id"),
          col("event_type")))).as("evs")),
      "graft_stream_markov", outputMode = "complete")
    val fresh = spark.createDataFrame(u.rdd, u.schema)
    EventOps.markovTransitionsOn(
      fresh.select(col("user_id"), explode(col("evs")).as("e"))
        .select(col("e.event_id").as("event_id"), col("user_id"),
          col("e.event_type").as("event_type"), col("e.us").as("us")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q127_stream_markov" -> (markovStreamed _),
    "q125_stream_ab" -> (abReportStreamed _),
    "q63_stream_funnel" -> (funnelStreamed _),
    "q64_stream_retention" -> (retentionStreamed _),
    "q68_stream_funnel_pattern" -> (funnelPatternStreamed _),
    "q85_stream_funnel_bounded" -> (funnelStreamedBounded _),
    "q86_stream_funnel_pattern_bounded" -> (funnelPatternStreamedBounded _),
    "q87_stream_retention_bounded" -> (retentionStreamedBounded _)
  )

  /** The batch oracles verbatim — the streams' final answers must
    * reproduce them (the bounded twins are held to the SAME oracles as
    * their exact forms: at [[FixtureHorizon]] boundedness must be
    * invisible in the result). */
  def oracleSql: Map[String, String] = Map(
    "q127_stream_markov" ->
      graft.operators.EventOps.oracleSql("q126_markov_transitions"),
    "q125_stream_ab" ->
      graft.operators.EventOps.oracleSql("q124_ab_report"),
    "q63_stream_funnel" ->
      graft.operators.EventOps.oracleSql("q60_funnel"),
    "q64_stream_retention" ->
      graft.operators.EventOps.oracleSql("q62_retention"),
    "q68_stream_funnel_pattern" ->
      graft.operators.EventOps.oracleSql("q67_funnel_pattern"),
    "q85_stream_funnel_bounded" ->
      graft.operators.EventOps.oracleSql("q60_funnel"),
    "q86_stream_funnel_pattern_bounded" ->
      graft.operators.EventOps.oracleSql("q67_funnel_pattern"),
    "q87_stream_retention_bounded" ->
      graft.operators.EventOps.oracleSql("q62_retention")
  )
}
