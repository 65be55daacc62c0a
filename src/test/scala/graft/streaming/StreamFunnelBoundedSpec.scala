package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import StreamFunnel.{FEvent, FState, Snapshot}

/** The watermark-bounded funnel's contract, adversarially: (1) a
  * click-only bot that never fires the first stage — the exact form's
  * unbounded-state pathology — holds O(horizon) state under an
  * advancing watermark; (2) with the watermark contract honored
  * (no event arrives at or below it), the bounded kernel's final
  * answer EQUALS the exact kernel's on the real corpus; (3) when the
  * candidate cap binds, the funnel under-reports a stage, never
  * invents one. */
class StreamFunnelBoundedSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def stateSize(s: FState): Int = s.candidates.map(_.size).sum

  test("click-only whale: 100k events hold O(horizon) state under a watermark") {
    // the r5 VERDICT pathology: no view ever arrives, so the exact
    // form's frontier is undefined and NOTHING is pruned — here the
    // watermark ages the clicks out instead
    val lagUs = 1000L // horizon: 1000 µs of event time
    val batch = 1000
    var state: Option[FState] = None
    var maxState = 0
    (0 until 100) foreach { b =>
      val evs = (0 until batch).map(i => FEvent(7L, "click", (b * batch + i).toLong))
      val wm = b.toLong * batch - lagUs // trails the batch by the horizon
      val (next, _) = StreamFunnel.step(7L, evs.iterator, state,
        watermarkUs = wm)
      state = Some(next)
      maxState = math.max(maxState, stateSize(next))
    }
    // exact form would hold all 100_000 clicks; bounded holds ≤ one
    // batch + horizon worth
    assert(maxState <= batch + lagUs.toInt,
      s"state grew to $maxState — watermark eviction not bounding")
    // and the cap alone bounds it even with a NEVER-advancing watermark
    var capped: Option[FState] = None
    (0 until 100) foreach { b =>
      val evs = (0 until batch).map(i => FEvent(7L, "click", (b * batch + i).toLong))
      val (next, _) = StreamFunnel.step(7L, evs.iterator, capped,
        maxCandidates = 500)
      capped = Some(next)
      assert(stateSize(next) <= 500)
    }
  }

  test("bounded kernel equals exact kernel when the watermark contract holds") {
    import org.apache.spark.sql.functions._
    val byUser = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect()
      .map(r => FEvent(r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_.user_id)
    byUser.foreach { case (user, evsArr) =>
      // in-event-time-order delivery; watermark = max ts of PRIOR
      // batches (Spark's update rule, zero lag) — the strongest
      // watermark the contract allows, so evictions are maximal
      val evs = evsArr.sortBy(_.tsMicros).toSeq
      def replay(wm: Boolean): Option[Snapshot] = {
        var state: Option[FState] = None
        var last: Option[Snapshot] = None
        var maxSeen = Long.MinValue
        evs.grouped(5).foreach { g =>
          val (next, snap) = StreamFunnel.step(user, g.iterator, state,
            watermarkUs = if (wm) maxSeen else Long.MinValue)
          state = Some(next)
          if (snap.isDefined) last = snap
          maxSeen = math.max(maxSeen, g.map(_.tsMicros).max)
        }
        last
      }
      val exact = replay(wm = false)
      val bounded = replay(wm = true)
      assert(bounded.map(s => (s.times, s.stage)) ==
        exact.map(s => (s.times, s.stage)), s"user $user diverged")
    }
  }

  test("a binding cap under-reports a stage, never invents a conversion") {
    // 49 noise clicks + the qualifying click 2500 all arrive BEFORE the
    // view (batches of 10 deliver them in the first five batches), so a
    // binding cap must have already chosen which clicks to keep when
    // the view shows up in the final batch
    val noise = (1 to 49).map(i => FEvent(1L, "click", 100L + i)) :+
      FEvent(1L, "click", 2500L)
    val tail = Seq(FEvent(1L, "view", 2000L), FEvent(1L, "purchase", 3000L))
    def run(cap: Int): Option[Snapshot] = {
      var state: Option[FState] = None
      var last: Option[Snapshot] = None
      (noise ++ tail).grouped(10).foreach { g =>
        val (next, snap) = StreamFunnel.step(1L, g.iterator, state,
          maxCandidates = cap)
        state = Some(next)
        if (snap.isDefined) last = snap
      }
      last
    }
    val exact = run(Int.MaxValue).get
    assert((exact.times, exact.stage) ==
      (Seq(Some(2000L), Some(2500L), Some(3000L)), 3))
    // cap 5 keeps the 5 SMALLEST clicks (101..105): the qualifying
    // click 2500 was evicted before the view arrived, so stage 2 fails
    // to qualify — and with it stage 3 — but stage 1 (the view) is
    // still exact: under-reporting, never inventing
    val capped = run(5).get
    assert(capped.times.head == Some(2000L))
    assert(capped.stage <= exact.stage)
    assert(capped.times == Seq(Some(2000L), None, None) && capped.stage == 1)
  }

  test("bounded PATTERN kernel equals exact kernel when the contract holds") {
    import org.apache.spark.sql.functions._
    val pattern = graft.operators.EventOps.DefaultPattern
    val byUser = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect()
      .map(r => FEvent(r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_.user_id)
    byUser.foreach { case (user, evsArr) =>
      val evs = evsArr.sortBy(_.tsMicros).toSeq
      def replay(wm: Boolean): Option[Snapshot] = {
        var state: Option[FState] = None
        var last: Option[Snapshot] = None
        var maxSeen = Long.MinValue
        evs.grouped(5).foreach { g =>
          val (next, snap) = StreamFunnel.patternStep(user, g.iterator,
            state, pattern, watermarkUs = if (wm) maxSeen else Long.MinValue)
          state = Some(next)
          if (snap.isDefined) last = snap
          maxSeen = math.max(maxSeen, g.map(_.tsMicros).max)
        }
        last
      }
      val exact = replay(wm = false)
      val bounded = replay(wm = true)
      assert(bounded.map(s => (s.times, s.stage)) ==
        exact.map(s => (s.times, s.stage)), s"pattern user $user diverged")
    }
  }

  test("pattern kernel: final answer matches batch q67 under shuffled replay") {
    import org.apache.spark.sql.functions._
    val pattern = graft.operators.EventOps.DefaultPattern
    val byUser = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect()
      .map(r => FEvent(r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_.user_id)
    val batch = graft.operators.EventOps.funnelPattern(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((1 to 4).map(i => Option(r.get(i)).map(_.asInstanceOf[Long])),
          r.getAs[Int]("matched"))).toMap
    val rnd = new scala.util.Random(41)
    byUser.foreach { case (user, evsArr) =>
      // adversarial arrival order: shuffled, then folded in uneven chunks
      val evs = rnd.shuffle(evsArr.toSeq)
      var state: Option[FState] = None
      var last: Option[Snapshot] = None
      evs.grouped(3).foreach { g =>
        val (next, snap) = StreamFunnel.patternStep(user, g.iterator,
          state, pattern)
        state = Some(next)
        if (snap.isDefined) last = snap
      }
      val want = batch.get(user)
      assert(last.map(s => (s.times, s.stage)) == want,
        s"user $user: stream=$last batch=$want")
    }
  }

  test("gap windows bound state even with a never-advancing watermark") {
    // a click swarm landing AFTER the view's 3-day window: the gap
    // eviction (candidates > anchor + maxGap can never re-qualify —
    // anchors only decrease) must drop them even with NO watermark,
    // where the plain kernel would have to keep everything
    val pattern = graft.operators.EventOps.DefaultPattern
    val gap = 3L * graft.operators.EventOps.DayUs
    val view = FEvent(9L, "view", 1000L)
    var state: Option[FState] = None
    val (s1, _) = StreamFunnel.patternStep(9L, Iterator(view), state, pattern)
    state = Some(s1)
    (0 until 50) foreach { b =>
      val evs = (0 until 1000).map(i =>
        FEvent(9L, "click", 1000L + gap + 1 + (b * 1000 + i)))
      val (next, _) = StreamFunnel.patternStep(9L, evs.iterator, state, pattern)
      state = Some(next)
      assert(stateSize(next) <= 1,
        s"batch $b: ${stateSize(next)} out-of-window clicks retained")
    }
  }

  test("bounded stream end-to-end reproduces the batch funnel (plumbing)") {
    val snaps = StreamRun.toCompletion(
      StreamFunnel.funnelStreamBounded(spark,
        EventStream.readEvents(spark, sfDir, glob = "events.parquet")).toDF(),
      "graft_stream_funnel_bounded")
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("seq").desc)
    val got = snaps.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("times").getItem(0).as("view_us"),
        col("times").getItem(1).as("click_us"),
        col("times").getItem(2).as("purchase_us"), col("stage"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4))).toMap
    val batch = graft.operators.EventOps.funnel(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getAs[Int]("stage"))).toMap
    assert(got == batch)
  }

  test("bounded pattern stream end-to-end reproduces batch q67 (plumbing)") {
    import org.apache.spark.sql.functions._
    val pattern = graft.operators.EventOps.DefaultPattern
    val snaps = StreamRun.toCompletion(
      StreamFunnel.funnelPatternStreamBounded(spark,
        EventStream.readEvents(spark, sfDir, glob = "events.parquet"),
        pattern).toDF(),
      "graft_stream_funnel_pattern_bounded")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("seq").desc)
    val got = snaps.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id") +:
        pattern.indices.map(i => col("times").getItem(i)) :+ col("stage"): _*)
      .collect().map(r => r.getLong(0) ->
        ((1 to 4).map(i => Option(r.get(i))), r.getInt(5))).toMap
    val batch = graft.operators.EventOps.funnelPattern(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((1 to 4).map(i => Option(r.get(i))), r.getAs[Int]("matched"))).toMap
    assert(got == batch)
  }

  test("bounded retention days equal the batch distinct days (plumbing)") {
    import org.apache.spark.sql.functions._
    val days = StreamRun.toCompletion(
      StreamFunnel.retentionDaysBounded(
        EventStream.readEvents(spark, sfDir, glob = "events.parquet")),
      "graft_stream_retention_bounded")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("user_id"),
        expr(s"unix_micros(ts) div ${graft.operators.EventOps.DayUs}").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(days == exact)
  }
}
