package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import StreamFunnel.{FEvent, FState}

/** The streaming funnel's core claim is ARRIVAL-ORDER INVARIANCE: the
  * final frontier after any batched, shuffled delivery of an event set
  * equals the batch q60 answer on that set. The spec replays the real
  * sf0.001 corpus through the state kernel in adversarial orders and
  * compares against the batch operator; it also pins the state bound
  * (converted users hold no candidate lists). */
class StreamFunnelSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def corpus(): Map[Long, Seq[FEvent]] = {
    import org.apache.spark.sql.functions._
    graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect()
      .map(r => FEvent(r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_.user_id).view.mapValues(_.toSeq).toMap
  }

  private def replay(
      evs: Seq[FEvent], batches: Int, seed: Long): Option[StreamFunnel.Snapshot] = {
    val rnd = new scala.util.Random(seed)
    val shuffled = rnd.shuffle(evs)
    val groups = shuffled.grouped(math.max(1, shuffled.size / batches)).toSeq
    var state: Option[FState] = None
    var last: Option[StreamFunnel.Snapshot] = None
    groups.foreach { g =>
      val (next, snap) = StreamFunnel.step(evs.head.user_id, g.iterator, state)
      state = Some(next)
      if (snap.isDefined) last = snap
    }
    last
  }

  test("shuffled batched replay reproduces the batch funnel per user") {
    val batch = graft.operators.EventOps.funnel(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getAs[Int]("stage"))).toMap
    val byUser = corpus()
    Seq((1, 7L), (3, 11L), (10, 13L)).foreach { case (batches, seed) =>
      byUser.foreach { case (user, evs) =>
        val got = replay(evs, batches, seed)
        batch.get(user) match {
          case None => assert(got.isEmpty, s"user $user (no view) emitted")
          case Some((v, c, p, st)) =>
            val s = got.getOrElse(fail(s"user $user emitted nothing"))
            assert((s.times(0), s.times(1), s.times(2), s.stage) ==
              (v, c, p, st), s"user $user, $batches batches, seed $seed")
        }
      }
    }
  }

  test("a converted user's state prunes candidates above the frontier") {
    val evs = Seq(
      FEvent(1L, "view", 10L), FEvent(1L, "click", 20L),
      FEvent(1L, "purchase", 30L),
      FEvent(1L, "click", 40L), FEvent(1L, "purchase", 50L))
    val (state, snap) = StreamFunnel.step(1L, evs.iterator, None)
    assert(snap.exists(_.stage == 3))
    // the late click 40 / purchase 50 can never improve a decreasing
    // frontier and are dropped; the frontier values themselves stay
    // (a later earlier view may need them to re-qualify)
    assert(state.candidates(0).nonEmpty && state.candidates(0).forall(_ <= 20L))
    assert(state.candidates(1).nonEmpty && state.candidates(1).forall(_ <= 30L))
  }

  test("custom stage chains replay to the generic batch funnel") {
    // two-stage chain on the real corpus: purchase-after-signup
    val stages = Seq("signup", "purchase")
    val batch = graft.operators.EventOps.funnelOn(
      graft.sources.Tables.load(spark, sfDir, "events")
        .selectExpr("user_id", "event_type", "unix_micros(ts) AS us"),
      stages).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          r.getAs[Int]("stage"))).toMap
    corpus().foreach { case (user, evs) =>
      var state: Option[FState] = None
      var last: Option[StreamFunnel.Snapshot] = None
      new scala.util.Random(3L).shuffle(evs).grouped(7).foreach { g =>
        val (next, snap) = StreamFunnel.step(user, g.iterator, state, stages)
        state = Some(next)
        if (snap.isDefined) last = snap
      }
      batch.get(user) match {
        case None => assert(last.isEmpty, s"user $user")
        case Some((t0, t1, st)) =>
          val s = last.getOrElse(fail(s"user $user emitted nothing"))
          assert((s.times(0), s.times(1), s.stage) == (t0, t1, st),
            s"user $user")
      }
    }
  }

  test("q125 stream A/B report equals the batch q124 row for row") {
    val sf = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val batch = rows(graft.operators.EventOps.abReport(spark, sf))
    val streamed = rows(StreamFunnel.abReportStreamed(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("q127 stream markov matrix equals the batch q126 row for row") {
    val sf = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val batch = rows(graft.operators.EventOps.markovTransitions(spark, sf))
    val streamed = rows(StreamFunnel.markovStreamed(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }
}
