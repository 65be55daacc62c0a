package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the ordered-funnel and gap-session
  * semantics — the order sensitivity (purchase BEFORE view must not
  * convert) and exact gap-boundary behavior are the parts a plain
  * group-by can't get wrong silently. */
class EventOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val Min = 60L * 1000000L // one minute in micros

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

  test("funnel: stage events only count strictly after the prior stage") {
    // u1 full path; u2 purchase BEFORE view (stage stays 2 after click);
    // u3 click before view (stage 1); u4 no view at all (absent)
    val e = spark.createDataFrame(Seq(
      (1L, "view", 10L * Min), (1L, "click", 20L * Min),
      (1L, "purchase", 30L * Min),
      (2L, "purchase", 5L * Min), (2L, "view", 10L * Min),
      (2L, "click", 20L * Min),
      (3L, "click", 5L * Min), (3L, "view", 10L * Min),
      (4L, "click", 10L * Min), (4L, "purchase", 20L * Min)
    )).toDF("user_id", "event_type", "us")
    val got = EventOps.funnelOn(e).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("stage")).toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 1))
  }

  test("sessionize: breaks strictly past the gap, ties ordered by event_id") {
    // u1: events at 0, 30min (== gap, same session), 61min (> 30min gap
    // from #2 -> new session); u2: one event
    val e = spark.createDataFrame(Seq(
      (1L, 1L, "view", 0L), (2L, 1L, "click", 30L * Min),
      (3L, 1L, "view", 61L * Min),
      (4L, 2L, "view", 0L)
    )).toDF("event_id", "user_id", "event_type", "us")
    val got = EventOps.sessionizeOn(e, gapMinutes = 30).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("start_us")))
      .toMap
    assert(got == Map(
      (1L, 0L) -> (2L, 0L),
      (1L, 1L) -> (1L, 61L * Min),
      (2L, 0L) -> (1L, 0L)))
  }

  test("funnel: arbitrary stage chains reuse the same window pass") {
    val e = spark.createDataFrame(Seq(
      (1L, "view", 10L * Min), (1L, "click", 20L * Min),
      (1L, "purchase", 30L * Min),
      (2L, "purchase", 5L * Min), (2L, "view", 10L * Min)
    )).toDF("user_id", "event_type", "us")
    val got = EventOps.funnelOn(e, stages = Seq("view", "purchase"))
      .collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("stage")).toMap
    // u1 converts view->purchase; u2's purchase precedes its view
    assert(got == Map(1L -> 2, 2L -> 1))
  }

  test("retention: cohort by first-seen day, distinct users per offset") {
    val Day = 24L * 60L * Min
    // u1 first day 0, active days 0, 1, 7 (twice on day 1 -> still 1 user);
    // u2 first day 1, active day 1 only
    val e = spark.createDataFrame(Seq(
      (1L, 0L), (1L, Day + Min), (1L, Day + 2 * Min), (1L, 7L * Day),
      (2L, Day)
    )).toDF("user_id", "us")
    val got = EventOps.retentionOn(e).collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_off")) ->
        r.getAs[Long]("users")).toMap
    assert(got == Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 7L) -> 1L,
      (1L, 0L) -> 1L))
  }

  test("batch sessions equal the streaming interval-merge kernel") {
    // q61 and streaming/EventStream.sessionize must implement the SAME
    // session semantics; fold the streaming kernel (addEvent) over each
    // user's events and compare (start, end, n_events) multisets
    val sfDir = "/root/testdata/sf0.001"
    val gapUs = 30L * Min
    val byUser = graft.sources.Tables.load(spark, sfDir, "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
    val kernel = byUser.flatMap { case (user, evs) =>
      evs.map(_._2).foldLeft(List.empty[graft.streaming.EventStream.Interval]) {
        (iv, ts) => graft.streaming.EventStream.addEvent(iv, ts, gapUs)
      }.map(i => (user, i.start, i.last, i.events.toLong))
    }.toSeq.sorted
    val batch = EventOps.sessionize(spark, sfDir, gapMinutes = 30)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("start_us"), r.getAs[Long]("end_us"),
        r.getAs[Long]("n_events"))).toSeq.sorted
    assert(batch == kernel)
  }

  test("q107 gap-fill: observed days pass through, gaps interpolate " +
      "linearly, endpoints never extrapolate") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // series a: days 10,13 observed (1.0, 4.0) -> 11,12 fill 2.0, 3.0;
    // day 13 has two raw values (3.0, 5.0) -> observed mean 4.0.
    // series b: single day -> one observed row, nothing to fill.
    val e = Seq(
      ("a", 10L, 1.0), ("a", 13L, 3.0), ("a", 13L, 5.0),
      ("b", 20L, 7.0))
      .toDF("event_type", "day", "value")
    val got = EventOps.gapfillInterpolateOn(e)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    assert(got == Set(
      ("a", 10L, 1.0, 0), ("a", 11L, 2.0, 1), ("a", 12L, 3.0, 1),
      ("a", 13L, 4.0, 0), ("b", 20L, 7.0, 0)))
    // grid is exactly [min, max] per series: no day outside it appears
    assert(!got.exists(r => r._1 == "a" && (r._2 < 10 || r._2 > 13)))
  }

  test("rollingZscore: trailing baseline excludes the current row") {
    val s = spark
    import s.implicits._
    // 12 calm events at 10.0 ± 0.5 (alternating 9.5/10.5), then a spike
    // at 100.0: the spike's baseline is the 12 calm predecessors (its
    // own value excluded), so z is huge; the calm rows before index
    // minN have n < minN and are unscored.
    val calm = (1 to 12).map(i =>
      (i.toLong, "m", i.toLong * 60L, if (i % 2 == 0) 10.5 else 9.5))
    val e = (calm :+ (13L, "m", 13L * 60L, 100.0))
      .toDF("event_id", "event_type", "us", "value")
    val got = EventOps.rollingZscoreOn(e, lookback = 20, minN = 10)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Double]("z"), r.getAs[Int]("is_anomaly"))).toMap
    // events 1..10 have <10 predecessors: unscored
    assert(!got.contains(1L) && !got.contains(10L))
    // events 11..13 scored; only the spike flags
    assert(got.contains(11L) && got.contains(12L))
    assert(got(11L)._2 == 0 && got(12L)._2 == 0)
    assert(got(13L)._2 == 1 && got(13L)._1 > 100)
    // baseline excludes the current row: mean of the 12 calm rows is
    // 10.0 and sd ~0.52, so z ≈ (100-10)/0.522 ≈ 172.4
    assert(math.abs(got(13L)._1 - 172.4) < 1.0)
  }

  test("rollingZscore: zero-variance baselines are unscored") {
    val s = spark
    import s.implicits._
    val e = (1 to 15).map(i => (i.toLong, "m", i.toLong * 60L, 5.0))
      .toDF("event_id", "event_type", "us", "value")
    assert(EventOps.rollingZscoreOn(e, lookback = 20, minN = 10)
      .count() == 0)
  }

  test("lastTouchAttribution: window boundary, organic, same-us touch") {
    val s = spark
    import s.implicits._
    val Day = 86400000000L
    val e = Seq(
      // u1: click 1 day before purchase -> attributed to click
      (1L, 1L, "click", 0L, null.asInstanceOf[java.lang.Double]),
      (2L, 1L, "purchase", Day, java.lang.Double.valueOf(10.0)),
      // u2: view exactly 7 days before -> still inside (<=) the window
      (3L, 2L, "view", 0L, null.asInstanceOf[java.lang.Double]),
      (4L, 2L, "purchase", 7L * Day, java.lang.Double.valueOf(20.0)),
      // u3: view 8 days before -> outside, organic
      (5L, 3L, "view", 0L, null.asInstanceOf[java.lang.Double]),
      (6L, 3L, "purchase", 8L * Day, java.lang.Double.valueOf(40.0)),
      // u4: touch at the SAME microsecond with a lower event_id counts
      // as preceding (the (us, event_id) row order)
      (7L, 4L, "click", 5L * Day, null.asInstanceOf[java.lang.Double]),
      (8L, 4L, "purchase", 5L * Day, java.lang.Double.valueOf(80.0)),
      // u5: purchase with no touch at all -> organic
      (9L, 5L, "purchase", Day, java.lang.Double.valueOf(160.0)))
      .toDF("event_id", "user_id", "event_type", "us", "value")
    val got = EventOps.lastTouchAttributionOn(e).collect()
      .map(r => r.getAs[String]("touch") ->
        (r.getAs[Long]("n_conversions"), r.getAs[Double]("revenue"))).toMap
    assert(got == Map(
      "click" -> (2L, 90.0), // u1 + u4
      "view" -> (1L, 20.0), // u2 (boundary inclusive)
      "none" -> (2L, 200.0))) // u3 (expired) + u5 (organic)
  }

  test("eventTransitions: bigrams per user, probabilities per source") {
    val s = spark
    import s.implicits._
    // u1: a->b->a; u2: a->b. transitions: a->b x2, b->a x1.
    // from 'a': p(b)=1.0; from 'b': p(a)=1.0
    val e = Seq(
      (1L, 1L, "a", 10L), (2L, 1L, "b", 20L), (3L, 1L, "a", 30L),
      (4L, 2L, "a", 10L), (5L, 2L, "b", 20L))
      .toDF("event_id", "user_id", "event_type", "us")
    val got = EventOps.eventTransitionsOn(e).collect()
      .map(r => (r.getAs[String]("prev_type"),
        r.getAs[String]("next_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
    assert(got == Map(("a", "b") -> (2L, 1.0), ("b", "a") -> (1L, 1.0)))
    // no cross-user bigram: u1's last 'a' never pairs with u2's first 'a'
    assert(!got.contains(("a", "a")))
  }

  test("eventTransitions: probabilities sum to 1 per source state") {
    val s = spark
    import s.implicits._
    val e = Seq(
      (1L, 1L, "a", 1L), (2L, 1L, "b", 2L), (3L, 1L, "c", 3L),
      (4L, 1L, "a", 4L), (5L, 1L, "c", 5L))
      .toDF("event_id", "user_id", "event_type", "us")
    val bySrc = EventOps.eventTransitionsOn(e).collect()
      .groupBy(_.getAs[String]("prev_type"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Double]("p")).sum }
    bySrc.values.foreach(p => assert(math.abs(p - 1.0) < 1e-6))
  }

  test("concurrency: sweep counts overlapping half-open intervals") {
    val s = spark
    import s.implicits._
    // [0,10) [5,15) [5,8) [20,30): conc 1,3,2,1,0,1,0 at the boundary
    // instants; equal starts collapse into one +2 net
    val got = EventOps.concurrencyOn(
      Seq((0L, 10L), (5L, 15L), (5L, 8L), (20L, 30L)).toDF("lo", "hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((0L, 1L, 1L), (5L, 2L, 3L), (8L, -1L, 2L),
      (10L, -1L, 1L), (15L, -1L, 0L), (20L, 1L, 1L), (30L, -1L, 0L)))
  }

  test("session paths: gap splits, 5-event cap, deterministic order") {
    val s = spark
    import s.implicits._
    // u1: six events one minute apart -> ONE session, path capped at 5
    // u2: two events, a >30-min gap, then one more -> two sessions
    val rows =
      Seq("a", "b", "c", "d", "e", "f").zipWithIndex.map { case (t, i) =>
        (i.toLong, 1L, t, i * Min)
      } ++ Seq((10L, 2L, "a", 0L), (11L, 2L, "b", Min),
        (12L, 2L, "c", 90 * Min))
    val got = EventOps.sessionPathsOn(
      rows.toDF("event_id", "user_id", "event_type", "us"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // all counts 1 -> lexicographic path order under the tie-break
    assert(got.toSeq == Seq(("a>b", 1L), ("a>b>c>d>e", 1L), ("c", 1L)))
  }

  test("trend OLS: exact closed form, zero-x-variance series excluded") {
    val s = spark
    import s.implicits._
    val got = EventOps.trendOlsOn(Seq(
      // perfect line v = 2*day + 1
      ("a", 0L, 1.0), ("a", 1L, 3.0), ("a", 2L, 5.0),
      // flat series: slope 0, intercept = mean
      ("b", 0L, 4.0), ("b", 2L, 4.0),
      // single active day: x variance 0 -> excluded
      ("c", 5L, 1.0), ("c", 5L, 9.0))
      .toDF("event_type", "day", "v"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(got == Map(
      "a" -> (3L, 2.0, 1.0),
      "b" -> (2L, 0.0, 4.0)))
  }

  test("mad outliers: robust flag, exact rz, zero-MAD series excluded") {
    val s = spark
    import s.implicits._
    val rows =
      (1 to 9).map(i => (i.toLong, "a", i.toDouble)) :+
        (10L, "a", 1000.0) :+
        // degenerate series: mad = 0 (majority at the median) — the
        // whole series must be excluded, even its wild point
        (11L, "b", 5.0) :+ (12L, "b", 5.0) :+ (13L, "b", 5.0) :+
        (14L, "b", 5.0) :+ (15L, "b", 9.0)
    val got = EventOps.madOutliersOn(rows.toDF("event_id", "event_type", "v"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(5), r.getInt(6))).toMap
    assert(got.keySet == (1L to 10L).toSet) // series b fully excluded
    // med=5.5, mad=2.5: rz(1) = -4.5/(1.4826*2.5) -> -1.2141 at 4 dp
    assert(got(1L) == (-1.2141, 0))
    assert(got(10L)._2 == 1) // the 1000 point is the only outlier
    assert(got.values.count(_._2 == 1) == 1)
  }

  test("concurrency: day-crossing intervals thread the day-base offset") {
    val s = spark
    import s.implicits._
    val D = EventOps.DayUs
    // one interval spanning days 0-2, one inside day 1: the day-1 and
    // day-2 boundaries only work if the cross-day base offset carries
    val got = EventOps.concurrencyOn(
      Seq((0L, 2 * D), (D, D + 10L)).toDF("lo", "hi"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq ==
      Seq((0L, 1L), (D, 2L), (D + 10L, 1L), (2 * D, 0L)))
  }

  test("q122 ewma: finite-window weights, newest heaviest, per type") {
    val s = spark
    import s.implicits._
    val series = Seq(
      ("a", "2024-01-01", 1.0), ("a", "2024-01-02", 2.0),
      ("a", "2024-01-03", 4.0),
      ("b", "2024-01-01", 10.0), ("b", "2024-01-02", 10.0))
      .toDF("event_type", "d", "v")
      .selectExpr("event_type", "to_date(d) AS day", "v")
    val got = EventOps.ewmaOn(series, lookback = 2, alpha = 0.25)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getDouble(3))
      .toMap
    // day 1: frame [1] → 1; day 2: (0.75·1 + 2)/1.75; day 3 drops
    // day 1 from the frame: (0.75·2 + 4)/1.75
    assert(got(("a", "2024-01-01")) == 1.0)
    assert(got(("a", "2024-01-02")) == 1.5714)
    assert(got(("a", "2024-01-03")) == 3.1429)
    // constant series smooths to itself; type b never sees type a
    assert(got(("b", "2024-01-02")) == 10.0)
  }

  test("q123 scd2: consecutive equal states collapse, lead closes") {
    val s = spark
    import s.implicits._
    val e = Seq(
      (10L, 1L, "A", 1L), (11L, 1L, "A", 2L), // same state: collapses
      (12L, 1L, "B", 3L), (13L, 1L, "A", 4L), // back to A: NEW row
      (20L, 2L, "A", 5L))
      .toDF("event_id", "user_id", "event_type", "us")
    val got = EventOps.scd2IntervalsOn(e).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4))).toSet
    assert(got == Set(
      (1L, "A", 1L, 3L, 0), (1L, "B", 3L, 4L, 0),
      (1L, "A", 4L, -1L, 1), (2L, "A", 5L, -1L, 1)))
  }

  test("q124 ab report: strict-after conversion, rounded-rate lift") {
    val s = spark
    import s.implicits._
    val e = Seq(
      (0L, "view", 1L), (0L, "purchase", 2L),  // v0: converts
      (2L, "view", 1L),                        // v0: no purchase
      (4L, "view", 1L),                        // v0: no purchase
      (1L, "view", 1L), (1L, "purchase", 2L),  // v1: converts
      (3L, "view", 5L), (3L, "purchase", 3L),  // purchase BEFORE view
      (5L, "purchase", 1L))                    // no view: not exposed
      .toDF("user_id", "event_type", "us")
    val got = EventOps.abReportOn(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(got(0L) == (3L, 1L, 0.3333, 1.0))
    assert(got(1L) == (2L, 1L, 0.5, 1.5002)) // 0.5 / 0.3333, 4 dp
    assert(got.size == 2)
  }

  test("q126 markov: session gap breaks pairs, rows normalize to 1") {
    val s = spark
    import s.implicits._
    // u1: A>B>A in one session, then a 2h gap to C>D (A->C dropped);
    // u2: A>C 10s apart — so from A: ->B once, ->C once (p=0.5 each)
    val e = Seq(
      (1L, 1L, "A", 0L), (2L, 1L, "B", Min), (3L, 1L, "A", 2L * Min),
      (4L, 1L, "C", 122L * Min), (5L, 1L, "D", 123L * Min),
      (6L, 2L, "A", 0L), (7L, 2L, "C", 10L * 1000000L))
      .toDF("event_id", "user_id", "event_type", "us")
    val got = EventOps.markovTransitionsOn(e).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      ("A", "B") -> (1L, 0.5), ("A", "C") -> (1L, 0.5),
      ("B", "A") -> (1L, 1.0), ("C", "D") -> (1L, 1.0)))
    // exactly-30-min gap is WITHIN the session (<= bound, q61 rule)
    val b = Seq((1L, 1L, "A", 0L), (2L, 1L, "B", 30L * Min))
      .toDF("event_id", "user_id", "event_type", "us")
    assert(EventOps.markovTransitionsOn(b).count() == 1)
  }
}
