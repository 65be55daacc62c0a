package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the composed temporal joins: as-of tie handling /
  * no-prior-row nulls, and range-join intervals spanning many bins. */
class TemporalJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

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

  test("asof: equal timestamps match (inclusive), missing prior gives null") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val left = Seq((1L, 100L, "l0"), (1L, 200L, "l1"), (2L, 50L, "l2"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, 10.0), (1L, 150L, 20.0), (2L, 60L, 30.0))
      .toDF("k", "ts", "v")
    val out = AsofOps.asofJoin(left, right, "k", "ts", Seq("v"))
      .select("tag", "_asof_v").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("l0") == Some(10.0)) // equal ts: inclusive
    assert(out("l1") == Some(20.0)) // latest prior
    assert(out("l2") == None)       // right row is LATER -> no match
  }

  test("asof: a genuinely-NULL value in the latest prior right row is carried, not skipped") {
    val s = spark
    import s.implicits._
    // right rows: non-null at ts=100, NULL at ts=150 — the latest prior
    // of a left row at ts=200 is the NULL one, and DuckDB's ASOF LEFT
    // JOIN emits that row's NULL. Carrying columns individually with
    // last(ignoreNulls) (the round-3 form) skipped it and surfaced 10.0.
    val left = Seq((1L, 200L, "l0")).toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, Some(10.0)), (1L, 150L, None))
      .toDF("k", "ts", "v")
    val out = AsofOps.asofJoin(left, right, "k", "ts", Seq("v", "ts"))
      .select("tag", "_asof_v", "_asof_ts").collect().head
    assert(Option(out.get(1)).isEmpty,
      s"latest prior row's NULL must be carried, got ${out.get(1)}")
    assert(out.getLong(2) == 150L, "must join the ts=150 row")
  }

  test("asof tolerance: a match farther than the bound is nulled") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 200L, "near"), (1L, 500L, "far"), (2L, 90L, "none"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 150L, 10.0), (2L, 95L, 30.0)).toDF("k", "ts", "v")
    val out = AsofOps.asofJoin(left, right, "k", "ts", Seq("v"),
        toleranceMicros = 100L)
      .select("tag", "_asof_v").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("near") == Some(10.0)) // gap 50 <= 100
    assert(out("far") == None)        // gap 350 > 100 -> nulled
    assert(out("none") == None)       // right row is later
  }

  test("asof forward: earliest following row, inclusive at equality") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, "eq"), (1L, 160L, "mid"), (1L, 300L, "tail"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, 1.0), (1L, 150L, 2.0), (1L, 200L, 3.0))
      .toDF("k", "ts", "v")
    val out = AsofOps.asofJoin(left, right, "k", "ts", Seq("v"),
        forward = true)
      .select("tag", "_asof_v").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("eq") == Some(1.0))   // equality is inclusive
    assert(out("mid") == Some(3.0))  // next at-or-after 160
    assert(out("tail") == None)      // nothing follows
  }

  test("interval overlap join: each overlapping pair exactly once, touching counts") {
    val s = spark
    import s.implicits._
    // a0 [0,1000] overlaps b0 [500,1500] across many shared bins (the
    // dedup case), touches b1 at exactly 1000, misses b2, wrong key b3
    val a = Seq((1L, 0L, 1000L, "a0"), (1L, 5000L, 5100L, "a1"))
      .toDF("ak", "alo", "ahi", "aname")
    val b = Seq(
      (1L, 500L, 1500L, "b0"), (1L, 1000L, 2000L, "b1"),
      (1L, 1501L, 1600L, "b2"), (2L, 600L, 700L, "b3"),
      (1L, 5050L, 5060L, "b4"))
      .toDF("bk", "blo", "bhi", "bname")
    val out = RangeOps.intervalOverlapJoin(a, b, "ak", "bk",
        "alo", "ahi", "blo", "bhi", binMicros = 100L)
      .select("aname", "bname").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // exactly once each — no multi-bin duplicates
    assert(out.length == out.distinct.length)
    assert(out.toSet == Set(
      ("a0", "b0"), ("a0", "b1"), ("a1", "b4")))
  }

  test("asof determinism precondition: fixture (user_id, ts) unique per event type") {
    // q102/q103's cross-engine parity rests on tie-free (key, ts)
    // sides (AsofOps scaladoc) — assert it instead of trusting it, so
    // a regenerated fixture that introduces ties fails HERE with a
    // readable message, not as an opaque oracle hash mismatch
    val events = graft.sources.Tables.load(
      spark, "/root/testdata/sf0.001", "events")
    val dupes = events
      .groupBy("event_type", "user_id", "ts")
      .count().filter(org.apache.spark.sql.functions.col("count") > 1)
      .count()
    assert(dupes == 0L,
      s"$dupes (event_type, user_id, ts) ties — as-of oracles ambiguous")
  }

  test("interval overlap: long-outlier intervals take the residual path, exactly once") {
    val s = spark
    import s.implicits._
    // bin = 100, cap = 4 bins: a_long spans 50 bins (would explode to
    // 51 copies unguarded); expected pairs computed by the brute
    // nested-loop definition in-test
    val a = Seq(
      (1L, 0L, 5000L, "a_long"), (1L, 150L, 250L, "a_s1"),
      (1L, 6000L, 6100L, "a_s2"))
      .toDF("ak", "alo", "ahi", "aname")
    val b = Seq(
      (1L, 4900L, 9000L, "b_long"), (1L, 200L, 300L, "b_s1"),
      (1L, 5500L, 5600L, "b_s2"), (2L, 0L, 9000L, "b_wrong_key"))
      .toDF("bk", "blo", "bhi", "bname")
    val brute = for {
      (ak, alo, ahi, an) <- Seq((1L, 0L, 5000L, "a_long"),
        (1L, 150L, 250L, "a_s1"), (1L, 6000L, 6100L, "a_s2"))
      (bk, blo, bhi, bn) <- Seq((1L, 4900L, 9000L, "b_long"),
        (1L, 200L, 300L, "b_s1"), (1L, 5500L, 5600L, "b_s2"),
        (2L, 0L, 9000L, "b_wrong_key"))
      if ak == bk && alo <= bhi && blo <= ahi
    } yield (an, bn)
    val out = RangeOps.intervalOverlapJoin(a, b, "ak", "bk",
        "alo", "ahi", "blo", "bhi", binMicros = 100L,
        maxBinsPerInterval = 4)
      .select("aname", "bname").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.length == out.distinct.length) // no path double-counts
    assert(out.toSet == brute.toSet)
  }

  test("interval overlap: shared input column names are rejected") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, 0L, 10L)).toDF("k", "lo", "hi")
    val ex = intercept[IllegalArgumentException] {
      RangeOps.intervalOverlapJoin(a, a, "k", "k",
        "lo", "hi", "lo", "hi", binMicros = 10L)
    }
    assert(ex.getMessage.contains("share column names"))
  }

  test("derived bin keeps the q104 explode factor at ~2-3 copies per interval") {
    val sf = "/root/testdata/sf0.001"
    val events = graft.sources.Tables.load(spark, sf, "events")
    val signups = events
      .filter(org.apache.spark.sql.functions.col("event_type") === "signup")
      .selectExpr("user_id AS s_user", "event_id AS signup_id",
        "unix_micros(ts) AS s_lo", "unix_micros(ts) + 7200000000 AS s_hi")
    val purchases = events
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("user_id AS p_user", "event_id AS purchase_id",
        "unix_micros(ts) AS p_lo", "unix_micros(ts) + 3600000000 AS p_hi")
    val bin = RangeOps.deriveBinMicros(
      signups, "s_lo", "s_hi", purchases, "p_lo", "p_hi")
    // avg span is between the two fixed widths (3600s and 7200s)
    assert(bin >= 3600000000L && bin <= 7200000000L)
    // explode factor: copies per input row once binned on the derived
    // width — each interval covers span/bin + ≤1 bins, so ≤ 3 here
    val nIn = signups.count() + purchases.count()
    val nExploded =
      signups.selectExpr(s"size(sequence(s_lo div $bin, s_hi div $bin)) AS c")
        .unionAll(purchases.selectExpr(
          s"size(sequence(p_lo div $bin, p_hi div $bin)) AS c"))
        .agg(org.apache.spark.sql.functions.sum("c")).head.getLong(0)
    val factor = nExploded.toDouble / nIn
    assert(factor <= 3.0, s"explode factor $factor")
  }

  test("range join finds every pair when intervals span many bins") {
    val s = spark
    import s.implicits._
    // interval of 10 bins; points sprinkled inside and outside
    val intervals = Seq((1L, 100L, 1100L, "i0"), (1L, 5000L, 5100L, "i1"))
      .toDF("ik", "lo", "hi", "iname")
    val points = Seq(
      (1L, 100L, "p-lo-edge"), (1L, 600L, "p-mid"), (1L, 1100L, "p-hi-edge"),
      (1L, 1101L, "p-after"), (1L, 5050L, "p-i1"), (2L, 600L, "p-wrong-key"))
      .toDF("pk", "pt", "pname")
    val out = RangeOps.rangeJoin(points, intervals, "pk", "ik",
        "pt", "lo", "hi", binMicros = 100L)
      .select("iname", "pname").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(
      ("i0", "p-lo-edge"), ("i0", "p-mid"), ("i0", "p-hi-edge"),
      ("i1", "p-i1")))
    // exactly once each despite the 11-bin interval explode
    val cnt = RangeOps.rangeJoin(points, intervals, "pk", "ik",
      "pt", "lo", "hi", binMicros = 100L).count()
    assert(cnt == 4)
  }
}
