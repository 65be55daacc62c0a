package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Cross-micro-batch close discipline: an interval may close eagerly
  * only once the WATERMARK passes its gap — closing on gap-separation
  * from the current batch's max event time (the round-3 behavior) split
  * one logical session in two whenever a later micro-batch delivered an
  * out-of-order event with ts ≥ watermark but ≤ closed.last + gap. */
class SessionCloseSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.streaming.checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-session-ckpt").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("out-of-order event within gap of an earlier interval does not split the session") {
    val s = spark
    import s.implicits._
    val gapMin = 30
    val gapMs = gapMin * 60L * 1000L
    val t0 = 1000000000000L // epoch ms, batch 1 first event
    val t1 = t0 + 50 * 60L * 1000L // > gap after t0 → separate interval

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val src = MemoryStream[(Long, Timestamp, String)]
    val events = src.toDF().toDF("user_id", "ts", "event_type")
    val q = EventStream.sessionize(spark, events, gapMin)
      .writeStream.format("memory").queryName("session_close")
      .outputMode("append")
      .start()
    try {
      // batch 1: two gap-separated intervals for user 1. Watermark after
      // the batch = t1 − gap = t0 + 20min, which is BELOW t0 + gap — so
      // interval {t0} must stay open even though it is gap-separated
      // from the batch max.
      src.addData((1L, new Timestamp(t0), "click"),
        (1L, new Timestamp(t1), "click"))
      q.processAllAvailable()

      // batch 2: out-of-order event at t0+25min — ≥ watermark (t0+20min),
      // within gap of BOTH {t0} (25 ≤ 30) and {t1} (50−25 ≤ 30): it
      // bridges the two intervals into ONE logical session. The round-3
      // close-on-batch-max emitted {t0} alone in batch 1 and could never
      // un-emit it — two sessions where the timeline has one.
      src.addData((1L, new Timestamp(t0 + 25 * 60L * 1000L), "click"))
      q.processAllAvailable()

      // push the watermark far past every open interval (other user),
      // then one more batch so the event-time timeout fires and flushes.
      src.addData((99L, new Timestamp(t1 + 10 * gapMs), "click"))
      q.processAllAvailable()
      src.addData((99L, new Timestamp(t1 + 20 * gapMs), "click"))
      q.processAllAvailable()

      val sessions = spark.sql(
        "SELECT start_us, end_us, n_events FROM session_close WHERE user_id = 1")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(sessions == Set((t0 * 1000L, t1 * 1000L, 3)),
        s"expected ONE bridged session t0..t1 with 3 events, got $sessions")
    } finally q.stop()
  }
}
