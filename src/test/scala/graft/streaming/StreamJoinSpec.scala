package graft.streaming

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming-join entries' contracts beyond the oracle gate:
  * q72's state-boundedness claim is ENFORCED by Spark's planner (a
  * stream-stream inner join without a time-range condition under
  * watermarks is rejected, not silently unbounded), and q71's
  * stream-static join reproduces the batch decontamination answer. */
class StreamJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("q72 equals the batch self-join on the replayed corpus") {
    val got = EventStream.attributionStreamed(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val e = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val want = e.as("v").filter(col("v.event_type") === "view")
      .join(e.as("p").filter(col("p.event_type") === "purchase"),
        col("v.user_id") === col("p.user_id") &&
          col("p.us") > col("v.us") &&
          col("p.us") <= col("v.us") + lit(7L * 86400000000L))
      .select(col("v.user_id"), col("v.us"), col("p.us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got == want)
  }

  test("outer stream-stream joins REQUIRE the range condition (enforced)") {
    // Spark enforces boundedness only where correctness forces it: an
    // INNER rangeless join is accepted (state just grows — the
    // anti-pattern q72's range condition exists to avoid), but an
    // OUTER join cannot even decide when to emit its null side without
    // the constraint, so the rangeless form is rejected outright —
    // pinned here so the q72 docstring's eviction claim stays honest
    // about what is enforced vs what is the operator's design
    val views = EventStream.readEvents(spark, sfDir, glob = "events.parquet")
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val purchases = EventStream.readEvents(spark, sfDir, glob = "events.parquet")
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val rangeless = views.join(purchases,
      col("v_user") === col("p_user"), "leftOuter")
    val ex = intercept[Exception] {
      StreamRun.toCompletion(rangeless, "graft_stream_attribution_rangeless",
        timeoutMs = 60000)
    }
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(ex).exists(_.isInstanceOf[AnalysisException]),
      s"expected an analysis rejection, got: $ex")
  }

  test("q71 stream-static decontamination equals batch c04") {
    val got = StreamCuration.decontamStream(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = graft.operators.CurationOps.decontaminate(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture must exercise contamination pairs")
  }
}
