package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q132 removal-effect attribution: hand-solved chain, post-conversion
  * truncation, session splits, and fixed-round convergence. */
class MarkovAttributionSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def run(evs: Seq[(Long, Long, String, Long)], iters: Int = 30) = {
    val s = spark
    import s.implicits._
    EventOps.markovAttributionOn(
      evs.toDF("event_id", "user_id", "event_type", "us"), iters = iters)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
  }

  // journeys: view->purchase x2, click->purchase, view->(nothing)
  // P(conv) = .75*(2/3) + .25*1 = .75; remove view -> .25 (rem 2/3);
  // remove click -> .5 (rem 1/3)
  private val base = Seq(
    (1L, 1L, "view", 0L), (2L, 1L, "purchase", 60L),
    (3L, 2L, "view", 0L), (4L, 2L, "purchase", 60L),
    (5L, 3L, "click", 0L), (6L, 3L, "purchase", 60L),
    (7L, 4L, "view", 0L))

  test("removal effects and shares match the hand-solved chain") {
    val m = run(base)
    assert(m.keySet === Set("view", "click"))
    assert(m("view") === ((0.666667, 0.666667)))
    assert(m("click") === ((0.333333, 0.333333)))
  }

  test("events after the first conversion are cut from the journey") {
    val noisy = base ++ Seq((8L, 1L, "error", 120L)) // post-purchase
    assert(run(noisy) === run(base)) // error never becomes a channel
  }

  test("a session gap splits journeys: pre-gap touches get no credit") {
    // one user: view, then a purchase 31 minutes later — two separate
    // sessions (view->NULL; START->purchase->CONV), so view's removal
    // effect is ZERO, not one
    val evs = Seq((1L, 1L, "view", 0L),
      (2L, 1L, "purchase", 31L * 60L * 1000000L))
    val m = run(evs)
    assert(m("view")._1 === 0.0)
  }

  test("fixed 30 rounds sit on the converged values (vs 60 rounds)") {
    val sf = "/root/testdata/sf0.001"
    def at(iters: Int) = {
      val s = spark
      EventOps.markovAttributionOn(
        graft.sources.Tables.load(s, sf, "events")
          .select(org.apache.spark.sql.functions.col("event_id"),
            org.apache.spark.sql.functions.col("user_id"),
            org.apache.spark.sql.functions.col("event_type"),
            org.apache.spark.sql.functions.expr("unix_micros(ts)").as("us")),
        iters = iters)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2))).toMap
    }
    assert(at(30) === at(60))
  }
}
