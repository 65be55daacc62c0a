package graft.operators

import java.sql.Date
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The KM estimator contract on hand-computable fixtures: exact
  * survival values, censoring shrinking the risk set WITHOUT stepping
  * the curve, monotone non-increase, and the c36 audit's class
  * algebra. */
class KaplanMeierSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** (user, firstDay, lastDay) observations as two event rows each. */
  private def km(obs: (Long, Int, Int)*) = {
    val s = spark
    import s.implicits._
    val rows = obs.flatMap { case (u, f, l) =>
      Seq((u, Date.valueOf(f"2026-01-$f%02d")),
        (u, Date.valueOf(f"2026-01-$l%02d")))
    }
    EventOps.kaplanMeierOn(rows.toDF("user_id", "day"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(_._1)
  }

  test("textbook curve: exact factors at each event time") {
    // stream end = Jan 30. users: A churns at 2d, B churns at 5d,
    // C censored at 5d (last seen Jan 28, within the 7-day horizon),
    // D censored at 10d (last seen Jan 29)
    val got = km((1L, 1, 3), (2L, 10, 15), (3L, 23, 28), (4L, 19, 29))
    // durations: 2 (d=1, risk 4): S = 3/4 = .75
    //            5 (d=1 c=1, risk 3): S = .75 * 2/3 = .5
    //           10 (c=1, risk 1): no event -> S stays .5
    assert(got.toSeq == Seq(
      (2L, 4L, 1L, 0L, 0.75),
      (5L, 3L, 1L, 1L, 0.5),
      (10L, 1L, 0L, 1L, 0.5)))
  }

  test("censoring never steps the curve; survival is non-increasing") {
    // all users near the stream end: everyone censored
    val allCensored = km((1L, 25, 29), (2L, 24, 30), (3L, 26, 28))
    assert(allCensored.forall(_._5 == 1.0),
      "a fully-censored cohort has no observed deaths")
    val curve = km((1L, 1, 2), (2L, 1, 4), (3L, 2, 8), (4L, 3, 10),
      (5L, 20, 28)).map(_._5)
    assert(curve.zip(curve.tail).forall { case (a, b) => b <= a })
  }

  test("c36: class counts and the k threshold decide release") {
    val got = CurationOps.kAnonymity(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getBoolean(4))).toMap
    assert(got.nonEmpty)
    got.values.foreach { case (n, released) =>
      assert(released == (n >= CurationOps.KAnonThreshold))
    }
    // the audit is non-trivial on the real corpus: both outcomes occur
    assert(got.values.exists(_._2) && got.values.exists(!_._2))
  }
}
