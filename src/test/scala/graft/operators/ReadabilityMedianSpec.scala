package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** t30 Flesch-Kincaid (hand-counted syllables/sentences) and q141
  * rolling median (exact trailing windows, outlier immunity). */
class ReadabilityMedianSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("t30: hand-counted words, sentences, vowel groups, grade") {
    val s = spark
    import s.implicits._
    val rows = TextOps.fleschKincaidOn(Seq(
      (1L, "the cat sat"),
      (2L, "Hello world. Yes!")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // doc 1: 3 words, floor 1 sentence, vowel groups e/a/a = 3
    // fk = 0.39*3 + 11.8*1 − 15.59 = −2.62
    assert(rows(1L) == ((3L, 1L, 3L, -2.62)))
    // doc 2: 3 words, 2 terminators, groups e-o/o/e = 4
    // fk = 0.39*1.5 + 11.8*(4/3) − 15.59 = 0.7283
    assert(rows(2L) == ((3L, 2L, 4L, 0.7283)))
  }

  test("q141: exact medians over growing windows, spike-immune") {
    val s = spark
    import s.implicits._
    def series(tpe: String, ys: Seq[Double]) =
      ys.zipWithIndex.map { case (y, i) =>
        (tpe, Date.valueOf(f"2024-01-${i + 1}%02d"), y)
      }
    val m = EventOps.rollingMedianOn(
      (series("r", Seq(1.0, 2.0, 3.0, 4.0, 5.0)) ++
        series("o", Seq(5.0, 5.0, 100.0, 5.0, 5.0)))
        .toDF("event_type", "day", "v"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getInt(3), r.getDouble(4))).toMap
    assert(m(("r", "2024-01-01")) == ((1, 1.0)))
    assert(m(("r", "2024-01-02")) == ((2, 1.5))) // even: mean of middles
    assert(m(("r", "2024-01-03")) == ((3, 2.0)))
    assert(m(("r", "2024-01-04")) == ((4, 2.5)))
    assert(m(("r", "2024-01-05")) == ((5, 3.0)))
    // the 100 spike never wins a window where it is the minority
    assert(m(("o", "2024-01-03")) == ((3, 5.0)))
    assert(m(("o", "2024-01-05")) == ((5, 5.0)))
  }
}
