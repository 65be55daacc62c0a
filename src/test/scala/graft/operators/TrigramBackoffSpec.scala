package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** t28 stupid backoff: each backoff branch isolated on a hand model,
  * plus branch binding on the gate corpus. */
class TrigramBackoffSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  // train corpus: "a b c a b d" -> trigrams abc/bca/cab/abd x1,
  // bigrams ab x2, bc/ca/bd x1, unigrams a2 b2 c1 d1, T = 6
  private def run(held: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    val rows = (100L, "train", "a b c a b d") +:
      held.map { case (id, t) => (id, "held", t) }
    TextOps.trigramBackoffOn(rows.toDF("doc_id", "source", "text"), "held")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3))).toMap
  }

  test("trigram hit and OOV floor average by hand") {
    // "a b c x": pos1 abc -> ln(1/2); pos2 bcx unseen at every level
    // (x is OOV) -> ln(0.16/6)
    val m = run(Seq((1L, "a b c x")))
    val expect = (math.log(0.5) + math.log(0.16 / 6)) / 2
    assert(m(1L)._2 === 2L)
    assert(math.abs(m(1L)._1 - expect) < 1e-4)
    assert(m(1L)._3 === 0.5) // one of two positions backed off
  }

  test("bigram branch: unseen trigram, seen bigram, 0.4 penalty") {
    // "x b c": trigram xbc unseen; bigram bc seen (1) over c1m(b)=2
    val m = run(Seq((1L, "x b c")))
    assert(math.abs(m(1L)._1 - math.log(0.4 * 0.5)) < 1e-4)
    assert(m(1L)._3 === 1.0)
  }

  test("unigram branch: only the last word is known") {
    // "x y d": trigram/bigram unseen, d has count 1 -> 0.16 * 1/6
    val m = run(Seq((1L, "x y d")))
    assert(math.abs(m(1L)._1 - math.log(0.16 / 6)) < 1e-4)
  }

  test("docs shorter than a trigram are excluded") {
    assert(run(Seq((1L, "a b"))).isEmpty)
  }

  test("gate corpus: both trigram hits and backoffs occur") {
    val out = TextOps.trigramBackoff(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val fracs = out.map(_.getDouble(3))
    assert(fracs.exists(_ > 0.0) && fracs.exists(_ < 1.0),
      s"backoff fractions degenerate: ${fracs.min}..${fracs.max}")
  }
}
