package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the t17 n-gram novelty signal: exact fractions
  * on hand fixtures, duplicate documents zeroing each other out, and
  * the shorter-than-one-gram edge. */
class NgramNoveltySpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def run(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    TextOps.ngramNoveltyOn(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_unique"),
          r.getAs[Double]("novelty"))).toMap
  }

  test("exact duplicates have zero novelty; unique text has one") {
    // docs 1/2 identical (every gram df >= 2); doc 3 disjoint content
    val got = run(Seq(
      (1L, "aaaaabbbbb"), (2L, "aaaaabbbbb"), (3L, "cccccddddd")))
    assert(got(1L) == (2L, 0L, 0.0))
    assert(got(2L) == (2L, 0L, 0.0))
    assert(got(3L) == (2L, 2L, 1.0))
  }

  test("mixed novelty is the exact unique-gram fraction") {
    // doc 1: grams {aaaaa, bbbbb, ccccc, zzzzz}; doc 2 shares
    // aaaaa+bbbbb -> doc 1 novelty = 2/4
    val got = run(Seq(
      (1L, "aaaaabbbbbccccczzzzz"), (2L, "aaaaabbbbb")))
    assert(got(1L) == (4L, 2L, 0.5))
    assert(got(2L) == (2L, 0L, 0.0))
  }

  test("repeated grams inside one doc count once (distinct grams)") {
    // doc 1 is aaaaa repeated: ONE distinct gram, still unique to it
    val got = run(Seq((1L, "aaaaaaaaaa"), (2L, "bbbbb")))
    assert(got(1L) == (1L, 1L, 1.0))
  }

  test("documents shorter than one gram produce no row") {
    val got = run(Seq((1L, "abc"), (2L, "dddddeeeee")))
    assert(!got.contains(1L) && got(2L) == (2L, 2L, 1.0))
  }
}
