package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** t26 Gopher n-gram repetition: hand-computed fractions, threshold
  * binding on crafted boilerplate, tie-breaks, and degenerate docs. */
class GopherRepetitionSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def run(docs: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    TextOps.gopherRepetitionOn(
      docs.map { case (id, t) => (id, t, t.length.toLong) }
        .toDF("doc_id", "text", "n_chars"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("fractions match hand arithmetic on a crafted doc") {
    // "ab cd ab cd ef" (14 chars): 2-grams = [ab cd]x2, [cd ab], [cd ef]
    // top2 = "ab cd" count 2, len 5 -> 2*5/14 = 0.7143
    val m = run(Seq((1L, "ab cd ab cd ef")))
    val r = m(1L)
    assert(r.getAs[String]("top2_gram") === "ab cd")
    assert(r.getAs[Double]("top2_frac") === 0.7143)
    // 3-grams: [ab cd ab], [cd ab cd], [ab cd ef] all count 1 ->
    // lexicographic smallest "ab cd ab", len 8 -> 8/14 = 0.5714
    assert(r.getAs[String]("top3_gram") === "ab cd ab")
    assert(r.getAs[Double]("top3_frac") === 0.5714)
    // only one 5-gram (count 1) -> no duplicates
    assert(r.getAs[Double]("dup5_frac") === 0.0)
    assert(!r.getAs[Boolean]("keep")) // top2 0.71 > 0.20 binds
  }

  test("looped boilerplate trips the duplicate-5-gram cut") {
    // the 5-gram "a b c d e" occurs 4x (overlapping loop) — dup5 counts
    // every occurrence of every duplicated 5-gram
    val text = Seq.fill(8)(Seq("a", "b", "c", "d", "e")).flatten
      .mkString(" ") // 40 tokens, 79 chars
    val m = run(Seq((1L, text)))
    assert(m(1L).getAs[Double]("dup5_frac") > 0.15)
    assert(!m(1L).getAs[Boolean]("keep"))
  }

  test("distinct-word text keeps: all three signals at their floor") {
    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    val m = run(Seq((1L, text)))
    val r = m(1L)
    assert(r.getAs[Double]("dup5_frac") === 0.0)
    assert(r.getAs[Boolean]("keep"))
    // every 2-gram unique -> top2 count 1; frac = len(first 2-gram)/n
    assert(r.getAs[Double]("top2_frac") < 0.20)
  }

  test("tie on count breaks to the lexicographically smallest gram") {
    // "z y z y" vs "b a b a": in "b a z y b a z y" 2-grams
    // [b a]x2, [a z]x1... wait: b a, a z, z y, y b, b a, a z, z y ->
    // counts: "b a"=2, "a z"=2, "z y"=2, "y b"=1 -> smallest of the
    // three tied at 2 is "a z"
    val m = run(Seq((1L, "b a z y b a z y")))
    assert(m(1L).getAs[String]("top2_gram") === "a z")
  }

  test("docs shorter than the gram order emit zero fractions and keep") {
    val m = run(Seq((1L, "solo"), (2L, "just two")))
    assert(m(1L).getAs[Double]("top2_frac") === 0.0)
    assert(m(1L).getAs[Any]("top2_gram") === null)
    assert(m(1L).getAs[Boolean]("keep"))
    assert(m(2L).getAs[String]("top2_gram") === "just two")
    // the single 2-gram covers every character — frac 1.0, and the
    // 0.20 cut correctly rejects a doc that IS one repeated-able phrase
    assert(m(2L).getAs[Double]("top2_frac") === 1.0)
    assert(m(2L).getAs[Double]("top3_frac") === 0.0)
    assert(!m(2L).getAs[Boolean]("keep"))
  }

  test("gate thresholds bind on the real corpus (both keep values)") {
    val out = TextOps.gopherRepetition(spark, "/root/testdata/sf0.001")
      .collect()
    val kept = out.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < out.length,
      s"keep=$kept of ${out.length} — threshold no longer binds")
  }
}
