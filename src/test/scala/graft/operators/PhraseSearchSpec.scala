package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** t21 positional phrase search: top-trigram derivation with the
  * lexicographic tie-break, every-occurrence anchors, short-doc
  * exclusion, and the repeated-token/overlap law. */
class PhraseSearchSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def run(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    TextOps.phraseSearchOn(rows.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSet
  }

  test("finds every occurrence of the corpus' top trigram") {
    // "a b c" appears 3 times (twice in doc 0, once in doc 1) — the
    // most frequent trigram; doc 2 is too short to contribute grams
    val got = run(Seq(
      (0L, "a b c a b c"),
      (1L, "a b c x"),
      (2L, "x y")))
    assert(got === Set((0L, 0, "a b c"), (0L, 3, "a b c"),
      (1L, 0, "a b c")))
  }

  test("tie between trigram counts breaks lexicographically") {
    // "p q r" and "a b c" both appear once → "a b c" wins the tie
    val got = run(Seq((0L, "p q r"), (1L, "a b c")))
    assert(got === Set((1L, 0, "a b c")))
  }

  test("repeated-token phrase matches overlapping occurrences exactly") {
    // top trigram of "b b b b" is "b b b" (count 2); the anchor
    // algorithm must find BOTH overlapping occurrences (pos 0 and 1)
    // and reject anchors where only 2 of 3 offsets match
    val got = run(Seq((0L, "b b b b"), (1L, "b x")))
    assert(got === Set((0L, 0, "b b b"), (0L, 1, "b b b")))
  }
}
